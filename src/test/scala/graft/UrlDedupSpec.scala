package graft

import graft.dedup.UrlDedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The canonical-URL normalization contract ([[UrlDedup]]) on
  * adversarial URLs — the d24 oracle states per-shape ground truth;
  * this spec owns the normalization algorithm itself. */
class UrlDedupSpec extends AnyFunSuite {
  import TestSession._

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url").select(UrlDedup.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect().toSeq
  }

  test("scheme/host lowercase; path and query case survive") {
    assert(canon("HTTP://ExAmPlE.CoM/Path/File?Q=Ab") ==
      Seq("http://example.com/Path/File?Q=Ab"))
  }

  test("www, default ports, fragments drop; non-defaults survive") {
    assert(canon(
      "http://www.a.com:80/x",
      "https://www.a.com:443/x",
      "http://a.com:8080/x",      // non-default port kept
      "https://a.com:80/x",       // 80 is NOT https' default — kept
      "http://a.com/x#sec-2",
      "http://a.com:80#top"       // port then fragment, no path
    ) == Seq(
      "http://a.com/x",
      "https://a.com/x",
      "http://a.com:8080/x",
      "https://a.com:80/x",
      "http://a.com/x",
      "http://a.com"))
  }

  test("utm params drop wherever they sit; other params keep their order") {
    assert(canon(
      "http://a.com/x?utm_source=f",
      "http://a.com/x?utm_source=f&id=2",
      "http://a.com/x?id=2&utm_medium=m",
      "http://a.com/x?utm_a=1&utm_b=2&id=2&utm_c=3",
      "http://a.com/x?b=2&a=1"     // param order preserved, NOT sorted
    ) == Seq(
      "http://a.com/x",
      "http://a.com/x?id=2",
      "http://a.com/x?id=2",
      "http://a.com/x?id=2",
      "http://a.com/x?b=2&a=1"))
  }

  test("trailing slash drops; composed variants all land on one canonical") {
    val all = canon(
      "http://WWW.Example.com:80/a/7?utm_source=feed",
      "http://example.COM/a/7#frag",
      "http://example.com/a/7/",
      "http://www.Example.com/a/7?utm_campaign=x#y")
    assert(all.toSet == Set("http://example.com/a/7"), all.toString)
    assert(canon("https://WWW.a.com:443/p/?utm_x=1#f") == Seq("https://a.com/p"))
  }

  test("dedupByUrl groups by canonical key with min-id keep and variant audit") {
    import spark.implicits._
    val df = Seq(
      (10L, "http://www.a.com/p"),
      (7L, "http://A.com/p/"),
      (3L, "http://a.com/p#z"),
      (5L, "http://a.com/q")).toDF("id", "u")
    val got = UrlDedup.dedupByUrl(df, col("id"), col("u"))
      .orderBy("canonical_url")
      .collect()
    assert(got.length == 2)
    assert(got(0).getString(0) == "http://a.com/p" && got(0).getLong(1) == 3
      && got(0).getLong(2) == 3 && got(0).getLong(3) == 3)
    assert(got(1).getString(0) == "http://a.com/q" && got(1).getLong(1) == 1)
  }
}
