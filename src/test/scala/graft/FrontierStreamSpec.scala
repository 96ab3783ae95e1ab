package graft

import graft.streaming.FrontierStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FrontierStream: the streaming crawl-frontier gate — batch-d24
  * agreement on an in-order feed, duplicate-hit audit across batches,
  * and the TTL re-crawl window. */
class FrontierStreamSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def stage(dir: String, name: String, rows: Seq[(Long, String)]): Unit = {
    val scratch =
      java.nio.file.Files.createTempDirectory("graft_front_s").toString + "/out"
    rows.toDF("id", "url").coalesce(1).write.parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(dir, s"$name.parquet"))
  }

  test("in-order feed admits exactly the batch d24 representatives") {
    val dir = java.nio.file.Files.createTempDirectory("graft_front").toString
    // two batches of crawl-variant sightings, ids ascending across them
    stage(dir, "b1", Seq(
      (1L, "http://www.A.com:80/p?utm_source=f"),
      (2L, "http://a.com/p/"),
      (3L, "http://a.com/q")))
    stage(dir, "b2", Seq(
      (4L, "http://a.com/p#frag"),      // dup of the b1 page, later batch
      (5L, "http://A.COM/q?utm_c=x"),   // dup of q
      (6L, "http://a.com/r")))          // novel
    val got = FrontierStream.runOnce(spark, dir, "front_test")
      .orderBy("id").collect()
    assert(got.length == 6)
    val admitted = got.filter(_.getAs[Boolean]("admitted"))
      .map(r => r.getAs[String]("canonical_url") -> r.getAs[Long]("id")).toMap
    assert(admitted == Map(
      "http://a.com/p" -> 1L, "http://a.com/q" -> 3L, "http://a.com/r" -> 6L))
    // the batch twin agrees: same canonical set, same (min-id) keeps
    val batch = graft.dedup.UrlDedup.dedupByUrl(
        Seq((1L, "http://www.A.com:80/p?utm_source=f"), (2L, "http://a.com/p/"),
          (3L, "http://a.com/q"), (4L, "http://a.com/p#frag"),
          (5L, "http://A.COM/q?utm_c=x"), (6L, "http://a.com/r"))
          .toDF("id", "u"), col("id"), col("u"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("keep_id")).toMap
    assert(batch == admitted, "stream first-seen diverged from batch min-id keep")
    // duplicate hits carry the admitted id and a growing n_seen
    val dupP = got.find(_.getAs[Long]("id") == 4L).get
    assert(!dupP.getAs[Boolean]("admitted") && dupP.getAs[Long]("first_id") == 1L
      && dupP.getAs[Long]("n_seen") == 3L)
    val dupQ = got.find(_.getAs[Long]("id") == 5L).get
    assert(!dupQ.getAs[Boolean]("admitted") && dupQ.getAs[Long]("first_id") == 3L)
  }

  test("within-batch ties admit the smallest id (batch-parity on unordered rows)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_front2").toString
    stage(dir, "b1", Seq(
      (9L, "http://a.com/x"), (2L, "http://a.com/x/"), (5L, "http://a.com/x#f")))
    val got = FrontierStream.runOnce(spark, dir, "front_tie")
      .orderBy("id").collect()
    assert(got.map(r => (r.getAs[Long]("id"), r.getAs[Boolean]("admitted"))).toSeq
      == Seq((2L, true), (5L, false), (9L, false)))
    assert(got.forall(_.getAs[Long]("first_id") == 2L))
  }

  test("TTL re-crawl window: an evicted URL is admitted again") {
    val dir = java.nio.file.Files.createTempDirectory("graft_front3").toString
    stage(dir, "b1", Seq((1L, "http://a.com/p")))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("url",
        org.apache.spark.sql.types.StringType)))
    val in = spark.readStream.schema(schema).format("parquet")
      .option("maxFilesPerTrigger", 1).load(dir)
    val q = FrontierStream.firstSeen(in, stateTtlMs = 100L)
      .writeStream.outputMode("append")
      .format("memory").queryName("front_ttl").start()
    // processAllAvailable never latches under ProcessingTimeTimeout
    // (the engine constructs timeout batches continuously — the
    // TransitionStreamSpec gotcha) — poll the sink row count instead
    def awaitRows(n: Long): Unit = {
      val deadline = System.nanoTime + 60L * 1000000000L
      while (spark.table("front_ttl").count() < n
          && System.nanoTime < deadline) Thread.sleep(100)
      assert(spark.table("front_ttl").count() >= n, s"sink never reached $n rows")
    }
    awaitRows(1)
    Thread.sleep(3000) // idle past the TTL: the frontier entry evicts
    // the sweep happens on the engine's timeout batches during the
    // idle window; the re-sighting then arrives as genuinely new
    stage(dir, "b3", Seq((3L, "http://a.com/p"))) // same canonical as b1
    awaitRows(2)
    q.stop()
    val got = spark.table("front_ttl").orderBy("id").collect()
    val re = got.find(_.getAs[Long]("id") == 3L).get
    assert(re.getAs[Boolean]("admitted"),
      "the re-crawl window must re-admit an evicted URL")
    assert(re.getAs[Long]("first_id") == 3L && re.getAs[Long]("n_seen") == 1L,
      "eviction resets the frontier entry, not just the admit bit")
  }
}
