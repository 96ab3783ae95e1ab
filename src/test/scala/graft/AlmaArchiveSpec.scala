package graft

import graft.sources.Archives
import org.scalatest.funsuite.AnyFunSuite

/** Real-archive regression for the tarball expansion surface: the
  * VENDORED fixtures are the reference repo's own
  * (tests/fixtures/alma_bibs__{new_1,empty,multi}.xml.tar.gz +
  * alma_bibs__new_1.xml, byte-identical — no provenance comment
  * inside, the pass case compares BYTES), and the expectations are
  * its own test_process.py:14-48 contract. The genuinely-at-risk
  * part: these are PAX-format tarballs (typeflag `x` extended
  * headers carrying LIBARCHIVE/SCHILY keywords) — a naive ustar
  * reader would surface the pax header as a phantom member and trip
  * the multi-member guard on every REAL Alma SFTP object. */
class AlmaArchiveSpec extends AnyFunSuite {
  import TestSession._

  private def resourceBytes(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/$name")
    require(in != null, s"missing $name")
    try in.readAllBytes() finally in.close()
  }

  test("real PAX tarball expands to exactly the original file bytes") {
    val got = Archives.expandTarGz(resourceBytes("alma_tarball_new1.tar.gz"))
    assert(got.isDefined, "pax extended headers must not count as members")
    assert(java.util.Arrays.equals(got.get,
      resourceBytes("alma_bibs_new1.xml")),
      "expanded member diverged from the original file bytes")
  }

  test("empty and multi-member archives hit the reference's guards") {
    assert(Archives.expandTarGz(
      resourceBytes("alma_tarball_empty.tar.gz")).isEmpty)
    assert(Archives.expandTarGz(
      resourceBytes("alma_tarball_multi.tar.gz")).isEmpty)
  }

  test("the distributed binaryFile route expands the real archives the same way") {
    val dir = java.nio.file.Files.createTempDirectory("graft_alma")
    Seq("alma_tarball_new1.tar.gz", "alma_tarball_multi.tar.gz").foreach { n =>
      java.nio.file.Files.write(dir.resolve(n), resourceBytes(n))
    }
    val rows = Archives.expandAll(spark, s"$dir/*.tar.gz").collect()
    // general form: every member of every archive (multi has two)
    assert(rows.length == 3)
    val new1 = rows.find(_.path.endsWith("alma_tarball_new1.tar.gz")).get
    assert(new1.member == "alma_bibs__new_1.xml")
    assert(new1.text == new String(
      resourceBytes("alma_bibs_new1.xml"), "UTF-8"))
    assert(rows.filter(_.path.endsWith("multi.tar.gz"))
      .map(_.member).sorted.toSeq ==
      Seq("alma_bibs__boundwith_new_1.xml", "alma_bibs__new_1.xml"))
  }
}
