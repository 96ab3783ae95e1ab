package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.util.zip.GZIPInputStream
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Archive expansion (reference: process.py:52-66
  * `expand_alma_sftp_tarball` — an S3 object is a .tar.gz holding
  * exactly one XML file; the reference streams it out in memory).
  *
  * Spark-side: archives arrive as rows of a `binaryFile` scan; each
  * expands inside mapPartitions, so bytes never cross a shuffle and
  * a million archives fan out across executors with no driver
  * involvement. The tar reader below is a minimal ustar parser
  * (header name + size, 512-byte records) — enough for the
  * single-member layout the reference handles, with the same
  * empty/multi-member guard semantics.
  */
object Archives {

  final case class Member(name: String, bytes: Array[Byte])
  final case class ArchiveRow(path: String, content: Array[Byte])
  final case class ExpandedRow(path: String, member: String, text: String)

  /** Parse a tar stream (already gunzipped): sequence of
    * (name, content). */
  private[sources] def untar(in: InputStream): Seq[Member] = {
    val out = Seq.newBuilder[Member]
    val header = new Array[Byte](512)
    def readFully(buf: Array[Byte], n: Int): Boolean = {
      var off = 0
      while (off < n) {
        val r = in.read(buf, off, n - off)
        if (r < 0) return false
        off += r
      }
      true
    }
    var done = false
    while (!done && readFully(header, 512)) {
      val name = new String(header, 0, 100, "US-ASCII").takeWhile(_ != 0).trim
      if (name.isEmpty) done = true // end-of-archive zero block
      else {
        val sizeStr = new String(header, 124, 12, "US-ASCII")
          .takeWhile(c => c != 0 && c != ' ').trim
        val size = if (sizeStr.isEmpty) 0L else java.lang.Long.parseLong(sizeStr, 8)
        val typeFlag = header(156).toChar
        val data = new Array[Byte](size.toInt)
        readFully(data, size.toInt)
        // skip padding to the next 512 boundary
        val pad = ((512 - (size % 512)) % 512).toInt
        if (pad > 0) readFully(new Array[Byte](pad), pad)
        if (typeFlag == '0' || typeFlag == 0.toChar) out += Member(name, data)
      }
    }
    out.result()
  }

  /** Expand one .tar.gz byte payload; mirrors the reference's
    * guards: None for empty archives and for unexpected multi-member
    * archives (process.py:54-63). */
  def expandTarGz(bytes: Array[Byte]): Option[Array[Byte]] = {
    val members = untar(new GZIPInputStream(new ByteArrayInputStream(bytes)))
    if (members.isEmpty) None
    else if (members.length > 1) None
    else Some(members.head.bytes)
  }

  /** binaryFile scan → expanded UTF-8 text rows, one per archive
    * member (general form, no single-member restriction). */
  def expandAll(spark: SparkSession, glob: String): Dataset[ExpandedRow] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select($"path", $"content").as[ArchiveRow]
      .mapPartitions(_.flatMap { row =>
        untar(new GZIPInputStream(new ByteArrayInputStream(row.content)))
          .map(m => ExpandedRow(row.path, m.name, new String(m.bytes, "UTF-8")))
      })
  }
}
