package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing. All dedup/LSH operators
  * hash through md5 (identical in every engine) rather than
  * xxhash64/murmur (Spark-specific seeds), so results are
  * reproducible across engines and across cluster sizes.
  */
object Hashing {

  /** 32-bit hash of `s` under seed `seed`: first 8 hex chars of
    * md5("<seed>:<s>") as an unsigned int in a long.
    * Oracle mirror: CAST(concat('0x', substr(md5(concat('<seed>:', s)),1,8)) AS BIGINT). */
  def h32(seed: Int, s: Column): Column =
    conv(substring(md5(concat(lit(s"$seed:"), s).cast("binary")), 1, 8), 16, 10)
      .cast("long")

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue() = java.security.MessageDigest.getInstance("MD5")
  }
  private val hexChars = "0123456789abcdef".toCharArray

  /** JVM-side md5 hex — same function the SQL side uses. Thread-local
    * digest + manual hex: this sits under every shingle hash, so no
    * per-call allocation beyond the output. */
  def md5Hex(s: String): String = {
    val d = digest.get()
    d.reset()
    val bytes = d.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** First 8 hex chars of md5("<seed>:<s>") as an unsigned 32-bit
    * value — JVM twin of h32, one digest, no substring parse. */
  def h32jvm(seed: Int, s: String): Long = {
    val d = digest.get()
    d.reset()
    val bytes = d.digest(s"$seed:$s".getBytes("UTF-8"))
    ((bytes(0) & 0xffL) << 24) | ((bytes(1) & 0xffL) << 16) |
      ((bytes(2) & 0xffL) << 8) | (bytes(3) & 0xffL)
  }

  /** Deterministic pseudo-uniform double in [-1, 1) from a string key
    * (used to derive LSH hyperplanes identically on any engine). */
  def uniformFromKey(key: String): Double = {
    val h = java.lang.Long.parseLong(md5Hex(key).substring(0, 8), 16)
    (h % 2001L - 1000L) / 1000.0
  }
}
