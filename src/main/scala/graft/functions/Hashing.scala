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

  /** JVM-side md5 hex (for driver-side constants, e.g. LSH plane
    * derivation) — same function the SQL side uses. */
  def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Deterministic pseudo-uniform double in [-1, 1) from a string key
    * (used to derive LSH hyperplanes identically on any engine). */
  def uniformFromKey(key: String): Double = {
    val h = java.lang.Long.parseLong(md5Hex(key).substring(0, 8), 16)
    (h % 2001L - 1000L) / 1000.0
  }
}
