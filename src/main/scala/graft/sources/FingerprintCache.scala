package graft.sources

/** Shared lifecycle for the fingerprint-keyed build-if-absent caches
  * that live under `java.io.tmpdir` (`graft_bm25`, `graft_segbm25`,
  * `graft_vocab`, `graft_cclabels`). Each cache dir is named by the
  * MD5 of its full build key (data-file fingerprint + parameters +
  * an algorithm-version token), so a regenerated dataset or a
  * semantics change gets a fresh dir — and the OLD dirs become
  * unreachable garbage that accumulates across testdata
  * regenerations unless swept.
  *
  * Lifecycle contract (the one proven for graft_cclabels in
  * RoundNineSpec, now shared by every family):
  *  - `prepare` sweeps the family root, then creates the cache dir
  *    and writes its `key.txt` marker BEFORE the caller builds, so a
  *    concurrent JVM's sweep can never delete a half-built cache out
  *    from under the writer. A marker with no published version just
  *    means in-progress/aborted — callers gate the build on their
  *    own is-built check (VersionedTable.latestVersion), which
  *    rebuilds idempotently.
  *  - The sweep deletes any subdir whose marker is missing (aborted
  *    pre-marker build) or whose marker key lacks the family's live
  *    version token (built by older code: its fingerprint embeds the
  *    old token, so it can never be read again). Current-version
  *    caches — all SFs / parameter sets — are kept.
  */
object FingerprintCache {

  def md5(key: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Sweep stale siblings, then create + mark this key's cache dir.
    * Returns the dir path; the caller builds into it if its own
    * is-built check says the content is absent. */
  def prepare(rootName: String, key: String, liveToken: String): String =
    synchronized {
      require(key.contains(liveToken),
        s"cache key must embed its live token $liveToken")
      val root = new java.io.File(
        s"${sys.props("java.io.tmpdir")}/$rootName")
      sweep(root, liveToken)
      val dir = new java.io.File(root, md5(key))
      java.nio.file.Files.createDirectories(dir.toPath)
      java.nio.file.Files.write(
        dir.toPath.resolve("key.txt"), key.getBytes("UTF-8"))
      dir.getAbsolutePath
    }

  private def sweep(root: java.io.File, liveToken: String): Unit = {
    import scala.jdk.CollectionConverters._
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .filterNot { d =>
        val marker = new java.io.File(d, "key.txt")
        marker.isFile && new String(
          java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8")
          .contains(liveToken)
      }
      .foreach { d =>
        scala.util.Using.resource(java.nio.file.Files.walk(d.toPath)) {
          s => s.iterator().asScala.toSeq
            .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
      }
  }
}
