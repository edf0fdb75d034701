package graft.operators

import org.apache.spark.sql.SparkSession

/** Memoized once-per-(session, dataset) disk layouts (the partitioned
  * corpus lake, the IVF / IVFADC index directories): expensive
  * overwrite-writes under the session warehouse that every later query
  * reads instead of rebuilding — v06's index-build amortization rule.
  *
  * Concurrency contract (ADVICE r9): one slot per key, and only the
  * slot's monitor guards ITS build — two sessions (or two datasets)
  * build concurrently instead of queueing on a global lock, while two
  * racing first callers of the SAME layout still serialize (a
  * double-written overwrite corrupts in-flight files;
  * `TrieMap.getOrElseUpdate` putIfAbsent's the result, it does not
  * serialize the thunk). Stopped sessions are pruned on every lookup
  * and their directories deleted — `remove` hands the slot to exactly
  * one thread, and a stopped session's DataFrames can't execute, so
  * nothing can still be reading the path.
  */
private[operators] final class DiskLayoutCache(prefix: String) {
  private final class Slot { @volatile var path: String = _ }
  private val cache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Slot]

  private def deleteRecursively(raw: String): Unit =
    try {
      // warehouse dirs come as "file:/..." or a bare path
      val local = Option(new java.net.URI(raw).getPath)
        .filter(_.nonEmpty).getOrElse(raw)
      val root = java.nio.file.Paths.get(local)
      if (java.nio.file.Files.exists(root)) {
        val s = java.nio.file.Files.walk(root)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
        finally s.close()
      }
    } catch { case _: Exception => () } // best-effort GC

  /** The layout path for (session, dataset), building it via `build`
    * (called with the destination path) exactly once per key. The path
    * is `<warehouse>/<prefix>_<md5(dir)>` — a full-strength content
    * hash, because a 32-bit hashCode could collide across datasets
    * sharing a warehouse and silently serve one dataset's layout for
    * another. */
  def getOrBuild(s: SparkSession, dir: String)(build: String => Unit)
      : String = {
    cache.keys.filter(_._1.sparkContext.isStopped).foreach { k =>
      cache.remove(k).foreach { slot =>
        if (slot.path != null) deleteRecursively(slot.path)
      }
    }
    // a racing getOrElseUpdate may construct a losing Slot but returns
    // the single winner; the build is guarded by that winner's monitor
    // (double-checked through the volatile read)
    val slot = cache.getOrElseUpdate((s, dir), new Slot)
    val ready = slot.path
    if (ready != null) ready
    else slot.synchronized {
      if (slot.path == null) {
        val wh = s.conf.get("spark.sql.warehouse.dir")
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
        // the applicationId component makes the path unique per
        // SparkContext: two contexts sharing a warehouse and dataset
        // would otherwise collide on one directory, and the stale-
        // session GC above could delete a directory a LIVE session's
        // cached slot still points to (ADVICE r10)
        val p = s"$wh/${prefix}_${md}_${s.sparkContext.applicationId}"
        build(p)
        slot.path = p
      }
      slot.path
    }
  }
}
