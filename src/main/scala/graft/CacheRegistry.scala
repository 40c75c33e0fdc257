package graft

import org.apache.spark.sql.SparkSession

/** Session cache hygiene for the eagerly-materialized intermediates
  * (`localCheckpoint(true)` band/shingle/label tables, `persist`ed IVF
  * corpora): their executor MEMORY_AND_DISK blocks are otherwise freed
  * only when the driver GCs the RDD reference, which an interleaved
  * bench loop should not depend on. `clear` drops every library-held
  * memoized DataFrame reference (registered hooks) and then unpersists
  * all persistent RDDs — safe at a pass boundary, where every query
  * result is already materialized and nothing re-reads a checkpointed
  * block. Long-running production deployments should instead substitute
  * reliable `checkpoint`/`persist` with explicit per-pipeline lifecycle
  * (see [[operators.SimilarityOps.IvfIndex.close]] for the owned form).
  */
object CacheRegistry {
  private val hooks = scala.collection.mutable.ArrayBuffer.empty[() => Unit]

  /** Register a cache-invalidation hook (e.g. a memo map `clear`). Runs
    * before the RDD unpersist sweep so no stale reference outlives its
    * storage. */
  def onClear(f: () => Unit): Unit = synchronized { hooks += f }

  /** Invalidate every registered library cache and release all persistent
    * RDD storage of the session's context. */
  def clear(s: SparkSession): Unit = {
    synchronized(hooks.toList).foreach(_.apply())
    s.sparkContext.getPersistentRDDs.valuesIterator
      .foreach(_.unpersist(blocking = false))
  }

  /** Source-derived memo bounded to ONE live generation per
    * (application, path): entries are keyed by (application, path) and
    * carry the source's data version — a fold of every underlying
    * file's name, length, and mtime — so regenerating the source in
    * place (same path, new data) misses instead of silently serving
    * stale checkpointed results, and the superseded value is DISPOSED
    * instead of accumulating one entry per version (a long-lived
    * session that regenerates a source N times between pass boundaries
    * would otherwise pin N checkpointed copies). Dropped checkpoint
    * references are reclaimed by Spark's ContextCleaner once
    * unreferenced — and consumers still holding the superseded frame
    * keep it alive through their own reference, so eager turnover is
    * safe for DataFrames; the `dispose` callback covers resources the
    * cleaner can't see (a caller whose value is NOT safely reclaimable
    * while in use, e.g. a staged directory, should dispose by RETIRING
    * to a pass-boundary cleanup instead of destroying eagerly).
    * Auto-registers its own [[onClear]] hook; the build runs under the
    * map's per-key lock, same as `computeIfAbsent` did. */
  final class VersionedMemo[V](dispose: V => Unit = (_: V) => ()) {
    private val m =
      new java.util.concurrent.ConcurrentHashMap[String, (String, V)]()
    CacheRegistry.onClear(() => clear())
    def getOrBuild(s: SparkSession, path: String)(build: => V): V =
      m.compute(s.sparkContext.applicationId + "|" + path, (_, old) => {
        val ver = dataVersion(s, path)
        if (old != null && old._1 == ver) old
        else {
          // build FIRST: if it throws, compute leaves the map unchanged
          // and the old generation stays live and undisposed — disposing
          // first would leave a map entry pointing at a dead value
          val fresh = (ver, build)
          if (old != null) dispose(old._2)
          fresh
        }
      })._2
    /** Live entry count — at most one per (application, path). */
    def size: Int = m.size
    def clear(): Unit = {
      m.values.forEach(v => dispose(v._2))
      m.clear()
    }
  }

  /** Fingerprint of a file/directory's current contents (recursive name ×
    * length × mtime fold); `"absent"` when the path does not exist. */
  def dataVersion(s: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) "absent"
    else {
      var h = 1125899906842597L
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val f = it.next()
        h = h * 31 + f.getPath.getName.hashCode
        h = h * 31 + f.getLen
        h = h * 31 + f.getModificationTime
      }
      java.lang.Long.toHexString(h)
    }
  }
}
