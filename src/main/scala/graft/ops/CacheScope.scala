package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Release handle for the dedup/similarity family's internal persists.
  *
  * [[graft.text.Dedup.minhashPairs]], [[graft.text.Dedup.jaccardPairs]],
  * [[graft.text.Dedup.contamination]] and the LSH candidate machinery in
  * [[graft.text.Similarity]] each persist a narrow intermediate (signature
  * table / exploded shingle index / bucket assignments) that the returned
  * lazy frame reads more than once. A caller sweeping MANY DISTINCT corpora
  * in one long-lived session passes its own scope and calls
  * [[unpersistAll]] between corpora, so cached blocks don't accumulate
  * until executor storage evicts under pressure:
  *
  * {{{
  * val scope = new CacheScope
  * val pairs = Dedup.minhashPairs(corpus, scope = scope)
  * pairs.write.parquet(out)   // actions that consume the result
  * scope.unpersistAll()       // release the intermediates
  * }}}
  *
  * The default [[CacheScope.Session]] keeps the historical contract:
  * intermediates stay cached for the session lifetime (Spark's CacheManager
  * dedupes identical plans, so repeated calls over the same corpus reuse
  * one entry) and [[unpersistAll]] is a no-op.
  */
class CacheScope {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` at MEMORY_AND_DISK and track it for release. */
  def persist(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    frames.synchronized { frames += df }
    df
  }

  /** Unpersist every frame this scope persisted, then forget them. */
  def unpersistAll(blocking: Boolean = false): Unit =
    frames.synchronized {
      frames.foreach(_.unpersist(blocking))
      frames.clear()
    }

  /** Number of currently tracked (persisted, unreleased) frames. */
  def size: Int = frames.synchronized(frames.size)
}

object CacheScope {
  /** Session-lifetime scope: persists are never tracked, so
    * [[CacheScope.unpersistAll]] on it is a no-op — the library's
    * documented default trade (results recompute their expensive narrow
    * stage on every action without the cache). */
  val Session: CacheScope = new CacheScope {
    override def persist(df: DataFrame): DataFrame = {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      df
    }
  }
}
