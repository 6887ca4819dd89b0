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

  /** Track an ALREADY-persisted frame for release without re-persisting
    * it (re-persisting an already-cached frame only logs a CacheManager
    * warning). */
  def track(df: DataFrame): DataFrame = {
    frames.synchronized { frames += df }
    df
  }

  private val cleanups = scala.collection.mutable.ArrayBuffer.empty[() => Unit]

  /** Register a cleanup to run at [[unpersistAll]] — for storage a plain
    * `Dataset.unpersist` cannot free, e.g. the localCheckpoint blocks
    * behind [[graft.text.Dedup.components]]' labels (persisted RDD
    * blocks, not CacheManager entries). */
  def defer(f: () => Unit): Unit =
    cleanups.synchronized { cleanups += f }

  /** Unpersist every frame this scope persisted, run every deferred
    * cleanup, then forget both. */
  def unpersistAll(blocking: Boolean = false): Unit = {
    frames.synchronized {
      frames.foreach(_.unpersist(blocking))
      frames.clear()
    }
    cleanups.synchronized {
      cleanups.foreach(_.apply())
      cleanups.clear()
    }
  }

  /** Number of currently tracked (persisted or deferred, unreleased)
    * resources. */
  def size: Int =
    frames.synchronized(frames.size) + cleanups.synchronized(cleanups.size)
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
    override def track(df: DataFrame): DataFrame = df
    override def defer(f: () => Unit): Unit = () // session-lifetime storage
  }

  /** Named per-corpus scopes — the multi-corpus session contract
    * (round-11 decision): a session sweeping K corpora under the Session
    * default accumulates K× the per-corpus index persists until executor
    * storage evicts under pressure. Instead, route every call processing
    * corpus `tag` through `CacheScope.corpus(tag)` (all family entry
    * points take a `scope` parameter) and call [[releaseCorpus]] when
    * that corpus's pipeline finishes — the audit stays bounded at ONE
    * corpus's working set no matter how many flow through
    * (CacheScopeSpec proves it across two synthetic corpora). The same
    * tag returns the same scope, so a multi-stage pipeline over one
    * corpus still shares its persisted indexes. */
  private val named =
    scala.collection.concurrent.TrieMap.empty[String, CacheScope]

  /** The (shared, tracked) scope for corpus `tag` — created on first use. */
  def corpus(tag: String): CacheScope =
    named.getOrElseUpdate(tag, new CacheScope)

  /** Release every persist taken under `tag`'s scope and forget the tag.
    * Safe to call for an unknown tag (no-op). */
  def releaseCorpus(tag: String, blocking: Boolean = false): Unit =
    named.remove(tag).foreach(_.unpersistAll(blocking))

  /** Tags with live (unreleased) scopes — for audits. */
  def liveCorpora: Seq[String] = named.keys.toSeq.sorted
}
