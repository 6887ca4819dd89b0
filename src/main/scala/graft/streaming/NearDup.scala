package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash NEAR-dup dedup — the one batch capability the
  * streaming layer didn't mirror ([[Sessions.dedupByContent]] is exact
  * content dedup; [[graft.text.IncrDedup]] is the batch incremental
  * near-dup): documents stream through signature banding, and each LSH
  * band keeps per-band state of the signatures seen, so a new doc is
  * flagged the moment it verifies (≥ `minAgree` of 64 slots) against ANY
  * smaller-id doc sharing a band key.
  *
  * Semantics: the DIRECT-NEIGHBOR smaller-id rule (a doc drops iff some
  * smaller-id doc collides in a band and verifies) — the same rule
  * [[graft.text.IncrSemDedup]] applies per cell, chosen over connected
  * components because a stream must decide each doc AT ARRIVAL; under
  * id-monotone arrival (the ingest contract [[graft.text.IncrDedup]]
  * enforces loudly) the verdicts are deterministic and equal the batch
  * direct-neighbor dedup of the whole replayed corpus, which is what the
  * DuckDB oracle pins. Chains (a~b~c without a~c) differ from CC only in
  * WHICH cluster id survives, never in whether a doc with a verified
  * smaller neighbor drops.
  *
  * Scale/state posture (unbounded stream): state per band key = the
  * (id, signature) list of its members within the WATERMARK HORIZON —
  * band membership is near-dup-cluster-sized (¼-signature equality), so
  * state tracks duplicate density, not traffic; the event-time timeout
  * evicts a band once the watermark passes its last activity + the
  * horizon, the [[Sessions.dedupByContent]] contract (docs colliding
  * farther apart than the horizon are BOTH kept — the documented
  * streaming-dedup trade). Per-band work is |batch members| × |state|
  * signature compares — the same verify economics as the batch band
  * join, arriving incrementally.
  */
object NearDup {

  /** One exploded (band-key, doc, signature) stream row. */
  case class BandDoc(bk: String, doc_id: Long, sig: Seq[Long], ts: Timestamp)

  /** Per-band state: members seen in the horizon (id + signature) and the
    * max event-time seen (for the timeout). */
  case class BandState(ids: List[Long], sigs: List[Seq[Long]], maxTsMs: Long)

  /** Per-band verdict for one doc: did it verify against a smaller-id
    * band-mate here? (OR over a doc's 16 band verdicts = the drop flag.) */
  case class BandVerdict(doc_id: Long, band_dup: Boolean)

  private def agree(a: Seq[Long], b: Seq[Long]): Int = {
    var i = 0; var n = 0
    while (i < a.length) { if (a(i) == b(i)) n += 1; i += 1 }
    n
  }

  /** Per-(doc, band) dup verdicts for a streaming (doc_id, text, ts)
    * frame: portable MinHash signatures and band keys are the narrow
    * codegen maps of the batch path; each band's
    * `flatMapGroupsWithState` keeps the members seen and flags arrivals
    * that verify at `minAgree`. Aggregate `max(band_dup)` per doc_id on
    * the consumer side for the final keep flag. */
  def bandVerdicts(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", tsCol: String = "ts",
      minAgree: Int = 20, horizonMs: Long = 3600000L): Dataset[BandVerdict] = {
    import docs.sparkSession.implicits._
    require(horizonMs > 0, "horizonMs must be positive")
    val sig: Column = graft.text.Dedup.minhashSignaturePortable(col(textCol))
    docs
      .withColumn("sig", sig)
      .select(col(idCol).cast("long").as("doc_id"), col("sig"),
        col(tsCol).as("ts"),
        explode(graft.text.IncrDedup.bandKeys(col("sig"))).as("bk"))
      .select(col("bk"), col("doc_id"), col("sig"), col("ts"))
      .withWatermark("ts", s"$horizonMs milliseconds")
      .as[BandDoc]
      .groupByKey(_.bk)
      .flatMapGroupsWithState[BandState, BandVerdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, evts: Iterator[BandDoc], state: GroupState[BandState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // micro-batches deliver a group unordered — process in id
            // order so in-batch verdicts match id-monotone arrival
            val sorted = evts.toSeq.sortBy(e => (e.doc_id, e.ts.getTime))
            var st = state.getOption.getOrElse(BandState(Nil, Nil, 0L))
            val out = Seq.newBuilder[BandVerdict]
            sorted.foreach { e =>
              val dup = st.ids.iterator.zip(st.sigs.iterator).exists {
                case (id, s) => id < e.doc_id && agree(s, e.sig) >= minAgree
              }
              out += BandVerdict(e.doc_id, dup)
              st = BandState(e.doc_id :: st.ids, e.sig :: st.sigs,
                math.max(st.maxTsMs, e.ts.getTime))
            }
            state.update(st)
            state.setTimeoutTimestamp(st.maxTsMs + horizonMs)
            out.result().iterator
          }
      }
  }
}
