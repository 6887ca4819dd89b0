package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming/batch equivalence: replaying staged input through the REAL
  * Structured Streaming path (file source → AvailableNow → complete-mode
  * memory sink) must reproduce the batch aggregate over the same input —
  * the property op_stream_nexus's oracle certifies at the harness level. */
class ReplaySpec extends SparkSpec {

  test("file-source replay of eventStateTotals equals the batch aggregate") {
    val dir = java.nio.file.Files.createTempDirectory("graft_replay_spec")
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev.write.mode("overwrite").parquet(dir.toString)
      val dim = graft.tax.Dims.stateRates(spark)
      val streamed = Replay.replayComplete(spark, dir.toString, ev.schema,
        st => NexusMonitor.eventStateTotals(st, dim))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      val batch = NexusMonitor.eventStateTotals(ev, dim)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(streamed.nonEmpty)
      assert(streamed == batch)
      // a second replay works (unique memory-sink names — Bench reruns)
      val again = Replay.replayComplete(spark, dir.toString, ev.schema,
        st => NexusMonitor.eventStateTotals(st, dim)).count()
      assert(again == batch.size)
      // the event-time window aggregate replays to its batch equivalent too
      def winKey(r: org.apache.spark.sql.Row) =
        (r.getDate(0).toString, r.getString(1)) ->
          ((r.getLong(2), r.getLong(3)))
      val winStream = Replay.replayComplete(spark, dir.toString, ev.schema,
        st => NexusMonitor.eventDailyTotals(st, dim)).collect().map(winKey).toMap
      val winBatch = NexusMonitor.eventDailyTotals(ev, dim)
        .collect().map(winKey).toMap
      assert(winStream.nonEmpty && winStream == winBatch)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir.toFile)
    }
  }
}
