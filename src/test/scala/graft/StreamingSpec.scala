package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.{Tables => T}
import graft.ops.Streaming

/** Streaming semantics (SURVEY §5.2.4): the SAME transform definitions run
  * in batch mode (declared queries, DuckDB-oracle-checked) and in streaming
  * mode. These specs execute the streaming flavor over a MemoryStream with
  * Trigger.AvailableNow and assert result equality with the batch run, plus
  * the watermark's late-data drop contract. */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
  event_type: String, value: Double)

class StreamingSpec extends SparkSpecBase {

  private def tsAt(minute: Int): Timestamp =
    Timestamp.valueOf(f"2025-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  private val sample: Seq[Ev] = Seq(
    Ev(1, tsAt(0), 1, "click", 1.0),
    Ev(2, tsAt(5), 1, "click", 2.0),
    Ev(3, tsAt(20), 1, "click", 3.0),   // >10min gap → new session for user 1
    Ev(4, tsAt(2), 2, "view", 4.0),
    Ev(5, tsAt(61), 2, "view", 5.0),    // second hour window
    Ev(6, tsAt(61), 2, "view", 5.0),    // same-key duplicate (dedup target)
  )

  /** Run a streaming transform over the sample via MemoryStream and return
    * the complete/append result as a batch DataFrame. */
  private def runStream(mode: String)(f: DataFrame => DataFrame): DataFrame = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(sample)
    val q = f(ms.toDF())
    val name = s"t${System.nanoTime()}"
    val query = q.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    query.awaitTermination()
    s.table(name)
  }

  private def batchDf: DataFrame = {
    val s = spark
    import s.implicits._
    s.createDataset(sample).toDF()
  }

  private def sortedRows(df: DataFrame): Seq[Row] = {
    val cols = df.columns.sorted.map(col)
    df.select(cols: _*).collect().toSeq.sortBy(_.toString)
  }

  test("tumbling window counts: stream == batch") {
    val streamed = runStream("complete")(Streaming.tumblingStream)
    val batch = Streaming.tumblingCounts(batchDf)
    assert(sortedRows(streamed) == sortedRows(batch))
    // two hour-buckets expected from the sample
    assert(streamed.select("ws").distinct().count() == 2)
  }

  test("sliding window counts: stream == batch (4 windows per event)") {
    val streamed = runStream("complete")(ev =>
      Streaming.slidingCounts(ev.withWatermark("ts", "1 hour")))
    val batch = Streaming.slidingCounts(batchDf)
    assert(sortedRows(streamed) == sortedRows(batch))
    // each event falls in exactly 4 sliding windows: total n == 4 * events
    val totalN = batch.agg(sum(col("n_events"))).collect()(0).getLong(0)
    assert(totalN == 4L * sample.size)
  }

  test("session windows: stream == batch, 10-min gap splits sessions") {
    val streamed = runStream("complete")(Streaming.sessionStream)
    val batch = Streaming.sessionCounts(batchDf)
    assert(sortedRows(streamed) == sortedRows(batch))
    // user 1: events at +0,+5 then +20 → two sessions
    assert(streamed.filter(col("user_id") === 1).count() == 2)
  }

  test("events_sessionize matches Spark's built-in session_window semantics") {
    // cross-validation of the hand-built lag + running-sum sessionizer
    // against the engine-native gap-based session_window: same gap, same
    // slice — per-(user, session) event counts and start timestamps must
    // agree exactly (session_window's declared END is last-event + gap,
    // so compare ends after subtracting the gap)
    import org.apache.spark.sql.functions._
    val ours = graft.ops.Advanced.eventsSessionize(spark, sf0001)
      .select(col("user_id"), col("n_events"),
        col("session_start"), col("session_end"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2), r.getTimestamp(3))).sortBy(t => (t._1, t._3.getTime))
    val builtin = graft.core.Tables.events(spark, sf0001)
      .filter(col("user_id") % 5 === 0)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("s0"), max(col("ts")).as("s1"))
      .select(col("user_id"), col("n_events"), col("s0"), col("s1"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2), r.getTimestamp(3))).sortBy(t => (t._1, t._3.getTime))
    assert(ours.length == builtin.length,
      s"session count differs: ours ${ours.length}, session_window ${builtin.length}")
    ours.zip(builtin).foreach { case (a, b) =>
      assert(a == b, s"session mismatch: ours $a vs session_window $b")
    }
  }

  test("watermark dedup drops in-batch duplicate keys") {
    val streamed = runStream("append")(Streaming.dedupStream)
    // 6 input events, one (user 2, view) duplicate pair collapses
    assert(streamed.count() == sample.map(e => (e.user_id, e.event_type))
      .distinct.size)
  }

  test("streaming parquet file sink roundtrip equals batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = Files.createTempDirectory("graft-filesink").toString
    val ms = MemoryStream[Ev]
    ms.addData(sample)
    val query = Streaming.tumblingStream(ms.toDF()).writeStream
      .format("parquet").option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/cp")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    query.awaitTermination()
    // append mode only emits watermark-closed windows; push a late marker
    // is unnecessary — AvailableNow finalizes the watermark at stream end
    val back = spark.read.parquet(s"$dir/out")
    val batch = Streaming.tumblingCounts(batchDf)
    // every emitted row must match the batch result exactly
    assert(back.exceptAll(batch).isEmpty)
  }

  test("stateful aggregation survives restart from a RocksDB state-store checkpoint") {
    // the production failure drill: process part of the stream, STOP the
    // query (a crash/redeploy), restart against the SAME checkpoint with
    // the RocksDB state-store provider, feed the rest — the final counts
    // must reflect every event exactly once, with the first run's window
    // state recovered from RocksDB, not recomputed from the source.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val ckpt = Files.createTempDirectory("graft-rocksdb-ckpt").toString
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Ev]
      val name = s"rocks_t${System.nanoTime()}"
      def run(): Unit = {
        val q = Streaming.tumblingStream(ms.toDF()).writeStream
          .format("memory").queryName(name).outputMode("complete")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      ms.addData(sample.take(3))
      run() // run 1: first three events, then the query STOPS
      ms.addData(sample.drop(3))
      run() // run 2: restart from the checkpoint, only the new events
      val batch = Streaming.tumblingCounts(batchDf)
      assert(sortedRows(s.table(name)) == sortedRows(batch),
        "restarted aggregate must equal the one-shot batch over all events")
      // the recovery actually went through on-disk state, not memory
      assert(new java.io.File(s"$ckpt/state").exists(),
        "checkpoint has no state directory — nothing was recovered")
    } finally {
      prev match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
    }
  }

  test("late data beyond the watermark is dropped from open aggregations") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val ms = MemoryStream[Ev]
    val dir = Files.createTempDirectory("graft-late").toString
    val q = Streaming.tumblingStream(ms.toDF())
    val query = q.writeStream.format("memory").queryName("late_t")
      .outputMode("append").option("checkpointLocation", s"$dir/cp")
      .trigger(Trigger.ProcessingTime(100)).start()
    // batch 1: events up to 12:00 → watermark advances to 11:00
    ms.addData(Ev(1, Timestamp.valueOf("2025-01-01 10:05:00"), 1, "click", 1.0))
    ms.addData(Ev(2, Timestamp.valueOf("2025-01-01 12:00:00"), 1, "click", 1.0))
    query.processAllAvailable()
    // batch 2: event at 09:30 is older than watermark − window → dropped
    ms.addData(Ev(3, Timestamp.valueOf("2025-01-01 09:30:00"), 1, "click", 9.0))
    query.processAllAvailable()
    // batch 3: push watermark far ahead so every surviving window closes
    ms.addData(Ev(4, Timestamp.valueOf("2025-01-01 20:00:00"), 1, "click", 1.0))
    query.processAllAvailable()
    query.stop()
    val closed = spark.table("late_t")
    // the 09:30 window must NOT appear — its only event was late
    assert(closed.filter(col("ws") === lit(Timestamp.valueOf("2025-01-01 09:00:00")))
      .count() == 0)
    // the 10:00 window closed with exactly the one on-time event
    val w10 = closed.filter(col("ws") === lit(Timestamp.valueOf("2025-01-01 10:00:00")))
      .collect()
    assert(w10.length == 1 && w10(0).getAs[Long]("n_events") == 1L)
  }

  test("dedup stream drops late rows beyond the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val ms = MemoryStream[Ev]
    val dir = Files.createTempDirectory("graft-late-dedup").toString
    val query = Streaming.dedupStream(ms.toDF()).writeStream
      .format("memory").queryName("late_dedup_t")
      .outputMode("append").option("checkpointLocation", s"$dir/cp")
      .trigger(Trigger.ProcessingTime(100)).start()
    // batch 1: one kept key + a 12:00 row → watermark advances to 11:00
    ms.addData(Ev(1, Timestamp.valueOf("2025-01-01 10:00:00"), 1, "click", 1.0))
    ms.addData(Ev(2, Timestamp.valueOf("2025-01-01 12:00:00"), 1, "view", 1.0))
    query.processAllAvailable()
    // batch 2: a NEVER-SEEN key at 09:00 — older than the watermark, so the
    // dedup operator must drop it instead of emitting it
    ms.addData(Ev(3, Timestamp.valueOf("2025-01-01 09:00:00"), 2, "click", 9.0))
    query.processAllAvailable()
    query.stop()
    val out = spark.table("late_dedup_t")
    assert(out.filter(col("user_id") === 2).count() == 0,
      "late row past the watermark leaked through dedup")
    assert(out.count() == 2)
  }

  test("flatMapGroupsWithState running aggregates == batch window on sf0.001") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val events = T.events(spark, sf0001)
    val rows = events.select(col("user_id"), col("event_id"), col("ts"),
      col("value")).as[(Long, Long, Timestamp, Double)].collect().toSeq
    val ms = MemoryStream[(Long, Long, Timestamp, Double)]
    ms.addData(rows)
    val query = Streaming.statefulStream(ms.toDS()).writeStream
      .format("memory").queryName("stateful_t").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    query.awaitTermination()
    val streamed = spark.table("stateful_t")
    val batch = graft.ops.Streaming.streamStateful(spark, sf0001)
    assert(sortedRows(streamed) == sortedRows(batch))
  }

  test("interval join: stream-stream == batch on sf0.001 events") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val events = T.events(spark, sf0001)
    val rows = events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value")).as[Ev].collect().toSeq
    val ms = MemoryStream[Ev]
    ms.addData(rows)
    val df = ms.toDF()
    val p = df.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val v = df.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user_id"),
        col("ts").as("view_ts"))
    val query = Streaming.intervalJoinStream(p, v).writeStream
      .format("memory").queryName("ij_t").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    query.awaitTermination()
    val streamed = spark.table("ij_t")
    val batch = Streaming.intervalJoin(events)
    assert(sortedRows(streamed) == sortedRows(batch))
    assert(batch.count() > 0, "interval join sample must be non-empty")
  }

  test("declared batch queries equal their streaming execution on sf0.001 events") {
    val events = T.events(spark, sf0001)
    // stream the parquet-backed events table itself via MemoryStream rows
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value")).as[Ev].collect().toSeq
    val ms = MemoryStream[Ev]
    ms.addData(rows)
    val name = "sf_t"
    val query = Streaming.tumblingStream(ms.toDF()).writeStream
      .format("memory").queryName(name).outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    query.awaitTermination()
    val streamed = spark.table(name)
    val batch = Streaming.tumblingCounts(events)
    assert(sortedRows(streamed) == sortedRows(batch))
  }

  test("changelog fold: flatMapGroupsWithState latest == batch last-wins") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val changes = Streaming.changeLog(spark, sf0001)
    val rows = changes.select(col("o_orderkey"), col("o_orderstatus"),
        col("seq"), col("price"))
      .as[(Long, String, Long, Double)].collect().toSeq
    val ms = MemoryStream[(Long, String, Long, Double)]
    ms.addData(rows)
    val query = Streaming.changelogStream(ms.toDS()).writeStream
      .format("memory").queryName("changelog_t").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    query.awaitTermination()
    val dataBatches = query.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches == 1,
      "single-batch assumption (see topk test) — dedup the sink if split")
    val streamed = spark.table("changelog_t")
    val batch = Streaming.changelogLatestRows(changes)
      .select(col("o_orderkey"), col("o_orderstatus"), col("seq"),
        col("price"))
    assert(sortedRows(streamed) == sortedRows(batch))
  }

  test("stateful top-k leaderboard: mapGroupsWithState == batch ranking") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val events = T.events(spark, sf0001)
    val rows = events.select(col("ts"), col("event_type"))
      .as[(Timestamp, String)].collect().toSeq
    val ms = MemoryStream[(Timestamp, String)]
    ms.addData(rows)
    val query = Streaming.topkStream(ms.toDS()).writeStream
      .format("memory").queryName("topk_t").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    query.awaitTermination()
    // update mode re-emits a window's leaderboard on every state change;
    // a single AvailableNow batch emits each window exactly once, so the
    // sink content IS the final snapshot. That assumption is load-bearing
    // (ADVICE r7): a multi-batch run would append superseded leaderboards
    // into the memory sink and the equality below would fail SPURIOUSLY —
    // so pin the assumption explicitly and fail with a diagnosis instead.
    val dataBatches = query.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches == 1,
      s"MemoryStream processed in $dataBatches batches; this assert " +
        "compares the raw update-mode sink, which is only the final " +
        "snapshot under exactly one batch — dedup the sink to the last " +
        "emission per (ws, rnk) if the trigger ever splits the input")
    val streamed = spark.table("topk_t")
    val batch = Streaming.streamTopk(spark, sf0001)
    assert(sortedRows(streamed) == sortedRows(batch))
    assert(batch.groupBy("ws").count().collect().forall(_.getLong(1) <= 3))
  }
}
