package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Event, StreamPipelines}

/** Drives the streaming pipelines through the real streaming engine
  * (MemoryStream source → windowed/stateful transforms → memory sink),
  * proving the `q_stream_*` batch queries share semantics with an actual
  * `readStream` execution — including incremental state across triggers.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:$second%02d")

  private def ev(id: Long, t: Timestamp, user: Long, typ: String = "click",
      value: Double = 1.0): Event = Event(id, t, user, typ, value)

  test("tumbling window aggregation over a real stream (two triggers)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val query = StreamPipelines.tumbling(source.toDF(), watermark = "2 hours")
      .writeStream.format("memory").queryName("tumbling_sink")
      .outputMode(OutputMode.Complete).start()
    try {
      source.addData(ev(1, ts(5), 1), ev(2, ts(10), 2))
      query.processAllAvailable()
      source.addData(ev(3, ts(20), 1, "view", 2.5))
      query.processAllAvailable()
      val rows = spark.table("tumbling_sink")
        .orderBy("w_start", "event_type")
        .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(rows.toSeq === Seq(("click", 2L, 2.0), ("view", 1L, 2.5)))
    } finally query.stop()
  }

  test("windowed top-k finalizes per batch over the incremental aggregate (foreachBatch)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val latest = new java.util.concurrent.atomic.AtomicReference[Seq[(Long, Int)]](Nil)
    // The rank cannot live inside the incremental engine (it re-orders on
    // every update) — foreachBatch finalizes the top-k from the maintained
    // windowed aggregate each trigger, the canonical trending shape.
    val query = StreamPipelines.userWindowTotals(source.toDF(), watermark = "2 hours")
      .writeStream.outputMode(OutputMode.Complete)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("w_start"))
          .orderBy(col("sum_value").desc, col("user_id").asc)
        latest.set(batch.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 2)
          .orderBy(col("w_start"), col("rank"))
          .collect().toIndexedSeq.map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("rank"))))
      }.start()
    try {
      source.addData(ev(1, ts(5), 1, value = 1.0), ev(2, ts(10), 2, value = 5.0))
      query.processAllAvailable()
      assert(latest.get() === Seq((2L, 1), (1L, 2)))
      // User 1 overtakes user 2 within the same window on the next trigger.
      source.addData(ev(3, ts(20), 1, value = 9.0), ev(4, ts(25), 3, value = 2.0))
      query.processAllAvailable()
      assert(latest.get() === Seq((1L, 1), (2L, 2)))
    } finally query.stop()
  }

  test("watermark drops events that arrive later than the bound (append mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    // Append mode only emits a window once the watermark passes its end —
    // and an event older than the watermark must be DROPPED, not merged.
    val query = StreamPipelines.tumbling(source.toDF(), watermark = "15 minutes")
      .writeStream.format("memory").queryName("late_sink")
      .outputMode(OutputMode.Append).start()
    try {
      source.addData(ev(1, ts(5), 1), ev(2, ts(10), 2))
      query.processAllAvailable()
      // Advance event time ~2h: watermark moves past the 00:00 window end.
      source.addData(Event(3, Timestamp.valueOf("2024-01-01 02:00:00"), 1, "click", 1.0))
      query.processAllAvailable()
      val closed = spark.table("late_sink")
        .filter(org.apache.spark.sql.functions.col("w_start") === Timestamp.valueOf("2024-01-01 00:00:00"))
        .collect()
      assert(closed.map(_.getAs[Long]("n")).sum === 2, "00:00 window emitted with 2 events")
      // A straggler inside the long-closed 00:00 window: watermark kills it.
      source.addData(ev(4, ts(20), 3))
      query.processAllAvailable()
      val after = spark.table("late_sink")
        .filter(org.apache.spark.sql.functions.col("w_start") === Timestamp.valueOf("2024-01-01 00:00:00"))
        .collect()
      assert(after.map(_.getAs[Long]("n")).sum === 2,
        "late event must be dropped, not re-opened into the closed window")
    } finally query.stop()
  }

  test("update mode re-emits only the changed window rows per trigger") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val query = StreamPipelines.tumbling(source.toDF(), watermark = "2 hours")
      .writeStream.format("memory").queryName("update_sink")
      .outputMode(OutputMode.Update).start()
    try {
      source.addData(ev(1, ts(5), 1), ev(2, ts(10), 2))
      query.processAllAvailable()
      val t1 = spark.table("update_sink").count()
      source.addData(ev(3, ts(20), 1)) // same (window, type) key updates
      query.processAllAvailable()
      val rows = spark.table("update_sink").collect()
      // Update mode appends the REVISED row for the touched key only: the
      // sink holds the trigger-1 row (n=2) plus the trigger-2 revision (n=3).
      assert(t1 === 1)
      assert(rows.map(_.getAs[Long]("n")).toSeq.sorted === Seq(2L, 3L))
    } finally query.stop()
  }

  test("streaming dedup keeps one event per key across triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val query = StreamPipelines.dedupStream(source.toDF(), watermark = "2 hours")
      .writeStream.format("memory").queryName("dedup_sink")
      .outputMode(OutputMode.Append).start()
    try {
      source.addData(ev(1, ts(5), 1), ev(2, ts(6), 1)) // same (user, type) key
      query.processAllAvailable()
      source.addData(ev(3, ts(7), 1), ev(4, ts(8), 2)) // dup key + new key
      query.processAllAvailable()
      val rows = spark.table("dedup_sink")
        .select("event_id", "user_id").orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // First arrival per (user_id, event_type) survives; later dups don't.
      assert(rows.toSeq === Seq((1L, 1L), (4L, 2L)))
    } finally query.stop()
  }

  test("session windows merge within the gap and split past it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val query = StreamPipelines.sessions(source.toDF(), watermark = "2 hours")
      .writeStream.format("memory").queryName("session_sink")
      .outputMode(OutputMode.Complete).start()
    try {
      // user 1: events 5min apart (one session), then a 15-min gap (new one).
      source.addData(
        ev(1, ts(0), 1), ev(2, ts(5), 1), ev(3, ts(20), 1), ev(4, ts(0), 2))
      query.processAllAvailable()
      val rows = spark.table("session_sink")
        .orderBy("user_id", "session_start")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      assert(rows.toSeq === Seq(
        (1L, ts(0), 2L), (1L, ts(20), 1L), (2L, ts(0), 1L)))
    } finally query.stop()
  }

  test("state-timeout sessionizer: idle sessions close when the watermark passes the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def us(t: Timestamp): Long = t.getTime * 1000L
    val source = MemoryStream[Event]
    // EventTimeTimeout requires a watermark on the input stream.
    val sessions = StreamPipelines.sessionizeWithState(
      source.toDF().withWatermark("ts", "5 minutes").as[Event])
    val query = sessions.writeStream.format("memory").queryName("sstate_sink")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 5 min apart — ONE open session; nothing emits
      // (append mode only carries closed sessions).
      source.addData(ev(1, ts(0), 1), ev(2, ts(5), 1))
      query.processAllAvailable()
      assert(spark.table("sstate_sink").isEmpty)
      // An unrelated user's event at 01:00 advances the watermark to 00:55 —
      // past user 1's last+gap (00:15) — so the EventTimeTimeout fires in
      // the follow-up no-data batch and closes the idle session. User 2's
      // own fresh session must stay open (no row).
      source.addData(ev(3, Timestamp.valueOf("2024-01-01 01:00:00"), 2))
      query.processAllAvailable()
      val closed = spark.table("sstate_sink")
        .orderBy("user_id", "session_start_us").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(closed.toSeq === Seq((1L, us(ts(0)), us(ts(5)), 2L)))
      // A gap-crossing event closes the previous session on the DATA path
      // (no timeout involved): user 2 returns 20 min later.
      source.addData(ev(4, Timestamp.valueOf("2024-01-01 01:20:00"), 2))
      query.processAllAvailable()
      val after = spark.table("sstate_sink")
        .orderBy("user_id", "session_start_us").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(after.toSeq === Seq(
        (1L, us(ts(0)), us(ts(5)), 2L),
        (2L, us(Timestamp.valueOf("2024-01-01 01:00:00")),
          us(Timestamp.valueOf("2024-01-01 01:00:00")), 1L)))
      // Batch parity: the same events through the batch path (open sessions
      // flushed — the end-of-input timeout) = the streamed closed sessions
      // plus the two still-open ones.
      val batch = StreamPipelines.sessionizeWithState(
        Seq(ev(1, ts(0), 1), ev(2, ts(5), 1),
          ev(3, Timestamp.valueOf("2024-01-01 01:00:00"), 2),
          ev(4, Timestamp.valueOf("2024-01-01 01:20:00"), 2)).toDS(),
        flushOpenAtEnd = true)
        .collect().map(s => (s.user_id, s.session_start_us, s.session_last_us, s.n_events))
        .sortBy(t => (t._1, t._2))
      assert(batch.toSeq === Seq(
        (1L, us(ts(0)), us(ts(5)), 2L),
        (2L, us(Timestamp.valueOf("2024-01-01 01:00:00")),
          us(Timestamp.valueOf("2024-01-01 01:00:00")), 1L),
        (2L, us(Timestamp.valueOf("2024-01-01 01:20:00")),
          us(Timestamp.valueOf("2024-01-01 01:20:00")), 1L)))
    } finally query.stop()
  }

  test("flatMapGroupsWithState accumulates state across triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val query = StreamPipelines.statefulUserStats(source.toDS())
      .writeStream.format("memory").queryName("stateful_sink")
      .outputMode(OutputMode.Append).start()
    try {
      source.addData(ev(1, ts(1), 7), ev(2, ts(2), 7))
      query.processAllAvailable()
      source.addData(ev(3, ts(9), 7))
      query.processAllAvailable()
      // Append mode emits one row per trigger per touched group; the last
      // row carries the accumulated state (n=3 spanning both triggers).
      val rows = spark.table("stateful_sink")
        .orderBy("n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getTimestamp(3)))
      assert(rows.last === ((7L, 3L, ts(1), ts(9))))
    } finally query.stop()
  }

  test("checkpointed restart: offsets and GroupState recover across a stop/start") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The memory sink cannot recover from a checkpoint — state recovery
    // needs a fault-tolerant sink, so the stateful output goes to parquet
    // (same pairing a production job uses).
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_ckpt_out").toString
    val source = MemoryStream[Event]
    def start() = StreamPipelines.statefulUserStats(source.toDS())
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    // Run 1: two events for user 7, then stop — the n=2 accumulator lives
    // only in the checkpointed state store now.
    val q1 = start()
    try {
      source.addData(ev(1, ts(1), 7), ev(2, ts(2), 7))
      q1.processAllAvailable()
    } finally q1.stop()
    // Data arriving while the query is down…
    source.addData(ev(3, ts(9), 7))
    // …is folded by the restarted query into the RECOVERED state: an n=3
    // row proves offset replay AND state recovery (a fresh state store
    // would emit n=1).
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val counts = spark.read.parquet(out)
      .filter($"user_id" === 7L).select("n_events")
      .collect().map(_.getLong(0)).sorted
    assert(counts.toSeq === Seq(2L, 3L), "recovered state must continue 2 -> 3")
  }

  test("file-source streaming: readStream over JSON files drives the same pipeline") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    val events = Seq(ev(1, ts(5), 1), ev(2, ts(10), 2), ev(3, ts(40), 3, "view", 2.0))
    events.toDF().coalesce(1).write.mode("overwrite").json(dir)
    val stream = spark.readStream
      .schema(events.toDF().schema)
      .json(dir)
    assert(stream.isStreaming)
    val query = StreamPipelines.tumbling(stream, watermark = "2 hours")
      .writeStream.format("memory").queryName("file_sink")
      .outputMode(OutputMode.Complete).start()
    try {
      query.processAllAvailable()
      val rows = spark.table("file_sink")
        .orderBy("w_start", "event_type")
        .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(rows.toSeq === Seq(("click", 2L, 2.0), ("view", 1L, 2.0)))
    } finally query.stop()
  }

  test("stream-stream interval join matches clicks to in-window purchases") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = StreamPipelines.clickPurchaseJoin(
      clicks.toDF().withWatermark("ts", "2 hours"),
      purchases.toDF().withWatermark("ts", "2 hours"))
    val query = joined.writeStream.format("memory").queryName("sjoin_sink")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(ev(1, ts(0), 1), ev(2, ts(0), 2))
      purchases.addData(
        ev(10, ts(10), 1, "purchase", 5.0),  // 10 min after click 1: match
        ev(11, ts(45), 1, "purchase", 7.0),  // 45 min after: outside window
        ev(12, ts(20), 3, "purchase", 9.0))  // user with no click
      query.processAllAvailable()
      val rows = spark.table("sjoin_sink")
        .select("click_id", "user_id", "purchase_id", "purchase_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(rows.toSeq === Seq((1L, 1L, 10L, 5.0)))
    } finally query.stop()
  }

  test("file sink + checkpoint: restart resumes exactly-once, no duplicates") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val out = java.nio.file.Files.createTempDirectory("graft_fsink_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fsink_ckpt").toString
    def start() = source.toDF().select(col("event_id"), col("user_id"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    // Trigger 1, then a hard stop; the checkpoint records committed offsets.
    val q1 = start()
    source.addData(ev(1, ts(1), 1), ev(2, ts(2), 2))
    q1.processAllAvailable(); q1.stop()
    // Data arriving while down + restart from the same checkpoint: the
    // restarted query must emit ONLY the unprocessed offsets (exactly-once
    // into the transactional file sink), never re-emit batch 0.
    source.addData(ev(3, ts(3), 3))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val ids = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L))
  }

  test("batch and streaming tumbling agree on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(ev(1, ts(5), 1), ev(2, ts(10), 2), ev(3, ts(40), 3, "view"))
    val batch = StreamPipelines.tumbling(events.toDF())
      .orderBy("w_start", "event_type").collect().toSeq
    val source = MemoryStream[Event]
    val query = StreamPipelines.tumbling(source.toDF(), watermark = "2 hours")
      .writeStream.format("memory").queryName("parity_sink")
      .outputMode(OutputMode.Complete).start()
    try {
      source.addData(events: _*)
      query.processAllAvailable()
      val streamed = spark.table("parity_sink")
        .orderBy("w_start", "event_type").collect().toSeq
      assert(streamed === batch)
    } finally query.stop()
  }

  test("streaming near-dup: bucket state matches the batch pair set across trigger splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (0L, base),
      (1L, base.replace("today", "tomorrow")),
      (2L, "completely unrelated content about databases and query optimizers yes"),
      (3L, base), // exact dup of doc 0 — every band collides by construction
      (4L, "another set of words sharing nothing with anything else at all"))
      .toDF("doc_id", "text")
    val bands = graft.llm.Dedup.bandRows(docs)
      .as[graft.streaming.BandRow].collect()
    // Independent expectation: pairs sharing >= 1 band bucket whose exact
    // shingle-set jaccard clears the 0.2 threshold.
    val byDoc = bands.groupBy(_.doc_id)
    val ids = byDoc.keys.toSeq.sorted
    val expected = (for {
      a <- ids; b <- ids if a < b
      if bands.exists(x => x.doc_id == a && bands.exists(y =>
        y.doc_id == b && y.band_id == x.band_id && y.band_hash == x.band_hash))
      sa = byDoc(a).head.shingles.toSet
      sb = byDoc(b).head.shingles.toSet
      inter = sa.intersect(sb).size
      if inter.toDouble / (sa.size + sb.size - inter) >= 0.2
    } yield (a, b)).toSet
    assert(expected.contains((0L, 3L)), "planted cross-trigger pair must verify")
    val source = MemoryStream[graft.streaming.BandRow]
    val query = StreamPipelines.neardupStreamUnbounded(source.toDS())
      .writeStream.format("memory").queryName("neardup_sink")
      .outputMode(OutputMode.Append).start()
    try {
      // Trigger 1: docs 0-2. Doc 3's near-dups of 0/1 arrive only in
      // trigger 2 — matching them requires the bucket STATE to have
      // retained trigger 1's members.
      source.addData(bands.filter(_.doc_id <= 2).toIndexedSeq: _*)
      query.processAllAvailable()
      val afterB1 = spark.table("neardup_sink")
        .as[graft.streaming.NearDupHit].collect().map(h => (h.doc_a, h.doc_b)).toSet
      assert(!afterB1.exists(_._2 >= 3L), "no pair can involve an unseen doc")
      source.addData(bands.filter(_.doc_id >= 3).toIndexedSeq: _*)
      query.processAllAvailable()
      // A pair sharing several bands emits once per band — the pair
      // IDENTITY set (the downstream dropDuplicates contract) must equal
      // the batch expectation exactly.
      val got = spark.table("neardup_sink")
        .as[graft.streaming.NearDupHit].collect().map(h => (h.doc_a, h.doc_b)).toSet
      assert(got === expected, "split replay equals the one-shot batch pair set")
    } finally query.stop()
  }

  test("bounded near-dup: dup inside the horizon still matches after older members evict; recall decays past it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{NearDupHit, TimedBandRow}
    def t(hhmm: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $hhmm:00")
    // One shared LSH bucket (band 0, hash 42). A and B are DISSIMILAR
    // (no hit on arrival); C matches only B, D matches only A, E matches
    // only C. Unrelated rows in bucket 999 exist solely to advance the
    // watermark between triggers.
    val sA = Array(1L, 2L, 3L, 4L, 5L)
    val sB = Array(10L, 11L, 12L, 13L, 14L, 15L)
    def row(doc: Long, sh: Array[Long], ts: java.sql.Timestamp) =
      TimedBandRow(0, 42L, doc, sh, ts)
    def tick(doc: Long, ts: java.sql.Timestamp) =
      TimedBandRow(0, 999L, doc, Array(doc * 1000L), ts)
    val source = MemoryStream[TimedBandRow]
    val query = StreamPipelines.neardupStream(source.toDS(), horizon = "10 minutes")
      .writeStream.format("memory").queryName("neardup_bounded_sink")
      .outputMode(OutputMode.Append).start()
    def hits() = spark.table("neardup_bounded_sink")
      .as[NearDupHit].collect().map(h => (h.doc_a, h.doc_b)).toSet
    try {
      // Trigger 1: A @10:00, B @11:00 → no hit; watermark after = 10:50,
      // past A's event time, so A evicts on the bucket's next access.
      source.addData(row(1L, sA, t("10:00")), row(2L, sB, t("11:00")))
      query.processAllAvailable()
      assert(hits() === Set.empty, "A and B are below the threshold")
      // Trigger 2: C @11:05 matches B (inside horizon — B retained even
      // though A just timed out of the same bucket); D @11:06 matches only
      // A, which is past the horizon → no hit: recall decayed exactly as
      // documented, not silently wrong.
      source.addData(row(3L, sB.take(4), t("11:05")), row(4L, sA.take(3), t("11:06")))
      query.processAllAvailable()
      assert(hits() === Set((2L, 3L)),
        "B~C matches inside the horizon; A~D is past it")
      // Triggers 3-4: only watermark ticks (12:00 then 13:00, other
      // bucket). After trigger 3 the watermark (11:50) passes B and C, so
      // the bucket's EventTimeTimeout fires in trigger 4 and clears it.
      source.addData(tick(100L, t("12:00")))
      query.processAllAvailable()
      source.addData(tick(101L, t("13:00")))
      query.processAllAvailable()
      // Trigger 5: E @13:05 matches C exactly — but C is past the horizon
      // and its bucket state was expired by the timeout, not leaked.
      source.addData(row(5L, sB.take(4), t("13:05")))
      query.processAllAvailable()
      assert(hits() === Set((2L, 3L)),
        "expired bucket emits nothing: state is bounded by the horizon")
    } finally query.stop()
  }

  test("stream-static enrichment: dimension join per microbatch, incremental aggregate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val customers = Seq((1L, 10L), (2L, 10L), (3L, 20L))
      .toDF("c_custkey", "c_nationkey")
    val nations = Seq((10L, "FRANCE"), (20L, "KENYA")).toDF("n_nationkey", "n_name")
    val source = MemoryStream[Event]
    val query = StreamPipelines.enrich(source.toDF(), customers, nations)
      .writeStream.format("memory").queryName("enrich_sink")
      .outputMode(OutputMode.Complete).start()
    try {
      source.addData(ev(1, ts(1), 1, value = 2.0), ev(2, ts(2), 3, value = 5.0))
      query.processAllAvailable()
      source.addData(ev(3, ts(3), 2, value = 1.5)) // second FRANCE user, new trigger
      query.processAllAvailable()
      val rows = spark.table("enrich_sink").orderBy("n_name")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      // The trigger-2 event must MERGE into trigger-1's running aggregate
      // (incremental stateful agg over the static-enriched stream).
      assert(rows.toSeq === Seq(("FRANCE", 2L, 3.5), ("KENYA", 1L, 5.0)))
    } finally query.stop()
  }

  test("stream funnel: stage progression is monotone across triggers and matches batch on in-order feed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val query = StreamPipelines.funnelWithState(source.toDS())
      .writeStream.format("memory").queryName("funnel_sink")
      .outputMode(OutputMode.Append).start()
    try {
      // Trigger 1: signup then an out-of-order click WITHIN the batch
      // (arrives first, stamps later) — the in-batch event-time sort must
      // still advance both stages. A purchase at the SAME micro as the
      // click must NOT count (strict >).
      source.addData(
        ev(2, ts(5), 7, "click"),
        ev(1, ts(1), 7, "signup"),
        ev(3, ts(5), 7, "purchase"))
      query.processAllAvailable()
      val r1 = spark.table("funnel_sink").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(r1.toSeq === Seq((7L, 2, micros(ts(1)), micros(ts(5)), -1L)))
      // Trigger 2: the purchase completes the funnel; a second signup is
      // ignored (forward-only machine).
      source.addData(ev(4, ts(9), 7, "purchase"), ev(5, ts(10), 7, "signup"))
      query.processAllAvailable()
      val r2 = spark.table("funnel_sink").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(r2.last === ((7L, 3, micros(ts(1)), micros(ts(5)), micros(ts(9)))))
      // In-order feed across triggers == one-shot batch run of the same
      // pipeline (the q_stream_funnel batch mode).
      val batch = StreamPipelines.funnelWithState(
        Seq(ev(2, ts(5), 7, "click"), ev(1, ts(1), 7, "signup"),
          ev(3, ts(5), 7, "purchase"), ev(4, ts(9), 7, "purchase"),
          ev(5, ts(10), 7, "signup")).toDS()).collect()
        .map(o => (o.user_id, o.stage, o.t1_us, o.t2_us, o.t3_us))
      assert(batch.toSeq === Seq(r2.last))
    } finally query.stop()
  }

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000) % 1000L
}
