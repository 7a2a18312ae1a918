package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event row of the corpus `events` table (props omitted — the stateful
  * pipeline doesn't need it). */
case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Per-user running aggregate carried in `GroupState`. */
case class UserAgg(n: Long, firstTs: Long, lastTs: Long)

/** Open-session state carried in `GroupState` by
  * [[StreamPipelines.sessionizeWithState]] (epoch micros). */
case class SessionAcc(start: Long, last: Long, n: Long)

/** One closed session emitted by [[StreamPipelines.sessionizeWithState]].
  * Bounds in epoch micros: int64 output compares exactly across engines and
  * never crosses the ns-parquet/µs-Spark timestamp boundary. */
case class SessionOut(user_id: Long, session_start_us: Long,
    session_last_us: Long, n_events: Long)

/** Per-user emitted summary. */
case class UserStats(user_id: Long, n_events: Long,
    first_ts: java.sql.Timestamp, last_ts: java.sql.Timestamp)

/** One banded MinHash signature row flowing into
  * [[StreamPipelines.neardupStream]] — produced by
  * [[graft.llm.Dedup.bandRows]] so stream and batch see identical buckets. */
case class BandRow(band_id: Int, band_hash: Long, doc_id: Long,
    shingles: Array[Long])

/** One LSH-bucket member kept in near-dup state. */
case class BucketMember(doc_id: Long, shingles: Array[Long])

/** [[BandRow]] with the document's event time — the input of the bounded
  * (default) near-dup state machine, whose dedup horizon is the watermark. */
case class TimedBandRow(band_id: Int, band_hash: Long, doc_id: Long,
    shingles: Array[Long], ts: java.sql.Timestamp)

/** One LSH-bucket member kept in BOUNDED near-dup state: `last_us` (event
  * time, epoch micros) is what the watermark evicts on. */
case class TimedMember(doc_id: Long, shingles: Array[Long], last_us: Long)

/** One verified near-dup hit emitted by [[StreamPipelines.neardupStream]]
  * (doc_a < doc_b; exact shingle-set Jaccard). */
case class NearDupHit(doc_a: Long, doc_b: Long, jaccard: Double)

/** Per-user funnel progression carried in `GroupState` by
  * [[StreamPipelines.funnelWithState]] — stage timestamps in epoch micros,
  * −1 = stage not reached. The machine only moves FORWARD: once a stage
  * timestamp is set it never changes. */
case class FunnelState(t1: Long, t2: Long, t3: Long)

/** One per-user funnel row emitted per touched group per trigger. */
case class FunnelOut(user_id: Long, stage: Int, t1_us: Long, t2_us: Long,
    t3_us: Long)

/** Streaming capability extension (SURVEY.md §2.2 "Streaming"): the same
  * transformations run over `spark.readStream` sources (watermark + windowed
  * state in the streaming engine) and over batch DataFrames (the
  * DuckDB-checkable mode the driver contract uses). StreamingSpec drives
  * them through `MemoryStream` to prove the streaming path; the `q_stream_*`
  * queries drive them in batch.
  */
object StreamPipelines {

  /** Exact double sum for oracle parity. */
  private def dsum(cn: String) = sum(col(cn).cast("decimal(18,4)")).cast("double")

  /** Tumbling 1-hour counts per event type. On a stream, `watermark` bounds
    * state retention for late data; in batch Spark ignores the watermark. */
  def tumbling(events: DataFrame, watermark: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum("value").as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding 1-hour window, 30-minute slide (each event lands in 2 windows). */
  def sliding(events: DataFrame, watermark: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum("value").as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  /** Per-(tumbling-hour, user) value totals — the aggregate under the
    * windowed top-k ("trending") query. The RANK stage deliberately lives
    * outside this function: a per-window total order changes with every
    * incremental update, so the streaming engine cannot maintain it in
    * append mode — the canonical shape is this windowed agg maintained
    * incrementally, with the top-k finalized per closed window in
    * `foreachBatch` (StreamingSpec drives exactly that); in batch the same
    * finalization is a plain rank window over the closed aggregate
    * ([[graft.ops.StreamQueries.qStreamTopk]]). */
  def userWindowTotals(events: DataFrame, watermark: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), dsum("value").as("sum_value"))
      .select(col("w.start").as("w_start"), col("user_id"), col("n"), col("sum_value"))

  /** Streaming deduplication: keep one event per (user_id, event_type) key.
    * On a stream, `dropDuplicatesWithinWatermark` keeps the FIRST ARRIVAL
    * and bounds the key-set state by the watermark — the canonical
    * streaming-ingest dedup (at 100 TB/day the watermark is what keeps the
    * state store finite). Batch replays have no arrival order, so the
    * driver-contract batch analog ([[graft.ops.StreamQueries.qStreamDedup]])
    * pins the deterministic equivalent: first by (ts, event_id). */
  def dedupStream(events: DataFrame, watermark: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Gap-based session windows per user (10-minute inactivity gap). */
  def sessions(events: DataFrame, watermark: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))

  /** Stream-stream interval join: each click joins the purchases of the
    * same user within (click_ts, click_ts + 30 min] — the attribution-join
    * shape. On TWO STREAMS both sides need a watermark and the time-range
    * predicate is what lets the engine expire join state (a click older
    * than watermark + 30 min can never match again); in batch the same plan
    * is a plain equi+range join. Callers aggregate the raw pairs
    * downstream. */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"), col("user_id"),
      col("ts").as("click_ts"))
    val p = purchases.select(col("event_id").as("purchase_id"),
      col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
      col("value").as("purchase_value"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") > col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .drop("p_user_id")
  }

  /** Custom state: per-user running stats via `flatMapGroupsWithState` —
    * the `KeyValueGroupedDataset` stateful-processing surface. Works on both
    * a streaming Dataset (incremental state across triggers) and a batch
    * Dataset (state starts empty, one pass). Emits the updated summary for
    * every group touched in the trigger.
    */
  // Timestamp ⇄ epoch micros (getTime is millis only — nanos carry the
  // sub-millisecond part the corpus actually uses).
  private def micros(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Gap-based sessionization on the CUSTOM-STATE surface — the
    * state-timeout variant of [[sessions]]: one `GroupState[SessionAcc]`
    * per user holds the open session; events within the gap extend it,
    * a gap-crossing event closes it (emitting the summary) and opens the
    * next; on a stream, `GroupStateTimeout.EventTimeTimeout` closes an
    * idle session once the WATERMARK passes `last + gap` — exactly when
    * no in-order event can extend it anymore. This is the shape to reach
    * for when a session must carry custom per-session state or emit custom
    * close records — semantics `session_window` cannot express; for the
    * plain count [[sessions]] stays the declarative (and preferred) form.
    *
    * Scale shape: one shuffle on `user_id`; per-trigger group input is
    * sorted in-memory (a user's events per trigger, not per history —
    * bounded), and state is one 24-byte record per ACTIVE user, expired by
    * the timeout — the state store never grows with history.
    *
    * Batch runs the same function once per group with all events and no
    * timeouts; `flushOpenAtEnd=true` emits the trailing open session —
    * exactly the timeout firing at watermark=∞ when the input ends — which
    * makes the batch output the complete gaps-and-islands sessionization
    * the DuckDB oracle replays. Determinism: per-trigger input order is
    * partitioning-dependent, so rows are sorted by (ts, event_id) before
    * folding.
    */
  def sessionizeWithState(events: Dataset[Event], gapMinutes: Int = 10,
      flushOpenAtEnd: Boolean = false): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            // Watermark passed last + gap: the open session can never be
            // extended by in-order data — close and clear it.
            val a = state.get
            state.remove()
            Iterator.single(SessionOut(userId, a.start, a.last, a.n))
          } else {
            val sorted = rows.toArray.sortBy(e => (micros(e.ts), e.event_id))
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var acc = state.getOption
            for (e <- sorted) {
              val t = micros(e.ts)
              acc = acc match {
                case Some(a) if t - a.last < gapUs =>
                  Some(SessionAcc(a.start, math.max(a.last, t), a.n + 1))
                case Some(a) =>
                  closed += SessionOut(userId, a.start, a.last, a.n)
                  Some(SessionAcc(t, t, 1L))
                case None => Some(SessionAcc(t, t, 1L))
              }
            }
            acc.foreach { a =>
              if (flushOpenAtEnd) {
                closed += SessionOut(userId, a.start, a.last, a.n)
              } else {
                state.update(a)
                state.setTimeoutTimestamp(a.last / 1000L + gapMinutes * 60L * 1000L)
              }
            }
            closed.iterator
          }
      }
  }

  /** Streaming MinHash near-dup detection — the LSH dedup pipeline
    * ([[graft.llm.Dedup.minhashVerifiedPairs]]) as an ONLINE state machine:
    * band rows key by (band_id, band_hash), each bucket's `GroupState`
    * holds the members seen so far, and an arriving document is verified
    * (exact shingle-set Jaccard ≥ 0.2) against exactly its bucket peers —
    * candidate generation stays bucket-local, never all-pairs, the same
    * scale contract as the batch pipeline. A pair sharing several bands
    * emits once per band; downstream consumers `dropDuplicates` on
    * (doc_a, doc_b) — on a stream, `dropDuplicatesWithinWatermark` — the
    * exactly-once-per-pair decision is theirs, keeping this stage
    * shuffle-free beyond the one bucket-key exchange.
    *
    * State posture — THE DEFAULT IS BOUNDED (r5 verdict item 3): a
    * bucket's membership would otherwise grow with the documents that hash
    * into it over the stream's LIFETIME. [[neardupStream]] therefore runs
    * with `GroupStateTimeout.EventTimeTimeout` and evicts members whose
    * event time falls behind the WATERMARK — the dedup horizon is the
    * caller's watermark delay, the `dropDuplicatesWithinWatermark` trade:
    * a dup inside the horizon still matches (its peer is retained), recall
    * decays only past it. The corpus replay ([[neardupStreamUnbounded]])
    * opts into NoTimeout EXPLICITLY so the batch analog (q_stream_neardup)
    * sees the complete pair set the DuckDB oracle replays.
    *
    * Determinism: within a trigger, rows fold in (doc_id) order — arrival
    * order across triggers is the stream's own; over the full corpus the
    * emitted set (after pair-dedup) equals the batch verified pairs
    * whatever the batch boundaries (StreamingSpec proves a split replay
    * equals the one-shot run).
    *
    * @param horizon watermark delay = dedup horizon (event time). */
  def neardupStream(bands: Dataset[TimedBandRow], horizon: String = "30 minutes",
      threshold: Double = 0.2): Dataset[NearDupHit] = {
    import bands.sparkSession.implicits._
    bands
      .withWatermark("ts", horizon)
      .as[TimedBandRow]
      .groupByKey(b => (b.band_id, b.band_hash))
      .flatMapGroupsWithState[Seq[TimedMember], NearDupHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, rows: Iterator[TimedBandRow], state: GroupState[Seq[TimedMember]]) =>
          // Watermark in event-time micros; 0 when the engine has none yet
          // (first trigger, or a batch replay — nothing evicts there).
          // Catch ONLY the no-watermark signals (r6 ADVICE): a blanket Try
          // would swallow unrelated engine errors and silently run the
          // state machine as unbounded (wmUs = 0 disables eviction).
          val wmMs =
            try state.getCurrentWatermarkMs()
            catch {
              case _: UnsupportedOperationException | _: IllegalStateException => 0L
            }
          val wmUs = wmMs * 1000L
          def rearm(members: Seq[TimedMember]): Unit =
            if (members.isEmpty) state.remove()
            else {
              state.update(members)
              // Fire when the OLDEST survivor becomes evictable. Survivors
              // have last_us >= wmUs, so the target is > wm; max() guards
              // the late-data edge (a member admitted below the watermark).
              state.setTimeoutTimestamp(
                math.max(members.map(_.last_us).min / 1000L + 1L, wmMs + 1L))
            }
          if (state.hasTimedOut) {
            rearm(state.get.filter(_.last_us >= wmUs))
            Iterator.empty
          } else {
            var members = state.getOption.getOrElse(Seq.empty)
              .filter(_.last_us >= wmUs)
            val out = scala.collection.mutable.ArrayBuffer.empty[NearDupHit]
            for (r <- rows.toArray.sortBy(_.doc_id)) {
              val sr = r.shingles.toSet
              for (m <- members if m.doc_id != r.doc_id) {
                val sm = m.shingles.toSet
                val inter = sr.count(sm)
                val j = inter.toDouble / (sr.size + sm.size - inter)
                if (j >= threshold) {
                  val (a, b) =
                    if (m.doc_id < r.doc_id) (m.doc_id, r.doc_id)
                    else (r.doc_id, m.doc_id)
                  out += NearDupHit(a, b, j)
                }
              }
              members = members :+ TimedMember(r.doc_id, r.shingles, micros(r.ts))
            }
            rearm(members)
            out.iterator
          }
      }
  }

  /** UNBOUNDED corpus replay of [[neardupStream]] — the explicit NoTimeout
    * opt-in: bucket membership is retained for the stream's lifetime so the
    * emitted pair set equals the batch pipeline's exactly (what the
    * q_stream_neardup oracle replays). Use only on finite replays; a
    * production stream wants the bounded default. */
  def neardupStreamUnbounded(bands: Dataset[BandRow],
      threshold: Double = 0.2): Dataset[NearDupHit] = {
    import bands.sparkSession.implicits._
    bands
      .groupByKey(b => (b.band_id, b.band_hash))
      .flatMapGroupsWithState[Seq[BucketMember], NearDupHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows: Iterator[BandRow], state: GroupState[Seq[BucketMember]]) =>
          var members = state.getOption.getOrElse(Seq.empty)
          val out = scala.collection.mutable.ArrayBuffer.empty[NearDupHit]
          for (r <- rows.toArray.sortBy(_.doc_id)) {
            val sr = r.shingles.toSet
            for (m <- members if m.doc_id != r.doc_id) {
              val sm = m.shingles.toSet
              val inter = sr.count(sm)
              val j = inter.toDouble / (sr.size + sm.size - inter)
              if (j >= threshold) {
                val (a, b) =
                  if (m.doc_id < r.doc_id) (m.doc_id, r.doc_id)
                  else (r.doc_id, m.doc_id)
                out += NearDupHit(a, b, j)
              }
            }
            members = members :+ BucketMember(r.doc_id, r.shingles)
          }
          state.update(members)
          out.iterator
      }
  }

  /** Stream-static enrichment — the dimension-join capability class of
    * Structured Streaming (its own execution path: the static side is NOT
    * stateful, needs no watermark, and is re-resolved per microbatch —
    * Spark broadcasts and reuses it): events join the customer dimension
    * on user_id, hop to nation, and aggregate value per nation name.
    *
    * Scale posture: both build sides are conditional broadcasts — the
    * customer dimension GROWS with the corpus, so past the threshold the
    * hint drops and the per-batch join shuffles (on a stream that is the
    * cue to pre-bucket the dimension instead); nation is fixed-size. The
    * aggregate is the usual partial+final pair; in streaming it runs as
    * an incremental stateful agg (Update/Complete), in batch one-shot. */
  def enrich(events: DataFrame, customers: DataFrame,
      nations: DataFrame): DataFrame =
    events
      .join(graft.ops.Broadcasts.maybeBroadcast(
        customers.select(col("c_custkey"), col("c_nationkey"))),
        col("user_id") === col("c_custkey"))
      .join(graft.ops.Broadcasts.maybeBroadcast(
        nations.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_events"), dsum("value").as("sum_value"))

  /** Stateful 3-stage funnel: each user's signup→click→purchase
    * progression tracked in `GroupState` — t1 = first signup, t2 = first
    * click strictly after t1, t3 = first purchase strictly after t2, the
    * SAME strict-`>` machine as the batch [[graft.ops.EventAnalytics
    * .qFunnel]]. Within a trigger the rows fold in (event-time, event_id)
    * order; ACROSS triggers the machine is forward-only, so arrival order
    * is the stream's ordering contract — a late-arriving earlier stage
    * does not retroactively re-match stages already scanned past (the
    * standard online-funnel semantics; feed in event order, as the corpus
    * file source does, and the result equals the batch funnel exactly —
    * StreamingSpec pins both the equality and the monotone stage
    * progression across triggers). Append mode emits the updated
    * progression row per touched user per trigger. */
  def funnelWithState(events: Dataset[Event]): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    val stages = graft.ops.EventAnalytics.FunnelStages
    events
      .filter(e => stages.contains(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          val init = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          val sorted = rows.toArray.sortBy(e => (micros(e.ts), e.event_id))
          val fin = sorted.foldLeft(init) { (s, e) =>
            val t = micros(e.ts)
            if (s.t1 < 0L && e.event_type == stages(0)) s.copy(t1 = t)
            else if (s.t1 >= 0L && s.t2 < 0L && e.event_type == stages(1) &&
              t > s.t1) s.copy(t2 = t)
            else if (s.t2 >= 0L && s.t3 < 0L && e.event_type == stages(2) &&
              t > s.t2) s.copy(t3 = t)
            else s
          }
          state.update(fin)
          val stage = (if (fin.t1 >= 0L) 1 else 0) +
            (if (fin.t2 >= 0L) 1 else 0) + (if (fin.t3 >= 0L) 1 else 0)
          Iterator.single(FunnelOut(uid, stage, fin.t1, fin.t2, fin.t3))
      }
  }

  def statefulUserStats(events: Dataset[Event]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserAgg, UserStats](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[UserAgg]) =>
          val init = state.getOption.getOrElse(UserAgg(0L, Long.MaxValue, Long.MinValue))
          val agg = rows.foldLeft(init) { (a, e) =>
            val t = micros(e.ts)
            UserAgg(a.n + 1, math.min(a.firstTs, t), math.max(a.lastTs, t))
          }
          state.update(agg)
          Iterator.single(UserStats(userId, agg.n,
            fromMicros(agg.firstTs), fromMicros(agg.lastTs)))
      }
  }
}
