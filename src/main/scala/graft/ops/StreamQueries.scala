package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.{Event, StreamPipelines}
import graft.tables.Tables

/** Batch-mode driver-contract wrappers for the streaming pipelines
  * (SURVEY.md §2.3 `q_stream_*`): identical transformations to the
  * `readStream` path, run over the `events` parquet so the DuckDB oracle can
  * check them.
  */
object StreamQueries {

  def qStreamTumbling(spark: SparkSession, d: String): DataFrame =
    StreamPipelines.tumbling(Tables.events(spark, d))
      .orderBy(col("w_start"), col("event_type"))

  def qStreamSliding(spark: SparkSession, d: String): DataFrame =
    StreamPipelines.sliding(Tables.events(spark, d))
      .orderBy(col("w_start"), col("event_type"))

  def qStreamSession(spark: SparkSession, d: String): DataFrame =
    StreamPipelines.sessions(Tables.events(spark, d))
      .orderBy(col("user_id"), col("session_start"))

  /** q_stream_topk: windowed top-3 users by summed value per tumbling hour
    * (the "trending" finalization over [[StreamPipelines.userWindowTotals]]
    * — see its scaladoc for why the rank runs outside the incremental
    * engine). Rank ties are impossible to mis-order: sum_value is the
    * DECIMAL-exact double on both engines and user_id breaks exact ties. */
  def qStreamTopk(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("w_start"))
      .orderBy(col("sum_value").desc, col("user_id").asc)
    StreamPipelines.userWindowTotals(Tables.events(spark, d))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 3)
      .orderBy(col("w_start"), col("rank"))
  }

  /** Batch analog of [[StreamPipelines.dedupStream]]: deterministic
    * first-event-per-key (ordered by event time then id — batch has no
    * arrival order to mirror). Output times as epoch micros so the oracle
    * compare never crosses the nanos/micros parquet boundary. */
  def qStreamDedup(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("first_ts_us"), col("event_id").as("first_event_id"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** Batch analog of [[StreamPipelines.clickPurchaseJoin]] (the streaming
    * path with two watermarked MemoryStreams is proven in StreamingSpec):
    * per-user attribution counts — clicks, matched click→purchase pairs
    * within 30 min, and the attributed purchase value. Pair rows collapse
    * into the per-user aggregate so the output is small and deterministic. */
  def qStreamJoin(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val pairs = StreamPipelines.clickPurchaseJoin(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"))
    pairs
      .groupBy(col("user_id"))
      .agg(
        countDistinct(col("click_id")).as("n_matched_clicks"),
        count(lit(1)).as("n_pairs"),
        sum(col("purchase_value").cast("decimal(18,4)")).cast("double")
          .as("attributed_value"))
      .orderBy(col("user_id"))
  }

  /** Batch mode of [[StreamPipelines.funnelWithState]] — one group
    * iteration per user covers the whole log, so the forward-only state
    * machine sees events in full (ts, event_id) order and the output is
    * the complete funnel progression the oracle replays with per-stage
    * min-eligible CTEs. */
  def qStreamFunnel(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    StreamPipelines.funnelWithState(events).toDF().orderBy(col("user_id"))
  }

  def qStreamStateful(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    StreamPipelines.statefulUserStats(events).toDF().orderBy(col("user_id"))
  }

  /** Batch mode of [[StreamPipelines.sessionizeWithState]] — the
    * state-timeout sessionizer (EventTimeTimeout on streams, proven in
    * StreamingSpec; `flushOpenAtEnd` stands in for the end-of-input timeout
    * here, making the output the complete sessionization the oracle
    * replays). Same 10-minute gap rule as q_stream_session, richer output
    * (session bounds in epoch micros + event count). */
  def qStreamSessionState(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    StreamPipelines.sessionizeWithState(events, flushOpenAtEnd = true)
      .toDF().orderBy(col("user_id"), col("session_start_us"))
  }

  /** DuckDB equivalents. Tumbling 1h == date_trunc; sliding windows are the
    * two 30-min-aligned starts covering each event; sessions via
    * gaps-and-islands (new session when the gap ≥ 10 min — matching
    * `session_window`'s half-open [start, last+gap) merge rule). */
  /** q_stream_neardup: the ONLINE dedup decision of
    * [[StreamPipelines.neardupStream]] in batch form — doc_id is arrival
    * order, so each flagged document reports the FIRST earlier near-dup it
    * would have been matched against (min doc_a over verified pairs) plus
    * its earlier-match count. Derived from the session-cached verified-pair
    * table ([[graft.llm.Dedup.minhashVerifiedPairs]]) — one |pairs|-sized
    * hash-agg on top of the shared pipeline; the streaming path (band-bucket
    * state machine, split-replay = one-shot) is proven in StreamingSpec. */
  def qStreamNeardup(spark: SparkSession, d: String): DataFrame =
    graft.llm.Dedup.minhashVerifiedPairs(spark, d)
      .groupBy(col("doc_b"))
      .agg(min(col("doc_a")).as("dup_of"), count(lit(1)).as("n_earlier_matches"))
      .select(col("doc_b").as("doc_id"), col("dup_of"), col("n_earlier_matches"))
      .orderBy(col("doc_id"))

  /** q_stream_enrich: batch form of [[StreamPipelines.enrich]] — the
    * stream-static dimension join (events → customer → nation) with a
    * per-nation value aggregate; the streaming path (static sides joined
    * per microbatch, incremental aggregate) is proven in StreamingSpec. */
  def qStreamEnrich(spark: SparkSession, d: String): DataFrame =
    StreamPipelines.enrich(Tables.events(spark, d),
      Tables.customer(spark, d), Tables.nation(spark, d))
      .orderBy(col("n_name"))

  val oracles: Map[String, String] = Map(
    "q_stream_funnel" ->
      s"""WITH ${EventAnalytics.funnelCtes},
        |base AS (SELECT DISTINCT user_id FROM f)
        |SELECT b.user_id,
        |  CAST(CASE WHEN u3.t3 IS NOT NULL THEN 3
        |            WHEN u2.t2 IS NOT NULL THEN 2
        |            WHEN u1.t1 IS NOT NULL THEN 1
        |            ELSE 0 END AS INT) AS stage,
        |  coalesce(u1.t1, -1) AS t1_us,
        |  coalesce(u2.t2, -1) AS t2_us,
        |  coalesce(u3.t3, -1) AS t3_us
        |FROM base b
        |LEFT JOIN u1 ON u1.user_id = b.user_id
        |LEFT JOIN u2 ON u2.user_id = b.user_id
        |LEFT JOIN u3 ON u3.user_id = b.user_id
        |ORDER BY b.user_id""".stripMargin,
    "q_stream_enrich" ->
      """SELECT n_name, count(*) AS n_events,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events e
        |JOIN customer c ON c.c_custkey = e.user_id
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_stream_neardup" -> graft.llm.Dedup.streamNeardupOracleSql(),
    "q_stream_topk" ->
      """WITH a AS MATERIALIZED (
        |  SELECT date_trunc('hour', ts) AS w_start, user_id, count(*) AS n,
        |    CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY 1, 2)
        |SELECT w_start, user_id, n, sum_value,
        |  CAST(row_number() OVER (PARTITION BY w_start
        |    ORDER BY sum_value DESC, user_id) AS INT) AS rank
        |FROM a QUALIFY rank <= 3 ORDER BY w_start, rank""".stripMargin,
    "q_stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS w_start, event_type, count(*) AS n,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "q_stream_sliding" ->
      """WITH ev AS (
        |  SELECT event_type, value,
        |    CAST(floor(date_diff('second', TIMESTAMP '1970-01-01', ts) / 1800) AS BIGINT) AS k
        |  FROM events),
        |wins AS (
        |  SELECT make_timestamp((k - o.i) * 1800 * 1000000) AS w_start, event_type, value
        |  FROM ev CROSS JOIN (VALUES (0), (1)) o(i))
        |SELECT w_start, event_type, count(*) AS n,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM wins GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "q_stream_session" ->
      """WITH s AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL '10 minutes'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM s)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
    "q_stream_stateful" ->
      """SELECT user_id, count(*) AS n_events, min(ts) AS first_ts, max(ts) AS last_ts
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // Interval bounds compared in epoch MICROS on both sides: the parquet
    // is ns precision, Spark reads µs — a ns-precision comparison could
    // flip a pair that lands within 999 ns of the 30-min boundary.
    "q_stream_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, value,
        |    date_diff('microsecond', TIMESTAMP '1970-01-01', ts) AS us
        |  FROM events),
        |c AS (SELECT event_id AS click_id, user_id, us AS cus
        |      FROM e WHERE event_type = 'click'),
        |p AS (SELECT event_id, user_id, us AS pus, value
        |      FROM e WHERE event_type = 'purchase'),
        |pairs AS (
        |  SELECT c.user_id, c.click_id, p.value
        |  FROM c JOIN p ON p.user_id = c.user_id
        |   AND p.pus > c.cus AND p.pus <= c.cus + 1800000000)
        |SELECT user_id, count(DISTINCT click_id) AS n_matched_clicks,
        |  count(*) AS n_pairs,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS attributed_value
        |FROM pairs GROUP BY user_id ORDER BY user_id""".stripMargin,
    // Same gaps-and-islands replay as q_stream_session but with the gap
    // test and output bounds in epoch MICROS on both sides (the state
    // function folds µs; a ns-precision oracle gap could flip an event
    // landing within 999 ns of the 10-min boundary).
    "q_stream_session_state" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    date_diff('microsecond', TIMESTAMP '1970-01-01', ts) AS us
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |           OR us - lag(us) OVER w >= 600000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |g AS (
        |  SELECT user_id, us,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM s)
        |SELECT user_id, min(us) AS session_start_us, max(us) AS session_last_us,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start_us""".stripMargin,
    // Ordered on µs-truncated time on both sides (the parquet is ns
    // precision; Spark reads µs) with the event_id tiebreak.
    "q_stream_dedup" ->
      """WITH r AS (
        |  SELECT user_id, event_type, event_id,
        |    date_diff('microsecond', TIMESTAMP '1970-01-01', ts) AS ts_us,
        |    row_number() OVER (
        |      PARTITION BY user_id, event_type
        |      ORDER BY date_diff('microsecond', TIMESTAMP '1970-01-01', ts), event_id) AS rn
        |  FROM events)
        |SELECT user_id, event_type, ts_us AS first_ts_us, event_id AS first_event_id
        |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
  )
}
