package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Skew handling (SURVEY.md §2.2 scale posture; the "salting for skew"
  * path when AQE's skew-join split doesn't apply, e.g. a groupBy where a
  * handful of keys hold most rows).
  *
  * `saltedAgg` runs the aggregation in two stages: stage 1 groups by
  * (key, salt) so one hot key fans out over `salts` reducers; stage 2
  * merges the partial aggregates per key. Results are identical to the
  * direct groupBy for any algebraic aggregate (sum/count here) — the
  * q_agg_salted oracle asserts exactly that.
  */
object Skew {

  /** Deterministic salt in [0, salts): hashed from `saltSource` (pick a
    * high-cardinality column; determinism keeps results hash-checkable —
    * `rand()` would salt differently per retry/partitioning). */
  private def salt(saltSource: Column, salts: Int): Column =
    pmod(xxhash64(saltSource), lit(salts.toLong))

  /** Two-stage sum+count per key. */
  def saltedAgg(df: DataFrame, key: Column, value: Column, saltSource: Column,
      salts: Int): DataFrame = {
    val partial = df
      .groupBy(key.as("k"), salt(saltSource, salts).as("_salt"))
      .agg(
        sum(value.cast("decimal(18,4)")).as("_psum"),
        count(lit(1)).as("_pcnt"))
    partial
      .groupBy(col("k"))
      .agg(
        sum(col("_psum")).cast("double").as("total"),
        sum(col("_pcnt")).as("n"))
  }

  /** q_agg_salted: the skew-safe aggregation over lineitem's 3-value
    * returnflag (a genuinely hot grouping at scale — ~N/3 rows per key).
    * Oracle = the plain GROUP BY: salting must not change results. */
  def qAggSalted(spark: SparkSession, d: String): DataFrame =
    saltedAgg(
      Tables.lineitem(spark, d),
      key = col("l_returnflag"),
      value = col("l_quantity"),
      saltSource = col("l_orderkey"),
      salts = 64)
      .select(col("k").as("l_returnflag"), col("total"), col("n"))
      .orderBy(col("l_returnflag"))

  /** q_join_salted: skew-safe shuffle JOIN by key salting — the fact side
    * salts each row into one of `salts` sub-keys, the (tiny) dim side is
    * replicated once per salt, and the join runs on (key, salt) so a hot
    * key's rows spread over `salts` reducers instead of one. This is the
    * manual fallback when the small side is too big to broadcast and AQE's
    * skew split can't apply (e.g. the shuffle feeding the join isn't bare).
    * Results must equal the unsalted join — the oracle is the plain SQL
    * join. The dim here is a 3-row weights literal keyed on the genuinely
    * hot `l_returnflag` (~N/3 rows per key). */
  def qJoinSalted(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val salts = 16
    val dim = Seq(("A", 2L), ("N", 3L), ("R", 5L)).toDF("rf", "w")
    val dimRep = dim.crossJoin(
      spark.range(salts).select(col("id").cast("int").as("_salt")))
    val fact = Tables.lineitem(spark, d)
      .withColumn("_salt", salt(col("l_orderkey"), salts).cast("int"))
    fact
      .hint("shuffle_hash")
      .join(dimRep, fact("l_returnflag") === dimRep("rf") &&
        fact("_salt") === dimRep("_salt"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum((col("l_quantity") * col("w")).cast("decimal(18,4)")).cast("double")
          .as("weighted_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** q_skew_aqe: the AQE-native answer to the same hot-key join that
    * q_join_salted handles by hand — a plain (unsalted) sort-merge join of
    * lineitem onto a 3-row weights dim keyed on `l_returnflag`, where each
    * key holds ~N/3 of the fact table. No salting, no replication: the
    * declarative plan leaves skew handling to AQE's `OptimizeSkewedJoin`,
    * which splits an oversized shuffle partition into advisory-sized
    * sub-reads at runtime and duplicates the matching build-side partition
    * per split. That is the preferred 100 TB posture whenever the skewed
    * shuffle feeds the join directly (manual salting — q_join_salted —
    * remains for shapes AQE can't split, e.g. pre-aggregated inputs).
    *
    * The merge hint pins SMJ (a 3-row dim would otherwise broadcast and
    * there'd be no shuffle to split); the final aggregate is GLOBAL, not
    * keyed, so the post-join stage imposes no required distribution and the
    * skew split applies without `forceOptimizeSkewedJoin`. PlanShapeSpec
    * proves the runtime split fires under production-shaped thresholds
    * (skewedPartitionFactor/ThresholdInBytes scaled to the gate corpus) and
    * that results are threshold-invariant. Oracle = the plain SQL join. */
  def qSkewAqe(spark: SparkSession, d: String): DataFrame =
    skewAqeJoin(spark, Tables.lineitem(spark, d))

  /** The join+aggregate body of [[qSkewAqe]] over any fact relation with
    * (l_returnflag, l_quantity). Split out so PlanShapeSpec can drive the
    * SAME operator with a multi-map-task fact: AQE splits a skewed reduce
    * partition at MAPPER-output boundaries, and the gate corpus is one
    * single-row-group parquet file (one map task — nothing to split at),
    * whereas a 100 TB scan has thousands. The spec supplies the map
    * parallelism a production scan would and proves `skew=true` fires on
    * this exact plan; the gate query keeps the clean scan-direct shape
    * (the ScaleUp corpus writes row-group-splittable files, so the rf
    * exchange has real mapper boundaries at the 10×/30× legs too). */
  private[graft] def skewAqeJoin(spark: SparkSession, fact: DataFrame): DataFrame = {
    import spark.implicits._
    val dim = Seq(("A", 2L), ("N", 3L), ("R", 5L)).toDF("rf", "w")
    fact
      .join(dim.hint("merge"), col("l_returnflag") === col("rf"))
      .agg(
        sum((col("l_quantity") * col("w")).cast("decimal(18,4)")).cast("double")
          .as("weighted_qty"),
        count(lit(1)).as("n"))
  }

  val oracles: Map[String, String] = Map(
    "q_skew_aqe" ->
      """SELECT
        |  CAST(CAST(sum(CAST(l_quantity * w AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS weighted_qty,
        |  count(*) AS n
        |FROM lineitem
        |JOIN (VALUES ('A', 2), ('N', 3), ('R', 5)) AS dim(rf, w)
        |  ON l_returnflag = rf""".stripMargin,
    "q_join_salted" ->
      """SELECT l_returnflag,
        |  CAST(CAST(sum(CAST(l_quantity * w AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS weighted_qty,
        |  count(*) AS n
        |FROM lineitem
        |JOIN (VALUES ('A', 2), ('N', 3), ('R', 5)) AS dim(rf, w)
        |  ON l_returnflag = rf
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_salted" ->
      """SELECT l_returnflag,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
