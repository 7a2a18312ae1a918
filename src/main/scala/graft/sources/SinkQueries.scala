package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Source/sink round-trips (SURVEY.md §2.3 capability extension): the write
  * side of the engine. The reference only ever writes a driver-side JSON
  * coloring (`coloring.py:233`); a Spark-native pipeline's sink is a
  * partitioned columnar table, so that's the primitive rebuilt here.
  */
object SinkQueries {

  /** Sink directory for a given sf corpus (under /tmp — the only writable
    * scratch in this environment; one dir per sfDir so scales don't
    * clobber each other). */
  private def sinkDir(d: String): String =
    s"/tmp/graft_sink/${new java.io.File(d).getName}"

  /** q_write_partitioned: write lineitem partitioned by `l_returnflag`
    * (Hive-style directory layout — the standard warehouse sink), read it
    * back with a partition filter, and aggregate. The read-back plan must
    * prune to the single `l_returnflag=R` directory (PlanShapeSpec asserts
    * the scan's partition filter); the oracle is the same aggregate over
    * the original table — a lossy sink would hash-mismatch.
    * Scale posture: `partitionBy` shuffles nothing by itself (each task
    * writes its own partition files); pair it with a `repartition` on the
    * partition column when small-files pressure matters more than write
    * parallelism. Write parallelism comes from the SCAN's row-group
    * splitting, not `Tables.spread`: a parquet-encode sink is IO-dense,
    * and the r10 experiment of spreading it to 32 ways bought 10× wall
    * only on the old single-row-group ScaleUp corpus while costing 11×
    * CPU there and REGRESSING sf0.1 wall 1.48 → 2.26 s — exactly the
    * regime NOTES' spread rule ("CPU-dense downstreams only") excludes.
    * With splittable inputs the scan arrives wide enough on its own. */
  def qWritePartitioned(spark: SparkSession, d: String): DataFrame = {
    val out = s"${sinkDir(d)}/lineitem_by_rf"
    Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"),
        col("l_linestatus"))
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    spark.read.parquet(out)
      .filter(col("l_returnflag") === "R")
      .groupBy(col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_linestatus"))
  }

  /** q_source_csv: CSV round-trip — write a projection as headered CSV,
    * read it back with an explicit schema (schema inference is a full extra
    * pass at scale; production readers always declare), aggregate, and
    * match the oracle computed from the original parquet. Doubles survive
    * the text round-trip exactly (Spark writes shortest-repr, parses back
    * to the same IEEE value); the DECIMAL sum discipline does the rest. */
  def qSourceCsv(spark: SparkSession, d: String): DataFrame = {
    val out = s"${sinkDir(d)}/lineitem_csv"
    Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        col("l_returnflag"))
      .write.mode("overwrite").option("header", "true").csv(out)
    spark.read
      .schema("l_orderkey BIGINT, l_partkey BIGINT, l_quantity DOUBLE, l_returnflag STRING")
      .option("header", "true")
      .csv(out)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** q_source_binary: the `binaryFile` ingestion path — how multimodal
    * assets (images/audio/video) actually enter a pipeline: one opaque file
    * per asset, read as (path, modificationTime, length, content) rows
    * whose `content` feeds the decode stage ([[graft.llm.Multimodal]]).
    * Round-trip: every document's bytes written as `doc_<id>.bin` by a
    * DISTRIBUTED foreachPartition writer through the Hadoop FS API (works
    * on any scheme — no driver-side collect, no java.io locality
    * assumption), read back with `format("binaryFile")`, asset id parsed
    * from the path, and digest accounting per id bucket. The oracle
    * replays byte length + md5-head checksums from the original table
    * (ASCII corpus: chars = bytes, the q_multimodal contract) — a lossy
    * or non-atomic write would hash-mismatch.
    * The asset set is the [[graft.llm.TextStats.qSampleHash]] 10% md5
    * shard: one file PER ASSET is inherent to the format, so the
    * round-trip cost is file-count-bound — the sampled shard exercises
    * every step (distributed write, glob listing, path parse, digest) at
    * a tenth of the files; membership is a pure function of doc_id, so
    * the oracle applies the identical cut.
    * Scale posture: binaryFile lists + reads files in parallel and prunes
    * with `pathGlobFilter`/`recursiveFileLookup`; content is one row per
    * file, so downstream batching (the Multimodal mapPartitions stage)
    * controls memory, not the source. */
  def qSourceBinary(spark: SparkSession, d: String): DataFrame = {
    val out = s"${sinkDir(d)}/documents_bin"
    val root = new org.apache.hadoop.fs.Path(out)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(root, true)
    fs.mkdirs(root)
    Tables.documents(spark, d)
      .filter(pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(100L)) < 10)
      .select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism) // per-file create cost dominates; use every core
      .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val dir = new org.apache.hadoop.fs.Path(out)
        val pfs = dir.getFileSystem(conf)
        it.foreach { r =>
          val p = new org.apache.hadoop.fs.Path(dir, f"doc_${r.getLong(0)}%08d.bin")
          val os = pfs.create(p, true)
          try os.write(r.getString(1).getBytes("UTF-8")) finally os.close()
        }
      }
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(out)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin", 1).cast("long").as("doc_id"),
        col("length"),
        conv(substring(md5(col("content")), 1, 8), 16, 10).cast("long").as("h"))
      .groupBy((col("doc_id") % 4).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("length")).as("total_bytes"),
        sum(col("h")).as("checksum"))
      .orderBy(col("bucket"))
  }

  /** q_source_json: JSON round-trip — the reference's native wire format
    * (`graph.py:10-12` writes the graph as JSON; `coloring.py:238-241` the
    * coloring). The scalable Spark shape is JSON-lines (one object per
    * line, splittable — the reference's single pretty-printed array is not;
    * GraphIO covers that `multiLine` read for format parity): write a
    * projection as .json, read it back with an explicit schema (inference
    * is a full extra pass at scale — and would widen these BIGINTs), and
    * aggregate. Doubles survive the text round-trip exactly (shortest-repr
    * write, exact IEEE parse); the DECIMAL sum discipline does the rest. */
  def qSourceJson(spark: SparkSession, d: String): DataFrame = {
    val out = s"${sinkDir(d)}/orders_json"
    Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"))
      .write.mode("overwrite").json(out)
    spark.read
      .schema("o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING")
      .json(out)
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("sum_price"),
        countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
  }

  /** q_join_bucketed: the shuffle-free co-located join — both sides written
    * ONCE as bucketed tables on the join key (`bucketBy(8, orderkey)` +
    * in-bucket sort), then joined with no exchange: the bucketed scan
    * already provides the hash distribution, so the sort-merge join reads
    * co-located buckets directly (PlanShapeSpec asserts the exchange-free
    * plan). This is THE amortization pattern for a 100 TB fact table joined
    * repeatedly on the same key: pay the bucketing shuffle once at write
    * time, never again at read time. Bucket counts must match across the
    * two tables (8 = 8; mismatched counts reintroduce a shuffle on one
    * side). The aggregate result is oracle-checked against the plain join
    * over the original parquet — bucketing must be semantically invisible. */
  /** q_source_orc: ORC round-trip — the other columnar format a warehouse
    * migration meets (same vectorized reader + predicate pushdown machinery
    * as parquet in Spark). Write a projection, read it back, aggregate;
    * the oracle aggregates the original table, so the sink must be
    * lossless including DOUBLE bit patterns. */
  def qSourceOrc(spark: SparkSession, d: String): DataFrame = {
    val out = s"${sinkDir(d)}/supplier_orc"
    Tables.supplier(spark, d)
      .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
      .write.mode("overwrite").orc(out)
    spark.read.orc(out)
      .groupBy(col("s_nationkey"))
      .agg(
        sum(col("s_acctbal").cast("decimal(18,4)")).cast("double").as("sum_bal"),
        count(lit(1)).as("n"))
      .orderBy(col("s_nationkey"))
  }

  /** Bits per dimension in [[zValue]] — 31 is the single-long maximum
    * (the interleaved value fills 62 of 63 sign-safe bits), giving 2³¹ ≈
    * 2.1e9 key headroom per axis. The r11 100× leg FIRED the previous 2²⁰
    * guard (l_partkey reaches 2e6 there; 30× passed at 6e5 — the exact
    * "new decade, new bug class" the scale legs exist for). Past 2³¹ keys
    * per axis, interleave `shiftright(x, bitlen(max)−31)` instead — HIGH
    * bits keep the curve monotone and the layout merely coarser, and
    * correctness never depends on zv (the read-back filters real columns;
    * zv only steers file locality) — but that needs a plan-time max probe,
    * so it stays the documented path, not speculative code. */
  private val Z_BITS = 31

  /** Morton z-value: interleave the low [[Z_BITS]] bits of two keys —
    * x in the even bit lanes, y in the odd — so lexicographic order on the
    * single zv column IS the space-filling curve over (x, y). Built as a
    * static shift-and-add expression (disjoint bit lanes make + equal to
    * bitwise-or), fully codegen'd. The width guard rides INSIDE the value
    * (coalesce of a NULL-on-success assert probe, the triangle-key trick)
    * so column pruning can't drop it: a key past 2²⁰ must fail loudly, not
    * silently alias two distant points onto one curve position. */
  private[sources] def zValue(x: Column, y: Column): Column = {
    val terms = (0 until Z_BITS).flatMap { i =>
      Seq(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _) +
      coalesce(assert_true(
        x.between(0L, (1L << Z_BITS) - 1) && y.between(0L, (1L << Z_BITS) - 1),
        lit(s"zValue: key outside [0, 2^$Z_BITS) — widen Z_BITS")).cast("long"),
        lit(0L))
  }

  /** q_zorder: multi-dimensional data clustering — the lakehouse
    * `OPTIMIZE ... ZORDER BY (a, b)` primitive, the third layout tool
    * beside Hive partitioning (q_write_partitioned — categorical, one
    * directory per value) and bucketing (q_join_bucketed — join
    * co-location): interleave the bits of two range-queried keys into one
    * Morton value, range-repartition + sort the table on it, and write —
    * rows close in the (partkey, suppkey) plane land in the same files, so
    * a box predicate on EITHER OR BOTH dimensions prunes via parquet
    * min/max stats where a single-column sort could only serve its leading
    * column. The read-back runs a box filter and aggregates; the oracle is
    * the same aggregate over the original table, so the layout must be
    * semantically invisible. SourceFormatSpec asserts the physical claims:
    * disjoint per-file zv ranges and the box touching a strict subset of
    * files. Scale posture: one range shuffle at write time (sampled
    * boundaries, AQE-sized), pure map-side scan pruning forever after —
    * the write-once/skip-always trade every 100 TB table wants for its
    * hot filter dimensions. */
  def qZorder(spark: SparkSession, d: String): DataFrame = {
    val out = s"${sinkDir(d)}/lineitem_zorder"
    Tables.lineitem(spark, d)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        col("l_extendedprice"))
      .withColumn("zv", zValue(col("l_partkey"), col("l_suppkey")))
      .repartitionByRange(8, col("zv"))
      .sortWithinPartitions(col("zv"))
      .write.mode("overwrite").parquet(out)
    spark.read.parquet(out)
      .filter(col("l_partkey").between(1L, 100L) &&
        col("l_suppkey").between(1L, 5L))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
          .as("sum_price"))
  }

  /** Drop a managed table AND any orphaned warehouse location (a leftover
    * directory from a killed run blocks CREATE even when the catalog has no
    * such table). */
  private def dropManaged(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val p = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath, table.toLowerCase)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  def qJoinBucketed(spark: SparkSession, d: String): DataFrame = {
    val sfx = new java.io.File(d).getName.replaceAll("[^A-Za-z0-9]", "_")
    val tO = s"graft_${sfx}_orders_bkt"
    val tL = s"graft_${sfx}_lineitem_bkt"
    dropManaged(spark, tO)
    dropManaged(spark, tL)
    // repartition(8, key) uses the SAME murmur3 hash as bucketBy, so each
    // write task holds exactly one bucket: one file per bucket AND 8-way
    // write parallelism (a single-file ScaleUp scan otherwise writes all 8
    // buckets from one task).
    Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_orderstatus"))
      .repartition(8, col("o_orderkey"))
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(tO)
    Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_quantity"))
      .repartition(8, col("l_orderkey"))
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(tL)
    bucketedJoinPlan(spark, d)
  }

  /** The read-side join over the bucketed tables (split out so the spec can
    * assert the exchange-free plan after [[qJoinBucketed]] wrote them). */
  def bucketedJoinPlan(spark: SparkSession, d: String): DataFrame = {
    val sfx = new java.io.File(d).getName.replaceAll("[^A-Za-z0-9]", "_")
    spark.table(s"graft_${sfx}_orders_bkt")
      .join(spark.table(s"graft_${sfx}_lineitem_bkt"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"))
      .orderBy(col("o_orderstatus"))
  }

  /** [[qCompact]] target rows per output file. */
  val COMPACT_TARGET_ROWS = 200000L

  /** q_compact: small-file compaction — the maintenance operation every
    * streaming/incremental sink eventually needs. A deliberately
    * fragmented layout (64 tiny files) is rewritten by bin-packing to
    * ⌈rows / [[COMPACT_TARGET_ROWS]]⌉ range-partitioned files on the
    * table's natural sort key, the same rewrite OPTIMIZE does in
    * table-format engines: range partitioning (sampled boundaries, one
    * shuffle) gives near-equal file sizes AND a clustered key so
    * post-compaction scans get min/max skipping on l_orderkey for free.
    * The sizing pass reads only Parquet footers (count of a parquet scan
    * is metadata-only). Output: a content-conservation aggregate over the
    * compacted read-back — the oracle computes the same from the original
    * table, so a row lost or duplicated by the rewrite hash-mismatches;
    * the file-count collapse and per-file row bounds are pinned in
    * SourceFormatSpec (file layout is invisible to SQL). */
  def qCompact(spark: SparkSession, d: String): DataFrame = {
    val frag = s"${sinkDir(d)}/lineitem_frag"
    val out = s"${sinkDir(d)}/lineitem_compact"
    val cols = Seq(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
      col("l_returnflag"))
    Tables.lineitem(spark, d).select(cols: _*)
      .repartition(64).write.mode("overwrite").parquet(frag)
    val rows = spark.read.parquet(frag).count()
    val nFiles = math.max(1L, (rows + COMPACT_TARGET_ROWS - 1) / COMPACT_TARGET_ROWS).toInt
    spark.read.parquet(frag)
      .repartitionByRange(nFiles, col("l_orderkey"), col("l_linenumber"))
      .sortWithinPartitions(col("l_orderkey"), col("l_linenumber"))
      .write.mode("overwrite").parquet(out)
    spark.read.parquet(out)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** Test hook for SourceFormatSpec: absolute path of a sink subdirectory
    * (e.g. the [[qCompact]] output) — tests derive read-back paths from
    * this instead of duplicating the private sinkDir layout. */
  private[graft] def sinkPath(d: String, sub: String): String =
    s"${sinkDir(d)}/$sub"

  /** Test hook for SourceFormatSpec: parquet part-file count of a sink
    * subdirectory written by [[qCompact]]. */
  private[graft] def partFileCount(d: String, sub: String): Int =
    Option(new java.io.File(s"${sinkDir(d)}/$sub").listFiles())
      .map(_.count(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))).getOrElse(0)

  /** q_schema_drift: schema-evolution absorption — the multi-year-corpus
    * reality that parquet written in different eras has different columns.
    * Writes two generations under one root (v1: 3 columns; v2: adds
    * `l_extendedprice`), reads BOTH with `mergeSchema=true` (schema
    * reconciliation by name — v1 rows surface the evolved column as NULL),
    * and aggregates per generation so a dropped column, a misaligned
    * union, or a silently-pruned generation all hash-mismatch against the
    * oracle computed from the original table.
    *
    * Scale posture: mergeSchema reconciles FOOTERS (one driver-side pass
    * over file metadata, parallelized by Spark past a threshold), not
    * data; production crawls pin the merged schema in a table catalog so
    * the per-query footer sweep amortizes away — the read path here is
    * what that catalog bootstraps from. Null-materialization for missing
    * columns is free at scan time (no rewrite of old generations). */
  def qSchemaDrift(spark: SparkSession, d: String): DataFrame = {
    val root = s"${sinkDir(d)}/lineitem_generations"
    val li = Tables.lineitem(spark, d)
    li.filter(col("l_linenumber") === 1)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .write.mode("overwrite").parquet(s"$root/v1")
    li.filter(col("l_linenumber") === 2)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"))
      .write.mode("overwrite").parquet(s"$root/v2")
    spark.read.option("mergeSchema", "true")
      .parquet(s"$root/v1", s"$root/v2")
      .groupBy(col("l_extendedprice").isNotNull.as("has_price"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
          .as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
          .as("sum_price"))
      .orderBy(col("has_price"))
  }

  val oracles: Map[String, String] = Map(
    "q_schema_drift" ->
      """WITH u AS (
        |  SELECT l_orderkey, l_partkey, l_quantity,
        |    CAST(NULL AS DOUBLE) AS l_extendedprice
        |  FROM lineitem WHERE l_linenumber = 1
        |  UNION ALL
        |  SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem WHERE l_linenumber = 2)
        |SELECT (l_extendedprice IS NOT NULL) AS has_price,
        |  count(*) AS n_rows,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR)
        |    AS DOUBLE) AS sum_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR)
        |    AS DOUBLE) AS sum_price
        |FROM u GROUP BY has_price ORDER BY has_price""".stripMargin,
    "q_compact" ->
      """SELECT l_returnflag,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_zorder" ->
      """SELECT count(*) AS n_rows,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_partkey BETWEEN 1 AND 100 AND l_suppkey BETWEEN 1 AND 5""".stripMargin,
    "q_source_binary" ->
      """SELECT CAST(doc_id % 4 AS INT) AS bucket, count(*) AS n_files,
        |  CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
        |  CAST(sum(('0x' || substr(md5(text), 1, 8))::BIGINT) AS BIGINT) AS checksum
        |FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_source_orc" ->
      """SELECT s_nationkey,
        |  CAST(CAST(sum(CAST(s_acctbal AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_bal,
        |  count(*) AS n
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q_join_bucketed" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_source_json" ->
      """SELECT o_orderstatus,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_price,
        |  count(DISTINCT o_custkey) AS n_cust,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_source_csv" ->
      """SELECT l_returnflag,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_write_partitioned" ->
      """SELECT l_linestatus,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem WHERE l_returnflag = 'R'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
  )
}
