package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seeded distributed random-graph generator — the capability-equivalent of
  * the reference's driver-side generator (`graph.py:30-43`): every node gets
  * a target degree in `[0, maxDegree]`, random symmetric edges are added, and
  * the degree cap holds at **both** endpoints.
  *
  * The reference builds this sequentially with shared mutable state; a
  * distributed build can't reproduce its exact edge set, so the contract here
  * is the reference's *invariants* (symmetric, irreflexive, deduplicated,
  * max degree ≤ maxDegree, deterministic under a fixed seed) rather than its
  * byte output. Determinism is independent of partitioning because all
  * randomness is `xxhash64(id, slot, seed)` — a pure column function — rather
  * than partition-seeded `rand()`.
  */
object RandomGraph {

  /** Generate a symmetric edge list `(src, dst)` over vertices `0..n-1`. */
  def edges(spark: SparkSession, n: Long, maxDegree: Int, seed: Long): DataFrame = {
    require(n > 1 && maxDegree >= 0)
    val ids = spark.range(n).toDF("id")
    // Per node: target degree in [0, maxDegree] (graph.py:33 randint).
    val withDeg = ids.withColumn(
      "target_deg", pmod(xxhash64(col("id"), lit(seed)), lit(maxDegree + 1L)))
    // Propose target_deg candidate partners per node; partner is a
    // hash-derived peer != self (graph.py:35 random.choice).
    val proposals = withDeg
      .select(col("id"), explode(sequence(lit(0L), col("target_deg") - 1)).as("slot"))
      .withColumn("peer",
        pmod(xxhash64(col("id"), col("slot"), lit(seed + 1)), lit(n - 1)))
      .withColumn("dst", when(col("peer") >= col("id"), col("peer") + 1).otherwise(col("peer")))
      .select(col("id").as("src"), col("dst"))
    // Canonical undirected form, deduplicated.
    val canon = proposals
      .select(least(col("src"), col("dst")).as("u"), greatest(col("src"), col("dst")).as("v"))
      .distinct()
    // Cap the degree at BOTH endpoints (graph.py:36-39): rank each node's
    // incident edges by a seeded priority and keep an edge only when it is
    // within the cap on both sides. One pass can over-prune relative to the
    // reference's sequential insert, never under-prune — the invariant is
    // the cap, which this enforces exactly.
    val withPrio = canon.withColumn("prio", xxhash64(col("u"), col("v"), lit(seed + 2)))
    // A node's incident edges span both endpoint roles — rank them together
    // (one row per (node, edge)) and keep an edge only when it is within the
    // cap at both endpoints.
    val incident = withPrio
      .select(col("u").as("node"), col("u"), col("v"), col("prio"))
      .union(withPrio.select(col("v").as("node"), col("u"), col("v"), col("prio")))
    val w = Window.partitionBy(col("node")).orderBy(col("prio"), col("u"), col("v"))
    val capped = incident
      .withColumn("r", row_number().over(w))
      .groupBy(col("u"), col("v"))
      .agg(max(col("r")).as("rmax"))
      .filter(col("rmax") <= maxDegree)
      .select(col("u"), col("v"))
    // Symmetric closure (graph.py:40-41 adds both directions).
    capped.select(col("u").as("src"), col("v").as("dst"))
      .union(capped.select(col("v").as("src"), col("u").as("dst")))
  }

  /** Nodes DF in the reference record shape `(id, neighbors, color = -1)`,
    * including isolated vertices (empty adjacency). */
  def nodes(spark: SparkSession, n: Long, maxDegree: Int, seed: Long): DataFrame = {
    val e = edges(spark, n, maxDegree, seed)
    spark.range(n).toDF("id")
      .join(e.groupBy(col("src")).agg(array_sort(collect_list(col("dst"))).as("nbrs")),
        col("id") === col("src"), "left_outer")
      .select(
        col("id"),
        coalesce(col("nbrs"), array().cast("array<long>")).as("neighbors"),
        lit(-1).as("color"))
  }
}
