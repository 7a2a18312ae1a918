package graft.color

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The iterative graph-coloring kernel — the rebuild of the reference's
  * per-k fixpoint (`coloring.py:73-132`, `coloring_optimized.py:70-146`) and
  * outer minimal-color search (`coloring.py:212-231`), re-expressed as a
  * driver loop over declarative DataFrame rounds (SURVEY.md §3, §7 step 4).
  *
  * Per round (given palette size k):
  *   1. gather used neighbor colors — `edges ⋈ colors` + `collect_set`
  *      (the reference's broadcast color probe O10/O11, kept fully
  *      distributed: no `collectAsMap` on the driver, SURVEY.md §7 risk 5);
  *   2. first-fit candidate — native expression
  *      `array_min(array_except(sequence(0, k-1), used))`
  *      (O13, `coloring_optimized.py:150-166`; NULL ⇒ infeasible ⇒ the
  *      k-attempt fails, `coloring.py:104-108`);
  *   3. same-color conflict resolution between adjacent candidates
  *      (O15-O17) via one of two strategies below;
  *   4. apply the admitted colors — left join + `coalesce`
  *      (O20, `coloring.py:121-127`).
  *
  * Strategies:
  *   - [[Strategy.Jp]] (default): Jones–Plassmann-style priority admit — a
  *     node keeps its candidate iff no *adjacent* node competing for the
  *     same candidate has higher (degree, id desc-asc) priority. Pure joins,
  *     **deterministic under any partitioning**, guaranteed progress (every
  *     conflict component admits its max-priority node), and the natural
  *     100 TB formulation: one edges-shuffle per round, no per-node adjacency
  *     arrays shuffled around.
  *   - [[Strategy.GreedyAgg]]: the reference-shaped two-phase greedy
  *     independent set as a custom [[GreedyIS]] `Aggregator` over color
  *     buckets (`aggregateByKey`, `coloring_optimized.py:120-126`) —
  *     capability parity with the reference's map-side-combine design;
  *     admits more nodes per round on dense buckets, at the cost of
  *     shuffling each candidate's adjacency list.
  *
  * Driver-side control flow stays a plain Scala loop — same stance as GraphX
  * `Pregel` (SURVEY.md §4): only counts cross to the driver. Lineage growth
  * across rounds is truncated with `localCheckpoint` (SURVEY.md §7 risk 4).
  */
object ColoringKernel {

  sealed trait Strategy
  object Strategy {
    case object Jp extends Strategy
    case object GreedyAgg extends Strategy
  }

  final case class Colored(colors: DataFrame, k: Int, rounds: Int)

  /** Distinct vertices of a symmetric edge list. */
  private def verticesOf(edges: DataFrame): DataFrame =
    edges.select(col("src").as("id")).distinct()

  /** Attempt a k-coloring of `edges` (symmetric, irreflexive `(src,dst)`).
    * `init` optionally supplies extra vertices (isolated nodes never appear
    * in an edge list). Returns None when k colors are infeasible for the
    * first-fit rule or progress stalls past `maxRounds` (SURVEY.md §7
    * risk 6).
    */
  def tryColor(
      spark: SparkSession,
      edges: DataFrame,
      k: Int,
      strategy: Strategy = Strategy.Jp,
      extraVertices: Option[DataFrame] = None,
      maxRounds: Int = 200): Option[Colored] = {

    val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
    // Degree once, reused every round for the priority order (O8/O23).
    val degree = e.groupBy(col("src")).agg(count(lit(1)).as("degree"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // O6 init: isolated vertices → color 0, everything else -1
    // (changeColorFirstIteration, coloring.py:12-17).
    val connected = verticesOf(e).withColumn("color", lit(-1))
    val isolated = extraVertices
      .map(_.select(col("id")).except(verticesOf(e)).withColumn("color", lit(0)))
    var colors = isolated.fold(connected)(connected.unionByName(_))
      .persist(StorageLevel.MEMORY_AND_DISK)
    colors.count()

    var rounds = 0
    var uncolored = colors.filter(col("color") === -1).count()
    var failed = false

    while (uncolored > 0 && !failed) {
      rounds += 1
      if (rounds > maxRounds) { failed = true }
      else {
        // 1. used[v] = set of colors on v's already-colored neighbors.
        val used = e
          .join(colors.filter(col("color") >= 0).withColumnRenamed("id", "nid"),
            col("dst") === col("nid"))
          .groupBy(col("src"))
          .agg(collect_set(col("color")).as("used"))

        // 2. first-fit candidate for every uncolored vertex (native expr, no UDF).
        val cand = colors.filter(col("color") === -1)
          .join(used, col("id") === col("src"), "left_outer")
          .select(col("id"),
            array_min(array_except(
              sequence(lit(0), lit(k - 1)),
              coalesce(col("used"), array().cast("array<int>")))).as("cand"))

        val infeasible = cand.filter(col("cand").isNull).limit(1).count()
        if (infeasible > 0) failed = true
        else {
          // 3. resolve same-candidate conflicts between adjacent vertices.
          val admitted = strategy match {
            case Strategy.Jp => admitJp(e, degree, cand)
            case Strategy.GreedyAgg => admitGreedy(spark, e, degree, cand)
          }

          // 4. apply updates: left join + coalesce (O20).
          val next = colors
            .join(admitted.withColumnRenamed("id", "aid"), col("id") === col("aid"), "left_outer")
            .select(col("id"),
              coalesce(col("cand"), col("color")).cast("int").as("color"))
            .persist(StorageLevel.MEMORY_AND_DISK)
          // Truncate the iterative lineage every round — the plan would
          // otherwise grow per round (reference analog: the persist/unpersist
          // dance at coloring.py:126,219).
          val checkpointed = next.localCheckpoint(true)
          val nextUncolored = checkpointed.filter(col("color") === -1).count()
          if (nextUncolored >= uncolored) {
            // No progress. Jp always makes progress unless infeasibility is
            // about to surface; bounded-round guard backstops (risk 6).
            failed = rounds >= maxRounds
          }
          colors.unpersist()
          next.unpersist()
          colors = checkpointed
          uncolored = nextUncolored
        }
      }
    }

    degree.unpersist()
    e.unpersist()
    if (failed) { colors.unpersist(); None }
    else Some(Colored(colors, k, rounds))
  }

  /** Jones–Plassmann admit: drop a candidate iff an adjacent candidate with
    * the same color choice has strictly higher (degree, id) priority
    * (degree desc — the optimized reference's resolution order,
    * `coloring_optimized.py:170-172` — with id-asc tiebreak for
    * determinism). Everything is equi-joins on src/dst, so Catalyst plans
    * shuffle hash/sort-merge joins and the round stays one shuffle wide.
    */
  private def admitJp(edges: DataFrame, degree: DataFrame, cand: DataFrame): DataFrame = {
    val candP = cand
      .join(degree, col("id") === col("src"), "left_outer")
      .select(col("id"), col("cand"), coalesce(col("degree"), lit(0L)).as("prio"))
    val a = candP.select(col("id").as("a_id"), col("cand").as("a_cand"),
      col("prio").as("a_prio"))
    val b = candP.select(col("id").as("b_id"), col("cand").as("b_cand"),
      col("prio").as("b_prio"))
    val losers = edges
      .join(a, col("src") === col("a_id"))
      .join(b, col("dst") === col("b_id"))
      .filter(col("a_cand") === col("b_cand") &&
        (col("b_prio") > col("a_prio") ||
          (col("b_prio") === col("a_prio") && col("b_id") < col("a_id"))))
      .select(col("a_id").as("loser"))
      .distinct()
    candP
      .join(losers, col("id") === col("loser"), "left_anti")
      .select(col("id"), col("cand"))
  }

  /** Reference-shaped admit: bucket candidates by color and run the
    * [[GreedyIS]] Aggregator (partial per-partition greedy + sorted-merge
    * greedy — the `aggregateByKey` design, `coloring_optimized.py:120-126`).
    * Requires each candidate's adjacency list in the bucket (the optimized
    * reference ships the same projected record, `coloring_optimized.py:86-90`).
    */
  private def admitGreedy(
      spark: SparkSession, edges: DataFrame, degree: DataFrame, cand: DataFrame): DataFrame = {
    import spark.implicits._
    val adj = edges.groupBy(col("src")).agg(collect_list(col("dst")).as("nbrs"))
    val bucket = cand
      .join(degree, col("id") === degree("src"), "left_outer").drop(degree("src"))
      .join(adj, col("id") === adj("src"), "left_outer").drop(adj("src"))
      .select(col("cand"), col("id"),
        coalesce(col("degree"), lit(0L)).cast("int").as("degree"),
        coalesce(col("nbrs"), array().cast("array<long>")).as("nbrs"))
      .as[(Int, Long, Int, Array[Long])]
      .map { case (c, id, deg, nbrs) => (c, CandNode(id, deg, nbrs)) }
    bucket
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(GreedyIS.toColumn.name("admitted"))
      .flatMap { case (c, ids) => ids.map(id => (id, c)) }
      .toDF("id", "cand")
  }

  /** Outer minimal-color search (O25, `coloring.py:212-231`), with the
    * reference's failed-attempt-output bug fixed (SURVEY.md §5 bug 1): the
    * returned coloring is always the last *successful* attempt.
    *
    * Scale divergence from the reference (documented): instead of starting
    * at Δ+1 and decrementing by 1 — O(Δ) full recolorings — the first
    * attempt runs at k = Δ+1 (always succeeds for first-fit), then restarts
    * from `distinct colors actually used`, which first-fit greedy makes a
    * far tighter upper bound; each success retries with k−1 until failure.
    */
  def minimalColors(
      spark: SparkSession,
      edges: DataFrame,
      strategy: Strategy = Strategy.Jp,
      extraVertices: Option[DataFrame] = None,
      maxAttempts: Int = 16): Colored = {

    val maxDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).head().getLong(0).toInt
    val first = tryColor(spark, edges, maxDeg + 1, strategy, extraVertices)
      .getOrElse(sys.error(s"k=Δ+1=${maxDeg + 1} must be colorable"))

    var best = first
    var k = usedColors(first.colors)
    if (k < first.k) {
      // Re-validate the tighter bound as its own attempt (first-fit with a
      // smaller palette is not the same run truncated).
      tryColor(spark, edges, k, strategy, extraVertices).foreach(best = _)
    }
    var attempts = 0
    var done = false
    while (!done && attempts < maxAttempts && k > 1) {
      attempts += 1
      tryColor(spark, edges, k - 1, strategy, extraVertices) match {
        case Some(c) =>
          val prev = best
          best = c
          k = usedColors(c.colors)
          if (prev.colors ne best.colors) prev.colors.unpersist()
        case None => done = true
      }
    }
    best.copy(k = usedColors(best.colors))
  }

  /** Number of distinct colors in a complete coloring. */
  def usedColors(colors: DataFrame): Int =
    colors.filter(col("color") >= 0).select(col("color")).distinct().count().toInt

  /** O22 validation invariants (`validate_graph_coloring`,
    * `coloring.py:149-162`): (#uncolored, #conflicting edge pairs) — both
    * must be 0 for a valid coloring. */
  def validate(edges: DataFrame, colors: DataFrame): (Long, Long) = {
    val uncolored = colors.filter(col("color") === -1).count()
    val ca = colors.select(col("id").as("a_id"), col("color").as("a_color"))
    val cb = colors.select(col("id").as("b_id"), col("color").as("b_color"))
    val conflicts = edges
      .join(ca, col("src") === col("a_id"))
      .join(cb, col("dst") === col("b_id"))
      .filter(col("a_color") === col("b_color"))
      .count()
    (uncolored, conflicts)
  }
}
