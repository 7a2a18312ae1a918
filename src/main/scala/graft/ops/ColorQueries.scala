package graft.ops

import org.apache.spark.graphx.Graph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.color.{ColoringKernel, GraphXKernel}
import graft.color.ColoringKernel.Strategy

/** Driver-contract wrappers for the iterative coloring kernel
  * (q_color_graph / q_minimal_colors — SURVEY.md §2.3, no SQL oracle; the
  * correctness contract is the invariant set: zero uncolored, zero
  * conflicting edges, colors ≤ Δ+1, deterministic output).
  */
object ColorQueries {

  private def kernelBase(spark: SparkSession, d: String): Graph[Int, Unit] =
    GraphXKernel.prepareCached(spark, d, GraphOps.kernelEdges(spark, d))

  /** Full first-fit coloring of the consecutive-co-purchase graph at
    * k = Δ+1 (always feasible). Output `(id, color, n_colors)` ordered by
    * id; deterministic (bench-selected GraphX strategy — same semantics as
    * Jp, message-passing execution). */
  def qColorGraph(spark: SparkSession, d: String): DataFrame = {
    val base = kernelBase(spark, d)
    val k = GraphXKernel.maxDegree(base) + 1
    val result = ColoringKernel
      .tryColor(spark, GraphOps.kernelEdges(spark, d), k, Strategy.GraphX,
        preparedBase = Some(base))
      .getOrElse(sys.error("Δ+1 coloring cannot fail"))
    result.colors
      .withColumn("n_colors", lit(ColoringKernel.usedColors(result.colors)))
      .orderBy(col("id"))
  }

  /** Reference-shaped variant: same kernel driven by the custom GreedyIS
    * Aggregator (the aggregateByKey design). Output restricted to the
    * validation invariants so the nondeterministic admitted sets
    * (reference-faithful) don't break result hashing. */
  def qColorGreedy(spark: SparkSession, d: String): DataFrame = {
    val edges = GraphOps.kernelEdges(spark, d)
    val maxDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .agg(max(col("deg"))).head().getLong(0).toInt
    val result = ColoringKernel
      .tryColor(spark, edges, maxDeg + 1, Strategy.GreedyAgg)
      .getOrElse(sys.error("Δ+1 coloring cannot fail"))
    val (uncolored, conflicts) = ColoringKernel.validate(edges, result.colors)
    import spark.implicits._
    Seq((uncolored, conflicts, result.rounds.toLong > 0))
      .toDF("uncolored", "conflicts", "converged")
  }

  /** Minimal-color search (O25) on the kernel graph; single summary row.
    * Bounded attempts keep bench wall-clock sane (SURVEY.md §7). */
  def qMinimalColors(spark: SparkSession, d: String): DataFrame = {
    val edges = GraphOps.kernelEdges(spark, d)
    val best = ColoringKernel.minimalColors(spark, edges, Strategy.GraphX,
      maxAttempts = 2, preparedBase = Some(kernelBase(spark, d)))
    val (uncolored, conflicts) = ColoringKernel.validate(edges, best.colors)
    import spark.implicits._
    Seq((best.k.toLong, uncolored, conflicts))
      .toDF("minimal_k", "uncolored", "conflicts")
  }
}
