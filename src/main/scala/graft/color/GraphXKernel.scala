package graft.color

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

/** GraphX formulation of the coloring kernel (SURVEY.md §7 step 4: the
  * `aggregateMessages` variant) — the same speculative first-fit +
  * priority-admit semantics as [[ColoringKernel]]'s default strategy, but
  * message-passing over a partitioned `Graph[VD, Unit]` instead of
  * DataFrame joins. Neighbor color gathering (the reference's broadcast
  * probe O10/O11) becomes `aggregateMessages`, with no driver hop and no
  * Catalyst planning per round — the trade is losing whole-stage codegen
  * for lower per-round fixed cost.
  *
  * Used-color messages are a 64-bit bitmask when k ≤ 64 (one `Long` OR per
  * edge instead of a `Set[Int]` allocation + union — the palette of the
  * corpus kernel graph is Δ+1 = 63, so the bench always takes this path);
  * the set-based path remains for arbitrary k.
  *
  * Determinism: identical priority order (degree desc, id asc) to the
  * DataFrame kernel, so both produce valid colorings; ColoringKernelSpec
  * cross-checks invariants on the same graphs.
  */
object GraphXKernel {

  /** color ∈ {-1 uncolored, 0.. assigned}; deg static. */
  private final case class V(color: Int, deg: Int)

  /** Session-lifetime prepared base per key (the sfDir) — the same
    * CacheManager-substitution stance as the persisted edge DFs: every
    * GraphX consumer (coloring kernel, PageRank, connected components)
    * starts from the identical built graph, so the DF→RDD conversion +
    * `Graph.fromEdges` shuffle + degree join run once per session per
    * sfDir. */
  private val prepCache = new graft.ops.SessionCache[Graph[Int, Unit]]

  def prepareCached(spark: SparkSession, key: String, edgesDf: => DataFrame): Graph[Int, Unit] =
    prepCache.getOrElseUpdate(spark, key)(prepare(spark, edgesDf))

  /** Build the static base graph once: vertex attribute = degree (O23),
    * edges + vertices cached. [[tryColorOn]] attempts share this across a
    * minimal-color search — the DF→RDD conversion, `Graph.fromEdges`
    * shuffle, and degree join all happen once instead of per attempt. */
  def prepare(spark: SparkSession, edgesDf: DataFrame): Graph[Int, Unit] = {
    import spark.implicits._
    val raw = edgesDf.select(col("src"), col("dst")).as[(Long, Long)]
      .rdd.map { case (s, d) => Edge(s, d, ()) }
    // Partition count proportional to edge count (~250k edges/partition,
    // the same sizing rule spark.sql.files.maxPartitionBytes applies to
    // scans): an iterative kernel launches every stage 13+ times, so task
    // count is a multiplier on fixed scheduling cost — 32 near-empty
    // partitions of a 600k-edge graph cost more in task overhead than they
    // win in parallelism, while a 100 TB edge list still gets its
    // thousands of partitions from the same rule.
    val nParts = math.min(raw.getNumPartitions,
      math.max(1, (raw.count() / 250000L).toInt))
    val edgeRdd = if (nParts < raw.getNumPartitions) raw.coalesce(nParts) else raw
    val g0 = Graph.fromEdges(edgeRdd, 0,
      StorageLevel.MEMORY_AND_DISK, StorageLevel.MEMORY_AND_DISK)
    val base = g0.outerJoinVertices(g0.outDegrees)((_, _, d) => d.getOrElse(0))
      .cache()
    base.vertices.count() // materialize before attempts start mutating views
    base
  }

  /** Max degree of a prepared base graph (initial k = Δ+1, O25). */
  def maxDegree(base: Graph[Int, Unit]): Int =
    base.vertices.map(_._2).fold(0)(math.max)

  /** One-shot attempt: build, color, drop the base. */
  def tryColor(
      spark: SparkSession,
      edgesDf: DataFrame,
      k: Int,
      maxRounds: Int = 200): Option[DataFrame] = {
    val base = prepare(spark, edgesDf)
    try tryColorOn(spark, base, k, maxRounds)
    finally base.unpersist(blocking = false)
  }

  /** Attempt a k-coloring on a prepared base graph; returns the (id, color)
    * DataFrame on success. The caller must materialize the result before
    * unpersisting `base` (ColoringKernel does, via localCheckpoint). */
  def tryColorOn(
      spark: SparkSession,
      base: Graph[Int, Unit],
      k: Int,
      maxRounds: Int = 200): Option[DataFrame] = {
    import spark.implicits._

    var graph = base.mapVertices((_, d) => V(-1, d)).cache()

    // (deg desc, id asc) priority as an ordered pair; compare lexicographic.
    def prio(id: VertexId, deg: Int): (Int, Long) = (deg, -id)
    val ord = Ordering.Tuple2[Int, Long]

    var rounds = 0
    var uncolored = graph.vertices.filter(_._2.color == -1).count()
    var failed = false
    val debug = sys.env.contains("GRAFT_DEBUG_ROUNDS")

    while (uncolored > 0 && !failed) {
      rounds += 1
      if (rounds > maxRounds) failed = true
      else {
        val tRound = System.nanoTime()
        // Pass A: gather used neighbor colors, pick first-fit candidate
        // (O11 + O13). Bitmask fast path for k ≤ 64.
        val withCand =
          if (k <= 64) {
            val used = graph.aggregateMessages[Long](
              t => if (t.dstAttr.color >= 0 && t.dstAttr.color < 64)
                t.sendToSrc(1L << t.dstAttr.color),
              _ | _)
            graph.outerJoinVertices(used) { (_, v, usedOpt) =>
              val cand =
                if (v.color != -1) Int.MinValue // already colored: no candidate
                else {
                  val free = java.lang.Long.numberOfTrailingZeros(~usedOpt.getOrElse(0L))
                  if (free < k) free else -3
                }
              (v, cand)
            }
          } else {
            val used = graph.aggregateMessages[Set[Int]](
              t => if (t.dstAttr.color >= 0) t.sendToSrc(Set(t.dstAttr.color)),
              _ ++ _)
            graph.outerJoinVertices(used) { (_, v, usedOpt) =>
              val cand =
                if (v.color != -1) Int.MinValue
                else {
                  val u = usedOpt.getOrElse(Set.empty[Int])
                  (0 until k).find(c => !u.contains(c)).getOrElse(-3)
                }
              (v, cand)
            }
          }
        withCand.cache()

        // Pass B: highest rival priority among same-candidate neighbors.
        val rival = withCand.aggregateMessages[(Int, Long)](
          t =>
            if (t.srcAttr._2 >= 0 && t.srcAttr._2 == t.dstAttr._2)
              t.sendToSrc(prio(t.dstId, t.dstAttr._1.deg)),
          ord.max)
        val next = withCand.outerJoinVertices(rival) { (id, vc, rivalOpt) =>
          val (v, cand) = vc
          if (v.color != -1) v
          else if (cand == -3) V(-3, v.deg)
          else if (rivalOpt.forall(r => ord.gt(prio(id, v.deg), r)))
            V(cand, v.deg)
          else v
        }.cache()

        val counts = next.vertices
          .map { case (_, v) => (if (v.color == -1) 1L else 0L, if (v.color == -3) 1L else 0L) }
          .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
        if (counts._2 > 0) failed = true
        else if (counts._1 >= uncolored) failed = rounds >= maxRounds
        if (graph ne null) graph.unpersist(blocking = false)
        withCand.unpersist(blocking = false)
        graph = next
        uncolored = counts._1
        if (debug) println(f"[graphx] k=$k round=$rounds uncolored=$uncolored " +
          f"infeasible=${counts._2} t=${(System.nanoTime() - tRound) / 1e9}%.2f s")
        // GraphX checkpointing analog: lineage stays bounded because each
        // round's vertices RDD is cached and the previous is dropped; edge
        // RDDs are reused (same partitioning) across rounds.
      }
    }

    if (failed) { graph.unpersist(blocking = false); None }
    else {
      val out = graph.vertices.map { case (id, v) => (id, v.color) }
        .toDF("id", "color")
      Some(out)
    }
  }
}
