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
  * Determinism: identical priority order (degree desc, id asc) to the
  * DataFrame kernel, so both produce valid colorings; GraphXKernelSpec
  * cross-checks invariants on the same graphs.
  */
object GraphXKernel {

  /** color ∈ {-1 uncolored, 0.. assigned}; deg static. */
  private final case class V(color: Int, deg: Int)

  /** Attempt a k-coloring; returns (id, color) DataFrame on success. */
  def tryColor(
      spark: SparkSession,
      edgesDf: DataFrame,
      k: Int,
      maxRounds: Int = 200): Option[DataFrame] = {
    import spark.implicits._

    val edgeRdd = edgesDf.select(col("src"), col("dst")).as[(Long, Long)]
      .rdd.map { case (s, d) => Edge(s, d, ()) }
    var graph = Graph.fromEdges(edgeRdd, V(-1, 0),
        StorageLevel.MEMORY_AND_DISK, StorageLevel.MEMORY_AND_DISK)
    // Static degree in the vertex attribute (O23).
    val degrees = graph.outDegrees
    graph = graph.outerJoinVertices(degrees) { (_, v, d) =>
      V(v.color, d.getOrElse(0))
    }.cache()

    // (deg desc, id asc) priority as an ordered pair; compare lexicographic.
    def prio(id: VertexId, deg: Int): (Int, Long) = (deg, -id)
    val ord = Ordering.Tuple2[Int, Long]

    var rounds = 0
    var uncolored = graph.vertices.filter(_._2.color == -1).count()
    var failed = false

    while (uncolored > 0 && !failed) {
      rounds += 1
      if (rounds > maxRounds) failed = true
      else {
        // Pass A: gather used neighbor colors, pick first-fit candidate.
        val used = graph.aggregateMessages[Set[Int]](
          t => if (t.dstAttr.color >= 0) t.sendToSrc(Set(t.dstAttr.color)),
          _ ++ _)
        val withCand = graph.outerJoinVertices(used) { (_, v, usedOpt) =>
          val cand =
            if (v.color != -1) Int.MinValue // already colored: no candidate
            else {
              val u = usedOpt.getOrElse(Set.empty)
              (0 until k).find(c => !u.contains(c)).getOrElse(-3)
            }
          (v, cand)
        }.cache()

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
        graph.unpersist(blocking = false)
        withCand.unpersist(blocking = false)
        graph = next
        uncolored = counts._1
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
