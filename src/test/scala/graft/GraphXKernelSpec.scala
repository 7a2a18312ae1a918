package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.color.{ColoringKernel, GraphXKernel}
import graft.model.RandomGraph

/** The GraphX message-passing kernel satisfies the same invariants as the
  * DataFrame kernel on the same graphs. */
class GraphXKernelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("GraphX kernel produces a valid coloring (n=500, maxDeg=6)") {
    val edges = RandomGraph.edges(spark, 500, 6, seed = 21)
    val colors = GraphXKernel.tryColor(spark, edges, k = 7)
      .getOrElse(fail("Δ+1 must succeed"))
    val (uncolored, conflicts) = ColoringKernel.validate(edges, colors)
    assert(uncolored === 0 && conflicts === 0)
    assert(ColoringKernel.usedColors(colors) <= 7)
  }

  test("GraphX kernel fails cleanly when k is infeasible") {
    import spark.implicits._
    // K4 needs 4 colors; k=3 must return None.
    val vs = Seq(0L, 1L, 2L, 3L)
    val edges = (for (a <- vs; b <- vs if a != b) yield (a, b)).toDF("src", "dst")
    assert(GraphXKernel.tryColor(spark, edges, k = 3).isEmpty)
    assert(GraphXKernel.tryColor(spark, edges, k = 4).isDefined)
  }
}
