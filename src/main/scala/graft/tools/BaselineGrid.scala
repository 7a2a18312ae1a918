package graft.tools

import org.apache.spark.sql.SparkSession

import graft.color.ColoringKernel
import graft.color.ColoringKernel.Strategy
import graft.model.RandomGraph

/** Replays the reference's published timing grid (modifikacije.pdf p.2:
  * (nodes, maxDegree) → total minimal-color-search seconds) against this
  * engine, one shared session (the reference's timings likewise exclude
  * interpreter startup — they time the search, coloring.py:233-234).
  * Prints one line per config for BASELINE comparison. */
object BaselineGrid {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val grid = Seq((10, 3), (10, 5), (20, 3), (20, 5), (50, 3), (50, 5),
      (100, 5), (100, 10), (200, 5), (200, 10))
    grid.foreach { case (n, d) =>
      val t0 = System.nanoTime()
      val edges = RandomGraph.edges(spark, n.toLong, d, seed = 42)
      val best = ColoringKernel.minimalColors(spark, edges, Strategy.Jp)
      val (unc, conf) = ColoringKernel.validate(edges, best.colors)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[grid] nodes=$n%3d maxDeg=$d%2d k=${best.k}%2d " +
        f"uncolored=$unc conflicts=$conf t=$sec%6.2f s")
    }
    spark.stop()
  }
}
