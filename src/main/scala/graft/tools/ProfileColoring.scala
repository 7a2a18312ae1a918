package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.color.ColoringKernel
import graft.color.ColoringKernel.Strategy
import graft.ops.GraphOps

/** Ad-hoc profiler for the coloring kernel (dev tool). */
object ProfileColoring {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nStages = new java.util.concurrent.atomic.AtomicLong
    val nJobs = new java.util.concurrent.atomic.AtomicLong
    val nTasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        nJobs.incrementAndGet()
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        nStages.incrementAndGet(); nTasks.addAndGet(e.stageInfo.numTasks)
      }
    })
    val mainThread = Thread.currentThread()
    new Thread { setDaemon(true); override def run(): Unit = while (true) {
      Thread.sleep(5000)
      println(s"[counters] jobs=${nJobs.get} stages=${nStages.get} tasks=${nTasks.get}")
      println("[mainstack] " + mainThread.getStackTrace.take(12).mkString(" <- "))
    } }.start()

    val t0 = System.nanoTime()
    val edges = GraphOps.kernelEdges(spark, d).localCheckpoint(true)
    val nEdges = edges.count()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val Array(nV, maxDeg) = deg.agg(count(lit(1)), max(col("deg"))).head()
      .toSeq.map(_.toString.toLong.toInt).toArray
    println(f"[profile] graph: V=$nV E=$nEdges maxDeg=$maxDeg " +
      f"build=${(System.nanoTime() - t0) / 1e9}%.1f s")

    sys.env.get("GRAFT_STRATEGY") match {
      case Some("graphx") =>
        val t1 = System.nanoTime()
        val colors = graft.color.GraphXKernel.tryColor(spark, edges, maxDeg + 1).get
        println(f"[profile] GraphX k=${maxDeg + 1}: " +
          f"colors=${ColoringKernel.usedColors(colors)} " +
          f"time=${(System.nanoTime() - t1) / 1e9}%.1f s")
      case Some("greedy-rdd") =>
        // The q_color_greedy fast path, route guard disabled — the A/B leg
        // for the serial-merge crossover measurement (r12 verdict item 4).
        val t1 = System.nanoTime()
        val (colors, rounds, k) = graft.color.GreedyRddKernel
          .colorDeltaPlusOne(spark, edges, nEdges, maxBucketRows = Long.MaxValue)
          .getOrElse(sys.error("greedy-rdd fast path rejected (k > 64?)"))
        println(f"[profile] GreedyRdd k=$k: rounds=$rounds " +
          f"colors=${ColoringKernel.usedColors(colors)} " +
          f"time=${(System.nanoTime() - t1) / 1e9}%.1f s")
      case other =>
        val strat = if (other.contains("greedy")) Strategy.GreedyAgg else Strategy.Jp
        val t1 = System.nanoTime()
        val r = ColoringKernel.tryColor(spark, edges, maxDeg + 1, strat).get
        println(f"[profile] $strat k=${maxDeg + 1}: rounds=${r.rounds} " +
          f"colors=${ColoringKernel.usedColors(r.colors)} " +
          f"time=${(System.nanoTime() - t1) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
