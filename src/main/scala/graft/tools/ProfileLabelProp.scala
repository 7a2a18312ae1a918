package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Broadcasts, GraphOps}

/** Dev-only stage timing for the q_label_prop / q_modularity pipeline (not
  * part of the driver contract): isolates the edge memo first touch, the
  * label init distinct, and each synchronous round so the first-consumer
  * wall cost is attributable instead of guessed. */
object ProfileLabelProp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    val (eRaw, vBound) = t("edges memo first touch") {
      GraphOps.edgesWithCount(spark, sfDir)
    }
    val e = eRaw.select(col("src"), col("dst"))
    println(s"  |E| bound = $vBound")

    var labels = t("label init (distinct src)") {
      val l = e.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("label"))
      spark.createDataFrame(l.localCheckpoint(true).rdd, l.schema)
    }
    for (r <- 1 to 4) {
      labels = t(s"round $r (join+2agg+ckpt)") {
        val next = e.join(Broadcasts.maybeBroadcast(labels, vBound), col("src") === col("id"))
          .groupBy(col("dst"), col("label"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("dst"))
          .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
          .select(col("dst").as("id"), (-col("m.nl")).as("label"))
        spark.createDataFrame(next.localCheckpoint(true).rdd, next.schema)
      }
    }
    t("final orderBy+count")(labels.orderBy(col("id")).count())
    spark.stop()
  }
}
