package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.GraphOps

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

    // The SHIPPED round body (GraphOps.labelPropRound over the one-time
    // dst-repartitioned persisted edge copy) — not a re-inlined variant, so
    // the profile tracks the production plan as it evolves (r7 ADVICE: the
    // previous inline measured the pre-5bd2dfb max(struct) shape).
    val eDst = t("dst repartition + persist") {
      val d = e.repartition(col("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      d.count()
      d
    }
    var labels = t("label init (distinct src)") {
      val l = e.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("label"))
      spark.createDataFrame(l.localCheckpoint(true).rdd, l.schema)
    }
    for (r <- 1 to 4) {
      labels = t(s"round $r (join+2agg+ckpt)") {
        val next = GraphOps.labelPropRound(eDst, labels, vBound)
        spark.createDataFrame(next.localCheckpoint(true).rdd, next.schema)
      }
    }
    t("final orderBy+count")(labels.orderBy(col("id")).count())
    eDst.unpersist(blocking = false)
    spark.stop()
  }
}
