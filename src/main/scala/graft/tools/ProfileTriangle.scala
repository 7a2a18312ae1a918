package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage timing for q_triangle_count (not part of the driver
  * contract): isolates edge-list build, orientation, adjacency, and the
  * intersect join so the hotspot is measurable instead of guessed. */
object ProfileTriangle {
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

    val li = graft.tables.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
    t("warmup scan")(li.count())

    // v1: self-join on orderkey + distinct (current GraphOps.edges shape)
    val e1 = t("edges v1 self-join") {
      val e = li.as("a")
        .join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") =!= col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct()
      println("  v1 rows=" + e.count()); e
    }
    // v2: one hash-agg to per-order part lists, expand pairs, distinct
    val e2 = t("edges v2 collect+expand") {
      val e = li.groupBy(col("l_orderkey"))
        .agg(array_distinct(collect_list(col("l_partkey"))).as("parts"))
        .select(explode(col("parts")).as("src"), col("parts"))
        .select(col("src"), explode(col("parts")).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      println("  v2 rows=" + e.count()); e
    }
    e1.unpersist(); e2.unpersist()
    spark.stop()
  }
}
