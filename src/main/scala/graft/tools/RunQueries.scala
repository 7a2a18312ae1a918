package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer (dev tool): `runMain graft.tools.RunQueries
  * q_dedup_ngram q_dedup_minhash` times each named SparkEntry query on
  * SPARK_GRAFT_SF_DIR (default sf0.1). */
object RunQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[runq] $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
