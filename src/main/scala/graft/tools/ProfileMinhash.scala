package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, TextStats}
import graft.tables.Tables

/** Ad-hoc stage profiler for q_dedup_minhash (dev tool, not part of the
  * driver contract). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Tables.documents(spark, d)
      .select(col("doc_id"),
        array_distinct(TextStats.shingles(TextStats.tokens(col("text")), 3)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig",
        Dedup.minhashSignature(transform(col("sh"), s => xxhash64(s)), 32))

    time("shingles only")(Tables.documents(spark, d)
      .select(array_distinct(TextStats.shingles(TextStats.tokens(col("text")), 3)).as("sh"))
      .agg(sum(size(col("sh")))).head())
    time("sig compute")(docs.agg(sum(size(col("sig")))).head())
    val cached = time("sig persist")(docs.persist().count())
    println(s"[profile] docs=$cached")
    time("full query (uncached docs)")(println(
      "[profile] rows=" + Dedup.qDedupMinhash(spark, d).count()))
    spark.stop()
  }
}
