package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for q_assoc_rules (dev tool, not part of the
  * driver contract): times each stage of the basket-collapse formulation
  * in isolation to locate where the CPU goes at the ScaleUp legs. */
object ProfileAssoc {
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

    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    time("distinct (ok,pk)")(li.distinct().count())
    val b = li.distinct().localCheckpoint(true)
    time("groupBy ok collect_set")(
      b.groupBy("ok").agg(sort_array(collect_set(col("pk"))).as("pks")).count())
    val cls = b.groupBy("ok").agg(sort_array(collect_set(col("pk"))).as("pks"))
      .select(col("pks"), xxhash64(col("pks")).as("bk1"),
        xxhash64(lit(1L), col("pks")).as("bk2"))
      .groupBy("bk1", "bk2").agg(count(lit(1)).as("m"), min(col("pks")).as("pks"))
      .select(col("m"), col("pks")).localCheckpoint(true)
    time("class table (ckpt) count")(cls.count())
    val pairsHof = cls.select(col("m"), explode(flatten(transform(col("pks"),
      (x, i) => transform(
        slice(col("pks"), i + lit(2), size(col("pks")) - i - lit(1)),
        y => struct(x.as("a"), y.as("b")))))).as("p"))
    time("pair explode (HOF form)")(pairsHof.count())
    graft.functions.GraftFunctions.register(spark)
    val pairs = cls.select(col("m"),
      explode(call_function("graft_ordered_pairs", col("pks"))).as("p"))
    time("pair explode (fused expr)")(pairs.count())
    time("pair agg + support>=3")(
      pairs.groupBy(col("p.a"), col("p.b")).agg(sum(col("m")).as("s"))
        .filter(col("s") >= 3).count())
    val full = time("full qAssocRules")(
      graft.ops.EventAnalytics.qAssocRules(spark, d).count())
    println(s"[profile] rules rows: $full")
    spark.stop()
  }
}
