package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Ad-hoc A/B profiler for q_dedup_containment (dev tool, not part of the
  * driver contract): the pre-r12 per-document inverted-index formulation
  * vs the rep-collapsed classPairsOf engine, isolated, on one corpus —
  * plus the Σ C(df,2) pre-aggregation volume so staged-pass triggering is
  * visible. Usage: ProfileContainment <sfDir> [old|new|both|revboth]
  * (revboth = new-then-old, the paired-order protocol's second leg). */
object ProfileContainment {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = if (args.length > 1) args(1) else "both"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    sys.env.get("GRAFT_PASS_BYTES").foreach(v =>
      spark.conf.set(graft.llm.Dedup.NgramPassBytesKey, v))

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    def toks(c: org.apache.spark.sql.Column) = graft.llm.TextStats.tokens(c)
    val docs = Tables.documents(spark, d)

    // Pre-agg volume of the doc-level index join (what the OLD form pays).
    val idx = Tables.spread(docs)
      .select(col("doc_id"),
        explode(call_function("graft_shingle_hashes", toks(col("text")), lit(5)))
          .as("shingle"))
    time("sum C(df,2) doc-level") {
      val r = idx.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .agg(coalesce(sum(col("df") * (col("df") - lit(1))), lit(0L)))
        .head().getLong(0) / 2
      println(s"[profile]   doc-level pre-agg pair rows: $r")
    }

    def runOld(): Unit = {
      // The pre-r12 formulation, verbatim.
      val oldIdx = idx.localCheckpoint(true)
      val sizes = graft.ops.Broadcasts.maybeBroadcast(
        oldIdx.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh")))
      val shared = oldIdx.as("a")
        .join(oldIdx.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("shared"))
      val old = shared
        .join(sizes.select(col("doc_id"), col("n_sh").as("size_a")),
          col("doc_a") === col("doc_id")).drop("doc_id")
        .join(sizes.select(col("doc_id"), col("n_sh").as("size_b")),
          col("doc_b") === col("doc_id")).drop("doc_id")
        .select(col("doc_a"), col("doc_b"),
          (col("shared").cast("double") / least(col("size_a"), col("size_b")))
            .as("containment"),
          (col("shared").cast("double") /
            (col("size_a") + col("size_b") - col("shared"))).as("jaccard"))
        .filter(col("containment") >= 0.5)
      time("OLD doc-level form")(println(s"[profile]   rows: ${old.count()}"))
    }
    def runNew(): Unit =
      time("NEW classPairsOf engine")(println(s"[profile]   rows: " +
        graft.llm.Dedup.containmentPairs(docs, 5, 0.5).count()))
    mode match {
      case "old" => runOld()
      case "new" => runNew()
      case "revboth" => runNew(); runOld()
      case "both" => runOld(); runNew()
      case other => sys.error(
        s"ProfileContainment: unknown mode '$other' (old|new|both|revboth)")
    }
    spark.stop()
  }
}
