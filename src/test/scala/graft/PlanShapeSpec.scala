package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Dedup, Similarity}
import graft.ops.Relational

/** Physical-plan assertions for scale-critical properties beyond
  * RelationalSpec's: partial aggregation, whole-stage codegen, and
  * no-cartesian guarantees for the candidate-generation joins. */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q_agg_partial plans a partial+final hash aggregate (map-side combine)") {
    val p = plan(Relational.qAggPartial(spark, sf))
    // Two HashAggregate nodes for the same grouping = partial + final —
    // the reference's aggregateByKey optimization, supplied by Catalyst.
    val n = "HashAggregate".r.findAllIn(p).length
    assert(n >= 2, s"expected partial+final HashAggregate, plan:\n$p")
  }

  test("hot-path queries run inside WholeStageCodegen") {
    for (q <- Seq(Relational.qScalarMath(spark, sf), Relational.qAggPartial(spark, sf))) {
      q.collect() // AQE only finalizes (and shows codegen spans) on execution
      val p = plan(q)
      // "*(n)" prefixes = WholeStageCodegen stages in the final plan
      assert(p.contains("*("), s"no codegen span:\n$p")
    }
  }

  test("minhash/simhash candidate joins are equi-joins, never cartesian") {
    for (q <- Seq(Dedup.qDedupMinhash(spark, sf), Dedup.qDedupSimhash(spark, sf),
      Dedup.qDedupNgram(spark, sf))) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"cartesian in plan:\n$p")
    }
  }

  test("brute-force top-k broadcasts the small query side") {
    val p = plan(Similarity.qSimTopk(spark, sf))
    // Non-equi (query_id != cand_id) join with a 10-row build side must be
    // a broadcast nested loop with the big side streamed, not a shuffle.
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$p")
  }

  test("group_collect sorts collected arrays (deterministic under partitioning)") {
    val r1 = Relational.qGroupCollect(spark, sf).collect().toSeq
    val r2 = Relational.qGroupCollect(spark, sf).collect().toSeq
    assert(r1 === r2)
  }

  test("filter predicates and column pruning reach the parquet scan") {
    val p = plan(Relational.qFilterPred(spark, sf))
    assert(p.contains("PushedFilters: [") && p.contains("EqualTo(l_returnflag,R"),
      s"filters not pushed to scan:\n$p")
    // Pruned read: the 16-column lineitem scan must only read the 4 output
    // columns + the 2 extra predicate columns.
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_comment"),
      s"scan reads unprojected columns:\n$readSchema")
  }

  test("dimension join with broadcast hint plans a BroadcastHashJoin") {
    val p = plan(Relational.qJoinBroadcast(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim join fell back to SMJ:\n$p")
  }

  test("salted aggregation plans two aggregation stages (salt fan-out then merge)") {
    val p = plan(graft.ops.Skew.qAggSalted(spark, sf))
    // partial+final for (key, salt), then partial+final for key = 4 nodes.
    val n = "HashAggregate".r.findAllIn(p).length
    assert(n >= 4, s"expected two-stage salted aggregate, got $n HashAggregates:\n$p")
  }

  test("custom hash expressions run inside WholeStageCodegen") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val df = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"),
        call_function("graft_minhash_sig",
          graft.llm.TextStats.tokens(col("text")), lit(3), lit(32)).as("sig"),
        call_function("graft_simhash",
          graft.llm.TextStats.tokens(col("text"))).as("sh"))
    df.collect()
    val p = plan(df)
    assert(p.contains("*("), s"expression stage not codegen'd:\n$p")
  }
}
