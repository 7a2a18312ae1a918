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
}
