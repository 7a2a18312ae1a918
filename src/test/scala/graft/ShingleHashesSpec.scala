package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.llm.TextStats

/** The custom `graft_shingle_hashes` expression (eval + codegen paths)
  * agrees with the composed built-in formulation it replaces:
  * sorted distinct xxhash64 of the space-joined word n-grams. */
class ShingleHashesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("scalar semantics via SQL (codegen path)") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_shingle_hashes(array('a','b','c','a','b'), 3) AS h3,
        |       graft_shingle_hashes(array('a','b'), 3) AS short,
        |       graft_shingle_hashes(CAST(array() AS ARRAY<STRING>), 2) AS empty,
        |       array_sort(array_distinct(transform(
        |         array('a b c', 'b c a', 'c a b'), s -> xxhash64(s)))) AS expected3
        |""".stripMargin).head()
    assert(r.getSeq[Long](0) === r.getSeq[Long](3)) // same hashes as builtin
    assert(r.getSeq[Long](1).isEmpty) // fewer than n tokens
    assert(r.getSeq[Long](2).isEmpty)
  }

  test("agrees with the composed HOF formulation on corpus documents") {
    GraftFunctions.register(spark)
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = TextStats.tokens(col("text"))
    val composed = array_sort(array_distinct(
      transform(TextStats.shingles(toks, 3), s => xxhash64(s))))
    val both = docs.select(
      call_function("graft_shingle_hashes", toks, lit(3)).as("custom"),
      composed.as("expected"))
    assert(both.filter(col("custom") =!= col("expected")).isEmpty,
      "custom expression must equal sorted-distinct xxhash64 over string shingles")
  }

  test("graft_simhash agrees with the composed HOF simhash on corpus documents") {
    GraftFunctions.register(spark)
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = TextStats.tokens(col("text"))
    val both = docs.select(
      call_function("graft_simhash", toks).as("custom"),
      graft.llm.Dedup.simhash(toks).as("expected"))
    assert(both.filter(col("custom") =!= col("expected")).isEmpty,
      "custom simhash must equal the composed aggregate-HOF formulation")
  }
}
