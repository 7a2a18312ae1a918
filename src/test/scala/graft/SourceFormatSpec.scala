package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.Tables

/** Source/sink round-trips beyond parquet (SURVEY.md §2.2 scans/sources/
  * sinks): CSV and JSON-lines writes read back value-identical, with schema
  * carried explicitly (the 100 TB posture: never infer schema on the read
  * path). */
class SourceFormatSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  private def roundTrip(format: String): Unit = {
    val dir = Files.createTempDirectory(s"graft_$format").toString
    val src = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"))
    src.write.mode("overwrite").format(format)
      .option("header", "true").save(dir)
    val back = spark.read.format(format)
      .option("header", "true").schema(src.schema).load(dir)
    assert(back.count() === src.count())
    assert(back.schema === src.schema)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
      s"$format round-trip not value-identical")
  }

  test("csv round-trip preserves values and schema")(roundTrip("csv"))
  test("json round-trip preserves values and schema")(roundTrip("json"))
}
