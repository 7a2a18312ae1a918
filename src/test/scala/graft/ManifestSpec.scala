package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.Manifest

/** Corpus manifest identity proof (r10 verdict item 4): the checksum must
  * be row-order-independent (a pure function of the VALUES, so a
  * regenerated corpus with different partitioning still verifies), and a
  * single changed value must fail the verify LOUDLY. */
class ManifestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def writeCorpus(dir: String, flip: Boolean, shuffle: Boolean): Unit = {
    import spark.implicits._
    Files.createDirectories(Paths.get(dir))
    val rows = (1L to 1000L).map(i =>
      (i, s"name_$i", if (flip && i == 500L) 999.25 else i * 1.5))
    val base = (if (shuffle) scala.util.Random.shuffle(rows) else rows)
      .toDF("c_custkey", "c_name", "c_acctbal")
    // Different partition counts across variants: the checksum must not care.
    base.repartition(if (shuffle) 7 else 2)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/_tmp")
    // Manifest reads <dir>/<table>.parquet as a path — the directory form
    // Spark wrote is exactly that.
    val tgt = Paths.get(s"$dir/customer.parquet")
    if (Files.exists(tgt)) {
      Files.walk(tgt).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
    Files.move(Paths.get(s"$dir/_tmp"), tgt)
  }

  test("checksum is row-order and partitioning independent; verify passes") {
    val a = Files.createTempDirectory("mani_a").toString
    val b = Files.createTempDirectory("mani_b").toString
    writeCorpus(a, flip = false, shuffle = false)
    writeCorpus(b, flip = false, shuffle = true)
    val ea = Manifest.tableEntry(spark, a, "customer")
    val eb = Manifest.tableEntry(spark, b, "customer")
    assert(ea === eb, "same values, different order/partitioning must match")
    Manifest.write(spark, a)
    // b verifies against a's manifest (same content, different layout).
    Files.copy(Paths.get(s"$a/manifest.json"), Paths.get(s"$b/manifest.json"))
    Manifest.verifyIfPresent(spark, b)
  }

  test("a single changed value fails the verify loudly") {
    val a = Files.createTempDirectory("mani_c").toString
    writeCorpus(a, flip = false, shuffle = false)
    Manifest.write(spark, a)
    writeCorpus(a, flip = true, shuffle = false) // same rows, one value changed
    val e = intercept[IllegalStateException](Manifest.verifyIfPresent(spark, a))
    assert(e.getMessage.contains("DIVERGES"))
    assert(e.getMessage.contains("customer"))
  }

  test("parse round-trips the writer's format") {
    val entries = Seq(("customer", 12L, "-5"), ("lineitem", 34L, "99"))
    val m = Manifest.parse(Manifest.render(entries))
    assert(m === Map("customer" -> (12L, "-5"), "lineitem" -> (34L, "99")))
  }
}
