package graft.tables

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus identity manifest (r10 verdict item 4).
  *
  * The 10×/30×/100× ScaleUp corpora live under /tmp and vanish between
  * sessions; the committed bench/gate artifacts reference them, and until
  * now reproducibility rested on "the generator is deterministic" with no
  * proof. The manifest is that proof: per table, the exact row count and an
  * ORDER-INDEPENDENT content checksum —
  *
  *   checksum(t) = Σ_rows xxhash64(col₁, …, colₙ)  accumulated in
  *   DECIMAL(38,0)
  *
  * — exact integer (no ANSI overflow at any realistic row count: |Σ| <
  * n·2⁶³, inside 38 digits past 10¹⁸ rows), independent of partitioning
  * and row order (addition commutes), and a pure function of the table's
  * VALUES for a fixed Spark version (xxhash64 hashes the internal binary
  * representation). `ScaleUp` writes `manifest.json` next to the tables;
  * a copy is committed under `bench/manifests/`, and `Verify`/`Bench`
  * recompute-and-compare on startup whenever a manifest is present (or
  * `GRAFT_MANIFEST` points at a committed one), failing LOUDLY on any
  * mismatch — a regenerated corpus is now provably the corpus the
  * committed artifacts measured, not presumably.
  *
  * Cost: one full scan of each table (map-side hash + 1-row agg), ~seconds
  * per GB at 32 threads — paid once per leg session; set
  * `GRAFT_SKIP_MANIFEST=1` to opt out of the startup check.
  */
object Manifest {

  /** All corpus tables, in the fixed manifest order. */
  private val TABLES = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** (rows, checksum-decimal-string) for one table file. */
  def tableEntry(spark: SparkSession, dir: String, name: String): (Long, String) = {
    // Absorb either events.ts writer schema the same way Tables.events
    // does — without this a nanos-footer corpus fails schema conversion.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val row = df.agg(
      count(lit(1)).as("n"),
      coalesce(sum(xxhash64(df.columns.map(col).toIndexedSeq: _*)
        .cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")).as("c"))
      .head()
    (row.getLong(0), Option(row.getDecimal(1)).map(_.toBigInteger.toString).getOrElse("0"))
  }

  def compute(spark: SparkSession, dir: String): Seq[(String, Long, String)] =
    TABLES.filter(t => Files.exists(Paths.get(s"$dir/$t.parquet")))
      .map { t => val (n, c) = tableEntry(spark, dir, t); (t, n, c) }

  def render(entries: Seq[(String, Long, String)]): String =
    entries.map { case (t, n, c) =>
      s"""  "$t": {"rows": $n, "xxh64sum": "$c"}"""
    }.mkString("{\n", ",\n", "\n}\n")

  /** Compute + write `<dir>/manifest.json`. */
  def write(spark: SparkSession, dir: String): Unit = {
    val json = render(compute(spark, dir))
    Files.writeString(Paths.get(s"$dir/manifest.json"), json)
    println(s"[manifest] wrote $dir/manifest.json\n$json")
  }

  /** Minimal parser for the writer's own fixed format (no JSON dependency
    * in the library): one `"table": {"rows": N, "xxh64sum": "C"}` per
    * line. */
  private[graft] def parse(json: String): Map[String, (Long, String)] = {
    val entry = """"(\w+)":\s*\{"rows":\s*(\d+),\s*"xxh64sum":\s*"(-?\d+)"\}""".r
    entry.findAllMatchIn(json)
      .map(m => m.group(1) -> (m.group(2).toLong, m.group(3)))
      .toMap
  }

  /** Verify `dir`'s tables against a manifest: the explicit
    * `GRAFT_MANIFEST` path if set (the committed-proof workflow), else
    * `<dir>/manifest.json` if present, else a silent no-op (the driver's
    * own testdata carries no manifest). Throws with a per-table diff on
    * any mismatch. `GRAFT_SKIP_MANIFEST=1` skips entirely. */
  def verifyIfPresent(spark: SparkSession, dir: String): Unit = {
    if (sys.env.get("GRAFT_SKIP_MANIFEST").contains("1")) return
    val path = sys.env.get("GRAFT_MANIFEST")
      .orElse(Option(s"$dir/manifest.json").filter(p => Files.exists(Paths.get(p))))
      .getOrElse(return)
    val want = parse(Files.readString(Paths.get(path)))
    require(want.nonEmpty, s"[manifest] $path parsed to zero entries")
    val got = compute(spark, dir)
    val bad = got.flatMap { case (t, n, c) =>
      want.get(t) match {
        case Some((wn, wc)) if wn == n && wc == c => None
        case Some((wn, wc)) =>
          Some(s"$t: rows $n vs manifest $wn, checksum $c vs manifest $wc")
        case None => Some(s"$t: present in corpus, absent from manifest")
      }
    } ++ (want.keySet -- got.map(_._1)).map(t => s"$t: in manifest, missing from corpus")
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"[manifest] corpus $dir DIVERGES from $path:\n  ${bad.mkString("\n  ")}")
    println(s"[manifest] $dir verified against $path (${got.size} tables)")
  }
}
