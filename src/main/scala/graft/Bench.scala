package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT, classloading, codegen-compiler and parquet-footer
    // costs land here instead of inside whichever query the Map iteration
    // order happens to put first (measured ~3 s attributed to the first
    // query without it). The flagship entry touches scan/join/agg codegen.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // Dev fast path: GRAFT_BENCH_ONLY=q_a,q_b restricts the timed set.
    val only = sys.env.get("GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    val results = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Human-readable per-query lines FIRST (sorted), compact JSON line LAST:
    // a tail-capture of bounded size then always ends with the intact JSON
    // (r3/r4 printed the JSON as one giant unrounded line and the capture
    // window cut it before the opening brace → "parsed": null).
    val sorted = results.toSeq.sortBy(_._1)
    sorted.foreach { case (k, v) => println(f"[bench] $k%-24s $v%8.3f s") }
    val qs = sorted.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // Belt and braces: the same JSON as a file, immune to capture windows.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("GRAFT_BENCH_OUT", "/tmp/bench.json")),
      json.getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(json)
    spark.stop()
  }
}
