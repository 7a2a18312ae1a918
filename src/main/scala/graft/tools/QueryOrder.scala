package graft.tools

/** Prints `SparkEntry.queries`' ITERATION order (no Spark session — the
  * closures are never invoked). This is the order the r10-and-earlier bench
  * executed queries in: an immutable HashMap's iteration order is a pure
  * function of its key set, so ADDING queries silently reshuffles who runs
  * first — and with SessionCache memos (edges, kernelEdges, triangleTriples,
  * lpCache), who runs first decides who PAYS for the shared build. The r10
  * "q_label_prop regression" was exactly this: 4 new keys moved it ahead of
  * the memo-warming graph queries (see bench/NOTES.md r11). Bench now runs
  * in sorted(name) order so attribution is stable under surface growth;
  * this tool remains for diffing historical orders (pass a file of key
  * names to print THAT set's HashMap order instead).
  */
object QueryOrder {
  def main(args: Array[String]): Unit = {
    val keys: Seq[String] =
      if (args.nonEmpty)
        scala.io.Source.fromFile(args(0)).getLines().map(_.trim).filter(_.nonEmpty).toSeq
      else graft.SparkEntry.queries.keys.toSeq
    val m: Map[String, Int] = keys.map(_ -> 0).toMap
    m.keys.zipWithIndex.foreach { case (k, i) => println(f"$i%3d $k") }
  }
}
