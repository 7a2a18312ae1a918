package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.GraphOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each key in [[queries]] is one implemented operator from SURVEY.md §2.3;
  * [[oracleSql]] holds the DuckDB-equivalent SQL for every SQL-expressible
  * entry (same column names, explicit ORDER BY on a unique key — the driver
  * hash-compares values after sorting columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    GraphOps.qDegree(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_edges_build" -> (GraphOps.qEdgesBuild _),
    "q_degree" -> (GraphOps.qDegree _),
    "q_degree_stats" -> (GraphOps.qDegreeStats _),
    "q_argmax_seed" -> (GraphOps.qArgmaxSeed _),
    "q_neighbor_colors" -> (GraphOps.qNeighborColors _),
    "q_first_fit" -> (GraphOps.qFirstFit _),
    "q_validate_coloring" -> (GraphOps.qValidateColoring _),
  )

  private val E = GraphOps.edgesSql

  def oracleSql: Map[String, String] = Map(
    "q_edges_build" ->
      s"WITH edges AS ($E) SELECT src, dst FROM edges ORDER BY src, dst",
    "q_degree" ->
      s"WITH edges AS ($E) SELECT src, count(*) AS degree FROM edges GROUP BY src ORDER BY src",
    "q_degree_stats" ->
      s"""WITH edges AS ($E), deg AS (SELECT src, count(*) AS degree FROM edges GROUP BY src)
         |SELECT CAST(avg(degree) AS DOUBLE) AS avg_degree, max(degree) AS max_degree,
         |       count(*) AS n_vertices FROM deg""".stripMargin,
    "q_argmax_seed" ->
      s"""WITH edges AS ($E), deg AS (SELECT src, count(*) AS degree FROM edges GROUP BY src)
         |SELECT src AS id, degree FROM deg ORDER BY degree DESC, src LIMIT 1""".stripMargin,
    "q_neighbor_colors" ->
      s"""WITH edges AS ($E)
         |SELECT src, list_sort(list(DISTINCT CAST(dst % 7 AS INT))) AS neighbor_colors
         |FROM edges GROUP BY src ORDER BY src""".stripMargin,
    "q_first_fit" ->
      s"""WITH edges AS ($E),
         |nc AS (SELECT DISTINCT src, CAST(dst % 7 AS INT) AS c FROM edges)
         |SELECT d.src, CAST(min(g.c) AS INT) AS first_fit
         |FROM (SELECT DISTINCT src FROM nc) d
         |CROSS JOIN generate_series(0, 7) g(c)
         |WHERE NOT EXISTS (SELECT 1 FROM nc WHERE nc.src = d.src AND nc.c = g.c)
         |GROUP BY d.src ORDER BY d.src""".stripMargin,
    "q_validate_coloring" ->
      s"""WITH edges AS ($E),
         |colors AS (SELECT DISTINCT src AS id, CAST(src % 5 AS INT) AS color FROM edges)
         |SELECT count(*) AS conflicts
         |FROM edges e JOIN colors ca ON e.src = ca.id JOIN colors cb ON e.dst = cb.id
         |WHERE ca.color = cb.color""".stripMargin,
  )
}
