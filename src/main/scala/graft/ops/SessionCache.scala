package graft.ops

import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Session-keyed memo for derived relations and scalars that several queries
  * share (the materialized-view stance of SURVEY §8: deterministic pipelines
  * run once per session per sfDir; later consumers read the result).
  *
  * Entries whose session has been STOPPED are evicted on every access
  * (r5 ADVICE: a plain `TrieMap[(SparkSession, String), _]` pinned
  * checkpointed/persisted DataFrames of dead sessions forever — a
  * memory/disk leak in any long-lived JVM that cycles sessions, e.g. test
  * suites with session restarts). Eviction is O(entries) per access, and
  * the maps hold a handful of keys — one per (session, sfDir) pair — so the
  * sweep is noise next to the Spark jobs the cache fronts.
  *
  * A fresh session (or a new sfDir) therefore always recomputes: the key is
  * the live session OBJECT plus the data directory, never stale state.
  *
  * Compute-once is guaranteed under concurrent first-touch (r6 ADVICE:
  * `TrieMap.getOrElseUpdate` is not atomic for the by-name compute, so two
  * threads racing a cold key could both run an eager persist-and-count
  * pipeline and leak one result's cache for the session): the value is
  * wrapped in a cell whose `lazy val` runs the compute — `putIfAbsent`
  * elects exactly one cell, and the loser blocks on the winner's lazy
  * initializer instead of recomputing.
  */
final class SessionCache[V] {
  private final class Cell(compute: () => V) { lazy val value: V = compute() }
  private val m = TrieMap.empty[(SparkSession, String), Cell]

  def getOrElseUpdate(spark: SparkSession, key: String)(compute: => V): V = {
    m.keysIterator
      .filter { case (s, _) => s.sparkContext.isStopped }
      .foreach(m.remove)
    val k = (spark, key)
    val cell = m.get(k).getOrElse {
      val c = new Cell(() => compute)
      m.putIfAbsent(k, c).getOrElse(c)
    }
    cell.value
  }

  /** Test hook: number of live entries (after a sweep). */
  def size: Int = {
    m.keysIterator
      .filter { case (s, _) => s.sparkContext.isStopped }
      .foreach(m.remove)
    m.size
  }
}
