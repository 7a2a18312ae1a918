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
  */
final class SessionCache[V] {
  private val m = TrieMap.empty[(SparkSession, String), V]

  def getOrElseUpdate(spark: SparkSession, key: String)(compute: => V): V = {
    m.keysIterator
      .filter { case (s, _) => s.sparkContext.isStopped }
      .foreach(m.remove)
    m.getOrElseUpdate((spark, key), compute)
  }

  /** Test hook: number of live entries (after a sweep). */
  def size: Int = {
    m.keysIterator
      .filter { case (s, _) => s.sparkContext.isStopped }
      .foreach(m.remove)
    m.size
  }
}
