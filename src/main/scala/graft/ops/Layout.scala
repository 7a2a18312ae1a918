package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{count, lit}

/** Count-adaptive partition layout for materialized loop state (r15).
  *
  * Driver-loop queries (Lloyd rounds, power iterations, BFS/peel
  * fixpoints) re-scan a checkpointed frame once or twice per round. The
  * frame inherits its parent's partition count (32 on the local bench,
  * thousands on a cluster), but its ROW count is often a few thousand —
  * and the fixed per-task cost of the big per-round plans (codegen
  * instantiation, accumulator setup; measured ~85-250 ms CPU/task at
  * sf0.1) then dominates every scan. Deriving the partition count from
  * the exact row count keeps the layout scale-adaptive: a 10⁹-row state
  * keeps full parallelism (capped at the session shuffle-partition
  * count, the cluster-sizing knob), a 2 000-row state runs 1 task.
  *
  * `coalesce` on an already-materialized checkpoint is a narrow
  * dependency — no shuffle, no recompute, each task reads several
  * checkpoint blocks locally.
  */
object Layout {

  /** Rows-per-partition target (session conf). 64 Ki rows of loop state
    * is far above the per-task fixed cost crossover and far below any
    * size where single-task row work matters. */
  val RowsPerPartitionKey = "graft.materialize.rowsPerPartition"
  val DefaultRowsPerPartition: Long = 65536L

  private def target(df: DataFrame, rows: Long): Int = {
    val conf = df.sparkSession.conf
    val per = conf.get(RowsPerPartitionKey,
      DefaultRowsPerPartition.toString).toLong
    val cap = df.sparkSession.sessionState.conf.numShufflePartitions
    math.max(1L, math.min(cap.toLong, (rows + per - 1) / per)).toInt
  }

  /** `df.coalesce(k)` with k derived from the exact `rows` count; never
    * widens (k is floored at 1, capped at the current partition count
    * implicitly — coalesce to a larger number is a no-op). */
  def coalesceByCount(df: DataFrame, rows: Long): DataFrame =
    df.coalesce(target(df, rows))

  /** Eagerly checkpoint `df`, reading its row count from an Observation
    * riding the checkpoint's own action (no separate count job), and
    * coalesce the materialized frame by that count. Returns the compact
    * frame plus the count. */
  def checkpointCompact(df: DataFrame): (DataFrame, Long) = {
    val obs = new org.apache.spark.sql.Observation()
    val ck = df.observe(obs, count(lit(1)).as("n")).localCheckpoint(true)
    val n = obs.get("n") match { case l: Long => l; case _ => 0L }
    (coalesceByCount(ck, n), n)
  }
}
