package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for large-cluster joins (design brief:
  * "salting for skew, AQE for runtime re-plan").
  *
  * AQE's skew-join handling splits oversized sort-merge partitions at
  * runtime and is the first line of defense (enabled in Bench/Verify).
  * Salting is the static fallback for the cases AQE can't fix — e.g. a
  * broadcast-ineligible dimension with one mega-key: the skewed side gets
  * a random salt in [0, n), the replicated side is exploded across all n
  * salts, and the join key becomes (key, salt), spreading the hot key over
  * n tasks at the cost of replicating the smaller side n times.
  */
object SkewUtils {

  /** Range-partition width for the two-phase global numbering
    * (`layout_global_index` / `globalRank` / KS cumsums): the
    * cluster's `defaultParallelism` with a floor of 16. The floor
    * keeps the per-partition offset table non-trivial (and the oracle
    * comparison meaningful) on tiny local runs; on a real cluster the
    * width scales with the executors — a 1000-core deployment numbers
    * through 1000-way ranges, not a hard-coded 16 (the offset table
    * stays one row per partition, broadcast-sized at any width). */
  def rankWidth(s: org.apache.spark.sql.SparkSession): Int =
    math.max(16, s.sparkContext.defaultParallelism)

  /** Inner-join `skewed` with `small` on `key`, spreading each key over
    * `salts` shuffle partitions. `small` is replicated `salts` times. */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    // deterministic salt: hash of all columns PLUS a per-row position mod
    // salts (not rand(), so retried tasks re-derive identical salts —
    // required for exactly-once). The positional term matters: hot keys
    // often arrive as full-duplicate rows (repeated events), and a
    // content-only hash would map every duplicate to ONE salt, defeating
    // the spread. monotonically_increasing_id() is partitionId<<33 + the
    // row's offset within its partition — stable across task retries for
    // a deterministic input partition, unique across duplicates.
    val saltCol: Column = pmod(
      xxhash64((skewed.columns.map(col).toSeq :+ monotonically_increasing_id()): _*),
      lit(salts)).cast("int")
    val left = skewed.withColumn("__salt", saltCol)
    val right = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    left.join(right, Seq(key, "__salt")).drop("__salt")
  }
}
