package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** TWO-PHASE DISTRIBUTED PREFIX SUM — the scale-out form of
  * `sum(x).over(Window.partitionBy(part).orderBy(ord))`.
  *
  * The single-window form hash-partitions on `part` alone, so every
  * row of a partition key goes through ONE task's sort: fine when the
  * key is fine-grained (user_id, comp), a straggler/OOM when it is a
  * handful of corpus sources at 100 TB (~1/5 of the corpus in one
  * task). The classic fix (Blelloch's scan, and every MPP "running
  * total" implementation) splits the scan:
  *
  *   1. tag each row with an ORDER-CONSISTENT bucket id — bucket(a) <
  *      bucket(b) must imply a sorts before b within the same
  *      partition key (a prefix of the sort key, or a range split);
  *   2. per-(part, bucket) TOTALS: one hash aggregate with map-side
  *      partials — output is |parts| × |buckets| rows (tiny);
  *   3. EXCLUSIVE running sum of those totals over the bucket id — a
  *      window over the tiny aggregate, O(buckets) rows per partition
  *      key, nowhere near the data volume;
  *   4. broadcast the per-bucket offsets back and finish with a LOCAL
  *      running sum per (part, bucket), plus the bucket's offset.
  *
  * The full data is touched by one aggregate and one window keyed on
  * (part, bucket) — parallelism multiplied by the bucket count, no
  * single-task sort of a whole source. The result is EXACTLY the
  * naive window's (prefix sums are bucketing-independent), so the
  * oracle hashes of every consumer are unchanged; the only cost is a
  * second scan of the input to build the totals, the standard trade
  * of scan-twice-shuffle-narrow over sort-everything-in-one-task.
  * (A/B at sf0.1: localCheckpoint-ing the input to avoid the second
  * scan measured neutral-to-worse — the materialization costs what
  * the re-scan costs; callers with an EXPENSIVE input subtree should
  * checkpoint it themselves, as q_curation_pipeline does.)
  */
object PrefixSum {

  /** Inclusive running sum of `value` (a long expression) over rows
    * ordered by `order` within each `part` group, via the two-phase
    * scan above. `bucket` must be order-consistent with `order`'s
    * leading column — see [[hexBucket]] and [[rangeBucket]]. The
    * result appends column `out`; input columns pass through. */
  def runningSum(df: DataFrame, part: Seq[String], order: Seq[Column],
                 value: Column, bucket: Column, out: String): DataFrame = {
    // collision-free temp names (the compact()._ckey convention)
    def free(base: String): String = Iterator.from(0).map(i => s"$base$i")
      .find(n => !df.columns.contains(n) && n != out).get
    val b = free("_psb"); val v = free("_psv"); val o = free("_pso")
    val pc = part.map(col)
    val withB = df.withColumn(b, bucket).withColumn(v, value)
    val totals = withB.groupBy(pc :+ col(b): _*).agg(sum(col(v)).as(v))
    // exclusive scan over the per-bucket totals: this window DOES key
    // on `part` alone, but its input is the aggregate — O(buckets)
    // rows per group, not the data
    val offW = Window.partitionBy(pc: _*).orderBy(col(b))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn(o, coalesce(sum(col(v)).over(offW), lit(0L)))
      .select(pc :+ col(b) :+ col(o): _*)
    val localW = Window.partitionBy(pc :+ col(b): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.join(broadcast(offsets), part :+ b)
      .withColumn(out, sum(col(v)).over(localW) + col(o))
      .drop(b, v, o)
  }

  /** Distributed ROW NUMBER (1-based) within `part` ordered by
    * `order` — the running count of ones through the same scan. */
  def rowNumber(df: DataFrame, part: Seq[String], order: Seq[Column],
                bucket: Column, out: String): DataFrame =
    runningSum(df, part, order, lit(1L), bucket, out)

  /** EXCLUSIVE running max of `value` (a long expression) over rows
    * strictly before the current one in `order` within each `part`
    * group — same two-phase scan as [[runningSum]] (max is just as
    * associative), null when no predecessor exists. The exclusive
    * form is what dominance-style consumers (skyline) need: a row
    * must not see its own value. The ROWS frame makes ties in `order`
    * nondeterministic — callers must pass an order key that is UNIQUE
    * within `part` (aggregate per key first, as q_skyline does).
    * Appends column `out`, null when no predecessor exists. */
  def runningMaxExclusive(df: DataFrame, part: Seq[String], order: Seq[Column],
                          value: Column, bucket: Column, out: String): DataFrame = {
    def free(base: String): String = Iterator.from(0).map(i => s"$base$i")
      .find(n => !df.columns.contains(n) && n != out).get
    val b = free("_pmb"); val v = free("_pmv"); val o = free("_pmo")
    val pc = part.map(col)
    val withB = df.withColumn(b, bucket).withColumn(v, value)
    val totals = withB.groupBy(pc :+ col(b): _*).agg(max(col(v)).as(v))
    // exclusive scan of per-bucket maxes — tiny input, O(buckets)/group
    val offW = Window.partitionBy(pc: _*).orderBy(col(b))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn(o, max(col(v)).over(offW)) // null for the first bucket
      .select(pc :+ col(b) :+ col(o): _*)
    val localW = Window.partitionBy(pc :+ col(b): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    withB.join(broadcast(offsets), part :+ b)
      .withColumn(out, greatest(max(col(v)).over(localW), col(o)))
      .drop(b, v, o)
  }

  /** Order-consistent bucket for an md5-hex sort key: the first two
    * hex characters as an int — 256 buckets, uniform by construction,
    * and lexicographic order of the full digest refines prefix order. */
  def hexBucket(h: Column): Column =
    conv(substring(h, 1, 2), 16, 10).cast("int")

  /** Order-consistent bucket for a numeric sort key with known
    * inclusive bounds: `n` even range splits of [lo, hi]. */
  def rangeBucket(key: Column, lo: Column, hi: Column, n: Int): Column =
    floor((key - lo).cast("long") * n / (hi - lo + 1)).cast("int")
}
