package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D SKYLINE (pareto frontier, maximize both axes) without the
  * O(n²) dominance self-join.
  *
  * q dominates p iff q.x ≥ p.x ∧ q.y ≥ p.y with at least one strict;
  * exact (x, y) duplicates are mutually non-dominating and all
  * survive. The textbook NOT-EXISTS form is quadratic; this plan is
  * O(n): per-x max y, then an EXCLUSIVE suffix max over x
  * (descending) via the two-phase distributed prefix scan
  * ([[PrefixSum.runningMaxExclusive]]) — a point survives iff it
  * holds the max y at its own x AND beats every y seen at strictly
  * greater x. No self-join and no single-task global sort:
  * parallelism = range buckets, so the dominance test survives a
  * 100 TB input. Consumers: q_skyline (RelQueries); randomized
  * brute-force equivalence in RandomizedPropertySpec.
  */
object Skyline {

  /** Rows of `df` not dominated on the numeric columns (`x`, `y`).
    * Output columns = input columns (the internal per-x aggregate and
    * suffix-max columns are dropped). */
  def pareto2D(df: DataFrame, x: String, y: String, buckets: Int = 32): DataFrame = {
    def free(base: String): String = Iterator.from(0).map(i => s"$base$i")
      .find(n => !df.columns.contains(n)).get
    val my = free("_skmax"); val sx = free("_sksfx"); val nx = free("_skneg")
    val lo = free("_sklo"); val hi = free("_skhi")
    val perX = df.groupBy(x).agg(max(col(y)).as(my))
    val bounds = broadcast(df.agg(min(col(x)).as(lo), max(col(x)).as(hi)))
    // suffix max over x DESC == exclusive prefix max over -x ASC; x is
    // unique in perX, satisfying runningMaxExclusive's contract
    val sfx = PrefixSum.runningMaxExclusive(
        perX.crossJoin(bounds).withColumn(nx, -col(x)),
        Seq.empty, Seq(col(nx)), col(my),
        PrefixSum.rangeBucket(col(nx), -col(hi), -col(lo), buckets), sx)
      .select(col(x), col(my), col(sx))
    df.join(sfx, x)
      .filter(col(y) === col(my) && (col(sx).isNull || col(y) > col(sx)))
      .drop(my, sx)
  }
}
