package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers (builder mandate: "salting for skew, AQE for
  * runtime re-plan").
  *
  * AQE's skew-join splitting handles sort-merge skew automatically; the
  * explicit salt is for the cases AQE can't fix (skewed aggregation
  * keys, skewed broadcast-probe residency, deterministic repartitions).
  */
object Skew {

  /** Equi-join where `left`'s `key` distribution is heavily skewed:
    * spread each hot key over `nSalts` reducers by salting the left
    * side with a deterministic per-row hash of `spread` (any row-unique
    * column) and replicating the (small) right side once per salt.
    * Result is exactly the plain join — only the shuffle layout
    * changes. `right` grows ×`nSalts`, so it must be the small side. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 spread: Column, nSalts: Int = 8): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(xxhash64(spread), lit(nSalts.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation for skewed grouping keys: partial aggregate
    * on (key, salt), final re-aggregate on key. `partials` maps each
    * aggregate to (partial expr, final re-agg of the partial column). */
  def saltedAgg(df: DataFrame, key: String, spread: Column, nSalts: Int)(
      partials: (String, Column, String => Column)*): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(spread), lit(nSalts.toLong)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map(p => p._2.as(p._1)): _*)
    salted.groupBy(key)
      .agg(partials.head._3(partials.head._1).as(partials.head._1),
        partials.tail.map(p => p._3(p._1).as(p._1)): _*)
  }
}
