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

  /** SELF-join pair generation with automatic salt-above-threshold
    * balancing — the skew treatment for inverted-index joins (shingle
    * index, LSH buckets), where a key shared by df rows yields
    * ~df²/2 pair rows built in the ONE task that owns the key.
    *
    * The df-cap bounds that fan-out by DROPPING ultra-hot keys (they
    * carry no near-dup signal); this operator BALANCES the kept-but-
    * hot middle band the cap lets through. Keys whose precomputed
    * group size exceeds `hotAbove` have their rows hash-split into
    * `g` buckets (the skew report's hot-key criterion applied inline,
    * per key — no separate report pass or driver loop), and pair
    * generation is decomposed over bucket PAIRS (i ≤ j), the classic
    * triangle decomposition from distributed all-pairs/triangle
    * counting: each row replicates to ≤ g+1 (bucket-pair) join keys,
    * every join task sees ~2·df/g input rows instead of 2·df, and the
    * pair set is EXACTLY the plain self-join's (proof sketch: for
    * buckets (bₐ, b_b) exactly one orientation of the pair meets the
    * i ≤ j grid; the same-bucket diagonal keeps the id< filter, the
    * off-diagonal normalizes by least/greatest — one emission per
    * unordered pair either way). Cold keys take bucket 0 alone: the
    * plain join, zero replication.
    *
    * `groupSize` must be a per-key-constant column (the df the caller
    * already computed for its cap filter). Returns one (keys, d1, d2)
    * row per key occurrence shared by a pair, d1 < d2 — the same
    * multiset a plain self-join + `d1 < d2` filter yields. */
  def saltedSelfPairs(df: DataFrame, keys: Seq[String], id: String,
                      groupSize: String, hotAbove: Long,
                      g: Int = 4): DataFrame = {
    val reserved = Seq("__b", "__i", "__j", "d1", "d2")
    require(df.columns.intersect(reserved).isEmpty,
      s"saltedSelfPairs reserves ${reserved.mkString(", ")}")
    val hot = col(groupSize) > hotAbove
    val bucketed = df.withColumn("__b",
      when(hot, pmod(xxhash64(col(id)), lit(g.toLong)).cast("int"))
        .otherwise(lit(0)))
    val lastBucket = when(hot, lit(g - 1)).otherwise(lit(0))
    val kc = keys.map(col)
    val left = bucketed
      .withColumn("__j", explode(sequence(col("__b"), lastBucket)))
      .select(kc :+ col("__b").as("__i") :+ col("__j") :+ col(id).as("d1"): _*)
    val right = bucketed
      .withColumn("__i", explode(sequence(lit(0), col("__b"))))
      .select(kc :+ col("__i") :+ col("__b").as("__j") :+ col(id).as("d2"): _*)
    left.join(right, keys ++ Seq("__i", "__j"))
      .filter((col("__i") === col("__j") && col("d1") < col("d2")) ||
        (col("__i") =!= col("__j") && col("d1") =!= col("d2")))
      .select(kc :+ least(col("d1"), col("d2")).as("d1")
        :+ greatest(col("d1"), col("d2")).as("d2"): _*)
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
