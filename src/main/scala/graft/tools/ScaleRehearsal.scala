package graft.tools

import org.apache.spark.sql.functions._

/** Scale rehearsal for the near-dup/dedup family: runs the four
  * heaviest dedup queries on the sf0.1 documents table and on a
  * synthetic ×N corpus, and prints per-query times + the empirical
  * scaling exponent log(tN/t1)/log(N) — the measurement behind
  * ARCHITECTURE.md's "nothing quadratic in the corpus" claim.
  *
  * Corpus construction keeps near-dup DENSITY constant: each of the N
  * copies remaps its vocabulary (token suffix per copy), so documents
  * only near-dup WITHIN their copy — true pairs scale ×N, not ×N².
  * A verbatim ×N copy would instead multiply every doc's duplicate
  * set by N and conflate "more data" with "denser duplicates"; the
  * prefix/LSH designs are explicitly allowed to cost more when
  * density genuinely rises (fan-out ∝ near-dup density is the
  * documented contract), so the fair experiment holds density fixed.
  *
  * For q_dedup_incremental the fixture's base cut (doc_id < 400)
  * keeps the base side constant while the delta side scales ×N —
  * which is precisely the asymmetric-PPJoin claim under test ("scales
  * with |delta|, never |corpus|²").
  *
  * Usage: runMain graft.tools.ScaleRehearsal [sfDir] [factor]
  * (defaults /root/testdata/sf0.1, ×10). Single cold run per query
  * per scale in one JVM after a warmup — the ±20-30% run noise
  * documented in BENCH notes is irrelevant at the linear-vs-quadratic
  * (10× vs 100×) discrimination this measures.
  */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val spark = graft.GraftSession.local()
    val queries = Seq("q_setsim_prefix", "q_shingle_jaccard",
      "q_dedup_incremental", "q_dedup_clusters")

    def scaledDir(n: Int): String = {
      if (n == 1) return base
      // cache key includes the BASE corpus: a rerun against a different
      // sfDir must not silently reuse a stale scaled corpus
      val baseTag = java.lang.Integer.toHexString(base.hashCode)
      val dir = s"/tmp/graft_scale_${baseTag}_x$n"
      if (!new java.io.File(s"$dir/documents.parquet").exists()) {
        val docs = spark.read.parquet(s"$base/documents.parquet")
        (0 until n).map { k =>
          val copy = docs.withColumn("doc_id",
            col("doc_id") + lit(k.toLong * 10000000L))
          if (k == 0) copy
          else copy.withColumn("text", array_join(
            transform(split(col("text"), " "), t => concat(t, lit(s"v$k"))), " "))
        }.reduce(_ unionByName _)
          .repartition(32)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      }
      dir
    }

    // warmup: JIT + codegen caches, touching the same operator families
    graft.SparkEntry.queries("q_dedup_exact")(spark, base).collect()

    val oneDir = scaledDir(1)
    val bigDir = scaledDir(factor)
    def time(q: String, dir: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val rows = queries.map { q =>
      val (t1, n1) = time(q, oneDir)
      val (tN, nN) = time(q, bigDir)
      val exp = math.log(tN / t1) / math.log(factor.toDouble)
      f"""{"query":"$q","t1_sec":$t1%.2f,"t${factor}_sec":$tN%.2f,""" +
        f""""rows1":$n1,"rows$factor":$nN,"exponent":$exp%.2f}"""
    }
    println("SCALE_REHEARSAL_BEGIN")
    rows.foreach(println)
    println("SCALE_REHEARSAL_END")
    spark.stop()
  }
}
