package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.functions.KllSketch

/** KllSketch: rank-error bounds vs exact order statistics, exactness
  * below the compaction threshold, merge across partitions, and the
  * SQL registration. (No DuckDB oracle — compaction is arrival-order
  * dependent; this spec IS the correctness evidence, like HllSketch's.) */
class KllSketchSpec extends SparkTestBase {
  import spark.implicits._

  private def rankError(values: Seq[Double], est: Double, q: Double): Double = {
    val sorted = values.sorted
    val below = sorted.count(_ < est)
    val atMost = sorted.count(_ <= est)
    // distance from the closest achievable rank of est to the target
    val target = q * values.length
    val dist = if (target < below) below - target
      else if (target > atMost) target - atMost
      else 0.0
    dist / values.length
  }

  test("rank error stays within bound on 20k skewed values across partitions") {
    val rnd = new Random(1)
    // log-normal-ish skew — the shape that breaks naive equal-width bins
    val values = Seq.fill(20000)(math.exp(rnd.nextGaussian() * 2 + 5))
    val df = values.toDF("v").repartition(16)
    Seq(0.1, 0.5, 0.9, 0.99).foreach { q =>
      val est = df.agg(KllSketch.kllQuantile(col("v"), q)).head.getDouble(0)
      val err = rankError(values, est, q)
      assert(err <= 0.02, f"q=$q rank error $err%.4f > 2%%")
    }
  }

  test("exact below the compaction threshold (n < k), including tiny groups") {
    val values = Seq(5.0, 1.0, 9.0, 3.0, 7.0)
    val est = values.toDF("v").agg(KllSketch.kllQuantile(col("v"), 0.5))
      .head.getDouble(0)
    assert(est === 5.0, "median of 5 uncompacted values must be exact")
    val empty = spark.emptyDataset[Double].toDF("v")
      .agg(KllSketch.kllQuantile(col("v"), 0.5)).head
    assert(empty.isNullAt(0), "empty input must yield null")
  }

  test("merge: many small partitions stay within the same bound") {
    val rnd = new Random(7)
    val values = Seq.fill(10000)(rnd.nextDouble() * 1000)
    Seq(1, 64).foreach { parts =>
      val est = values.toDF("v").repartition(parts)
        .agg(KllSketch.kllQuantile(col("v"), 0.5)).head.getDouble(0)
      val err = rankError(values, est, 0.5)
      assert(err <= 0.02, f"parts=$parts rank error $err%.4f")
    }
  }

  test("SQL surface graft_kll(col, q[, k]) and the catalog query shape") {
    Seq.tabulate(1000)(i => i.toDouble).toDF("v").createOrReplaceTempView("kll_in")
    val est = spark.sql("SELECT graft_kll(v, 0.25, 64) FROM kll_in").head.getDouble(0)
    assert(math.abs(est - 250.0) <= 1000 * 0.05, s"p25 estimate $est")
    val rows = SparkEntry.queries("q_kll_quantiles")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // columns: source, n, bound_rank_ppm, p50_ok, p90_ok — the
      // derived rank-containment invariants the oracle also gates
      assert(r.getBoolean(3), s"${r.getString(0)} p50 outside rank bound")
      assert(r.getBoolean(4), s"${r.getString(0)} p90 outside rank bound")
    }
  }
}
