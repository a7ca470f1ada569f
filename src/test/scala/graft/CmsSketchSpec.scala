package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.functions.CmsSketch

/** CmsSketch: partition/order independence (counters are plain sums),
  * mass conservation, the no-undercount estimate bound, and the SQL
  * registration. The full cross-engine check is q_cms_freq's DuckDB
  * oracle; these pin the aggregate machinery itself. */
class CmsSketchSpec extends SparkTestBase {
  import spark.implicits._

  private def mirrorBucket(d: Int, v: String): Int = {
    val dg = MessageDigest.getInstance("MD5").digest(s"$d|$v".getBytes("UTF-8"))
    val h = ((dg(0) & 0xffL) << 24) | ((dg(1) & 0xffL) << 16) |
      ((dg(2) & 0xffL) << 8) | (dg(3) & 0xffL)
    (h % 256).toInt
  }

  private val words =
    Seq.tabulate(500)(i => s"w${i % 37}").toDF("w")

  test("counters are partition-independent and conserve total mass") {
    val one = words.coalesce(1).agg(CmsSketch.cms(col("w")))
      .head.getSeq[Long](0)
    val many = words.repartition(13).agg(CmsSketch.cms(col("w")))
      .head.getSeq[Long](0)
    assert(one === many, "merge must equal single-partition update")
    assert(one.length === 4 * 256)
    // every input increments exactly one counter per depth row
    (0 until 4).foreach { d =>
      assert(one.slice(d * 256, (d + 1) * 256).sum === 500L, s"depth $d mass")
    }
  }

  test("point estimates never undercount and are exact absent collisions") {
    val sk = words.agg(CmsSketch.cms(col("w"))).head.getSeq[Long](0)
    val truth = words.groupBy("w").count().as[(String, Long)].collect().toMap
    truth.foreach { case (w, n) =>
      val est = (0 until 4).map(d => sk(d * 256 + mirrorBucket(d, w))).min
      assert(est >= n, s"undercount for $w")
    }
    // 37 values into 256 buckets: at least one depth row should be
    // collision-free for most values — estimates exact for some token
    assert(truth.exists { case (w, n) =>
      (0 until 4).map(d => sk(d * 256 + mirrorBucket(d, w))).min == n
    })
  }

  test("null inputs are skipped; SQL surface graft_cms(col, d, w) works") {
    Seq(Some("a"), None, Some("b"), Some("a")).toDF("w")
      .createOrReplaceTempView("cms_in")
    val sk = spark.sql("SELECT graft_cms(w, 2, 64) AS s FROM cms_in")
      .head.getSeq[Long](0)
    assert(sk.length === 2 * 64)
    assert(sk.slice(0, 64).sum === 3L, "null must not be counted")
  }
}
