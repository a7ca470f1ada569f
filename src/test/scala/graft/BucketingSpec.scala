package graft

import org.apache.spark.sql.functions._
import graft.sources.{Bucketing, Tables}

class BucketingSpec extends SparkTestBase {

  test("join of two tables bucketed on the key plans with zero shuffle exchanges") {
    val sf = "/root/testdata/sf0.001"
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bkt")
    Bucketing.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice"),
      "graft_bkt.orders_b", "o_orderkey")
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "graft_bkt.lineitem_b", "o_orderkey")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val joined = Bucketing.cogroupJoin(spark, "graft_bkt.orders_b",
        "graft_bkt.lineitem_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      // co-located buckets: the join needs NO shuffle on either side
      assert(!plan.contains("Exchange"), plan.take(1500))
      // and the result is correct
      val expected = Tables.lineitem(spark, sf).count()
      assert(joined.count() === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("range-sorted layout: per-file key ranges are disjoint, content roundtrips") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_range").toFile.getAbsolutePath
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    Bucketing.writeRangeSorted(orders, dir, "o_orderdate", files = 4)
    // every parquet file covers a disjoint (min, max) range of the sort
    // key — the property parquet footer stats need for file skipping
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    assert(files.size >= 2, s"expected multiple range files, got ${files.size}")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("o_orderdate"), max("o_orderdate")).collect()(0)
      (r.get(0).toString, r.get(1).toString)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"file ranges overlap: $hi > $lo2")
      case _ =>
    }
    // nothing lost or duplicated by the layout
    assert(spark.read.parquet(dir).count() === orders.count())
  }

  test("zorderKey interleaves bits exactly; z-ordered files are compact 2-D rectangles") {
    import spark.implicits._
    // bit-exactness against a plain-Scala Morton reference
    def mortonRef(a: Long, b: Long): Long = {
      var z = 0L
      (0 until 16).foreach { i =>
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val probe = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (256L, 255L))
    val got = probe.toDF("a", "b")
      .withColumn("z", Bucketing.zorderKey(col("a"), col("b")))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z === mortonRef(a, b), s"($a,$b)") }

    // layout: each z-sorted file covers a bounded rectangle of the
    // (cell_x, cell_y) grid — the property 2-D min/max pruning needs
    val dir = java.nio.file.Files.createTempDirectory("graft_z").toFile.getAbsolutePath
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("cell_x", pmod(col("o_custkey"), lit(65536L)))
      .withColumn("cell_y",
        datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date")).cast("long"))
    Bucketing.writeZOrdered(orders, dir, col("cell_x"), col("cell_y"), files = 4)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    assert(files.size >= 2)
    val gridLo = orders.agg(min("cell_x"), max("cell_x"), min("cell_y"), max("cell_y"))
      .collect()(0)
    val (gxSpan, gySpan) =
      (gridLo.getLong(1) - gridLo.getLong(0), gridLo.getLong(3) - gridLo.getLong(2))
    val rects = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("cell_x"), max("cell_x"), min("cell_y"), max("cell_y")).collect()(0)
      (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
    }
    // every file's rectangle must be a strict sub-span of the grid in
    // at least one dimension (a random or single-column sort leaves
    // some file spanning the full range of both)
    rects.foreach { case (xs, ys) =>
      assert(xs < gxSpan || ys < gySpan,
        s"file spans the whole grid ($xs × $ys of $gxSpan × $gySpan)")
    }
    assert(spark.read.parquet(dir).count() === orders.count())
  }

  test("clustered layouts genuinely SKIP data: scan metrics drop under range predicates") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // rows the parquet scan EMITS = rows in row groups that survived
    // footer min/max pruning (record-level filtering is off by
    // default, so surviving groups surface whole) — the direct
    // measure of "were files/row-groups actually skipped"
    def scanned(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      df.collect()
      val scan = df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }.head
      (scan.metrics("numOutputRows").value, scan.metrics("numFiles").value)
    }
    val base = java.nio.file.Files.createTempDirectory("graft_prune").toString
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .withColumn("cell_x", pmod(col("o_custkey"), lit(64L)))
      .withColumn("cell_y", pmod(col("o_orderkey"), lit(64L)))
    val total = orders.count()

    // UNCLUSTERED control: hash-shuffled, every file spans the key range
    orders.repartition(8).write.parquet(s"$base/shuffled")
    // 1-D range-sorted and 2-D z-ordered layouts of the SAME rows
    Bucketing.writeRangeSorted(orders, s"$base/ranged", "o_orderkey", files = 8)
    Bucketing.writeZOrdered(orders, s"$base/zorder",
      col("cell_x"), col("cell_y"), files = 8)

    // 1-D: a bottom-eighth key-range probe
    val cut = orders.agg(max("o_orderkey")).collect()(0).getLong(0) / 8
    val pred1 = col("o_orderkey") <= cut
    val (rowsShuf, filesShuf) = scanned(spark.read.parquet(s"$base/shuffled").filter(pred1))
    val (rowsRange, filesRange) = scanned(spark.read.parquet(s"$base/ranged").filter(pred1))
    assert(filesShuf === filesRange,
      "both layouts list the same files — the reduction must come from stats skipping")
    assert(rowsShuf > total / 2,
      s"control must scan most rows, got $rowsShuf of $total")
    assert(rowsRange * 4 <= rowsShuf,
      s"range-sorted layout must skip ≥4× vs shuffled: $rowsRange vs $rowsShuf")

    // 2-D: a 16×16 corner rectangle of the 64×64 grid
    val pred2 = col("cell_x") < 16 && col("cell_y") < 16
    val (rectShuf, _) = scanned(spark.read.parquet(s"$base/shuffled").filter(pred2))
    val (rectZ, _) = scanned(spark.read.parquet(s"$base/zorder").filter(pred2))
    assert(rectShuf > total / 2,
      s"control must scan most rows for the rectangle, got $rectShuf of $total")
    assert(rectZ * 2 <= rectShuf,
      s"z-ordered layout must skip ≥2× on a 2-D rectangle: $rectZ vs $rectShuf")

    // 3-D: an 8×8×8 corner box of a 32×32×32 grid — the zorder3Key
    // layout must prune on the CONJUNCTION of all three predicates
    // (each file is a compact Morton box, so off-corner octants fail
    // at least one column's min/max and never surface)
    val o3 = orders
      .withColumn("cx", pmod(col("o_custkey"), lit(32L)))
      .withColumn("cy", pmod(col("o_orderkey"), lit(32L)))
      .withColumn("cz", pmod(expr("cast(o_totalprice * 100 as bigint) div 10000"), lit(32L)))
    o3.repartition(8).write.parquet(s"$base/shuffled3")
    Bucketing.writeZOrdered3(o3, s"$base/zorder3",
      col("cx"), col("cy"), col("cz"), files = 8)
    val pred3 = col("cx") < 8 && col("cy") < 8 && col("cz") < 8
    val (boxShuf, _) = scanned(spark.read.parquet(s"$base/shuffled3").filter(pred3))
    val (boxZ, _) = scanned(spark.read.parquet(s"$base/zorder3").filter(pred3))
    assert(boxShuf > total / 2,
      s"control must scan most rows for the 3-D box, got $boxShuf of $total")
    assert(boxZ * 2 <= boxShuf,
      s"3-D z-ordered layout must skip ≥2× on a corner box: $boxZ vs $boxShuf")
  }

  test("hilbert key: bijective on the grid, consecutive positions are adjacent cells") {
    import spark.implicits._
    // full 16x16 grid at bits=4
    val grid = spark.range(256)
      .select((col("id") % 16).as("x"), expr("id div 16").as("y"))
    val keyed = Bucketing.withHilbertKey(grid, col("x"), col("y"), "h", bits = 4)
      .select("h", "x", "y").as[(Long, Long, Long)].collect().sortBy(_._1)
    // bijection: every position 0..255 hit exactly once
    assert(keyed.map(_._1).toSeq === (0L until 256L))
    // THE Hilbert property: consecutive curve positions are
    // edge-adjacent grid cells (manhattan distance exactly 1)...
    keyed.sliding(2).foreach { case Array((_, x1, y1), (_, x2, y2)) =>
      assert((x2 - x1).abs + (y2 - y1).abs === 1L)
    }
    // ...which Morton order does NOT have (its curve jumps at
    // power-of-two boundaries) — the reason Hilbert ranges make
    // tighter pruning rectangles
    val morton = grid
      .select(Bucketing.zorderKey(col("x"), col("y")).as("z"), col("x"), col("y"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val mortonJumps = morton.sliding(2).count {
      case Array((_, x1, y1), (_, x2, y2)) => (x2 - x1).abs + (y2 - y1).abs > 1
    }
    assert(mortonJumps > 0)
  }

  test("hilbert-ordered files cover compact sub-spans of the grid") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hilb").toString
    val orders = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"),
        pmod(col("o_custkey"), lit(256L)).as("cell_x"),
        pmod(col("o_orderkey"), lit(256L)).as("cell_y"))
    Bucketing.writeHilbertOrdered(orders, dir, col("cell_x"), col("cell_y"),
      files = 8, bits = 8)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    assert(files.size >= 2)
    val rects = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("cell_x"), max("cell_x"), min("cell_y"), max("cell_y")).collect()(0)
      (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
    }
    // every file must be a strict sub-span of the 0..255 grid in at
    // least one dimension (the same bar the z-order layout clears)
    rects.foreach { case (xs, ys) =>
      assert(xs < 255 || ys < 255, s"file spans the whole grid ($xs x $ys)")
    }
    assert(spark.read.parquet(dir).count() === orders.count())
  }
}
