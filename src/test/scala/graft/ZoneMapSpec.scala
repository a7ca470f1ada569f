package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, FileScan}
import org.apache.spark.sql.functions._
import graft.sources.{SnapshotTable, ZoneMaps}

/** Manifest zone maps: per-file min/max recorded at commit, file-level
  * skipping before the parquet scan plans. The tests assert three
  * things no result-hash can: (1) files are actually DROPPED from the
  * planned scan, (2) pruning never changes results (randomized), and
  * (3) stats ride append commits without footer re-reads. */
class ZoneMapSpec extends SparkTestBase {
  import spark.implicits._

  /** All DSv2 scans in an executed plan, descending through AQE query
    * stages (stage wrappers are leaves to `collect`). */
  private def batchScans(p: SparkPlan): Seq[BatchScanExec] =
    p.collect {
      case b: BatchScanExec => Seq(b)
      case q: QueryStageExec => batchScans(q.plan)
      case a: AdaptiveSparkPlanExec => batchScans(a.executedPlan)
    }.flatten

  /** Number of files the planned DSv2 scan will read. */
  private def plannedFiles(df: DataFrame): Int = {
    df.collect() // finalize AQE
    val scans = batchScans(df.queryExecution.executedPlan).map(_.scan)
    assert(scans.nonEmpty, s"no BatchScan in:\n${df.queryExecution.executedPlan}")
    scans.map {
      case f: FileScan => f.fileIndex.inputFiles.length
      case z: ZoneMaps.ZoneMapScan => z.plannedFileCount
    }.sum
  }

  private def freshTable(): (SnapshotTable, Long) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_zm").toString
    val t = SnapshotTable(dir)
    // 8 files, each covering a tight contiguous k-range (clustered
    // write — the layout zone maps exist to exploit)
    val df = spark.range(0, 8000)
      .select(col("id").as("k"), (col("id") % 97).as("m"),
        concat(lit("u"), format_string("%05d", col("id"))).as("s"))
      .repartitionByRange(8, col("k"))
    val v = t.commit(df)
    (t, v)
  }

  test("selective range predicate reads a fraction of the files; results unchanged") {
    val (t, _) = freshTable()
    val all = plannedFiles(t.read(spark))
    assert(all === 8)
    val q = t.read(spark).filter(col("k") >= 2000 && col("k") < 3000)
    assert(plannedFiles(q) <= 2, "a 1/8th range must prune to ~1 file")
    assert(q.count() === 1000)
    // equality point lookup: one file
    val point = t.read(spark).filter(col("k") === 4242L)
    assert(plannedFiles(point) === 1)
    assert(point.select("s").as[String].collect() === Array("u04242"))
  }

  test("string min/max prune bytewise; IN-lists prune; unknown predicates keep files") {
    val (t, _) = freshTable()
    val sPrune = t.read(spark).filter(col("s") < "u00500")
    assert(plannedFiles(sPrune) === 1)
    assert(sPrune.count() === 500)
    val inPrune = t.read(spark).filter(col("k").isin(100L, 200L, 7900L))
    assert(plannedFiles(inPrune) === 2)
    assert(inPrune.count() === 3)
    // m spans the full domain in every file: no pruning possible, and
    // a non-translatable predicate must not drop anything either
    assert(plannedFiles(t.read(spark).filter(col("m") === 5)) === 8)
    assert(plannedFiles(t.read(spark).filter(
      col("k").cast("string").contains("42"))) === 8)
  }

  test("randomized soundness: pruned scan ≡ unpruned scan under arbitrary conjunctions") {
    val (t, _) = freshTable()
    // expectations evaluated driver-side on the collected rows — the
    // oracle must not itself go through the code under test
    val full = t.read(spark).select("k", "m", "s").as[(Long, Long, String)]
      .collect().toSet
    val rnd = new scala.util.Random(20260813L)
    (1 to 25).foreach { _ =>
      val lo = rnd.nextInt(9000) - 500
      val hi = lo + rnd.nextInt(3000)
      val (pred, oracle) = rnd.nextInt(4) match {
        case 0 => (col("k") >= lo && col("k") < hi,
          (r: (Long, Long, String)) => r._1 >= lo && r._1 < hi)
        case 1 => (col("k") === lo || col("k") > hi,
          (r: (Long, Long, String)) => r._1 == lo || r._1 > hi)
        case 2 => (col("s") >= f"u$lo%05d" && col("s") < f"u$hi%05d",
          (r: (Long, Long, String)) =>
            r._3 >= f"u$lo%05d" && r._3 < f"u$hi%05d")
        case _ => (col("k").between(lo, hi) && col("m") < 50,
          (r: (Long, Long, String)) => r._1 >= lo && r._1 <= hi && r._2 < 50)
      }
      val pruned = t.read(spark).filter(pred)
        .select("k", "m", "s").as[(Long, Long, String)].collect().toSet
      assert(pruned === full.filter(oracle), s"pruning changed results for $pred")
    }
  }

  test("append carries prior stats forward; CDC delta reads prune on the added files") {
    val (t, v1) = freshTable()
    val v2 = t.commit(spark.range(8000, 12000)
      .select(col("id").as("k"), (col("id") % 97).as("m"),
        concat(lit("u"), format_string("%05d", col("id"))).as("s"))
      .repartitionByRange(4, col("k")))
    // every file of both commits carries stats in the head manifest
    val zm = {
      val m = classOf[SnapshotTable].getDeclaredMethod("zoneMapsOf", classOf[Long])
      m.setAccessible(true)
      m.invoke(t, java.lang.Long.valueOf(v2))
        .asInstanceOf[Map[String, Map[String, ZoneMaps.ColStat]]]
    }
    assert(zm.size === 12)
    assert(zm.values.forall(_.keySet === Set("k", "m", "s")))
    // full-history read prunes across commit boundaries
    assert(plannedFiles(t.read(spark).filter(col("k") >= 9000 && col("k") < 10000)) <= 2)
    // the CDC path prunes within the added-file set (range-partitioner
    // boundaries are sample-estimated, so the 1000-row slice may
    // straddle one boundary — but never reach all 4 delta files)
    val delta = t.readChanges(spark, v1, v2).filter(col("k") < 9000)
    assert(plannedFiles(delta) <= 2)
    assert(delta.count() === 1000)
  }

  test("clustered compaction tightens zone maps: scattered layout prunes nothing, compacted prunes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zmc").toString
    val t = SnapshotTable(dir)
    // hash-scattered write: every file spans ~the full k domain, so
    // zone maps exist but cannot exclude anything — stats are only as
    // good as the LAYOUT, which is why compact() takes a sortKey
    t.commit(spark.range(0, 8000)
      .select(col("id").as("k"),
        concat(lit("u"), format_string("%05d", col("id"))).as("s"))
      .repartition(8, col("s")))
    def q = t.read(spark).filter(col("k") >= 1000 && col("k") < 2000)
    assert(plannedFiles(q) === 8, "scattered layout: nothing prunable")
    t.compact(spark, files = 8, sortKey = Some(col("k")))
    // range-partitioner boundaries are SAMPLE-estimated (seeded by RDD
    // id, which shifts with suite ordering), so the 1000-row probe span
    // can straddle two boundaries and touch a third file — the
    // invariant is "clustering makes the range prunable", not a
    // particular boundary draw (the CDC case above documents the same
    // margin)
    assert(plannedFiles(q) <= 3, "clustered rewrite must make the range prunable")
    assert(q.count() === 1000)
  }

  test("runtime file skipping: a selective dim join prunes fact files at run time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zmr").toString
    val t = SnapshotTable(dir)
    // 16-file clustered fact; the dim's surviving keys all land in one
    // narrow k-range, but that is only knowable AT RUN TIME (the values
    // come through a join, not a static predicate on the fact)
    t.commit(spark.range(0, 64000)
      .select(col("id").as("k"), (col("id") * 7).as("x"))
      .repartitionByRange(16, col("k")))
    val dim = spark.range(0, 40)
      .select((col("id") * 100 + 8000).as("dk"), (col("id") % 3).as("cat"))
    val j = t.read(spark).join(dim.filter(col("cat") === 1), col("k") === col("dk"))
    assert(j.collect().length === 13) // executes THIS plan: runtime filters fire
    val plan = j.queryExecution.executedPlan
    val fact = batchScans(plan).filter(_.scan.isInstanceOf[ZoneMaps.ZoneMapScan])
    assert(fact.nonEmpty, s"fact side must plan the zone-map scan:\n$plan")
    assert(fact.head.runtimeFilters.nonEmpty,
      s"dynamic pruning must inject a runtime filter:\n$plan")
    val planned = fact.head.scan.asInstanceOf[ZoneMaps.ZoneMapScan].plannedFileCount
    assert(planned <= 2,
      s"runtime IN-set spans [8000, 12000) → at most 2 of 16 files, planned $planned")
  }

  test("scan reports EXACT numRows from manifest row counts; pruning shrinks the estimate") {
    val (t, _) = freshTable()
    def reported(df: DataFrame): java.util.OptionalLong = {
      df.collect()
      val stats = batchScans(df.queryExecution.executedPlan).map(_.scan).collect {
        case z: ZoneMaps.ZoneMapScan => z.estimateStatistics()
      }
      assert(stats.size === 1, "expected exactly one zone-map scan")
      stats.head.numRows()
    }
    // full read: the manifest knows the exact table cardinality
    assert(reported(t.read(spark)).getAsLong === 8000L)
    // pruned read: numRows is the sum over SURVIVING files only —
    // the planner sees ~1/8th of the table, not a bytes/row guess
    val pruned = reported(t.read(spark).filter(col("k") >= 2000 && col("k") < 3000))
    assert(pruned.isPresent && pruned.getAsLong < 8000L &&
      pruned.getAsLong >= 1000L)
  }

  test("scan reports per-COLUMN stats (min/max/nullCount) from the manifest; pruning tightens them") {
    val (t, _) = freshTable() // k in [0, 8000), 8 files clustered on k
    def colStats(df: DataFrame) = {
      df.collect()
      val stats = batchScans(df.queryExecution.executedPlan).map(_.scan).collect {
        case z: ZoneMaps.ZoneMapScan => z.estimateStatistics()
      }
      assert(stats.size === 1)
      import scala.jdk.CollectionConverters._
      stats.head.columnStats().asScala.map { case (ref, cs) => ref.describe() -> cs }.toMap
    }
    val full = colStats(t.read(spark))
    assert(full.contains("k"), s"k must report column stats, got ${full.keySet}")
    assert(full("k").min().get() === Long.box(0L))
    assert(full("k").max().get() === Long.box(7999L))
    assert(full("k").nullCount().getAsLong === 0L)
    // pruned read: the folded range covers only SURVIVING files
    val pruned = colStats(t.read(spark).filter(col("k") >= 2000 && col("k") < 3000))
    assert(pruned("k").min().get().asInstanceOf[Long] >= 1000L &&
      pruned("k").max().get().asInstanceOf[Long] < 4000L,
      s"pruned k-range must tighten: ${pruned("k").min()}..${pruned("k").max()}")
    // CBO consumes them: with plan stats enabled the optimized plan
    // carries attribute-level stats straight from the connector
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.planStats.enabled", "true")
    try {
      val attr = t.read(spark).queryExecution.optimizedPlan.stats.attributeStats
      val kStat = attr.find(_._1.name == "k").map(_._2)
      assert(kStat.exists(s => s.min.contains(0L) && s.max.contains(7999L)),
        s"CBO must see the connector column stats, got $attr")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.planStats.enabled", "false")
    }
  }

  test("zone-map line codec round-trips delimiter-hostile values; malformed lines drop") {
    val stats = Map(
      "we|ird=col" -> ZoneMaps.ColStat('s', "a|b:c", "z=%7C"),
      "k" -> ZoneMaps.ColStat('l', "-42", "99"))
    val line = ZoneMaps.encodeLine("data/b1/part 0|x.parquet", stats)
    assert(ZoneMaps.decodeLine(line) === Some(("data/b1/part 0|x.parquet", stats)))
    assert(ZoneMaps.decodeLine("#zm=garbage|no-eq-here") === None)
    assert(ZoneMaps.decodeLine("#schema=whatever") === None)
    // legacy 3-field lines (pre-null-count) decode with nulls unknown
    assert(ZoneMaps.decodeLine("#zm=data%2Fb1%2Ff.parquet|k=l:1:9") ===
      Some(("data/b1/f.parquet", Map("k" -> ZoneMaps.ColStat('l', "1", "9", -1L)))))
    // null counts survive the round trip (metadata-only deletes need them)
    val withNulls = Map("k" -> ZoneMaps.ColStat('l', "1", "9", 0L))
    assert(ZoneMaps.decodeLine(ZoneMaps.encodeLine("data/b/f.parquet", withNulls)) ===
      Some(("data/b/f.parquet", withNulls)))
  }

  test("tagged (streaming-sink) commits collect zone maps; replayed tags add none") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zms").toString
    val t = SnapshotTable(dir)
    def batch(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(col("id").as("k"), (col("id") * 2).as("x"))
      .repartitionByRange(2, col("k"))
    assert(t.commitOnce("b0", batch(0, 1000)).isDefined)
    assert(t.commitOnce("b0", batch(0, 1000)).isEmpty) // replay skipped
    assert(t.commitOnce("b1", batch(1000, 2000)).isDefined)
    val zm = {
      val m = classOf[SnapshotTable].getDeclaredMethod("zoneMapsOf", classOf[Long])
      m.setAccessible(true)
      m.invoke(t, java.lang.Long.valueOf(t.currentVersion()))
        .asInstanceOf[Map[String, Map[String, ZoneMaps.ColStat]]]
    }
    assert(zm.size === 4, "2 files per committed micro-batch, none from the replay")
    // a point probe into the second batch reads one of the four files
    val q = t.read(spark).filter(col("k") === 1500L)
    assert(plannedFiles(q) === 1)
    assert(q.count() === 1)
  }

  test("all-null and nullable columns never prune wrongly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zmn").toString
    val t = SnapshotTable(dir)
    t.commit(Seq[(java.lang.Long, String)]((1L, null), (2L, "b"), (null, "c"))
      .toDF("k", "s").repartition(1))
    // nulls are outside min/max, but comparison predicates are never
    // null-satisfied, so [2,2]-style pruning on the non-null range is
    // sound; IsNull must not be treated as prunable at all
    assert(t.read(spark).filter(col("s").isNull).count() === 1)
    assert(t.read(spark).filter(col("k").isNull).count() === 1)
    assert(t.read(spark).filter(col("k") === 2L).count() === 1)
    assert(t.read(spark).filter(col("k") === 99L).count() === 0)
  }

  test("bloom skipping: point probes on hash-scattered keys skip files ranges cannot") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bf").toString
    val t = SnapshotTable(dir)
    // keys SCATTERED across files (hash repartition): every file's
    // [min, max] spans nearly the whole domain, so zone maps prune
    // NOTHING on equality — the blind spot blooms exist for
    val df = spark.range(0, 8000)
      .select(col("id").as("k"), concat(lit("u"), col("id")).as("s"))
      .repartition(8, col("k"))
    t.commitWithBlooms(df, Seq("k", "s"), expectedItemsPerFile = 2000)
    assert(plannedFiles(t.read(spark)) === 8)
    // a long point probe: the value lives in one file; blooms prove
    // absence for (nearly) all others — allow a false positive or two
    val p1 = t.read(spark).filter(col("k") === 4242L)
    assert(plannedFiles(p1) <= 3,
      "bloom must skip files a range check cannot (all ranges overlap)")
    assert(p1.count() === 1)
    // string key probes skip through their own bloom
    val p2 = t.read(spark).filter(col("s") === "u123")
    assert(plannedFiles(p2) <= 3)
    assert(p2.count() === 1)
    // an ABSENT value prunes everything (no false negatives = proof
    // of absence; fp chance per file is ~1%)
    assert(plannedFiles(t.read(spark).filter(col("k") === 999999L)) <= 1)
    assert(t.read(spark).filter(col("k") === 999999L).count() === 0)
    // IN-lists prune only when every member misses
    assert(t.read(spark).filter(col("k").isin(4242L, 999999L)).count() === 1)
    // appends carry prior blooms; the new unbloomed file is never skipped
    t.commit(spark.range(90000, 90100)
      .select(col("id").as("k"), concat(lit("u"), col("id")).as("s")))
    val mixed = t.read(spark).filter(col("k") === 4242L)
    assert(plannedFiles(mixed) <= 4, "old files keep their blooms after an append")
    assert(mixed.count() === 1)
    assert(t.read(spark).filter(col("k") === 90042L).count() === 1,
      "rows in the bloom-less appended file must stay visible")
    // soundness sweep: every present key answers 1 through the pruned scan
    val sample = Seq(0L, 7L, 1234L, 4999L, 7999L, 90000L)
    sample.foreach { k =>
      assert(t.read(spark).filter(col("k") === k).count() === 1, s"k=$k")
    }
  }
}
