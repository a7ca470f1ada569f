package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{PartitionTransforms => PTx, SnapshotTable, ZoneMaps}

/** HIDDEN PARTITIONING (`#part=` spec): transform grammar, write
  * clustering, per-file manifest tuples, manifest-only scan pruning on
  * BASE-column predicates (both read halves), spec evolution, and the
  * ALTER interactions. File-count pinning uses the planning-time
  * selection hooks (ZoneMaps.lastBuilderSelection / the v1 index's
  * lastFilteredSelection) — exact, AQE-proof accounting. */
class PartitionSpecSpec extends SparkTestBase {

  private def freshTable(): (SnapshotTable, String) = {
    val dir = Files.createTempDirectory("graft_part").toString
    (SnapshotTable(dir), dir)
  }

  private def dayDf(day: String, ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"$day 0${i % 10}:00:00", s"s$i"))
      .toDF("id", "ts_s", "tag")
      .select(col("id"), to_timestamp(col("ts_s")).as("ts"), col("tag"))
  }

  test("transform grammar: parse, render, validate, refusals") {
    val ts = PTx.parse("days(ts),truncate(4,tag),identity(id)")
    assert(PTx.render(ts) === "days(ts),truncate(4,tag),identity(id)")
    assert(PTx.parse("") === Seq.empty)
    intercept[IllegalArgumentException] { PTx.parseOne("hours(ts)") }
    intercept[IllegalArgumentException] { PTx.parseOne("truncate(0,c)") }
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("tag", StringType), StructField("id", LongType)))
    PTx.validate(ts, schema)
    intercept[IllegalArgumentException] { // missing column
      PTx.validate(PTx.parse("days(nope)"), schema) }
    intercept[IllegalArgumentException] { // wrong domain
      PTx.validate(PTx.parse("days(tag)"), schema) }
    intercept[IllegalArgumentException] { // duplicate
      PTx.validate(PTx.parse("days(ts),days(ts)"), schema) }
  }

  test("spec'd commits record exact per-file day tuples in the manifest") {
    val (t, dir) = freshTable()
    t.commit(dayDf("2021-03-01", 0 until 0)) // schema-only v0
    t.setPartitionSpec("days(ts)")
    t.commit(dayDf("2021-03-01", 0 until 40))
    t.commit(dayDf("2021-03-02", 40 until 80))
    t.commit(dayDf("2021-03-03", 80 until 120))
    val v = t.currentVersion()
    val stats = t.fileStatsOf(v)
    assert(stats.nonEmpty)
    val tuples = stats.values.map(_.cols.get("__pt$days(ts)")).toSeq
    assert(tuples.forall(_.isDefined), "every file records its day tuple")
    // single-day commits → exact tuples (min == max), 3 distinct days
    assert(tuples.flatten.forall(s => s.min == s.max))
    assert(tuples.flatten.map(_.min).toSet ===
      Set("18687", "18688", "18689")) // 2021-03-01..03 as epoch days
    assert(t.partitionSpec() === "days(ts)")
  }

  test("manifest-only partition pruning: a day probe reads only that day's files") {
    val (t, _) = freshTable()
    t.commit(dayDf("2021-03-01", 0 until 0))
    t.setPartitionSpec("days(ts)")
    (1 to 5).foreach(d => t.commit(dayDf(s"2021-03-0$d", 0 until 30)))
    val total = t.fileCount(t.currentVersion())
    assert(total >= 5)
    ZoneMaps.lastBuilderSelection = (-1, -1)
    val day3 = t.read(spark)
      .filter(col("ts") >= lit("2021-03-03 00:00:00").cast("timestamp") &&
        col("ts") < lit("2021-03-04 00:00:00").cast("timestamp"))
    assert(day3.count() === 30)
    val (sel, tot) = ZoneMaps.lastBuilderSelection
    assert(tot === total)
    assert(sel < tot, s"pruning must drop files ($sel/$tot)")
    assert(day3.select(countDistinct(to_date(col("ts")))).head.getLong(0) === 1)
  }

  test("pruning survives on the v1 (DV'd) read half") {
    val (t, _) = freshTable()
    t.commit(dayDf("2021-03-01", 0 until 0))
    t.setPartitionSpec("days(ts)")
    (1 to 4).foreach(d => t.commit(dayDf(s"2021-03-0$d", 0 until 30)))
    // vector one row → reads route through ZoneMapFileIndex
    t.deleteWhere(spark, col("id") === 5 &&
      col("ts") >= lit("2021-03-02 00:00:00").cast("timestamp") &&
      col("ts") < lit("2021-03-03 00:00:00").cast("timestamp"),
      dvMaxRowsPerFile = 1000)
    // only the DV'd (day-02) file routes through the v1 index; a
    // day-04 probe proves it empty — the v1 half reads ZERO files
    graft.sources.ZoneMapFileIndex.lastFilteredSelection = (-1, -1)
    val day4 = t.read(spark)
      .filter(col("ts") >= lit("2021-03-04 00:00:00").cast("timestamp"))
    assert(day4.count() === 30)
    assert(graft.sources.ZoneMapFileIndex.lastFilteredSelection === ((0, 1)),
      "the v1 half must prune its (off-day) vectored file")
    // and a day-02 probe keeps it, minus the vectored row
    val day2 = t.read(spark)
      .filter(col("ts") >= lit("2021-03-02 00:00:00").cast("timestamp") &&
        col("ts") < lit("2021-03-03 00:00:00").cast("timestamp"))
    assert(day2.count() === 29)
    assert(graft.sources.ZoneMapFileIndex.lastFilteredSelection === ((1, 1)))
  }

  test("truncate(int) and truncate(string) tuples prune equality probes") {
    val (t, _) = freshTable()
    import spark.implicits._
    val mk = (lo: Int, hi: Int) => (lo until hi)
      .map(i => (i.toLong, f"k$i%04d")).toDF("id", "key")
    t.commit(mk(0, 0))
    t.setPartitionSpec("truncate(100,id),truncate(2,key)")
    t.commit(mk(0, 100).repartition(1))
    t.commit(mk(100, 200).repartition(1))
    t.commit(mk(200, 300).repartition(1))
    val stats = t.fileStatsOf(t.currentVersion())
    assert(stats.values.forall(_.cols.contains("__pt$truncate(100,id)")))
    assert(stats.values.forall(_.cols.contains("__pt$truncate(2,key)")))
    ZoneMaps.lastBuilderSelection = (-1, -1)
    assert(t.read(spark).filter(col("id") === 150L).count() === 1)
    val (sel, tot) = ZoneMaps.lastBuilderSelection
    assert(sel === 1 && tot === 3,
      s"truncate(100,id) tuple must pin the probe to one file ($sel/$tot)")
  }

  test("spec evolution is metadata-only; old files keep pruning under their own spec") {
    val (t, _) = freshTable()
    t.commit(dayDf("2021-03-01", 0 until 0))
    t.setPartitionSpec("days(ts)")
    t.commit(dayDf("2021-03-01", 0 until 30))
    t.commit(dayDf("2021-03-02", 30 until 60))
    val vOld = t.currentVersion()
    val filesBefore = t.fileCount(vOld)
    // evolve: cluster future writes by tag prefix instead
    val vSpec = t.setPartitionSpec("truncate(2,tag)")
    assert(t.fileCount(vSpec) === filesBefore, "spec change rewrites nothing")
    t.commit(dayDf("2021-03-03", 60 until 90))
    val stats = t.fileStatsOf(t.currentVersion())
    val oldKeys = stats.values.count(_.cols.contains("__pt$days(ts)"))
    val newKeys = stats.values.count(_.cols.contains("__pt$truncate(2,tag)"))
    assert(oldKeys >= 2 && newKeys >= 1,
      "old files keep old tuples, new files record the new spec's")
    // a day probe still prunes (old files' tuples + real ts stats)
    ZoneMaps.lastBuilderSelection = (-1, -1)
    assert(t.read(spark)
      .filter(col("ts") < lit("2021-03-02 00:00:00").cast("timestamp"))
      .count() === 30)
    val (sel, tot) = ZoneMaps.lastBuilderSelection
    assert(sel < tot)
    // time travel BEFORE the spec change sees the old spec
    assert(t.partitionSpecOf(vOld).map(_.repr) === Seq("days(ts)"))
    assert(t.partitionSpecOf(vSpec).map(_.repr) === Seq("truncate(2,tag)"))
  }

  test("ALTER follows the spec: rename rewrites the source, drop removes the transform") {
    val (t, _) = freshTable()
    t.commit(dayDf("2021-03-01", 0 until 20))
    t.setPartitionSpec("days(ts),truncate(2,tag)")
    t.renameColumn("ts", "event_ts")
    assert(t.partitionSpec() === "days(event_ts),truncate(2,tag)")
    // recorded tuples are keyed by the FROZEN physical name — still
    // consulted through the mapped read's physical-domain filters
    t.commit(dayDf("2021-03-02", 20 until 40)
      .withColumnRenamed("ts", "event_ts"))
    val stats = t.fileStatsOf(t.currentVersion())
    assert(stats.values.exists(_.cols.contains("__pt$days(ts)")),
      "physical tuple keys carry the frozen name")
    t.dropColumn("tag")
    assert(t.partitionSpec() === "days(event_ts)")
  }

  test("replace keeps the spec; a schema-breaking replace refuses") {
    val (t, _) = freshTable()
    t.commit(dayDf("2021-03-01", 0 until 20))
    t.setPartitionSpec("days(ts)")
    t.commit(dayDf("2021-03-02", 20 until 40), replace = true)
    assert(t.partitionSpec() === "days(ts)", "spec survives INSERT OVERWRITE")
    import spark.implicits._
    val bad = intercept[IllegalArgumentException] {
      t.commit(Seq((1L, "x")).toDF("id", "name"), replace = true)
    }
    assert(bad.getMessage.contains("partition spec"))
  }

  test("compact carries the spec and the rewritten files re-derive tuples") {
    val (t, _) = freshTable()
    t.commit(dayDf("2021-03-01", 0 until 0))
    t.setPartitionSpec("days(ts)")
    (1 to 3).foreach(d => t.commit(dayDf(s"2021-03-0$d", 0 until 20)))
    val v = t.compact(spark, files = 2)
    assert(t.partitionSpec() === "days(ts)", "spec survives compaction")
    val stats = t.fileStatsOf(v)
    assert(stats.nonEmpty &&
      stats.values.forall(_.cols.contains("__pt$days(ts)")),
      "compacted files record tuples (possibly spanning days)")
    assert(t.read(spark).count() === 60)
  }

  test("SQL: CREATE TABLE PARTITIONED BY (days(ts)) prunes through the catalog") {
    val wh = Files.createTempDirectory("graft_part_sql").toString
    spark.conf.set("spark.sql.catalog.ptcat",
      classOf[graft.sources.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.ptcat.warehouse", wh)
    try {
      spark.sql("CREATE TABLE ptcat.db.ev (id BIGINT, ts TIMESTAMP) " +
        "USING `graft-snapshot` PARTITIONED BY (days(ts))")
      val t = SnapshotTable(s"$wh/db/ev")
      assert(t.partitionSpec() === "days(ts)")
      (1 to 4).foreach { d =>
        spark.sql("INSERT INTO ptcat.db.ev SELECT id, " +
          s"timestamp'2021-03-0$d 06:30:00' + make_interval(0,0,0,0,0,0,id) " +
          "FROM range(50)")
      }
      val total = t.fileCount(t.currentVersion())
      ZoneMaps.lastBuilderSelection = (-1, -1)
      val n = spark.sql("SELECT count(*) FROM ptcat.db.ev " +
        "WHERE ts >= timestamp'2021-03-02 00:00:00' " +
        "AND ts < timestamp'2021-03-03 00:00:00'").head.getLong(0)
      assert(n === 50)
      val (sel, tot) = ZoneMaps.lastBuilderSelection
      assert(tot === total && sel < tot,
        s"SQL day probe must prune partitions ($sel/$tot)")
      // bucket(n, col) stays with the SPJ machinery — loud refusal
      val e = intercept[Exception] {
        spark.sql("CREATE TABLE ptcat.db.bk (id BIGINT) " +
          "USING `graft-snapshot` PARTITIONED BY (bucket(8, id))")
      }
      assert(e.getMessage.contains("commitBucketed"))
    } finally {
      spark.conf.unset("spark.sql.catalog.ptcat")
      spark.conf.unset("spark.sql.catalog.ptcat.warehouse")
    }
  }

  test("translation soundness spot checks: strict bounds weaken, Or needs both sides") {
    import org.apache.spark.sql.catalyst.expressions._
    val by = PTx.transformsInStats(Seq("__pt$days(ts)", "id", "__pt$truncate(4,tag)"))
    assert(by.keySet === Set("ts", "tag"))
    val ts = AttributeReference("ts", TimestampType)()
    val micros = 18688L * 86400000000L + 5L // mid-day 2021-03-02
    val gt = PTx.translate(Seq(GreaterThan(ts, Literal(micros, TimestampType))), by)
    assert(gt.size === 1)
    gt.head match {
      case GreaterThanOrEqual(a: AttributeReference, Literal(d, LongType)) =>
        assert(a.name === "__pt$days(ts)" && d === 18688L,
          "a > v must weaken to f(a) >= f(v), never f(a) > f(v)")
      case other => fail(s"unexpected translation $other")
    }
    // Or with an untranslatable branch must not translate at all
    val or = Or(GreaterThan(ts, Literal(micros, TimestampType)),
      EqualTo(AttributeReference("other", LongType)(), Literal(1L)))
    assert(PTx.translate(Seq(or), by).isEmpty)
    // negative timestamps floor correctly (pre-1970)
    val neg = PTx.translate(
      Seq(LessThan(ts, Literal(-1L, TimestampType))), by)
    neg.head match {
      case LessThanOrEqual(_, Literal(d, LongType)) => assert(d === -1L)
      case other => fail(s"unexpected $other")
    }
  }

  test("single hot partition value still fans out across tasks (spread key)") {
    val (t, _) = freshTable()
    t.commit(dayDf("2021-03-01", 0 until 0))
    t.setPartitionSpec("days(ts)")
    // one day, many rows: clustering must not funnel to one task/file
    val big = dayDf("2021-03-01", 0 until 20000)
      .repartition(8) // incoming parallelism
    t.commit(big)
    assert(t.read(spark).count() === 20000)
    val stats = t.fileStatsOf(t.currentVersion())
    // every file is exactly the one day — clustering keeps tuples exact
    assert(stats.values.flatMap(_.cols.get("__pt$days(ts)"))
      .forall(s => s.min == "18687" && s.max == "18687"))
  }
}
