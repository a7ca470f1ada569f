package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.{SnapshotTable, SnapshotVersionOffset}

/** STREAMING ADMISSION CONTROL: maxFilesPerTrigger / maxBytesPerTrigger
  * with (version, fileIdx) offsets, so a bulk-loaded version — or a
  * restart over a long backlog — splits across micro-batches instead
  * of arriving as one giant batch. Every batch is bounded by the cap,
  * the union equals the uncapped batch read, a checkpoint restart
  * mid-version never re-emits, and uncapped streams keep byte-identical
  * legacy offsets. */
class AdmissionControlSpec extends SparkTestBase {
  import spark.implicits._

  private def freshTable(): (SnapshotTable, String) = {
    val dir = Files.createTempDirectory("graft_adm").toString
    (SnapshotTable(dir), dir)
  }

  private def ids(v: Int): Seq[Long] =
    (v * 100 until v * 100 + 30).map(_.toLong)

  /** 3 versions × 3 files × 10 rows. */
  private def backlog(t: SnapshotTable): Unit =
    (0 until 3).foreach(v =>
      t.commit(ids(v).toDF("id").repartition(3)))

  test("offset grammar: legacy form round-trips, mid-version extends, frontier collapses") {
    assert(SnapshotVersionOffset.parse("7") === SnapshotVersionOffset(7L))
    assert(SnapshotVersionOffset.parse("7:2") === SnapshotVersionOffset(7L, 2L))
    assert(SnapshotVersionOffset(7L).json === "7")
    assert(SnapshotVersionOffset(7L, 2L).json === "7:2")
    assert(SnapshotVersionOffset(7L).canonical === ((8L, 0L)))
    assert(SnapshotVersionOffset(7L, 2L).canonical === ((7L, 2L)))
    // a full-version frontier serializes in the LEGACY bare form —
    // old checkpoints and uncapped streams stay byte-identical
    assert(SnapshotVersionOffset.at(7L, 3L, 3L).json === "7")
    assert(SnapshotVersionOffset.at(7L, 2L, 3L).json === "7:2")
  }

  test("plain stream under a 2-file cap: every batch bounded, union exact, ≥5 batches") {
    val (t, dir) = freshTable()
    backlog(t)
    val batches = scala.collection.concurrent.TrieMap.empty[Long, Seq[Long]]
    val q = spark.readStream.format("graft-snapshot")
      .option("maxFilesPerTrigger", "2").load(dir)
      .writeStream.outputMode("append")
      .trigger(Trigger.ProcessingTime("5 milliseconds"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.put(id, df.select("id").as[Long].collect().toSeq); ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_adm_ck").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val all = batches.values.flatten.toSeq
    assert(all.sorted === (0 until 3).flatMap(ids).sorted,
      "capped consumption must equal the uncapped content exactly once")
    assert(batches.size >= 5, s"9 files / cap 2 needs ≥5 batches, got ${batches.size}")
    assert(batches.values.forall(_.size <= 20),
      "no batch may exceed 2 files × 10 rows")
  }

  test("maxBytesPerTrigger splits the backlog too, one file minimum per trigger") {
    val (t, dir) = freshTable()
    backlog(t)
    val batches = scala.collection.concurrent.TrieMap.empty[Long, Long]
    val q = spark.readStream.format("graft-snapshot")
      .option("maxBytesPerTrigger", "1").load(dir) // below any file size
      .writeStream.outputMode("append")
      .trigger(Trigger.ProcessingTime("5 milliseconds"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.put(id, df.count()); ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_adm_ck").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(batches.values.sum === 90L)
    assert(batches.size === 9, "a 1-byte cap admits exactly one file per trigger")
    assert(batches.values.forall(_ === 10L))
  }

  test("checkpoint restart mid-version: nothing re-emits, nothing is lost") {
    val (t, dir) = freshTable()
    backlog(t)
    val ck = Files.createTempDirectory("graft_adm_restart").toString
    val firstRun = scala.collection.concurrent.TrieMap.empty[Long, Seq[Long]]
    val q1 = spark.readStream.format("graft-snapshot")
      .option("maxFilesPerTrigger", "2").load(dir)
      .writeStream.outputMode("append")
      .trigger(Trigger.ProcessingTime("5 milliseconds"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        firstRun.put(id, df.select("id").as[Long].collect().toSeq)
        // park after the FIRST batch commits: the checkpointed offset
        // is mid-version (2 of v0's 3 files)
        if (id == 0) throw new RuntimeException("stop-after-first-batch")
        ()
      }
      .option("checkpointLocation", ck).start()
    intercept[Exception] { q1.awaitTermination() }
    assert(firstRun.keySet === Set(0L))
    assert(firstRun(0L).size === 20, "first batch = 2 files of v0")
    val secondRun = scala.collection.concurrent.TrieMap.empty[Long, Seq[Long]]
    val q2 = spark.readStream.format("graft-snapshot")
      .option("maxFilesPerTrigger", "2").load(dir)
      .writeStream.outputMode("append")
      .trigger(Trigger.ProcessingTime("5 milliseconds"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        secondRun.put(id, df.select("id").as[Long].collect().toSeq); ()
      }
      .option("checkpointLocation", ck).start()
    try q2.processAllAvailable() finally q2.stop()
    // batch 0 replays into the restarted query ONLY if it never
    // committed; it did (the failure was after the sink ran, engine
    // commits after foreachBatch returns — it threw, so batch 0
    // re-runs). Exactly-once is by batchId idempotence: same id, same
    // rows.
    secondRun.get(0L).foreach(r => assert(r.sorted === firstRun(0L).sorted,
      "a replayed batchId must carry identical rows"))
    val union = (firstRun ++ secondRun).values.flatten.toSeq
    assert(union.sorted === (0 until 3).flatMap(ids).sorted,
      "restart from the mid-version offset loses nothing and " +
        "re-emits nothing beyond the uncommitted batch replay")
  }

  test("CDC stream under a cap equals batch readChangesCdc, batches bounded") {
    val (t, dir) = freshTable()
    backlog(t)
    // a MOR delete adds a delete-chunk version to the backlog
    t.deleteWhere(spark, col("id") % 10 === 3, dvMaxRowsPerFile = 1000)
    val head = t.currentVersion()
    // stream startingVersion=0 emits versions 0..head ⇒ the batch
    // equivalent is the EXCLUSIVE-from range (-1, head]
    val expected = t.readChangesCdc(spark, -1, head)
      .select(col("id"), col("_change_type"), col("_commit_version"))
      .as[(Long, String, Long)].collect().toSeq.sorted
    val batches = scala.collection.concurrent.TrieMap.empty[Long, Seq[(Long, String, Long)]]
    val q = spark.readStream.format("graft-snapshot")
      .option("readChangeFeed", "true")
      .option("startingVersion", "0")
      .option("maxFilesPerTrigger", "2").load(dir)
      .writeStream.outputMode("append")
      .trigger(Trigger.ProcessingTime("5 milliseconds"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.put(id, df.select(col("id"), col("_change_type"),
          col("_commit_version")).as[(Long, String, Long)].collect().toSeq)
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_adm_cdc").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(batches.values.flatten.toSeq.sorted === expected,
      "capped CDC stream ≡ batch readChangesCdc over the same range")
    assert(batches.size >= 5, s"the cap must split the backlog (got ${batches.size})")
  }

  test("uncapped streams keep legacy whole-version offsets on disk") {
    val (t, dir) = freshTable()
    backlog(t)
    val ck = Files.createTempDirectory("graft_adm_legacy")
    val q = spark.readStream.format("graft-snapshot").load(dir)
      .writeStream.outputMode("append")
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .option("checkpointLocation", ck.toString).start()
    try q.processAllAvailable() finally q.stop()
    val offsets = ck.resolve("offsets")
    val latest = Files.list(offsets).iterator().asScala
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toInt)
    // the offset itself is the LAST line of the engine's offset file
    // (earlier lines are version + metadata JSON)
    val off = new String(Files.readAllBytes(latest), "UTF-8")
      .split('\n').last.trim
    assert(off.forall(_.isDigit),
      s"uncapped offsets must stay in the bare legacy form, got: $off")
  }

  private implicit class IterAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      override def hasNext: Boolean = it.hasNext
      override def next(): A = it.next()
    }
  }
}
