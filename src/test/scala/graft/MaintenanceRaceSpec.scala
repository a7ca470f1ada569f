package graft

import java.nio.file.{Files, Path}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.apache.spark.sql.functions._
import graft.sources.{LogStore, PosixLogStore, SnapshotTable}

/** A commit-plane store that PARKS the first manifest publish until the
  * test releases it — the deterministic-interleaving primitive the
  * LogStore seam makes possible: the racing operation runs its entire
  * read/classify/write phase, then blocks exactly at its atomic
  * publish while the test commits something else underneath.
  * Latches are transient (never needed off-driver; manifests publish
  * on the driver only). */
final class GatedStore(@transient arrived: CountDownLatch,
                       @transient go: CountDownLatch) extends LogStore {
  @volatile private var armed = true
  private def gate(path: Path): Unit =
    if (armed && path.getFileName.toString.matches("v\\d+\\.json")) {
      armed = false
      arrived.countDown()
      assert(go.await(30, TimeUnit.SECONDS), "gate release timed out")
    }
  override def putIfAbsent(path: Path, bytes: Array[Byte]): Boolean = {
    gate(path); PosixLogStore.putIfAbsent(path, bytes)
  }
  override def putFileIfAbsent(path: Path, stage: Path => Unit): Boolean =
    PosixLogStore.putFileIfAbsent(path, stage)
  override def exists(path: Path): Boolean = PosixLogStore.exists(path)
  override def open(path: Path): java.io.InputStream = PosixLogStore.open(path)
  override def list(dir: Path): Seq[String] = PosixLogStore.list(dir)
  override def listDirs(dir: Path): Seq[String] = PosixLogStore.listDirs(dir)
  override def delete(path: Path): Boolean = PosixLogStore.delete(path)
  override def mkdirs(dir: Path): Unit = PosixLogStore.mkdirs(dir)
  override def size(path: Path): Long = PosixLogStore.size(path)
  override def name: String = "gated-posix"
}

/** CONCURRENT-MAINTENANCE RACE MATRIX (round 15): deterministic
  * latch-ordered races between selective OPTIMIZEs and between
  * constraint changes and OPTIMIZE — disjoint compactions BOTH land
  * via the compaction rebase, overlap and validated-against-nothing
  * interleavings refuse loudly. */
class MaintenanceRaceSpec extends SparkTestBase {
  import spark.implicits._

  /** `n` small files (30 rows each) with known content. */
  private def smallFiles(t: SnapshotTable, n: Int = 3): Seq[String] = {
    (0 until n).foreach(i =>
      t.commit((i * 100 until i * 100 + 30).map(_.toLong).toDF("id")
        .repartition(1)))
    t.listingOf(t.currentVersion())
  }

  private val pool = Executors.newCachedThreadPool()

  private def raceOptimize(dir: String, arrived: CountDownLatch,
      go: CountDownLatch, scopeRels: Set[String])
      : java.util.concurrent.Future[Either[Throwable, SnapshotTable.OptimizeResult]] =
    pool.submit(new java.util.concurrent.Callable[Either[Throwable, SnapshotTable.OptimizeResult]] {
      override def call() = {
        val gated = new SnapshotTable(dir, new GatedStore(arrived, go))
        try Right(gated.optimize(spark, smallFileBytes = Long.MaxValue,
          scope = scopeRels.contains))
        catch { case e: Throwable => Left(e) }
      }
    })

  test("optimize vs optimize, DISJOINT selections: both land via the compaction rebase") {
    val dir = Files.createTempDirectory("graft_race_dj").toString
    val t = SnapshotTable(dir)
    val rels = smallFiles(t, n = 4)
    val (arrived, go) = (new CountDownLatch(1), new CountDownLatch(1))
    // racer A: scoped to {f0, f1}, parks at its publish
    val a = raceOptimize(dir, arrived, go, Set(rels(0), rels(1)))
    assert(arrived.await(30, TimeUnit.SECONDS))
    // B: scoped to {f2, f3} — nothing shared — lands first
    val rb = t.optimize(spark, smallFileBytes = Long.MaxValue,
      scope = Set(rels(2), rels(3)).contains)
    assert(rb.filesRewritten === 2)
    go.countDown()
    val ra = a.get(60, TimeUnit.SECONDS) match {
      case Right(r) => r
      case Left(e) => fail(s"disjoint optimize must rebase, got: $e")
    }
    assert(ra.filesRewritten === 2)
    assert(ra.version === rb.version + 1, "A rebased onto B's head")
    // content identical, every original file replaced exactly once
    assert(t.read(spark).orderBy("id").as[Long].collect().toSeq ===
      (0 until 4).flatMap(i => i * 100 until i * 100 + 30).map(_.toLong))
    assert(t.fileCount(t.currentVersion()) === 2)
  }

  test("optimize vs optimize, OVERLAPPING selections: the parked one refuses") {
    val dir = Files.createTempDirectory("graft_race_ov").toString
    val t = SnapshotTable(dir)
    val rels = smallFiles(t)
    val (arrived, go) = (new CountDownLatch(1), new CountDownLatch(1))
    // racer A selects ALL small files; B compacts the same set first
    val a = raceOptimize(dir, arrived, go, rels.toSet)
    assert(arrived.await(30, TimeUnit.SECONDS))
    val rb = t.optimize(spark, smallFileBytes = Long.MaxValue)
    assert(rb.filesRewritten === 3)
    go.countDown()
    a.get(60, TimeUnit.SECONDS) match {
      case Left(e) =>
        assert(e.getMessage.contains("lost the publish race"),
          s"expected the stale-classification refusal, got: ${e.getMessage}")
      case Right(r) => fail(s"overlapping optimize must refuse, landed $r")
    }
    // the winner's result is intact, nothing doubled
    assert(t.read(spark).count() === 90)
    assert(t.currentVersion() === rb.version)
  }

  test("ADD CONSTRAINT racing a parked optimize: the optimize refuses (it validated nothing)") {
    val dir = Files.createTempDirectory("graft_race_ck").toString
    val t = SnapshotTable(dir)
    smallFiles(t)
    val (arrived, go) = (new CountDownLatch(1), new CountDownLatch(1))
    val a = raceOptimize(dir, arrived, go,
      t.listingOf(t.currentVersion()).toSet)
    assert(arrived.await(30, TimeUnit.SECONDS))
    // the constraint lands while the compaction is parked: the
    // compaction's batch was never validated against it
    t.addCheckConstraint(spark, "pos_id", "id >= 0")
    go.countDown()
    a.get(60, TimeUnit.SECONDS) match {
      case Left(e) => assert(e.getMessage.contains("lost the publish race"))
      case Right(r) => fail(s"optimize racing a constraint add must refuse, landed $r")
    }
    assert(t.checkConstraintsOf(t.currentVersion()).contains("pos_id"))
    assert(t.read(spark).count() === 90)
  }

  test("optimize racing a parked ADD CONSTRAINT: the constraint add refuses") {
    val dir = Files.createTempDirectory("graft_race_ck2").toString
    val t = SnapshotTable(dir)
    smallFiles(t)
    val (arrived, go) = (new CountDownLatch(1), new CountDownLatch(1))
    val a = pool.submit(new java.util.concurrent.Callable[Either[Throwable, Long]] {
      override def call() = {
        val gated = new SnapshotTable(dir, new GatedStore(arrived, go))
        try Right(gated.addCheckConstraint(spark, "pos_id", "id >= 0"))
        catch { case e: Throwable => Left(e) }
      }
    })
    assert(arrived.await(30, TimeUnit.SECONDS))
    val rb = t.optimize(spark, smallFileBytes = Long.MaxValue)
    assert(rb.filesRewritten === 3)
    go.countDown()
    a.get(60, TimeUnit.SECONDS) match {
      case Left(e) => assert(e.getMessage.contains("lost the publish race"))
      case Right(v) => fail(s"constraint add racing an optimize must refuse, landed v$v")
    }
    assert(t.checkConstraintsOf(t.currentVersion()).isEmpty,
      "the refused constraint must not half-publish")
  }
}
