package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.SnapshotTable

/** ALTER-SEQUENCE FUZZ over the era machinery (round 15): seeded random
  * sequences of append / rename / drop / re-add / widen / MOR-delete /
  * compact / restore driven against BOTH the real table and a tiny
  * reference model, asserting after every sequence that
  *
  *  1. the head content equals the model (per-column-IDENTITY values:
  *     a re-added name must read null, never the dropped bytes; a
  *     rename keeps values; a widen keeps values wide),
  *  2. random CDC ranges satisfy the STATE-RECONSTRUCTION invariant
  *     `content(a) ⊎ inserts = content(b) ⊎ deletes` under b's schema,
  *     or refuse with one of the DOCUMENTED reasons (id-domain breaks,
  *     dv-diverging restores, lineage breaks) — never a wrong answer,
  *     never an undocumented error.
  *
  * This hardens the one subsystem (EraMappings + pinned-id resolution)
  * whose failure mode is silent byte misattribution. Sequence count
  * via GRAFT_FUZZ_SEQS (default 200); each sequence is seeded, so any
  * failure reproduces from its printed seed. */
class AlterSequenceFuzzSpec extends SparkTestBase {

  // ---- the reference model -------------------------------------------
  /** A column IDENTITY: re-adding a dropped name is a NEW identity. */
  private case class MCol(name: String, identity: Int, wide: Boolean)
  private case class MState(cols: Vector[MCol], rows: Vector[Long],
                            nextId: Long, nextCol: Int)
  /** value of column `c` for row `r` when the row was appended while
    * `c` was live (set at append time, constant forever). */
  private def mval(r: Long, c: MCol): Long = r * 31 + c.identity

  /** rows present at state `s`, projected to `at`'s live columns by
    * IDENTITY (absent identity → null), ordered by row id. */
  private def contents(s: MState, at: MState,
                       values: Map[(Long, Int), Long]): Seq[Seq[Any]] =
    s.rows.sorted.map { r =>
      (r: Any) +: at.cols.map(c =>
        values.get((r, c.identity)).map(v => v: Any).orNull)
    }

  private val DocumentedRefusal =
    ("(?is).*(CDC at|change.?feed|mapping|era|re-bootstrap|replace|" +
      "id.?domain|deletion.?vector|restart|lineage|expired).*").r

  private def runSequence(seed: Long, ops: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val dir = Files.createTempDirectory(s"graft_fuzz_$seed").toString
    val t = SnapshotTable(dir)
    // row values, keyed by (rowId, column IDENTITY) — set at append
    var values = Map.empty[(Long, Int), Long]
    var st = MState(Vector(MCol("c0", 0, wide = false)), Vector.empty, 0L, 1)
    // model snapshot per ACTUAL committed version
    var snaps = Map.empty[Long, MState]

    def sparkSchema(s: MState): StructType =
      StructType(StructField("id", LongType) +: s.cols.map(c =>
        StructField(c.name, if (c.wide) LongType else IntegerType)))

    def append(): Unit = {
      val ids = (st.nextId until st.nextId + 3)
      val rows = ids.map { r =>
        Row.fromSeq((r: Any) +: st.cols.map { c =>
          val v = mval(r, c)
          if (c.wide) (v: Any) else (v.toInt: Any)
        })
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), sparkSchema(st))
      val v = t.commit(df)
      ids.foreach(r => st.cols.foreach(c => values += (r, c.identity) -> mval(r, c)))
      st = st.copy(rows = st.rows ++ ids, nextId = st.nextId + 3)
      snaps += v -> st
    }

    def opOnce(): Unit = rnd.nextInt(12) match {
      case 0 | 1 | 2 => append()
      case 3 | 4 => // rename a random column to a fresh name
        val i = rnd.nextInt(st.cols.size)
        val fresh = s"r${st.nextCol}_${st.cols(i).name.take(6)}"
        val v = t.renameColumn(st.cols(i).name, fresh)
        st = st.copy(cols = st.cols.updated(i, st.cols(i).copy(name = fresh)),
          nextCol = st.nextCol + 1)
        snaps += v -> st
      case 5 => // drop (keep at least one payload column)
        if (st.cols.size >= 2) {
          val i = rnd.nextInt(st.cols.size)
          val v = t.dropColumn(st.cols(i).name)
          st = st.copy(cols = st.cols.patch(i, Nil, 1))
          snaps += v -> st
        } else append()
      case 6 | 7 => // add — HALF the time re-using a previously-seen name
        val name =
          if (rnd.nextBoolean() && st.nextCol > st.cols.size)
            s"c${rnd.nextInt(st.nextCol)}" // may be a dropped name
          else s"c${st.nextCol}"
        if (st.cols.exists(_.name == name)) append()
        else {
          val v = t.addColumns(StructType(Seq(
            StructField(name, IntegerType))))
          st = st.copy(cols = st.cols :+ MCol(name, st.nextCol, wide = false),
            nextCol = st.nextCol + 1)
          snaps += v -> st
        }
      case 8 => // widen a narrow column
        st.cols.zipWithIndex.filter(!_._1.wide).headOption match {
          case Some((c, i)) =>
            val v = t.widenColumn(c.name, LongType)
            st = st.copy(cols = st.cols.updated(i, c.copy(wide = true)))
            snaps += v -> st
          case None => append()
        }
      case 9 => // MOR-delete one random row
        if (st.rows.nonEmpty) {
          val r = st.rows(rnd.nextInt(st.rows.size))
          t.deleteWhere(spark, col("id") === r, dvMaxRowsPerFile = 1000)
          st = st.copy(rows = st.rows.filterNot(_ == r))
          snaps += t.currentVersion() -> st
        } else append()
      case 10 => // compact: no logical change
        if (st.rows.nonEmpty) {
          val v = t.compact(spark, files = 1 + rnd.nextInt(2))
          snaps += v -> st
        } else append()
      case 11 => // restore to a random earlier version
        val candidates = snaps.keys.toSeq.sorted.dropRight(1)
        if (candidates.nonEmpty) {
          val target = candidates(rnd.nextInt(candidates.size))
          try {
            val v = t.restore(target)
            st = snaps(target)
            snaps += v -> st
          } catch { // all-or-nothing refusals are part of the contract
            case e: Exception =>
              assert(DocumentedRefusal.matches(e.getMessage.take(400)) ||
                e.getMessage.contains("restore"), s"seed=$seed: $e")
          }
        } else append()
    }

    append() // every sequence starts with data
    (0 until ops).foreach(_ => opOnce())

    // 1. HEAD CONTENT ≡ MODEL, per column identity
    val head = t.currentVersion()
    val want = contents(st, st, values)
    val got = t.read(spark)
      .select(col("id") +: st.cols.map(c => col(c.name).cast("long")): _*)
      .orderBy("id").collect()
      .map(r => r.toSeq.map(x => if (x == null) null else x)).toSeq
    assert(got.map(_.toList) === want.map(_.toList),
      s"seed=$seed: head content diverged from the model")

    // 2. CDC STATE-RECONSTRUCTION over two random committed ranges
    val versions = snaps.keys.toSeq.sorted
    (0 until 2).foreach { _ =>
      if (versions.size >= 2) {
        val ai = rnd.nextInt(versions.size - 1)
        val bi = ai + 1 + rnd.nextInt(versions.size - 1 - ai)
        val (a, b) = (versions(ai), versions(bi))
        try {
          val cdc = t.readChangesCdc(spark, a, b)
          val bCols = snaps(b).cols
          val rows = cdc.select(
            (col("id") +: bCols.map(c => col(c.name).cast("long"))) :+
              col("_change_type"): _*).collect()
          val ins = rows.filter(_.getString(bCols.size + 1) == "insert")
            .map(_.toSeq.dropRight(1)).toSeq
          val del = rows.filter(_.getString(bCols.size + 1) == "delete")
            .map(_.toSeq.dropRight(1)).toSeq
          val lhs = (contents(snaps(a), snaps(b), values) ++ ins)
            .map(_.toList).sortBy(_.toString)
          val rhs = (contents(snaps(b), snaps(b), values) ++ del)
            .map(_.toList).sortBy(_.toString)
          assert(lhs === rhs,
            s"seed=$seed range($a,$b]: content(a) ⊎ ins != content(b) ⊎ del")
        } catch {
          case e: org.scalatest.exceptions.TestFailedException => throw e
          case e: Exception =>
            assert(DocumentedRefusal.matches(
              Option(e.getMessage).getOrElse("").take(500)),
              s"seed=$seed range($a,$b]: UNDOCUMENTED failure: $e")
        }
      }
    }
    SnapshotTable.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  // 200 sequences ≈ 4 min on a warm session (measured 244.8 s) — every
  // sequence is seed-deterministic, so any failure reproduces from its
  // printed seed; GRAFT_FUZZ_SEQS dials the count for quick triage
  test("seeded alter-sequence sweep: model equivalence + CDC reconstruction or documented refusal") {
    val n = sys.env.getOrElse("GRAFT_FUZZ_SEQS", "200").toInt
    val t0 = System.nanoTime()
    (1 to n).foreach { i => runSequence(seed = 77000L + i, ops = 7) }
    info(f"$n sequences in ${(System.nanoTime() - t0) / 1e9}%.1f s")
  }
}
