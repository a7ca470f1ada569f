package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** Scale rehearsal for the round-10 transactional additions —
  * conditional SQL MERGE (DELETE arm + classification join),
  * schema-evolving merge, and the CDC change feed. These are not
  * catalog queries with a ×N input directory (their fixtures are
  * key-bounded by design), so [[ScaleRehearsal]]'s replica recipe
  * doesn't apply; what must be measured instead is the operators' own
  * scale CONTRACT, which has two axes:
  *
  *  - TABLE axis: a FIXED-size delta merged into a table ×N larger
  *    (clustered on the key) must cost ~the same — the zone-map touch
  *    discipline bounds classification + rewrite by the OVERLAPPING
  *    data, never the table. Expected exponent ≈ 0 (flat); anything
  *    near 1 means the conditional path re-introduced a table scan.
  *  - DELTA axis: a delta ×N into a table ×N must cost ~×N — the work
  *    IS the touched data. Expected exponent ≈ 1; anything near 2
  *    means a pairwise/classification blowup.
  *
  * Each scenario runs cold at ×1 and ×`factor` in one JVM and prints
  * time + the empirical exponent log(tN/t1)/log(N), the
  * ARCHITECTURE.md convention. Synthetic rows (id + md5 payload) —
  * the contract under test is file-touch behavior, not content.
  *
  * Usage: runMain graft.tools.SnapshotRehearsal [rowsBase] [factor]
  */
object SnapshotRehearsal {
  def main(args: Array[String]): Unit = {
    val rowsBase = if (args.length > 0) args(0).toLong else 200000L
    val factor = if (args.length > 1) args(1).toInt else 10
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def freshTable(rows: Long, files: Int): (SnapshotTable, String) = {
      val dir = java.nio.file.Files.createTempDirectory("graft_mrg_rehearse").toString
      val t = SnapshotTable(dir)
      t.commit(spark.range(rows).select(col("id"),
        md5(col("id").cast("string")).as("val")))
      // files ∝ rows so FILE SIZE stays constant across scales — the
      // honest layout (a ×N table with the same file count would make
      // "touched files" degenerate)
      t.compact(spark, files = files, sortKey = Some(col("id")))
      (t, dir)
    }

    def timed(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[rehearse] $label%-42s ${dt}%8.2f s")
      dt
    }

    def exp(t1: Double, tN: Double): Double =
      math.log(tN / t1) / math.log(factor.toDouble)

    spark.conf.set("spark.sql.catalog.srh",
      classOf[graft.sources.SnapshotCatalog].getName)

    // JIT/codegen warmup (untimed): without it the ×1 run of the first
    // scenario absorbs whole-stage compilation and the exponent skews
    // NEGATIVE (measured −0.44 on a plan that is actually flat)
    def warmup(): Unit = {
      val (t, dir) = freshTable(20000L, 2)
      val v0 = t.currentVersion()
      t.merge(spark, spark.range(0, 1000).select(col("id"),
        lit("w").as("val"), col("id").as("score")),
        Seq("id"), evolveSchema = true)
      t.readChangesCdc(spark, v0, t.currentVersion()).count()
      t.readMatchable(spark, spark.range(3).toDF("id"), "id",
        t.currentVersion()).count()
      SnapshotTable.deleteRecursively(java.nio.file.Paths.get(dir))
    }
    warmup()

    // ---- scenario 1: conditional MERGE w/ DELETE arm, FIXED delta,
    // table ×1 vs ×N (expect ≈0) --------------------------------------
    def condMerge(rows: Long, files: Int): Double = {
      val (t, dir) = freshTable(rows, files)
      // fixed 10k-key delta in one narrow range: touches O(1) files on
      // the clustered layout at every scale
      spark.range(1000, 11000).select(col("id"),
        lit("new").as("val")).createOrReplaceTempView("srh_delta")
      spark.conf.set("spark.sql.catalog.srh.warehouse", dir)
      val dt = timed(s"cond-merge fixed delta, ${rows / 1000}k rows") {
        val delta = spark.table("srh_delta")
        // the SQL seam needs a catalog table; drive the same exec path
        // through the API with an equivalent classification: this IS
        // MergeIntoSnapshotExec's general tier (readMatchable join +
        // action cascade + merge(deleteCol, expectedBase))
        val v0 = t.currentVersion()
        val tgt0 = t.readMatchable(spark, delta, "id", v0)
        val tgt = tgt0.select(tgt0.columns.toIndexedSeq
          .map(c => col(c).as("_t_" + c)) :+ lit(1).as("_t_present"): _*)
        val classified = delta
          .select(col("id").as("_s_id"), col("val").as("_s_val"))
          .join(tgt, col("_s_id") === col("_t_id"), "left")
          .withColumn("_action",
            when(col("_t_present").isNotNull,
              when(col("_s_id") % 2 === 0, lit("D")).otherwise(lit("U")))
            .otherwise(lit("I")))
          .where(col("_action") =!= "none")
          .select(col("_s_id").as("id"), col("_s_val").as("val"),
            (col("_action") === "D").as("_del"))
        t.merge(spark, classified, Seq("id"), deleteCol = Some("_del"),
          expectedBase = Some(v0))
      }
      SnapshotTable.deleteRecursively(java.nio.file.Paths.get(dir))
      dt
    }
    val c1 = condMerge(rowsBase, 8)
    val cN = condMerge(rowsBase * factor, 8 * factor)
    println(f"[rehearse] cond-merge TABLE-axis exponent = ${exp(c1, cN)}%.2f (expect ~0)")

    // ---- scenario 2: evolving merge, delta ×1 vs ×N on table ×1 vs
    // ×N (expect ≈1: cost tracks the touched/merged data) --------------
    def evolveMerge(rows: Long, files: Int): Double = {
      val (t, dir) = freshTable(rows, files)
      val delta = spark.range(0, rows / 4).select(col("id"),
        lit("upd").as("val"), (col("id") * 2).as("score"))
      val dt = timed(s"evolving merge, ${rows / 1000}k rows, delta ${rows / 4000}k") {
        t.merge(spark, delta, Seq("id"), evolveSchema = true)
      }
      SnapshotTable.deleteRecursively(java.nio.file.Paths.get(dir))
      dt
    }
    val e1 = evolveMerge(rowsBase, 8)
    val eN = evolveMerge(rowsBase * factor, 8 * factor)
    println(f"[rehearse] evolving-merge DELTA-axis exponent = ${exp(e1, eN)}%.2f (expect ~1)")

    // ---- scenario 3: CDC change feed over a merge commit, ×1 vs ×N
    // changed rows (expect ≈1: the read is only the changed files) ----
    def cdcRead(rows: Long, files: Int): Double = {
      val (t, dir) = freshTable(rows, files)
      val v0 = t.currentVersion()
      t.merge(spark, spark.range(0, rows / 4).select(col("id"),
        lit("upd").as("val")), Seq("id"))
      val dt = timed(s"cdc feed over merge, ${rows / 1000}k rows") {
        t.readChangesCdc(spark, v0, t.currentVersion()).count()
      }
      SnapshotTable.deleteRecursively(java.nio.file.Paths.get(dir))
      dt
    }
    val d1 = cdcRead(rowsBase, 8)
    val dN = cdcRead(rowsBase * factor, 8 * factor)
    println(f"[rehearse] cdc-feed exponent = ${exp(d1, dN)}%.2f (expect ~1)")

    // ---- scenario 4 (round 12): deletion-vector WRITE AMPLIFICATION.
    // A scattered trickle delete (a few rows in EVERY file — the
    // retention/GDPR shape zone maps cannot drop or localize) is the
    // case merge-on-read exists for: copy-on-write rewrites the whole
    // table, the DV commit writes O(deleted rows) position+sidecar
    // bytes. Measured as bytes-on-disk added by the commit; the
    // expected amplification ratio GROWS ~×N with the table while the
    // DV bytes stay ~flat. Read-back time after the DV commit is also
    // printed — the anti-join read must stay ~the plain-scan cost. ----
    def dirBytes(dir: String): Long = {
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(dir, "data"))
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size).sum
      }
      finally st.close()
    }
    def trickleDelete(rows: Long, files: Int, dv: Boolean): (Double, Long) = {
      val (t, dir) = freshTable(rows, files)
      val before = dirBytes(dir)
      val label = if (dv) "dv" else "cow"
      // ~rows/5000 matches scattered across every file of the
      // id-clustered layout
      val dt = timed(s"trickle delete ($label), ${rows / 1000}k rows") {
        t.deleteWhere(spark, col("id") % 5000 === 7,
          dvMaxRowsPerFile = if (dv) 100000 else 0)
      }
      val added = dirBytes(dir) - before
      if (dv) {
        val cnt = timed(s"dv read-back count, ${rows / 1000}k rows") {
          t.read(spark).count()
        }
        val _ = cnt
      }
      SnapshotTable.deleteRecursively(java.nio.file.Paths.get(dir))
      (dt, added)
    }
    val (cowT1, cowB1) = trickleDelete(rowsBase, 8, dv = false)
    val (dvT1, dvB1) = trickleDelete(rowsBase, 8, dv = true)
    val (cowTN, cowBN) = trickleDelete(rowsBase * factor, 8 * factor, dv = false)
    val (dvTN, dvBN) = trickleDelete(rowsBase * factor, 8 * factor, dv = true)
    println(f"[rehearse] trickle-delete bytes ×1: cow=$cowB1 dv=$dvB1 " +
      f"amplification=${cowB1.toDouble / math.max(1L, dvB1)}%.1f×")
    println(f"[rehearse] trickle-delete bytes ×$factor%d: cow=$cowBN dv=$dvBN " +
      f"amplification=${cowBN.toDouble / math.max(1L, dvBN)}%.1f×")
    println(f"[rehearse] trickle-delete dv time exponent = ${exp(dvT1, dvTN)}%.2f " +
      f"(cow ${exp(cowT1, cowTN)}%.2f)")

    // ---- scenario 5 (round 13): DELTA MANIFESTS + ANCHORED PLANNING.
    // Before this round every commit rewrote the full O(files) listing
    // — the real per-commit tax on a long-lived table. Now the LAST
    // append's manifest bytes must stay ~flat while the lineage grows
    // ×N, and a FRESH handle's read planning must fold one anchor + a
    // bounded delta tail (≤ AnchorInterval parses), not the lineage. ----
    def manifestScale(nCommits: Int): (Long, Long, Long, Double) = {
      val dir = java.nio.file.Files.createTempDirectory("graft_dm_rehearse").toString
      val t = SnapshotTable(dir)
      (0 until nCommits).foreach(i =>
        t.commit(spark.range(i * 100L, i * 100L + 100L).toDF("id")
          .repartition(1)))
      val head = t.currentVersion()
      val lastBytes = java.nio.file.Files.size(java.nio.file.Paths
        .get(dir, "_manifests", f"v$head%09d.json"))
      val fresh = SnapshotTable(dir)
      val t0 = System.nanoTime()
      val files = fresh.listingOf(head).size
      val planSec = (System.nanoTime() - t0) / 1e9
      val parses = fresh.manifestParses
      SnapshotTable.deleteRecursively(java.nio.file.Paths.get(dir))
      require(files == nCommits, s"listing lost files: $files != $nCommits")
      (lastBytes, parses, head, planSec)
    }
    // clamp to [2, 10]: factor=1 would compare identical runs (NaN)
    val mf = math.max(2, math.min(factor, 10))
    val (b1, p1, _, s1) = manifestScale(40)
    val (bN, pN, hN, sN) = manifestScale(40 * mf)
    println(f"[rehearse] delta-manifest commit bytes: 40-commit=$b1 " +
      f"${40 * mf}%d-commit=$bN (flat = O(changed files))")
    println(f"[rehearse] fresh-handle planning: parses=$p1 vs $pN over " +
      f"${hN + 1} commits (bound = AnchorInterval+2 = " +
      f"${SnapshotTable.AnchorInterval + 2}), ${s1}%.3f s vs ${sN}%.3f s")
    println(f"[rehearse] commit-bytes exponent = " +
      f"${math.log(bN.toDouble / b1) / math.log(mf.toDouble)}%.2f (expect ~0)")

    // ---- scenario 6 (round 14): METADATA SCALE at 10^4..10^5 files.
    // The driver-side ceilings a million-file table hits first are all
    // manifest-layer: fresh-handle read PLANNING (anchor load + delta
    // tail), ANCHOR rendering (the every-20-commits checkpoint, now
    // parquet), and VACUUM's data-dir sweep. The lineage is fabricated
    // in the manifest grammar directly (synthetic rel paths + zone-map
    // lines + empty data files) — the measurements are pure
    // metadata-path cost, no Spark job anywhere. Reported per scale:
    // planning seconds + manifest parses, anchor write seconds + bytes
    // (vs the text rendering's bytes — the compression the parquet
    // codec buys), vacuum seconds.
    def metadataScale(nFiles: Int): Unit = {
      val dir = java.nio.file.Files.createTempDirectory("graft_meta_rehearse")
      val manifests = dir.resolve("_manifests")
      val batchDir = dir.resolve("data").resolve("b1_t1")
      java.nio.file.Files.createDirectories(manifests)
      java.nio.file.Files.createDirectories(batchDir)
      val rels = (0 until nFiles).map(i => f"data/b1_t1/part-$i%06d.parquet")
      rels.foreach(r => java.nio.file.Files.createFile(
        dir.resolve(r)))
      def zm(rel: String, i: Int): String =
        "#zm=" + java.net.URLEncoder.encode(rel, "UTF-8") +
          s"|@=1000|id=l:${i * 1000}:${i * 1000 + 999}:0"
      val v0 = Seq("#schema=id BIGINT", s"#ts=1", "#op=replace") ++
        rels.zipWithIndex.map { case (r, i) => zm(r, i) } ++ rels
      java.nio.file.Files.write(manifests.resolve(f"v${0}%09d.json"),
        v0.mkString("\n").getBytes("UTF-8"))
      // 25 single-file delta commits on top
      (1 to 25).foreach { v =>
        val rel = f"data/b1_t1/extra-$v%03d.parquet"
        java.nio.file.Files.createFile(dir.resolve(rel))
        val lines = Seq(s"#base=${v - 1}", "#schema=id BIGINT",
          s"#ts=${v + 1}", "#op=append", zm(rel, nFiles + v), s"#add=$rel")
        java.nio.file.Files.write(manifests.resolve(f"v$v%09d.json"),
          lines.mkString("\n").getBytes("UTF-8"))
      }
      val t = SnapshotTable(dir.toString)
      val ta0 = System.nanoTime()
      t.renderAnchorFor(20)
      val anchorSec = (System.nanoTime() - ta0) / 1e9
      val anchorBytes = java.nio.file.Files.size(
        manifests.resolve(f"a${20}%09d.anchor"))
      val textBytes = v0.mkString("\n").getBytes("UTF-8").length.toLong
      val fresh = SnapshotTable(dir.toString)
      val tp0 = System.nanoTime()
      val n = fresh.listingOf(25).size
      val planSec = (System.nanoTime() - tp0) / 1e9
      require(n == nFiles + 25, s"listing lost files: $n")
      val tv0 = System.nanoTime()
      val (reaped, expired) = fresh.vacuum(keepVersions = 3)
      val vacSec = (System.nanoTime() - tv0) / 1e9
      println(f"[rehearse] metadata-scale $nFiles%7d files: planning " +
        f"$planSec%6.3f s (${fresh.manifestParses}%d parses), anchor " +
        f"write $anchorSec%6.3f s / $anchorBytes%d B (text would be " +
        f"~$textBytes%d B, ${textBytes.toDouble / anchorBytes}%.1f×), " +
        f"vacuum $vacSec%6.3f s ($reaped reaped, $expired expired)")
      SnapshotTable.deleteRecursively(dir)
    }
    metadataScale(10000)
    metadataScale(100000)

    // ---- scenario 7 (round 14): SELECTIVE OPTIMIZE after trickle
    // deletes. Compaction is the escape hatch every deletion-vector
    // ceiling points at; pre-round-14 it rewrote the WHOLE table. The
    // selective optimize must cost O(deleted volume): a FIXED-size
    // localized trickle delete (2k rows on the id-clustered layout →
    // O(1) DV'd files at any scale) followed by optimize on a table
    // ×1 vs ×N must run ~flat (expect exponent ≈ 0; the old full
    // rewrite measured ≈ 1). smallFileBytes=1 isolates the DV
    // selection — at rehearsal scale every file is "small" by the
    // production 128 MB default.
    def optTrickle(rows: Long, files: Int): Double = {
      val (t, dir) = freshTable(rows, files)
      val d = t.deleteWhere(spark, col("id") >= 100L && col("id") < 2100L,
        dvMaxRowsPerFile = 100000)
      require(d.filesDvUpdated >= 1, s"fixture: expected DV'd files, got $d")
      val dt = timed(s"selective optimize after trickle, ${rows / 1000}k rows") {
        val r = t.optimize(spark, smallFileBytes = 1L)
        require(r.dvRowsReclaimed == 2000L &&
          r.filesRewritten == d.filesDvUpdated,
          s"selection must be exactly the DV'd files: $r vs $d")
      }
      SnapshotTable.deleteRecursively(java.nio.file.Paths.get(dir))
      dt
    }
    val o1 = optTrickle(rowsBase, 8)
    val oN = optTrickle(rowsBase * factor, 8 * factor)
    println(f"[rehearse] selective-optimize exponent = ${exp(o1, oN)}%.2f " +
      "(expect ~0; whole-table compact would be ~1)")

    spark.stop()
  }
}
