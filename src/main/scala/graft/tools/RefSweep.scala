package graft.tools

/** BENCH_REF re-recording sweep (round-12 verdict item 2): measure
  * every catalog query ISOLATED — warmup + `reps` timed runs,
  * reporting the min — under the same block-hygiene discipline as
  * Bench (sweep between runs, GC nudge between query groups, periodic
  * cleaner disabled), with the recording window GATED on anchors:
  * three queries whose committed references the judge's isolated
  * re-runs confirmed accurate are re-timed at the start, the middle
  * and the end of the sweep; any anchor exceeding 1.3× its committed
  * reference marks the window dirty and the sweep says so — re-run
  * later rather than record weather as a reference.
  *
  * Output: one `REF <query> <min>` line per query plus
  * `ANCHOR <name> <t> <ref> <ok>` verdicts and a final
  * `SWEEP_QUIET true|false`. The committed BENCH_REF.json is then
  * refreshed OUTSIDE this tool: min(old, new) for unchanged queries
  * (a reference is the best-known honest time — a noisy sweep must
  * not inflate it), the fresh measurement for queries whose code
  * changed this round, and new entries for new queries.
  *
  * Usage: runMain graft.tools.RefSweep [sfDir] [reps] [q...]
  */
object RefSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession
      .builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.cleaner.periodicGC.interval", "24h")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val refs: Map[String, Double] = {
      val p = java.nio.file.Paths.get("BENCH_REF.json")
      if (!java.nio.file.Files.exists(p)) Map.empty
      else """"([^"]+)"\s*:\s*([0-9.]+)""".r
        .findAllMatchIn(java.nio.file.Files.readString(p))
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
    // anchors: judge-confirmed-accurate committed refs (round-11
    // verdict: q_lsh_tuning isolated 4.76 vs ref 4.60; q_mrmr and
    // q_url_canonical re-measured at/below ref)
    val anchors = Seq("q_lsh_tuning", "q_mrmr", "q_url_canonical")
      .filter(refs.contains)

    val only = args.drop(2).toSet
    val catalog = graft.SparkEntry.queries.toSeq
      .filter(q => only.isEmpty || only(q._1)).sortBy(_._1)

    // one cheap warmup pass at the smallest SF: identical plan shapes
    // JIT every query's codegen classes before anything is timed
    val warmDir = {
      val small = sfDir.replaceAll("sf[0-9.]+$", "sf0.001")
      if (new java.io.File(small).isDirectory) small else sfDir
    }
    catalog.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    if (warmDir == sfDir) graft.Blocks.reset(spark)
    else graft.Blocks.sweep(spark)

    // a FAILED run must never be recorded as a (fast) timing — the
    // reference would drop to a value no honest run can meet
    def minOf(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () } // warm
      graft.Blocks.sweep(spark, blocking = true)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        val t = (System.nanoTime() - t0) / 1e9
        graft.Blocks.sweep(spark, blocking = true)
        if (ok) Some(t) else None
      }
      if (ts.forall(_.isDefined)) Some(ts.flatten.min) else None
    }

    var quiet = true
    def anchorCheck(tag: String): Unit = anchors.foreach { a =>
      val t = minOf(graft.SparkEntry.queries(a)).getOrElse(Double.MaxValue)
      val r = refs(a)
      val ok = t <= 1.3 * r
      if (!ok) quiet = false
      println(f"ANCHOR $tag $a t=$t%.3f ref=$r%.3f ok=$ok")
    }

    anchorCheck("start")
    catalog.zipWithIndex.foreach { case ((name, fn), i) =>
      minOf(fn) match {
        case Some(t) => println(f"REF $name $t%.3f")
        case None => println(s"REF_FAILED $name")
      }
      if (i % 10 == 9) { System.gc(); Thread.sleep(2000) }
      if (i == catalog.size / 2) anchorCheck("mid")
    }
    anchorCheck("end")
    println(s"SWEEP_QUIET $quiet")
    spark.stop()
  }
}
