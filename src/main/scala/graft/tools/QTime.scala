package graft.tools

/** Focused per-query timing harness for A/B work: runs the named
  * catalog queries `reps` times each against one SF dir in a single
  * JVM (one warmup rep discarded) and prints min/median — the
  * in-session A/B discipline ARCHITECTURE.md's bench-noise note
  * prescribes, without paying a full Bench pass per measurement.
  *
  * Usage: runMain graft.tools.QTime <sfDir> <reps> <q1> [q2 ...] */
object QTime {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: QTime <sfDir> <reps> <q...>")
    val dir = args(0); val reps = args(1).toInt
    val spark = graft.GraftSession.local()
    args.drop(2).foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      fn(spark, dir).count() // warmup (JIT + codegen + IO cache)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      // true median: average the middle two for even rep counts (the
      // upper-middle element alone would bias quick reps=2 A/Bs high)
      val med = if (ts.size % 2 == 1) ts(ts.size / 2)
        else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2
      println(f"QTIME $q min=${ts.head}%.3f med=$med%.3f reps=$reps")
    }
    spark.stop()
  }
}
