package graft.tools

/** Per-query phase breakdown: separates DataFrame CONSTRUCTION (eager
  * localCheckpoints and driver-side scalars run here), Catalyst
  * analysis+optimization+planning (tracker phases), and execution —
  * the attribution that tells whether a slow catalog entry is
  * compute-bound or driver-bound. Measurement-only tool.
  *
  * Usage: runMain graft.tools.PhaseQ <sfDir> <q1> [q2 ...]
  */
object PhaseQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PhaseQ <sfDir> <q...>")
    val dir = args(0)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    println("query,build_s,plan_s,exec_s,analysis_ms,optimization_ms,planning_ms")
    args.drop(1).foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      try {
        fn(spark, dir).count() // warmup
        graft.Blocks.sweep(spark, blocking = true)
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analyze+optimize+plan
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        val ph = df.queryExecution.tracker.phases
          .map { case (k, v) => k -> (v.endTimeMs - v.startTimeMs) }
        println(f"$q,${(t1 - t0) / 1e9}%.3f,${(t2 - t1) / 1e9}%.3f," +
          f"${(t3 - t2) / 1e9}%.3f,${ph.getOrElse("analysis", -1L)}," +
          f"${ph.getOrElse("optimization", -1L)},${ph.getOrElse("planning", -1L)}")
        graft.Blocks.sweep(spark, blocking = true)
      } catch { case e: Throwable =>
        println(s"$q,ERR,${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
