package graft.tools

/** QTime with session-conf overrides from SPARK_GRAFT_CONF
  * ("k=v;k=v") — the A/B harness for config experiments (AQE knobs,
  * partition counts) without touching the canonical GraftSession.
  * Measurement-only tool; the bench contract is unaffected.
  *
  * Usage: SPARK_GRAFT_CONF="spark.x=y" runMain graft.tools.TrialQ
  *        <sfDir> <reps> <q1> [q2 ...]
  */
object TrialQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: TrialQ <sfDir> <reps> <q...>")
    val dir = args(0); val reps = args(1).toInt
    val b = graft.GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => b.config(k, v)
          case _ => sys.error(
            s"SPARK_GRAFT_CONF entry '$kv' is not of the form key=value")
        }
      })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var total = 0.0
    args.drop(2).foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      fn(spark, dir).count() // warmup
      graft.Blocks.sweep(spark, blocking = true)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.Blocks.sweep(spark, blocking = true)
        dt
      }.sorted
      total += ts.head
      println(f"TRIAL $q min=${ts.head}%.3f med=${ts(ts.size / 2)}%.3f")
    }
    println(f"TRIAL_TOTAL $total%.3f")
    spark.stop()
  }
}
