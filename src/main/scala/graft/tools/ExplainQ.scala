package graft.tools

/** Dump `.explain("formatted")` for named catalog queries to files —
  * the plan evidence for optimization rounds (plans/rNN/<q>_{before,
  * after}.txt). Usage:
  *   runMain graft.tools.ExplainQ <sfDir> <outDir> <suffix> <q...>
  * writes <outDir>/<q>_<suffix>.txt per query.
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: ExplainQ <sfDir> <outDir> <suffix> <q...>")
    val sfDir = args(0); val outDir = args(1); val suffix = args(2)
    val s = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    s.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val names =
      if (args.length == 4 && args(3) == "all")
        graft.SparkEntry.queries.keys.toSeq.sorted
      else args.drop(3).toSeq
    names.foreach { q =>
      val df = graft.SparkEntry.queries(q)(s, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${q}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"EXPLAINED $q -> $outDir/${q}_$suffix.txt")
    }
    s.stop()
  }
}
