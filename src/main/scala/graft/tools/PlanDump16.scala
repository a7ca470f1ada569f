package graft.tools

/** Round-16 plan-evidence dumper: writes `explain("formatted")` of the
  * RAW (pre-checkpoint) pipelines the round changed into
  * plans/r16/<name>.txt — the sortedNeighborhoodPlan pattern the
  * round-15 verdict asked for (dumps taken on the post-checkpoint
  * catalog entries were identical modulo expression IDs and proved
  * nothing). Measurement-only tool.
  *
  * Usage: runMain graft.tools.PlanDump16 <sfDir> <outDir> <name=builder ...>
  *        with builder one of the registered keys below.
  */
object PlanDump16 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump16 <sfDir> <outDir> <name=builder ...>")
    val dir = args(0); val out = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(out)
    val s = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    s.sparkContext.setLogLevel("ERROR")
    val builders: Map[String, () => org.apache.spark.sql.DataFrame] = Map(
      "user_cf_pairs_slice" -> (() => graft.analytics.RelQueries.userCfPairsPlan(s, dir)),
      "itemset_triples_slice" -> (() => graft.analytics.RelQueries.triplesSlice(s, dir)),
      "lsh_tuning_cands" -> (() => graft.operators.TextOps.lshTuningCandsPlan(s, dir)),
      "simhash_cands" -> (() => graft.operators.TextOps.simhashCandsPlan(s, dir)))
    args.drop(2).foreach { spec =>
      val Array(name, builder) = spec.split("=", 2)
      val df =
        if (builder.startsWith("catalog:"))
          graft.SparkEntry.queries(builder.stripPrefix("catalog:"))(s, dir)
        else builders(builder)()
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(out.resolve(s"$name.txt"), txt)
      println(s"dumped $name (${txt.linesIterator.size} lines)")
    }
    s.stop()
  }
}
