package graft.tools

/** Dump named catalog queries to parquet for targeted oracle checks:
  * runMain graft.tools.DumpQ <sfDir> <outDir> <q...> — the one-query
  * form of Verify (whose REPL-free forked JVM the ScalaReflection
  * encoders require; sbt console breaks them). */
object DumpQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    val s = graft.GraftSession.builder("32").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    args.drop(2).foreach { q =>
      graft.SparkEntry.queries(q)(s, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$q")
      println(s"DUMPED $q")
    }
    // the dumped queries' oracle SQL, so tools/check.py works on the
    // partial dump exactly as it does on a full Verify output
    val sqls = args.drop(2).flatMap(q =>
      graft.SparkEntry.oracleSql.get(q).map(q -> _))
    val json = sqls.map { case (k, v) =>
      val esc = v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\t", "\\t")
      s""""$k": "$esc""""
    }.mkString("{", ", ", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    s.stop()
  }
}
