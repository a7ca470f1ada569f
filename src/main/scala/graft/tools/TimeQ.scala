package graft.tools

import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.builder("32").getOrCreate()
    val d = "/root/testdata/sf0.1"
    for (q <- args) {
      // warm once, then time
      graft.SparkEntry.queries(q)(s, d).count()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(s, d).count()
      println(f"TIMING $q ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
  }
}
