package graft.tools
object CountQ { def main(a: Array[String]): Unit = { println("QUERIES=" + graft.SparkEntry.queries.size + " ORACLES=" + graft.SparkEntry.oracleSql.size) } }
