package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Throwaway bisection harness for q_user_cf (r15 optimization round). */
object ScratchCf {
  def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"SCRATCH $label rows=$n time=${(System.nanoTime() - t0) / 1e9}%.3f")
  }

  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("32")
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val cp = graft.sources.Tables.orders(s, d).join(
        graft.sources.Tables.lineitem(s, d),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct().localCheckpoint()
    val band = cp.groupBy("p").agg(count(lit(1)).as("nc"))
      .filter(col("nc").between(2, 32)).select("p")
    time("band")(band.count())

    // variant A: join pair-gen
    val cpb = cp.join(broadcast(band), Seq("p"))
      .repartition(32, col("p"))
    val pairsA = cpb.select(col("p"), col("c").as("ca"))
      .join(cpb.select(col("p"), col("c").as("cb")), Seq("p"))
      .filter(col("cb") > col("ca"))
      .groupBy("ca", "cb").agg(count(lit(1)).as("co"))
    (1 to 2).foreach(_ => time("pairsA_join")(pairsA.count()))

    // variant B: explode pair-gen (the old shape)
    val pairsB = cp.join(broadcast(band), Seq("p"))
      .groupBy("p").agg(collect_set(col("c")).as("cs"))
      .repartition(32)
      .select(explode(col("cs")).as("ca"), col("cs"))
      .select(col("ca"), explode(filter(col("cs"), x => x > col("ca"))).as("cb"))
      .groupBy("ca", "cb").agg(count(lit(1)).as("co"))
    (1 to 2).foreach(_ => time("pairsB_explode")(pairsB.count()))

    // variant C: posexplode over sorted array (codegen-friendly explode)
    val pairsC = cp.join(broadcast(band), Seq("p"))
      .groupBy("p").agg(sort_array(collect_set(col("c"))).as("cs"))
      .repartition(32)
      .select(posexplode(col("cs")).as(Seq("i", "ca")), col("cs"))
      .select(col("ca"), explode(slice(col("cs"), col("i") + 2,
        size(col("cs")))).as("cb"))
      .groupBy("ca", "cb").agg(count(lit(1)).as("co"))
    (1 to 2).foreach(_ => time("pairsC_slice")(pairsC.count()))

    // downstream: sym + topk over each
    def downstream(pairs: DataFrame): Long = {
      val pp = pairs.localCheckpoint()
      val sym = pp.select(col("ca").as("cust"), col("cb").as("peer"), col("co"))
        .unionByName(pp.select(col("cb").as("cust"), col("ca").as("peer"), col("co")))
      graft.plans.TopKPerGroup(sym, Seq(col("cust")),
        Seq(col("co").desc, col("peer").asc), k = 3).count()
    }
    time("downstreamA")(downstream(pairsA))
    time("downstreamB")(downstream(pairsB))

    // variant D: symmetric join, single agg, no checkpoint/union
    val pairsD = cpb.select(col("p"), col("c").as("cust"))
      .join(cpb.select(col("p"), col("c").as("peer")), Seq("p"))
      .filter(col("cust") =!= col("peer"))
      .groupBy("cust", "peer").agg(count(lit(1)).as("co"))
    def topk(sym: DataFrame): Long =
      graft.plans.TopKPerGroup(sym, Seq(col("cust")),
        Seq(col("co").desc, col("peer").asc), k = 3).count()
    (1 to 2).foreach(_ => time("fullD_symjoin")(topk(pairsD)))

    // variant E: cb>ca agg + union of both directions, no checkpoint
    // (exchange reuse shares the pair shuffle between the branches)
    val pairsE = cpb.select(col("p"), col("c").as("ca"))
      .join(cpb.select(col("p"), col("c").as("cb")), Seq("p"))
      .filter(col("cb") > col("ca"))
      .groupBy("ca", "cb").agg(count(lit(1)).as("co"))
    val symE = pairsE.select(col("ca").as("cust"), col("cb").as("peer"), col("co"))
      .unionByName(pairsE.select(col("cb").as("cust"), col("ca").as("peer"), col("co")))
    (1 to 2).foreach(_ => time("fullE_union_nockpt")(topk(symE)))

    // variant F: the committed shape end to end (checkpoint + union)
    (1 to 2).foreach(_ => time("fullF_current")(downstream(pairsA)))
    s.stop()
  }
}
