package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** Connected-components correctness on hand-built graphs (the catalog
  * queries' cluster output is oracle-checked end-to-end; these pin the
  * operator's own edge cases). */
class GraphOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.connectedComponents(
        nodes.toDF("node"),
        edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("chain, triangle, isolated node, and direction-independence") {
    // 1-2-3-4 chain (edges given in mixed directions), 5-6-7 triangle,
    // 8 isolated
    val got = cc(1L to 8L,
      Seq((2L, 1L), (2L, 3L), (4L, 3L), (5L, 6L), (7L, 5L), (6L, 7L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 8L))
  }

  test("long chain converges (rounds = diameter)") {
    val n = 12L
    val got = cc(1L to n, (1L until n).map(i => (i, i + 1)))
    assert(got === (1L to n).map(_ -> 1L).toMap)
  }

  test("duplicate and self edges are harmless") {
    val got = cc(Seq(1L, 2L, 3L),
      Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("empty edge set: every node is its own component") {
    val got = cc(Seq(10L, 20L), Seq.empty)
    assert(got === Map(10L -> 10L, 20L -> 20L))
  }

  test("blockedComponents == iterative connectedComponents on blocked edges") {
    // two blocks; components must match the general algorithm exactly
    val edges = Seq(("a", 1L, 2L), ("a", 2L, 3L), ("a", 5L, 6L),
      ("b", 10L, 11L), ("b", 11L, 12L), ("b", 12L, 10L))
    val blocked = GraphOps.blockedComponents(edges.toDF("block", "src", "dst"))
      .as[(Long, Long)].collect().toMap
    val iterative = GraphOps.connectedComponents(
        edges.map(_._2).union(edges.map(_._3)).distinct.toDF("node"),
        edges.map(e => (e._2, e._3)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(blocked === iterative)
    assert(blocked(3L) === 1L && blocked(12L) === 10L && blocked(6L) === 5L)
  }

  private def star(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.starComponents(
        nodes.toDF("node"),
        edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("starComponents matches min-label on small graphs") {
    val nodes = 1L to 8L
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (5L, 6L), (7L, 5L), (6L, 7L))
    assert(star(nodes, edges) === cc(nodes, edges))
    assert(star(Seq(10L, 20L), Seq.empty) === Map(10L -> 10L, 20L -> 20L))
    assert(star(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L)))
      === Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("starComponents handles a path graph far beyond min-label's round budget") {
    // a 120-node path has diameter 119: min-label propagation would
    // need 119 rounds (its maxIter=25 require fires); star contraction
    // converges in O(log n) rounds
    val n = 120L
    val nodes = 1L to n
    val edges = (1L until n).map(i => (i, i + 1))
    assertThrows[IllegalArgumentException](cc(nodes, edges))
    assert(star(nodes, edges) === nodes.map(_ -> 1L).toMap)
    // label permutation must not matter: reverse the ids (component
    // min is now the far end of the path)
    val rev = (1L until n).map(i => (n + 1 - i, n - i))
    assert(star(nodes, rev) === nodes.map(_ -> 1L).toMap)
  }

  test("starComponents on a random blocked graph equals blockedComponents") {
    val rnd = new scala.util.Random(7)
    val blocks = Seq("a", "b", "c")
    val edges = (1 to 120).map { _ =>
      val b = blocks(rnd.nextInt(blocks.size))
      val base = blocks.indexOf(b) * 1000L
      (b, base + rnd.nextInt(40).toLong, base + rnd.nextInt(40).toLong)
    }.filter(e => e._2 != e._3)
    val blocked = GraphOps.blockedComponents(edges.toDF("block", "src", "dst"))
      .as[(Long, Long)].collect().toMap
    val nodes = edges.flatMap(e => Seq(e._2, e._3)).distinct
    val starred = star(nodes, edges.map(e => (e._2, e._3)))
    assert(starred === blocked)
  }

  test("generalComponents: one-task and star paths agree; gate selects by size") {
    val rnd = new scala.util.Random(13)
    val edges = (1 to 150).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)).filter(e => e._1 != e._2)
    val nodes = (0L until 60L)
    val fast = GraphOps.generalComponents(
        nodes.toDF("node"), edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    val starred = GraphOps.generalComponents(
        nodes.toDF("node"), edges.toDF("src", "dst"), maxSingleTaskEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(fast === starred, "endgame paths must be result-identical")
    assert(fast === star(nodes, edges))
  }

  test("multisignal clustering merges components across the two blockings") {
    val sf = "/root/testdata/sf0.001"
    val multi = GraphOps.queries("q_dedup_multisignal")(spark, sf)
      .select("doc_id", "comp").as[(Long, Long)].collect().toMap
    val textOnly = GraphOps.queries("q_dedup_clusters")(spark, sf)
      .select("doc_id", "comp").as[(Long, Long)].collect().toMap
    // label invariant: every component label is its own minimum member
    multi.groupBy(_._2).foreach { case (comp, members) =>
      assert(comp === members.keys.min)
    }
    // the union graph can only merge, never split: multisignal
    // components coarsen the text-only partition
    assert(multi.values.toSet.size <= textOnly.values.toSet.size)
    textOnly.groupBy(_._2).values.foreach { members =>
      val multiComps = members.keys.map(multi).toSet
      assert(multiComps.size === 1,
        "a text-only cluster must land inside ONE multisignal cluster")
    }
  }

  test("cluster labels are consistent with the verified-pair edges") {
    val sf = "/root/testdata/sf0.001"
    val clusters = GraphOps.queries("q_dedup_clusters")(spark, sf)
      .select("doc_id", "comp").as[(Long, Long)].collect().toMap
    // every component label is a member of its own cluster, and is the
    // minimum doc_id in it
    val byComp = clusters.groupBy(_._2).view.mapValues(_.keys.min)
    byComp.foreach { case (comp, minDoc) => assert(comp === minDoc) }
    // survivors = one row per component
    val survivors = GraphOps.queries("q_dedup_survivors")(spark, sf).count()
    assert(survivors === clusters.values.toSet.size)
  }

  test("integer pagerank: one row per node, floor bound, sinks at floor, deterministic") {
    val sf = "/root/testdata/sf0.001"
    val q = GraphOps.queries("q_pagerank")
    val pr = q(spark, sf).as[(Long, Long)].collect()
    // node universe = the derived edge projection's endpoints
    val edges = graft.sources.Tables.orders(spark, sf)
      .select((col("o_custkey") % 500).as("src"), (col("o_orderkey") % 500).as("dst"))
      .filter(col("src") =!= col("dst"))
      .as[(Long, Long)].collect().toSet
    val nodes = edges.flatMap(e => Set(e._1, e._2))
    assert(pr.length === nodes.size)
    assert(pr.map(_._1).toSet === nodes)
    // teleport floor: every rank >= 150000 micro-units; a node with no
    // in-edges sits exactly at the floor
    assert(pr.forall(_._2 >= 150000L))
    val withIn = edges.map(_._2)
    pr.filter(p => !withIn.contains(p._1)).foreach(p => assert(p._2 === 150000L))
    // well-connected graphs concentrate mass above the floor somewhere
    assert(pr.exists(_._2 > 150000L))
    // integer arithmetic: a second run is bit-identical
    assert(q(spark, sf).as[(Long, Long)].collect().toSeq === pr.toSeq)
  }
}
