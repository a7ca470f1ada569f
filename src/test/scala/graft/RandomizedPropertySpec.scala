package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.operators.{GraphOps, TextOps}
import graft.plans.{AsOfBackward, AsOfForward, AsOfJoin}
import graft.sources.Bucketing

/** Randomized property checks with plain-Scala reference oracles:
  * seeded trials over adversarial input spaces (key/timestamp ties,
  * random graphs, random token sets) that hand-built cases can't
  * cover. Every trial is reproducible (fixed seeds). */
class RandomizedPropertySpec extends SparkTestBase {
  import spark.implicits._

  test("as-of join modes match a brute-force reference on random tied event sets") {
    for (seed <- Seq(11, 23)) {
      val rnd = new Random(seed)
      // dense key/time ranges force heavy ties — the hard case for
      // order semantics
      val left = Seq.tabulate(200)(i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(30).toLong, 1000L + i))
      val right = Seq.tabulate(200)(i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(30).toLong, 2000L + i))
      val l = left.toDF("k", "t", "lid")
      val r = right.toDF("rk", "rt", "rid")

      def bruteBackward(k: Long, t: Long, id: Long): Option[Long] = {
        val c = right.filter(x => x._1 == k &&
          (x._2 < t || (x._2 == t && x._3 < id)))
        if (c.isEmpty) None else Some(c.maxBy(x => (x._2, x._3))._3)
      }
      def bruteForward(k: Long, t: Long, id: Long): Option[Long] = {
        val c = right.filter(x => x._1 == k &&
          (x._2 > t || (x._2 == t && x._3 > id)))
        if (c.isEmpty) None else Some(c.minBy(x => (x._2, x._3))._3)
      }
      def run(dir: graft.plans.AsOfDirection, inner: Boolean): Seq[(Long, Option[Long])] =
        AsOfJoin(l, r, Seq(col("k")), Seq(col("rk")),
            Seq(col("t"), col("lid")), Seq(col("rt"), col("rid")),
            direction = dir, inner = inner)
          .select(col("lid"), col("rid")).collect()
          .map(row => (row.getLong(0),
            if (row.isNullAt(1)) None else Some(row.getLong(1))))
          .sortBy(_._1).toSeq

      val expBack = left.map(x => (x._3, bruteBackward(x._1, x._2, x._3))).sortBy(_._1)
      val expFwd = left.map(x => (x._3, bruteForward(x._1, x._2, x._3))).sortBy(_._1)
      assert(run(AsOfBackward, inner = false) === expBack, s"backward seed=$seed")
      assert(run(AsOfForward, inner = false) === expFwd, s"forward seed=$seed")
      assert(run(AsOfBackward, inner = true)
        === expBack.collect { case (id, Some(m)) => (id, Some(m)) },
        s"inner seed=$seed")
    }
  }

  test("starComponents equals a plain union-find on random graphs") {
    for (seed <- Seq(5, 17)) {
      val rnd = new Random(seed)
      val n = 150
      val nodes = (0L until n.toLong)
      val edges = Seq.tabulate(n) { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(e => e._1 != e._2)
      // reference union-find
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = nodes.map(i => i -> {
        // component label = min node id in the component
        nodes.filter(j => find(j.toInt) == find(i.toInt)).min
      }).toMap
      val got = GraphOps.starComponents(nodes.toDF("node"), edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      assert(got === expected, s"seed=$seed")
    }
  }

  test("zorderKey roundtrips: deinterleaving recovers both coordinates") {
    val rnd = new Random(3)
    val coords = Seq.tabulate(300)(_ => (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    def compact(z: Long, offset: Int): Long =
      (0 until 16).map(i => ((z >> (2 * i + offset)) & 1L) << i).sum
    coords.toDF("a", "b")
      .withColumn("z", Bucketing.zorderKey(col("a"), col("b")))
      .as[(Long, Long, Long)].collect()
      .foreach { case (a, b, z) =>
        assert(compact(z, 0) === a && compact(z, 1) === b, s"($a,$b) -> $z")
      }
  }

  test("ImageHeaders roundtrips random dimensions across all four containers") {
    import graft.operators.Multimodal.ImageHeaders
    val rnd = new Random(43)
    def b(vs: Int*): Array[Byte] = vs.map(_.toByte).toArray
    def be16(v: Int) = Seq((v >>> 8) & 0xff, v & 0xff)
    def le16(v: Int) = Seq(v & 0xff, (v >>> 8) & 0xff)
    def be32(v: Int) = Seq(v >>> 24, (v >>> 16) & 0xff, (v >>> 8) & 0xff, v & 0xff)
    def le32(v: Int) = Seq(v & 0xff, (v >>> 8) & 0xff, (v >>> 16) & 0xff, v >>> 24)
    (1 to 200).foreach { i =>
      // PNG: full 31-bit dimension range through BE32
      val (pw, ph) = (1 + rnd.nextInt(1 << 24), 1 + rnd.nextInt(1 << 24))
      val png = b(Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0D, 0x0A, 0x1A, 0x0A,
        0, 0, 0, 13, 'I'.toInt, 'H'.toInt, 'D'.toInt, 'R'.toInt) ++
        be32(pw) ++ be32(ph) ++ Seq(8, 2, 0, 0, 0): _*)
      assert(ImageHeaders.decode(png) === ((pw, ph, "png")), s"iter $i png")
      // JPEG: u16 dims behind a random-length APPn segment
      val (jw, jh) = (1 + rnd.nextInt(65535), 1 + rnd.nextInt(65535))
      val appLen = 2 + rnd.nextInt(12)
      val jpg = b(Seq(0xFF, 0xD8, 0xFF, 0xE1) ++ be16(appLen) ++
        Seq.fill(appLen - 2)(0) ++ Seq(0xFF, 0xC0, 0x00, 0x0B, 0x08) ++
        be16(jh) ++ be16(jw) ++ Seq(0x01, 0x01, 0x11, 0x00, 0xFF, 0xD9): _*)
      assert(ImageHeaders.decode(jpg) === ((jw, jh, "jpeg")), s"iter $i jpeg")
      // GIF: u16 little-endian
      val (gw, gh) = (1 + rnd.nextInt(65535), 1 + rnd.nextInt(65535))
      val gif = b(Seq('G'.toInt, 'I'.toInt, 'F'.toInt, '8'.toInt, '9'.toInt, 'a'.toInt) ++
        le16(gw) ++ le16(gh) ++ Seq(0, 0, 0): _*)
      assert(ImageHeaders.decode(gif) === ((gw, gh, "gif")), s"iter $i gif")
      // BMP: i32 little-endian, randomly top-down (negative height)
      val (bw, bh) = (1 + rnd.nextInt(1 << 24), 1 + rnd.nextInt(1 << 24))
      val signedH = if (rnd.nextBoolean()) bh else -bh
      val bmp = b(Seq('B'.toInt, 'M'.toInt) ++ Seq.fill(16)(0) ++
        le32(bw) ++ le32(signedH): _*)
      assert(ImageHeaders.decode(bmp) === ((bw, bh, "bmp")), s"iter $i bmp")
    }
  }

  test("snapshot table matches an in-memory model under random op sequences") {
    import graft.sources.SnapshotTable
    for (seed <- Seq(7, 13)) {
      val rnd = new Random(seed)
      val dir = java.nio.file.Files.createTempDirectory(s"graft_model$seed").toString
      val t = SnapshotTable(dir)
      def dfOf(ids: Seq[Long]) =
        spark.createDataset(ids)(org.apache.spark.sql.Encoders.scalaLong).toDF("id")
      // model(v) = expected id multiset of snapshot v
      var model = Vector.empty[Vector[Long]]
      var nextId = 0L
      var usedTags = List.empty[String]
      (1 to 20).foreach { step =>
        rnd.nextInt(10) match {
          case k if k < 4 => // append
            val ids = (nextId until nextId + 1 + rnd.nextInt(15)).toVector
            nextId += ids.size
            assert(t.commit(dfOf(ids)) === model.size.toLong)
            model :+= (model.lastOption.getOrElse(Vector.empty) ++ ids)
          case 4 | 5 => // replace with a random subset of current content
            val kept = model.lastOption.getOrElse(Vector.empty)
              .filter(_ => rnd.nextBoolean())
            assert(t.commit(dfOf(kept), replace = true) === model.size.toLong)
            model :+= kept
          case 6 if model.nonEmpty => // compaction preserves content
            t.compact(spark, files = 1 + rnd.nextInt(3))
            model :+= model.last
          case 7 => // tagged commit: fresh tag appends, replayed tag skips
            val replay = usedTags.nonEmpty && rnd.nextBoolean()
            val tag = if (replay) usedTags(rnd.nextInt(usedTags.size)) else s"tag_$step"
            val ids = (nextId until nextId + 3).toVector
            val committed = t.commitOnce(tag, dfOf(ids))
            if (replay) assert(committed.isEmpty, s"seed=$seed step=$step replayed tag re-committed")
            else {
              nextId += ids.size
              assert(committed.contains(model.size.toLong))
              model :+= (model.lastOption.getOrElse(Vector.empty) ++ ids)
              usedTags ::= tag
            }
          case _ => // read a random committed version against the model
            if (model.nonEmpty) {
              val v = rnd.nextInt(model.size)
              val got = t.readAt(spark, v.toLong).select("id")
                .collect().map(_.getLong(0)).sorted.toVector
              assert(got === model(v).sorted, s"seed=$seed step=$step v=$v")
            }
        }
      }
      // full history sweep, then vacuum and re-sweep the retained tail
      model.indices.foreach { v =>
        val got = t.readAt(spark, v.toLong).select("id")
          .collect().map(_.getLong(0)).sorted.toVector
        assert(got === model(v).sorted, s"seed=$seed final v=$v")
      }
      val keep = 1 + rnd.nextInt(3)
      t.vacuum(keepVersions = keep)
      val head = model.size - 1
      (math.max(0, head - keep + 1) to head).foreach { v =>
        val got = t.readAt(spark, v.toLong).select("id")
          .collect().map(_.getLong(0)).sorted.toVector
        assert(got === model(v).sorted, s"seed=$seed post-vacuum v=$v")
      }
      if (head - keep >= 0)
        intercept[IllegalArgumentException] { t.readAt(spark, (head - keep).toLong) }
    }
  }

  test("streaming funnel equals the batch grouped-min reference under random batching") {
    import graft.streaming.StreamingJobs
    import graft.streaming.StreamingJobs.{FunnelIn, FunnelHit}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    for (seed <- Seq(17, 23)) {
      val rnd = new Random(seed)
      val types = Seq("view", "click", "purchase", "error")
      val events = Seq.fill(120)(FunnelIn(
        user_id = rnd.nextInt(8).toLong,
        event_type = types(rnd.nextInt(types.size)),
        tsMicros = 1L + rnd.nextInt(50)))
      // batch reference: first view; first click strictly after it;
      // first purchase strictly after that
      val expected: Set[(Long, String)] = events.groupBy(_.user_id).toSeq.flatMap {
        case (u, es) =>
          val v = es.filter(_.event_type == "view").map(_.tsMicros).minOption
          val c = v.flatMap(tv => es.filter(e => e.event_type == "click" && e.tsMicros > tv)
            .map(_.tsMicros).minOption)
          val p = c.flatMap(tc => es.filter(e => e.event_type == "purchase" && e.tsMicros > tc)
            .map(_.tsMicros).minOption)
          v.map(_ => (u, "1_view")) ++ c.map(_ => (u, "2_click")) ++ p.map(_ => (u, "3_purchase"))
      }.toSet
      // stream the same events in random batch splits (arbitrary order)
      val shuffled = rnd.shuffle(events)
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[FunnelIn]
      val name = s"funnel_prop_$seed"
      val q = StreamingJobs.funnelStream(input.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      var rest = shuffled
      while (rest.nonEmpty) {
        val n = 1 + rnd.nextInt(30)
        input.addData(rest.take(n))
        q.processAllAvailable()
        rest = rest.drop(n)
      }
      import spark.implicits._
      val got = spark.table(name).as[FunnelHit].collect()
        .map(h => (h.user_id, h.stage)).toSeq
      assert(got.toSet === expected, s"seed=$seed")
      assert(got.size === got.toSet.size, s"seed=$seed emitted a stage twice")
      q.stop()
    }
  }

  test("jaccard strategies agree on random documents") {
    for (seed <- Seq(29, 31)) {
      val rnd = new Random(seed)
      val vocab = Vector.tabulate(24)(i => s"t$i") // small vocab → dense path eligible
      val docs = Seq.tabulate(80) { i =>
        val n = 3 + rnd.nextInt(10)
        ("s" + rnd.nextInt(2), i.toLong,
          Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).distinct)
      }
      val dt = docs.toDF("source", "doc_id", "toks")
      def result(maxBlockRows: Long) =
        TextOps.tokenJaccardPairs(dt, threshold = 0.5, maxBlockRows = maxBlockRows)
          .select("d1", "d2", "inter", "uni").collect().map(_.toSeq).toSeq
      val dense = result(10000L)
      val sparse = result(1L) // force the inverted-index fallback
      assert(dense === sparse, s"seed=$seed")
      assert(dense.nonEmpty, s"seed=$seed should produce some near-dup pairs")
    }
  }

  test("PrefixSum equals the naive window on random groups, values, and bucket granularities") {
    import graft.operators.PrefixSum
    import org.apache.spark.sql.expressions.Window
    Seq(11, 23).foreach { seed =>
      val rnd = new Random(seed)
      val nGroups = 1 + rnd.nextInt(6)
      val rows = Seq.fill(2000 + rnd.nextInt(3000))(
        (s"g${rnd.nextInt(nGroups)}", rnd.nextLong().abs % 1000000L,
          rnd.nextInt(100).toLong))
        .distinct // unique (group, id) pairs for a total order
      val df = rows.toDF("g", "id", "w")
        .withColumn("h", md5(col("id").cast("string")))
        .repartition(1 + rnd.nextInt(16))
      val naive = df.withColumn("cum", sum("w").over(
          Window.partitionBy("g").orderBy("h", "id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("g", "id", "cum")
      val fast = PrefixSum.runningSum(df, Seq("g"), Seq(col("h"), col("id")),
          col("w"), PrefixSum.hexBucket(col("h")), "cum")
        .select("g", "id", "cum")
      assert(fast.except(naive).count() === 0 && naive.except(fast).count() === 0,
        s"seed=$seed groups=$nGroups")
    }
  }

  test("runningMaxExclusive equals the naive exclusive window on random inputs") {
    import graft.operators.PrefixSum
    import org.apache.spark.sql.expressions.Window
    Seq(5, 17).foreach { seed =>
      val rnd = new Random(seed)
      val nGroups = 1 + rnd.nextInt(5)
      val rows = Seq.fill(1500 + rnd.nextInt(2000))(
          (s"g${rnd.nextInt(nGroups)}", rnd.nextLong().abs % 100000L,
            rnd.nextInt(1000).toLong))
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique order key per group
      val df = rows.toDF("g", "k", "v").repartition(1 + rnd.nextInt(16))
      val naive = df.withColumn("m", max("v").over(
          Window.partitionBy("g").orderBy("k")
            .rowsBetween(Window.unboundedPreceding, -1)))
        .select("g", "k", "m")
      val fast = PrefixSum.runningMaxExclusive(df, Seq("g"), Seq(col("k")),
          col("v"), PrefixSum.rangeBucket(col("k"), lit(0L), lit(99999L),
            1 + rnd.nextInt(64)), "m")
        .select("g", "k", "m")
      assert(fast.except(naive).count() === 0 && naive.except(fast).count() === 0,
        s"seed=$seed groups=$nGroups")
    }
  }

  test("Skyline.pareto2D equals the brute-force dominance filter on random point sets") {
    import graft.operators.Skyline
    Seq(3, 29).foreach { seed =>
      val rnd = new Random(seed)
      // SMALL value ranges force heavy x and y ties — the semantics
      // edge (equal points are mutually non-dominating, same-x points
      // dominate strictly on y)
      val pts = Seq.tabulate(800)(i =>
        (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      val df = pts.toDF("id", "x", "y").repartition(1 + rnd.nextInt(8))
      val got = Skyline.pareto2D(df, "x", "y", buckets = 1 + rnd.nextInt(16))
        .select("id").as[Long].collect().toSet
      val want = pts.filter { case (_, px, py) =>
        !pts.exists { case (_, qx, qy) =>
          qx >= px && qy >= py && (qx > px || qy > py) }
      }.map(_._1).toSet
      assert(got === want, s"seed=$seed")
    }
  }

  test("sketch error bounds hold across randomized inputs (the sketch rows' quantitative gate)") {
    // q_approx_distinct (built-in HLL++ register internals) and
    // q_kll_quantiles (arrival-order-dependent compaction) emit
    // engine-internal estimates; since round 9 their catalog rows
    // carry derived-invariant oracles (within_bound / rank-containment
    // booleans the driver gate checks), and the underlying error
    // bounds are proven HERE, quantitatively, over randomized inputs.

    // HLL++: relative error vs exact distinct count within 3× the
    // configured rsd (a standard-deviation bound; deterministic for
    // fixed seeds), across cardinalities and both rsd settings
    Seq((7, 500), (11, 5000), (13, 20000)).foreach { case (seed, card) =>
      val rnd = new Random(seed)
      val rows = Seq.fill(card * 3)(rnd.nextInt(card).toLong)
      val exact = rows.distinct.size.toLong
      val r = rows.toDF("user_id").repartition(8)
        .agg(approx_count_distinct(col("user_id"), 0.05).as("e5"),
          approx_count_distinct(col("user_id"), 0.02).as("e2"))
        .head
      Seq((r.getLong(0), 0.05), (r.getLong(1), 0.02)).foreach { case (est, rsd) =>
        val rel = math.abs(est - exact).toDouble / exact
        assert(rel <= 3 * rsd,
          f"hll++ card=$card rsd=$rsd: rel error $rel%.4f > ${3 * rsd}")
      }
    }

    // KLL: rank error ≤ 2% at four quantiles, across seeds,
    // distribution shapes (uniform, lognormal, heavy discrete ties)
    // and a sorted adversarial arrival order
    def rankError(values: Seq[Double], est: Double, q: Double): Double = {
      val sorted = values.sorted
      val below = sorted.count(_ < est)
      val atMost = sorted.count(_ <= est)
      val target = q * values.length
      val dist = if (target < below) below - target
        else if (target > atMost) target - atMost
        else 0.0
      dist / values.length
    }
    val datasets: Seq[(String, Seq[Double])] =
      Seq(1, 2).flatMap { seed =>
        val rnd = new Random(seed)
        Seq(
          (s"uniform/$seed", Seq.fill(10000)(rnd.nextDouble() * 1000)),
          (s"lognormal/$seed", Seq.fill(10000)(math.exp(rnd.nextGaussian() * 2 + 3))),
          (s"ties/$seed", Seq.fill(10000)(math.floor(100.0 / (1 + rnd.nextInt(50))))))
      } :+ ("sorted", (1 to 10000).map(_.toDouble))
    val qs = Seq(0.25, 0.5, 0.9, 0.99)
    datasets.foreach { case (name, values) =>
      val ests = values.toDF("v").repartition(16)
        .agg(graft.functions.KllSketch.kllQuantile(col("v"), qs.head).as("q0"),
          qs.tail.zipWithIndex.map { case (q, i) =>
            graft.functions.KllSketch.kllQuantile(col("v"), q).as(s"q${i + 1}")
          }: _*)
        .head
      qs.zipWithIndex.foreach { case (q, i) =>
        val err = rankError(values, ests.getDouble(i), q)
        assert(err <= 0.02, f"kll $name q=$q: rank error $err%.4f > 2%%")
      }
    }
  }

  test("bucket function agrees with write placement on random keys, counts, and types") {
    // THE storage-partitioned-join soundness invariant: the v2 bucket
    // function the catalog serves (GraftBucketFunction.produceResult)
    // must compute exactly the bucket commitBucketed's repartition
    // placed each row in — if they ever diverge, a shuffle-one-side
    // SPJ plan would co-locate wrong partitions and silently drop
    // join matches. Checked end-to-end: commit random data, read each
    // FILE of the manifest, and compare every contained key's
    // function value against the file's recorded bucket id.
    import graft.sources.{GraftBucketFunction, SnapshotTable}
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new Random(42)
    for (trial <- 0 until 3) {
      val n = Seq(3, 8, 16)(trial)
      val longTable = SnapshotTable(
        java.nio.file.Files.createTempDirectory(s"graft_bfl$trial").toString)
      val keys = Seq.fill(300)(rnd.nextLong() % 100000)
      longTable.commitBucketed(keys.toDF("k"), "k", n)
      val fb = longTable.fileBucketsOf(longTable.currentVersion())
      assert(fb.nonEmpty)
      val f = GraftBucketFunction.bind(new StructType()
        .add("n", IntegerType).add("k", LongType))
        .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
      fb.foreach { case (path, bucket) =>
        spark.read.parquet(path).as[Long].collect().foreach { k =>
          val got = f.produceResult(
            new GenericInternalRow(Array[Any](n, k))).intValue()
          assert(got === bucket, s"long key $k: function says $got, file says $bucket")
        }
      }
      // string keys through the same machinery
      val strTable = SnapshotTable(
        java.nio.file.Files.createTempDirectory(s"graft_bfs$trial").toString)
      val skeys = Seq.fill(200)(rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString)
      strTable.commitBucketed(skeys.toDF("k"), "k", n)
      val sfb = strTable.fileBucketsOf(strTable.currentVersion())
      val g = GraftBucketFunction.bind(new StructType()
        .add("n", IntegerType).add("k", StringType))
        .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
      sfb.foreach { case (path, bucket) =>
        spark.read.parquet(path).as[String].collect().foreach { k =>
          val got = g.produceResult(
            new GenericInternalRow(Array[Any](n, UTF8String.fromString(k)))).intValue()
          assert(got === bucket, s"string key $k: function says $got, file says $bucket")
        }
      }
    }
  }
}
