package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{HadoopFsLogStore, LogStore, PosixLogStore}

/** Contract battery for the commit-plane [[LogStore]] seam, run
  * identically against BOTH shipped stores. The one load-bearing
  * guarantee is put-if-absent: a losing racer observes `false` and the
  * winner's bytes survive untouched — the linearizability primitive
  * every SnapshotTable commit rides. */
class LogStoreSpec extends AnyFunSuite {

  private def stores: Seq[LogStore] = Seq(PosixLogStore, new HadoopFsLogStore)

  private def tmpDir() = Files.createTempDirectory("graft_logstore")

  for (store <- stores) {
    val n = store.name

    test(s"[$n] putIfAbsent: first writer wins, loser refuses, winner's bytes intact") {
      val dir = tmpDir()
      val p = dir.resolve("v000000001.json")
      assert(store.putIfAbsent(p, "winner".getBytes("UTF-8")))
      assert(!store.putIfAbsent(p, "loser".getBytes("UTF-8")))
      assert(new String(store.readBytes(p), "UTF-8") === "winner")
      // no temp debris left behind
      assert(store.list(dir) === Seq("v000000001.json"))
    }

    test(s"[$n] putIfAbsent: latch-ordered race — the parked publisher loses cleanly") {
      val dir = tmpDir()
      val p = dir.resolve("v000000007.json")
      val parked = new CountDownLatch(1)
      val go = new CountDownLatch(1)
      val ex = Executors.newSingleThreadExecutor()
      val racer = ex.submit(new java.util.concurrent.Callable[Boolean] {
        override def call(): Boolean = {
          parked.countDown() // "I am about to publish"
          assert(go.await(30, TimeUnit.SECONDS))
          store.putIfAbsent(p, "late".getBytes("UTF-8"))
        }
      })
      assert(parked.await(30, TimeUnit.SECONDS))
      // the main thread commits WHILE the racer is parked at its
      // publish call — deterministic lost-race ordering
      assert(store.putIfAbsent(p, "first".getBytes("UTF-8")))
      go.countDown()
      assert(racer.get(30, TimeUnit.SECONDS) === false)
      ex.shutdown()
      assert(new String(store.readBytes(p), "UTF-8") === "first")
    }

    test(s"[$n] putIfAbsent: 16-way hammer elects exactly one winner") {
      val dir = tmpDir()
      val p = dir.resolve("v000000002.json")
      val start = new CountDownLatch(1)
      val ex = Executors.newFixedThreadPool(16)
      val futs = (0 until 16).map { i =>
        ex.submit(new java.util.concurrent.Callable[Boolean] {
          override def call(): Boolean = {
            assert(start.await(30, TimeUnit.SECONDS))
            store.putIfAbsent(p, s"writer-$i".getBytes("UTF-8"))
          }
        })
      }
      start.countDown()
      val wins = futs.map(_.get(60, TimeUnit.SECONDS)).count(identity)
      ex.shutdown()
      assert(wins === 1, "exactly one concurrent publisher may win")
      val content = new String(store.readBytes(p), "UTF-8")
      assert(content.startsWith("writer-"))
      assert(store.list(dir) === Seq("v000000002.json"),
        "losing attempts must clean their staging files")
    }

    test(s"[$n] putFileIfAbsent: staged-writer publish honors the same race contract") {
      val dir = tmpDir()
      val p = dir.resolve("a000000020.anchor")
      assert(store.putFileIfAbsent(p,
        tmp => Files.write(tmp, "staged-one".getBytes("UTF-8"))))
      assert(!store.putFileIfAbsent(p,
        tmp => Files.write(tmp, "staged-two".getBytes("UTF-8"))))
      assert(new String(store.readBytes(p), "UTF-8") === "staged-one")
    }

    test(s"[$n] read/list/delete/size/mkdirs plumbing round-trips") {
      val dir = tmpDir()
      val sub = dir.resolve("nested")
      store.mkdirs(sub)
      assert(store.listDirs(dir) === Seq("nested"))
      val p = sub.resolve("m.txt")
      val body = "line1\nline2\nline3"
      assert(store.putIfAbsent(p, body.getBytes("UTF-8")))
      assert(store.exists(p))
      assert(store.size(p) === body.getBytes("UTF-8").length.toLong)
      assert(store.readLines(p) === Seq("line1", "line2", "line3"))
      val in = store.open(p)
      try assert(in.readNBytes(5).sameElements("line1".getBytes("UTF-8")))
      finally in.close()
      assert(store.list(sub) === Seq("m.txt"))
      assert(store.delete(p))
      assert(!store.exists(p))
      assert(!store.delete(p), "second delete reports nothing was there")
    }

    test(s"[$n] store round-trips through java serialization (executor closure contract)") {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(store); oos.close()
      val ois = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      val back = ois.readObject().asInstanceOf[LogStore]
      assert(back.name === store.name)
      // the deserialized copy is a WORKING client, not just a label
      val dir = tmpDir()
      val p = dir.resolve("ser.txt")
      assert(back.putIfAbsent(p, "via-copy".getBytes("UTF-8")))
      assert(new String(store.readBytes(p), "UTF-8") === "via-copy")
    }
  }

  test("forRoot: explicit pin wins over the system-property default") {
    val root = Files.createTempDirectory("graft_pin").toString
    val t = graft.sources.SnapshotTable(root, LogStore.hadoopFs)
    assert(t.store.name === "hadoop-fs")
    // an internal re-construction of the same root resolves the pin
    assert(graft.sources.SnapshotTable(root).store.name === "hadoop-fs")
    // an unrelated root stays on the default
    val other = Files.createTempDirectory("graft_pin2").toString
    assert(graft.sources.SnapshotTable(other).store.name === "posix")
  }

  test("forRoot: the graft.logstore property swaps the default store") {
    val prev = sys.props.get(LogStore.DefaultProp)
    try {
      sys.props(LogStore.DefaultProp) = "hadoop-fs"
      val root = Files.createTempDirectory("graft_prop").toString
      assert(graft.sources.SnapshotTable(root).store.name === "hadoop-fs")
    } finally {
      prev match {
        case Some(v) => sys.props(LogStore.DefaultProp) = v
        case None => sys.props.remove(LogStore.DefaultProp)
      }
    }
  }
}
