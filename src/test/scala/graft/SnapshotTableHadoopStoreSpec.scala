package graft

import graft.sources.LogStore

/** The ENTIRE SnapshotTable battery — commits, OCC races, DVs, MOR
  * DML, column mapping, CDC, optimize, vacuum, restore, constraints —
  * re-run with the commit plane swapped onto the Hadoop
  * `FileContext` store (atomic no-overwrite rename instead of POSIX
  * hard links). The swap rides the `graft.logstore` default-store
  * property, so every construction path (specs, catalog loads, DML
  * rules, maintenance verbs) resolves the adapter; suites run
  * sequentially in the forked test JVM, so the property cannot leak
  * into a concurrently-running suite. Green here is the proof the
  * transactional format is not POSIX-bound — the same protocol, byte
  * for byte, published through a store HDFS actually has. */
class SnapshotTableHadoopStoreSpec extends SnapshotTableSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    sys.props(LogStore.DefaultProp) = "hadoop-fs"
  }

  override def afterAll(): Unit = {
    sys.props.remove(LogStore.DefaultProp)
    super.afterAll()
  }

  test("the swapped battery really ran on the hadoop-fs store") {
    val dir = java.nio.file.Files.createTempDirectory("graft_store_chk").toString
    assert(graft.sources.SnapshotTable(dir).store.name === "hadoop-fs")
  }
}
