package graft

/** Build-time accounting for the memoized shared subtrees (pair mining,
  * cluster labels, phash, winnow/shingle indexes).
  *
  * The memo caches exist so a shared subtree is computed once per
  * (session, dataset) no matter how many catalog queries consume it —
  * the right execution strategy, but it makes single-pass benchmark
  * attribution opaque: the alphabetically-first consumer pays the whole
  * build and every later consumer looks nearly free. Each build site
  * wraps its materialization in [[timed]], so Bench can report a
  * separate memo_build_ms map and the per-query entries stay
  * per-operator comparable (round-6 verdict item 3).
  */
object MemoStats {
  private val builds = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Run `build`, accumulate its wall-clock under `name`, return its result.
    * If the result is a Dataset (every memo site checkpoints one), its
    * backing checkpoint RDDs are registered with [[Blocks.protect]] so the
    * between-queries [[Blocks.sweep]] keeps the memo alive — the memo data
    * has no lineage to recompute from once its checkpoint is dropped. */
  def timed[T](name: String)(build: => T): T = {
    val t0 = System.nanoTime()
    val r = build
    val ms = (System.nanoTime() - t0) / 1000000L
    builds.updateWith(name) { prev => Some(prev.getOrElse(0L) + ms) }
    r match {
      case d: org.apache.spark.sql.Dataset[_] => Blocks.protect(d)
      case _ => ()
    }
    r
  }

  def snapshot: Map[String, Long] = builds.toMap
  def clear(): Unit = builds.clear()
}
