package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Scalars
import graft.schema.Schemas
import graft.sources.Tables

/** Dataflow orchestration (SURVEY.md §2.11, D1–D6): the Airflow DAG
  * semantics as a plain driver program.
  *
  * - D1 staged pipeline: clean → load, sequential (master_dag.py:22-39);
  * - D2/D6 fan-out per competitor (scrape_dag.py:29-46,
  *   load_to_bigquery_dag.py:144-184): the clean stage runs its
  *   competitor branches CONCURRENTLY (Futures submitting independent
  *   Spark jobs — the reference's two scrapers run in parallel), while
  *   the load stage stays sequential because every load reads and
  *   appends the same shared warehouse tables;
  * - D3 continue-on-failure: a competitor's failure is recorded to
  *   `logs` and the run proceeds (trigger_rule='all_done');
  * - D4 retry with bounded attempts (retries=1 in the reference);
  * - D5 delay sensors are a file-handoff artifact → no-op here (each
  *   stage reads what the previous stage finished writing).
  *
  * The per-stage units are whole Spark jobs; orchestration never touches
  * row data on the driver.
  */
object Pipeline {

  final case class StageResult(competitor: String, stage: String,
                               ok: Boolean, error: Option[String])

  /** D4: run `f` up to 1+retries times (reference: retries=1). */
  def withRetry[T](retries: Int = 1)(f: => T): T = {
    var attempt = 0
    var out: Option[T] = None
    var last: Throwable = null
    while (out.isEmpty && attempt <= retries) {
      try out = Some(f)
      catch { case e: Throwable => last = e; attempt += 1 }
    }
    out.getOrElse(throw last)
  }

  /** Full run: clean all (competitor × header) raw drops, then load each
    * competitor's products/packs/logs into the warehouse, isolating
    * failures per competitor (D3). Returns per-stage results; failures
    * are also appended to the `logs` table as audit rows (V2). */
  def run(spark: SparkSession, rawDir: String, cleanDir: String, warehouseDir: String,
          competitors: Seq[String] = Seq("mobileviking", "scarlet")): Seq[StageResult] = {

    // D2: competitor clean branches are independent (distinct inputs and
    // outputs) → run them concurrently. Spark's scheduler is thread-safe;
    // each Future submits that branch's jobs from its own thread, and
    // failures stay isolated per branch exactly as in the sequential form.
    val cleanResults = {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, math.min(competitors.size, 4)))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      try Await.result(Future.sequence(competitors.map { c =>
        Future {
          try {
            withRetry() { CleanJob.run(spark, rawDir, cleanDir, Seq(c)) }
            StageResult(c, "clean", ok = true, None)
          } catch { case e: Throwable =>
            StageResult(c, "clean", ok = false, Some(e.getMessage))
          }
        }
      }), Duration.Inf)
      finally pool.shutdown()
    }

    val loadResults = competitors.map { c =>
      try {
        withRetry() { loadCompetitor(spark, cleanDir, warehouseDir, c) }
        StageResult(c, "load", ok = true, None)
      } catch { case e: Throwable =>
        StageResult(c, "load", ok = false, Some(e.getMessage))
      }
    }

    // V2 audit rows, whether or not stages succeeded (utils.py:54-68)
    val results = cleanResults ++ loadResults
    import spark.implicits._
    val logRows = results.map(r =>
      (r.competitor, java.time.LocalDate.now().toString,
        r.error.getOrElse("no error")))
      .toDF("competitor_name", "scraped_at", "error_details")
      .withColumn("status", Scalars.statusOf(col("error_details")))
      .withColumn("scraped_at", to_date(col("scraped_at")))
    graft.sources.SnapshotTable(s"$warehouseDir/logs").commit(logRows)
    results
  }

  /** Batch-load idempotency key = md5 of the drop's CONTENT (cleaned
    * NDJSON is small, so a driver-side read is cheap): a retry of the
    * same drop hits the tag in snapshot history, any regenerated drop
    * with different content is a new batch — unlike (length, mtime),
    * which a same-size rewrite within the filesystem's timestamp tick
    * would falsely dedupe. The Spark json writer produces a DIRECTORY
    * of part files, so walk it in name order (skipping _SUCCESS/CRC
    * markers). At lake scale, key on the object store's version/etag
    * instead of reading bytes. */
  private def contentKey(path: java.io.File, prefix: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def feed(f: java.io.File): Unit =
      if (f.isDirectory) f.listFiles().sortBy(_.getName).foreach(feed)
      else if (!f.getName.startsWith("_") && !f.getName.startsWith(".")) {
        md.update(f.getName.getBytes("UTF-8"))
        md.update(java.nio.file.Files.readAllBytes(f.toPath))
      }
    feed(path)
    s"load_${prefix}_" + md.digest().map("%02x".format(_)).mkString
  }

  /** Load one competitor's cleaned NDJSON into the warehouse tables
    * (products SCD + packs anti-join), mirroring load_to_bigquery_dag.
    *
    * Every warehouse table is a [[graft.sources.SnapshotTable]]; the
    * load lands as per-table TAGGED atomic commits
    * (StreamingJobs.upsertOnce, tag keyed by the input file's content
    * hash). A crash mid-load leaves each table either untouched — at
    * its previous committed version, fully readable — or cleanly
    * advanced; RETRY re-entry (withRetry in `run`) recomputes the
    * delta against current state and commits exactly the tables whose
    * tag is missing, while a retry after full success plans no Spark
    * job at all. This closes the torn-warehouse window the old
    * append-to-directory writes had. */
  def loadCompetitor(spark: SparkSession, cleanDir: String, warehouseDir: String,
                     competitor: String): Unit = {
    val productsPath = new java.io.File(s"$cleanDir/${competitor}_products.ndjson")
    if (productsPath.exists()) {
      val batch = Tables.ndjson(spark, Schemas.cleanProduct, productsPath.getAbsolutePath)
        .withColumn("scraped_at", to_date(col("scraped_at")))
      graft.streaming.StreamingJobs.upsertOnce(batch,
        contentKey(productsPath, competitor), warehouseDir)
    }

    val packsPath = new java.io.File(s"$cleanDir/${competitor}_packs.ndjson")
    if (packsPath.exists()) {
      // re-read state so packs see competitors staged above
      val st = graft.streaming.StreamingJobs.loadState(spark, warehouseDir)
      val rawPacks = Tables.ndjson(spark, Schemas.rawPack, packsPath.getAbsolutePath)
      val staged = WarehouseLoad.stagePacks(st, rawPacks)
        .withColumn("scraped_at", to_date(col("scraped_at")))
      // tagged atomic commit, same contract as the products tables: the
      // anti-join is naturally idempotent against committed state, but
      // the tag also makes a RETRY of an already-landed drop plan no
      // Spark job at all
      graft.sources.SnapshotTable(s"$warehouseDir/packs")
        .commitOnce(contentKey(packsPath, s"packs_$competitor"), staged): Unit
    }
  }
}
