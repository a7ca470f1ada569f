package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables._

/** Corpus-curation operators a training-data pipeline runs between
  * dedup and packing (SURVEY.md §2.12 extension family): PII
  * scrubbing, URL canonicalization + URL-level dedup, and
  * temperature-balanced source mixing.
  *
  * The synthetic `documents.text` is a closed word-soup vocabulary
  * with no identifiers in it, so the scrub/canonicalize queries first
  * DERIVE the identifier-bearing column deterministically from keys
  * (both engines construct the identical string, so the redaction
  * genuinely fires on every row and still hash-compares). All regexes
  * are restricted to the Java ∩ RE2 common subset — character
  * classes, bounded repeats, alternation, `\b` — no lookaround, no
  * backreferences, so Spark (java.util.regex) and DuckDB (RE2)
  * replace identically; DuckDB needs the explicit 'g' flag to match
  * Spark's replace-all default.
  *
  * Scale notes: every operator here is a narrow per-row projection
  * (regex scrub, canonicalize) or one window/aggregation shuffling on
  * the natural key (canonical URL, source) — no joins, no driver
  * state, nothing that changes shape at 100 TB. Mixture sampling and
  * token budgeting rank WITHIN each source, which naively puts a whole
  * source through one task's window sort; both instead run the
  * two-phase distributed scan in [[PrefixSum]], so a skewed source
  * spreads over its hash buckets and no task holds more than
  * 1/(sources × buckets) of the corpus.
  */
object CorpusOps {
  type Q = (SparkSession, String) => DataFrame

  // Java ∩ RE2 patterns, kept in lockstep with the oracle SQL below.
  private val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phonePat = "\\+?1-555-[0-9]{4}"
  private val ipPat = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** q_blocklist_scrub's term list — deliberately adversarial for a
    * multi-pattern matcher: "tab"/"ab" nest inside "table", "an"
    * inside "scan", "alu" inside "value", " a " overlaps itself in
    * " a a ", "fast table" crosses a word boundary. Kept in lockstep
    * with the VALUES list in the oracle SQL. */
  private val blockTerms: Array[String] = Array(
    "table", "tab", "ab", " a ", "scan", "an", "value", "alu",
    "fast table", "batch")

  /** documents + a deterministic identifier-bearing `raw` column (a
    * synthetic contact header prepended to the text). */
  private def withRaw(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(col("doc_id"), col("source"),
      concat(
        lit("Contact user"), col("doc_id"), lit("@Example.COM or +1-555-"),
        lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"),
        lit(" ip=10."), pmod(col("doc_id"), lit(256L)),
        lit(".0."), pmod(col("doc_id") * 7, lit(256L)),
        lit(" :: "), col("text")).as("raw"))

  val queries: Map[String, Q] = Map(
    // PII scrub: redact emails / phone numbers / IPv4s with typed
    // placeholders and report per-document redaction counts — the
    // audit trail a compliance pass needs. Pure projection: stays in
    // whole-stage codegen, only the output sort shuffles.
    "q_pii_scrub" -> ((s, d) =>
      withRaw(s, d)
        .select(col("doc_id"),
          regexp_count(col("raw"), lit(emailPat)).cast("long").as("n_email"),
          regexp_count(col("raw"), lit(phonePat)).cast("long").as("n_phone"),
          regexp_count(col("raw"), lit(ipPat)).cast("long").as("n_ip"),
          regexp_replace(
            regexp_replace(
              regexp_replace(col("raw"), emailPat, "<EMAIL>"),
              phonePat, "<PHONE>"),
            ipPat, "<IP>").as("clean"))
        .orderBy("doc_id")),

    // E12 BLOCKLIST SCRUB (round 11) — Aho–Corasick multi-pattern
    // matching: all K blocklist terms found in ONE O(chars + matches)
    // pass per document, overlapping occurrences and nested patterns
    // ("tab" inside "table", self-overlapping " a ") included — the
    // semantics K independent contains()/replace() passes get wrong,
    // at 1/K the cost. The automaton builds once from the bounded term
    // list and BROADCASTS (O(Σ|term|) state, megabytes for a
    // million-term blocklist); executors scan partitions in a tight
    // per-char loop — embarrassingly parallel at 100 TB, zero shuffle
    // before the per-(doc, term) aggregate projection. The Σ(1-based
    // end position) checksum pins every match POSITION, so a failure-
    // link defect that finds the right count in the wrong places still
    // hash-mismatches. Oracle recomputes positionally: every (doc,
    // offset, term) substring test — O(chars · K) is exactly the cost
    // the automaton avoids, stated as such.
    "q_blocklist_scrub" -> ((s, d) => {
      import s.implicits._
      val bc = s.sparkContext.broadcast(new AhoCorasick(blockTerms))
      documents(s, d)
        .select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          val ac = bc.value
          it.flatMap { case (id, text) =>
            val (hits, ends) = ac.counts(text)
            hits.indices.iterator.filter(hits(_) > 0L).map(i =>
              (id, ac.patterns(i), hits(i), ends(i)))
          }
        }
        .toDF("doc_id", "term", "n_hits", "end_checksum")
        .orderBy("doc_id", "term")
    }),

    // E12 ZIP ARCHIVE INGESTION (round 11) — the bulk-drop unpacking
    // pass: per-doc synthetic archives (STORED and DEFLATE members
    // mixed) decode through the REAL central-directory walk (backward
    // EOCD scan, local-header indirection, per-member CRC-32
    // verification — a member failing CRC drops ALONE). Members
    // explode to one row each; closed-form member text ⇒ fully
    // arithmetic oracle. Scale: archives are per-row values, decode is
    // mapPartitions after the compute repartition — fan-out bounded by
    // archive content, never corpus size.
    "q_zip_extract" -> ((s, d) => {
      import s.implicits._
      documents(s, d)
        .select(col("doc_id").cast("long")).as[Long]
        .repartition(s.sparkContext.defaultParallelism)
        .mapPartitions(_.flatMap { id =>
          val members = (0 until (2 + (id % 3)).toInt).map { j =>
            ArchiveCodec.ZipMember(
              s"doc_${id}_$j.txt",
              (s"payload $id $j " + ("ab" * (1 + ((id + j) % 7)).toInt))
                .getBytes("UTF-8"),
              deflate = (id + j) % 2 == 0)
          }
          ArchiveCodec.zipDecode(ArchiveCodec.zipEncode(members))
            .toSeq.flatten.map { case (name, data, deflated) =>
              (id, name, new String(data, "UTF-8"), deflated, data.length.toLong)
            }
        })
        .toDF("doc_id", "name", "content", "deflated", "n_bytes")
        .orderBy("doc_id", "name")
    }),

    // E12 WARC CRAWL INGESTION (rounds 11-12) — the Common Crawl
    // record walk, the acquisition format of every web-scale
    // pretraining corpus: WARC/1.0 version lines, named headers,
    // Content-Length-exact payload reads, CRLF CRLF separation;
    // response records additionally split the embedded HTTP envelope
    // (status line + headers) from the body. Round 12 makes the corpus
    // the REAL wire mix: every even doc ships as `.warc.gz` — one gzip
    // member PER RECORD, concatenated (the Common Crawl shape) — and
    // decode dispatches on the magic bytes, so the oracle gate now
    // covers the RFC 1952 member walk (header option fields, raw
    // deflate, CRC-32 + ISIZE trailers) as well as the record parse.
    // Records explode to one row each; closed-form record text ⇒ fully
    // arithmetic oracle. Same per-row scale shape as q_zip_extract.
    "q_warc_extract" -> ((s, d) => {
      import s.implicits._
      documents(s, d)
        .select(col("doc_id").cast("long")).as[Long]
        .repartition(s.sparkContext.defaultParallelism)
        .mapPartitions(_.flatMap { id =>
          val recs = ArchiveCodec.WarcRecord("warcinfo", "", -1, s"crawl $id") +:
            (1 until (2 + (id % 2)).toInt + 1).map { j =>
              ArchiveCodec.WarcRecord("response", s"https://ex.com/$id/$j",
                Array(200, 301, 404)(((id + j) % 3).toInt),
                s"body $id $j " + ("w" * ((id + j) % 9).toInt))
            }
          val wire =
            if (id % 2 == 0) ArchiveCodec.warcEncodeGz(recs)
            else ArchiveCodec.warcEncode(recs)
          ArchiveCodec.warcDecodeAuto(wire)
            .toSeq.flatten.zipWithIndex.map { case (r, k) =>
              (id, k.toLong, r.recordType, r.targetUri, r.httpStatus.toLong, r.body)
            }
        })
        .toDF("doc_id", "rec", "record_type", "target_uri", "http_status", "body")
        .orderBy("doc_id", "rec")
    }),

    // URL canonicalization + dedup: crawl frontiers carry the same
    // page under scheme-case / default-port / tracking-param /
    // fragment variants; canonicalize then count duplicates per
    // canonical form. One aggregation shuffling on the canonical URL.
    "q_url_canonical" -> ((s, d) => {
      val raw = orders(s, d).select(col("o_orderkey"),
        concat(lit("HTTPS://Shop.Example.COM:443/items/"),
          pmod(col("o_orderkey"), lit(500L)),
          lit("?utm_source=feed&ref=aff"), pmod(col("o_custkey"), lit(7L)),
          lit("&page="), pmod(col("o_orderkey"), lit(4L)),
          lit("#frag")).as("url"))
      val noFrag = regexp_replace(col("url"), "#.*$", "")
      val authPat = "^[A-Za-z]+://[^/?#]*"
      val auth = regexp_replace(lower(regexp_extract(noFrag, authPat, 0)),
        ":443$", "")
      val rest = regexp_replace(noFrag, authPat, "")
      val canon = regexp_replace(
        regexp_replace(concat(auth, rest), "(utm_[a-z]+|ref)=[^&#]*&?", ""),
        "[?&]$", "")
      raw.select(col("o_orderkey"), canon.as("canonical_url"))
        .groupBy("canonical_url")
        .agg(count(lit(1)).as("n_dups"), min("o_orderkey").as("first_seen"))
        .orderBy("canonical_url")
    }),

    // Temperature-balanced mixture sampling: take k_s ∝ sqrt(n_s)
    // documents per source (alpha = 0.5 flattens the source mixture —
    // big sources are down-weighted, small ones kept whole), selected
    // by md5-hash rank so the draw is deterministic and uniform
    // within each source. sqrt is IEEE-identical cross-engine; the
    // rank key md5(doc_id) is unique, so no tie ambiguity. The rank
    // is the DISTRIBUTED row number (PrefixSum two-phase scan) and
    // per-source counts come from a broadcast aggregate — no window
    // puts a whole source through one task, so a skewed source costs
    // extra buckets, not a straggler.
    "q_mix_sample" -> ((s, d) => {
      val base = documents(s, d).select(col("source"), col("doc_id"),
        md5(col("doc_id").cast("string")).as("h"))
      val counts = base.groupBy("source").agg(count(lit(1)).as("n_docs"))
      PrefixSum.rowNumber(base, Seq("source"), Seq(col("h"), col("doc_id")),
          PrefixSum.hexBucket(col("h")), "rn")
        .join(broadcast(counts), "source")
        .withColumn("k_take",
          greatest(lit(1L), floor(sqrt(col("n_docs")) * 4).cast("long")))
        .filter(col("rn") <= col("k_take"))
        .select(col("source"), col("doc_id"), col("n_docs"), col("k_take"))
        .orderBy("source", "doc_id")
    }),

    // EPOCH-ORDER MATERIALIZATION: the deterministic global shuffle a
    // training run reads each epoch — order = md5(epoch-salt | doc),
    // position = the DISTRIBUTED row number over that order (PrefixSum
    // two-phase scan: per-hex-prefix-bucket totals → broadcast
    // exclusive offsets → local running sums — a global total order
    // with NO global single-task sort), shard = round-robin over the
    // position, so every shard is a balanced iid slice of the
    // shuffled order. Changing the salt string re-shuffles the next
    // epoch; at 100 TB the writer partitions by `shard` with each
    // shard locally ordered by `epoch_pos` — the sort stays
    // per-bucket-sized throughout.
    "q_epoch_shuffle" -> ((s, d) => {
      val base = documents(s, d).select(col("doc_id"),
        md5(concat(lit("epoch7|"), col("doc_id").cast("string"))).as("shuffle_key"))
      PrefixSum.rowNumber(base, Seq.empty,
          Seq(col("shuffle_key"), col("doc_id")),
          PrefixSum.hexBucket(col("shuffle_key")), "epoch_pos")
        .withColumn("shard", pmod(col("epoch_pos") - 1, lit(8L)))
        .select("doc_id", "shuffle_key", "epoch_pos", "shard")
        .orderBy("epoch_pos")
    }),

    // TOKEN-BUDGETED sampling: take documents per source, hash-ranked,
    // until a TOKEN budget is exhausted — how pretraining mixtures are
    // actually specified (tokens contributed per domain, not doc
    // counts; q_mix_sample is the doc-count form). The running total
    // is the TWO-PHASE distributed prefix sum (operators/PrefixSum):
    // per-(source, md5-prefix-bucket) totals → broadcast exclusive
    // offsets → local running sums — identical output to the naive
    // per-source window, but no task ever sorts a whole source. The
    // md5 rank makes the draw deterministic, and the budget cut is
    // integral, so both engines take the identical document set.
    "q_token_budget" -> ((s, d) => {
      val toks = array_remove(split(lower(col("text")), " "), "")
      val sized = documents(s, d)
        .select(col("source"), col("doc_id"),
          size(toks).cast("long").as("n_toks"),
          md5(col("doc_id").cast("string")).as("h"))
      PrefixSum.runningSum(sized, Seq("source"), Seq(col("h"), col("doc_id")),
          col("n_toks"), PrefixSum.hexBucket(col("h")), "cum_toks")
        .filter(col("cum_toks") <= 2000) // per-source token budget
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), max(col("cum_toks")).as("tokens_taken"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy("source")
    }),

    // CONTEXT-LENGTH PACKING EFFICIENCY — the design table behind the
    // choice of training sequence length: for max_len ∈ {128, 256,
    // 512}, how much of the token budget one-doc-per-sequence padding
    // burns versus cross-doc greedy packing (q_seq_pack's regime).
    // Per level: padded sequence count Σ ceil(n/L), waste ppm, and the
    // packed lower bound ceil(N/L) — reading the two waste columns
    // side by side is how a pipeline decides packing is worth its
    // doc-boundary contamination. Pure integral arithmetic off ONE
    // corpus scan exploded ×3 levels; the rollup is O(levels).
    // Degenerate all-empty-corpus denominators NULL-guarded on both
    // engines (the kappa_milli convention).
    "q_pack_efficiency" -> ((s, d) => {
      documents(s, d)
        .select(size(array_remove(split(lower(col("text")), " "), ""))
          .cast("long").as("n"))
        .select(explode(array(lit(128L), lit(256L), lit(512L))).as("max_len"),
          col("n"))
        .withColumn("n_seqs", expr("(n + max_len - 1) div max_len"))
        .groupBy("max_len")
        .agg(count(lit(1)).as("n_docs"), sum("n").as("n_tokens"),
          sum("n_seqs").as("n_seqs_padded"))
        .withColumn("waste_ppm", expr(
          """case when n_seqs_padded = 0 then null
            |else (n_seqs_padded * max_len - n_tokens) * 1000000
            |  div (n_seqs_padded * max_len) end""".stripMargin))
        .withColumn("n_seqs_packed", expr("(n_tokens + max_len - 1) div max_len"))
        .withColumn("packed_waste_ppm", expr(
          """case when n_seqs_packed = 0 then null
            |else (n_seqs_packed * max_len - n_tokens) * 1000000
            |  div (n_seqs_packed * max_len) end""".stripMargin))
        .select("max_len", "n_docs", "n_tokens", "n_seqs_padded", "waste_ppm",
          "n_seqs_packed", "packed_waste_ppm")
        .orderBy("max_len")
    }),

    // CURRICULUM ORDERING — rank documents easy→hard by rare-token
    // ratio (share of tokens whose corpus df < 1% of docs, in integral
    // ppm; the rarity signal perplexity-based curricula approximate)
    // and cut the global order into three training phases. The global
    // rank is the two-phase distributed scan bucketed on the rarity
    // score — no single-task sort — and the phase cut is pure rank
    // arithmetic ((rank−1)·3 div n), so phase sizes are balanced to
    // ±1 by construction. One explode + df join, then O(docs) narrow.
    "q_curriculum" -> ((s, d) => {
      val toks = spreadIfCoarse(documents(s, d))
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tk"))
        .filter(col("tk") =!= "")
      val nDocs = broadcast(documents(s, d).agg(count(lit(1)).as("n_docs")))
      val dfT = toks.select("doc_id", "tk").distinct()
        .groupBy("tk").agg(count(lit(1)).as("df"))
      val perDoc = toks.join(dfT.crossJoin(nDocs)
          .select(col("tk"), (col("df") * 100 < col("n_docs")).as("rare")), "tk")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"),
          sum(col("rare").cast("long")).as("n_rare"))
        .withColumn("rarity_ppm", expr("n_rare * 1000000 div n_toks"))
      val ranked = PrefixSum.rowNumber(
        perDoc.crossJoin(broadcast(perDoc.agg(
          min("rarity_ppm").as("lo"), max("rarity_ppm").as("hi")))),
        Seq.empty, Seq(col("rarity_ppm"), col("n_toks"), col("doc_id")),
        PrefixSum.rangeBucket(col("rarity_ppm"), col("lo"), col("hi"), 32), "rank")
      ranked.crossJoin(broadcast(perDoc.agg(count(lit(1)).as("n"))))
        .withColumn("phase", expr("(rank - 1) * 3 div n"))
        .select("doc_id", "n_toks", "rarity_ppm", "rank", "phase")
        .orderBy("doc_id")
    }),

    // LICENSE COMPLIANCE FILTER — the legal gate of a corpus build:
    // per-document license (md5-derived here — deterministic synthetic
    // metadata, both engines tag identically), the allowlist verdict
    // (cc-* passes, proprietary/unknown drops), and the per-license
    // retention report with token volumes — what a release audit
    // actually consumes. One narrow projection + one O(licenses) agg.
    "q_license_filter" -> ((s, d) => {
      val lic = expr(
        """case pmod(cast(conv(substring(md5(concat('lic|', doc_id)), 1, 8), 16, 10)
          |  as bigint), 10)
          |when 0 then 'proprietary' when 1 then 'unknown'
          |when 2 then 'cc-by-sa' when 3 then 'cc-by-sa'
          |else 'cc-by' end""".stripMargin)
      documents(s, d)
        .select(col("doc_id"),
          size(expr("filter(split(lower(text), ' '), x -> x != '')"))
            .cast("long").as("n_toks"), lic.as("license"))
        .withColumn("allowed",
          col("license").startsWith("cc-").cast("int"))
        .groupBy("license", "allowed")
        .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
        .orderBy("license")
    }),

    // BLOCKLIST CONTENT FILTER (the C4 badwords stage): per document,
    // the share of tokens matching a small curated lexicon; a document
    // is blocked when that share reaches 6% — share-based, not
    // any-hit, because on a natural corpus a single incidental match
    // must not nuke a long document. Per-source report: docs, blocked
    // count, retention ppm, and the mean flagged share — the table
    // that tells a curation pass WHICH source carries the problem.
    // Scale shape: one O(tokens) explode folded by doc (map-side
    // partials absorb it), then an O(sources) rollup; the lexicon is
    // a literal IN-list the scan evaluates inline — a real blocklist
    // (hundreds of terms) would broadcast identically.
    "q_toxicity_filter" -> ((s, d) => {
      val per = documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(array_remove(split(lower(col("text")), " "), "")).as("t"))
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n_toks"),
          sum(when(col("t").isin("slow", "big", "bad"), 1L).otherwise(0L))
            .as("n_flagged"))
        .withColumn("share_ppm", expr("n_flagged * 1000000 div n_toks"))
        .withColumn("blocked",
          (col("share_ppm") >= 60000L).cast("int"))
      per.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("blocked").cast("long")).as("n_blocked"),
          sum("share_ppm").as("share_sum"))
        .withColumn("retained_ppm",
          expr("(n_docs - n_blocked) * 1000000 div n_docs"))
        .withColumn("mean_share_ppm", expr("share_sum div n_docs"))
        .select("source", "n_docs", "n_blocked", "retained_ppm",
          "mean_share_ppm")
        .orderBy("source")
    }),

    // MIXTURE MATERIALIZATION — the step after q_temperature_mix
    // chooses weights: take documents per source in md5-rank order
    // until the source's √n-proportional share of the token budget is
    // filled, reporting docs/tokens taken and the fill rate. The
    // running token count is the DISTRIBUTED two-phase prefix sum
    // (like q_token_budget, but with per-source DYNAMIC budgets joined
    // from the broadcast weight table instead of one constant). A
    // source whose allocation rounds to zero (or whose first doc
    // overshoots it) simply takes nothing — deterministic in both
    // engines, and the honest outcome of a hard budget.
    "q_mix_materialize" -> ((s, d) => {
      val budget = 100000L
      val toks = array_remove(split(lower(col("text")), " "), "")
      val sized = documents(s, d)
        .select(col("source"), col("doc_id"), size(toks).cast("long").as("n_toks"),
          md5(col("doc_id").cast("string")).as("h"))
      val counts = sized.groupBy("source").agg(count(lit(1)).as("n_docs"))
        .withColumn("w", floor(sqrt(col("n_docs"))).cast("long"))
      val tot = broadcast(counts.agg(sum("w").as("tot_w")))
      val alloc = broadcast(counts.crossJoin(tot)
        .select(col("source"), expr(s"$budget * w div tot_w").as("alloc_toks")))
      PrefixSum.runningSum(sized, Seq("source"), Seq(col("h"), col("doc_id")),
          col("n_toks"), PrefixSum.hexBucket(col("h")), "cum_toks")
        .join(alloc, "source")
        .filter(col("cum_toks") <= col("alloc_toks"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs_taken"), max("cum_toks").as("tokens_taken"),
          max("alloc_toks").as("alloc_toks"))
        .withColumn("fill_ppm", expr("tokens_taken * 1000000 div alloc_toks"))
        .orderBy("source")
    }),

    // E12 WINSORIZED length statistics: per-source p10/p90 clamping of
    // document length — the robust-statistics guard that stops a few
    // giant or empty documents from skewing per-domain dashboards. The
    // per-source rank is the DISTRIBUTED row number (PrefixSum
    // two-phase scan over a length-range bucketing — no per-source
    // single-task sort), the decile bounds are the exact
    // rank-ceil(n/10)/ceil(9n/10) rows (integral — no engine-specific
    // percentile interpolation), broadcast back; the clamp itself is a
    // pure projection feeding one final per-source hash-agg.
    "q_winsorize" -> ((s, d) => {
      val base = documents(s, d).select(col("source"), col("doc_id"),
        col("n_chars").cast("long").as("len"))
      val gb = broadcast(base.agg(min("len").as("glo"), max("len").as("ghi")))
      val ranked = PrefixSum.rowNumber(base.crossJoin(gb), Seq("source"),
        Seq(col("len"), col("doc_id")),
        PrefixSum.rangeBucket(col("len"), col("glo"), col("ghi"), 32), "rn")
      val counts = base.groupBy("source").agg(count(lit(1)).as("n"))
      val cuts = ranked.join(broadcast(counts), "source")
        .withColumn("is_lo", col("rn") === expr("(n + 9) div 10"))
        .withColumn("is_hi", col("rn") === expr("(9 * n + 9) div 10"))
        .filter(col("is_lo") || col("is_hi"))
        .groupBy("source")
        .agg(min(when(col("is_lo"), col("len"))).as("p10"),
          max(when(col("is_hi"), col("len"))).as("p90"))
      base.join(broadcast(cuts), "source")
        .withColumn("w_len", greatest(col("p10"), least(col("p90"), col("len"))))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("len").as("raw_sum"),
          sum("w_len").as("wins_sum"), min("p10").as("p10"), max("p90").as("p90"))
        .orderBy("source")
    }),

    // QUANTILE NORMALIZATION — map every doc's length to the GLOBAL
    // distribution's value at the same within-source quantile (the
    // batch-effect correction that makes per-source features
    // comparable before mixing). Exact rank form, no interpolation:
    // within-source rank r of n_s → the global value at rank
    // (r·N) div n_s. BOTH rankings are the two-phase distributed scan
    // (source is a coarse key; the global ranking has ONE key — the
    // worst straggler shape of all, which is precisely what the
    // bucketed scan exists for). The final lookup is an equi-join on
    // the target rank: rank keys are near-uniform by construction, so
    // it shuffles clean with no skew.
    "q_quantile_normalize" -> ((s, d) => {
      val base = documents(s, d).select(col("source"), col("doc_id"),
        col("n_chars").cast("long").as("len"))
      val gb = broadcast(base.agg(min("len").as("glo"), max("len").as("ghi"),
        count(lit(1)).as("n_all")))
      val bucket = PrefixSum.rangeBucket(col("len"), col("glo"), col("ghi"), 32)
      val ord = Seq(col("len"), col("doc_id"))
      val ranked = PrefixSum.rowNumber(base.crossJoin(gb), Seq("source"), ord,
        bucket, "rn")
      val counts = base.groupBy("source").agg(count(lit(1)).as("n_src"))
      val glob = PrefixSum.rowNumber(base.crossJoin(gb), Seq.empty, ord,
          bucket, "grank")
        .select(col("grank"), col("len").as("norm_len"))
      ranked.join(broadcast(counts), "source")
        .withColumn("grank", expr("rn * n_all div n_src"))
        .join(glob, "grank")
        .select(col("doc_id"), col("source"), col("len"), col("norm_len"))
        .orderBy("doc_id")
    }),

    // E10 CLASS-BALANCED OVERSAMPLING: every label upsampled to the
    // majority count by whole-row repetition — the imbalance fix
    // before classifier training. Copy `rep` of a row survives iff
    // (rep−1)·n_label + rank ≤ target, where rank is the DISTRIBUTED
    // per-label md5 row number (two-phase scan — labels are coarse
    // keys, exactly the straggler shape the scan removes): every label
    // lands on exactly `target` rows, the draw is deterministic and
    // hash-unbiased, and the repetition factor rides a broadcast
    // O(labels) plan table — the corpus is scanned once.
    "q_class_balance" -> ((s, d) => {
      val base = embeddings(s, d).select(col("vec_id"), col("label"))
      val counts = base.groupBy("label").agg(count(lit(1)).as("n_l"))
      val planned = counts
        .crossJoin(broadcast(counts.agg(max(col("n_l")).as("target"))))
        .withColumn("factor", expr("(target + n_l - 1) div n_l"))
      val withH = base.withColumn("h", md5(col("vec_id").cast("string")))
      val ranked = PrefixSum.rowNumber(withH, Seq("label"),
        Seq(col("h"), col("vec_id")), PrefixSum.hexBucket(col("h")), "rk")
      ranked.join(broadcast(planned), "label")
        .select(col("label"), col("vec_id"), col("rk"), col("n_l"), col("target"),
          explode(sequence(lit(1L), col("factor"))).as("rep"))
        .filter((col("rep") - 1) * col("n_l") + col("rk") <= col("target"))
        .select(col("label"), col("vec_id"), col("rep"))
        .orderBy("label", "vec_id", "rep")
    }),

    // E12 NULL IMPUTATION: per-source exact-median fill of a numeric
    // feature — the cleaning pass before any training join. The corpus
    // ships no nulls, so they are synthesized deterministically
    // (doc_id % 7 == 0; the q_convert_speed raw-column precedent — the
    // oracle recomputes the same rule) and the fill value is the EXACT
    // per-source lower median of surviving lengths via the distributed
    // two-phase rank (no single-task sort, no percentile-interpolation
    // ambiguity). Fill table is O(sources), broadcast back.
    "q_impute" -> ((s, d) => {
      val base = documents(s, d).select(col("source"), col("doc_id"),
        when(pmod(col("doc_id"), lit(7L)) === 0, lit(null))
          .otherwise(col("n_chars")).cast("long").as("len"))
      val present = base.filter(col("len").isNotNull)
      val gb = broadcast(present.agg(min("len").as("glo"), max("len").as("ghi")))
      val ranked = PrefixSum.rowNumber(present.crossJoin(gb), Seq("source"),
        Seq(col("len"), col("doc_id")),
        PrefixSum.rangeBucket(col("len"), col("glo"), col("ghi"), 32), "rn")
      val counts = present.groupBy("source").agg(count(lit(1)).as("n"))
      val med = ranked.join(broadcast(counts), "source")
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("source"), col("len").as("med"))
      base.join(broadcast(med), "source")
        .select(col("source"), col("doc_id"),
          coalesce(col("len"), col("med")).as("len_filled"),
          col("len").isNull.as("was_null"))
        .orderBy("source", "doc_id")
    }),

    // Corpus profile: the per-source dashboard row a curation run
    // starts and ends with — doc/token/vocabulary counts, exact-dup
    // count via content fingerprints, mean length in integer
    // micro-tokens. Two aggregations (per-doc stats; vocabulary),
    // each one shuffle on `source`.
    "q_corpus_stats" -> ((s, d) => {
      val toks = array_remove(split(lower(col("text")), " "), "")
      val perDoc = documents(s, d)
        .select(col("source"), col("doc_id"),
          size(toks).cast("long").as("n_toks"),
          md5(regexp_replace(lower(col("text")), "[^a-z0-9]", "")).as("fp"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_toks").as("n_tokens"),
          countDistinct("fp").as("n_unique_docs"))
      val vocab = documents(s, d)
        .select(col("source"), explode(toks).as("tk"))
        .groupBy("source").agg(countDistinct("tk").as("n_vocab"))
      perDoc.join(vocab, Seq("source"))
        .withColumn("mean_tokens_micro", expr("n_tokens * 1000000 div n_docs"))
        .withColumn("exact_dup_docs", col("n_docs") - col("n_unique_docs"))
        .select("source", "n_docs", "n_tokens", "n_vocab",
          "mean_tokens_micro", "n_unique_docs", "exact_dup_docs")
        .orderBy("source")
    }),

    // LENGTH-BUCKET PACKING REPORT — the pad-efficiency audit a
    // sequence-batching pipeline runs before training: documents
    // assigned to power-of-2 token-length buckets (the standard
    // length-grouped batching scheme), with per-bucket padding waste
    // in integral ppm (Σ(bucket − n_toks) over n_docs·bucket). A high
    // waste bucket means the ladder needs a finer rung there; the
    // whole report is one narrow projection + an 11-ary CASE + one
    // hash-agg — the flattest possible shape, and the bucket ladder is
    // a shared literal CASE so both engines bin identically.
    "q_length_buckets" -> ((s, d) => {
      val bucketCase =
        """case when n_toks <= 16 then 16 when n_toks <= 32 then 32
          |when n_toks <= 64 then 64 when n_toks <= 128 then 128
          |when n_toks <= 256 then 256 when n_toks <= 512 then 512
          |when n_toks <= 1024 then 1024 when n_toks <= 2048 then 2048
          |when n_toks <= 4096 then 4096 when n_toks <= 8192 then 8192
          |else 16384 end""".stripMargin
      documents(s, d)
        .select(size(expr("filter(split(lower(text), ' '), x -> x != '')"))
          .cast("long").as("n_toks"))
        .withColumn("bucket", expr(bucketCase).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"),
          sum(expr("bucket - n_toks")).as("pad_tokens"))
        .withColumn("pad_ppm",
          expr("pad_tokens * 1000000 div (n_docs * bucket)"))
        .select("bucket", "n_docs", "n_tokens", "pad_tokens", "pad_ppm")
        .orderBy("bucket")
    }),

    // POPULATION STABILITY INDEX — the drift score credit/ML monitoring
    // standardized on, computed per source against the REST of the
    // corpus over fixed doc-length bins: PSI = Σ_bins (p−q)·ln(p/q).
    // Laplace-smoothed bin counts keep every ln argument positive (the
    // convention that also keeps the NB likelihoods total), shares in
    // integral ppm, each ln quantized to ppm as a SINGLE term (the
    // conventions memo's allowed form), so psi_p12 = Σ (p_ppm −
    // q_ppm)·lr_ppm is an exact bigint in both engines. The bin domain
    // is FIXED (11 rungs of the n_chars ladder), so past the one
    // (source, bin) hash-agg everything is O(sources · 11).
    "q_psi_drift" -> ((s, d) => {
      val binCase =
        """case when n_chars <= 100 then 0 when n_chars <= 200 then 1
          |when n_chars <= 400 then 2 when n_chars <= 800 then 3
          |when n_chars <= 1600 then 4 when n_chars <= 3200 then 5
          |when n_chars <= 6400 then 6 when n_chars <= 12800 then 7
          |when n_chars <= 25600 then 8 when n_chars <= 51200 then 9
          |else 10 end""".stripMargin
      val binned = documents(s, d)
        .select(col("source"), expr(binCase).cast("long").as("bin"))
        .groupBy("source", "bin").agg(count(lit(1)).as("c"))
      // complete the (source × bin) grid so absent bins still
      // contribute their smoothed term on both sides
      val bins = broadcast(s.range(0, 11).select(col("id").as("bin")))
      val grid = binned.select("source").distinct()
        .crossJoin(bins)
        .join(binned, Seq("source", "bin"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
      val tot = grid.groupBy("source").agg(sum("c").as("n_s"))
        .crossJoin(broadcast(binned.agg(sum("c").as("n_all"))))
      val perBin = binned.groupBy("bin").agg(sum("c").as("c_all"))
      val rest = grid.join(broadcast(perBin), Seq("bin"), "left")
        .select(col("source"), col("bin"), col("c"),
          (coalesce(col("c_all"), lit(0L)) - col("c")).as("c_rest"))
      rest.join(tot, "source")
        .withColumn("p_ppm",
          expr("(c + 1) * 1000000 div (n_s + 11)"))
        .withColumn("q_ppm",
          expr("(c_rest + 1) * 1000000 div (n_all - n_s + 11)"))
        .withColumn("lr_ppm", expr(
          "cast(round(ln(cast(p_ppm as double) / q_ppm) * 1000000) as bigint)"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_bins"),
          sum(expr("(p_ppm - q_ppm) * lr_ppm")).as("psi_p12"))
        .orderBy("source")
    }),

    // SOURCE CURATION SCORECARD — the one-table answer to "which
    // sources do we keep": per source, the three cheap health signals
    // (type-token ratio, exact-duplicate share via content
    // fingerprint, majority-language share) folded into a composite
    // score and a global rank. The signals are each one hash-agg over
    // a narrow projection; the fold and rank run over the O(sources)
    // aggregate. Deliberately simple signals — the scorecard's job is
    // triage ordering, and every input is integral ppm so the rank is
    // engine-exact.
    "q_source_scorecard" -> ((s, d) => {
      val docs = documents(s, d)
      val ttr = docs
        .select(col("source"),
          explode(array_remove(split(lower(col("text")), " "), "")).as("tk"))
        .groupBy("source", "tk").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(expr("count(1) * 1000000 div sum(c)").as("ttr_ppm"))
      val dup = docs
        .select(col("source"),
          md5(regexp_replace(lower(col("text")), "[^a-z0-9]", "")).as("fp"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          expr("(count(1) - count(distinct fp)) * 1000000 div count(1)")
            .as("dup_ppm"))
      val maj = docs
        .withColumn("guess",
          when(col("text").contains(" the "), "en")
            .when(col("text").contains(" der "), "de")
            .when(col("text").contains(" le "), "fr")
            .otherwise("und"))
        .groupBy("source", "guess").agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(Window.partitionBy("source")
          .orderBy(col("n").desc, col("guess").asc)))
        .filter(col("rn") === 1)
        .join(docs.groupBy("source").agg(count(lit(1)).as("nd")), "source")
        .select(col("source"), expr("n * 1000000 div nd").as("maj_ppm"))
      val scored = ttr.join(dup, "source").join(maj, "source")
        .withColumn("score_ppm",
          expr("(ttr_ppm + (1000000 - dup_ppm) + maj_ppm) div 3"))
      scored.withColumn("rank", row_number().over(
          Window.orderBy(col("score_ppm").desc, col("source").asc))
          .cast("long"))
        .select("rank", "source", "n_docs", "ttr_ppm", "dup_ppm",
          "maj_ppm", "score_ppm")
        .orderBy("rank")
    }),

    // LEXICAL DIVERSITY — type-token ratio and hapax-legomenon share
    // per source: the boilerplate/template detector that needs no
    // model (a scraped-template source shows a TTR crater and a hapax
    // drought long before perplexity filters run). One explode + two
    // hash-aggs, all integral ppm.
    "q_lexical_diversity" -> ((s, d) => {
      val tf = documents(s, d)
        .select(col("source"),
          explode(array_remove(split(lower(col("text")), " "), "")).as("tk"))
        .groupBy("source", "tk").agg(count(lit(1)).as("c"))
      tf.groupBy("source")
        .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .withColumn("ttr_ppm", expr("n_types * 1000000 div n_tokens"))
        .withColumn("hapax_ppm", expr("n_hapax * 1000000 div n_types"))
        .select("source", "n_tokens", "n_types", "n_hapax",
          "ttr_ppm", "hapax_ppm")
        .orderBy("source")
    }),

    // DISTRIBUTION DRIFT between corpus snapshots — the monitoring op
    // a continuously-ingested corpus needs: per source, compare the
    // token distribution of the "old" and "new" halves (doc parity
    // stands in for two snapshot reads) via the cross-scaled L1
    // distance Σ_t |n_t·N_old − o_t·N_new| — the total-variation
    // numerator kept in EXACT integers (no ratios, no floats), plus
    // the most-drifted token per source (max over the (diff, token)
    // struct — deterministic ties). Shape: one explode + hash-agg on
    // (source, token), per-source totals broadcast back, one final
    // aggregation. Nothing wider than the vocabulary per source.
    // KOLMOGOROV–SMIRNOV drift statistic — the distribution-level
    // companion of the L1 vocabulary drift below: per source, compare
    // the old half (even doc_id) and new half of the doc-LENGTH
    // distribution by the max ECDF gap. All integral: at each length
    // value, D_scaled = |cum_old·n_new − cum_new·n_old| (the KS D
    // times n_old·n_new), maximized over values; ks_ppm divides back.
    // Shape note: the ECDF only needs PER-LENGTH counts, so the corpus
    // collapses through one (source, len) hash-aggregate BEFORE any
    // ordered scan — the running sums then window over the aggregate,
    // whose size is bounded by the length DOMAIN (not the corpus), so
    // the per-source window never holds more than O(distinct lengths)
    // rows at any data scale. (A first cut ran two chained two-phase
    // prefix sums over the raw rows instead: correct, but the chained
    // lineage rescanned the corpus ~6× and measured near-LINEAR, 0.82,
    // in the ×10 rehearsal — aggregate-first measures flat.)
    "q_ks_drift" -> ((s, d) => {
      val base = documents(s, d).select(col("source"),
        col("n_chars").cast("long").as("len"),
        (col("doc_id") % 2 === 0).as("is_old"))
      val counts = base.groupBy("source", "len").agg(
        sum(when(col("is_old"), 1L).otherwise(0L)).as("o"),
        sum(when(col("is_old"), 0L).otherwise(1L)).as("n"))
      val w = Window.partitionBy("source").orderBy("len")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = counts
        .withColumn("cum_o", sum("o").over(w))
        .withColumn("cum_n", sum("n").over(w))
      val tot = counts.groupBy("source")
        .agg(sum("o").as("n_old"), sum("n").as("n_new"))
      cum.join(broadcast(tot), "source")
        .groupBy("source")
        .agg(max("n_old").as("n_old"), max("n_new").as("n_new"),
          max(abs(col("cum_o") * col("n_new") - col("cum_n") * col("n_old")))
            .as("ks_scaled"))
        .withColumn("ks_ppm", expr("ks_scaled * 1000000 div (n_old * n_new)"))
        .orderBy("source")
    }),

    "q_source_drift" -> ((s, d) => {
      val toks = documents(s, d).select(col("source"),
        (col("doc_id") % 2 === 0).as("is_old"),
        explode(array_remove(split(lower(col("text")), " "), "")).as("tk"))
      val counts = toks.groupBy("source", "tk").agg(
        sum(when(col("is_old"), 1L).otherwise(0L)).as("o"),
        sum(when(!col("is_old"), 1L).otherwise(0L)).as("n"))
      val totals = counts.groupBy("source")
        .agg(sum("o").as("tokens_old"), sum("n").as("tokens_new"))
      counts.join(broadcast(totals), "source")
        .withColumn("diff",
          abs(col("n") * col("tokens_old") - col("o") * col("tokens_new")))
        .groupBy("source")
        .agg(max("tokens_old").as("tokens_old"),
          max("tokens_new").as("tokens_new"),
          count(lit(1)).as("n_vocab"),
          sum("diff").as("l1_scaled"),
          max(struct(col("diff"), col("tk"))).as("top"))
        .select(col("source"), col("tokens_old"), col("tokens_new"),
          col("n_vocab"), col("l1_scaled"),
          col("top.tk").as("top_token"), col("top.diff").as("top_drift"))
        .orderBy("source")
    }),

    // K-ANONYMITY AUDIT — the privacy-side counterpart of the PII
    // scrub: group documents by a quasi-identifier tuple (source,
    // lang, coarse size bin) and report, per (source, lang), how many
    // equivalence classes fall under k = 5 and how many documents a
    // suppression pass would redact. Everything integral; two
    // hash-aggregations (class sizes, then the per-(source, lang)
    // rollup), each one shuffle on its natural key.
    "q_k_anonymity" -> ((s, d) => {
      val k = 5
      documents(s, d)
        .select(col("source"), col("lang"),
          expr("n_chars div 200").as("size_bin"))
        .groupBy("source", "lang", "size_bin")
        .agg(count(lit(1)).as("n"))
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_classes"),
          sum(when(col("n") < k, 1L).otherwise(0L)).as("small_classes"),
          sum(when(col("n") < k, col("n")).otherwise(0L)).as("docs_suppressed"),
          sum(col("n")).as("docs_total"))
        .orderBy("source", "lang")
    }),

    // T-CLOSENESS — the third leg of the release-audit trio
    // (k-anonymity bounds re-identification, l-diversity bounds
    // attribute disclosure by COUNT, t-closeness bounds it by
    // DISTRIBUTION): per equivalence class (source, size_bin), the
    // total-variation distance between the class's sensitive-value
    // (lang) distribution and the corpus-wide one — for categorical
    // sensitives, EMD reduces to TV = ½·Σ_l |p_g(l) − p(l)|. Kept
    // EXACT in integers over the common denominator n_g·N:
    //   t = Σ_l |n_gl·N − n_l·n_g| / (2·n_g·N),
    // with absent-langs folding to the closed form (N − Σ_present n_l)·n_g
    // so no lang×class dense cross join is materialized. One
    // hash-aggregate over the data (cell counts); every later join
    // runs on the aggregate (≤ classes×langs rows) with the lang and
    // corpus totals broadcast — shape-invariant at 100 TB.
    "q_t_closeness" -> ((s, d) => {
      val cell = documents(s, d)
        .select(col("source"), expr("n_chars div 200").as("size_bin"),
          col("lang"))
        .groupBy("source", "size_bin", "lang")
        .agg(count(lit(1)).as("n_gl"))
      val g = cell.groupBy("source", "size_bin").agg(sum("n_gl").as("n_g"))
      val l = cell.groupBy("lang").agg(sum("n_gl").as("n_l"))
      val tot = cell.agg(sum("n_gl").as("n_total"))
      val grp = cell
        .join(broadcast(l), "lang")
        .join(g, Seq("source", "size_bin"))
        .crossJoin(broadcast(tot)) // 1-row aggregate probe
        .groupBy(col("source"), col("size_bin"), col("n_g"), col("n_total"))
        .agg(sum(abs(col("n_gl") * col("n_total") - col("n_l") * col("n_g")))
            .as("s_term"),
          sum(col("n_l")).as("s_nl"))
      grp
        .withColumn("t_micro",
          expr("(s_term + (n_total - s_nl) * n_g) * 1000000 div (2 * n_g * n_total)"))
        .select(col("source"), col("size_bin"), col("n_g"),
          col("t_micro"),
          (col("t_micro") > 300000).cast("long").as("breach"))
        .orderBy("source", "size_bin")
    }),

    // DETERMINISTIC POISSON BOOTSTRAP — the standard large-scale
    // bootstrap (resampling-by-weights, as in "a scalable bootstrap
    // for massive data"-style pipelines): replicate b assigns each
    // document an iid Poisson(1)-distributed integer weight, and the
    // spread of the 32 replicate means IS the sampling-error estimate
    // for the corpus mean — no second pass, no per-replicate shuffle
    // of the data. Weights come from md5(doc|b) against the exact
    // cumulative-Poisson integer thresholds (e^-1, 2e^-1, 2.5e^-1 of
    // 2^32, truncated at w=3), so both engines draw the identical
    // "randomness" and the whole statistic is oracle-gated. Scale:
    // the ×32 explode rides a 2-column projection and aggregates
    // immediately — partial (map-side) aggregation means the shuffle
    // carries 32 rows per partition, not 32× the corpus.
    "q_bootstrap_ci" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          explode(sequence(lit(0), lit(31))).as("b"))
        .withColumn("u",
          conv(substring(md5(concat_ws("|", col("doc_id"), col("b"))), 1, 8),
            16, 10).cast("long"))
        .withColumn("w",
          when(col("u") < 1580030168L, 0L)
            .when(col("u") < 3160060337L, 1L)
            .when(col("u") < 3950075421L, 2L).otherwise(3L))
        .groupBy("b")
        .agg(sum(col("w")).as("n_eff"),
          sum(col("w") * col("n_chars")).as("s_chars"))
        .select(col("b").cast("long").as("b"), col("n_eff"),
          expr("s_chars * 1000000 div n_eff").as("mean_micro"))
        .orderBy("b")),

    // RENDEZVOUS (highest-random-weight) SHARDING — the assignment
    // rule whose guarantee is MINIMAL MIGRATION: doc → argmax_k
    // md5(doc|k), so growing 8 → 9 shards moves only the docs whose
    // new shard wins the argmax, ≈ 1/9 of the corpus (a mod-N rehash
    // moves 8/9). The argmax rides the packed-BIGINT trick (key =
    // 56-bit hash·16 + k, one MAX per doc — no struct-ordering
    // semantics to reconcile cross-engine); both assignments and the
    // per-doc moved flag are exact and oracle-gated, and the ≈1/9
    // migration-rate guarantee itself is property-asserted in
    // OperatorsSpec. One explode (9 rows/doc over the doc-id
    // PROJECTION, not the text) → one doc-keyed hash-agg.
    "q_rendezvous_shards" -> ((s, d) =>
      documents(s, d).select(col("doc_id"),
          explode(sequence(lit(0), lit(8))).as("k"))
        .withColumn("key",
          conv(substring(md5(concat_ws("|", col("doc_id"), col("k"))), 1, 14), 16, 10)
            .cast("long") * 16 + col("k"))
        .groupBy("doc_id")
        .agg(max(when(col("k") < 8, col("key"))).as("k8"),
          max(col("key")).as("k9"))
        .select(col("doc_id"),
          pmod(col("k8"), lit(16L)).as("shard8"),
          pmod(col("k9"), lit(16L)).as("shard9"))
        .withColumn("moved", (col("shard8") =!= col("shard9")).cast("long"))
        .orderBy("doc_id")),

    // L-DIVERSITY AUDIT — the attribute-disclosure half of the privacy
    // pair: k-anonymity bounds re-identification, but a class whose
    // SENSITIVE attribute (lang, here) is homogeneous still discloses
    // it to anyone who can place a person in the class. Classes are
    // the q_k_anonymity quasi-identifier minus the sensitive column; a
    // class with < l = 2 distinct sensitive values is flagged and its
    // documents counted for suppression. Two hash-aggregates, each one
    // shuffle on its natural key — shape-invariant at scale.
    "q_l_diversity" -> ((s, d) =>
      documents(s, d)
        .select(col("source"), expr("n_chars div 200").as("size_bin"),
          col("lang"))
        .groupBy("source", "size_bin")
        .agg(countDistinct("lang").as("l_div"), count(lit(1)).as("n"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_classes"),
          min("l_div").as("min_diversity"),
          sum(when(col("l_div") < 2, 1L).otherwise(0L)).as("low_div_classes"),
          sum(when(col("l_div") < 2, col("n")).otherwise(0L)).as("docs_at_risk"))
        .orderBy("source")),

    // Composite keep/drop QUALITY FILTER with reason codes — the
    // decision op that actually writes the curated corpus. First
    // matching rule wins (too_short → boilerplate-ish chars/token →
    // no-stopword gibberish → keep); every rule is integral
    // (n_chars > 8·n_tokens, not a float ratio), so both engines
    // produce the identical verdict column. Pure projection: stays in
    // whole-stage codegen, only the output sort shuffles.
    "q_quality_filter" -> ((s, d) => {
      val toks = array_remove(split(lower(col("text")), " "), "")
      val stops = filter(toks, t => t.isInCollection(TextOps.stopwords))
      documents(s, d)
        .withColumn("n_tokens", size(toks).cast("long"))
        .withColumn("n_stop", size(stops).cast("long"))
        .withColumn("verdict",
          when(col("n_tokens") < 25, "drop:too_short")
            .when(col("n_chars") > col("n_tokens") * 8, "drop:long_tokens")
            .when(col("n_stop") === 0, "drop:no_stopwords")
            .otherwise("keep"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("n_stop"), col("verdict"))
        .orderBy("doc_id")
    }),

    // GOPHER-STYLE RULE PANEL — the per-rule health readout behind a
    // composite quality filter (complements q_quality_filter's single
    // verdict and q_filter_funnel's staged retention): five classic
    // pretraining-curation rules, each reported PER (source, rule) as
    // violation counts + ppm so a curator sees WHICH rule bites WHICH
    // source before composing thresholds. Rules: too-short (<25
    // tokens), mean-token-length outside [3,10] (milli), symbol share
    // >10% of non-space chars, <2 stopword hits, and top-token share
    // >20% (the repetition rule — the only one needing a second
    // hash-agg, on (doc, token)). One corpus scan + one token explode;
    // the unpivot is stack() over per-doc flags, and the report is a
    // (sources × 5)-row aggregate — shape-invariant at scale.
    "q_gopher_rules" -> ((s, d) => {
      val toks = array_remove(split(lower(col("text")), " "), "")
      val top = documents(s, d)
        .select(col("doc_id"), explode(toks).as("tk"))
        .groupBy("doc_id", "tk").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max("c").as("topc"))
      val flags = documents(s, d)
        .withColumn("n_words", size(toks).cast("long"))
        .withColumn("nonspace",
          length(regexp_replace(col("text"), " ", "")).cast("long"))
        .withColumn("letters",
          length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("long"))
        .withColumn("n_stop",
          size(filter(toks, t => t.isInCollection(TextOps.stopwords)))
            .cast("long"))
        .join(top, Seq("doc_id"), "left")
        .withColumn("mwl_milli",
          expr("nonspace * 1000 div greatest(n_words, 1)"))
        .withColumn("sym_ppm", expr(
          "(nonspace - letters) * 1000000 div greatest(nonspace, 1)"))
        .withColumn("top_ppm", expr(
          "coalesce(topc, CAST(0 AS BIGINT)) * 1000000 div greatest(n_words, 1)"))
        .selectExpr("source",
          """stack(5,
            'r1_short',      case when n_words < 25 then 1 else 0 end,
            'r2_word_len',   case when mwl_milli < 3000
                                    or mwl_milli > 10000 then 1 else 0 end,
            'r3_symbol',     case when sym_ppm > 100000 then 1 else 0 end,
            'r4_stopword',   case when n_stop < 2 then 1 else 0 end,
            'r5_repetition', case when top_ppm > 200000 then 1 else 0 end)
            as (rule, violate)""")
      flags.groupBy("source", "rule")
        .agg(count(lit(1)).as("n_docs"),
          sum("violate").cast("long").as("n_violations"))
        .withColumn("violation_ppm",
          expr("n_violations * 1000000 div n_docs"))
        .orderBy("source", "rule")
    }),

    // LEAVE-ONE-SOURCE-OUT ABLATION — "which source is dragging the
    // corpus down?": for each source, the quality profile of the
    // corpus WITHOUT it (keep rate under the q_quality_filter verdict,
    // lockstep thresholds; token volume) against the full corpus, so
    // the delta column reads directly as remove-this-source lift in
    // ppm. Additive metrics make the ablation FREE: one per-source
    // hash-agg + a broadcast 1-row total, complements by subtraction —
    // the corpus is scanned once no matter how many sources exist.
    "q_source_ablation" -> ((s, d) => {
      val toks = array_remove(split(lower(col("text")), " "), "")
      val stops = filter(toks, t => t.isInCollection(TextOps.stopwords))
      val docs = documents(s, d)
        .withColumn("n_tokens", size(toks).cast("long"))
        .withColumn("keep",
          when(col("n_tokens") >= 25 &&
            col("n_chars") <= col("n_tokens") * 8 &&
            size(stops) > 0, 1L).otherwise(0L))
      val bySrc = docs.groupBy("source")
        .agg(count(lit(1)).as("n"), sum("keep").as("k"),
          sum("n_tokens").as("tk"))
      val tot = broadcast(bySrc.agg(sum("n").as("tn"), sum("k").as("tkeep"),
        sum("tk").as("ttok")))
      bySrc.crossJoin(tot)
        .withColumn("full_keep_ppm", expr("tkeep * 1000000 div tn"))
        .withColumn("comp_keep_ppm", expr(
          "case when tn = n then null " +
            "else (tkeep - k) * 1000000 div (tn - n) end"))
        .withColumn("delta_ppm", expr(
          "case when tn = n then null " +
            "else (tkeep - k) * 1000000 div (tn - n) " +
            "   - tkeep * 1000000 div tn end"))
        .select(col("source"), col("n").as("n_docs_removed"),
          (col("ttok") - col("tk")).as("comp_tokens"),
          col("full_keep_ppm"), col("comp_keep_ppm"), col("delta_ppm"))
        .orderBy("source")
    }),

    // BENJAMINI–HOCHBERG FDR — the multiple-testing gate run before
    // anyone acts on "source X's quality differs": each source's
    // keep-rate (q_quality_filter verdict, lockstep) is two-proportion
    // z²-tested against the rest of the corpus, ranked, and stepped up
    // against the χ²(1) critical grid for α·k/m (α = 5%, m = 20, the
    // corpus's source fan-out; the grid is precomputed math constants,
    // the q_power_analysis 784 convention — for corpora with fewer
    // sources the m = 20 grid is conservative). Everything after the
    // one corpus scan is a ≤sources-row window + a broadcast 20-row
    // critical table.
    "q_bh_fdr" -> ((s, d) => {
      val toks = array_remove(split(lower(col("text")), " "), "")
      val stops = filter(toks, t => t.isInCollection(TextOps.stopwords))
      val docs = documents(s, d)
        .withColumn("nt", size(toks).cast("long"))
        .withColumn("keep",
          when(col("nt") >= 25 && col("n_chars") <= col("nt") * 8 &&
            size(stops) > 0, 1L).otherwise(0L))
      val bySrc = docs.groupBy("source")
        .agg(count(lit(1)).as("n1"), sum("keep").as("k1"))
      val tot = broadcast(bySrc.agg(sum("n1").as("tn"), sum("k1").as("tk")))
      val z = bySrc.crossJoin(tot)
        .withColumn("n2", col("tn") - col("n1"))
        .withColumn("k2", col("tk") - col("k1"))
        .withColumn("p1_ppm", expr("k1 * 1000000 div n1"))
        .withColumn("pp_ppm", expr("tk * 1000000 div tn"))
        // Round-8 ADVICE fix: the old denominator multiplied the pooled
        // variance by (1e6 div n1 + 1e6 div n2), whose reciprocals
        // floor to 0 for any source past 1e6 documents — z2 went NULL
        // and no source could ever be significant at scale. Factor the
        // statistic as z² = (diff²/v) · h instead: b = diff²·1000/v
        // and h = n1·n2/(n1+n2), the harmonic pair count (capped at
        // 9·10⁸ so b·h ≤ 9·10¹⁷ < 2⁶³ at any corpus size; a source
        // that big with any nonzero diff is saturated-significant
        // anyway, and the 10⁷-milli output cap ≡ z = 100 keeps rank
        // order deterministic on both engines).
        //
        // Round-9 ADVICE fixes, both mirrored in the DuckDB oracle and
        // spec-pinned against a double-precision z² reference
        // (OverflowGuardSpec "moderate effect"):
        //  - UNITS: diff is ppm so diff² is 10¹²-scale and b =
        //    diff²·1000/v_ppm is NANO z²-per-pair; b·h must divide by
        //    10⁶ (nano→milli), not 10³ — the old micro-scale value
        //    inflated z² 1000× and BH marked ~everything significant.
        //  - OVERFLOW: h = n1·n2/(n1+n2) wraps int64 once both sides
        //    pass ~3·10⁹ rows (Spark wraps silently, DuckDB raises —
        //    cross-engine divergence). Rewrite via mn = least(n1,n2):
        //    h = mn·mx/(mn+mx) = mn − ceil(mn²/tn) exactly (integer
        //    identity, ceil(b/c) = (b−1) div c + 1), and mn ≥ 1.8·10⁹
        //    forces h ≥ 9·10⁸ = the cap, so the squared term only
        //    evaluates when mn² ≤ 3.24·10¹⁸ < 2⁶³.
        .withColumn("v_ppm", expr("pp_ppm * (1000000 - pp_ppm) div 1000000"))
        .withColumn("hmean", expr(
          """case when n2 = 0 then null
            |when least(n1, n2) >= 1800000000L then 900000000L
            |else least(greatest(least(n1, n2)
            |  - ((least(n1, n2) * least(n1, n2) - 1) div tn + 1), 1),
            |  900000000) end""".stripMargin))
        .withColumn("z2_milli", expr(
          """case when hmean is null or v_ppm <= 0 then null
            |else least(least((k1 * 1000000 div n1 - k2 * 1000000 div n2)
            |     * (k1 * 1000000 div n1 - k2 * 1000000 div n2) * 1000
            |     div v_ppm, 1000000000)
            |     * hmean div 1000000, 10000000) end""".stripMargin))
      val crit = s.createDataFrame(Seq(
          (1L, 9141L), (2L, 7879L), (3L, 7149L), (4L, 6635L), (5L, 6239L),
          (6L, 5916L), (7L, 5646L), (8L, 5412L), (9L, 5207L), (10L, 5024L),
          (11L, 4859L), (12L, 4709L), (13L, 4572L), (14L, 4445L),
          (15L, 4328L), (16L, 4218L), (17L, 4115L), (18L, 4019L),
          (19L, 3928L), (20L, 3841L)))
        .toDF("rank", "crit_milli")
      val ranked = z
        .withColumn("rank", row_number().over(
          Window.orderBy(col("z2_milli").desc_nulls_last, col("source")))
          .cast("long"))
        .join(broadcast(crit), Seq("rank"), "left")
      val kmax = broadcast(ranked.agg(coalesce(
        max(when(col("z2_milli") >= col("crit_milli"), col("rank"))),
        lit(0L)).as("kmax")))
      ranked.crossJoin(kmax)
        .withColumn("significant", (col("rank") <= col("kmax")).cast("long"))
        .select("source", "n1", "k1", "p1_ppm", "z2_milli", "rank",
          "crit_milli", "significant")
        .orderBy("rank")
    }),

    // K-FOLD CROSS-VALIDATION ASSIGNMENT + stratification audit — the
    // split primitive evaluation pipelines need beyond one train/test
    // cut: every document lands in a deterministic md5-hash fold
    // (restartable, shard-order-independent — the q_split_leakage
    // convention), and the output is the per-(fold, lang) doc/token
    // balance sheet that tells you whether 5-fold metrics are
    // comparable before any model runs. Pure projection + one
    // hash-agg on (fold, lang) — shape-invariant at scale.
    "q_crossval_folds" -> ((s, d) =>
      documents(s, d)
        .withColumn("fold",
          pmod(conv(substring(md5(concat(lit("cv|"),
            col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"), lit(5L)))
        .withColumn("n_tokens",
          size(array_remove(split(lower(col("text")), " "), "")).cast("long"))
        .groupBy("fold", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
        .orderBy("fold", "lang")),

    // LEAVE-ONE-OUT TARGET ENCODING — the classic high-cardinality
    // categorical feature: each row's `source` is encoded as the
    // smoothed mean of the target over the OTHER rows of its source
    // ((Σ_src y − y_self + m·global_mean) / (n_src − 1 + m), m = 10),
    // which is what prevents the encode-then-train leakage a plain
    // group mean causes. All aggregates are integral sums; the
    // per-row encode is ONE deterministic FP expression (identical
    // operand order in both engines), rounded 4. Shape: one source
    // aggregation broadcast back + a 1-row global — corpus scanned
    // twice, never shuffled on anything wider than `source`.
    "q_target_encoding" -> ((s, d) => {
      val docs = documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("y"))
      val g = broadcast(docs.agg(sum("y").as("gsum"), count(lit(1)).as("gn")))
      val st = docs.groupBy("source").agg(sum("y").as("ssum"), count(lit(1)).as("sn"))
      docs.join(broadcast(st), "source").join(g)
        .select(col("doc_id"), col("source"),
          round((col("ssum") - col("y") + lit(10.0) * col("gsum") / col("gn")) /
            (col("sn") - 1 + lit(10.0)), 4).as("te_loo"))
        .orderBy("doc_id")
    }),

    // PAIRWISE SOURCE VOCABULARY OVERLAP — Jaccard between each source
    // pair's token vocabularies: the corpus-composition diagnostic that
    // catches two "different" scrapes of the same site before mixture
    // weights are chosen. The join is on TOKEN over the (source, token)
    // vocabulary projection — fan-out per token is at most sources²,
    // and the vocabulary is sublinear in the corpus, so the pair table
    // never scales with raw data volume. Jaccard via |A|+|B|−|A∩B|
    // (one count per source, one per pair — no union materialized).
    "q_source_overlap" -> ((s, d) => {
      val v = documents(s, d)
        .select(col("source"),
          explode(array_distinct(array_remove(split(lower(col("text")), " "), "")))
            .as("token"))
        .distinct()
      val sizes = v.groupBy("source").agg(count(lit(1)).as("sz"))
      v.select(col("source").as("s1"), col("token"))
        .join(v.select(col("source").as("s2"), col("token")), "token")
        .filter(col("s1") < col("s2"))
        .groupBy("s1", "s2").agg(count(lit(1)).as("inter"))
        .join(broadcast(sizes.select(col("source").as("s1"), col("sz").as("sz1"))), "s1")
        .join(broadcast(sizes.select(col("source").as("s2"), col("sz").as("sz2"))), "s2")
        .select(col("s1"), col("s2"), col("inter"), col("sz1"), col("sz2"),
          round(col("inter").cast("double") /
            (col("sz1") + col("sz2") - col("inter")), 4).as("jaccard"))
        .orderBy("s1", "s2")
    }),

    // TEMPERATURE-MIXED BUDGET ALLOCATION — the mixture-weights table a
    // training config consumes: source weights ∝ n^(1/2) (temperature
    // 2 up-weights small sources relative to proportional sampling),
    // then a fixed token budget split by LARGEST-REMAINDER apportionment
    // so the integral allocations sum EXACTLY to the budget (floor-only
    // truncation would silently under-allocate by up to |sources|-1).
    // All integral: floor(sqrt(n)) is exact in both engines (IEEE sqrt
    // is correctly rounded), and the remainder ranking is bigint mod.
    // The whole query is one O(sources) aggregate — the corpus is
    // touched once for counts; the apportionment window runs over the
    // source DIMENSION (O(1) rows), never the data.
    "q_temperature_mix" -> ((s, d) => {
      val budget = 1000000L
      val counts = documents(s, d).groupBy("source")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("w", floor(sqrt(col("n_docs"))).cast("long"))
      val tot = broadcast(counts.agg(sum("w").as("tot_w")))
      val sized = counts.crossJoin(tot)
        .withColumn("alloc_floor", expr(s"$budget * w div tot_w"))
        .withColumn("rem", expr(s"($budget * w) % tot_w"))
      val deficit = broadcast(sized.agg(
        (lit(budget) - sum("alloc_floor")).as("r")))
      val wr = Window.orderBy(col("rem").desc, col("source").asc)
      sized.withColumn("rr", row_number().over(wr)).crossJoin(deficit)
        .withColumn("alloc",
          col("alloc_floor") + when(col("rr") <= col("r"), 1L).otherwise(0L))
        .withColumn("weight_ppm", expr("w * 1000000 div tot_w"))
        .select("source", "n_docs", "w", "weight_ppm", "alloc")
        .orderBy("source")
    }),

    // MIXTURE ENTROPY — what the √n temperature actually buys: Shannon
    // entropy (micro-nats) and Pielou evenness of the source
    // distribution under proportional weights vs under
    // q_temperature_mix's √n weights, in one row. Evenness moving
    // toward 1e6 is the point of temperature sampling; this is the
    // metric that justifies (or refutes) the temperature choice
    // before a training run commits to it. Each −p·ln p term is
    // quantized to micro-nats BEFORE the sum (the naive_bayes bigint
    // order-independence rule); the whole query is one O(sources)
    // aggregate off one corpus-count scan. ln(S)=0 single-source
    // degenerate NULL-guarded on both engines.
    "q_mix_entropy" -> ((s, d) => {
      val counts = documents(s, d).groupBy("source")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("w", floor(sqrt(col("n_docs"))).cast("long"))
      val tot = broadcast(counts.agg(sum("n_docs").as("nn"),
        sum("w").as("tw"), count(lit(1)).as("n_sources")))
      counts.crossJoin(tot)
        .select(col("n_sources"),
          expr("""cast(round(-(cast(n_docs as double) / nn)
                 * ln(cast(n_docs as double) / nn) * 1000000) as bigint)""")
            .as("tb"),
          expr("""cast(round(-(cast(w as double) / tw)
                 * ln(cast(w as double) / tw) * 1000000) as bigint)""")
            .as("ta"))
        .groupBy("n_sources")
        .agg(sum("tb").as("h_before_micro"), sum("ta").as("h_after_micro"))
        .withColumn("ln_s_micro",
          expr("cast(round(ln(cast(n_sources as double)) * 1000000) as bigint)"))
        .withColumn("evenness_before_ppm", expr(
          """case when ln_s_micro = 0 then null
            |else h_before_micro * 1000000 div ln_s_micro end""".stripMargin))
        .withColumn("evenness_after_ppm", expr(
          """case when ln_s_micro = 0 then null
            |else h_after_micro * 1000000 div ln_s_micro end""".stripMargin))
        .select("n_sources", "h_before_micro", "h_after_micro", "ln_s_micro",
          "evenness_before_ppm", "evenness_after_ppm")
    }),

    // JENSEN-SHANNON DIVERGENCE — pairwise distance between sources'
    // token distributions (symmetric, bounded [0, ln 2] — the
    // distribution-drift complement of q_ks_drift's numeric test and
    // q_source_overlap's set view). Each per-token contribution is
    // QUANTIZED to nano-nats before summing, so the pair total is an
    // exact bigint — order-independent across partitions and engines
    // (the q_naive_bayes rule). The grid is source-pairs × union
    // vocabulary: pairs are O(sources²) broadcasts and the vocabulary
    // is corpus-sublinear, so the whole eval never touches raw docs
    // after the one (source, token) hash-agg.
    "q_js_divergence" -> ((s, d) => {
      val tf = documents(s, d)
        .select(col("source"), explode(split(lower(col("text")), " ")).as("tk"))
        .filter(col("tk") =!= "")
        .groupBy("source", "tk").agg(count(lit(1)).as("c"))
        .localCheckpoint() // feeds totals, both join legs and the vocab
      val tot = tf.groupBy("source").agg(sum("c").as("n"))
      val pairs = tot.select(col("source").as("s1"), col("n").as("n1"))
        .crossJoin(tot.select(col("source").as("s2"), col("n").as("n2")))
        .filter(col("s1") < col("s2"))
      val grid = broadcast(pairs)
        .crossJoin(tf.select("tk").distinct())
        .join(tf.select(col("source").as("s1"), col("tk"), col("c").as("c1")),
          Seq("s1", "tk"), "left")
        .join(tf.select(col("source").as("s2"), col("tk"), col("c").as("c2")),
          Seq("s2", "tk"), "left")
        .withColumn("c1", coalesce(col("c1"), lit(0L)))
        .withColumn("c2", coalesce(col("c2"), lit(0L)))
        .filter(col("c1") + col("c2") > 0)
      grid.withColumn("term_nano", expr(
          """cast(round((
            |  case when c1 > 0 then (cast(c1 as double) / n1) *
            |    ln((cast(c1 as double) / n1) /
            |       ((cast(c1 as double) / n1 + cast(c2 as double) / n2) / 2))
            |  else 0.0 end +
            |  case when c2 > 0 then (cast(c2 as double) / n2) *
            |    ln((cast(c2 as double) / n2) /
            |       ((cast(c1 as double) / n1 + cast(c2 as double) / n2) / 2))
            |  else 0.0 end) / 2 * 1000000000.0) as bigint)""".stripMargin))
        .groupBy("s1", "s2", "n1", "n2")
        .agg(sum("term_nano").as("jsd_nano"))
        .select(col("s1"), col("s2"), col("n1"), col("n2"), col("jsd_nano"))
        .orderBy("s1", "s2")
    }),

    // DATASET CARD — the one-row datasheet a corpus release ships:
    // volume (docs/tokens/vocab), composition (sources, langs, lang
    // entropy), and hygiene headlines (exact-dup ppm via md5-text
    // identity, short-doc ppm at the q_quality_filter threshold).
    // Everything integral except the lang entropy (count-only form,
    // quantized to milli-nats). Three shared-scan aggregates (doc
    // stats, vocab, lang histogram) joined as 1-row broadcasts — the
    // whole card costs two corpus scans regardless of size.
    "q_dataset_card" -> ((s, d) => {
      val t = documents(s, d).select(col("doc_id"), col("lang"), col("source"),
        md5(col("text")).as("h"),
        size(expr("filter(split(lower(text), ' '), x -> x != '')"))
          .cast("long").as("n_toks"))
      val base = t.agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("h")).as("n_unique_texts"),
        sum("n_toks").as("total_tokens"),
        sum(when(col("n_toks") < 25, 1L).otherwise(0L)).as("n_short"))
      val vocab = documents(s, d)
        .select(explode(split(lower(col("text")), " ")).as("tk"))
        .filter(col("tk") =!= "")
        .agg(countDistinct(col("tk")).as("vocab"))
      val langH = t.groupBy("lang").agg(count(lit(1)).as("c"))
        .agg(sum("c").as("n"),
          sum(col("c").cast("double") * log(col("c").cast("double"))).as("s"))
        .select(round((log(col("n").cast("double")) - col("s") / col("n")) * 1000)
          .cast("long").as("lang_entropy_milli"))
      base.crossJoin(broadcast(vocab)).crossJoin(broadcast(langH))
        .select(col("n_docs"), col("n_sources"), col("n_langs"),
          col("total_tokens"), col("vocab"),
          expr("total_tokens div n_docs").as("mean_doc_tokens"),
          expr("(n_docs - n_unique_texts) * 1000000 div n_docs").as("exact_dup_ppm"),
          expr("n_short * 1000000 div n_docs").as("short_docs_ppm"),
          col("lang_entropy_milli"))
    }),

    // MANN-WHITNEY U — the nonparametric two-sample location test
    // (does one half of the corpus run longer documents?), computed
    // from EXACT global ranks via the two-phase distributed scan — no
    // single-task sort at any corpus size. Ranks are made unique with
    // the (n_chars, doc_id) tie-break, so this is the deterministic
    // tie-broken U (documented variant — the classical mid-rank
    // correction needs fractional ranks; the tie-break keeps every
    // quantity bigint and both engines identical). z² in integral
    // milli with the divisions in ONE documented operand order (the
    // q_chi2_features rule) to stay inside bigint.
    "q_mann_whitney" -> ((s, d) => {
      val docs = documents(s, d).select(col("doc_id"), col("n_chars"),
        pmod(col("doc_id"), lit(2L)).as("cohort"))
      val b = broadcast(docs.agg(min("n_chars").as("lo"), max("n_chars").as("hi")))
      val ranked = PrefixSum.rowNumber(docs.crossJoin(b), Seq.empty,
        Seq(col("n_chars"), col("doc_id")),
        PrefixSum.rangeBucket(col("n_chars"), col("lo"), col("hi"), 32), "rk")
      ranked.groupBy("cohort")
        .agg(count(lit(1)).as("n"), sum("rk").as("r"))
        .agg(max(when(col("cohort") === 0, col("n"))).as("n1"),
          max(when(col("cohort") === 0, col("r"))).as("r1"),
          max(when(col("cohort") === 1, col("n"))).as("n2"))
        .withColumn("u1", expr("r1 - n1 * (n1 + 1) div 2"))
        .withColumn("z2_milli", expr(
          """((2 * u1 - n1 * n2) * (2 * u1 - n1 * n2) div (n1 * n2)) * 3000
            |div (n1 + n2 + 1)""".stripMargin))
        .select("n1", "n2", "r1", "u1", "z2_milli")
    }),

    // T5-STYLE SPAN CORRUPTION — the training-objective mask table: per
    // doc, ~5% of token positions start a 3-token masked span, placed
    // by md5-derived offsets inside disjoint stride buckets (span i
    // lives in [i·stride, (i+1)·stride), offset ≤ stride−3), so spans
    // PROVABLY never overlap without any interval join — the property
    // that lets a loader apply masks independently per span. Pure key
    // arithmetic end to end (deterministic, cross-engine exact, and
    // reproducible per epoch by salting the hash). One narrow
    // projection + a ≤ n/20-wide explode; nothing shuffles but the
    // output sort.
    "q_span_corruption" -> ((s, d) => {
      val docs = documents(s, d)
        .select(col("doc_id"),
          size(expr("filter(split(lower(text), ' '), x -> x != '')"))
            .cast("long").as("n_tokens"))
        .filter(col("n_tokens") >= 4)
        .withColumn("k", greatest(lit(1L), expr("n_tokens div 20")))
        .withColumn("stride", expr("n_tokens div k"))
      docs.select(col("doc_id"), col("n_tokens"), col("stride"),
          explode(expr("sequence(0L, k - 1)")).as("span_id"))
        .withColumn("h",
          conv(substring(md5(concat(lit("span|"), col("doc_id"),
            lit("|"), col("span_id"))), 1, 8), 16, 10).cast("long"))
        .withColumn("start_tok", col("span_id") * col("stride") +
          pmod(col("h"), greatest(lit(1L), col("stride") - 2)))
        .withColumn("span_len",
          least(lit(3L), col("n_tokens") - col("start_tok")))
        .select("doc_id", "n_tokens", "span_id", "start_tok", "span_len")
        .orderBy("doc_id", "span_id")
    }),

    // RANDOMIZED RESPONSE — the local-differential-privacy collection
    // primitive: each user reports their sensitive bit truthfully with
    // p = 3/4, otherwise reports a fixed coin — and the aggregate
    // debiases back to an unbiased rate estimate t̂ = (8·yes − n)/(6·n).
    // Both coins are md5-derived (portable across engines), the truth
    // bit is key arithmetic, and the estimator is pure bigint — the
    // privacy mechanism AND its calibration error are oracle-exact.
    // One narrow projection + one aggregate; nothing per-user survives
    // the query, which is the point of the mechanism.
    "q_randomized_response" -> ((s, d) => {
      val users = events(s, d).select(col("user_id")).distinct()
        .withColumn("t", (col("user_id") % 3 === 0).cast("long"))
        .withColumn("h",
          conv(substring(md5(concat(lit("rr|"), col("user_id"))), 1, 8), 16, 10)
            .cast("long"))
        .withColumn("report",
          when(col("h") % 4 < 3, col("t")).otherwise((expr("h div 4") % 2)))
      users.agg(
          count(lit(1)).as("n"),
          sum("t").as("n_true"),
          sum("report").as("n_yes"))
        .withColumn("actual_ppm", expr("n_true * 1000000 div n"))
        .withColumn("est_ppm", expr("(8 * n_yes - n) * 1000000 div (6 * n)"))
        .withColumn("abs_err_ppm", abs(col("est_ppm") - col("actual_ppm")))
        .select("n", "n_true", "n_yes", "actual_ppm", "est_ppm", "abs_err_ppm")
    }),

    // DP HISTOGRAM (geometric mechanism) — per-source document counts
    // released under the discrete-Laplace/geometric mechanism with
    // p = 1/2 (ε = ln 2): P(Z = z) = (1/3)·2^{−|z|}, the central-DP
    // companion to q_randomized_response's local mechanism. The noise
    // draw is EXACT inverse-CDF on a deterministic md5 uniform — every
    // threshold is a dyadic rational over the 3·2²⁰ lattice (see
    // [[dlapCase]], shared verbatim with the oracle), so no engine
    // ever touches a float; tails beyond |z| = 8 (mass 2⁻¹⁸) fold to
    // 0. Truthful n, noise, clamped release, and per-source L1 error
    // in one O(sources) aggregate over a single corpus scan.
    "q_dp_histogram" -> ((s, d) =>
      documents(s, d).groupBy("source").agg(count(lit(1)).as("n_docs"))
        .withColumn("u",
          conv(substring(md5(concat(lit("dp|"), col("source"))), 1, 8), 16, 10)
            .cast("long") % 3145728)
        .withColumn("noise", expr(dlapCase).cast("long"))
        .withColumn("noisy_n", greatest(col("n_docs") + col("noise"), lit(0L)))
        .withColumn("abs_err", abs(col("noisy_n") - col("n_docs")))
        .select("source", "n_docs", "noise", "noisy_n", "abs_err")
        .orderBy("source")),

    // REJECTION SAMPLING TO A TARGET MIX — flatten the source
    // distribution by per-document hash acceptance: source s keeps
    // each doc with p = min(1, uniform-share / actual-share), the
    // one-pass streaming alternative to q_mix_materialize's exact
    // prefix-sum take (no ranking, no budget state — each doc decides
    // from its own hash, so the filter pushes into any scan and
    // parallelizes embarrassingly; the price is binomial wobble,
    // which the realized-vs-target gap column REPORTS). Acceptance
    // thresholds are exact integral ppm; the md5 uniform is the
    // q_randomized_response lattice. Two corpus scans: one to the
    // O(sources) share table (broadcast back), one filtered fold.
    "q_rejection_sampling" -> ((s, d) => {
      val src = documents(s, d).groupBy("source").agg(count(lit(1)).as("n_docs"))
      val tot = broadcast(src.agg(sum("n_docs").as("big_n"),
        count(lit(1)).as("k")))
      val p = broadcast(src.crossJoin(tot)
        .withColumn("p_accept_ppm",
          least(lit(1000000L), expr("big_n * 1000000 div (k * n_docs)"))))
      val acc = documents(s, d).select(col("doc_id"), col("source"))
        .withColumn("u",
          conv(substring(md5(concat(lit("rs|"), col("doc_id"))), 1, 8), 16, 10)
            .cast("long") % 1000000)
        .join(p.select(col("source"), col("p_accept_ppm")), "source")
        .filter(col("u") < col("p_accept_ppm"))
        .groupBy("source").agg(count(lit(1)).as("n_accepted"))
      val tota = broadcast(acc.agg(sum("n_accepted").as("tot_acc")))
      p.join(acc, Seq("source"), "left")
        .withColumn("n_accepted", coalesce(col("n_accepted"), lit(0L)))
        .crossJoin(tota)
        .select(col("source"), col("n_docs"), col("p_accept_ppm"),
          col("n_accepted"),
          expr("n_accepted * 1000000 div tot_acc").as("realized_ppm"),
          expr("1000000 div k").as("target_ppm"),
          expr("abs(n_accepted * 1000000 div tot_acc - 1000000 div k)")
            .as("gap_ppm"))
        .orderBy("source")
    }),

    // SFT PAIR CONSTRUCTION — the fine-tuning prep stage: split each
    // document at its token midpoint into a (prompt, continuation)
    // pair — the causal-continuation construction used when a corpus
    // carries no instruction markup (this one is punctuation-free) —
    // drop docs too short to yield both halves, and profile the pairs
    // per source: counts, mean prompt/completion token lengths, and
    // the share fitting a 128-token completion cap (the budget
    // question a fine-tune run asks before packing). Integral token
    // arithmetic only. One scan, one O(sources) hash-agg.
    "q_sft_pairs" -> ((s, d) =>
      documents(s, d)
        .withColumn("n_toks",
          size(expr("filter(split(lower(text), ' '), x -> x != '')"))
            .cast("long"))
        .filter(col("n_toks") >= 2)
        .withColumn("p_toks", expr("n_toks div 2"))
        .withColumn("c_toks", col("n_toks") - col("p_toks"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_pairs"),
          sum("p_toks").as("sum_prompt_toks"),
          sum("c_toks").as("sum_completion_toks"),
          sum(when(col("c_toks") <= 128, 1L).otherwise(0L)).as("n_fit"))
        .withColumn("mean_prompt_toks", expr("sum_prompt_toks div n_pairs"))
        .withColumn("mean_completion_toks",
          expr("sum_completion_toks div n_pairs"))
        .withColumn("fit_ppm", expr("n_fit * 1000000 div n_pairs"))
        .select("source", "n_pairs", "mean_prompt_toks",
          "mean_completion_toks", "n_fit", "fit_ppm")
        .orderBy("source")),

    // CURATION FUNNEL — the stage-by-stage attrition table behind
    // q_quality_filter's verdicts: how many documents survive each
    // NESTED filter stage (length → char/token ratio → stopword →
    // known language), with per-stage retention vs the raw corpus and
    // drop rate vs the previous stage — the chart every data-curation
    // review opens with (q_curation_pipeline composes a KEEP set;
    // this reports WHERE the losses happen). One corpus scan folds
    // each doc to its deepest-stage ordinal; everything after runs on
    // the 5-row stage table. Same thresholds as q_quality_filter so
    // the funnel and the verdicts can never disagree.
    "q_filter_funnel" -> ((s, d) => {
      val toksC = array_remove(split(lower(col("text")), " "), "")
      val p1 = col("n_tokens") >= 25
      val p2 = p1 && col("n_chars") <= col("n_tokens") * 8
      val p3 = p2 && col("n_stop") > 0
      val p4 = p3 && col("lang") =!= "und"
      val st = documents(s, d)
        .withColumn("n_tokens", size(toksC).cast("long"))
        .withColumn("n_stop", size(filter(toksC, t =>
          t.isInCollection(TextOps.stopwords))).cast("long"))
        .select((when(p1, 1L).otherwise(0L) + when(p2, 1L).otherwise(0L) +
          when(p3, 1L).otherwise(0L) + when(p4, 1L).otherwise(0L))
          .as("stage_reached"))
      val bys = st.groupBy("stage_reached").agg(count(lit(1)).as("n"))
      val stages = broadcast(s.range(0, 5).select(col("id").as("stage")))
      val cum = stages.join(bys, col("stage_reached") >= col("stage"), "left")
        .groupBy("stage").agg(coalesce(sum("n"), lit(0L)).as("n_docs"))
        .localCheckpoint() // 5 rows; read as current, previous and total
      val tot = broadcast(cum.filter(col("stage") === 0)
        .select(col("n_docs").as("n0")))
      val prev = cum.select((col("stage") + 1).as("stage"),
        col("n_docs").as("prev_docs"))
      cum.join(prev, Seq("stage"), "left").crossJoin(tot)
        .withColumn("stage_name", expr(
          """case stage when 0 then 'all' when 1 then 'min_length'
            |when 2 then 'char_ratio' when 3 then 'stopword'
            |else 'lang_known' end""".stripMargin))
        .select(col("stage"), col("stage_name"), col("n_docs"),
          expr("case when n0 = 0 then null else n_docs * 1000000 div n0 end")
            .as("retained_ppm"),
          expr("""case when prev_docs is null or prev_docs = 0 then null
                 |else (prev_docs - n_docs) * 1000000 div prev_docs end"""
            .stripMargin).as("dropped_ppm"))
        .orderBy("stage")
    }))

  /** Exact inverse-CDF of the two-sided geometric distribution with
    * p = 1/2 over a uniform u ∈ [0, 3·2²⁰): P(0) = 1/3 (the first
    * 2²⁰ lattice points), then ±k alternating with width 2^{20−k}
    * each for k = 1..8; the 2¹³-point residue returns 0. One CASE
    * string, generated once and shared by the Spark expr AND the
    * DuckDB oracle so the thresholds cannot drift. */
  private lazy val dlapCase: String = {
    val buf = new StringBuilder("case when u < 1048576 then 0")
    var c = 1048576L
    for (k <- 1 to 8) {
      val w = 1048576L >> k
      c += w; buf ++= s" when u < $c then $k"
      c += w; buf ++= s" when u < $c then -$k"
    }
    buf ++= " else 0 end"
    buf.toString
  }

  val oracle: Map[String, String] = Map(
    "q_crossval_folds" ->
      """WITH f AS (
        |  SELECT CAST(('0x' || substr(md5('cv|' || doc_id), 1, 8)) AS BIGINT) % 5 AS fold,
        |    lang,
        |    len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS n_tokens
        |  FROM documents)
        |SELECT fold, lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        |FROM f GROUP BY fold, lang ORDER BY fold, lang""".stripMargin,

    "q_target_encoding" ->
      """WITH d AS (
        |  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS y FROM documents),
        |g AS (SELECT CAST(SUM(y) AS BIGINT) AS gsum, COUNT(*) AS gn FROM d),
        |st AS (SELECT source, CAST(SUM(y) AS BIGINT) AS ssum, COUNT(*) AS sn
        |       FROM d GROUP BY source)
        |SELECT d.doc_id, d.source,
        |  ROUND((st.ssum - d.y + 10.0 * g.gsum / g.gn) / (st.sn - 1 + 10.0), 4)
        |    AS te_loo
        |FROM d JOIN st USING (source) CROSS JOIN g
        |ORDER BY d.doc_id""".stripMargin,

    "q_source_overlap" ->
      """WITH v AS (
        |  SELECT DISTINCT source, tk AS token FROM (
        |    SELECT source, unnest(string_split(lower(text), ' ')) AS tk FROM documents)
        |  WHERE tk <> ''),
        |sz AS (SELECT source, COUNT(*) AS sz FROM v GROUP BY source),
        |pairs AS (
        |  SELECT a.source AS s1, b.source AS s2, COUNT(*) AS inter
        |  FROM v a JOIN v b ON a.token = b.token AND a.source < b.source
        |  GROUP BY a.source, b.source)
        |SELECT p.s1, p.s2, p.inter, z1.sz AS sz1, z2.sz AS sz2,
        |  ROUND(CAST(p.inter AS DOUBLE) / (z1.sz + z2.sz - p.inter), 4) AS jaccard
        |FROM pairs p JOIN sz z1 ON z1.source = p.s1 JOIN sz z2 ON z2.source = p.s2
        |ORDER BY p.s1, p.s2""".stripMargin,

    "q_epoch_shuffle" ->
      """WITH keyed AS (
        |  SELECT doc_id, md5('epoch7|' || doc_id) AS shuffle_key
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, shuffle_key,
        |    row_number() OVER (ORDER BY shuffle_key, doc_id) AS epoch_pos
        |  FROM keyed)
        |SELECT doc_id, shuffle_key, epoch_pos, (epoch_pos - 1) % 8 AS shard
        |FROM pos ORDER BY epoch_pos""".stripMargin,

    "q_pii_scrub" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    'Contact user' || doc_id || '@Example.COM or +1-555-' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
        |    ' ip=10.' || (doc_id % 256) || '.0.' || ((doc_id * 7) % 256) ||
        |    ' :: ' || text AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(raw, '\+?1-555-[0-9]{4}')) AS BIGINT) AS n_phone,
        |  CAST(len(regexp_extract_all(raw, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ip,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\+?1-555-[0-9]{4}', '<PHONE>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS clean
        |FROM raw ORDER BY doc_id""".stripMargin,

    // positional recomputation: every (doc, 1-based offset, term)
    // substring equality — counts OVERLAPPING occurrences exactly as
    // the automaton does (replace()-based counting would not), and the
    // end-position sum checks placement, not just multiplicity
    "q_blocklist_scrub" ->
      """WITH terms(term) AS (
        |  SELECT * FROM (VALUES ('table'), ('tab'), ('ab'), (' a '),
        |    ('scan'), ('an'), ('value'), ('alu'), ('fast table'),
        |    ('batch')) v(term)),
        |docs AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |pos AS (
        |  -- the range bound must exceed the longest document (driver
        |  -- corpora max out under 600 chars; 8k leaves 13x headroom —
        |  -- a longer regeneration would undercount HERE, not in the
        |  -- operator, and fail the compare loudly)
        |  SELECT d.doc_id, d.text, r.i
        |  FROM docs d, range(1, 8001) r(i) WHERE r.i <= d.n),
        |hits AS (
        |  SELECT p.doc_id, t.term, p.i + length(t.term) - 1 AS e
        |  FROM pos p CROSS JOIN terms t
        |  WHERE substr(p.text, p.i, length(t.term)) = t.term)
        |SELECT doc_id, term, COUNT(*) AS n_hits,
        |  CAST(SUM(e) AS BIGINT) AS end_checksum
        |FROM hits GROUP BY doc_id, term ORDER BY doc_id, term""".stripMargin,

    // closed-form member names/text: a central-directory misparse, a
    // CRC false-drop, or an inflate defect changes rows or content
    "q_zip_extract" ->
      """WITH docs AS (SELECT doc_id FROM documents),
        |m AS (
        |  SELECT doc_id, r.j,
        |    'doc_' || doc_id || '_' || r.j || '.txt' AS name,
        |    'payload ' || doc_id || ' ' || r.j || ' ' ||
        |      repeat('ab', CAST(1 + (doc_id + r.j) % 7 AS INTEGER)) AS content,
        |    (doc_id + r.j) % 2 = 0 AS deflated
        |  FROM docs, range(0, 5) r(j) WHERE r.j < 2 + doc_id % 3)
        |SELECT doc_id, name, content, deflated,
        |  CAST(length(content) AS BIGINT) AS n_bytes
        |FROM m ORDER BY doc_id, name""".stripMargin,

    // closed-form records: a Content-Length drift, an envelope-split
    // error, or a status misparse changes rows or values
    "q_warc_extract" ->
      """WITH docs AS (SELECT doc_id FROM documents),
        |info AS (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS rec,
        |    'warcinfo' AS record_type, '' AS target_uri,
        |    CAST(-1 AS BIGINT) AS http_status,
        |    'crawl ' || doc_id AS body
        |  FROM docs),
        |resp AS (
        |  SELECT doc_id, CAST(r.j AS BIGINT) AS rec,
        |    'response' AS record_type,
        |    'https://ex.com/' || doc_id || '/' || r.j AS target_uri,
        |    CAST(CASE (doc_id + r.j) % 3 WHEN 0 THEN 200 WHEN 1 THEN 301
        |         ELSE 404 END AS BIGINT) AS http_status,
        |    'body ' || doc_id || ' ' || r.j || ' ' ||
        |      repeat('w', CAST((doc_id + r.j) % 9 AS INTEGER)) AS body
        |  FROM docs, range(1, 4) r(j) WHERE r.j <= 2 + doc_id % 2)
        |SELECT * FROM (SELECT * FROM info UNION ALL SELECT * FROM resp)
        |ORDER BY doc_id, rec""".stripMargin,

    "q_url_canonical" ->
      """WITH raw AS (
        |  SELECT o_orderkey,
        |    'HTTPS://Shop.Example.COM:443/items/' || (o_orderkey % 500) ||
        |    '?utm_source=feed&ref=aff' || (o_custkey % 7) ||
        |    '&page=' || (o_orderkey % 4) || '#frag' AS url
        |  FROM orders),
        |s1 AS (SELECT o_orderkey, regexp_replace(url, '#.*$', '', 'g') AS u FROM raw),
        |s2 AS (SELECT o_orderkey,
        |         regexp_replace(lower(regexp_extract(u, '^[A-Za-z]+://[^/?#]*')), ':443$', '', 'g')
        |           || regexp_replace(u, '^[A-Za-z]+://[^/?#]*', '', 'g') AS u
        |       FROM s1),
        |s3 AS (SELECT o_orderkey,
        |         regexp_replace(regexp_replace(u, '(utm_[a-z]+|ref)=[^&#]*&?', '', 'g'),
        |                        '[?&]$', '', 'g') AS canonical_url
        |       FROM s2)
        |SELECT canonical_url, COUNT(*) AS n_dups, MIN(o_orderkey) AS first_seen
        |FROM s3 GROUP BY canonical_url ORDER BY canonical_url""".stripMargin,

    "q_mix_sample" ->
      """WITH sized AS (
        |  SELECT source, doc_id,
        |    COUNT(*) OVER (PARTITION BY source) AS n_docs,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT source, doc_id, n_docs,
        |  GREATEST(1, CAST(FLOOR(SQRT(n_docs) * 4) AS BIGINT)) AS k_take
        |FROM sized
        |WHERE rn <= GREATEST(1, CAST(FLOOR(SQRT(n_docs) * 4) AS BIGINT))
        |ORDER BY source, doc_id""".stripMargin,

    "q_token_budget" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS BIGINT) AS n_toks
        |  FROM documents),
        |c AS (
        |  SELECT source, doc_id, n_toks,
        |    SUM(n_toks) OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS cum_toks
        |  FROM t)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(MAX(cum_toks) AS BIGINT) AS tokens_taken,
        |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |FROM c WHERE cum_toks <= 2000
        |GROUP BY source ORDER BY source""".stripMargin,

    "q_curriculum" ->
      """WITH toks AS (
        |  SELECT doc_id, tk FROM (
        |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tk
        |    FROM documents)
        |  WHERE tk <> ''),
        |nd AS (SELECT COUNT(*) AS n_docs FROM documents),
        |dft AS (
        |  SELECT tk, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tk),
        |pd AS (
        |  SELECT t.doc_id, COUNT(*) AS n_toks,
        |    CAST(SUM(CASE WHEN d.df * 100 < (SELECT n_docs FROM nd)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
        |  FROM toks t JOIN dft d ON d.tk = t.tk
        |  GROUP BY t.doc_id),
        |r AS (
        |  SELECT doc_id, n_toks,
        |    n_rare * 1000000 // n_toks AS rarity_ppm
        |  FROM pd),
        |rk AS (
        |  SELECT doc_id, n_toks, rarity_ppm,
        |    CAST(ROW_NUMBER() OVER (ORDER BY rarity_ppm, n_toks, doc_id)
        |      AS BIGINT) AS rank
        |  FROM r)
        |SELECT doc_id, n_toks, rarity_ppm, rank,
        |  (rank - 1) * 3 // (SELECT COUNT(*) FROM rk) AS phase
        |FROM rk ORDER BY doc_id""".stripMargin,

    "q_license_filter" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
        |      AS BIGINT) AS n_toks,
        |    CASE CAST(('0x' || substr(md5('lic|' || doc_id), 1, 8)) AS BIGINT) % 10
        |      WHEN 0 THEN 'proprietary' WHEN 1 THEN 'unknown'
        |      WHEN 2 THEN 'cc-by-sa' WHEN 3 THEN 'cc-by-sa'
        |      ELSE 'cc-by' END AS license
        |  FROM documents)
        |SELECT license,
        |  CAST(CASE WHEN license LIKE 'cc-%' THEN 1 ELSE 0 END AS INTEGER)
        |    AS allowed,
        |  COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens
        |FROM t GROUP BY 1, 2 ORDER BY license""".stripMargin,

    "q_toxicity_filter" ->
      """WITH toks AS (
        |  SELECT doc_id, source, t
        |  FROM (SELECT doc_id, source,
        |          unnest(string_split(lower(text), ' ')) AS t
        |        FROM documents)
        |  WHERE t <> ''),
        |per AS (
        |  SELECT doc_id, source, COUNT(*) AS n_toks,
        |    CAST(SUM(CASE WHEN t IN ('slow', 'big', 'bad') THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_flagged
        |  FROM toks GROUP BY 1, 2),
        |p2 AS (
        |  SELECT source, n_flagged * 1000000 // n_toks AS share_ppm,
        |    CASE WHEN n_flagged * 1000000 // n_toks >= 60000
        |         THEN 1 ELSE 0 END AS blocked
        |  FROM per)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(blocked) AS BIGINT) AS n_blocked,
        |  (COUNT(*) - CAST(SUM(blocked) AS BIGINT)) * 1000000
        |    // COUNT(*) AS retained_ppm,
        |  CAST(SUM(share_ppm) AS BIGINT) // COUNT(*) AS mean_share_ppm
        |FROM p2 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_pack_efficiency" ->
      """WITH sized AS (
        |  SELECT len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS n
        |  FROM documents),
        |ex AS (
        |  SELECT CAST(l.max_len AS BIGINT) AS max_len, n,
        |    (n + l.max_len - 1) // l.max_len AS n_seqs
        |  FROM sized CROSS JOIN (SELECT unnest([128, 256, 512]) AS max_len) l),
        |agg AS (
        |  SELECT max_len, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_tokens,
        |    CAST(SUM(n_seqs) AS BIGINT) AS n_seqs_padded
        |  FROM ex GROUP BY 1)
        |SELECT max_len, n_docs, n_tokens, n_seqs_padded,
        |  CASE WHEN n_seqs_padded = 0 THEN NULL
        |       ELSE (n_seqs_padded * max_len - n_tokens) * 1000000
        |         // (n_seqs_padded * max_len) END AS waste_ppm,
        |  (n_tokens + max_len - 1) // max_len AS n_seqs_packed,
        |  CASE WHEN (n_tokens + max_len - 1) // max_len = 0 THEN NULL
        |       ELSE (((n_tokens + max_len - 1) // max_len) * max_len - n_tokens)
        |         * 1000000 // (((n_tokens + max_len - 1) // max_len) * max_len)
        |       END AS packed_waste_ppm
        |FROM agg ORDER BY max_len""".stripMargin,

    "q_mix_materialize" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
        |      AS BIGINT) AS n_toks
        |  FROM documents),
        |c0 AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(FLOOR(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS w
        |  FROM t GROUP BY source),
        |tw AS (SELECT CAST(SUM(w) AS BIGINT) AS tot_w FROM c0),
        |al AS (
        |  SELECT c0.source, 100000 * c0.w // tw.tot_w AS alloc_toks
        |  FROM c0 CROSS JOIN tw),
        |cum AS (
        |  SELECT t.source, t.doc_id, t.n_toks,
        |    SUM(t.n_toks) OVER (PARTITION BY t.source
        |      ORDER BY md5(CAST(t.doc_id AS VARCHAR)), t.doc_id) AS cum_toks
        |  FROM t)
        |SELECT c.source, COUNT(*) AS n_docs_taken,
        |  CAST(MAX(c.cum_toks) AS BIGINT) AS tokens_taken,
        |  CAST(MAX(a.alloc_toks) AS BIGINT) AS alloc_toks,
        |  CAST(MAX(c.cum_toks) AS BIGINT) * 1000000 //
        |    CAST(MAX(a.alloc_toks) AS BIGINT) AS fill_ppm
        |FROM cum c JOIN al a ON a.source = c.source
        |WHERE c.cum_toks <= a.alloc_toks
        |GROUP BY c.source ORDER BY c.source""".stripMargin,

    "q_winsorize" ->
      """WITH base AS (
        |  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS len FROM documents),
        |ranked AS (
        |  SELECT source, len,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY len, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM base),
        |cuts AS (
        |  SELECT source,
        |    MIN(CASE WHEN rn = (n + 9) // 10 THEN len END) AS p10,
        |    MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN len END) AS p90
        |  FROM ranked WHERE rn = (n + 9) // 10 OR rn = (9 * n + 9) // 10
        |  GROUP BY source)
        |SELECT b.source, COUNT(*) AS n_docs,
        |  CAST(SUM(b.len) AS BIGINT) AS raw_sum,
        |  CAST(SUM(GREATEST(c.p10, LEAST(c.p90, b.len))) AS BIGINT) AS wins_sum,
        |  MIN(c.p10) AS p10, MAX(c.p90) AS p90
        |FROM base b JOIN cuts c USING (source)
        |GROUP BY 1 ORDER BY source""".stripMargin,

    "q_class_balance" ->
      """WITH base AS (SELECT vec_id, label FROM embeddings),
        |counts AS (SELECT label, COUNT(*) AS n_l FROM base GROUP BY 1),
        |t AS (SELECT MAX(n_l) AS target FROM counts),
        |ranked AS (
        |  SELECT vec_id, label,
        |    ROW_NUMBER() OVER (PARTITION BY label
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
        |  FROM base),
        |reps AS (
        |  SELECT r.label, r.vec_id, r.rk, c.n_l, t.target, g.rep
        |  FROM ranked r JOIN counts c USING (label), t,
        |    LATERAL (SELECT unnest(range(1,
        |      CAST((t.target + c.n_l - 1) // c.n_l AS BIGINT) + 1)) AS rep) g)
        |SELECT label, vec_id, CAST(rep AS BIGINT) AS rep
        |FROM reps WHERE (rep - 1) * n_l + rk <= target
        |ORDER BY label, vec_id, rep""".stripMargin,

    "q_impute" ->
      """WITH base AS (
        |  SELECT source, doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN NULL
        |         ELSE CAST(n_chars AS BIGINT) END AS len
        |  FROM documents),
        |present AS (SELECT * FROM base WHERE len IS NOT NULL),
        |ranked AS (
        |  SELECT source, len,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY len, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM present),
        |med AS (SELECT source, len AS med FROM ranked WHERE rn = (n + 1) // 2)
        |SELECT b.source, b.doc_id,
        |  COALESCE(b.len, m.med) AS len_filled,
        |  b.len IS NULL AS was_null
        |FROM base b JOIN med m ON b.source = m.source
        |ORDER BY b.source, b.doc_id""".stripMargin,

    "q_corpus_stats" ->
      """WITH perdoc AS (
        |  SELECT source, doc_id,
        |    len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS n_toks,
        |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
        |  FROM documents),
        |agg AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
        |    COUNT(DISTINCT fp) AS n_unique_docs
        |  FROM perdoc GROUP BY source),
        |vocab AS (
        |  SELECT source, COUNT(DISTINCT tk) AS n_vocab FROM (
        |    SELECT source, unnest(string_split(lower(text), ' ')) AS tk
        |    FROM documents)
        |  WHERE tk <> '' GROUP BY source)
        |SELECT a.source, n_docs, n_tokens, n_vocab,
        |  n_tokens * 1000000 // n_docs AS mean_tokens_micro,
        |  n_unique_docs, n_docs - n_unique_docs AS exact_dup_docs
        |FROM agg a JOIN vocab v ON a.source = v.source
        |ORDER BY a.source""".stripMargin,

    "q_length_buckets" ->
      """WITH d AS (
        |  SELECT CAST(len(list_filter(string_split(lower(text), ' '),
        |    x -> x <> '')) AS BIGINT) AS n_toks
        |  FROM documents),
        |b AS (
        |  SELECT n_toks, CAST(
        |    CASE WHEN n_toks <= 16 THEN 16 WHEN n_toks <= 32 THEN 32
        |    WHEN n_toks <= 64 THEN 64 WHEN n_toks <= 128 THEN 128
        |    WHEN n_toks <= 256 THEN 256 WHEN n_toks <= 512 THEN 512
        |    WHEN n_toks <= 1024 THEN 1024 WHEN n_toks <= 2048 THEN 2048
        |    WHEN n_toks <= 4096 THEN 4096 WHEN n_toks <= 8192 THEN 8192
        |    ELSE 16384 END AS BIGINT) AS bucket
        |  FROM d)
        |SELECT bucket, COUNT(*) AS n_docs,
        |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
        |  CAST(SUM(bucket - n_toks) AS BIGINT) AS pad_tokens,
        |  CAST(SUM(bucket - n_toks) AS BIGINT) * 1000000
        |    // (COUNT(*) * bucket) AS pad_ppm
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_psi_drift" ->
      """WITH binned AS (
        |  SELECT source,
        |    CAST(CASE WHEN n_chars <= 100 THEN 0 WHEN n_chars <= 200 THEN 1
        |    WHEN n_chars <= 400 THEN 2 WHEN n_chars <= 800 THEN 3
        |    WHEN n_chars <= 1600 THEN 4 WHEN n_chars <= 3200 THEN 5
        |    WHEN n_chars <= 6400 THEN 6 WHEN n_chars <= 12800 THEN 7
        |    WHEN n_chars <= 25600 THEN 8 WHEN n_chars <= 51200 THEN 9
        |    ELSE 10 END AS BIGINT) AS bin,
        |    COUNT(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |bins AS (SELECT unnest(range(0, 11)) AS bin),
        |srcs AS (SELECT DISTINCT source FROM binned),
        |grid AS (
        |  SELECT s.source, b.bin, CAST(COALESCE(x.c, 0) AS BIGINT) AS c
        |  FROM srcs s CROSS JOIN bins b
        |  LEFT JOIN binned x ON x.source = s.source AND x.bin = b.bin),
        |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s
        |        FROM grid GROUP BY 1),
        |alln AS (SELECT CAST(SUM(c) AS BIGINT) AS n_all FROM binned),
        |perbin AS (SELECT bin, CAST(SUM(c) AS BIGINT) AS c_all
        |           FROM binned GROUP BY 1),
        |shares AS (
        |  SELECT g.source,
        |    (g.c + 1) * 1000000 // (t.n_s + 11) AS p_ppm,
        |    (COALESCE(p.c_all, 0) - g.c + 1) * 1000000
        |      // (a.n_all - t.n_s + 11) AS q_ppm
        |  FROM grid g LEFT JOIN perbin p ON g.bin = p.bin
        |  JOIN tot t ON g.source = t.source CROSS JOIN alln a)
        |SELECT source, COUNT(*) AS n_bins,
        |  CAST(SUM((p_ppm - q_ppm) *
        |    CAST(ROUND(ln(CAST(p_ppm AS DOUBLE) / q_ppm) * 1000000) AS BIGINT))
        |    AS BIGINT) AS psi_p12
        |FROM shares GROUP BY source ORDER BY source""".stripMargin,

    "q_source_scorecard" ->
      """WITH tf AS (
        |  SELECT source, tk, COUNT(*) AS c FROM (
        |    SELECT source, unnest(string_split(lower(text), ' ')) AS tk
        |    FROM documents)
        |  WHERE tk <> '' GROUP BY 1, 2),
        |ttr AS (
        |  SELECT source,
        |    COUNT(*) * 1000000 // CAST(SUM(c) AS BIGINT) AS ttr_ppm
        |  FROM tf GROUP BY source),
        |dup AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    (COUNT(*) - COUNT(DISTINCT
        |       md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))))
        |      * 1000000 // COUNT(*) AS dup_ppm
        |  FROM documents GROUP BY source),
        |lab AS (
        |  SELECT source,
        |    CASE WHEN text LIKE '% the %' THEN 'en'
        |         WHEN text LIKE '% der %' THEN 'de'
        |         WHEN text LIKE '% le %' THEN 'fr'
        |         ELSE 'und' END AS guess
        |  FROM documents),
        |mc AS (SELECT source, guess, COUNT(*) AS n FROM lab GROUP BY 1, 2),
        |maj AS (
        |  SELECT m.source, m.n * 1000000 // t.nd AS maj_ppm
        |  FROM (SELECT source, guess, n,
        |          row_number() OVER (PARTITION BY source
        |                             ORDER BY n DESC, guess ASC) AS rn
        |        FROM mc) m
        |  JOIN (SELECT source, COUNT(*) AS nd FROM documents GROUP BY 1) t
        |    ON m.source = t.source
        |  WHERE m.rn = 1),
        |scored AS (
        |  SELECT ttr.source, dup.n_docs, ttr.ttr_ppm, dup.dup_ppm,
        |    maj.maj_ppm,
        |    (ttr.ttr_ppm + (1000000 - dup.dup_ppm) + maj.maj_ppm) // 3
        |      AS score_ppm
        |  FROM ttr JOIN dup ON ttr.source = dup.source
        |           JOIN maj ON ttr.source = maj.source)
        |SELECT CAST(row_number() OVER (ORDER BY score_ppm DESC, source ASC)
        |    AS BIGINT) AS rank,
        |  source, n_docs, ttr_ppm, dup_ppm, maj_ppm, score_ppm
        |FROM scored ORDER BY rank""".stripMargin,

    "q_lexical_diversity" ->
      """WITH tf AS (
        |  SELECT source, tk, COUNT(*) AS c FROM (
        |    SELECT source, unnest(string_split(lower(text), ' ')) AS tk
        |    FROM documents)
        |  WHERE tk <> '' GROUP BY 1, 2)
        |SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  COUNT(*) AS n_types,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |  COUNT(*) * 1000000 // CAST(SUM(c) AS BIGINT) AS ttr_ppm,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000
        |    // COUNT(*) AS hapax_ppm
        |FROM tf GROUP BY source ORDER BY source""".stripMargin,

    "q_ks_drift" ->
      """WITH base AS (
        |  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS len,
        |    doc_id % 2 = 0 AS is_old
        |  FROM documents),
        |cum AS (
        |  SELECT source, len,
        |    SUM(CASE WHEN is_old THEN 1 ELSE 0 END) OVER w AS cum_o,
        |    SUM(CASE WHEN is_old THEN 0 ELSE 1 END) OVER w AS cum_n
        |  FROM base
        |  WINDOW w AS (PARTITION BY source ORDER BY len, doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |by_len AS (
        |  SELECT source, len, MAX(cum_o) AS cum_o, MAX(cum_n) AS cum_n
        |  FROM cum GROUP BY source, len),
        |tot AS (
        |  SELECT source,
        |    CAST(SUM(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
        |    CAST(SUM(CASE WHEN is_old THEN 0 ELSE 1 END) AS BIGINT) AS n_new
        |  FROM base GROUP BY source)
        |SELECT b.source, MAX(t.n_old) AS n_old, MAX(t.n_new) AS n_new,
        |  CAST(MAX(ABS(b.cum_o * t.n_new - b.cum_n * t.n_old)) AS BIGINT) AS ks_scaled,
        |  CAST(MAX(ABS(b.cum_o * t.n_new - b.cum_n * t.n_old)) AS BIGINT)
        |    * 1000000 // (MAX(t.n_old) * MAX(t.n_new)) AS ks_ppm
        |FROM by_len b JOIN tot t USING (source)
        |GROUP BY b.source
        |ORDER BY b.source""".stripMargin,

    "q_quantile_normalize" ->
      """WITH base AS (
        |  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS len FROM documents),
        |r AS (
        |  SELECT source, doc_id, len,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY len, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n_src,
        |    COUNT(*) OVER () AS n_all
        |  FROM base),
        |gl AS (
        |  SELECT len AS norm_len,
        |    ROW_NUMBER() OVER (ORDER BY len, doc_id) AS grank
        |  FROM base)
        |SELECT r.doc_id, r.source, r.len, gl.norm_len
        |FROM r JOIN gl ON gl.grank = r.rn * r.n_all // r.n_src
        |ORDER BY r.doc_id""".stripMargin,

    "q_source_drift" ->
      """WITH toks AS (
        |  SELECT source, doc_id % 2 = 0 AS is_old,
        |    unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS tk
        |  FROM documents),
        |counts AS (
        |  SELECT source, tk,
        |    CAST(SUM(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT) AS o,
        |    CAST(SUM(CASE WHEN is_old THEN 0 ELSE 1 END) AS BIGINT) AS n
        |  FROM toks GROUP BY source, tk),
        |totals AS (
        |  SELECT source, SUM(o) AS tokens_old, SUM(n) AS tokens_new
        |  FROM counts GROUP BY source),
        |joined AS (
        |  SELECT c.source, c.tk,
        |    abs(c.n * t.tokens_old - c.o * t.tokens_new) AS diff
        |  FROM counts c JOIN totals t ON c.source = t.source),
        |ranked AS (
        |  SELECT source, tk, diff,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY diff DESC, tk DESC) AS rk
        |  FROM joined),
        |agg AS (
        |  SELECT source, COUNT(*) AS n_vocab,
        |    CAST(SUM(diff) AS BIGINT) AS l1_scaled
        |  FROM joined GROUP BY source)
        |SELECT a.source,
        |  CAST(t.tokens_old AS BIGINT) AS tokens_old,
        |  CAST(t.tokens_new AS BIGINT) AS tokens_new,
        |  a.n_vocab, a.l1_scaled,
        |  r.tk AS top_token, CAST(r.diff AS BIGINT) AS top_drift
        |FROM agg a
        |JOIN totals t ON a.source = t.source
        |JOIN ranked r ON a.source = r.source AND r.rk = 1
        |ORDER BY a.source""".stripMargin,

    "q_rendezvous_shards" ->
      """WITH ex AS (
        |  SELECT doc_id, k.k,
        |    CAST(('0x' || substr(md5(doc_id || '|' || k.k), 1, 14)) AS BIGINT) * 16 + k.k AS key
        |  FROM documents, (SELECT unnest(generate_series(0, 8)) AS k) k),
        |agg AS (
        |  SELECT doc_id,
        |    MAX(CASE WHEN k < 8 THEN key END) AS k8,
        |    MAX(key) AS k9
        |  FROM ex GROUP BY doc_id)
        |SELECT doc_id, k8 % 16 AS shard8, k9 % 16 AS shard9,
        |  CAST((k8 % 16) <> (k9 % 16) AS BIGINT) AS moved
        |FROM agg ORDER BY doc_id""".stripMargin,

    "q_l_diversity" ->
      """WITH classes AS (
        |  SELECT source, n_chars // 200 AS size_bin,
        |    COUNT(DISTINCT lang) AS l_div, COUNT(*) AS n
        |  FROM documents GROUP BY source, n_chars // 200)
        |SELECT source,
        |  COUNT(*) AS n_classes,
        |  MIN(l_div) AS min_diversity,
        |  CAST(SUM(CASE WHEN l_div < 2 THEN 1 ELSE 0 END) AS BIGINT) AS low_div_classes,
        |  CAST(SUM(CASE WHEN l_div < 2 THEN n ELSE 0 END) AS BIGINT) AS docs_at_risk
        |FROM classes GROUP BY source
        |ORDER BY source""".stripMargin,

    "q_k_anonymity" ->
      """WITH classes AS (
        |  SELECT source, lang, n_chars // 200 AS size_bin, COUNT(*) AS n
        |  FROM documents GROUP BY source, lang, n_chars // 200)
        |SELECT source, lang,
        |  COUNT(*) AS n_classes,
        |  CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS small_classes,
        |  CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS docs_suppressed,
        |  CAST(SUM(n) AS BIGINT) AS docs_total
        |FROM classes GROUP BY source, lang
        |ORDER BY source, lang""".stripMargin,

    "q_bootstrap_ci" ->
      """WITH ex AS (
        |  SELECT doc_id, n_chars, b.b,
        |    CAST(('0x' || substr(md5(doc_id || '|' || b.b), 1, 8)) AS BIGINT) AS u
        |  FROM documents, (SELECT unnest(generate_series(0, 31)) AS b) b),
        |w AS (
        |  SELECT b, n_chars,
        |    CASE WHEN u < 1580030168 THEN 0
        |         WHEN u < 3160060337 THEN 1
        |         WHEN u < 3950075421 THEN 2 ELSE 3 END AS w
        |  FROM ex)
        |SELECT CAST(b AS BIGINT) AS b, CAST(SUM(w) AS BIGINT) AS n_eff,
        |  CAST(SUM(w * n_chars) * 1000000 // SUM(w) AS BIGINT) AS mean_micro
        |FROM w GROUP BY b ORDER BY b""".stripMargin,

    "q_t_closeness" ->
      """WITH cell AS (
        |  SELECT source, n_chars // 200 AS size_bin, lang, COUNT(*) AS n_gl
        |  FROM documents GROUP BY 1, 2, 3),
        |g AS (SELECT source, size_bin, SUM(n_gl) AS n_g FROM cell GROUP BY 1, 2),
        |l AS (SELECT lang, SUM(n_gl) AS n_l FROM cell GROUP BY 1),
        |tot AS (SELECT SUM(n_gl) AS n_total FROM cell),
        |grp AS (
        |  SELECT c.source, c.size_bin, g.n_g, tot.n_total,
        |    SUM(ABS(c.n_gl * tot.n_total - l.n_l * g.n_g)) AS s_term,
        |    SUM(l.n_l) AS s_nl
        |  FROM cell c
        |  JOIN l ON l.lang = c.lang
        |  JOIN g ON g.source = c.source AND g.size_bin = c.size_bin
        |  CROSS JOIN tot
        |  GROUP BY 1, 2, 3, 4)
        |SELECT source, size_bin, CAST(n_g AS BIGINT) AS n_g,
        |  CAST((s_term + (n_total - s_nl) * n_g) * 1000000
        |       // (2 * n_g * n_total) AS BIGINT) AS t_micro,
        |  CAST(CASE WHEN (s_term + (n_total - s_nl) * n_g) * 1000000
        |                 // (2 * n_g * n_total) > 300000
        |       THEN 1 ELSE 0 END AS BIGINT) AS breach
        |FROM grp ORDER BY source, size_bin""".stripMargin,

    "q_quality_filter" ->
      """WITH t AS (
        |  SELECT doc_id, source, n_chars,
        |    len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS n_tokens,
        |    len(list_filter(string_split(lower(text), ' '),
        |        x -> x IN ('the', 'a', 'of', 'and', 'in'))) AS n_stop
        |  FROM documents)
        |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n_stop AS BIGINT) AS n_stop,
        |  CASE WHEN n_tokens < 25 THEN 'drop:too_short'
        |       WHEN n_chars > n_tokens * 8 THEN 'drop:long_tokens'
        |       WHEN n_stop = 0 THEN 'drop:no_stopwords'
        |       ELSE 'keep' END AS verdict
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_gopher_rules" ->
      """WITH top AS (
        |  SELECT doc_id, MAX(c) AS topc FROM (
        |    SELECT doc_id, tk, COUNT(*) AS c FROM (
        |      SELECT doc_id,
        |        unnest(list_filter(string_split(lower(text), ' '),
        |          x -> x <> '')) AS tk
        |      FROM documents)
        |    GROUP BY doc_id, tk)
        |  GROUP BY doc_id),
        |f AS (
        |  SELECT d.source,
        |    CAST(len(list_filter(string_split(lower(d.text), ' '),
        |      x -> x <> '')) AS BIGINT) AS n_words,
        |    CAST(length(replace(d.text, ' ', '')) AS BIGINT) AS nonspace,
        |    CAST(length(regexp_replace(d.text, '[^A-Za-z]', '', 'g'))
        |      AS BIGINT) AS letters,
        |    CAST(len(list_filter(string_split(lower(d.text), ' '),
        |      x -> x IN ('the', 'a', 'of', 'and', 'in'))) AS BIGINT) AS n_stop,
        |    CAST(COALESCE(t.topc, 0) AS BIGINT) AS topc
        |  FROM documents d LEFT JOIN top t ON t.doc_id = d.doc_id),
        |m AS (
        |  SELECT source, n_words, n_stop,
        |    nonspace * 1000 // GREATEST(n_words, 1) AS mwl_milli,
        |    (nonspace - letters) * 1000000 // GREATEST(nonspace, 1) AS sym_ppm,
        |    topc * 1000000 // GREATEST(n_words, 1) AS top_ppm
        |  FROM f),
        |u AS (
        |  SELECT source, 'r1_short' AS rule,
        |    CASE WHEN n_words < 25 THEN 1 ELSE 0 END AS violate FROM m
        |  UNION ALL SELECT source, 'r2_word_len',
        |    CASE WHEN mwl_milli < 3000 OR mwl_milli > 10000 THEN 1 ELSE 0 END
        |    FROM m
        |  UNION ALL SELECT source, 'r3_symbol',
        |    CASE WHEN sym_ppm > 100000 THEN 1 ELSE 0 END FROM m
        |  UNION ALL SELECT source, 'r4_stopword',
        |    CASE WHEN n_stop < 2 THEN 1 ELSE 0 END FROM m
        |  UNION ALL SELECT source, 'r5_repetition',
        |    CASE WHEN top_ppm > 200000 THEN 1 ELSE 0 END FROM m)
        |SELECT source, rule, COUNT(*) AS n_docs,
        |  CAST(SUM(violate) AS BIGINT) AS n_violations,
        |  CAST(SUM(violate) AS BIGINT) * 1000000 // COUNT(*) AS violation_ppm
        |FROM u GROUP BY source, rule ORDER BY source, rule""".stripMargin,

    "q_source_ablation" ->
      """WITH t AS (
        |  SELECT source,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |      x -> x <> '')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |      x -> x IN ('the', 'a', 'of', 'and', 'in'))) AS BIGINT)
        |      AS n_stop,
        |    n_chars
        |  FROM documents),
        |d AS (
        |  SELECT source, n_tokens,
        |    CASE WHEN n_tokens >= 25 AND n_chars <= n_tokens * 8
        |      AND n_stop > 0 THEN 1 ELSE 0 END AS keep
        |  FROM t),
        |bysrc AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(keep) AS BIGINT) AS k,
        |    CAST(SUM(n_tokens) AS BIGINT) AS tk
        |  FROM d GROUP BY source),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tn,
        |    CAST(SUM(k) AS BIGINT) AS tkeep,
        |    CAST(SUM(tk) AS BIGINT) AS ttok FROM bysrc)
        |SELECT source, n AS n_docs_removed, ttok - tk AS comp_tokens,
        |  tkeep * 1000000 // tn AS full_keep_ppm,
        |  CASE WHEN tn = n THEN NULL
        |    ELSE (tkeep - k) * 1000000 // (tn - n) END AS comp_keep_ppm,
        |  CASE WHEN tn = n THEN NULL
        |    ELSE (tkeep - k) * 1000000 // (tn - n)
        |       - tkeep * 1000000 // tn END AS delta_ppm
        |FROM bysrc CROSS JOIN tot ORDER BY source""".stripMargin,

    "q_bh_fdr" ->
      """WITH t AS (
        |  SELECT source,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |      x -> x <> '')) AS BIGINT) AS nt,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |      x -> x IN ('the', 'a', 'of', 'and', 'in'))) AS BIGINT)
        |      AS n_stop,
        |    n_chars
        |  FROM documents),
        |d AS (
        |  SELECT source,
        |    CASE WHEN nt >= 25 AND n_chars <= nt * 8 AND n_stop > 0
        |      THEN 1 ELSE 0 END AS keep
        |  FROM t),
        |bysrc AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n1,
        |    CAST(SUM(keep) AS BIGINT) AS k1
        |  FROM d GROUP BY source),
        |tot AS (SELECT CAST(SUM(n1) AS BIGINT) AS tn,
        |        CAST(SUM(k1) AS BIGINT) AS tk FROM bysrc),
        |z AS (
        |  SELECT source, n1, k1,
        |    k1 * 1000000 // n1 AS p1_ppm,
        |    (tk * 1000000 // tn) * (1000000 - tk * 1000000 // tn)
        |      // 1000000 AS v_ppm,
        |    -- hmean: overflow-free harmonic pair count (see the Spark
        |    -- comment): mn - ceil(mn^2/tn); mn >= 1.8e9 forces the cap
        |    CASE WHEN tn - n1 = 0 THEN NULL
        |      WHEN LEAST(n1, tn - n1) >= 1800000000 THEN CAST(900000000 AS BIGINT)
        |      ELSE LEAST(GREATEST(LEAST(n1, tn - n1)
        |        - ((LEAST(n1, tn - n1) * LEAST(n1, tn - n1) - 1) // tn + 1), 1),
        |                 CAST(900000000 AS BIGINT)) END AS hmean,
        |    CASE WHEN tn - n1 = 0 THEN NULL
        |      ELSE k1 * 1000000 // n1 - (tk - k1) * 1000000 // (tn - n1)
        |    END AS diff
        |  FROM bysrc CROSS JOIN tot),
        |z2 AS (
        |  SELECT source, n1, k1, p1_ppm,
        |    -- b = diff^2*1000/v_ppm is NANO z^2-per-pair (diff is ppm);
        |    -- b*hmean must divide by 1e6 for milli (round-9 ADVICE fix)
        |    CASE WHEN hmean IS NULL OR v_ppm <= 0 THEN NULL
        |      ELSE LEAST(LEAST(diff * diff * 1000 // v_ppm,
        |             CAST(1000000000 AS BIGINT))
        |           * hmean // 1000000, CAST(10000000 AS BIGINT)) END AS z2_milli
        |  FROM z),
        |crit AS (SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), CAST(9141 AS BIGINT)), (2, 7879), (3, 7149),
        |  (4, 6635), (5, 6239), (6, 5916), (7, 5646), (8, 5412), (9, 5207),
        |  (10, 5024), (11, 4859), (12, 4709), (13, 4572), (14, 4445),
        |  (15, 4328), (16, 4218), (17, 4115), (18, 4019), (19, 3928),
        |  (20, 3841)) AS c(rank, crit_milli)),
        |ranked AS (
        |  SELECT z2.*,
        |    CAST(ROW_NUMBER() OVER (ORDER BY z2_milli DESC NULLS LAST,
        |      source) AS BIGINT) AS rank
        |  FROM z2),
        |rc AS (
        |  SELECT r.*, c.crit_milli
        |  FROM ranked r LEFT JOIN crit c ON c.rank = r.rank),
        |kmax AS (
        |  SELECT COALESCE(MAX(CASE WHEN z2_milli >= crit_milli
        |    THEN rank END), 0) AS kmax FROM rc)
        |SELECT source, n1, k1, p1_ppm, z2_milli, rank, crit_milli,
        |  CAST(CASE WHEN rank <= (SELECT kmax FROM kmax)
        |    THEN 1 ELSE 0 END AS BIGINT) AS significant
        |FROM rc ORDER BY rank""".stripMargin,

    "q_mix_entropy" ->
      """WITH counts AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) AS w
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS nn,
        |        CAST(SUM(w) AS BIGINT) AS tw, COUNT(*) AS n_sources
        |        FROM counts),
        |terms AS (
        |  SELECT t.n_sources,
        |    CAST(ROUND(-(CAST(n_docs AS DOUBLE) / nn)
        |      * ln(CAST(n_docs AS DOUBLE) / nn) * 1000000) AS BIGINT) AS tb,
        |    CAST(ROUND(-(CAST(w AS DOUBLE) / tw)
        |      * ln(CAST(w AS DOUBLE) / tw) * 1000000) AS BIGINT) AS ta
        |  FROM counts c CROSS JOIN tot t),
        |h AS (SELECT n_sources, CAST(SUM(tb) AS BIGINT) AS h_before_micro,
        |      CAST(SUM(ta) AS BIGINT) AS h_after_micro
        |      FROM terms GROUP BY n_sources),
        |f AS (SELECT *, CAST(ROUND(ln(CAST(n_sources AS DOUBLE)) * 1000000)
        |        AS BIGINT) AS ln_s_micro FROM h)
        |SELECT n_sources, h_before_micro, h_after_micro, ln_s_micro,
        |  CASE WHEN ln_s_micro = 0 THEN NULL
        |       ELSE h_before_micro * 1000000 // ln_s_micro
        |  END AS evenness_before_ppm,
        |  CASE WHEN ln_s_micro = 0 THEN NULL
        |       ELSE h_after_micro * 1000000 // ln_s_micro
        |  END AS evenness_after_ppm
        |FROM f""".stripMargin,

    "q_temperature_mix" ->
      """WITH c AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(FLOOR(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS w
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(SUM(w) AS BIGINT) AS tot_w FROM c),
        |s AS (
        |  SELECT c.source, c.n_docs, c.w,
        |    1000000 * c.w // t.tot_w AS alloc_floor,
        |    (1000000 * c.w) % t.tot_w AS rem,
        |    c.w * 1000000 // t.tot_w AS weight_ppm
        |  FROM c CROSS JOIN t),
        |r AS (SELECT 1000000 - CAST(SUM(alloc_floor) AS BIGINT) AS deficit FROM s),
        |k AS (
        |  SELECT s.*, ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC) AS rr
        |  FROM s)
        |SELECT k.source, k.n_docs, k.w, k.weight_ppm,
        |  k.alloc_floor + CASE WHEN k.rr <= r.deficit THEN 1 ELSE 0 END AS alloc
        |FROM k CROSS JOIN r ORDER BY k.source""".stripMargin,

    "q_js_divergence" ->
      """WITH tf AS (
        |  SELECT source, tk, COUNT(*) AS c FROM (
        |    SELECT source, unnest(string_split(lower(text), ' ')) AS tk
        |    FROM documents)
        |  WHERE tk <> '' GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM tf GROUP BY 1),
        |pairs AS (
        |  SELECT a.source AS s1, a.n AS n1, b.source AS s2, b.n AS n2
        |  FROM tot a CROSS JOIN tot b WHERE a.source < b.source),
        |voc AS (SELECT DISTINCT tk FROM tf),
        |grid AS (
        |  SELECT p.s1, p.s2, p.n1, p.n2, v.tk,
        |    COALESCE(t1.c, 0) AS c1, COALESCE(t2.c, 0) AS c2
        |  FROM pairs p CROSS JOIN voc v
        |  LEFT JOIN tf t1 ON t1.source = p.s1 AND t1.tk = v.tk
        |  LEFT JOIN tf t2 ON t2.source = p.s2 AND t2.tk = v.tk
        |  WHERE COALESCE(t1.c, 0) + COALESCE(t2.c, 0) > 0),
        |terms AS (
        |  SELECT s1, s2, n1, n2,
        |    CAST(ROUND((
        |      CASE WHEN c1 > 0 THEN (CAST(c1 AS DOUBLE) / n1) *
        |        ln((CAST(c1 AS DOUBLE) / n1) /
        |           ((CAST(c1 AS DOUBLE) / n1 + CAST(c2 AS DOUBLE) / n2) / 2))
        |      ELSE 0.0 END +
        |      CASE WHEN c2 > 0 THEN (CAST(c2 AS DOUBLE) / n2) *
        |        ln((CAST(c2 AS DOUBLE) / n2) /
        |           ((CAST(c1 AS DOUBLE) / n1 + CAST(c2 AS DOUBLE) / n2) / 2))
        |      ELSE 0.0 END) / 2 * 1000000000.0) AS BIGINT) AS term_nano
        |  FROM grid)
        |SELECT s1, s2, n1, n2, CAST(SUM(term_nano) AS BIGINT) AS jsd_nano
        |FROM terms GROUP BY 1, 2, 3, 4 ORDER BY s1, s2""".stripMargin,

    "q_dataset_card" ->
      """WITH t AS (
        |  SELECT doc_id, lang, source, md5(text) AS h,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |         x -> x <> '')) AS BIGINT) AS n_toks
        |  FROM documents),
        |base AS (
        |  SELECT COUNT(*) AS n_docs, COUNT(DISTINCT source) AS n_sources,
        |    COUNT(DISTINCT lang) AS n_langs,
        |    COUNT(DISTINCT h) AS n_unique_texts,
        |    CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
        |    CAST(SUM(CASE WHEN n_toks < 25 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_short
        |  FROM t),
        |v AS (
        |  SELECT COUNT(DISTINCT tk) AS vocab FROM (
        |    SELECT unnest(string_split(lower(text), ' ')) AS tk FROM documents)
        |  WHERE tk <> ''),
        |lh AS (
        |  SELECT CAST(ROUND((ln(CAST(SUM(c) AS DOUBLE)) -
        |    SUM(c * ln(CAST(c AS DOUBLE))) / SUM(c)) * 1000) AS BIGINT)
        |    AS lang_entropy_milli
        |  FROM (SELECT lang, COUNT(*) AS c FROM t GROUP BY lang))
        |SELECT b.n_docs, b.n_sources, b.n_langs, b.total_tokens, v.vocab,
        |  b.total_tokens // b.n_docs AS mean_doc_tokens,
        |  (b.n_docs - b.n_unique_texts) * 1000000 // b.n_docs AS exact_dup_ppm,
        |  b.n_short * 1000000 // b.n_docs AS short_docs_ppm,
        |  lh.lang_entropy_milli
        |FROM base b, v, lh""".stripMargin,

    "q_mann_whitney" ->
      """WITH r AS (
        |  SELECT doc_id % 2 AS cohort,
        |    CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS rk
        |  FROM documents),
        |g AS (
        |  SELECT cohort, COUNT(*) AS n, CAST(SUM(rk) AS BIGINT) AS r
        |  FROM r GROUP BY 1),
        |w AS (
        |  SELECT MAX(CASE WHEN cohort = 0 THEN n END) AS n1,
        |    MAX(CASE WHEN cohort = 0 THEN r END) AS r1,
        |    MAX(CASE WHEN cohort = 1 THEN n END) AS n2
        |  FROM g),
        |u AS (SELECT n1, n2, r1, r1 - n1 * (n1 + 1) // 2 AS u1 FROM w)
        |SELECT n1, n2, r1, u1,
        |  ((2 * u1 - n1 * n2) * (2 * u1 - n1 * n2) // (n1 * n2)) * 3000
        |    // (n1 + n2 + 1) AS z2_milli
        |FROM u""".stripMargin,

    "q_span_corruption" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |         x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, n_tokens,
        |    GREATEST(1, n_tokens // 20) AS k,
        |    n_tokens // GREATEST(1, n_tokens // 20) AS stride
        |  FROM t WHERE n_tokens >= 4),
        |sp0 AS (
        |  SELECT doc_id, n_tokens, stride, unnest(range(0, k)) AS span_id FROM p),
        |sp AS (
        |  SELECT doc_id, n_tokens, span_id, stride,
        |    CAST(('0x' || substr(md5('span|' || doc_id || '|' || span_id), 1, 8))
        |      AS BIGINT) AS h
        |  FROM sp0)
        |SELECT doc_id, n_tokens, span_id,
        |  span_id * stride + h % GREATEST(1, stride - 2) AS start_tok,
        |  LEAST(3, n_tokens - (span_id * stride + h % GREATEST(1, stride - 2)))
        |    AS span_len
        |FROM sp ORDER BY doc_id, span_id""".stripMargin,

    "q_randomized_response" ->
      """WITH u AS (
        |  SELECT DISTINCT user_id FROM events),
        |b AS (
        |  SELECT user_id,
        |    CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS t,
        |    CAST(('0x' || substr(md5('rr|' || user_id), 1, 8)) AS BIGINT) AS h
        |  FROM u),
        |rep AS (
        |  SELECT t,
        |    CASE WHEN h % 4 < 3 THEN t ELSE (h // 4) % 2 END AS report
        |  FROM b),
        |a AS (
        |  SELECT COUNT(*) AS n, CAST(SUM(t) AS BIGINT) AS n_true,
        |    CAST(SUM(report) AS BIGINT) AS n_yes
        |  FROM rep)
        |SELECT n, n_true, n_yes,
        |  n_true * 1000000 // n AS actual_ppm,
        |  (8 * n_yes - n) * 1000000 // (6 * n) AS est_ppm,
        |  abs((8 * n_yes - n) * 1000000 // (6 * n) - n_true * 1000000 // n)
        |    AS abs_err_ppm
        |FROM a""".stripMargin,

    "q_dp_histogram" ->
      s"""WITH src AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
         |h AS (
         |  SELECT source, n_docs,
         |    CAST(('0x' || substr(md5('dp|' || source), 1, 8)) AS BIGINT)
         |      % 3145728 AS u
         |  FROM src),
         |n AS (SELECT source, n_docs, CAST($dlapCase AS BIGINT) AS noise FROM h)
         |SELECT source, n_docs, noise,
         |  GREATEST(n_docs + noise, 0) AS noisy_n,
         |  abs(GREATEST(n_docs + noise, 0) - n_docs) AS abs_err
         |FROM n ORDER BY source""".stripMargin,

    "q_rejection_sampling" ->
      """WITH src AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS big_n, COUNT(*) AS k
        |        FROM src),
        |p AS (SELECT s.source, s.n_docs, t.k,
        |        LEAST(1000000, t.big_n * 1000000 // (t.k * s.n_docs))
        |          AS p_accept_ppm
        |      FROM src s, tot t),
        |acc AS (
        |  SELECT d.source, COUNT(*) AS n_accepted
        |  FROM documents d JOIN p ON p.source = d.source
        |  WHERE CAST(('0x' || substr(md5('rs|' || doc_id), 1, 8)) AS BIGINT)
        |          % 1000000 < p.p_accept_ppm
        |  GROUP BY 1),
        |ta AS (SELECT CAST(COALESCE(SUM(n_accepted), 0) AS BIGINT) AS tot_acc
        |       FROM acc)
        |SELECT p.source, p.n_docs, p.p_accept_ppm,
        |  CAST(COALESCE(a.n_accepted, 0) AS BIGINT) AS n_accepted,
        |  COALESCE(a.n_accepted, 0) * 1000000 // ta.tot_acc AS realized_ppm,
        |  1000000 // p.k AS target_ppm,
        |  abs(COALESCE(a.n_accepted, 0) * 1000000 // ta.tot_acc
        |      - 1000000 // p.k) AS gap_ppm
        |FROM p LEFT JOIN acc a ON a.source = p.source CROSS JOIN ta
        |ORDER BY p.source""".stripMargin,

    "q_sft_pairs" ->
      """WITH tk AS (
        |  SELECT source,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |      x -> x <> '')) AS BIGINT) AS n_toks
        |  FROM documents),
        |sp AS (
        |  SELECT source, n_toks // 2 AS p_toks,
        |    n_toks - n_toks // 2 AS c_toks
        |  FROM tk WHERE n_toks >= 2)
        |SELECT source, COUNT(*) AS n_pairs,
        |  CAST(SUM(p_toks) AS BIGINT) // COUNT(*) AS mean_prompt_toks,
        |  CAST(SUM(c_toks) AS BIGINT) // COUNT(*) AS mean_completion_toks,
        |  CAST(SUM(CASE WHEN c_toks <= 128 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_fit,
        |  CAST(SUM(CASE WHEN c_toks <= 128 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // COUNT(*) AS fit_ppm
        |FROM sp
        |GROUP BY source ORDER BY source""".stripMargin,

    "q_filter_funnel" ->
      """WITH t AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |      x -> x <> '')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |      x -> x IN ('the', 'a', 'of', 'and', 'in'))) AS BIGINT) AS n_stop
        |  FROM documents),
        |st AS (
        |  SELECT CAST(
        |      CASE WHEN n_tokens >= 25 THEN 1 ELSE 0 END
        |    + CASE WHEN n_tokens >= 25 AND n_chars <= n_tokens * 8
        |           THEN 1 ELSE 0 END
        |    + CASE WHEN n_tokens >= 25 AND n_chars <= n_tokens * 8
        |           AND n_stop > 0 THEN 1 ELSE 0 END
        |    + CASE WHEN n_tokens >= 25 AND n_chars <= n_tokens * 8
        |           AND n_stop > 0 AND lang <> 'und' THEN 1 ELSE 0 END
        |    AS BIGINT) AS stage_reached
        |  FROM t),
        |bys AS (SELECT stage_reached, COUNT(*) AS n FROM st GROUP BY 1),
        |stages AS (SELECT unnest(generate_series(0, 4)) AS stage),
        |cum AS (
        |  SELECT s.stage, CAST(COALESCE(SUM(b.n), 0) AS BIGINT) AS n_docs
        |  FROM stages s LEFT JOIN bys b ON b.stage_reached >= s.stage
        |  GROUP BY s.stage),
        |tot AS (SELECT n_docs AS n0 FROM cum WHERE stage = 0)
        |SELECT c.stage,
        |  CASE c.stage WHEN 0 THEN 'all' WHEN 1 THEN 'min_length'
        |    WHEN 2 THEN 'char_ratio' WHEN 3 THEN 'stopword'
        |    ELSE 'lang_known' END AS stage_name,
        |  c.n_docs,
        |  CASE WHEN t.n0 = 0 THEN NULL
        |       ELSE c.n_docs * 1000000 // t.n0 END AS retained_ppm,
        |  CASE WHEN p.n_docs IS NULL OR p.n_docs = 0 THEN NULL
        |       ELSE (p.n_docs - c.n_docs) * 1000000 // p.n_docs
        |  END AS dropped_ppm
        |FROM cum c LEFT JOIN cum p ON p.stage = c.stage - 1 CROSS JOIN tot t
        |ORDER BY c.stage""".stripMargin)
}
