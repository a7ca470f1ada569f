package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit, shiftleft, when}

/** Bucketed-table helpers: pre-shuffle facts ONCE at write time so that
  * every subsequent equi-join/aggregation on the bucket key runs with
  * no exchange at all (SURVEY.md §4 / builder mandate: "co-locate joins
  * via bucketing").
  *
  * At 100 TB this is the difference between re-shuffling the fact table
  * per query and paying the shuffle once at ingest: a join of two
  * tables bucketed on the same key by the same bucket count is planned
  * as a zip of co-located buckets (SortMergeJoin with both exchanges
  * elided — asserted in BucketingSpec).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables bucketed on the same key: no exchange on either
    * side when bucket specs line up. */
  def cogroupJoin(spark: SparkSession, left: String, right: String,
                  key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Range-sorted layout: repartitionByRange + sortWithinPartitions on
    * `sortCols` before writing, so each parquet file covers a DISJOINT
    * range of the sort key and its footer min/max stats let readers
    * skip whole files/row-groups for range predicates (the time-range
    * scan pattern: at 100 TB, an hour-window query over a ts-sorted
    * event lake touches a handful of files instead of all of them).
    * Complements [[writeBucketed]]: bucket for equi-joins, range-sort
    * for range scans. BucketingSpec asserts the per-file ranges are
    * genuinely disjoint. */
  def writeRangeSorted(df: DataFrame, path: String, sortCol: String,
                       files: Int = 8): Unit =
    df.repartitionByRange(files, df.col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite)
      .parquet(path)

  /** 16-bit Morton spread: distribute the low 16 bits of `c` over the
    * even bit positions of a 32-bit lane (the classic mask-shift
    * cascade — four shifts, four ANDs, all plain built-in bitwise ops,
    * so the whole thing stays inside whole-stage codegen). */
  private def spread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xffffL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00ff00ffL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0f0f0f0fL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Z-order (Morton) key interleaving the low 16 bits of two LONG grid
    * coordinates: bit i of `a` lands at position 2i, bit i of `b` at
    * 2i+1, so sorting by the key clusters rows that are close in BOTH
    * dimensions. The multi-dimensional complement of
    * [[writeRangeSorted]]: a range-sort prunes on ONE column; a
    * z-order sort lets parquet footer min/max prune on TWO (a
    * (customer, date-window) probe touches only the files whose z-range
    * intersects the query rectangle). Callers map raw values onto a
    * 0..65535 grid first (mod, bucket rank, or epoch-day — the catalog
    * query uses mod and days-since-epoch-start). */
  def zorderKey(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Bit-spread for the 3-D Morton key: bit i of a 10-bit value lands
    * at position 3i (mask cascade validated exhaustively over the full
    * 0..1023 domain in OperatorsSpec). */
  private def spread3x10(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0x3ffL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 16)).bitwiseAND(lit(0x030000FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 8)).bitwiseAND(lit(0x0300F00FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 4)).bitwiseAND(lit(0x030C30C3L))
    x3.bitwiseOR(shiftleft(x3, 2)).bitwiseAND(lit(0x09249249L))
  }

  /** 3-D Z-order (Morton) key over three LONG grid coordinates mapped
    * to a 1024³ grid — bit i of `a` at position 3i, of `b` at 3i+1, of
    * `c` at 3i+2. The three-column layout key for (entity, time,
    * magnitude)-shaped probes: files sorted by this key are compact
    * boxes in all THREE dimensions, so parquet min/max footers prune
    * on any combination of the three predicates (same contract and
    * caller grid-mapping discipline as [[zorderKey]]). */
  def zorder3Key(a: Column, b: Column, c: Column): Column =
    spread3x10(a)
      .bitwiseOR(shiftleft(spread3x10(b), 1))
      .bitwiseOR(shiftleft(spread3x10(c), 2))

  /** Hilbert-curve position of grid cell (x, y) — the stronger 2-D
    * layout key: unlike Morton order (whose bit-interleave "jumps"
    * across the grid at power-of-two boundaries, so a file of
    * consecutive z-keys can cover two far-apart half-rectangles),
    * CONSECUTIVE Hilbert positions are always edge-adjacent cells, so
    * every range of the key is one connected, compact region — strictly
    * tighter parquet min/max pruning rectangles at the same file count
    * (asserted cell-by-cell in BucketingSpec against the Morton key).
    *
    * Classic xy2d bit algorithm (Hilbert 1891; iterative form as in
    * Warren, Hacker's Delight §16): per bit plane s = 2^(bits-1)..1,
    * accumulate the quadrant index s²·((3·rx) XOR ry) and rotate/flip
    * the sub-grid. The rotation makes each round's (x, y) a
    * CONDITIONAL of the previous round's — as one nested Column
    * expression the tree would grow ~5× per round (5^16 nodes), so the
    * transform stages one narrow projection per round instead: the
    * plan is 16 chained Projects, each evaluated once per row inside a
    * single whole-stage-codegen span (same per-row cost as the
    * hand-unrolled loop), and the staged form is reproduced verbatim
    * as chained CTEs in the DuckDB oracle.
    *
    * @param bits grid is 2^bits × 2^bits (callers pre-map onto it,
    *             same contract as [[zorderKey]]); key range [0, 4^bits)
    */
  def withHilbertKey(df: DataFrame, x: Column, y: Column, out: String,
                     bits: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val reserved = Seq("_hx", "_hy", "_rx", "_ry", out)
    val clash = df.columns.intersect(reserved)
    require(clash.isEmpty,
      s"withHilbertKey would overwrite input column(s) ${clash.mkString(", ")}")
    var cur = df
      .withColumn("_hx", x.cast("long"))
      .withColumn("_hy", y.cast("long"))
      .withColumn(out, lit(0L))
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = when(col("_hx").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      val ry = when(col("_hy").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      // withColumns evaluates the map against the PRE-update row —
      // exactly the simultaneous-assignment semantics the flip+swap
      // rotation needs
      cur = cur
        .withColumn("_rx", rx).withColumn("_ry", ry)
        .withColumns(Map(
          out -> (col(out) +
            lit(s * s) * (lit(3L) * col("_rx")).bitwiseXOR(col("_ry"))),
          "_hx" -> when(col("_ry") === 0,
              when(col("_rx") === 1, lit(s - 1) - col("_hy"))
                .otherwise(col("_hy")))
            .otherwise(col("_hx")),
          "_hy" -> when(col("_ry") === 0,
              when(col("_rx") === 1, lit(s - 1) - col("_hx"))
                .otherwise(col("_hx")))
            .otherwise(col("_hy"))))
        .drop("_rx", "_ry")
      s >>= 1
    }
    cur.drop("_hx", "_hy")
  }

  /** Write Hilbert-ordered: like [[writeZOrdered]] but on the Hilbert
    * position, so each file's key range is one CONNECTED region of the
    * grid (Morton ranges can straddle two far-apart half-rectangles at
    * power-of-two boundaries) — the tightest 2-D min/max pruning at a
    * given file count. */
  def writeHilbertOrdered(df: DataFrame, path: String, x: Column, y: Column,
                          files: Int = 8, bits: Int = 16): Unit = {
    val keyed = withHilbertKey(df, x, y, "_hkey", bits)
    keyed.repartitionByRange(files, keyed.col("_hkey"))
      .sortWithinPartitions("_hkey")
      .drop("_hkey")
      .write.mode(SaveMode.Overwrite)
      .parquet(path)
  }

  /** Write z-ordered: range-partition + sort by the interleaved key so
    * each file covers a compact rectangle of the (a, b) grid. */
  def writeZOrdered(df: DataFrame, path: String, a: Column, b: Column,
                    files: Int = 8): Unit = {
    val keyed = df.withColumn("_zkey", zorderKey(a, b))
    keyed.repartitionByRange(files, keyed.col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
      .write.mode(SaveMode.Overwrite)
      .parquet(path)
  }

  /** Write 3-D z-ordered: each file covers a compact BOX of the
    * (a, b, c) grid, so parquet footer min/max prune on any mix of
    * the three predicates (see [[zorder3Key]]). */
  def writeZOrdered3(df: DataFrame, path: String,
                     a: Column, b: Column, c: Column,
                     files: Int = 8): Unit = {
    val keyed = df.withColumn("_zkey", zorder3Key(a, b, c))
    keyed.repartitionByRange(files, keyed.col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
      .write.mode(SaveMode.Overwrite)
      .parquet(path)
  }
}
