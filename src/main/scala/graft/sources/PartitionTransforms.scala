package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions.{col, datediff, lit, pmod, substring, to_date, unix_micros}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HIDDEN PARTITIONING for snapshot tables (Iceberg's headline
  * capability, re-expressed in this format's manifest grammar): a
  * declarative `#part=` spec of MONOTONIC transforms over data
  * columns —
  *
  *   identity(c) | days(ts) | truncate(w,c)
  *
  * with three effects, none of which the reader ever has to know
  * about (queries keep filtering the BASE column — that is what makes
  * the partitioning "hidden"):
  *
  *  1. WRITE CLUSTERING: every batch that lands on a spec'd table is
  *     range-clustered by its transform tuple (plus a spread key, so
  *     one hot partition value still fans across tasks), making file
  *     layout a property of the DECLARED spec instead of an accident
  *     of ingest order.
  *  2. MANIFEST TUPLES: each new file records its transform-domain
  *     bounds as synthetic `__pt$<transform>` entries inside the
  *     existing `#zm=` stat line — exact (min = max) when the file
  *     holds one partition value, and always sound because every
  *     supported transform is monotonic non-decreasing, so
  *     [f(min), f(max)] bounds f over the file's rows. Riding the
  *     stat-line protocol means tuples inherit carry-forward, delta
  *     manifests, anchors and vacuum for free.
  *  3. SCAN PRUNING: pushed filters on the BASE column translate into
  *     transform-domain conjuncts (`ts >= T` → `days(ts) >=
  *     days(T)`), evaluated per file by the same zone-map provers —
  *     partition pruning and stat pruning are ONE manifest-resident
  *     pass, zero file I/O. Translation literally only strengthens
  *     the filter set (every translated conjunct is implied by its
  *     source), so pruning soundness reduces to the provers'.
  *
  * Spec evolution is metadata-only: the `#part=` line is table STATE
  * (inherited across deltas, restated to change), old files keep the
  * tuples of the spec they were written under, and pruning consults
  * whatever entries each file actually carries — the per-file design
  * that makes Iceberg's spec evolution safe.
  *
  * Null semantics: tuple bounds ignore null source rows (zone-map
  * min/max contract), which is sound because every translated
  * predicate is null-rejecting on the base column. Strings truncate
  * on ASCII prefixes only (parquet stat order is unsigned-byte
  * lexicographic; an ASCII prefix is order-preserving there, a
  * multi-byte cut need not be) — non-ASCII bounds simply derive no
  * tuple, costing pruning, never correctness.
  */
object PartitionTransforms {

  /** Synthetic stat-key namespace. A key is `__pt$` + the transform's
    * canonical repr, e.g. `__pt$days(ts)` — self-describing, so scan
    * translation needs no spec plumbing: the keys present in a file's
    * stats ARE its partition tuple. */
  val StatPrefix = "__pt$"

  private val NamePat = "[A-Za-z_][A-Za-z0-9_]*"
  private val IdentityRe = s"identity\\(($NamePat)\\)".r
  private val DaysRe = s"days\\(($NamePat)\\)".r
  private val TruncRe = s"truncate\\((\\d+),($NamePat)\\)".r

  sealed trait PT {
    def source: String
    def repr: String
    def statKey: String = StatPrefix + repr
    def withSource(s: String): PT
  }
  final case class PIdentity(source: String) extends PT {
    override def repr: String = s"identity($source)"
    override def withSource(s: String): PT = copy(source = s)
  }
  final case class PDays(source: String) extends PT {
    override def repr: String = s"days($source)"
    override def withSource(s: String): PT = copy(source = s)
  }
  final case class PTruncate(width: Int, source: String) extends PT {
    override def repr: String = s"truncate($width,$source)"
    override def withSource(s: String): PT = copy(source = s)
  }

  def parseOne(s: String): PT = s.trim match {
    case IdentityRe(c) => PIdentity(c)
    case DaysRe(c) => PDays(c)
    case TruncRe(w, c) =>
      require(w.toInt > 0, s"truncate width must be positive in '$s'")
      PTruncate(w.toInt, c)
    case other => throw new IllegalArgumentException(
      s"unsupported partition transform '$other' — supported: " +
        "identity(col), days(tsCol), truncate(width,col) over plain " +
        "[A-Za-z0-9_] column names")
  }

  /** Parse a full spec (`days(ts),truncate(2,tag)`); empty → Nil.
    * Transforms split on the commas BETWEEN them (every transform
    * ends with a paren), not the ones inside truncate's arguments. */
  def parse(spec: String): Seq[PT] =
    spec.split("(?<=\\)),").iterator.map(_.trim).filter(_.nonEmpty)
      .map(parseOne).toSeq

  def render(ts: Seq[PT]): String = ts.map(_.repr).mkString(",")

  /** Validate `ts` against a table schema: sources must exist and be
    * of a type the transform is defined on. */
  def validate(ts: Seq[PT], schema: StructType): Unit = {
    require(ts.map(_.repr).distinct.size == ts.size,
      "duplicate transform in partition spec")
    ts.foreach { t =>
      val f = schema.fields.find(_.name == t.source).getOrElse(
        throw new IllegalArgumentException(
          s"partition transform ${t.repr}: column '${t.source}' is not " +
            s"in the table schema ${schema.fieldNames.mkString("[", ",", "]")}"))
      val ok = t match {
        case _: PIdentity => f.dataType match {
          case ByteType | ShortType | IntegerType | LongType |
              _: StringType | DateType | TimestampType |
              TimestampNTZType => true
          case _ => false
        }
        case _: PDays => f.dataType match {
          case DateType | TimestampType | TimestampNTZType => true
          case _ => false
        }
        case _: PTruncate => f.dataType match {
          case ByteType | ShortType | IntegerType | LongType |
              _: StringType => true
          case _ => false
        }
      }
      require(ok, s"partition transform ${t.repr} is not defined on " +
        s"${f.dataType.simpleString} column '${t.source}'")
    }
  }

  private val MicrosPerDay = 86400000000L

  /** The transform as a Column over the frame being written — the
    * write-clustering key. Must agree EXACTLY with the stat-domain
    * math in [[deriveStats]]/[[translate]] (all three express the same
    * function, in Spark SQL, stat-string and literal domains). */
  def valueColumn(t: PT, dt: DataType): Column = t match {
    case PIdentity(c) => col(c)
    case PDays(c) => dt match {
      case DateType => datediff(col(c), to_date(lit("1970-01-01")))
      case _ =>
        // NTZ casts through TIMESTAMP (sessions run UTC, so the micros
        // are identical — and this is only a CLUSTERING key: tuple
        // bounds derive from the file's own parquet stats, so even a
        // non-UTC session could only loosen layout, never correctness)
        val src = dt match {
          case TimestampNTZType => col(c).cast(TimestampType)
          case _ => col(c)
        }
        // floorDiv via pmod: (m - pmod(m, d)) / d is exact on longs
        val m = unix_micros(src)
        (m - pmod(m, lit(MicrosPerDay))) / lit(MicrosPerDay)
    }
    case PTruncate(w, c) => dt match {
      case _: StringType => substring(col(c), 1, w)
      case _ => col(c) - pmod(col(c), lit(w.toLong))
    }
  }

  /** Derive the synthetic tuple entries for one new file from its
    * collected REAL column stats (no extra I/O: monotonicity makes
    * [f(min), f(max)] the exact transform bounds). `physOf` maps the
    * spec's logical source to the physical stat key (identity when
    * the table is unmapped); `typeOf` resolves the source's LOGICAL
    * type. A source with no usable stat derives nothing — pruning
    * loss only. */
  def deriveStats(ts: Seq[PT], cols: Map[String, ZoneMaps.ColStat],
                  physOf: String => String,
                  typeOf: String => Option[DataType])
      : Map[String, ZoneMaps.ColStat] =
    ts.flatMap { t =>
      val phys = physOf(t.source)
      for {
        st <- cols.get(phys)
        dt <- typeOf(t.source)
        derived <- deriveOne(t, st, dt)
      } yield (StatPrefix + t.withSource(phys).repr) -> derived
    }.toMap

  private def deriveOne(t: PT, st: ZoneMaps.ColStat, dt: DataType)
      : Option[ZoneMaps.ColStat] = t match {
    case _: PIdentity => Some(st)
    case _: PDays => (st.kind, dt) match {
      case ('l', DateType) => Some(st) // date stats are already days
      case ('l', TimestampType | TimestampNTZType) =>
        for {
          mn <- st.min.toLongOption; mx <- st.max.toLongOption
        } yield ZoneMaps.ColStat('l',
          Math.floorDiv(mn, MicrosPerDay).toString,
          Math.floorDiv(mx, MicrosPerDay).toString, st.nulls)
      case _ => None
    }
    case PTruncate(w, _) => st.kind match {
      case 'l' =>
        for { mn <- st.min.toLongOption; mx <- st.max.toLongOption }
        yield ZoneMaps.ColStat('l',
          (mn - Math.floorMod(mn, w.toLong)).toString,
          (mx - Math.floorMod(mx, w.toLong)).toString, st.nulls)
      case 's' if isAscii(st.min) && isAscii(st.max) =>
        Some(ZoneMaps.ColStat('s', st.min.take(w), st.max.take(w), st.nulls))
      case _ => None
    }
  }

  private def isAscii(s: String): Boolean = s.forall(_ < 128)

  /** The transform reprs present in a scan's stats — parsed back from
    * the synthetic keys, grouped by PHYSICAL source column. Computed
    * once per scan from the union of per-file stat keys. */
  def transformsInStats(statKeys: Iterable[String]): Map[String, Seq[PT]] =
    statKeys.iterator.filter(_.startsWith(StatPrefix))
      .map(_.stripPrefix(StatPrefix)).toSeq.distinct
      .flatMap(r => scala.util.Try(parseOne(r)).toOption)
      .groupBy(_.source)

  /** Translate pushed filters into transform-domain conjuncts over the
    * synthetic stat keys. Every produced expression is IMPLIED by its
    * source filter (monotonicity), so appending them to the prover's
    * filter set can only prune files the original predicate already
    * excludes. Orientation note: strict bounds weaken to inclusive in
    * the transform domain (`a > v` implies `f(a) >= f(v)`). */
  def translate(filters: Seq[Expression], bySource: Map[String, Seq[PT]])
      : Seq[Expression] =
    if (bySource.isEmpty) Seq.empty
    else filters.flatMap(f => translateOne(f, bySource))

  private def ptAttr(t: PT, dt: DataType): AttributeReference =
    AttributeReference(t.statKey, dt, nullable = true)()

  private def translateOne(e: Expression, by: Map[String, Seq[PT]])
      : Option[Expression] = {
    def all(a: Attribute, l: Literal)(
        mk: (PT, Literal) => Option[Expression]): Option[Expression] = {
      val es = by.getOrElse(a.name, Seq.empty)
        .flatMap(t => tLit(t, l).flatMap(tl => mk(t, tl)))
      es.reduceOption(And)
    }
    e match {
      case EqualTo(a: Attribute, l: Literal) =>
        all(a, l)((t, tl) => Some(EqualTo(ptAttr(t, tl.dataType), tl)))
      case EqualTo(l: Literal, a: Attribute) =>
        all(a, l)((t, tl) => Some(EqualTo(ptAttr(t, tl.dataType), tl)))
      case EqualNullSafe(a: Attribute, l: Literal) if l.value != null =>
        all(a, l)((t, tl) => Some(EqualTo(ptAttr(t, tl.dataType), tl)))
      case GreaterThan(a: Attribute, l: Literal) =>       // a > v ⟹ f(a) >= f(v)
        all(a, l)((t, tl) => Some(GreaterThanOrEqual(ptAttr(t, tl.dataType), tl)))
      case GreaterThanOrEqual(a: Attribute, l: Literal) =>
        all(a, l)((t, tl) => Some(GreaterThanOrEqual(ptAttr(t, tl.dataType), tl)))
      case LessThan(a: Attribute, l: Literal) =>          // a < v ⟹ f(a) <= f(v)
        all(a, l)((t, tl) => Some(LessThanOrEqual(ptAttr(t, tl.dataType), tl)))
      case LessThanOrEqual(a: Attribute, l: Literal) =>
        all(a, l)((t, tl) => Some(LessThanOrEqual(ptAttr(t, tl.dataType), tl)))
      case GreaterThan(l: Literal, a: Attribute) =>       // v > a ⟺ a < v
        all(a, l)((t, tl) => Some(LessThanOrEqual(ptAttr(t, tl.dataType), tl)))
      case GreaterThanOrEqual(l: Literal, a: Attribute) =>
        all(a, l)((t, tl) => Some(LessThanOrEqual(ptAttr(t, tl.dataType), tl)))
      case LessThan(l: Literal, a: Attribute) =>          // v < a ⟺ a > v
        all(a, l)((t, tl) => Some(GreaterThanOrEqual(ptAttr(t, tl.dataType), tl)))
      case LessThanOrEqual(l: Literal, a: Attribute) =>
        all(a, l)((t, tl) => Some(GreaterThanOrEqual(ptAttr(t, tl.dataType), tl)))
      case In(a: Attribute, vs)
          if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        // per-element translation, folded back to In per transform
        val ts = by.getOrElse(a.name, Seq.empty)
        val es = ts.flatMap { t =>
          val tls = vs.map(v => tLit(t, v.asInstanceOf[Literal]))
          if (tls.exists(_.isEmpty)) None
          else Some(In(ptAttr(t, tls.head.get.dataType),
            tls.map(_.get).distinct))
        }
        es.reduceOption(And)
      case And(x, y) =>
        (translateOne(x, by), translateOne(y, by)) match {
          case (Some(tx), Some(ty)) => Some(And(tx, ty))
          case (some @ Some(_), None) => some
          case (None, some) => some
        }
      case Or(x, y) =>
        // sound only when BOTH branches translate (x∨y can prune a
        // file only if each branch independently proves empty)
        for { tx <- translateOne(x, by); ty <- translateOne(y, by) }
          yield Or(tx, ty)
      case _ => None
    }
  }

  /** The literal moved into `t`'s transform domain, or None when the
    * types don't line up (conservative: no translation, no pruning). */
  private def tLit(t: PT, l: Literal): Option[Literal] =
    if (l.value == null) None
    else t match {
      case _: PIdentity => Some(l)
      case _: PDays => (l.dataType, l.value) match {
        case (DateType, d: java.lang.Integer) =>
          Some(Literal(d.longValue, LongType))
        case (TimestampType | TimestampNTZType, m: java.lang.Long) =>
          Some(Literal(Math.floorDiv(m.longValue, MicrosPerDay), LongType))
        case _ => None
      }
      case PTruncate(w, _) => (l.dataType, l.value) match {
        case (ByteType | ShortType | IntegerType | LongType,
            v: java.lang.Number)
            if !v.isInstanceOf[java.lang.Double] &&
              !v.isInstanceOf[java.lang.Float] =>
          val x = v.longValue
          Some(Literal(x - Math.floorMod(x, w.toLong), LongType))
        case (_: StringType, s: UTF8String) if isAscii(s.toString) =>
          Some(Literal(UTF8String.fromString(s.toString.take(w)), StringType))
        case _ => None
      }
    }

  /** Cluster a batch for a spec'd table: range-partition by the
    * transform tuple plus a spread key (one hot partition value still
    * fans out across tasks; AQE coalesces the dust of small batches).
    * Sound regardless of layout — clustering affects only how tight
    * each file's derived tuple bounds come out.
    *
    * The spread key is a DETERMINISTIC row-content hash, never
    * monotonically_increasing_id(): a nondeterministic shuffle key
    * re-deals rows on task retry (the SPARK-23207 class — recomputed
    * upstream partitions land rows in different range partitions than
    * already-committed task outputs, duplicating or losing them). */
  def cluster(df: DataFrame, ts: Seq[PT]): DataFrame = {
    val schema = df.schema
    val cols = ts.flatMap { t =>
      schema.fields.find(_.name == t.source).map(f => valueColumn(t, f.dataType))
    }
    if (cols.isEmpty) df
    else {
      val spread = org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(
          df.columns.toIndexedSeq.map(col): _*),
        lit(4096))
      df.repartitionByRange((cols :+ spread): _*)
    }
  }
}
