package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.12 E6 / builder mandate).
  *
  * Media are opaque `binary` columns + typed metadata, processed
  * per-partition in batches (the Scala analogue of `mapInPandas`): the
  * executor-side iterator never materializes a partition, decode work is
  * amortized per batch, and the output schema is fixed so Catalyst can
  * plan around the black box.
  *
  * The DECODE ITSELF IS A DETERMINISTIC STUB — this container has no
  * image/audio codecs. `decodeStub` stands in for e.g. a JPEG decoder:
  * it derives pseudo width/height/format from payload bytes. Swap
  * [[MediaDecoder.decode]] for a real codec binding in production; all
  * Spark-side plumbing (schema, partitioning, batch shape) is real and
  * tested (MultimodalSpec).
  */
object Multimodal {

  case class MediaMeta(
    doc_id: Long,
    media_source: String,
    byte_len: Long,
    width: Int,
    height: Int,
    format: String)

  trait MediaDecoder extends Serializable {
    /** Decode one payload into (width, height, format). */
    def decode(payload: Array[Byte]): (Int, Int, String)
  }

  /** Deterministic fake decode: metadata derived from payload content
    * only (stable across runs/partitionings). A real implementation
    * would parse the container header here. Derivation is the first
    * md5 byte — PORTABLE (unlike JVM Arrays.hashCode), so the catalog
    * query's metadata is reproducible by the DuckDB oracle even though
    * the decode itself remains a stub. */
  object decodeStub extends MediaDecoder {
    // thread-local digest: decode runs per row inside mapPartitions —
    // no per-call provider lookup/allocation
    @transient private lazy val mdLocal =
      new ThreadLocal[java.security.MessageDigest] {
        override def initialValue(): java.security.MessageDigest =
          java.security.MessageDigest.getInstance("MD5")
      }
    def decode(payload: Array[Byte]): (Int, Int, String) = {
      val d0 = mdLocal.get().digest(payload)(0) & 0xff
      val w = 160 + (d0 % 8) * 160          // 160..1280
      val ht = 120 + ((d0 / 8) % 8) * 120   // 120..960
      val fmt = if (d0 % 2 == 0) "jpeg" else "png"
      (w, ht, fmt)
    }
  }

  /** Batched per-partition metadata extraction over a DataFrame of
    * (doc_id long, payload binary, media_source string). */
  def extractMeta(df: DataFrame, decoder: MediaDecoder = decodeStub,
                  batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[MediaMeta] = df
      .select(col("doc_id").cast("long"), col("payload"), col("media_source"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // batch boundary = where a real decoder would amortize setup
          batch.iterator.map { case (id, payload, src) =>
            val (w, h, fmt) = decoder.decode(payload)
            MediaMeta(id, src, payload.length.toLong, w, h, fmt)
          }
        }
      }
    ds.toDF()
  }

  case class Frame(doc_id: Long, frame_idx: Int, width: Int, height: Int,
                   frame_bytes: Array[Byte])

  /** Frame sampling over opaque video payloads: every `stride`-th frame
    * up to `maxFrames`, one output row per frame. The STUBBED frame
    * decode slices deterministic byte windows from the payload (a real
    * binding would seek+decode keyframes); the Spark shape — per-row
    * fan-out inside mapPartitions, fixed schema, bounded output — is
    * the real contract. */
  def sampleFrames(df: DataFrame, stride: Int = 10, maxFrames: Int = 4,
                   decoder: MediaDecoder = decodeStub): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val (w, h, _) = decoder.decode(payload)
          val nFrames = math.min(maxFrames, math.max(1, payload.length / stride))
          (0 until nFrames).iterator.map { f =>
            val start = (f * stride) % math.max(1, payload.length)
            val bytes = payload.slice(start, math.min(start + stride, payload.length))
            Frame(id, f, w, h, bytes)
          }
        }
      }.toDF()
  }

  /** Resize stub: pure metadata transform (real codecs rescale pixels;
    * the stub rescales the declared dims and re-tags the payload). */
  def resizeMeta(meta: DataFrame, targetW: Int, targetH: Int): DataFrame =
    meta.withColumn("scale_x",
        round(lit(targetW.toDouble) / col("width"), 4))
      .withColumn("scale_y", round(lit(targetH.toDouble) / col("height"), 4))
      .withColumn("width", lit(targetW))
      .withColumn("height", lit(targetH))

  /** Partitioned binary persistence: parquet with the payload as a
    * binary column, directory-partitioned by low-cardinality metadata
    * (format by default) so a scan for one modality prunes whole
    * directories, and `maxRecordsPerFile` bounds object size — a
    * 100 TB media lake becomes many well-sized files instead of a few
    * giant ones. Reads go through the ordinary parquet reader, so
    * partition pruning and payload-column pruning are Catalyst-native
    * (asserted in OperatorsSpec). */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String] = Seq("format"),
                       maxRecordsPerFile: Int = 10000): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Deterministic pseudo feature vector per payload (stands in for an
    * image/audio embedding model): `dim` floats seeded from the payload
    * hash, so identical bytes ⇒ identical features across partitions. */
  def extractFeatures(df: DataFrame, dim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val rnd = new scala.util.Random(java.util.Arrays.hashCode(payload).toLong)
          (id, Array.fill(dim)(rnd.nextFloat()))
        }
      }.toDF("doc_id", "feature")
  }
}
