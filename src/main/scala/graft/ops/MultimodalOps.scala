package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.QueryDef
import graft.io.Tables

/** Multimodal-column plumbing (driver north-star: treat image/audio/video as
  * opaque `binary` columns with typed metadata; decode / feature-extract /
  * frame-sample as batch functions over them).
  *
  * The actual media DECODING is a stub — this container has no image/audio
  * codecs — marked [STUB] below: payloads are deterministic fake bytes (the
  * document text utf-8-encoded) and "features" are byte statistics. What IS
  * real, and what these operators exercise end-to-end, is the Spark-side
  * plumbing a 100 TB media pipeline needs: BinaryType payload columns,
  * StructType metadata carried next to them, ArrayType(BinaryType) frame
  * slicing, and a `mapPartitions` batch-feature-extraction seam with an
  * explicit output schema (the Scala counterpart of a `mapInPandas` decode
  * UDF: one invocation per partition, vectorizable inside, schema fixed up
  * front). Swapping the stub for a real codec changes ONE function body and
  * no plan shape.
  *
  * Scale notes: media rows are wide (payload-dominated), so every operator
  * here prunes to the columns it needs before any shuffle; the feature
  * extractor is a narrow map (no shuffle at all); frame slicing is
  * per-row compute. Metadata-only queries never touch the payload column —
  * parquet column pruning keeps them cheap.
  */
object MultimodalOps {

  private val FrameBytes = 32

  /** The synthetic media table: payload = utf-8 bytes of the document text
    * [STUB for a real decoded asset], metadata derived deterministically
    * from doc_id so the oracle can re-derive it. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      $"doc_id",
      encode($"text", "UTF-8").as("payload"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          ($"doc_id" % 3 + 1).cast("int")).as("media_type"),
        (lit(64) + ($"doc_id" % 8) * 16).cast("int").as("width"),
        (lit(48) + ($"doc_id" % 5) * 16).cast("int").as("height")).as("meta"))

  /** Payload byte stats + metadata projection — metadata/size queries never
    * deserialize the payload beyond its length. */
  val bytesStats: QueryDef = QueryDef(
    "mm_bytes_stats",
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type
      |FROM documents ORDER BY doc_id""".stripMargin,
  ) { (spark, dir) =>
    mediaTable(spark, dir)
      .select($"doc_id", length($"payload").cast("long").as("n_bytes"),
        $"meta.media_type".as("media_type"))
      .orderBy($"doc_id")
  }

  /** Metadata-predicate scan + per-type rollup (filter on struct fields). */
  val metaFilter: QueryDef = QueryDef(
    "mm_meta_filter",
    """WITH m AS (
      |  SELECT doc_id,
      |         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |         (64 + (doc_id % 8) * 16)::INT AS width
      |  FROM documents)
      |SELECT media_type, count(*) AS n_assets, CAST(sum(width) AS BIGINT) AS total_width
      |FROM m WHERE width >= 128 GROUP BY media_type ORDER BY media_type""".stripMargin,
  ) { (spark, dir) =>
    mediaTable(spark, dir)
      .filter($"meta.width" >= 128)
      .groupBy($"meta.media_type".as("media_type"))
      .agg(count(lit(1)).as("n_assets"),
        sum($"meta.width").cast("long").as("total_width"))
      .orderBy($"media_type")
  }

  /** Frame sampling: slice the payload into fixed-size frames
    * (ArrayType(BinaryType)), report frame geometry. A video pipeline would
    * substitute real frame boundaries; the slicing plumbing is identical. */
  val frameSample: QueryDef = QueryDef(
    "mm_frame_sample",
    s"""SELECT doc_id,
       |       CAST(ceil(octet_length(encode(text)) / $FrameBytes.0) AS BIGINT) AS n_frames,
       |       CAST(least(octet_length(encode(text)), $FrameBytes) AS BIGINT) AS first_frame_bytes
       |FROM documents ORDER BY doc_id""".stripMargin,
  ) { (spark, dir) =>
    mediaTable(spark, dir)
      .select($"doc_id", frames($"payload").as("fr"))
      .select($"doc_id",
        size($"fr").cast("long").as("n_frames"),
        // empty payload → no frames → 0 bytes (matches the oracle's least())
        coalesce(length(element_at($"fr", 1)), lit(0)).cast("long")
          .as("first_frame_bytes"))
      .orderBy($"doc_id")
  }

  /** payload → array of FrameBytes-sized binary slices (substr works on
    * BinaryType; the last frame is the remainder). An empty payload yields
    * an EMPTY array — ceil(0/32)=0 frames — matching the oracle's count
    * rather than forcing a single zero-length frame through sequence(0,0). */
  private[graft] def frames(payload: org.apache.spark.sql.Column) =
    when(length(payload) === 0,
      array().cast(ArrayType(BinaryType)))
    .otherwise(transform(
      sequence(lit(0),
        ceil(length(payload) / lit(FrameBytes.toDouble)).cast("int") - 1),
      i => substring(payload, (i * FrameBytes + 1).cast("int"), lit(FrameBytes))))

  /** Feature-extraction output schema — fixed up front, like a decode UDF's
    * return schema. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("byte_sum", LongType),
    StructField("byte_mean", DoubleType),
    StructField("head", BinaryType)))

  /** [STUB] Batch "decode + feature extract" over binary payloads via
    * mapPartitions: the per-batch seam where a real implementation would
    * call a codec (decode → resize → embed). Features here are byte stats —
    * deterministic, codec-free — but the shape (binary in, typed struct
    * out, one call per partition, no shuffle) is the production plumbing. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select($"doc_id", $"payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
        Row(id, bytes.length, sum,
          if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length,
          bytes.take(8))
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  val all: Seq[QueryDef] = Seq(bytesStats, metaFilter, frameSample)
}
