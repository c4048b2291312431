package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus a batched decode/feature-extract
  * stage.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic FAKE (`fakeDecode`): payloads are
  * synthesized from the document text (64 md5-derived bytes) and
  * "decoding" computes byte statistics. Everything around the stub is
  * real and tested: the binary+metadata schema, the partition-parallel
  * batched UDF shape (`mapPartitions` over fixed-size batches — the
  * Scala analogue of an Arrow-batched pandas UDF), and the
  * partitioning/pushdown behavior of the surrounding plan.
  *
  * Scale notes: media payloads dominate row width at 100 TB, so the
  * media table keeps payloads in their own column (parquet column
  * pruning skips them unless projected — m1 projects only the digest),
  * and the decode stage is map-only: no shuffle, one pass, arbitrary
  * parallelism.
  */
object MultimodalOps {

  private val PayloadRepeats = 4 // 4 × 16 md5 bytes = 64-byte payload

  /** The media table: doc_id + opaque payload + typed metadata struct.
    * (In production this is `spark.read.format("binaryFile")` or a
    * parquet table with a binary column; here payloads are synthesized
    * deterministically from `documents.text`.) */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      unhex(repeat(md5(col("text")), PayloadRepeats)).as("payload"),
      struct(
        lit("image").as("media_type"),
        lit(8).as("width"),
        lit(8).as("height"),
        length(col("text")).cast("long").as("source_bytes")).as("meta"))

  /** m1: schema/digest view — metadata columns + payload length + md5
    * digest (the payload itself stays unprojected downstream, proving
    * column pruning keeps the heavy bytes out of the scan when only
    * metadata is needed). */
  def mediaSchema(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir).select(
      col("doc_id"),
      col("meta.media_type").as("media_type"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      length(col("payload")).cast("long").as("n_bytes"),
      // digest over the hex encoding (DuckDB md5 takes VARCHAR only)
      md5(lower(hex(col("payload")))).as("payload_md5"))
      .orderBy(col("doc_id"))

  /** The FAKE decode: byte statistics standing in for pixel decode.
    * Deterministic, pure, and exercised by unit tests. */
  private[queries] def fakeDecode(payload: Array[Byte]): (Double, Long) = {
    val unsigned = payload.map(b => (b & 0xff).toLong)
    val mean = unsigned.sum.toDouble / unsigned.length
    val thumb = unsigned.take(4).sum // "2x2 thumbnail" checksum
    (math.rint(mean * 1e6) / 1e6, thumb)
  }

  private val BatchSize = 64

  /** m2: batched decode/feature-extract over partitions — the
    * `mapInPandas` batch shape in Scala: fixed-size batches inside each
    * partition, one output row per media row, no shuffle. */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = mediaTable(s, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map {
        case (id, payload) =>
          val (mean, thumb) = fakeDecode(payload)
          (id, mean, thumb, payload.length.toLong)
      }))
      .toDF("doc_id", "byte_mean", "thumb_sum", "n_bytes")
    out.orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_media_schema" -> (mediaSchema _),
    "m2_media_features" -> (mediaFeatures _))

  /** m2 is not SQL-expressible (JVM decode stub) → rows-only gate +
    * MultimodalSpec's exact-value assertions. */
  val oracle: Map[String, String] = Map(
    "m1_media_schema" ->
      s"""SELECT doc_id, 'image' AS media_type, 8 AS width, 8 AS height,
         | CAST(octet_length(unhex(repeat(md5(text), $PayloadRepeats))) AS BIGINT)
         |   AS n_bytes,
         | md5(lower(hex(unhex(repeat(md5(text), $PayloadRepeats))))) AS payload_md5
         |FROM documents ORDER BY doc_id""".stripMargin)
}
