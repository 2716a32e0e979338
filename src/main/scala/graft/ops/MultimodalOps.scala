package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus a decode/feature-extract stage.
  *
  * The container has no image/audio codecs, so the DECODE KERNEL IS A
  * DETERMINISTIC STUB (clearly marked below); everything Spark-side —
  * the schema, the binary column handling, the per-partition batch shape a
  * vectorized decoder plugs into, and the metadata projection — is real and
  * tested. Swapping `fakeDecode` for a JNI/FFmpeg call changes no plan
  * shape.
  *
  * Scale: payloads never shuffle (all derivations are map-side); metadata
  * aggregations group on small derived columns. A real pipeline would also
  * set `spark.sql.files.maxPartitionBytes` low enough that a partition of
  * payloads fits executor memory — noted here because at 100 TB the payload
  * column dominates row size.
  */
object MultimodalOps {

  /** A decoded-media record (what a real decoder would emit). */
  final case class MediaFeature(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int)

  /** Synthesize the media table from `documents`: payload = utf-8 bytes of
    * text, kind derived from the source shard. Stands in for a real
    * `binary`-column table with the same schema.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      element_at(
        typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"))

  /** DECODE STUB — deterministic fake standing in for the codec call.
    * A real implementation decodes `payload` (e.g. libjpeg/FFmpeg via JNI)
    * per partition; this derives dimensions from the byte length so tests
    * and oracles are reproducible.
    */
  private def fakeDecode(mediaId: Long, kind: String, payload: Array[Byte]): MediaFeature = {
    val n = payload.length.toLong
    MediaFeature(
      media_id = mediaId,
      kind = kind,
      n_bytes = n,
      width = (n % 640).toInt,
      height = (n % 480).toInt,
      n_frames = if (kind == "video") (n % 24).toInt else 1)
  }

  /** The per-partition decode stage: iterator-in/iterator-out so a real
    * decoder can batch, reuse codec contexts, and stream — the Scala
    * equivalent of a `mapInPandas` batch UDF. This is the ONLY non-Catalyst
    * stage in the engine, deliberately: opaque codecs cannot be expressions.
    */
  def decodeFeatures(s: SparkSession, dir: String): Dataset[MediaFeature] = {
    import s.implicits._
    mediaTable(s, dir)
      .select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // real impl: initialize the codec once per partition here
        rows.map { case (id, kind, payload) => fakeDecode(id, kind, payload) }
      }
  }

  /** Oracle-able metadata projection over the media table — pure column
    * functions (byte length, content hash, stub dimensions), mirroring what
    * [[decodeFeatures]] computes imperatively.
    */
  def mediaMeta(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir).select(
      col("media_id"),
      col("kind"),
      length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("content_hash"),
      (length(col("payload")) % 640).cast("long").as("width"),
      (length(col("payload")) % 480).cast("long").as("height"),
      when(col("kind") === "video", (length(col("payload")) % 24).cast("long"))
        .otherwise(1L).as("n_frames"))
      .orderBy("media_id")

  val mediaMetaSql: String =
    """SELECT doc_id AS media_id,
      |  ['image','audio','video'][(doc_id % 3 + 1)::INTEGER] AS kind,
      |  octet_length(text::BLOB)::BIGINT AS n_bytes,
      |  md5(text) AS content_hash,
      |  (octet_length(text::BLOB) % 640)::BIGINT AS width,
      |  (octet_length(text::BLOB) % 480)::BIGINT AS height,
      |  CASE WHEN doc_id % 3 + 1 = 3 THEN (octet_length(text::BLOB) % 24)::BIGINT
      |       ELSE 1::BIGINT END AS n_frames
      |FROM documents ORDER BY media_id""".stripMargin
}
