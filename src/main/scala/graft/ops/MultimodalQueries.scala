package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.exec.Scans

/** One record of the opaque-binary media table: the multimodal data model
  * (binary payload + typed metadata). Top-level case classes so Spark
  * derives product Encoders.
  */
final case class MediaRecord(
    doc_id: Long,
    media_type: String,
    blob: Array[Byte],
    width: Int,
    height: Int,
    channels: Int)

final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    width: Long,
    height: Long,
    feat_0: Double,
    feat_1: Double,
    feat_2: Double,
    feat_3: Double)

/** Multimodal-column plumbing — images/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in batched
  * executor-side passes (SURVEY.md extension mandate).
  *
  * The real media codecs are not in this container, so `decodeStub` is a
  * clearly-marked deterministic FAKE decoder (first bytes → features);
  * everything around it — binary column, metadata schema, partition-wise
  * batched extraction via `mapPartitions` on a typed `Dataset`, and the
  * frame-sampling fan-out — is the real Spark plumbing a production
  * decoder would drop into. On a cluster each partition's records are
  * decoded in one executor pass (the JVM analog of a
  * `mapInPandas`/Arrow-batch UDF), so a 100 TB media corpus decodes
  * embarrassingly parallel with no shuffle.
  */
object MultimodalQueries {

  /** STUB — stands in for an image decoder (e.g. JPEG → pixels →
    * pooled features). Deterministic: features are the first 4 payload
    * bytes scaled to [0,1]. A real implementation would decode
    * `r.blob` with an imaging library here; the signature and the
    * batch shape are what matter.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    def feat(i: Int): Double =
      if (i < r.blob.length) math.round(r.blob(i).toDouble / 255.0 * 1e6) / 1e6
      else 0.0
    MediaFeatures(r.doc_id, r.media_type, r.blob.length.toLong,
      r.width.toLong, r.height.toLong, feat(0), feat(1), feat(2), feat(3))
  }

  /** The media table: documents' text re-encoded as an opaque binary
    * payload with typed metadata — the `BinaryType` pass-through data
    * model of SURVEY.md §1 (UDT blobs) extended with media metadata.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Scans.table(s, dir, "documents")
      .select(
        col("doc_id"),
        lit("image").as("media_type"),
        col("text").cast("binary").as("blob"),
        (lit(64) + col("doc_id") % 64).cast("int").as("width"),
        (lit(64) + col("doc_id") % 48).cast("int").as("height"),
        lit(3).as("channels"))

  val entries: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // multimodal_decode — batched feature extraction over the binary
    // media column: typed Dataset → mapPartitions(decodeStub) → features.
    // ------------------------------------------------------------------
    QueryDef("multimodal_decode",
      """SELECT doc_id, 'image' AS media_type,
        |       length(text) AS n_bytes,
        |       64 + doc_id % 64 AS width,
        |       64 + doc_id % 48 AS height,
        |       round(ascii(substr(text, 1, 1)) / 255.0, 6) AS feat_0,
        |       round(ascii(substr(text, 2, 1)) / 255.0, 6) AS feat_1,
        |       round(ascii(substr(text, 3, 1)) / 255.0, 6) AS feat_2,
        |       round(ascii(substr(text, 4, 1)) / 255.0, 6) AS feat_3
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = mediaTable(s, dir).as[MediaRecord]
      // one executor pass per partition — batch boundary = partition
      media.mapPartitions(_.map(decodeStub)).toDF()
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // multimodal_frame_sample — video-style frame sampling: 4 evenly
    // spaced 8-byte "frames" per payload, fanned out one row per frame
    // (posexplode) — the shape of a frame-extraction pipeline stage.
    // ------------------------------------------------------------------
    QueryDef("multimodal_frame_sample",
      """SELECT d.doc_id, u.i AS frame_idx,
        |       md5(substr(d.text, 1 + u.i * ((length(d.text) - 8) // 3), 8)) AS frame_md5
        |FROM documents d, unnest(generate_series(0, 3)) AS u(i)
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
      Scans.table(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(expr(
            "transform(sequence(0, 3), f -> md5(substring(text, 1 + f * ((length(text) - 8) div 3), 8)))")))
        .select(col("doc_id"), col("pos").cast("long").as("frame_idx"),
          col("col").as("frame_md5"))
        .orderBy(col("doc_id"), col("frame_idx"))
    },

    // ------------------------------------------------------------------
    // multimodal_resize — batched resize pass: typed Dataset →
    // mapPartitions(resizeStub) → halved dimensions + downsampled
    // payload. The STUB "downsample" keeps the first ceil(n/4) bytes (a
    // real resampler drops into the same signature); dims, byte counts
    // and payload digest are all verified by the oracle.
    // ------------------------------------------------------------------
    QueryDef("multimodal_resize",
      """SELECT doc_id,
        |       64 + doc_id % 64 AS width, 64 + doc_id % 48 AS height,
        |       (64 + doc_id % 64) // 2 AS new_width,
        |       (64 + doc_id % 48) // 2 AS new_height,
        |       (length(text) + 3) // 4 AS n_bytes,
        |       md5(substr(text, 1, (length(text) + 3) // 4)) AS resized_md5
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = mediaTable(s, dir).as[MediaRecord]
      media.mapPartitions(_.map { r =>
        val n = (r.blob.length + 3) / 4 // STUB: crop-style 4:1 downsample
        val out = java.util.Arrays.copyOfRange(r.blob, 0, n)
        val md5hex = java.security.MessageDigest.getInstance("MD5")
          .digest(out).map("%02x".format(_)).mkString
        (r.doc_id, r.width.toLong, r.height.toLong,
          (r.width / 2).toLong, (r.height / 2).toLong, n.toLong, md5hex)
      }).toDF("doc_id", "width", "height", "new_width", "new_height",
        "n_bytes", "resized_md5")
        .orderBy(col("doc_id"))
    },

    // ------------------------------------------------------------------
    // multimodal_metadata_agg — metadata-only pass: per media type,
    // payload-size stats computed WITHOUT touching the blob bytes
    // (column pruning keeps the scan narrow — the point of separating
    // metadata from payload).
    // ------------------------------------------------------------------
    QueryDef("multimodal_metadata_agg",
      """SELECT 'image' AS media_type, count(*) AS n_media,
        |       min(length(text)) AS min_bytes,
        |       max(length(text)) AS max_bytes,
        |       CAST(sum(length(text)) AS BIGINT) AS total_bytes
        |FROM documents""".stripMargin) { (s, dir) =>
      mediaTable(s, dir)
        .select(col("media_type"), length(col("blob")).cast("long").as("n_bytes"))
        .groupBy(col("media_type"))
        .agg(count(lit(1)).as("n_media"),
          min(col("n_bytes")).as("min_bytes"),
          max(col("n_bytes")).as("max_bytes"),
          sum(col("n_bytes")).as("total_bytes"))
    },

    // ------------------------------------------------------------------
    // multimodal_content_dedup — exact media dedup by payload digest:
    // md5 over the opaque binary column groups byte-identical blobs
    // (the image/audio dedup every multimodal corpus runs before
    // training). One shuffle on the 16-byte digest — blob bytes are
    // hashed where they live and never shuffled themselves; the keeper
    // is the min doc_id per group (same keep-first contract as
    // dedup_exact). The oracle hashes the same bytes (the blob IS the
    // utf-8 text payload, so DuckDB's md5(text) agrees).
    // ------------------------------------------------------------------
    QueryDef("multimodal_content_dedup",
      """WITH h AS (
        |  SELECT md5(text) AS ch, min(doc_id) AS keeper, count(*) AS copies
        |  FROM documents GROUP BY md5(text))
        |SELECT count(*) AS n_groups,
        |       CAST(sum(copies) AS BIGINT) AS n_blobs,
        |       CAST(count(CASE WHEN copies > 1 THEN 1 END) AS BIGINT)
        |         AS n_dup_groups,
        |       CAST(sum(keeper) AS BIGINT) AS sum_keeper_ids
        |FROM h""".stripMargin) { (s, dir) =>
      mediaTable(s, dir)
        .groupBy(md5(col("blob")).as("ch"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("copies"))
        .agg(count(lit(1)).as("n_groups"),
          sum(col("copies")).cast("long").as("n_blobs"),
          count(when(col("copies") > 1, 1)).cast("long").as("n_dup_groups"),
          sum(col("keeper")).cast("long").as("sum_keeper_ids"))
    })
}
