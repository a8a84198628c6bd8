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
  * Two decode paths coexist, mirroring a production corpus with mixed
  * codec availability:
  *  - **PNG is decoded for real** via the JDK's `javax.imageio` (no
  *    external dependency): [[PngFixtures]] synthesizes a deterministic
  *    two-band RGB image per document, encodes it to real PNG bytes on
  *    the executor, and [[decodePng]] reads the bytes back through
  *    `ImageIO`, deriving width/height and per-channel mean features
  *    from the ACTUAL decoded pixels — a misread dimension or channel
  *    fails the DuckDB hash-compare, which predicts the same values
  *    arithmetically.
  *  - Formats whose codecs are genuinely absent from this container
  *    (JPEG/video/audio) keep [[decodeStub]], a clearly-marked
  *    deterministic FAKE (first bytes → features).
  * Everything around both — binary column, typed metadata schema,
  * partition-wise batched extraction via `mapPartitions` on a typed
  * `Dataset`, the frame-sampling fan-out — is the real Spark plumbing a
  * production decoder drops into. On a cluster each partition's records
  * decode in one executor pass (the JVM analog of a
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

  /** Deterministic PNG fixture synthesis + REAL decode via the JDK's
    * `javax.imageio` — no external imaging dependency. The fixture for
    * `doc_id` is a `(8 + id%8) × (8 + id%6)` RGB image whose top
    * `h/2` rows are one solid color and bottom rows another (both
    * colors pure functions of the id), so the per-channel pixel sums —
    * and therefore the mean-pixel features — are arithmetic in the id
    * and the DuckDB oracle can predict them without any image library.
    * Decode derives every output from the decoded raster, not the
    * metadata: dimensions from `getWidth/getHeight`, features from
    * summing `getRGB` over every pixel.
    */
  object PngFixtures {
    javax.imageio.ImageIO.setUseCache(false) // in-memory streams only

    def dims(id: Long): (Int, Int) = ((8 + id % 8).toInt, (8 + id % 6).toInt)

    def topColor(id: Long): (Int, Int, Int) =
      (((id % 256).toInt, ((id * 7 + 1) % 256).toInt, ((id * 13 + 2) % 256).toInt))

    def bottomColor(id: Long): (Int, Int, Int) =
      ((((id * 3 + 5) % 256).toInt, ((id * 11 + 7) % 256).toInt,
        ((id * 17 + 11) % 256).toInt))

    /** Real PNG bytes for the fixture image (encoded with ImageIO). */
    def encode(id: Long): Array[Byte] = {
      val (w, h) = dims(id)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val (r1, g1, b1) = topColor(id)
      val (r2, g2, b2) = bottomColor(id)
      var y = 0
      while (y < h) {
        val (r, g, b) = if (y < h / 2) (r1, g1, b1) else (r2, g2, b2)
        val rgb = (r << 16) | (g << 8) | b
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
  }

  /** REAL decode: parse the PNG payload with `ImageIO`, then derive
    * dimensions and features from the decoded raster. `n_bytes` reports
    * the decoded raster size (w·h·3 channel bytes — the decoder's
    * output, not the compressed payload, whose length is
    * codec-dependent); features are per-channel mean pixel intensities
    * in [0,1] (feat_3 = all-channel mean), rounded like the stub's.
    */
  def decodePng(r: MediaRecord): MediaFeatures = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.blob))
    require(img != null, s"doc ${r.doc_id}: payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sumR += (p >> 16) & 0xff; sumG += (p >> 8) & 0xff; sumB += p & 0xff
        x += 1
      }
      y += 1
    }
    def round6(v: Double): Double = math.round(v * 1e6) / 1e6
    MediaFeatures(r.doc_id, r.media_type, w.toLong * h * 3, w.toLong, h.toLong,
      round6(sumR / (w * h * 255.0)),
      round6(sumG / (w * h * 255.0)),
      round6(sumB / (w * h * 255.0)),
      round6((sumR + sumG + sumB) / (3.0 * w * h * 255.0)))
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
    // media column, one decode dispatch per format: 'png' records carry
    // REAL PNG payloads (synthesized per doc on the executor) and are
    // decoded for real through javax.imageio — dimensions and features
    // come from the decoded raster, and the oracle predicts them
    // arithmetically, so a decoder that misread a pixel fails the hash;
    // 'image' records keep the labeled stub (codec-less formats).
    // Typed Dataset → mapPartitions → features; no shuffle either way.
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
        |FROM documents
        |UNION ALL
        |SELECT doc_id, 'png' AS media_type,
        |       (8 + doc_id % 8) * (8 + doc_id % 6) * 3 AS n_bytes,
        |       8 + doc_id % 8 AS width,
        |       8 + doc_id % 6 AS height,
        |       round(((8 + doc_id % 8) * (((8 + doc_id % 6) // 2) * (doc_id % 256)
        |               + ((8 + doc_id % 6) - (8 + doc_id % 6) // 2) * ((doc_id * 3 + 5) % 256)))
        |             / ((8 + doc_id % 8) * (8 + doc_id % 6) * 255.0), 6) AS feat_0,
        |       round(((8 + doc_id % 8) * (((8 + doc_id % 6) // 2) * ((doc_id * 7 + 1) % 256)
        |               + ((8 + doc_id % 6) - (8 + doc_id % 6) // 2) * ((doc_id * 11 + 7) % 256)))
        |             / ((8 + doc_id % 8) * (8 + doc_id % 6) * 255.0), 6) AS feat_1,
        |       round(((8 + doc_id % 8) * (((8 + doc_id % 6) // 2) * ((doc_id * 13 + 2) % 256)
        |               + ((8 + doc_id % 6) - (8 + doc_id % 6) // 2) * ((doc_id * 17 + 11) % 256)))
        |             / ((8 + doc_id % 8) * (8 + doc_id % 6) * 255.0), 6) AS feat_2,
        |       round(((8 + doc_id % 8) * (((8 + doc_id % 6) // 2)
        |                 * ((doc_id % 256) + (doc_id * 7 + 1) % 256 + (doc_id * 13 + 2) % 256)
        |               + ((8 + doc_id % 6) - (8 + doc_id % 6) // 2)
        |                 * ((doc_id * 3 + 5) % 256 + (doc_id * 11 + 7) % 256 + (doc_id * 17 + 11) % 256)))
        |             / (3.0 * (8 + doc_id % 8) * (8 + doc_id % 6) * 255.0), 6) AS feat_3
        |FROM documents
        |ORDER BY doc_id, media_type""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = mediaTable(s, dir).as[MediaRecord]
      // ONE scan, one executor pass per partition: each record yields its
      // stub 'image' features AND a real-PNG sibling — the payload is
      // encoded and immediately decoded through ImageIO on the executor
      // (fixture synthesis stands in for reading media files; the decode
      // is the genuine article). Metadata dims on the png record are
      // deliberately 0 — the decoder must recover them from the pixels.
      media.mapPartitions(_.flatMap { r =>
          Iterator(decodeStub(r),
            decodePng(MediaRecord(r.doc_id, "png", PngFixtures.encode(r.doc_id), 0, 0, 3)))
        })
        .toDF()
        .orderBy(col("doc_id"), col("media_type"))
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
    },

    // ------------------------------------------------------------------
    // multimodal_text_pair — image-text pair ASSEMBLY, the step that
    // builds a contrastive-training corpus (caption + image) out of the
    // two modalities: decode each document's PNG for real (dimensions
    // from the raster, exactly like multimodal_decode), join it to its
    // caption, and admit the pair only when BOTH sides clear the gate —
    // image area ≥ 100 px and caption length inside the [150, 450] char
    // window (tiny images and degenerate captions are what pair
    // filtering drops in practice; the fixture dims span [64, 195] px,
    // so the 100 px floor really rejects images — a threshold below 64
    // would make the image side of the gate dead code). One doc_id
    // equi-join between two same-keyed scans (broadcast- or
    // shuffle-planned, either is key-local), per-pair math row-local,
    // full-population rollup per id bucket — any admit flip moves its
    // bucket's sums. The oracle predicts the decoded dimensions
    // arithmetically, so a decoder that misread a size breaks the
    // admission hash.
    // ------------------------------------------------------------------
    QueryDef("multimodal_text_pair",
      """WITH pairs AS (
        |  SELECT doc_id,
        |         (8 + doc_id % 8) * (8 + doc_id % 6) AS area,
        |         length(text) AS cap_len,
        |         ((8 + doc_id % 8) * (8 + doc_id % 6) >= 100
        |          AND length(text) BETWEEN 150 AND 450) AS admitted
        |  FROM documents)
        |SELECT doc_id % 10 AS bucket, count(*) AS n_pairs,
        |       CAST(sum(CASE WHEN admitted THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_admitted,
        |       CAST(sum(CASE WHEN admitted THEN area ELSE 0 END) AS BIGINT)
        |         AS area_sum,
        |       CAST(sum(CASE WHEN admitted THEN cap_len ELSE 0 END) AS BIGINT)
        |         AS cap_len_sum
        |FROM pairs GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, dir) =>
      import s.implicits._
      // only doc_id feeds the fixture encode — scanning the id column
      // alone keeps the blob/text bytes out of the typed pipeline
      val images = Scans.table(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          decodePng(MediaRecord(id, "png", PngFixtures.encode(id), 0, 0, 3))
        })
        .toDF()
        .select(col("doc_id"), (col("width") * col("height")).as("area"))
      val captions = Scans.table(s, dir, "documents")
        .select(col("doc_id"), length(col("text")).cast("long").as("cap_len"))
      images.join(captions, "doc_id")
        .withColumn("admitted",
          col("area") >= 100 && col("cap_len").between(150, 450))
        .groupBy((col("doc_id") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("admitted"), 1L).otherwise(0L)).cast("long").as("n_admitted"),
          sum(when(col("admitted"), col("area")).otherwise(0L)).cast("long")
            .as("area_sum"),
          sum(when(col("admitted"), col("cap_len")).otherwise(0L)).cast("long")
            .as("cap_len_sum"))
        .orderBy(col("bucket"))
    })
}
