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
  * Every STILL-IMAGE format this JVM's `javax.imageio` can read is
  * decoded for real — PNG, BMP and GIF losslessly (dimensions and
  * per-channel mean features derived from the decoded raster,
  * hash-pinned against an oracle that predicts them arithmetically), and
  * JPEG through the real lossy codec (dimensions exact; features
  * spec-BOUNDED against the fixture's analytic means, since a lossy
  * decode cannot be bit-pinned — see [[decodeJpegBounded]]). Only
  * genuinely codec-less modalities (video/audio — no JVM-builtin
  * decoder) keep [[decodeStub]], a clearly-marked deterministic FAKE
  * (first bytes → features).
  *
  * Everything around the decoders — binary column, typed metadata
  * schema, partition-wise batched extraction via `mapPartitions` on a
  * typed `Dataset`, the frame-sampling fan-out — is the real Spark
  * plumbing a production decoder drops into. On a cluster each
  * partition's records decode in one executor pass (the JVM analog of a
  * `mapInPandas`/Arrow-batch UDF), so a 100 TB media corpus decodes
  * embarrassingly parallel with no shuffle.
  */
object MultimodalQueries {

  /** ONE 6-dp rounding for every feature value in this module — the
    * oracle parity of decodeStub, decodeImage and the oracle-side
    * meanFeatures replay requires these to agree BIT-exactly, so the
    * definition must not fork per call site.
    */
  private def round6(v: Double): Double = math.round(v * 1e6) / 1e6

  /** STUB — stands in for a decoder this JVM genuinely lacks (video
    * frame / audio sample feature extraction). Deterministic: features
    * are the first 4 payload bytes (UNSIGNED, as any real codec reads
    * octets) scaled to [0,1]. A real implementation would decode
    * `r.blob` with a media library here; the signature and the batch
    * shape are what matter. Oracle caveat: the DuckDB twin replays this
    * with character functions (`ascii`/`length`), which equal unsigned
    * bytes only while the corpus text is pure ASCII — a premise the
    * testdata contract spec pins loudly.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    def feat(i: Int): Double =
      if (i < r.blob.length) round6((r.blob(i) & 0xff).toDouble / 255.0)
      else 0.0
    MediaFeatures(r.doc_id, r.media_type, r.blob.length.toLong,
      r.width.toLong, r.height.toLong, feat(0), feat(1), feat(2), feat(3))
  }

  /** Deterministic two-band RGB fixture synthesis, ONE parameter set per
    * codec so each format's decoder is exercised against its own known
    * raster (a dispatch bug that routed one format's payload through
    * another's expectations would surface as a value mismatch, not pass
    * silently). The fixture for `(format, doc_id)` is a
    * `(wBase + id%wMod) × (hBase + id%hMod)` RGB image whose top `h/2`
    * rows are one solid color and bottom rows another — all pure
    * functions of the id, so per-channel pixel sums (and therefore the
    * mean-pixel features) are arithmetic in the id and the DuckDB oracle
    * predicts them without any image library. PNG/BMP/GIF round-trip
    * bit-exactly through this JDK's ImageIO (GIF's palette holds ≤2
    * colors here, so quantization is exact); JPEG is lossy by design and
    * verified tolerance-bounded instead.
    */
  object RasterFixtures {
    javax.imageio.ImageIO.setUseCache(false) // in-memory streams only

    /** Per-format fixture parameters: dims `(wBase + id%wMod) ×
      * (hBase + id%hMod)`; colors `(id*mult + add) % 256` per channel,
      * `coefs` ordered top-R,G,B then bottom-R,G,B.
      */
    final case class FixtureSpec(
        wBase: Int, wMod: Int, hBase: Int, hMod: Int,
        coefs: IndexedSeq[(Long, Long)])

    val specs: Map[String, FixtureSpec] = Map(
      // png keeps the original (round-6 proven) parameters
      "png" -> FixtureSpec(8, 8, 8, 6,
        IndexedSeq((1L, 0L), (7L, 1L), (13L, 2L), (3L, 5L), (11L, 7L), (17L, 11L))),
      "bmp" -> FixtureSpec(8, 7, 8, 5,
        IndexedSeq((5L, 3L), (9L, 4L), (15L, 6L), (21L, 8L), (25L, 9L), (29L, 12L))),
      "gif" -> FixtureSpec(8, 5, 8, 4,
        IndexedSeq((19L, 3L), (23L, 5L), (27L, 7L), (31L, 9L), (37L, 11L), (41L, 13L))),
      // jpeg fixtures are larger: block artifacts average out, keeping
      // the decoded means well inside the ±0.02 tolerance band
      "jpeg" -> FixtureSpec(16, 8, 16, 6,
        IndexedSeq((1L, 2L), (7L, 3L), (13L, 4L), (3L, 6L), (11L, 8L), (17L, 12L))))

    def dims(fmt: String, id: Long): (Int, Int) = {
      val s = specs(fmt)
      ((s.wBase + id % s.wMod).toInt, (s.hBase + id % s.hMod).toInt)
    }

    /** The six channel values: top R,G,B then bottom R,G,B. */
    def colors(fmt: String, id: Long): IndexedSeq[Int] =
      specs(fmt).coefs.map { case (m, a) => ((id * m + a) % 256).toInt }

    /** Real compressed bytes for the fixture image, through the named
      * ImageIO writer.
      */
    def encode(fmt: String, id: Long): Array[Byte] = {
      val (w, h) = dims(fmt, id)
      val cs = colors(fmt, id)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        val o = if (y < h / 2) 0 else 3
        val rgb = (cs(o) << 16) | (cs(o + 1) << 8) | cs(o + 2)
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      // ImageIO.write returns FALSE (no exception) when no writer
      // exists for the format (a trimmed runtime missing the BMP/GIF
      // plugin): unchecked, the empty payload fails far away in the
      // DECODER with a message blaming the wrong side
      val wrote = javax.imageio.ImageIO.write(
        img, if (fmt == "jpeg") "jpg" else fmt, out)
      require(wrote, s"no ImageIO writer for format '$fmt' on this JVM")
      out.toByteArray
    }

    /** Analytic mean features of the fixture raster — the values a
      * LOSSLESS decode must reproduce bit-exactly (same IEEE-754
      * division and round-6 as [[decodeImage]]) and a lossy decode must
      * land within tolerance of.
      */
    def meanFeatures(fmt: String, id: Long): (Double, Double, Double, Double) = {
      val (w, h) = dims(fmt, id)
      val cs = colors(fmt, id)
      val (top, bot) = (h / 2, h - h / 2)
      def m(i: Int): Double =
        round6(w * (top.toLong * cs(i) + bot.toLong * cs(i + 3)) / (w * h * 255.0))
      val all = round6(
        w * (top.toLong * (cs(0) + cs(1) + cs(2)) + bot.toLong * (cs(3) + cs(4) + cs(5)))
          / (3.0 * w * h * 255.0))
      (m(0), m(1), m(2), all)
    }
  }

  /** REAL decode: parse any ImageIO-readable payload (PNG/BMP/GIF/JPEG
    * here), then derive every output from the decoded raster, not the
    * metadata. `n_bytes` reports the decoded raster size (w·h·3 channel
    * bytes — the decoder's output, not the compressed payload, whose
    * length is codec-dependent); features are per-channel mean pixel
    * intensities in [0,1] (feat_3 = all-channel mean), rounded like the
    * stub's.
    */
  def decodeImage(r: MediaRecord): MediaFeatures = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.blob))
    require(img != null, s"doc ${r.doc_id}: payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    // one bulk raster fetch, not a per-pixel getRGB(x, y) virtual call
    // + ColorModel conversion per pixel: identical ARGB values (the
    // bulk form runs the same default-ColorModel conversion), ~an
    // order of magnitude fewer calls on the decode hot path
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var i = 0
    while (i < px.length) {
      val p = px(i)
      sumR += (p >> 16) & 0xff; sumG += (p >> 8) & 0xff; sumB += p & 0xff
      i += 1
    }
    MediaFeatures(r.doc_id, r.media_type, w.toLong * h * 3, w.toLong, h.toLong,
      round6(sumR / (w * h * 255.0)),
      round6(sumG / (w * h * 255.0)),
      round6(sumB / (w * h * 255.0)),
      round6((sumR + sumG + sumB) / (3.0 * w * h * 255.0)))
  }

  /** REAL JPEG decode with SPEC-BOUNDED features: the codec is lossy, so
    * per-channel means cannot be hash-pinned bit-exactly. Dimensions and
    * raster size ARE exact (JPEG never changes them) and stay
    * hash-pinned; each feat_i reports 1.0 when the decoded channel mean
    * lands within ±`tol` of the fixture's analytic mean (0.0 otherwise),
    * so the tolerance check itself sits inside the hashed output — a
    * decoder drifting beyond spec flips a 1.0 and fails the gate.
    * Measured worst-case mean error for these fixtures is ~0.006;
    * tol = 0.02 leaves 3× headroom. ExtensionsSpec asserts the numeric
    * bound on the raw means directly.
    */
  def decodeJpegBounded(id: Long, tol: Double = 0.02): MediaFeatures = {
    val f = decodeImage(
      MediaRecord(id, "jpeg", RasterFixtures.encode("jpeg", id), 0, 0, 3))
    val (e0, e1, e2, e3) = RasterFixtures.meanFeatures("jpeg", id)
    def ok(actual: Double, expected: Double): Double =
      if (math.abs(actual - expected) <= tol) 1.0 else 0.0
    f.copy(feat_0 = ok(f.feat_0, e0), feat_1 = ok(f.feat_1, e1),
      feat_2 = ok(f.feat_2, e2), feat_3 = ok(f.feat_3, e3))
  }

  /** The media table: documents' text re-encoded as an opaque binary
    * payload with typed metadata — the `BinaryType` pass-through data
    * model of SURVEY.md §1 (UDT blobs) extended with media metadata.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Scans.table(s, dir, "documents")
      // ingest guard: a media row without a key or payload is
      // quarantine material, not decodable media — and a NULL doc_id
      // would fail the typed MediaRecord encoder's non-nullable long
      // mid-job instead of at admission. No-op on any corpus whose
      // documents carry keys and text (the declared ones all do).
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(
        col("doc_id"),
        lit("image").as("media_type"),
        col("text").cast("binary").as("blob"),
        (lit(64) + col("doc_id") % 64).cast("int").as("width"),
        (lit(64) + col("doc_id") % 48).cast("int").as("height"),
        lit(3).as("channels"))

  /** DuckDB oracle branch for one LOSSLESS format: dims and per-channel
    * means predicted arithmetically from the [[RasterFixtures]] spec —
    * integer numerators, one correctly-rounded double division, round-6,
    * the same association order as [[decodeImage]]'s pixel-sum math.
    */
  private def losslessOracleBranch(fmt: String): String = {
    val s = RasterFixtures.specs(fmt)
    val W = s"(${s.wBase} + doc_id % ${s.wMod})"
    val H = s"(${s.hBase} + doc_id % ${s.hMod})"
    def c(i: Int) = { val (m, a) = s.coefs(i); s"((doc_id * $m + $a) % 256)" }
    val top = s"($H // 2)"
    val bot = s"($H - $H // 2)"
    def mean(i: Int) =
      s"round(($W * ($top * ${c(i)} + $bot * ${c(i + 3)})) / ($W * $H * 255.0), 6)"
    val meanAll =
      s"round(($W * ($top * (${c(0)} + ${c(1)} + ${c(2)})" +
        s" + $bot * (${c(3)} + ${c(4)} + ${c(5)}))) / (3.0 * $W * $H * 255.0), 6)"
    s"""SELECT doc_id, '$fmt' AS media_type,
       |       $W * $H * 3 AS n_bytes, $W AS width, $H AS height,
       |       ${mean(0)} AS feat_0, ${mean(1)} AS feat_1,
       |       ${mean(2)} AS feat_2, $meanAll AS feat_3
       |FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL""".stripMargin
  }

  /** DuckDB oracle branch for JPEG: dimensions and raster size are exact
    * under a lossy codec; the four feature slots carry the
    * within-tolerance indicators, which a conforming decode always
    * reports as 1.0 (see [[decodeJpegBounded]]).
    */
  private def jpegOracleBranch: String = {
    val s = RasterFixtures.specs("jpeg")
    val W = s"(${s.wBase} + doc_id % ${s.wMod})"
    val H = s"(${s.hBase} + doc_id % ${s.hMod})"
    s"""SELECT doc_id, 'jpeg' AS media_type,
       |       $W * $H * 3 AS n_bytes, $W AS width, $H AS height,
       |       1.0 AS feat_0, 1.0 AS feat_1, 1.0 AS feat_2, 1.0 AS feat_3
       |FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL""".stripMargin
  }

  val entries: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // multimodal_decode — batched feature extraction over the binary
    // media column, one decode dispatch per format. Every still-image
    // format this JVM reads is decoded FOR REAL through javax.imageio:
    // png/bmp/gif payloads (synthesized per doc on the executor, each
    // format against its own fixture raster) decode losslessly —
    // dimensions and features come from the decoded raster and the
    // oracle predicts them arithmetically, so a decoder that misread a
    // pixel fails the hash; jpeg decodes through the real lossy codec —
    // dims exact, features tolerance-bounded (decodeJpegBounded). Only
    // 'video' records keep the labeled stub (no JVM-builtin codec).
    // Typed Dataset → mapPartitions → features; no shuffle either way.
    // ------------------------------------------------------------------
    QueryDef("multimodal_decode",
      s"""SELECT doc_id, 'video' AS media_type,
        |       length(text) AS n_bytes,
        |       64 + doc_id % 64 AS width,
        |       64 + doc_id % 48 AS height,
        |       round(ascii(substr(text, 1, 1)) / 255.0, 6) AS feat_0,
        |       round(ascii(substr(text, 2, 1)) / 255.0, 6) AS feat_1,
        |       round(ascii(substr(text, 3, 1)) / 255.0, 6) AS feat_2,
        |       round(ascii(substr(text, 4, 1)) / 255.0, 6) AS feat_3
        |FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
        |UNION ALL
        |${losslessOracleBranch("png")}
        |UNION ALL
        |${losslessOracleBranch("bmp")}
        |UNION ALL
        |${losslessOracleBranch("gif")}
        |UNION ALL
        |$jpegOracleBranch
        |ORDER BY doc_id, media_type""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = mediaTable(s, dir).as[MediaRecord]
      // Two branches, split by what each actually consumes. The stub
      // 'video' branch needs the payload bytes, so it rides the scan
      // partition-local (blobs never shuffle). The four real-decode
      // branches need ONLY the id — payloads are synthesized from it on
      // the executor — so their ids are spread round-robin across the
      // session's cores before the CPU-heavy ImageIO work: the corpus
      // arrives as one unsplittable row group locally (single-file scan
      // = one task), which serialized every decode on one core while 31
      // idled. Repartitioning the 8-byte id column is the
      // shuffle-the-proxy-not-the-payload form; spreadBytes gates the
      // exchange on the under-split test, so a multi-split corpus keeps
      // its scan width and pays NO shuffle at scale (and plan build no
      // longer forces a DataFrame→RDD conversion per invocation).
      val stub = media.map(r => decodeStub(MediaRecord(r.doc_id, "video",
        r.blob, r.width, r.height, r.channels)))
      val ids = Scans.spreadBytes(s, mediaTable(s, dir).select(col("doc_id")),
        Scans.tableBytes(dir, "documents"))
      val imgs = ids.as[Long].mapPartitions(_.flatMap { id =>
        Iterator(
          decodeImage(MediaRecord(id, "png",
            RasterFixtures.encode("png", id), 0, 0, 3)),
          decodeImage(MediaRecord(id, "bmp",
            RasterFixtures.encode("bmp", id), 0, 0, 3)),
          decodeImage(MediaRecord(id, "gif",
            RasterFixtures.encode("gif", id), 0, 0, 3)),
          decodeJpegBounded(id))
      })
      stub.unionAll(imgs)
        .toDF()
        .orderBy(col("doc_id"), col("media_type"))
    },

    // ------------------------------------------------------------------
    // multimodal_frame_sample — video-style frame sampling: 4 evenly
    // spaced 8-byte "frames" per payload, fanned out one row per frame
    // (posexplode) — the shape of a frame-extraction pipeline stage.
    // The stride numerator is clamped at 0: a payload shorter than one
    // frame samples the same leading frame 4 times, and — decisively —
    // a NEGATIVE numerator is where the engines fork (Spark `div`
    // truncates toward zero, DuckDB `//` floors, and the resulting
    // non-positive substring starts mean different things: Spark counts
    // them from the END of the string). greatest/0 keeps both sides in
    // the non-negative domain where div and // agree.
    // ------------------------------------------------------------------
    QueryDef("multimodal_frame_sample",
      """SELECT d.doc_id, u.i AS frame_idx,
        |       md5(substr(d.text, 1 + u.i * (greatest(length(d.text) - 8, 0) // 3), 8)) AS frame_md5
        |FROM documents d, unnest(generate_series(0, 3)) AS u(i)
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
      Scans.table(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(expr(
            "transform(sequence(0, 3), f -> md5(substring(text, 1 + f * (greatest(length(text) - 8, 0) div 3), 8)))")))
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
        |FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = mediaTable(s, dir).as[MediaRecord]
      media.mapPartitions { it =>
        // ONE digest instance per partition (digest() resets it), not a
        // JCA provider lookup + allocation per record
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
        val n = (r.blob.length + 3) / 4 // STUB: crop-style 4:1 downsample
        val out = java.util.Arrays.copyOfRange(r.blob, 0, n)
        val md5hex = md.digest(out).map("%02x".format(_)).mkString
        (r.doc_id, r.width.toLong, r.height.toLong,
          (r.width / 2).toLong, (r.height / 2).toLong, n.toLong, md5hex)
        }
      }.toDF("doc_id", "width", "height", "new_width", "new_height",
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
        |FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL""".stripMargin) { (s, dir) =>
      // media_type is the constant 'image' tag, so this is a GLOBAL
      // aggregate tagged with the literal — like the oracle's no-GROUP-BY
      // SELECT it yields exactly one row even over an empty corpus
      // (groupBy on the constant would yield zero rows there and fail
      // the row-count compare)
      mediaTable(s, dir)
        .select(length(col("blob")).cast("long").as("n_bytes"))
        .agg(count(lit(1)).as("n_media"),
          min(col("n_bytes")).as("min_bytes"),
          max(col("n_bytes")).as("max_bytes"),
          sum(col("n_bytes")).as("total_bytes"))
        .select(lit("image").as("media_type"), col("n_media"),
          col("min_bytes"), col("max_bytes"), col("total_bytes"))
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
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL GROUP BY md5(text))
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
        |  FROM documents WHERE doc_id IS NOT NULL)
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
      // alone keeps the blob/text bytes out of the typed pipeline.
      // Null-id guard (mirrored in the oracle's WHERE): a pair needs a
      // document key, and a NULL would fail the non-nullable Long
      // encoder mid-job instead of at admission.
      val images = Scans.spreadBytes(s, Scans.table(s, dir, "documents")
          .filter(col("doc_id").isNotNull)
          .select(col("doc_id")), Scans.tableBytes(dir, "documents")).as[Long]
        // spread the 8-byte ids before the real encode+decode pass —
        // the same unsplittable-scan fix as multimodal_decode
        .mapPartitions(_.map { id =>
          decodeImage(MediaRecord(id, "png", RasterFixtures.encode("png", id), 0, 0, 3))
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
    },

    // ------------------------------------------------------------------
    // multimodal_shard_manifest — WebDataset-style shard packing: the
    // training loader reads size-bounded sequential shards, so the
    // assembly step assigns each media record to a shard by GREEDY
    // byte-budget within its source (shard = exclusive-prefix-bytes div
    // target — an item that crosses the boundary stays whole in its
    // shard) and publishes the shard manifest: item count, byte total,
    // id range, and an order-independent 28-bit-md5 membership checksum
    // (rowhash_check's fold) a loader can re-verify after download.
    // Scale: the prefix-sum window partitions on SOURCE — the natural
    // ingest unit, never a global sort — and carries (ids + ints) only;
    // the blobs themselves are never shuffled (a production writer
    // sub-splits a jumbo source by hash prefix first). Manifest is
    // shard-count-sized.
    // ------------------------------------------------------------------
    QueryDef("multimodal_shard_manifest",
      """WITH b AS (
        |  SELECT doc_id, source, octet_length(text::BLOB) AS n_bytes
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, source, n_bytes,
        |         CAST(coalesce(sum(n_bytes) OVER (
        |                PARTITION BY source ORDER BY doc_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |              // 2048 AS BIGINT) AS shard_id
        |  FROM b)
        |SELECT source, shard_id, count(*) AS n_items,
        |       CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
        |       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
        |       CAST(sum(CAST(concat('0x',
        |         substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT))
        |         AS BIGINT) AS id_hash
        |FROM sh GROUP BY source, shard_id
        |ORDER BY source, shard_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Scans.table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          length(col("text").cast("binary")).cast("long").as("n_bytes"))
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      docs
        .withColumn("cum_excl", coalesce(sum(col("n_bytes")).over(w), lit(0L)))
        .withColumn("shard_id", expr("cum_excl div 2048"))
        .groupBy(col("source"), col("shard_id"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("n_bytes")).cast("long").as("shard_bytes"),
          min(col("doc_id")).as("min_doc_id"),
          max(col("doc_id")).as("max_doc_id"),
          sum(expr(
            "cast(conv(substring(md5(cast(doc_id AS string)), 1, 7), 16, 10) AS bigint)"))
            .cast("long").as("id_hash"))
        .orderBy(col("source"), col("shard_id"))
    })
}
