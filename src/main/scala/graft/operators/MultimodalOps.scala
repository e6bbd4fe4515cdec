package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A decoded "frame" of a media asset (what a real image/video decoder
  * would emit per sampled frame). */
case class MediaFrame(asset_id: Long, frame_no: Int, offset: Long, byte_len: Int, checksum: String)

/** An encoded image asset (real PNG/BMP bytes) derived deterministically
  * from a document row — the fixture input of the REAL decode path. */
case class ImageAsset(asset_id: Long, media: Array[Byte])

/** Real decoded-image metadata: container format sniffed from the byte
  * stream, dimensions and a pixel probe read back by the actual decoder. */
case class ImageMeta(asset_id: Long, format: String, width: Int, height: Int,
    corner_rgb: Int)

/** Perceptual average-hash of a decoded image: 64 bits as a '0'/'1'
  * string (row-major over the 8×8 grid — a string, not a BIGINT, so no
  * engine disagrees about bit 63's sign). */
case class ImagePHash(asset_id: Long, width: Int, height: Int, phash: String)

/** An encoded audio asset (a real RIFF/WAVE container holding 16-bit
  * mono PCM) derived deterministically from a document row. */
case class AudioAsset(asset_id: Long, media: Array[Byte])

/** Features read back by actually parsing the WAV container: header
  * fields plus integer-exact signal statistics over the PCM samples. */
case class AudioFeatures(asset_id: Long, sample_rate: Int, n_samples: Int,
    peak: Int, energy_ssq: Long, zero_crossings: Int)

/** Perceptual audio fingerprint: sign-of-frame-energy-delta bits as a
  * '0'/'1' string (the [[ImagePHash]] string convention — no engine
  * disagrees about a sign bit). */
case class AudioFingerprint(asset_id: Long, n_samples: Int, afp: String)

/** Multimodal column handling (builder brief "Multimodal columns"):
  * image/audio/video as opaque `binary` columns with a typed metadata
  * struct, plus decode / feature-extract / frame-sample stages.
  *
  * The container ships no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic fake (`fakeDecode` — real systems swap in
  * a JNI/FFI decoder or an Arrow-batch Python worker); everything
  * Spark-side is real and tested: the asset schema, the binary column,
  * per-partition batched iteration (the JVM analog of `mapInPandas`
  * batch shape), and the frame-sampling explode.
  *
  * Scale notes: assets process row-independently (map-only — no shuffle
  * anywhere in this file); binary payloads never pass through a Spark
  * shuffle, and frame sampling multiplies rows AFTER the filter/project
  * stage, not before.
  */
object MultimodalOps {

  /** Derive a deterministic asset table from the `documents` fixture:
    * `media` = utf-8 bytes of the text (the opaque binary payload), with
    * a typed metadata struct a real ingest would carry alongside. */
  def assets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      col("text").cast("binary").as("media"),
      struct(
        (col("n_chars") % 640).cast("int").as("width"),
        ((col("doc_id") * 7) % 480).cast("int").as("height"),
        col("source").as("container")).as("meta"))

  /** Metadata/feature extraction over the binary column — pure column
    * expressions (octet length, content checksum, sampled-frame count at
    * `frameBytes` bytes per frame). This is the "cheap probe" pass a
    * pipeline runs before committing to full decode. */
  def mediaMeta(assetsDf: DataFrame, frameBytes: Int = 256): DataFrame =
    assetsDf.select(
      col("asset_id"),
      octet_length(col("media")).as("byte_len"),
      md5(col("media")).as("checksum"),
      (floor((octet_length(col("media")) - 1) / frameBytes) + 1).cast("long").as("n_frames"),
      col("meta.width"), col("meta.height"), col("meta.container"))

  def mediaMetaSql(frameBytes: Int = 256): String =
    s"""SELECT doc_id AS asset_id,
       |  octet_length(encode(text)) AS byte_len,
       |  md5(text) AS checksum,
       |  CAST(floor((octet_length(encode(text)) - 1) / $frameBytes) + 1 AS BIGINT) AS n_frames,
       |  CAST(n_chars % 640 AS INT) AS width,
       |  CAST((doc_id * 7) % 480 AS INT) AS height,
       |  source AS container
       |FROM documents""".stripMargin

  /** Frame sampling: explode each asset into fixed-size frame windows
    * (every `stride`-th frame kept). Row-expansion happens per row —
    * map-only; the output is the input of a per-frame featurizer. */
  def sampleFrames(assetsDf: DataFrame, frameBytes: Int = 256, stride: Int = 2): DataFrame = {
    val nFrames = (floor((octet_length(col("media")) - 1) / frameBytes) + 1).cast("int")
    assetsDf
      // zero-byte media has no frames; without this guard
      // sequence(0, -1) yields the DESCENDING [0, -1] — a phantom frame
      .where(octet_length(col("media")) > 0)
      .select(col("asset_id"), col("media"),
        explode(sequence(lit(0), nFrames - 1)).as("frame_no"))
      .where(col("frame_no") % stride === 0)
      .select(col("asset_id"), col("frame_no"),
        (col("frame_no").cast("long") * frameBytes).as("offset"),
        col("media").substr(col("frame_no") * frameBytes + 1, lit(frameBytes)).as("frame_bytes"))
  }

  /** Frame-sample summary (oracle-checkable face of [[sampleFrames]]):
    * per sampled frame, its offset, byte length, and content checksum —
    * no raw binary in the output. */
  def frameSummary(assetsDf: DataFrame, frameBytes: Int = 256, stride: Int = 2): DataFrame =
    sampleFrames(assetsDf, frameBytes, stride)
      .select(col("asset_id"), col("frame_no"), col("offset"),
        octet_length(col("frame_bytes")).as("byte_len"),
        md5(col("frame_bytes")).as("checksum"))

  /** DuckDB oracle for [[frameSummary]] over assets derived from
    * `documents` (ascii text ⇒ char offsets = byte offsets). */
  def frameSummarySql(frameBytes: Int = 256, stride: Int = 2): String =
    s"""WITH f AS (
       |  SELECT doc_id AS asset_id,
       |    unnest(range(0, CAST(floor((octet_length(encode(text)) - 1) / $frameBytes) + 1 AS BIGINT))) AS frame_no,
       |    text
       |  FROM documents
       |  WHERE octet_length(encode(text)) > 0
       |)
       |SELECT asset_id, CAST(frame_no AS INT) AS frame_no,
       |  frame_no * $frameBytes AS offset,
       |  octet_length(encode(substr(text, CAST(frame_no * $frameBytes + 1 AS INT), $frameBytes))) AS byte_len,
       |  md5(substr(text, CAST(frame_no * $frameBytes + 1 AS INT), $frameBytes)) AS checksum
       |FROM f WHERE frame_no % $stride = 0""".stripMargin

  // --- real decode: pure-JVM formats (javax.imageio) ----------------------

  /** Deterministic per-pixel value for the generated fixture images —
    * shared, via plain integer arithmetic, with the m3 oracle SQL (the
    * corner probe) and the round-trip spec. */
  private[graft] def pixelRgb(id: Long, x: Int, y: Int): Int =
    (((id % 256) << 16) | ((x % 256) << 8) | (y % 256)).toInt

  /** Deterministic image dimensions per asset id (also mirrored in the
    * m3 oracle SQL). */
  private[graft] def dimsFor(id: Long): (Int, Int) =
    (8 + (id % 24).toInt, 8 + ((id * 7) % 16).toInt)

  /** REAL encoded image bytes per document: even ids become PNG, odd ids
    * BMP — both encoders ship in the JDK (`javax.imageio`), so no
    * container codec is needed. Pixels and dimensions are pure functions
    * of the id, which is what lets the decode step be oracle-checked:
    * whatever the real decoder reads back must equal what was encoded.
    * Per-partition batched generation, map-only. */
  def imageAssets(spark: SparkSession, docs: DataFrame): Dataset[ImageAsset] = {
    import spark.implicits._
    // Par.spread: a single-file fixture scan is ONE split, which ran
    // the whole encode→decode chain downstream of this generator on a
    // single task (measured ~1 s serialized at sf0.1); what shuffles is
    // the id column only. Identity on a wide corpus scan.
    graft.operators.Par.spread(docs.select(col("doc_id")), col("doc_id"))
      .as[Long].mapPartitions { it =>
        it.map { id =>
          ImageAsset(id, encodeRaster(id, if (id % 2 == 0) "png" else "bmp"))
        }
      }
  }

  /** The deterministic fixture raster of asset `id`, encoded with a
    * named JDK writer — shared by the PNG/BMP generator above and the
    * JPEG generator below. */
  /** `javax.imageio` defaults to FILE-backed stream caches — every
    * encode/decode creates and deletes a temp file, which serializes
    * badly across concurrent tasks (measured: the 32-way spread decode
    * ran 4× SLOWER than single-task until this was off — temp-file
    * churn, not pixels, was the cost). Memory-backed streams once per
    * JVM; the payloads here are small byte arrays anyway. */
  private lazy val imageIoInMemory: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  private def encodeRaster(id: Long, format: String): Array[Byte] = {
    imageIoInMemory
    val (w, h) = dimsFor(id)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixelRgb(id, x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, out)
    out.toByteArray
  }

  /** REAL JPEG bytes per document — the most common crawl image format,
    * encoded from the same deterministic raster with the JDK's lossy
    * JPEG writer (ships in `javax.imageio` like PNG/BMP). Pixel values
    * do NOT round-trip (DCT quantization — which is why JPEG assets
    * get their own decode query instead of joining m3's pixel-checked
    * rows): container format and dimensions DO, and those are exactly
    * the columns the m8 oracle checks; the raster is still really
    * decompressed (spec-pinned: the decoded corner lands within a
    * quantization tolerance of the encoded value). */
  def jpegAssets(spark: SparkSession, docs: DataFrame): Dataset[ImageAsset] = {
    import spark.implicits._
    // narrow-scan spread, as in [[imageAssets]]
    graft.operators.Par.spread(docs.select(col("doc_id")), col("doc_id"))
      .as[Long].mapPartitions { it =>
        it.map(id => ImageAsset(id, encodeRaster(id, "jpg")))
      }
  }

  /** Sniff + decode the first image of a payload with the registered
    * JDK readers; shared by the metadata and perceptual-hash paths. */
  private def readImage(assetId: Long,
      media: Array[Byte]): (String, java.awt.image.BufferedImage) = {
    imageIoInMemory
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(media))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, s"no JDK reader for asset $assetId")
      val reader = readers.next()
      try {
        reader.setInput(iis)
        (reader.getFormatName.toLowerCase, reader.read(0))
      } finally reader.dispose()
    } finally iis.close()
  }

  /** REAL decode via `javax.imageio` — NOT the stub: the container
    * format is sniffed from the byte stream by the registered readers
    * (PNG signature / "BM" magic), dimensions and the corner pixel come
    * from actually decoding the payload. Formats the JDK lacks
    * (video/audio) still go through [[fakeDecode]]; this path proves the
    * plumbing end-to-end on the formats it does ship. Per-partition
    * batched, map-only — the same shape as [[decodeFrames]]. */
  def decodeImageMeta(spark: SparkSession,
      assetsDs: Dataset[ImageAsset]): Dataset[ImageMeta] = {
    import spark.implicits._
    assetsDs.mapPartitions { it =>
      it.map { a =>
        val (fmt, img) = readImage(a.asset_id, a.media)
        ImageMeta(a.asset_id, fmt, img.getWidth, img.getHeight,
          img.getRGB(0, 0) & 0xffffff)
      }
    }
  }

  /** Perceptual average-hash (aHash) over the REAL decoded raster — the
    * image-dedup primitive (near-identical images hash equal; the
    * text-dedup family's fingerprint step for the pixel modality):
    * integer luma `(299r + 587g + 114b) / 1000` per pixel, pixels
    * block-assigned to an 8×8 grid by `ci = x·8/w` (integer division —
    * no resampling kernel, so no codec/JVM-version variance), and bit
    * (cj, ci) set iff the cell's mean exceeds the image mean. The
    * comparison is the EXACT integer cross-multiplication
    * `cellSum·nAll > allSum·nCell` — no division anywhere, so the m4
    * oracle re-derives every bit arithmetically from the generator
    * formula and matching proves decode + DSP end-to-end. Map-only,
    * per-partition batched; the hash is 64 chars of '0'/'1'
    * (a BIGINT would hit the cross-engine bit-63 sign trap). */
  def imagePHash(spark: SparkSession,
      assetsDs: Dataset[ImageAsset]): Dataset[ImagePHash] = {
    import spark.implicits._
    assetsDs.mapPartitions { it =>
      it.map { a =>
        val (_, img) = readImage(a.asset_id, a.media)
        val w = img.getWidth
        val h = img.getHeight
        val s = Array.ofDim[Long](8, 8)
        val n = Array.ofDim[Long](8, 8)
        var ts = 0L
        var tn = 0L
        for (y <- 0 until h; x <- 0 until w) {
          val rgb = img.getRGB(x, y)
          val gray = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
            114 * (rgb & 0xff)) / 1000
          val ci = x * 8 / w
          val cj = y * 8 / h
          s(cj)(ci) += gray; n(cj)(ci) += 1; ts += gray; tn += 1
        }
        val bits = (for (cj <- 0 until 8; ci <- 0 until 8)
          yield if (s(cj)(ci) * tn > ts * n(cj)(ci)) '1' else '0').mkString
        ImagePHash(a.asset_id, w, h, bits)
      }
    }
  }

  /** The m4 oracle: every aHash bit re-derived from integer arithmetic
    * over `documents` (the generator's pixel formula run through the
    * same luma/grid/cross-multiplication chain in SQL). */
  def imagePHashSql: String =
    s"""WITH px AS (
       |  SELECT doc_id AS asset_id,
       |    8 + doc_id % 24 AS w, 8 + (doc_id * 7) % 16 AS h, x, y,
       |    (299 * (doc_id % 256) + 587 * x + 114 * y) // 1000 AS gray
       |  FROM documents, generate_series(0, 30) sx(x), generate_series(0, 22) sy(y)
       |  WHERE x < 8 + doc_id % 24 AND y < 8 + (doc_id * 7) % 16
       |), cs AS (
       |  SELECT asset_id, w, h, (y * 8) // h AS cj, (x * 8) // w AS ci,
       |    SUM(gray) AS s, COUNT(*) AS n
       |  FROM px GROUP BY asset_id, w, h, cj, ci
       |), tot AS (
       |  SELECT asset_id, SUM(s) AS ts, SUM(n) AS tn FROM cs GROUP BY asset_id
       |), bits AS (
       |  SELECT c.asset_id, c.w, c.h, c.cj, c.ci,
       |    CASE WHEN c.s * t.tn > t.ts * c.n THEN '1' ELSE '0' END AS b
       |  FROM cs c JOIN tot t USING (asset_id)
       |)
       |SELECT asset_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       |  string_agg(b, '' ORDER BY cj, ci) AS phash
       |FROM bits GROUP BY asset_id, w, h""".stripMargin

  /** Exact perceptual-duplicate groups: assets sharing an aHash collapse
    * to one row `(phash, n_assets, rep)` — the image analog of
    * [[Dedup.exactDedup]]'s group view, and the SCALE path for image
    * dedup (one hash aggregate; no pair join exists to blow up when a
    * hash bucket holds 10⁵ near-identical crawl images — the boilerplate
    * clique lesson applied to pixels). Near-dup pairing under a Hamming
    * radius would band these 64-bit strings exactly like MinHash bands;
    * the group view is the always-safe first stage. */
  def phashDupGroups(spark: SparkSession,
      assetsDs: Dataset[ImageAsset]): DataFrame =
    phashDupGroupsFrom(imagePHash(spark, assetsDs).toDF())

  /** [[phashDupGroups]] from a precomputed `(asset_id, …, phash)` frame
    * — the production entry: hashes are computed once per corpus
    * snapshot (m4's job) and persisted; the group view then never
    * re-decodes a byte. */
  def phashDupGroupsFrom(phash: DataFrame): DataFrame =
    phash.groupBy("phash")
      .agg(count(lit(1)).as("n_assets"), min("asset_id").as("rep"))
      .where(col("n_assets") >= 2)

  /** [[phashDupGroups]] oracle — the m4 chain grouped. */
  def phashDupGroupsSql: String =
    s"""WITH ph AS (
       |${imagePHashSql}
       |)
       |SELECT phash, count(*) AS n_assets, min(asset_id) AS rep
       |FROM ph GROUP BY phash HAVING count(*) >= 2""".stripMargin

  /** The m3 oracle: every column of the decoded output re-derived from
    * pure integer arithmetic over `documents` — matching means the REAL
    * encoder→decoder round trip preserved format, dimensions, and pixel
    * values. */
  def imageDecodeSql: String =
    s"""SELECT doc_id AS asset_id,
       |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format,
       |  CAST(8 + doc_id % 24 AS INT) AS width,
       |  CAST(8 + (doc_id * 7) % 16 AS INT) AS height,
       |  CAST((doc_id % 256) * 65536 AS INT) AS corner_rgb
       |FROM documents""".stripMargin

  /** The m8 oracle: the JPEG decode's PARSE-DERIVED columns re-derived
    * from the generator formulas — format sniffed by the real reader,
    * dimensions preserved exactly by the codec; pixel columns are
    * deliberately absent (JPEG is lossy — a pixel oracle would be
    * asserting DCT arithmetic DuckDB cannot reproduce). */
  def jpegDecodeSql: String =
    s"""SELECT doc_id AS asset_id, 'jpeg' AS format,
       |  CAST(8 + doc_id % 24 AS INT) AS width,
       |  CAST(8 + (doc_id * 7) % 16 AS INT) AS height
       |FROM documents""".stripMargin

  // --- real decode: RIFF/WAVE PCM (pure byte-level parsing) ---------------

  /** Sample rate of the generated fixture waveforms. */
  val WavSampleRate = 8000

  /** Deterministic 16-bit sample `k` of asset `id` — shared, via plain
    * integer arithmetic, with the m6 oracle SQL. */
  private[graft] def sampleOf(id: Long, k: Int): Short =
    ((id * 31 + k.toLong * k * 7) % 65536 - 32768).toShort

  /** Samples per asset (256–383, id-derived — mirrored in the oracle). */
  private[graft] def nSamplesOf(id: Long): Int = 256 + (id % 128).toInt

  /** REAL encoded audio per document: a RIFF/WAVE container (44-byte
    * canonical header + 16-bit little-endian mono PCM) — WAV needs no
    * codec, the container IS the format, so the audio modality gets the
    * same honest treatment as PNG/BMP: generate real bytes, parse them
    * back, oracle-check everything the parse reads. Map-only. */
  def audioAssets(spark: SparkSession, docs: DataFrame): Dataset[AudioAsset] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = nSamplesOf(id)
        val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1) // PCM
          .putShort(1) // mono
          .putInt(WavSampleRate)
          .putInt(WavSampleRate * 2) // byte rate
          .putShort(2) // block align
          .putShort(16) // bits per sample
          .put("data".getBytes("US-ASCII")).putInt(2 * n)
        (0 until n).foreach(k => bb.putShort(sampleOf(id, k)))
        AudioAsset(id, bb.array())
      }
    }
  }

  /** REAL audio feature extraction — parses the actual WAV bytes (RIFF
    * magic, fmt chunk fields, data chunk) and computes integer-exact
    * signal statistics: peak |amplitude|, energy as the exact
    * sum-of-squares (BIGINT — RMS would force a float sqrt into the
    * cross-engine compare), and zero crossings counted as sign-bit
    * changes between consecutive samples. Map-only, per-partition
    * batched; every output column is re-derived arithmetically by the
    * m6 oracle, so matching proves the encode→parse round trip. */
  def audioFeatures(spark: SparkSession,
      assetsDs: Dataset[AudioAsset]): Dataset[AudioFeatures] = {
    import spark.implicits._
    assetsDs.mapPartitions { it =>
      it.map { a =>
        val (rate, n, bb) = parseWavHeader(a)
        var peak = 0
        var ssq = 0L
        var zc = 0
        var prevNeg = false
        (0 until n).foreach { k =>
          val s = bb.getShort.toInt
          if (math.abs(s) > peak) peak = math.abs(s)
          ssq += s.toLong * s
          val neg = s < 0
          if (k > 0 && neg != prevNeg) zc += 1
          prevNeg = neg
        }
        AudioFeatures(a.asset_id, rate, n, peak, ssq, zc)
      }
    }
  }

  /** Walk the RIFF/WAVE header byte-for-byte (magic, canonical mono
    * 16-bit PCM fmt chunk, data chunk), failing loudly on anything
    * non-canonical; returns (sample rate, sample count, buffer
    * positioned at the first PCM sample). The single parse both
    * [[audioFeatures]] and [[audioFingerprint]] read through. */
  private def parseWavHeader(
      a: AudioAsset): (Int, Int, java.nio.ByteBuffer) = {
    val bb = java.nio.ByteBuffer.wrap(a.media)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(tag() == "RIFF", s"asset ${a.asset_id}: not RIFF")
    bb.getInt // riff size
    require(tag() == "WAVE", s"asset ${a.asset_id}: not WAVE")
    require(tag() == "fmt ", s"asset ${a.asset_id}: fmt chunk missing")
    require(bb.getInt == 16 && bb.getShort == 1 && bb.getShort == 1,
      s"asset ${a.asset_id}: not canonical mono PCM")
    val rate = bb.getInt
    bb.getInt; bb.getShort // byte rate, block align
    require(bb.getShort == 16, s"asset ${a.asset_id}: not 16-bit")
    require(tag() == "data", s"asset ${a.asset_id}: data chunk missing")
    (rate, bb.getInt / 2, bb)
  }

  /** Fingerprint frame count — 16 frames → a 15-bit delta fingerprint.
    * Coarse on purpose: a perceptual fingerprint must collide for
    * similar signals; a deployment raises this (and adds band filters)
    * to tune selectivity. Single-constant rule: both engines
    * interpolate. */
  val AudioFpFrames = 16

  /** Perceptual audio fingerprint over the REAL parsed waveform — the
    * audio analog of m4's [[imagePHash]], after Haitsma & Kalker's
    * robust-hash construction: split the signal into
    * [[AudioFpFrames]] fixed frames, per-frame energy as the exact
    * sum-of-squares (integer — no float ever enters), one bit per
    * adjacent frame pair = sign of the energy delta. Amplitude-
    * scale-robust in the way that matters for dup detection (the bit
    * is a comparison, not a magnitude), integer-exact, and map-only:
    * one pass over each asset's samples, frame index by the shared
    * `k·F/n` integer arithmetic the oracle re-derives. */
  def audioFingerprint(spark: SparkSession,
      assetsDs: Dataset[AudioAsset]): Dataset[AudioFingerprint] = {
    import spark.implicits._
    assetsDs.mapPartitions(it => it.map(fpOf))
  }

  /** One asset's fingerprint — the per-row arithmetic shared by
    * [[audioFingerprint]] and [[audioFingerprintScreened]], top-level
    * so task closures reference the module statically. */
  private def fpOf(a: AudioAsset): AudioFingerprint = {
    val (_, n, bb) = parseWavHeader(a)
    // fewer samples than frames would leave sample-less frames at
    // zero energy while the oracle's fr CTE only materializes frames
    // that RECEIVED samples — lag() would then compare non-adjacent
    // frames and the fingerprint would silently diverge. Fail loudly
    // (the header-parse convention) instead of emitting a fingerprint
    // the oracle cannot reproduce.
    require(n >= AudioFpFrames,
      s"asset ${a.asset_id}: $n samples < $AudioFpFrames fingerprint " +
        "frames — too short to fingerprint")
    val ssq = new Array[Long](AudioFpFrames)
    (0 until n).foreach { k =>
      val s = bb.getShort.toInt
      // long arithmetic: k * 16 overflows Int for WAVs past 2^27
      // samples (~47 min at 48 kHz) — the oracle's BIGINT twin
      ssq((k.toLong * AudioFpFrames / n).toInt) += s.toLong * s
    }
    val bits = (1 until AudioFpFrames)
      .map(f => if (ssq(f) > ssq(f - 1)) '1' else '0').mkString
    AudioFingerprint(a.asset_id, n, bits)
  }

  /** Ingest-scale twin of [[audioFingerprint]]: SCREEN AND QUARANTINE
    * instead of throw — the K1 tolerant-sink convention applied to the
    * fingerprint stage. At deployment scale one short or corrupt asset
    * must not kill a whole partition's task; this routes assets that
    * cannot fingerprint (fewer samples than [[AudioFpFrames]], or an
    * unparseable container) into a `(asset_id, reason)` quarantine
    * frame while the rest run [[audioFingerprint]]'s exact arithmetic.
    * The strict variant stays the oracle-gated default: a FIXTURE
    * asset that cannot fingerprint is a bug, not data, and must fail
    * loudly.
    *
    * ONE pass over the source: each row is screened AND fingerprinted
    * in a single tagged `mapPartitions`, the tagged frame is
    * materialized ([[Dedup.materialize]]), and both outputs are filters
    * over it — so the source's media bytes are read and header-parsed
    * exactly once per asset, and a non-deterministic or recomputed
    * upstream can never land an asset in both frames or neither
    * (the two-output single-read contract a tolerant ingest sink
    * needs; an earlier draft ran two independent screening passes). */
  def audioFingerprintScreened(spark: SparkSession,
      assetsDs: Dataset[AudioAsset],
      checkpointDir: Option[String] = None)
      : (Dataset[AudioFingerprint], DataFrame) = {
    import spark.implicits._
    // mapPartitions (the audioFingerprint pattern), NOT typed filter:
    // a Dataset.filter(func) predicate embeds its lambda uncleaned in
    // the plan, and one referencing this object's parse helper drags
    // the whole (non-serializable) module into the task binary
    val tagged = graft.operators.Dedup.materialize(
      assetsDs.mapPartitions(it => it.map(screenedFpRow))
        .toDF("asset_id", "n_samples", "afp", "reason"),
      checkpointDir)
    val ok = tagged.where(col("reason").isNull)
      .select(col("asset_id"), col("n_samples"), col("afp"))
      .as[AudioFingerprint]
    (ok, tagged.where(col("reason").isNotNull).select("asset_id", "reason"))
  }

  /** One asset screened and (when clean) fingerprinted — the single
    * per-row pass behind [[audioFingerprintScreened]]: quarantined
    * rows carry the reason and placeholder fingerprint fields, clean
    * rows [[audioFingerprint]]'s exact arithmetic and a null reason.
    * Top-level so task closures reference the module statically. */
  private def screenedFpRow(a: AudioAsset): (Long, Int, String, String) =
    fpQuarantineReason(a) match {
      case null =>
        val fp = fpOf(a)
        (fp.asset_id, fp.n_samples, fp.afp, null)
      case reason => (a.asset_id, 0, null, reason)
    }

  /** Why an asset cannot fingerprint, or null — the
    * [[audioFingerprintScreened]] screen, a top-level method so task
    * closures reference the module statically. */
  private def fpQuarantineReason(a: AudioAsset): String =
    scala.util.Try(parseWavHeader(a)) match {
      case scala.util.Failure(e) => s"unparseable: ${e.getMessage}"
      case scala.util.Success((_, n, _)) if n < AudioFpFrames =>
        s"$n samples < $AudioFpFrames fingerprint frames"
      case _ => null
    }

  /** Duplicate grouping over a precomputed fingerprint frame — the
    * audio twin of [[phashDupGroupsFrom]], emitted per-ASSET (each row
    * carries its group's size and representative) so the frame is the
    * complete dedup decision table: `n_dups >= 2` filters to dup
    * groups, `asset_id = rep` selects survivors. One window over the
    * fingerprint key — a hash-partitioned shuffle of thin rows, no
    * pair join to blow up on fingerprint cliques. */
  def audioDupGroupsFrom(fp: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("afp")
    fp.select(col("asset_id"), col("n_samples"), col("afp"),
      count(lit(1)).over(w).as("n_dups"),
      min(col("asset_id")).over(w).as("rep"))
  }

  /** The m7 oracle: the generator's sample formula through the same
    * frame-assignment, energy, and sign-delta arithmetic in SQL, then
    * the same per-asset group window. */
  def audioDupGroupsSql: String =
    s"""WITH sm AS (
       |  SELECT doc_id AS asset_id, k, 256 + doc_id % 128 AS n,
       |    ((doc_id * 31 + k * k * 7) % 65536) - 32768 AS s
       |  FROM documents, generate_series(0, 382) t(k)
       |  WHERE k < 256 + doc_id % 128
       |), fr AS (
       |  SELECT asset_id, (k * $AudioFpFrames) // n AS f, sum(s * s) AS e
       |  FROM sm GROUP BY asset_id, (k * $AudioFpFrames) // n
       |), dlt AS (
       |  SELECT asset_id, f, e,
       |    lag(e) OVER (PARTITION BY asset_id ORDER BY f) AS pe
       |  FROM fr
       |), fp AS (
       |  SELECT asset_id,
       |    string_agg(CASE WHEN e > pe THEN '1' ELSE '0' END, ''
       |      ORDER BY f) AS afp
       |  FROM dlt WHERE f > 0 GROUP BY asset_id
       |)
       |SELECT asset_id, CAST(256 + asset_id % 128 AS INT) AS n_samples,
       |  afp,
       |  count(*) OVER (PARTITION BY afp) AS n_dups,
       |  min(asset_id) OVER (PARTITION BY afp) AS rep
       |FROM fp""".stripMargin

  /** The m6 oracle: the generator's sample formula run through the same
    * peak/energy/zero-crossing arithmetic in SQL. */
  def audioFeaturesSql: String =
    s"""WITH sm AS (
       |  SELECT doc_id AS asset_id, k,
       |    ((doc_id * 31 + k * k * 7) % 65536) - 32768 AS s
       |  FROM documents, generate_series(0, 382) t(k)
       |  WHERE k < 256 + doc_id % 128
       |), lg AS (
       |  SELECT asset_id, s,
       |    lag(s) OVER (PARTITION BY asset_id ORDER BY k) AS ps
       |  FROM sm
       |), st AS (
       |  SELECT asset_id,
       |    max(abs(s)) AS peak,
       |    sum(s * s) AS energy_ssq,
       |    sum(CASE WHEN (s < 0) <> (ps < 0) THEN 1 ELSE 0 END)
       |      AS zero_crossings
       |  FROM lg GROUP BY asset_id
       |)
       |SELECT asset_id, $WavSampleRate AS sample_rate,
       |  CAST(256 + asset_id % 128 AS INT) AS n_samples,
       |  CAST(peak AS INT) AS peak,
       |  CAST(energy_ssq AS BIGINT) AS energy_ssq,
       |  CAST(zero_crossings AS INT) AS zero_crossings
       |FROM st""".stripMargin

  /** DECODE STUB — deterministic fake standing in for codecs the JDK
    * does NOT ship (video/audio); for JDK-supported image formats the
    * REAL path is [[decodeImageMeta]]. Real deployments replace the
    * body with the actual decoder call; the batched per-partition
    * iteration around it (the `mapInPandas`-shaped plumbing) is real. */
  def fakeDecode(bytes: Array[Byte]): MediaFrame =
    MediaFrame(-1, -1, -1, bytes.length,
      java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString)

  /** Per-partition batched decode: iterates frames in partition order,
    * invoking the (stubbed) decoder once per frame without materializing
    * the partition — the JVM shape of an Arrow-batch UDF. */
  def decodeFrames(spark: SparkSession, frames: DataFrame): Dataset[MediaFrame] = {
    import spark.implicits._
    frames.select("asset_id", "frame_no", "offset", "frame_bytes")
      .as[(Long, Int, Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, no, off, bytes) =>
          fakeDecode(bytes).copy(asset_id = id, frame_no = no, offset = off)
        }
      }
  }
}
