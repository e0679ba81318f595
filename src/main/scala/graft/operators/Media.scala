package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * The reference has no media surface (IntelPython/sdc is tabular-only);
  * this is the parity-plus layer a 100 TB training-data pipeline needs.
  * Design rules at scale:
  *   - blobs ride in a `BinaryType` column next to their metadata struct,
  *     so one scan serves both filtering (pushed down on metadata) and
  *     decoding — no second fetch round-trip;
  *   - decoding runs per-partition over an iterator (`mapPartitions`
  *     batch shape — a real decoder amortizes codec/model init across the
  *     partition, exactly like a Pandas-UDF `mapInPandas` batch);
  *   - decoded features are small fixed-width columns; the blob is
  *     dropped as early as possible so shuffles never carry bytes.
  *
  * Two decoder paths share the batch seam:
  *   - [[decodeImage]] is a REAL codec — JDK `javax.imageio` (PNG, JPEG,
  *     BMP, GIF readers ship with Java 17, zero extra dependency) decodes
  *     the actual byte stream and integrates pixel luma;
  *   - [[decodeStub]] stays for blobs that are not images at all (the
  *     documents fixture's UTF-8 text bytes under `image/fake`), deriving
  *     deterministic pseudo-features from the byte length so the DuckDB
  *     oracle can verify the PIPELINE (schema, fan-out, resize math)
  *     end-to-end without a codec of its own.
  * [[syntheticImages]] generates real striped-grayscale PNGs from doc_id
  * alone, which makes the real-codec path oracle-checkable too: the
  * expected width/height/mean-luma are closed-form in doc_id, and PNG is
  * lossless, so DuckDB can predict what the codec must read back.
  */
object Media {

  // ImageIO defaults to spooling decode buffers through temp FILES; with
  // in-memory blobs that is pure overhead (and a local-disk dependency
  // executors shouldn't have). Per-JVM, set once at class load.
  javax.imageio.ImageIO.setUseCache(false)

  /** Input: one media blob + metadata (the real decode batch row). */
  case class MediaIn(doc_id: Long, bytes: Array[Byte], mime: String)

  /** Decoded image metadata (what a real codec would return). */
  case class MediaMeta(doc_id: Long, width: Int, height: Int,
                       mean_luma: Int, n_bytes: Long)

  /** REAL image decode: parse the blob with `javax.imageio` and
    * integrate luma over the actual pixels. Single-band (grayscale)
    * images sum raw raster samples — exact, no color-management pass;
    * multi-band images fold Rec.601 integer luma
    * ((299R + 587G + 114B) / 1000) per pixel. `mean_luma` is the
    * truncating integer mean, so for the lossless PNGs
    * [[syntheticImages]] emits it is bit-exact and oracle-predictable.
    * Undecodable bytes under an image mime are a loud error, not a
    * silent stub fallback — corrupt media should fail the batch. */
  private[graft] def decodeImage(m: MediaIn): MediaMeta = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(m.bytes))
    require(img != null, s"undecodable ${m.mime} blob, doc_id=${m.doc_id}")
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    var sum = 0L
    var y = 0
    if (raster.getNumBands == 1) {
      while (y < h) {
        var x = 0
        while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
    } else {
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sum += (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
            114L * (rgb & 0xff)) / 1000L
          x += 1
        }
        y += 1
      }
    }
    MediaMeta(m.doc_id, w, h, (sum / (w.toLong * h)).toInt,
      m.bytes.length.toLong)
  }

  /** REAL thumbnail: decode the blob, downscale by integer factor
    * `factor` with NEAREST-NEIGHBOR resampling (pixel (x, y) of the
    * thumbnail is source pixel (x·factor, y·factor) — deterministic
    * pixel selection, no filter kernel), and re-measure luma over the
    * RESAMPLED pixels. For [[syntheticImages]]' even-row/odd-row
    * stripes at factor 2, the thumbnail keeps only EVEN source rows, so
    * its mean luma is exactly g1 — the closed form the oracle replays.
    * (Production thumbnails use area/bilinear kernels; nearest keeps
    * the op oracle-checkable while still exercising real decode →
    * real resample → real pixel integration.) */
  private[graft] def thumbnail(m: MediaIn, factor: Int): MediaMeta = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(m.bytes))
    require(img != null, s"undecodable ${m.mime} blob, doc_id=${m.doc_id}")
    val tw = math.max(1, img.getWidth / factor)
    val th = math.max(1, img.getHeight / factor)
    val raster = img.getRaster
    val gray = raster.getNumBands == 1
    var sum = 0L
    var y = 0
    while (y < th) {
      var x = 0
      while (x < tw) {
        // grayscale: raw raster sample (exact, no color management);
        // multi-band: the same Rec.601 integer fold decodeImage uses
        sum +=
          (if (gray) raster.getSample(x * factor, y * factor, 0).toLong
           else {
             val rgb = img.getRGB(x * factor, y * factor)
             (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
               114L * (rgb & 0xff)) / 1000L
           })
        x += 1
      }
      y += 1
    }
    MediaMeta(m.doc_id, tw, th, (sum / (tw.toLong * th)).toInt,
      m.bytes.length.toLong)
  }

  /** Thumbnail stage over a media table: same mapPartitions batch seam
    * as [[decode]], real codec + real resampling per record. */
  def thumbnails(spark: SparkSession, media: DataFrame,
                 factor: Int): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("bytes"), col("meta.mime").as("mime"))
      .as[MediaIn]
      .mapPartitions(_.map(thumbnail(_, factor)))
  }

  /** Encode one striped grayscale PNG: even rows at `g1`, odd rows at
    * `g2`. With an even height the truncating mean luma is exactly
    * (g1 + g2) / 2 — the closed form the oracle replays. */
  private[graft] def encodeGrayPng(width: Int, height: Int,
                                   g1: Int, g2: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      val g = if (y % 2 == 0) g1 else g2
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, g); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    // ImageIO.write returns false (leaving bos EMPTY) when no writer is
    // registered for the format — fail here, not later as a confusing
    // "undecodable blob" at decode time.
    require(javax.imageio.ImageIO.write(img, "png", bos),
      "no ImageIO writer registered for png")
    bos.toByteArray
  }

  /** The striped-PNG closed forms (width, height, base luma) for one
    * id — the ONE definition the in-memory generator, the on-disk
    * file fixture, and (by transcription) the DuckDB oracles share.
    * Change it here and in the oracle strings together. */
  private[graft] def stripeParams(id: Long): (Int, Int, Int) =
    ((8 + id % 16).toInt, (8 + 2 * (id % 8)).toInt, ((id * 7) % 200).toInt)

  /** Deterministic real-PNG corpus: one striped grayscale PNG per id,
    * every parameter the [[stripeParams]] closed form in doc_id (width
    * 8+id%16, even height 8+2·(id%8), stripes at g and g+40 → mean luma
    * g+20 where g = 7·id % 200). Encoding runs per-partition — each
    * executor produces its own rows' blobs; no bytes originate at the
    * driver. */
  def syntheticImages(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val (w, h, g) = stripeParams(id)
          MediaIn(id, encodeGrayPng(w, h, g, g + 40), "image/png")
        }
      }
      .toDF()
      .select(col("doc_id"), col("bytes"),
        struct(col("mime"), length(col("bytes")).cast("long").as("n_bytes"))
          .as("meta"))
  }

  /** Encode one striped RGB PNG: even rows at `(r1,g1,b1)`, odd rows at
    * `(r2,g2,b2)`. PNG RGB is lossless, so the factor-2 thumbnail (even
    * rows, all pixels identical) has mean luma exactly
    * Rec.601(r1,g1,b1) — the closed form the oracle replays. */
  private[graft] def encodeRgbPng(width: Int, height: Int,
                                  c1: (Int, Int, Int),
                                  c2: (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      val (r, g, b) = if (y % 2 == 0) c1 else c2
      val rgb = (r << 16) | (g << 8) | b
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", bos),
      "no ImageIO writer registered for png")
    bos.toByteArray
  }

  /** Deterministic real COLOR corpus: one striped RGB PNG per id, every
    * channel a closed form in doc_id (same geometry as
    * [[syntheticImages]]; even-row channels (3·id, 5·id, 7·id) mod 256,
    * odd rows offset +40 per channel mod 256). Encoded per-partition. */
  def syntheticColorImages(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val (w, h, _) = stripeParams(id)
          val c1 = (((id * 3) % 256).toInt, ((id * 5) % 256).toInt,
            ((id * 7) % 256).toInt)
          val c2 = ((c1._1 + 40) % 256, (c1._2 + 40) % 256, (c1._3 + 40) % 256)
          MediaIn(id, encodeRgbPng(w, h, c1, c2), "image/png")
        }
      }
      .toDF()
      .select(col("doc_id"), col("bytes"),
        struct(col("mime"), length(col("bytes")).cast("long").as("n_bytes"))
          .as("meta"))
  }

  /** Encode one UNIFORM grayscale JPEG at level `g` — a real lossy
    * stream via the JDK JPEG writer. A uniform image is all-DC, so the
    * decoded level lands within a couple of quantization steps of `g`;
    * callers verify with a TOLERANCE band, never bit equality. */
  private[graft] def encodeGrayJpeg(width: Int, height: Int,
                                    g: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, g); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "jpg", bos),
      "no ImageIO writer registered for jpg")
    bos.toByteArray
  }

  /** Deterministic real-JPEG corpus: one uniform grayscale JPEG per id
    * (level 8 + (11·id) % 240 — clear of the clamp edges where JPEG
    * ringing could saturate), same geometry closed forms. The LOSSY
    * path: queries over this corpus assert a tolerance band, which
    * keeps a hash-checkable oracle (the boolean verdict is exact) while
    * the decoded pixels are not. */
  def syntheticJpegs(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val (w, h, _) = stripeParams(id)
          val g = (8 + (id * 11) % 240).toInt
          MediaIn(id, encodeGrayJpeg(w, h, g), "image/jpeg")
        }
      }
      .toDF()
      .select(col("doc_id"), col("bytes"),
        struct(col("mime"), length(col("bytes")).cast("long").as("n_bytes"))
          .as("meta"))
  }

  /** STUB decoder for non-image blobs — deterministic fake features
    * from the byte length, a pure function DuckDB reproduces with
    * octet_length, so the pipeline shape stays oracle-checkable even
    * where the blob isn't decodable media at all. */
  private[graft] def decodeStub(m: MediaIn): MediaMeta = {
    val n = m.bytes.length.toLong
    MediaMeta(m.doc_id,
      width = (64 + n % 512).toInt,
      height = (64 + (n * 7) % 512).toInt,
      mean_luma = (n % 256).toInt,
      n_bytes = n)
  }

  /** documents → media table: blob column + typed metadata struct.
    * (Here the "image" bytes are the UTF-8 text bytes — a deterministic
    * stand-in blob; schema and plumbing are what matter.) */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      col("text").cast("binary").as("bytes"),
      struct(lit("image/fake").as("mime"),
        length(col("text").cast("binary")).as("n_bytes"),
        col("lang").as("lang")).as("meta"))

  /** Decode stage: per-partition batch iteration, blob dropped on exit.
    * Mime-dispatched — real image mimes hit the `javax.imageio` codec;
    * the fixture's `image/fake` text blobs keep the byte-length stub. */
  def decode(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("bytes"), col("meta.mime").as("mime"))
      .as[MediaIn]
      .mapPartitions { batch =>
        batch.map { m =>
          if (m.mime.startsWith("image/") && m.mime != "image/fake")
            decodeImage(m)
          else decodeStub(m)
        }
      }
  }

  /** Resize stage: pure metadata arithmetic on decoded frames —
    * stays in whole-stage codegen, no re-decode. */
  def resize(decoded: DataFrame, maxDim: Int): DataFrame = {
    val scale = greatest(col("width"), col("height")).cast("double") / maxDim
    val factor = when(scale > 1.0, scale).otherwise(lit(1.0))
    decoded
      .withColumn("out_w", floor(col("width") / factor).cast("int"))
      .withColumn("out_h", floor(col("height") / factor).cast("int"))
  }

  /** ceil(n_bytes / unit) chunk count in BIGINT arithmetic — the ONE
    * chunking formula frame sampling and audio chunking share. An
    * exact-multiple blob gets no empty trailing chunk; a 0-byte blob
    * gets 0 chunks (callers filter those rows out before exploding —
    * Spark's `sequence(0, -1)` errors rather than yielding empty). */
  private def chunkCount(unit: Long): Column =
    expr(s"(cast(meta.n_bytes as bigint) + ${unit - 1}) div $unit")

  /** Frame-sample stage for "video" blobs: one row per sampled frame
    * index. posexplode of a sequence is a generator — rows multiply
    * inside the stage with no shuffle. */
  def frameSample(media: DataFrame, bytesPerFrame: Long, step: Int): DataFrame =
    media
      .withColumn("n_frames", chunkCount(bytesPerFrame))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(step.toLong)))
          .as("frame_idx"))

  /** Per-chunk feature of REAL decoded audio. */
  case class AudioFeat(doc_id: Long, chunk_idx: Int, n_samples: Int, rms: Long)

  /** Encode a 16-bit mono PCM WAV (±amp square wave) via the JDK's
    * `javax.sound.sampled` writer — a real RIFF/WAVE byte stream. With
    * every sample at magnitude `amp`, RMS over ANY window is exactly
    * `amp`, which is what makes the decode oracle-checkable. */
  private[graft] def encodePcmWav(nSamples: Int, amp: Int): Array[Byte] = {
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = if (i % 2 == 0) amp else -amp
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode: parse the WAV container with
    * `javax.sound.sampled`, then integrate RMS energy per fixed-size
    * sample chunk. 16-bit mono PCM only (what [[syntheticAudio]]
    * emits); anything else errors loudly. RMS is truncated to a long —
    * exact for the square-wave fixture (perfect-square mean, and IEEE
    * sqrt is correctly rounded). */
  private[graft] def decodeWavChunks(m: MediaIn,
                                     chunkSamples: Int): Seq[AudioFeat] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(m.bytes))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      !fmt.isBigEndian, s"unsupported WAV format $fmt, doc_id=${m.doc_id}")
    val raw = ais.readAllBytes()
    val n = raw.length / 2
    (0 until (n + chunkSamples - 1) / chunkSamples).map { c =>
      val lo = c * chunkSamples
      val hi = math.min(lo + chunkSamples, n)
      var sumSq = 0L
      var i = lo
      while (i < hi) {
        val s = ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff)).toShort.toLong
        sumSq += s * s
        i += 1
      }
      AudioFeat(m.doc_id, c, hi - lo,
        math.sqrt(sumSq.toDouble / (hi - lo)).toLong)
    }
  }

  /** Deterministic real-WAV corpus: square wave, amplitude and length
    * closed forms in doc_id (amp 1000+500·(id%16); 1600+800·(id%4)
    * samples — a whole number of 800-sample chunks). Encoded
    * per-partition like [[syntheticImages]]. */
  def syntheticAudio(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val amp = (1000 + (id % 16) * 500).toInt
          val nSamples = (1600 + 800 * (id % 4)).toInt
          MediaIn(id, encodePcmWav(nSamples, amp), "audio/wav")
        }
      }
      .toDF()
      .select(col("doc_id"), col("bytes"),
        struct(col("mime"), length(col("bytes")).cast("long").as("n_bytes"))
          .as("meta"))
  }

  /** Decode stage for real audio blobs: mapPartitions batch shape,
    * rows fan out to one per chunk, blob dropped on exit.
    * Mime-dispatched like [[decode]]: only `audio/wav` rows reach the
    * PCM parser; any other mime on a mixed media table errors loudly
    * at the ROW level (doc_id named) instead of throwing an opaque
    * container-parse failure deep inside the codec. */
  def decodeAudio(spark: SparkSession, media: DataFrame,
                  chunkSamples: Int): Dataset[AudioFeat] = {
    import spark.implicits._
    media.select(col("doc_id"), col("bytes"), col("meta.mime").as("mime"))
      .as[MediaIn]
      .mapPartitions(_.flatMap { m =>
        require(m.mime == "audio/wav",
          s"decodeAudio: unsupported mime '${m.mime}' for doc_id=${m.doc_id}" +
            " — route non-WAV rows to their own decode stage")
        decodeWavChunks(m, chunkSamples)
      })
  }

  /** "Audio" pipeline shape: fixed-duration chunking + a per-chunk
    * feature (RMS-energy STUB — a pure function of (blob length,
    * chunk index) in lieu of a PCM decoder, so the oracle can replay
    * it; a real implementation decodes the chunk's samples here).
    * Generator + projection: rows multiply in-stage, features are
    * small fixed-width columns, the blob never crosses a shuffle. */
  def audioChunks(media: DataFrame, bytesPerChunk: Long): DataFrame =
    media
      .withColumn("n_chunks", chunkCount(bytesPerChunk))
      .filter(col("n_chunks") > 0)
      .select(col("doc_id"),
        col("meta.n_bytes").cast("long").as("n_bytes"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .withColumn("energy",
        pmod(col("n_bytes") * 31 + col("chunk_idx") * 17, lit(1000L))
          .cast("double") / 1000.0)
}
