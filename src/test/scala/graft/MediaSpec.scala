package graft

import org.apache.spark.sql.functions._

import graft.operators.Media

/** Multimodal plumbing (schema, batch decode shape, explode fan-out)
  * plus the REAL `javax.imageio` codec path on actual PNG/JPEG bytes. */
class MediaSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a" * 1000, "en"), (2L, "b" * 2500, "de"), (3L, "c", "en"))
    .toDF("doc_id", "text", "lang")

  test("mediaTable carries blob + typed metadata struct") {
    val m = Media.mediaTable(docs)
    assert(m.schema("bytes").dataType.typeName == "binary")
    val meta = m.select(col("doc_id"), col("meta.n_bytes"))
      .as[(Long, Int)].collect().toMap
    assert(meta == Map(1L -> 1000, 2L -> 2500, 3L -> 1))
  }

  test("decodeStub is a pure function of the byte length") {
    val a = Media.decodeStub(Media.MediaIn(7L, Array.fill(1000)(1.toByte), "x"))
    assert(a == Media.MediaMeta(7L, 64 + 1000 % 512, 64 + 7000 % 512, 1000 % 256, 1000L))
  }

  test("decode runs per-partition and drops the blob") {
    val d = Media.decode(spark, Media.mediaTable(docs)).toDF()
    assert(d.columns.toSeq ==
      Seq("doc_id", "width", "height", "mean_luma", "n_bytes"))
    assert(d.count() == 3)
  }

  test("decodeImage reads real PNG bytes back exactly (lossless)") {
    // striped gray PNG: even rows 50, odd rows 90, even height -> mean 70
    val png = Media.encodeGrayPng(13, 10, 50, 90)
    // PNG magic: the blob is a genuine PNG stream, not a raw buffer
    assert((png.take(4).map(_ & 0xff).toSeq) == Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt))
    val m = Media.decodeImage(Media.MediaIn(1L, png, "image/png"))
    assert(m == Media.MediaMeta(1L, 13, 10, 70, png.length.toLong))
  }

  test("decodeImage handles real JPEG bytes (lossy: exact dims, close luma)") {
    val img = new java.awt.image.BufferedImage(24, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(120, 120, 120))
    g.fillRect(0, 0, 24, 16)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val m = Media.decodeImage(Media.MediaIn(2L, bos.toByteArray, "image/jpeg"))
    assert(m.width == 24 && m.height == 16)
    // solid gray survives JPEG to within quantization error of the DC term
    assert(math.abs(m.mean_luma - 119) <= 4,  s"luma ${m.mean_luma}")
  }

  test("decodeImage rejects undecodable bytes loudly") {
    intercept[IllegalArgumentException] {
      Media.decodeImage(Media.MediaIn(3L, Array.fill(64)(7.toByte), "image/png"))
    }
  }

  test("decode dispatches real image mimes to the codec end-to-end") {
    val ids = Seq(0L, 1L, 5L, 12L, 31L).toDF("doc_id")
    val got = Media.decode(spark, Media.syntheticImages(spark, ids)).toDF()
      .select(col("doc_id"), col("width"), col("height"), col("mean_luma"))
      .as[(Long, Int, Int, Int)].collect().toSet
    val want = Set(0L, 1L, 5L, 12L, 31L).map { id =>
      (id, (8 + id % 16).toInt, (8 + 2 * (id % 8)).toInt,
        ((id * 7) % 200 + 20).toInt)
    }
    assert(got == want)
  }

  test("thumbnail resamples real pixels (nearest keeps even stripe rows)") {
    // 12x10, even rows 30 / odd rows 200; factor 2 -> 6x5 of only even
    // rows -> mean luma exactly 30. Factor 3 -> 4x3 sampling rows
    // 0,3,6 = even,odd,even -> floor((30+200+30)/3) = 86.
    val png = Media.encodeGrayPng(12, 10, 30, 200)
    val t2 = Media.thumbnail(Media.MediaIn(1L, png, "image/png"), 2)
    assert((t2.width, t2.height, t2.mean_luma) == ((6, 5, 30)))
    val t3 = Media.thumbnail(Media.MediaIn(1L, png, "image/png"), 3)
    assert((t3.width, t3.height, t3.mean_luma) == ((4, 3, 86)))
  }

  test("thumbnail folds multi-band pixels with Rec.601 (color path)") {
    // 12x10 RGB, even rows (200, 100, 50) / odd rows (0, 0, 0); factor 2
    // keeps only even rows -> every pixel luma (299*200+587*100+114*50)/1000
    // = 124 (truncating), mean exactly 124. Factor 3 samples rows 0,3,6 ->
    // floor((124+0+124)/3) = 82.
    val png = Media.encodeRgbPng(12, 10, (200, 100, 50), (0, 0, 0))
    val t2 = Media.thumbnail(Media.MediaIn(1L, png, "image/png"), 2)
    assert((t2.width, t2.height, t2.mean_luma) == ((6, 5, 124)))
    val t3 = Media.thumbnail(Media.MediaIn(1L, png, "image/png"), 3)
    assert((t3.width, t3.height, t3.mean_luma) == ((4, 3, 82)))
  }

  test("uniform grayscale JPEG decodes within the quantization tolerance") {
    for (g <- Seq(8, 100, 247)) {
      val jpg = Media.encodeGrayJpeg(16, 12, g)
      // JFIF/EXIF JPEG magic: a genuine lossy byte stream
      assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
      val d = Media.decodeImage(Media.MediaIn(5L, jpg, "image/jpeg"))
      assert((d.width, d.height) == ((16, 12)))
      assert(math.abs(d.mean_luma - g) <= 3,
        s"level $g decoded to ${d.mean_luma} — outside the tolerance band")
    }
  }

  test("decodeWavChunks parses a real WAV container and integrates RMS") {
    val wav = Media.encodePcmWav(nSamples = 2000, amp = 3000)
    // RIFF magic: a genuine WAV byte stream
    assert(new String(wav.take(4), "ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "ASCII") == "WAVE")
    val chunks = Media.decodeWavChunks(
      Media.MediaIn(9L, wav, "audio/wav"), chunkSamples = 800)
    // 2000 samples -> chunks of 800, 800, 400; square wave RMS == amp
    assert(chunks == Seq(
      Media.AudioFeat(9L, 0, 800, 3000L),
      Media.AudioFeat(9L, 1, 800, 3000L),
      Media.AudioFeat(9L, 2, 400, 3000L)))
  }

  test("decodeAudio fans real WAV blobs out to per-chunk features") {
    val ids = Seq(0L, 3L, 17L).toDF("doc_id")
    val got = Media.decodeAudio(spark, Media.syntheticAudio(spark, ids), 800)
      .collect().toSet
    val want = Set(0L, 3L, 17L).flatMap { id =>
      val amp = 1000L + (id % 16) * 500
      (0 until (2 + id % 4).toInt).map(c => Media.AudioFeat(id, c, 800, amp))
    }
    assert(got == want)
  }

  test("resize never upscales and preserves aspect ratio bound") {
    val d = Media.decode(spark, Media.mediaTable(docs)).toDF()
    val r = Media.resize(d, 256)
      .select(greatest(col("out_w"), col("out_h"))).as[Int].collect()
    assert(r.forall(_ <= 256))
  }

  test("frameSample fans out one row per sampled frame") {
    val f = Media.frameSample(Media.mediaTable(docs), 1000L, step = 2)
    // doc1: 1000B -> 2 frames -> idx 0; doc2: 2500B -> 3 -> idx 0,2; doc3: 1 -> idx 0
    val got = f.orderBy("doc_id", "frame_idx")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (2L, 0L), (2L, 2L), (3L, 0L)))
  }
}
