package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.local("multimodal-spec", cores = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("synthetic media table matches the declared schema") {
    val m = Multimodal.syntheticMedia(spark, sfDir)
    // nullability is layout-dependent (parquet sources relax it); the
    // contract is names + types
    assert(
      m.schema.fields.map(f => (f.name, f.dataType.catalogString)).toSeq ===
        Multimodal.mediaSchema.fields.map(f => (f.name, f.dataType.catalogString)).toSeq)
    val kinds = m.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds === Set("image", "audio", "video"))
    assert(m.count() > 0)
  }

  test("feature extraction: deterministic, partitioning-invariant, null-safe") {
    val m = Multimodal.syntheticMedia(spark, sfDir).limit(100)
    val f1 = Multimodal.extractFeatures(m, dim = 8, batchSize = 16)
    assert(f1.schema.fieldNames.contains("features"))
    val a = f1.select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // different partitioning and batch size → identical features
    val f2 = Multimodal.extractFeatures(m.repartition(7), dim = 8, batchSize = 3)
    val b = f2.select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a === b)
    assert(a.values.forall(_.length === 8))

    // null payloads pass through as null features
    val withNull = m.withColumn("content",
      when(col("media_id") % 2 === 0, col("content")))
    val fn = Multimodal.extractFeatures(withNull, dim = 4)
    val nulls = fn.where(col("features").isNull).count()
    assert(nulls === withNull.where(col("content").isNull).count())
  }

  test("resize stub clamps dimensions, preserves payload") {
    val m = Multimodal.syntheticMedia(spark, sfDir)
    val r = Multimodal.resizeStub(m, 400, 300)
    assert(r.where(col("meta.width") > 400 || col("meta.height") > 300).count() === 0)
    // payload untouched
    val before = m.select(sum(length(col("content")))).head().getLong(0)
    val after = r.select(sum(length(col("content")))).head().getLong(0)
    assert(before === after)
  }

  test("frame sampling emits duration/interval rows per video") {
    val m = Multimodal.syntheticMedia(spark, sfDir)
    val frames = Multimodal.sampleFrames(m, everyMs = 500L)
    val perVideo = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
    val joined = perVideo.join(
      m.where(col("kind") === "video").select(col("media_id"), col("meta.duration_ms")),
      Seq("media_id"))
    val bad = joined.where(
      col("n") =!= ceil(col("duration_ms").cast("double") / 500.0)).count()
    assert(bad === 0)
    // frame indexes are dense from 0
    val maxIdx = frames.groupBy("media_id").agg(max("frame_idx").as("mx"), count(lit(1)).as("n"))
    assert(maxIdx.where(col("mx") =!= col("n") - 1).count() === 0)
  }

  /** Byte-accurate 16-bit PCM WAV: 440 Hz sine, amplitude a, n samples. */
  private def wavBytes(rate: Int, n: Int, amplitude: Double): Array[Byte] = {
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    (0 until n).foreach { i =>
      val s = amplitude * math.sin(2 * math.Pi * 440 * i / rate)
      bb.putShort((s * 32767).toShort)
    }
    bb.array()
  }

  /** Minimal 24bpp BMP with a constant pixel value (no padding: width%4==0). */
  private def bmpBytes(w: Int, h: Int, value: Int): Array[Byte] = {
    val raster = w * h * 3
    val bb = java.nio.ByteBuffer.allocate(54 + raster)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + raster)
      .putInt(0).putInt(54)
      .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(raster).putInt(2835).putInt(2835).putInt(0).putInt(0)
    (0 until raster).foreach(_ => bb.put(value.toByte))
    bb.array()
  }

  test("REAL decode: WAV header walk, PCM RMS, BMP dimensions and raster stats") {
    // a full-scale sine has RMS 1/sqrt(2); at amplitude 0.5 → ~0.3536
    val wav = Multimodal.probe(wavBytes(16000, 16000, 0.5)).get
    assert(wav.format === "wav")
    assert(wav.sampleRate.get === 16000 && wav.channels.get === 1)
    assert(wav.bitsPerSample.get === 16)
    assert(math.abs(wav.durationMs.get - 1000.0) < 1e-9)
    assert(math.abs(wav.rms.get - 0.5 / math.sqrt(2)) < 0.01)

    val bmp = Multimodal.probe(bmpBytes(16, 9, 200)).get
    assert(bmp.format === "bmp")
    assert(bmp.width.get === 16 && bmp.height.get === 9 && bmp.bpp.get === 24)
    assert(math.abs(bmp.meanByte.get - 200.0) < 1e-9)

    // garbage, truncation, and non-PCM are quarantined as None, not errors
    assert(Multimodal.probe("not media at all".getBytes).isEmpty)
    assert(Multimodal.probe(wavBytes(16000, 100, 0.5).take(30)).isEmpty)
    assert(Multimodal.probe(null).isEmpty)
  }

  test("decodeMedia: batched real decode over a mixed binary column") {
    val sp = spark; import sp.implicits._
    val media = Seq(
      (1L, wavBytes(8000, 4000, 0.25)),
      (2L, bmpBytes(8, 4, 100)),
      (3L, "opaque compressed payload".getBytes),
      (4L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "content")
      .repartition(3)
    val out = Multimodal.decodeMedia(media).collect()
      .map(r => r.getLong(0) -> Option(r.getAs[org.apache.spark.sql.Row]("decoded")))
      .toMap
    assert(out(1L).get.getAs[String]("format") === "wav")
    assert(math.abs(out(1L).get.getAs[Double]("duration_ms") - 500.0) < 1e-9)
    assert(out(2L).get.getAs[String]("format") === "bmp")
    assert(out(2L).get.getAs[Int]("width") === 8)
    assert(out(3L).isEmpty && out(4L).isEmpty)
  }

  test("PNG: DEFLATE roundtrip, every filter type reconstructs, quarantine semantics") {
    // encode → probe roundtrip on a known raster (gray): the encoder
    // rotates None/Sub/Up filters, so reconstruction arithmetic runs
    val w = 8; val h = 9
    val pixels = Array.tabulate(w * h)(i => ((i * 37 + 11) % 256).toByte)
    val png = Multimodal.pngEncode(pixels, w, h, 1)
    val p = Multimodal.probe(png)
    assert(p.isDefined && p.get.format === "png")
    assert(p.get.width === Some(w) && p.get.height === Some(h))
    assert(p.get.bpp === Some(8))
    val mean = pixels.map(_ & 0xff).sum.toDouble / (w * h)
    assert(math.abs(p.get.meanByte.get - mean) < 1e-9)

    // RGB roundtrip
    val rgb = Array.tabulate(4 * 3 * 3)(i => ((i * 53) % 256).toByte)
    val pngRgb = Multimodal.pngEncode(rgb, 4, 3, 3)
    val pr = Multimodal.probe(pngRgb).get
    assert(pr.width === Some(4) && pr.height === Some(3) && pr.bpp === Some(24))
    assert(math.abs(pr.meanByte.get - rgb.map(_ & 0xff).sum.toDouble / rgb.length) < 1e-9)

    // Average(3) and Paeth(4) filters, hand-built scanlines: raster of
    // two 4-px gray rows, filtered with 3 then 4 — the decoder must
    // reproduce the reference reconstruction
    val ref = Array[Byte](10, 20, 30, 40, 15, 25, 35, 45)
    def filt34(px: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](2 * 5)
      out(0) = 3
      for (x <- 0 until 4) {
        val a = if (x >= 1) px(x - 1) & 0xff else 0
        out(1 + x) = (((px(x) & 0xff) - a / 2) & 0xff).toByte
      }
      out(5) = 4
      for (x <- 0 until 4) {
        val a = if (x >= 1) px(4 + x - 1) & 0xff else 0
        val b = px(x) & 0xff
        val c = if (x >= 1) px(x - 1) & 0xff else 0
        val pval = a + b - c
        val pa = math.abs(pval - a); val pb = math.abs(pval - b); val pc = math.abs(pval - c)
        val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        out(6 + x) = (((px(4 + x) & 0xff) - pred) & 0xff).toByte
      }
      out
    }
    // wrap the filtered scanlines in a real zlib stream + chunk framing
    // by deflating manually (reuse pngEncode's framing via reflection-free
    // local rebuild: deflate raw, then splice into IHDR/IDAT/IEND)
    val raw = filt34(ref)
    val defl = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length + 64)
      val bos = new java.io.ByteArrayOutputStream()
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end(); bos.toByteArray
    }
    def chunk(t: String, data: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def be(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      bos.write(be(data.length), 0, 4)
      val tb = t.getBytes("US-ASCII"); bos.write(tb, 0, 4)
      bos.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
      bos.write(be(crc.getValue.toInt), 0, 4)
      bos.toByteArray
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(4).putInt(2).put(8.toByte).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val png34 = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", defl) ++ chunk("IEND", Array.emptyByteArray)
    val p34 = Multimodal.probe(png34).get
    assert(math.abs(p34.meanByte.get - ref.map(_ & 0xff).sum.toDouble / 8) < 1e-9)

    // quarantine: flipped CRC byte, truncated IDAT, 16-bit depth
    val bad = png.clone(); bad(bad.length - 5) = (bad(bad.length - 5) ^ 0x7f).toByte
    assert(Multimodal.probe(bad).isEmpty, "corrupt CRC must quarantine")
    val trunc = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", defl.take(3)) ++
      chunk("IEND", Array.emptyByteArray)
    assert(Multimodal.probe(trunc).isEmpty, "truncated zlib must quarantine")
    val ihdr16 = ihdr.clone(); ihdr16(8) = 16.toByte
    val png16 = sig ++ chunk("IHDR", ihdr16) ++ chunk("IDAT", defl) ++
      chunk("IEND", Array.emptyByteArray)
    assert(Multimodal.probe(png16).isEmpty, "unsupported depth must quarantine")
  }

  test("q136 pipeline: encode/decode roundtrip stats match the raster locally") {
    val out = graft.operators.Multimodal
      .q136PngStats(spark, sfDir).limit(50).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getInt(1) === 8) // width
      assert(r.getInt(3) === 8) // bpp
      assert(r.getInt(2) > 0)   // height
      val m = r.getDouble(4)
      assert(m >= 32.0 && m < 127.0, s"printable-ASCII mean, got $m")
    }
  }
}
