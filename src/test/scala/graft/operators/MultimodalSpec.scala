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

  test("dHash: local replica parity, box sampling, quarantine bounds") {
    // local replica of the pinned band-mean arithmetic
    def local(px: Array[Byte], w: Int, h: Int): (Int, Int, Int, Int) = {
      val means = Array.ofDim[Double](8, 8)
      for (r <- 0 until 8; c <- 0 until 8) {
        val rows = (r * h / 8) until ((r + 1) * h / 8)
        val cols = (c * w / 8) until ((c + 1) * w / 8)
        val vals = for (y <- rows; x <- cols) yield (px(y * w + x) & 0xff)
        means(r)(c) = vals.sum.toDouble / vals.size
      }
      val b = new Array[Int](4)
      for (r <- 0 until 8; c <- 0 until 8)
        if (means(r)(c) > means(r)((c + 1) % 8))
          b(r / 2) |= 1 << ((r % 2) * 8 + c)
      (b(0), b(1), b(2), b(3))
    }
    val rnd = new scala.util.Random(200)
    // exact 8x8, ragged 8x13, and a wide 16x9 raster through the
    // generic box-sampling path
    for ((w, h) <- Seq((8, 8), (8, 13), (16, 9))) {
      val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
      assert(Multimodal.pngDHashBands(px, w, h, 1) === Some(local(px, w, h)),
        s"dHash mismatch at ${w}x$h")
    }
    // quarantine: too small, or multi-channel
    assert(Multimodal.pngDHashBands(Array.fill(56)(0.toByte), 8, 7, 1).isEmpty)
    assert(Multimodal.pngDHashBands(Array.fill(7 * 8)(0.toByte), 7, 8, 1).isEmpty)
    assert(Multimodal.pngDHashBands(Array.fill(64 * 3)(0.toByte), 8, 8, 3).isEmpty)
    // a constant raster has no gradients: all-zero bands
    assert(Multimodal.pngDHashBands(Array.fill(64)(7.toByte), 8, 8, 1)
      === Some((0, 0, 0, 0)))
  }

  test("q200: identical rasters pair at hamming 0, perturbed stay close, pigeonhole holds") {
    val sp = spark; import sp.implicits._
    // doc 2 = doc 1 verbatim (hamming 0); doc 3 = doc 1 with a small
    // byte-level perturbation deep in one row band; doc 4 unrelated
    val base = (1 to 96).map(i => ('a' + (i * 7) % 26).toChar).mkString
    val perturbed = base.updated(90, 'z')
    val other = (1 to 96).map(i => ('a' + (i * 11 + 3) % 26).toChar).mkString
    val docs = Seq((1L, base), (2L, base), (3L, perturbed), (4L, other))
      .toDF("doc_id", "text")
    // route through the declared pipeline shape by swapping the table
    val out = {
      val hashedPairs = {
        // reuse the public pieces: encode -> decode -> dHash locally
        val enc = docs.collect().map { r =>
          val bytes = r.getString(1).getBytes("US-ASCII")
          val h = bytes.length / 8
          (r.getLong(0),
            Multimodal.pngEncode(java.util.Arrays.copyOf(bytes, 8 * h), 8, h, 1))
        }
        enc.map { case (id, png) =>
          val Some((w, h, ch, px)) = Multimodal.decodePngRaster(png)
          id -> Multimodal.pngDHashBands(px, w, h, ch).get
        }.toMap
      }
      hashedPairs
    }
    def hamming(a: (Int, Int, Int, Int), b: (Int, Int, Int, Int)): Int =
      Integer.bitCount(a._1 ^ b._1) + Integer.bitCount(a._2 ^ b._2) +
        Integer.bitCount(a._3 ^ b._3) + Integer.bitCount(a._4 ^ b._4)
    assert(hamming(out(1L), out(2L)) === 0)
    val d13 = hamming(out(1L), out(3L))
    assert(d13 <= 3, s"small perturbation moved $d13 bits")
    assert(hamming(out(1L), out(4L)) > 3, "unrelated rasters must not pair")
    // pigeonhole: any pair at hamming <= 3 shares at least one band
    for (Seq(x, y) <- Seq(1L, 2L, 3L, 4L).combinations(2)) {
      if (hamming(out(x), out(y)) <= 3) {
        val bx = out(x).productIterator.toSeq
        val by = out(y).productIterator.toSeq
        assert(bx.zip(by).exists { case (p, q) => p == q },
          s"pigeonhole violated for ($x,$y)")
      }
    }
  }

  test("WAV fingerprint: encode/decode roundtrip, local replica, quarantine") {
    // roundtrip: encoded samples come back bit-exact through the RIFF walk
    val bytes = (0 until 100).map(i => ((i * 37 + 11) % 256).toByte).toArray
    val wav = Multimodal.wavEncode(bytes)
    val samples = Multimodal.decodeWavSamples(wav).get
    assert(samples.length === 100)
    assert(samples.toSeq === bytes.toSeq.map(b => (((b & 0xff) - 128) << 8).toShort))
    // fingerprint parity with a local replica of the pinned arithmetic
    def local(s: Array[Short]): (Int, Int, Int, Int) = {
      val n = s.length
      val e = (0 until 32).map { f =>
        val r = (f * n / 32) until ((f + 1) * n / 32)
        r.map(i => math.abs(s(i).toLong)).sum.toDouble / r.size
      }
      val b = new Array[Int](4)
      for (f <- 0 until 32)
        if (e(f) > e((f + 1) % 32)) b(f / 8) |= 1 << (f % 8)
      (b(0), b(1), b(2), b(3))
    }
    assert(Multimodal.wavFingerprintBands(samples) === Some(local(samples)))
    // identical content -> identical fingerprint (hamming 0)
    val wav2 = Multimodal.wavEncode(bytes.clone())
    assert(Multimodal.decodeWavSamples(wav2).flatMap(Multimodal.wavFingerprintBands)
      === Multimodal.wavFingerprintBands(samples))
    // quarantine: short streams, stereo/8-bit refused, corrupt header
    assert(Multimodal.wavFingerprintBands(new Array[Short](31)).isEmpty)
    assert(Multimodal.decodeWavSamples("RIFFxxxxWAVX".getBytes("US-ASCII")).isEmpty)
    val corrupt = wav.clone(); corrupt(0) = 'X'.toByte
    assert(Multimodal.decodeWavSamples(corrupt).isEmpty)
  }

  test("JPEG: imageio roundtrip dims exact, MAE bounded, dHash stable, quarantine") {
    val rnd = new scala.util.Random(262)
    // text-like raster: printable ASCII, the q262 payload shape
    val h = 40
    val raster = Array.fill(8 * h)((32 + rnd.nextInt(95)).toByte)
    val jpeg = Multimodal.jpegEncode(raster, 8, h)
    // magic: baseline JFIF SOI
    assert((jpeg(0) & 0xff) === 0xff && (jpeg(1) & 0xff) === 0xd8)
    val Some((w, hh, ch, px)) = Multimodal.decodeJpegRaster(jpeg)
    assert((w, hh, ch) === ((8, h, 1)))
    // lossy but bounded: the q262 contract (MAE <= 8/255)
    val mae = raster.indices.map(i =>
      math.abs((px(i) & 0xff) - (raster(i) & 0xff))).sum.toDouble / raster.length
    assert(mae <= 8.0, s"JPEG q=0.95 MAE $mae above the declared bound")
    // determinism: same raster -> byte-identical payload
    assert(java.util.Arrays.equals(jpeg, Multimodal.jpegEncode(raster, 8, h)))
    // probe dispatch: jpeg recognized with exact dims, mean close to raw
    val p = Multimodal.probe(jpeg).get
    assert(p.format === "jpeg" && p.width === Some(8) && p.height === Some(h))
    val rawMean = raster.map(_ & 0xff).sum.toDouble / raster.length
    assert(math.abs(p.meanByte.get - rawMean) <= 4.0)
    // dHash stability under the codec: a smooth gradient raster (the
    // perceptual-hash regime; pure noise is out of dHash's contract)
    // keeps its bands across the lossy roundtrip
    val smooth = Array.tabulate(8 * h)(i => ((i / 8) * 255 / h).toByte)
    val sJpeg = Multimodal.jpegEncode(smooth, 8, h)
    val Some((_, _, _, sPx)) = Multimodal.decodeJpegRaster(sJpeg)
    val orig = Multimodal.pngDHashBands(smooth, 8, h, 1).get
    val redec = Multimodal.pngDHashBands(sPx, 8, h, 1).get
    def ham(a: (Int, Int, Int, Int), b: (Int, Int, Int, Int)): Int =
      Integer.bitCount(a._1 ^ b._1) + Integer.bitCount(a._2 ^ b._2) +
        Integer.bitCount(a._3 ^ b._3) + Integer.bitCount(a._4 ^ b._4)
    assert(ham(orig, redec) <= 2,
      s"dHash drifted ${ham(orig, redec)} bits across JPEG roundtrip")
    // quarantine: truncation, corrupt entropy stream, wrong magic, null
    assert(Multimodal.decodeJpegRaster(
      java.util.Arrays.copyOf(jpeg, 12)).isEmpty)
    val bad = jpeg.clone(); bad(0) = 0x00
    assert(Multimodal.decodeJpegRaster(bad).isEmpty)
    assert(Multimodal.decodeJpegRaster(null).isEmpty)
    assert(Multimodal.decodeJpegRaster("not a jpeg at all".getBytes).isEmpty)
    val chopped = java.util.Arrays.copyOf(jpeg, jpeg.length / 2)
    // a half JPEG may decode partially or not at all, but must never throw
    Multimodal.decodeJpegRaster(chopped)
  }

  test("q262: width/height match the text-derived oracle shape on the fixture") {
    val out = Multimodal.q262JpegStats(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Int]("width") == 8))
    assert(out.forall(r => r.getAs[Int]("height") >= 1 &&
      r.getAs[Int]("height") <= 64))
    assert(out.forall(_.getAs[Boolean]("mae_ok")),
      "a fixture document decoded outside the MAE bound")
  }
}
