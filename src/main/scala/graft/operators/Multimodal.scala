package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video payloads ride as opaque `BINARY` columns next to a typed
  * metadata struct, and per-batch "decode" operators run as
  * `mapPartitions` over the binary column — the Scala-native analog of
  * `mapInPandas` (same batch shape: the partition iterator is consumed
  * in fixed-size batches so a real decoder could amortize codec setup
  * and vectorize).
  *
  * Decode reality: [[decodeMedia]] REALLY parses WAV (RIFF/PCM — header
  * walk + sample RMS) and BMP (DIB header + pixel statistics) payloads,
  * because uncompressed containers are pure byte arithmetic and need no
  * codec library. Compressed codecs (JPEG/H.264/...) have no library in
  * this environment, so [[extractFeatures]] stays a deterministic
  * documented stub for them. Everything around both — schema,
  * partitioning, batch shape, null passthrough — is real and is what a
  * production decoder drops into.
  */
object Multimodal {

  /** Real container probe for the formats that are parseable with plain
    * byte arithmetic. Returns null for anything unrecognized or
    * malformed (quarantine semantics — a corrupt asset must not fail the
    * batch).
    *
    *  - WAV: RIFF/WAVE chunk walk; PCM format fields from `fmt `; exact
    *    sample count from `data`; RMS amplitude over 16-bit samples
    *    (normalized to [0,1]).
    *  - BMP: `BM` magic; width/height/bpp from the BITMAPINFOHEADER;
    *    mean pixel-byte value over the raster.
    */
  final case class Probe(
      format: String,
      sampleRate: Option[Int],
      channels: Option[Int],
      bitsPerSample: Option[Int],
      durationMs: Option[Double],
      rms: Option[Double],
      width: Option[Int],
      height: Option[Int],
      bpp: Option[Int],
      meanByte: Option[Double])

  private def leInt(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def leShort(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def ascii(b: Array[Byte], o: Int, n: Int): String =
    new String(b, o, n, java.nio.charset.StandardCharsets.US_ASCII)

  def probe(bytes: Array[Byte]): Option[Probe] = {
    if (bytes == null || bytes.length < 14) return None
    try {
      if (ascii(bytes, 0, 4) == "RIFF" && bytes.length >= 12 &&
        ascii(bytes, 8, 4) == "WAVE") probeWav(bytes)
      else if (ascii(bytes, 0, 2) == "BM" && bytes.length >= 54) probeBmp(bytes)
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def probeWav(b: Array[Byte]): Option[Probe] = {
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None     // (offset, length)
    while (off + 8 <= b.length) {
      val id = ascii(b, off, 4)
      val len = leInt(b, off + 4)
      if (len < 0 || off + 8 + len > b.length) return None
      if (id == "fmt " && len >= 16) {
        val audioFormat = leShort(b, off + 8)
        if (audioFormat != 1) return None // PCM only
        fmt = Some((leShort(b, off + 10), leInt(b, off + 12), leShort(b, off + 22)))
      } else if (id == "data") data = Some((off + 8, len))
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    for ((channels, rate, bits) <- fmt; (dOff, dLen) <- data) yield {
      val bytesPerFrame = channels * (bits / 8)
      val nFrames = if (bytesPerFrame > 0) dLen / bytesPerFrame else 0
      val rms =
        if (bits == 16 && nFrames > 0) {
          var acc = 0.0
          var i = dOff
          val end = dOff + dLen - 1
          while (i < end) {
            val s = leShort(b, i).toShort / 32768.0
            acc += s * s
            i += 2
          }
          Some(math.sqrt(acc / ((dLen / 2).toDouble)))
        } else None
      Probe("wav", Some(rate), Some(channels), Some(bits),
        Some(if (rate > 0) nFrames * 1000.0 / rate else 0.0), rms,
        None, None, None, None)
    }
  }

  private def probeBmp(b: Array[Byte]): Option[Probe] = {
    val pixelOff = leInt(b, 10)
    val dibSize = leInt(b, 14)
    if (dibSize < 40) return None
    val width = leInt(b, 18)
    val height = leInt(b, 22)
    val bpp = leShort(b, 28)
    if (width <= 0 || height == 0 || pixelOff < 54 || pixelOff > b.length)
      return None
    val raster = b.length - pixelOff
    val mean =
      if (raster > 0) {
        var acc = 0.0
        var i = pixelOff
        while (i < b.length) { acc += (b(i) & 0xff); i += 1 }
        Some(acc / raster)
      } else None
    Some(Probe("bmp", None, None, None, None, None,
      Some(width), Some(math.abs(height)), Some(bpp), mean))
  }

  private val probeSchema = StructType(Seq(
    StructField("format", StringType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("duration_ms", DoubleType),
    StructField("rms", DoubleType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("bpp", IntegerType),
    StructField("mean_byte", DoubleType)))

  /** Batched REAL decode: adds a `decoded` struct per row (null when the
    * payload is null or not a parseable uncompressed container). Same
    * mapPartitions batch shape as [[extractFeatures]].
    */
  def decodeMedia(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val outSchema = media.schema.add(
      StructField("decoded", probeSchema, nullable = true))
    val enc = RowEncoder.encoderFor(outSchema)
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val content = row.getAs[Array[Byte]]("content")
          val p = probe(content).map(pr => Row(
            pr.format, pr.sampleRate.map(Int.box).orNull,
            pr.channels.map(Int.box).orNull,
            pr.bitsPerSample.map(Int.box).orNull,
            pr.durationMs.map(Double.box).orNull,
            pr.rms.map(Double.box).orNull,
            pr.width.map(Int.box).orNull, pr.height.map(Int.box).orNull,
            pr.bpp.map(Int.box).orNull,
            pr.meanByte.map(Double.box).orNull)).orNull
          Row.fromSeq(row.toSeq :+ p)
        }
      }
    }(enc)
  }

  /** media table schema: payload + typed metadata, one row per asset. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType))), nullable = false)))

  /** Deterministic synthetic media table derived from the documents
    * fixture: text bytes stand in for encoded payloads; metadata is a
    * pure function of doc_id. Used by specs and the rows-only query.
    */
  def syntheticMedia(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        concat(lit("application/x-fake-"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType))).as("mime"),
        (pmod(col("doc_id"), lit(4)) * 160 + 320).cast(IntegerType).as("width"),
        (pmod(col("doc_id"), lit(4)) * 120 + 240).cast(IntegerType).as("height"),
        lit(16000).as("sample_rate"),
        (pmod(col("doc_id"), lit(10)) * 1000 + 2000).as("duration_ms")).as("meta"))
  }

  /** Batched feature extraction over the binary column.
    *
    * Runs as `mapPartitions`: each partition's rows are consumed in
    * `batchSize` groups; a real implementation would hand each batch to
    * a native decoder. The stub emits `dim` floats seeded from a
    * 64-bit FNV-1a hash of the payload — deterministic across runs,
    * partitionings, and cluster sizes. Null payloads pass through as
    * null features (common for quarantined assets).
    */
  def extractFeatures(
      media: DataFrame,
      dim: Int = 8,
      batchSize: Int = 64): DataFrame = {
    val outSchema = media.schema
      .add(StructField("features", ArrayType(FloatType), nullable = true))
    val enc = RowEncoder.encoderFor(outSchema)
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real decoder would run vectorized
        batch.map { row =>
          val content = row.getAs[Array[Byte]]("content")
          val feats: Seq[Float] =
            if (content == null) null
            else {
              val h = fnv1a64(content)
              val rnd = new scala.util.Random(h)
              Seq.fill(dim)(rnd.nextFloat())
            }
          Row.fromSeq(row.toSeq :+ feats)
        }
      }
    }(enc)
  }

  /** Declared q38: feature extraction over the synthetic media table,
    * projected to scalar columns so the result is hashable end-to-end.
    * Everything except `n_features` is a pure function of `doc_id`, and
    * `n_features` is the stub decoder's fixed dimension for any non-null
    * payload — so the whole row is DuckDB-reproducible and the oracle
    * verifies the mapPartitions plumbing actually ran over every asset.
    * The feature *values* (not SQL-expressible: seeded PRNG) stay pinned
    * in MultimodalSpec.
    */
  def q38MediaFeatures(spark: SparkSession, d: String): DataFrame =
    extractFeatures(syntheticMedia(spark, d))
      .select(
        col("media_id"),
        col("kind"),
        col("meta.mime").as("mime"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        col("meta.duration_ms").as("duration_ms"),
        size(col("features")).as("n_features"))

  val q38Sql: String =
    """SELECT doc_id AS media_id,
      | CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      | 'application/x-fake-' ||
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS mime,
      | CAST(doc_id % 4 * 160 + 320 AS INT) AS width,
      | CAST(doc_id % 4 * 120 + 240 AS INT) AS height,
      | doc_id % 10 * 1000 + 2000 AS duration_ms,
      | CASE WHEN text IS NULL THEN NULL ELSE CAST(8 AS INT) END AS n_features
      |FROM documents""".stripMargin

  /** STUB resize: rewrites the metadata to the target box; a real
    * implementation would also transcode `content`. Pure projection —
    * no shuffle, trivially scales.
    */
  def resizeStub(media: DataFrame, maxW: Int, maxH: Int): DataFrame =
    media.withColumn("meta",
      struct(
        col("meta.mime"),
        least(col("meta.width"), lit(maxW)).as("width"),
        least(col("meta.height"), lit(maxH)).as("height"),
        col("meta.sample_rate"),
        col("meta.duration_ms")))

  /** Frame sampling for video rows: one output row per sampled frame
    * timestamp, `everyMs` apart, within `meta.duration_ms`. Pure
    * generator (posexplode of a sequence) — the 100 TB-honest way to
    * fan one asset row out to frame rows without driver involvement.
    */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.where(col("kind") === "video")
      .select(col("media_id"), col("meta"),
        posexplode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(everyMs))))
      .select(col("media_id"),
        col("pos").as("frame_idx"),
        col("col").as("frame_ts_ms"))

  private def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}
