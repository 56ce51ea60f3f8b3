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
}
