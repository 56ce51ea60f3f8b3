package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Behavioral checks for unigram-LM scoring and int8 quantization (the
  * oracles prove cross-engine equality; these prove the SEMANTICS on
  * planted data).
  */
class ScoringSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.local("scoring-spec", cores = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("unigram scoring ranks rare-token docs below common-token docs") {
    val sp = spark; import sp.implicits._
    // "the" dominates the corpus; "zyzzyva" appears once
    val model = (
      (1 to 50).map(i => (i.toLong, "the cat sat on the mat")) :+
        (99L, "zyzzyva perplexing hapax legomena")
      ).toDF("doc_id", "text")
    val scored = TextAnalysis.unigramLogProb(model,
      Seq((1L, "the the the"), (2L, "zyzzyva perplexing")).toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("avg_logprob")).toMap
    assert(scored(1L) > scored(2L),
      s"common tokens must score higher: ${scored(1L)} vs ${scored(2L)}")
    assert(scored.values.forall(_ < 0.0), "log-probs are negative")
  }

  test("unigram scoring: model and scored corpus can differ") {
    val sp = spark; import sp.implicits._
    val model = Seq((1L, "alpha beta gamma alpha")).toDF("doc_id", "text")
    val docs = Seq((10L, "alpha alpha"), (11L, "beta gamma")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(model, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("avg_logprob")).toMap
    // P(alpha)=2/4, P(beta)=P(gamma)=1/4
    assert(math.abs(out(10L) - math.log(0.5)) < 1e-9)
    assert(math.abs(out(11L) - math.log(0.25)) < 1e-9)
  }

  test("bigram scoring: word ORDER matters, smoothing keeps unseen transitions finite") {
    val sp = spark; import sp.implicits._
    // corpus dominated by the transition "the cat"; its reversal never occurs
    val docs = (
      (1 to 30).map(i => (i.toLong, "the cat sat")) ++ Seq(
        (100L, "the cat sat"),   // all high-frequency transitions
        (101L, "cat the sat"))   // same unigrams, unseen transitions
      ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byId = out.map(t => t._1 -> t._3).toMap
    assert(byId(100L) > byId(101L),
      "a doc of common transitions must outscore its shuffled twin " +
        s"(${byId(100L)} vs ${byId(101L)}) — unigram scoring cannot see this")
    assert(out.forall(_._3 < 0.0), "log-probs are negative")
    assert(out.forall(t => !t._3.isNegInfinity),
      "add-1 smoothing: unseen transitions score finite")
    // exact values on the planted data (self-scored, so doc 101's own
    // transitions are in the counts): c(the,cat)=c(cat,sat)=31,
    // c(cat,the)=c(the,sat)=1, c(the)=c(cat)=32, V=|{the,cat}|=2
    assert(math.abs(byId(100L) - math.log(32.0 / 34.0)) < 1e-12)
    assert(math.abs(byId(101L) - math.log(2.0 / 34.0)) < 1e-12)
    assert(out.forall(_._2 === 2L), "three tokens → two bigrams")
  }

  test("int8 quantization: error bounded by scale/2 per element, zero vector safe") {
    val sp = spark; import sp.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.127f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(127.0f, -127.0f, 63.5f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(vecs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r).toMap

    // rounding to the nearest level can miss by at most scale/2 per
    // element, so the RMS is also bounded by scale/2
    val r1 = out(1L)
    val scale1 = r1.getAs[Double]("scale")
    assert(math.abs(scale1 - 1.0 / 127) < 1e-12)
    assert(r1.getAs[Double]("rms_err") <= scale1 / 2 + 1e-12)

    val r2 = out(2L)
    assert(r2.getAs[Double]("scale") === 0.0)
    assert(r2.getAs[Double]("rms_err") === 0.0)
    assert(r2.getAs[Long]("q_checksum") === 0L)

    // exact representable case: scale 1.0, q = (127, -127, 64, 0)
    val r3 = out(3L)
    assert(math.abs(r3.getAs[Double]("scale") - 1.0) < 1e-12)
    assert(r3.getAs[Long]("q_checksum") ===
      127L * 1 + -127L * 2 + 64L * 3 + 0L * 4)
  }
}
