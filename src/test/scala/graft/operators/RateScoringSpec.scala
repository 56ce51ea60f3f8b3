package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Rate-scoring operators pinned on hand-computed fixtures — the
  * oracles (q253–q255) prove cross-engine equality; these pin the WoE
  * degenerate-bin guard, the method-of-moments prior, and the
  * quadrature's exact symmetry.
  */
class RateScoringSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.local("rate-scoring-spec", cores = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("woeIv: hand-computed bins, empty-class bin gets NULL WoE and 0 IV term") {
    val sp = spark; import sp.implicits._
    // A: 3g/1b, B: 1g/3b, C: 0g/2b (degenerate); totals g=4 b=6
    val df = (Seq.fill(3)(("A", 1)) ++ Seq(("A", 0)) ++
      Seq(("B", 1)) ++ Seq.fill(3)(("B", 0)) ++
      Seq.fill(2)(("C", 0))).toDF("bin", "y")
    val out = Scoring.woeIv(df, "bin", col("y") === 1)
      .collect().map(r => r.getAs[String]("bin") -> r).toMap
    val wA = math.log((3.0 / 4.0) / (1.0 / 6.0))
    val wB = math.log((1.0 / 4.0) / (3.0 / 6.0))
    val iv = (3.0 / 4.0 - 1.0 / 6.0) * wA + (1.0 / 4.0 - 3.0 / 6.0) * wB
    assert(math.abs(out("A").getAs[Double]("woe") - wA) < 1e-6)
    assert(math.abs(out("B").getAs[Double]("woe") - wB) < 1e-6)
    assert(out("C").isNullAt(out("C").fieldIndex("woe")))
    for (b <- Seq("A", "B", "C"))
      assert(math.abs(out(b).getAs[Double]("iv") - iv) < 1e-6)
  }

  test("ebShrinkage: small-n entity shrinks toward prior mean, large-n keeps rate") {
    val sp = spark; import sp.implicits._
    // rates .5 .1 .9 .5 -> mean .5, var .32/3, s = .25/var - 1
    val rows = Seq.fill(5)((1L, 1)) ++ Seq.fill(5)((1L, 0)) ++
      Seq((2L, 1)) ++ Seq.fill(9)((2L, 0)) ++
      Seq.fill(9)((3L, 1)) ++ Seq((3L, 0)) ++
      Seq((4L, 1), (4L, 0))
    val df = rows.toDF("u", "s")
    val out = Scoring.ebShrinkage(df, "u", col("s") === 1)
      .collect().map(r => r.getAs[Long]("entity") -> r).toMap
    val v = 0.32 / 3.0
    val s = 0.25 / v - 1.0
    val a = 0.5 * s
    assert(math.abs(out(1L).getAs[Double]("alpha") - a) < 1e-6)
    assert(math.abs(out(1L).getAs[Double]("beta") - a) < 1e-6)
    // e2 raw .1 pulled UP toward .5; e4 (n=2) pulled close to .5
    val eb2 = (1.0 + a) / (10.0 + 2 * a)
    assert(math.abs(out(2L).getAs[Double]("eb_rate")
      - BigDecimal(eb2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(out(2L).getAs[Double]("eb_rate") > 0.1)
    assert(math.abs(out(4L).getAs[Double]("eb_rate") - 0.5) < 1e-6)
  }

  test("bayesianAb: symmetric arms score exactly 0.5; dominant arm near 1") {
    val sp = spark; import sp.implicits._
    val sym = (Seq.fill(3)((0L, 1L)) ++ Seq.fill(7)((0L, 0L)) ++
      Seq.fill(3)((1L, 1L)) ++ Seq.fill(7)((1L, 0L))).toDF("variant", "conv")
    val r = Scoring.bayesianAb(sym, "variant", "conv").collect().head
    // midpoint quadrature is exactly symmetric: P = 1/2 (sum p)^2 = 0.5
    assert(r.getAs[Double]("prob_b_gt_a") === 0.5)
    assert(r.getAs[Long]("n_a") === 10L && r.getAs[Long]("k_b") === 3L)

    val dom = (Seq.fill(1)((0L, 1L)) ++ Seq.fill(9)((0L, 0L)) ++
      Seq.fill(9)((1L, 1L)) ++ Seq.fill(1)((1L, 0L))).toDF("variant", "conv")
    val r2 = Scoring.bayesianAb(dom, "variant", "conv").collect().head
    assert(r2.getAs[Double]("prob_b_gt_a") > 0.99)
    assert(math.abs(r2.getAs[Double]("post_mean_b") - 10.0 / 12.0) < 1e-6)
  }

  test("isotonicCalibrate: violator pair pools to weighted mean, ends stay") {
    val sp = spark; import sp.implicits._
    // bins 1..4, n=5 each, k = 1,3,2,4 -> rates .2,.6,.4,.8;
    // PAV pools bins 2+3 -> 5/10 = .5
    val rows = for {
      (b, k) <- Seq((1, 1), (2, 3), (3, 2), (4, 4))
      i <- 1 to 5
    } yield (b, i <= k)
    val out = Scoring.isotonicCalibrate(rows.toDF("b", "y"),
        col("b"), col("y"))
      .collect().map(r => r.getAs[Long]("bin") -> r).toMap
    assert(out(1L).getAs[Double]("rate_iso") === 0.2)
    assert(out(2L).getAs[Double]("rate_iso") === 0.5)
    assert(out(3L).getAs[Double]("rate_iso") === 0.5)
    assert(out(4L).getAs[Double]("rate_iso") === 0.8)
    assert(out(2L).getAs[Double]("rate_raw") === 0.6)
    // monotone input is a fixed point
    val mono = (for {
      (b, k) <- Seq((1, 1), (2, 2), (3, 4)); i <- 1 to 5
    } yield (b, i <= k)).toDF("b", "y")
    Scoring.isotonicCalibrate(mono, col("b"), col("y")).collect()
      .foreach(r => assert(
        r.getAs[Double]("rate_iso") === r.getAs[Double]("rate_raw")))
  }

  test("ipfRake: column margins hit target exactly after a column step, rows converge") {
    val sp = spark; import sp.implicits._
    val rows = Seq.fill(1)((1, "a")) ++ Seq.fill(3)((1, "b")) ++
      Seq.fill(3)((2, "a")) ++ Seq.fill(1)((2, "b"))
    val out = Scoring.ipfRake(rows.toDF("r", "c"), "r", "c").collect()
    val colSums = out.groupBy(_.getAs[String]("c"))
      .view.mapValues(_.map(_.getAs[Double]("w_raked")).sum)
    colSums.foreach { case (_, s) => assert(math.abs(s - 4.0) < 1e-5) }
    val rowSums = out.groupBy(_.getAs[Int]("r"))
      .view.mapValues(_.map(_.getAs[Double]("w_raked")).sum)
    rowSums.foreach { case (_, s) => assert(math.abs(s - 4.0) < 1e-3) }
    // symmetric fixture -> symmetric weights
    val m = out.map(r => (r.getAs[Int]("r"), r.getAs[String]("c")) ->
      r.getAs[Double]("w_raked")).toMap
    assert(math.abs(m((1, "a")) - m((2, "b"))) < 1e-9)
    assert(math.abs(m((1, "b")) - m((2, "a"))) < 1e-9)
  }
}
