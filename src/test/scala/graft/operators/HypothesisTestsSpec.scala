package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** k-sample hypothesis tests pinned on hand-computed fixtures — the
  * oracles (q250–q252) prove cross-engine equality; these pin the
  * sums-of-squares algebra, midrank tie handling, and median centers.
  */
class HypothesisTestsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.local("hypothesis-tests-spec", cores = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("oneWayAnova: hand-computed three-group fixture") {
    val sp = spark; import sp.implicits._
    // a:[1,2,3] b:[2,4,6] c:[5,5,5,5] -> SSB=15.6 SSW=10 SST=25.6
    val df = (Seq(1, 2, 3).map(("a", _)) ++ Seq(2, 4, 6).map(("b", _)) ++
      Seq(5, 5, 5, 5).map(("c", _))).toDF("g", "x")
    val r = HypothesisTests.oneWayAnova(df, "g", "x").collect().head
    assert(r.getAs[Long]("k_groups") === 3L)
    assert(r.getAs[Long]("n_obs") === 10L)
    assert(r.getAs[Long]("df_between") === 2L)
    assert(r.getAs[Long]("df_within") === 7L)
    assert(math.abs(r.getAs[Double]("f_stat") - (15.6 / 2.0) / (10.0 / 7.0)) < 1e-6)
    assert(math.abs(r.getAs[Double]("eta_sq") - 15.6 / 25.6) < 1e-6)
  }

  test("oneWayAnova: identical groups score F 0") {
    val sp = spark; import sp.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("g", "x")
    val r = HypothesisTests.oneWayAnova(df, "g", "x").collect().head
    assert(r.getAs[Double]("f_stat") === 0.0)
    assert(r.getAs[Double]("eta_sq") === 0.0)
  }

  test("kruskalWallis: tied fixture matches hand-computed H and correction") {
    val sp = spark; import sp.implicits._
    // a:[1,2,3] b:[2,3,4]; midranks 1,2.5,4.5,6; R_a=8 R_b=13;
    // H = 12/42 * (64/3 + 169/3) - 21; tie = 6+6 = 12, C = 1-12/210
    val df = (Seq(1, 2, 3).map(("a", _)) ++ Seq(2, 3, 4).map(("b", _)))
      .toDF("g", "x")
    val r = HypothesisTests.kruskalWallis(df, "g", "x").collect().head
    val h = 12.0 / 42.0 * (64.0 / 3.0 + 169.0 / 3.0) - 21.0
    val c = 1.0 - 12.0 / 210.0
    assert(r.getAs[Long]("n_obs") === 6L)
    assert(math.abs(r.getAs[Double]("h_stat") - h) < 1e-6)
    assert(math.abs(r.getAs[Double]("tie_correction") - c) < 1e-6)
    assert(math.abs(r.getAs[Double]("h_adj") - h / c) < 1e-6)
  }

  test("kruskalWallis: no ties yields tie_correction 1") {
    val sp = spark; import sp.implicits._
    val df = Seq(("a", 1), ("a", 3), ("b", 2), ("b", 4)).toDF("g", "x")
    val r = HypothesisTests.kruskalWallis(df, "g", "x").collect().head
    assert(r.getAs[Double]("tie_correction") === 1.0)
  }

  test("brownForsythe: hand-computed median-centered fixture") {
    val sp = spark; import sp.implicits._
    // a:[1,2,3,100] median 2.5 -> z=[1.5,.5,.5,97.5];
    // b:[5,5,5] median 5 -> z=[0,0,0]
    // SSB = 2500 - 10000/7; SSW = 9509 - 2500
    val df = (Seq(1, 2, 3, 100).map(("a", _)) ++ Seq(5, 5, 5).map(("b", _)))
      .toDF("g", "x")
    val r = HypothesisTests.brownForsythe(df, "g", "x").collect().head
    val ssb = 2500.0 - 10000.0 / 7.0
    val ssw = 9509.0 - 2500.0
    assert(r.getAs[Long]("k_groups") === 2L)
    assert(r.getAs[Long]("n_obs") === 7L)
    assert(math.abs(r.getAs[Double]("f_stat") - (ssb / 1.0) / (ssw / 5.0)) < 1e-6)
  }

  test("fisherExact: Fisher's tea-tasting 2x2 (a=3 b=1 c=1 d=3)") {
    val sp = spark; import sp.implicits._
    // pmf over support 0..4: (1,16,36,16,1)/70; observed a=3
    val rows = Seq.fill(3)((true, true)) ++ Seq((true, false)) ++
      Seq((false, true)) ++ Seq.fill(3)((false, false))
    val df = rows.toDF("r", "c")
    val out = HypothesisTests.fisherExact(df, col("r"), col("c"))
      .collect().head
    assert(out.getAs[Long]("a") === 3L && out.getAs[Long]("d") === 3L)
    assert(math.abs(out.getAs[Double]("odds_ratio") - 9.0) < 1e-6)
    assert(math.abs(out.getAs[Double]("p_two_sided") - 34.0 / 70.0) < 1e-6)
    assert(math.abs(out.getAs[Double]("p_left") - 69.0 / 70.0) < 1e-6)
    assert(math.abs(out.getAs[Double]("p_right") - 17.0 / 70.0) < 1e-6)
  }

  test("fisherExact: independent table scores p_two_sided 1") {
    val sp = spark; import sp.implicits._
    // perfectly proportional 2x2 -> every table at least as extreme
    val rows = Seq.fill(2)((true, true)) ++ Seq.fill(2)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(2)((false, false))
    val out = HypothesisTests.fisherExact(rows.toDF("r", "c"),
      col("r"), col("c")).collect().head
    assert(out.getAs[Double]("p_two_sided") === 1.0)
  }

  test("poissonRateTest: hand-computed rates, z, and ratio CI") {
    val sp = spark; import sp.implicits._
    // cohort 1: 8 events of 40; cohort 2: 2 of 40
    val rows = Seq.fill(8)((true, true)) ++ Seq.fill(32)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(38)((false, false))
    val df = rows.toDF("g", "e")
    val out = HypothesisTests.poissonRateTest(df, col("g"), col("e"), lit(1L))
      .collect().head
    assert(out.getAs[Long]("k1") === 8L && out.getAs[Long]("t1") === 40L)
    assert(math.abs(out.getAs[Double]("rate1") - 0.2) < 1e-9)
    assert(math.abs(out.getAs[Double]("rate2") - 0.05) < 1e-9)
    val z = (0.2 - 0.05) / math.sqrt(8.0 / 1600.0 + 2.0 / 1600.0)
    assert(math.abs(out.getAs[Double]("z") - z) < 1e-6)
    val se = math.sqrt(1.0 / 8.0 + 1.0 / 2.0)
    assert(math.abs(out.getAs[Double]("rr_lo") -
      math.exp(math.log(4.0) - 1.959963984540054 * se)) < 1e-6)
    assert(math.abs(out.getAs[Double]("rr_hi") -
      math.exp(math.log(4.0) + 1.959963984540054 * se)) < 1e-6)
  }
}
