package graft.operators

import org.apache.spark.sql.SparkSession
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
}
