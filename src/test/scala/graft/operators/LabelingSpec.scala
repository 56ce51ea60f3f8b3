package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Label/preference aggregation pinned on hand-computed fixtures —
  * the oracles (q214/q215) prove cross-engine equality; these pin the
  * arithmetic, the clamps, and every tie-break.
  */
class LabelingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.local("labeling-spec", cores = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("weightedConsensus: majority tie takes min label, accuracy clamps, log-odds score") {
    val sp = spark; import sp.implicits._
    // I1: a/b tie -> maj 'a' (min label). I2: unanimous 'a'.
    // Accuracies: w1 agrees twice -> 1.0 clamped to 0.95;
    // w2 agrees once of two -> 0.5 (log-odds weight exactly 0).
    val votes = Seq(
      (1L, "w1", "a"), (1L, "w2", "b"),
      (2L, "w1", "a"), (2L, "w2", "a")
    ).toDF("item", "worker", "label")
    val out = Labeling.weightedConsensus(votes, "item", "worker", "label")
      .collect().map(r => r.getAs[Long]("item") ->
        (r.getAs[String]("maj_label"), r.getAs[String]("ds_label"),
          r.getAs[Long]("n_voters"), r.getAs[Double]("score"))).toMap
    val ln19 = BigDecimal(math.log(0.95 / 0.05))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // I1: 'a' scores ln19 (w1), 'b' scores 0 (w2's weight is ln 1) ->
    // ds 'a'; had both scored equal the min label would win
    assert(out(1L) === (("a", "a", 2L, ln19)))
    assert(out(2L) === (("a", "a", 2L, ln19)))
  }

  test("weightedConsensus: high-accuracy worker overturns a raw majority") {
    val sp = spark; import sp.implicits._
    // Calibration items 10-13: w1 (with w4/w5) forms the majority,
    // w2/w3 vote against it every time. Contested item 99: w1 votes x,
    // w2+w3 vote y -> RAW majority y, but acc(w1)=0.8 vs acc(w2/3)=0.2
    // makes the weighted consensus flip to x.
    val cal = (10L to 13L).flatMap(i =>
      Seq((i, "w1", "m"), (i, "w4", "m"), (i, "w5", "m"),
        (i, "w2", "z"), (i, "w3", "z")))
    val votes = (cal ++ Seq((99L, "w1", "x"), (99L, "w2", "y"),
      (99L, "w3", "y"))).toDF("item", "worker", "label")
    val out = Labeling.weightedConsensus(votes, "item", "worker", "label")
      .collect().map(r => r.getAs[Long]("item") ->
        (r.getAs[String]("maj_label"), r.getAs[String]("ds_label"))).toMap
    // w1: 4/5 = 0.8 acc (miss on 99 where maj is y); w2/w3: 1/5 = 0.2
    // x-score = ln(.8/.2) = 1.386; y-score = 2*ln(.25) = -2.77 -> x
    assert(out(99L)._1 === "y", "raw majority must be y")
    assert(out(99L)._2 === "x", "weighted consensus must flip to x")
  }

  test("bradleyTerry: matches a local replay of 2 MM iterations; more wins => more strength") {
    val sp = spark; import sp.implicits._
    val duels = Seq(("A", "B"), ("A", "B"), ("B", "C"), ("A", "C"))
      .toDF("w", "l")
    val out = Labeling.bradleyTerry(duels, "w", "l", iterations = 2)
      .collect().map(r => r.getAs[String]("i") ->
        (r.getAs[Long]("wins"), r.getAs[Long]("n_comparisons"),
          r.getAs[Double]("strength"))).toMap
    // local replica of the pinned MM recurrence
    val nij = Map(("A", "B") -> 2.0, ("B", "A") -> 2.0,
      ("B", "C") -> 1.0, ("C", "B") -> 1.0,
      ("A", "C") -> 1.0, ("C", "A") -> 1.0)
    val wins = Map("A" -> 3.0, "B" -> 1.0, "C" -> 0.0)
    var s = Map("A" -> 1.0, "B" -> 1.0, "C" -> 1.0)
    for (_ <- 1 to 2) {
      val raw = s.keys.map { i =>
        val d = s.keys.filter(_ != i).flatMap(j =>
          nij.get((i, j)).map(_ / (s(i) + s(j)))).sum
        i -> wins(i) / d
      }.toMap
      val t = raw.values.sum
      s = raw.map { case (k, v) => k -> v / t }
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("A")._1 === 3L && out("A")._2 === 3L)
    assert(out("B")._1 === 1L && out("B")._2 === 3L)
    assert(out("C")._1 === 0L && out("C")._2 === 2L)
    for (k <- Seq("A", "B", "C"))
      assert(math.abs(out(k)._3 - r6(s(k))) < 1e-9, s"$k: ${out(k)._3} vs ${s(k)}")
    assert(out("A")._3 > out("B")._3 && out("B")._3 > out("C")._3)
  }

  test("fleissKappa: hand-computed variable-n fixture, <2-rating items excluded") {
    val sp = spark; import sp.implicits._
    // I1 aaa (P=1), I2 aab (P=1/3), I3 ab (P=0), I4 single rating
    // (excluded everywhere). Pbar = 4/9; marginals over I1-I3 only:
    // p_a = 6/8, p_b = 2/8 -> Pe = .625; kappa = (4/9-.625)/.375
    val ratings = Seq(
      (1L, "a"), (1L, "a"), (1L, "a"),
      (2L, "a"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"),
      (4L, "b")
    ).toDF("item", "label")
    val r = Labeling.fleissKappa(ratings, "item", "label").collect().head
    assert(r.getAs[Long]("n_items") === 3L)
    assert(r.getAs[Long]("n_ratings") === 8L)
    assert(math.abs(r.getAs[Double]("p_bar") - 4.0 / 9.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("p_e") - 0.625) < 1e-6)
    assert(math.abs(r.getAs[Double]("kappa")
      - (4.0 / 9.0 - 0.625) / 0.375) < 1e-6)
  }

  test("fleissKappa: unanimous single-label corpus yields NULL kappa, not a divide-by-zero") {
    val sp = spark; import sp.implicits._
    val ratings = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a"))
      .toDF("item", "label")
    val r = Labeling.fleissKappa(ratings, "item", "label").collect().head
    assert(r.getAs[Double]("p_e") === 1.0)
    assert(r.getAs[Double]("p_bar") === 1.0)
    assert(r.isNullAt(r.fieldIndex("kappa")))
  }

  test("fleissKappa: perfect two-label agreement scores kappa 1") {
    val sp = spark; import sp.implicits._
    // two items, 3 raters each, unanimous but DIFFERENT labels ->
    // Pbar = 1, Pe = .5, kappa = 1
    val ratings = Seq(
      (1L, "a"), (1L, "a"), (1L, "a"),
      (2L, "b"), (2L, "b"), (2L, "b")
    ).toDF("item", "label")
    val r = Labeling.fleissKappa(ratings, "item", "label").collect().head
    assert(math.abs(r.getAs[Double]("kappa") - 1.0) < 1e-9)
  }

  test("krippendorffAlpha: hand-computed missing-data fixture") {
    val sp = spark; import sp.implicits._
    // I1 aaa, I2 ab, I3 bb, I4 a (single rating -> excluded).
    // n = 7 pairable; D_o = (0 + 2 + 0)/7 = 2/7;
    // n_a = 4, n_b = 3 -> D_e = (4*3 + 3*4)/(7*6) = 4/7;
    // alpha = 1 - (2/7)/(4/7) = 0.5
    val ratings = Seq(
      (1L, "a"), (1L, "a"), (1L, "a"),
      (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "b"),
      (4L, "a")
    ).toDF("item", "label")
    val r = Labeling.krippendorffAlpha(ratings, "item", "label")
      .collect().head
    assert(r.getAs[Long]("n_items") === 3L)
    assert(r.getAs[Long]("n_pairable") === 7L)
    assert(math.abs(r.getAs[Double]("d_o") - 2.0 / 7.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("d_e") - 4.0 / 7.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("alpha") - 0.5) < 1e-6)
  }

  test("krippendorffAlpha: single-category corpus yields NULL alpha") {
    val sp = spark; import sp.implicits._
    val ratings = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a"))
      .toDF("item", "label")
    val r = Labeling.krippendorffAlpha(ratings, "item", "label")
      .collect().head
    assert(r.getAs[Double]("d_e") === 0.0)
    assert(r.isNullAt(r.fieldIndex("alpha")))
  }

  test("krippendorffAlpha: perfect agreement scores alpha 1") {
    val sp = spark; import sp.implicits._
    val ratings = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"))
      .toDF("item", "label")
    val r = Labeling.krippendorffAlpha(ratings, "item", "label")
      .collect().head
    assert(r.getAs[Double]("d_o") === 0.0)
    assert(math.abs(r.getAs[Double]("alpha") - 1.0) < 1e-9)
  }
}
