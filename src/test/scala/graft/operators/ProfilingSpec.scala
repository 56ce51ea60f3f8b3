package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Column profiling on a planted frame with nulls and mixed types. */
class ProfilingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.local("profiling-spec", cores = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("profileColumns: nulls, distincts, typed min/max, one row per column") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, Some(2.5), Some("b"), Some(Timestamp.valueOf("2024-01-02 03:04:05"))),
      (2L, None, Some("a"), None),
      (3L, Some(7.0), Some("a"), Some(Timestamp.valueOf("2024-06-01 00:00:00"))),
      (4L, Some(2.5), None, Some(Timestamp.valueOf("2024-06-01 00:00:00"))))
      .toDF("id", "x", "s", "t")
    val out = Profiling.profileColumns(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size === 4)
    val id = out("id")
    assert(id.getLong(1) === 4L && id.getLong(2) === 0L && id.getLong(3) === 4L)
    assert(id.getDouble(4) === 1.0 && id.getDouble(5) === 4.0)
    assert(id.isNullAt(6) && id.isNullAt(7))
    val x = out("x")
    assert(x.getLong(2) === 1L, "one null in x")
    assert(x.getLong(3) === 2L, "distinct ignores nulls, dedups 2.5")
    assert(x.getDouble(4) === 2.5 && x.getDouble(5) === 7.0)
    val s = out("s")
    assert(s.getLong(2) === 1L && s.getLong(3) === 2L)
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getString(6) === "a" && s.getString(7) === "b")
    val t = out("t")
    assert(t.getLong(2) === 1L)
    assert(t.getString(6) === "2024-01-02 03:04:05")
    assert(t.getString(7) === "2024-06-01 00:00:00")
  }

  test("profileColumns: approxDistinct swaps exact counts for HLL sketches") {
    val sp = spark; import sp.implicits._
    val df = (1 to 1000).map(i => i.toLong).toDF("v")
    val nd = Profiling.profileColumns(df, approxDistinct = true)
      .collect().head.getLong(3)
    // HLL at default rsd 5%: the estimate lands near 1000, not at it
    assert(nd > 900L && nd < 1100L)
  }

  test("benfordDigits: leading digit across magnitudes, non-positives excluded") {
    val sp = spark; import sp.implicits._
    val df = Seq(1.0, 19.5, 123.0, 2.5, 900.0, 0.0, -55.0).toDF("v")
    val out = Profiling.benfordDigits(df, "v").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(out.keySet === Set(1L, 2L, 9L), "zero and negatives excluded")
    val (n1, f1, b1) = out(1L)
    assert(n1 === 3L, "1.0, 19.5, 123.0 all lead with 1")
    assert(math.abs(f1 - 0.6) < 1e-12, "3 of 5 positive values")
    assert(math.abs(b1 - math.log10(2.0)) < 1e-12)
    assert(out(2L)._1 === 1L && out(9L)._1 === 1L)
  }

  test("correlationMatrix: perfect, inverse, and hand-computed partial correlation") {
    val sp = spark; import sp.implicits._
    // y = 2x (corr 1), z permutes x (hand: 0.5), w = -x (corr -1)
    val df = Seq((1.0, 2.0, 1.0, -1.0), (2.0, 4.0, 3.0, -2.0),
      (3.0, 6.0, 2.0, -3.0)).toDF("x", "y", "z", "w")
    val out = Profiling.correlationMatrix(df, Seq("x", "y", "z", "w"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out.size === 6, "C(4,2) pairs")
    assert(math.abs(out(("x", "y")) - 1.0) < 1e-12)
    assert(math.abs(out(("x", "w")) + 1.0) < 1e-12)
    assert(math.abs(out(("y", "w")) + 1.0) < 1e-12)
    assert(math.abs(out(("x", "z")) - 0.5) < 1e-12)
    assert(math.abs(out(("y", "z")) - 0.5) < 1e-12)
    assert(math.abs(out(("z", "w")) + 0.5) < 1e-12)
  }

  test("equiWidthHistogram: bin edges, max lands in last bin, sparse bins absent") {
    val sp = spark; import sp.implicits._
    val df = (0 to 10).map(_.toDouble).toDF("v")
    val out = Profiling.equiWidthHistogram(df, "v", bins = 5).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toMap
    // width 2: bins [0,2) [2,4) [4,6) [6,8) [8,10]; v=10 folds into bin 4
    assert(out.keySet === Set(0L, 1L, 2L, 3L, 4L))
    (0L to 3L).foreach(b => assert(out(b)._3 === 2L))
    assert(out(4L)._3 === 3L, "8, 9 and the max 10")
    assert(out(0L)._1 === 0.0 && out(0L)._2 === 2.0)
    assert(out(4L)._1 === 8.0 && out(4L)._2 === 10.0)
    // a gap leaves its bin absent rather than zero
    val sparse = Seq(0.0, 10.0).toDF("v")
    val s = Profiling.equiWidthHistogram(sparse, "v", bins = 5)
      .collect().map(_.getLong(0)).toSet
    assert(s === Set(0L, 4L))
  }

  test("winsorizedStats: hand-computed interpolated clamp bounds and robust mean") {
    val sp = spark; import sp.implicits._
    // group a: 0..9 plus one wild outlier 1000 (n=11)
    //   p05 at rank 1 + 10*0.05 = 1.5 -> 0.5; p95 at rank 10.5 -> 504.5
    //   winsorized sum = (1+..+9) + 0.5 + 504.5 = 550 -> mean 50
    // group b: no outliers — winsorized mean barely moves
    val df = ((0 to 9).map(v => ("a", v.toDouble)) :+ ("a", 1000.0))
      .toDF("k", "v")
    val out = Profiling.winsorizedStats(df, "k", "v", 0.05, 0.95)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val (n, raw, pLo, pHi, wins) = out("a")
    assert(n === 11L)
    assert(math.abs(raw - 95.0) < 1e-9)
    assert(math.abs(pLo - 0.5) < 1e-9)
    assert(math.abs(pHi - 504.5) < 1e-9)
    assert(math.abs(wins - 50.0) < 1e-9)
  }

  test("madOutliers: hand-computed median/MAD, only the planted spike flagged") {
    val sp = spark; import sp.implicits._
    // 1..9 plus 100: median (5+6)/2 = 5.5; |v-5.5| sorted has midpair
    // (2.5, 2.5) -> MAD 2.5; threshold 4.4478*2.5 = 11.1195 flags only 100
    val df = ((1 to 9).map(v => ("a", v.toDouble)) :+ ("a", 100.0)).toDF("k", "v")
    val r = Profiling.madOutliers(df, "k", "v").collect().head
    assert(r.getLong(1) === 10L)
    assert(math.abs(r.getDouble(2) - 5.5) < 1e-9)
    assert(math.abs(r.getDouble(3) - 2.5) < 1e-9)
    assert(r.getLong(4) === 1L)
    assert(math.abs(r.getDouble(5) - 0.1) < 1e-9)
  }

  test("bootstrapCI: deterministic replicates, interval brackets the mean") {
    val sp = spark; import sp.implicits._
    val df = (1 to 200).map(i => ("a", (i % 10).toDouble, i.toLong))
      .toDF("k", "v", "id")
    def run() = Profiling.bootstrapCI(df, "k", "v", "id", reps = 20)
      .collect().head
    val r = run()
    assert(r.getLong(1) === 20L)
    val (mean, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(lo <= mean && mean <= hi)
    assert(lo < hi, "degenerate interval")
    // true mean 4.5; the bootstrap mean must land near it
    assert(math.abs(mean - 4.5) < 0.5, s"boot_mean $mean far from 4.5")
    // md5-derived weights: bit-identical on re-run
    val r2 = run()
    assert(r2.getDouble(2) === mean && r2.getDouble(3) === lo &&
      r2.getDouble(4) === hi)
  }

  test("cohensKappa: hand-computed contingency table") {
    val sp = spark; import sp.implicits._
    // cells: ++=4, --=2, +-=1, -+=3 → po=0.6, pe=.5·.7+.5·.3=0.5, κ=0.2
    val rows = Seq.fill(4)((true, true)) ++ Seq.fill(2)((false, false)) ++
      Seq.fill(1)((true, false)) ++ Seq.fill(3)((false, true))
    val df = rows.toDF("a", "b")
    val r = Profiling.cohensKappa(df, org.apache.spark.sql.functions.col("a"),
      org.apache.spark.sql.functions.col("b")).collect().head
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Long]("n_both_pos") === 4L)
    assert(r.getAs[Long]("n_only_b") === 3L)
    assert(math.abs(r.getAs[Double]("p_agree") - 0.6) < 1e-12)
    assert(math.abs(r.getAs[Double]("kappa") - 0.2) < 1e-12)
  }

  test("cohensKappa: perfect agreement is 1, marginal-independence is ~0") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.functions.col
    val same = Seq((true, true), (false, false), (true, true)).toDF("a", "b")
    val k1 = Profiling.cohensKappa(same, col("a"), col("b"))
      .collect().head.getAs[Double]("kappa")
    assert(math.abs(k1 - 1.0) < 1e-12)
    // a ⊥ b with balanced marginals: po = pe = 0.5 → κ = 0
    val indep = Seq((true, true), (true, false), (false, true), (false, false))
      .toDF("a", "b")
    val k0 = Profiling.cohensKappa(indep, col("a"), col("b"))
      .collect().head.getAs[Double]("kappa")
    assert(math.abs(k0) < 1e-12)
  }

  test("spearmanCorrelation: monotone ±1, hand-computed midrank ties") {
    val sp = spark; import sp.implicits._
    // strictly monotone (any monotone transform) → exactly +1
    val mono = Seq((1.0, 10.0), (2.0, 100.0), (3.0, 1000.0), (4.0, 1e6))
      .toDF("x", "y")
    val rUp = Profiling.spearmanCorrelation(mono, "x", "y")
      .collect().head.getAs[Double]("spearman_rho")
    assert(math.abs(rUp - 1.0) < 1e-12)
    // strictly anti-monotone → exactly −1
    val anti = Seq((1.0, 9.0), (2.0, 4.0), (3.0, 2.0)).toDF("x", "y")
    val rDn = Profiling.spearmanCorrelation(anti, "x", "y")
      .collect().head.getAs[Double]("spearman_rho")
    assert(math.abs(rDn + 1.0) < 1e-12)
    // tied x block takes the midrank: x=(1,2,2,3) → rx=(1,2.5,2.5,4);
    // y=(1,2,3,4) → ry=(1,2,3,4); Pearson over those ranks = 0.9487…
    val tied = Seq((1.0, 1.0), (2.0, 2.0), (2.0, 3.0), (3.0, 4.0))
      .toDF("x", "y")
    val rT = Profiling.spearmanCorrelation(tied, "x", "y")
      .collect().head.getAs[Double]("spearman_rho")
    val rx = Seq(1.0, 2.5, 2.5, 4.0); val ry = Seq(1.0, 2.0, 3.0, 4.0)
    val n = 4.0
    val expected = (n * rx.zip(ry).map { case (a, b) => a * b }.sum -
      rx.sum * ry.sum) /
      math.sqrt((n * rx.map(a => a * a).sum - rx.sum * rx.sum) *
        (n * ry.map(a => a * a).sum - ry.sum * ry.sum))
    assert(math.abs(rT - expected) < 1e-12)
  }

  test("giniCoefficient: uniform is 0, total concentration is (n-1)/n") {
    val sp = spark; import sp.implicits._
    val equal = Seq.fill(5)(7.0).toDF("v")
    val g0 = Profiling.giniCoefficient(equal, "v")
      .collect().head.getAs[Double]("gini")
    assert(math.abs(g0) < 1e-12)
    // one holder of everything: G = (n−1)/n = 0.75 for n=4
    val conc = Seq(0.0, 0.0, 0.0, 100.0).toDF("v")
    val row = Profiling.giniCoefficient(conc, "v").collect().head
    assert(row.getAs[Long]("n") === 4L)
    assert(math.abs(row.getAs[Double]("gini") - 0.75) < 1e-12)
    // hand case with ties: v=(1,1,2,4): sorted Σi·x = 1+2+6+16 = 25,
    // so G = 2·25/(4·8) − 5/4 = 0.3125
    val hand = Seq(1.0, 1.0, 2.0, 4.0).toDF("v")
    val gh = Profiling.giniCoefficient(hand, "v")
      .collect().head.getAs[Double]("gini")
    assert(math.abs(gh - 0.3125) < 1e-12)
  }

  test("rocAuc: perfect separation 1, reversed 0, all-tied 0.5, hand midranks") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.functions.col
    val perfect = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))
      .toDF("s", "y")
    val a1 = Profiling.rocAuc(perfect, "s", col("y"))
      .collect().head
    assert(a1.getAs[Long]("n_pos") === 2L && a1.getAs[Long]("n_neg") === 2L)
    assert(math.abs(a1.getAs[Double]("auc") - 1.0) < 1e-12)
    val reversed = Seq((1.0, true), (2.0, true), (3.0, false), (4.0, false))
      .toDF("s", "y")
    val a0 = Profiling.rocAuc(reversed, "s", col("y"))
      .collect().head.getAs[Double]("auc")
    assert(math.abs(a0) < 1e-12)
    // one constant score: every comparison is a tie → exactly 1/2
    val tied = Seq((7.0, true), (7.0, false), (7.0, true), (7.0, false))
      .toDF("s", "y")
    val at = Profiling.rocAuc(tied, "s", col("y"))
      .collect().head.getAs[Double]("auc")
    assert(math.abs(at - 0.5) < 1e-12)
    // hand case with a cross-class tie at 2.0: positives {2,3}, negs
    // {1,2}; pairs: (2>1)=1, (2~2)=.5, (3>1)=1, (3>2)=1 → AUC 3.5/4
    val hand = Seq((1.0, false), (2.0, false), (2.0, true), (3.0, true))
      .toDF("s", "y")
    val ah = Profiling.rocAuc(hand, "s", col("y"))
      .collect().head.getAs[Double]("auc")
    assert(math.abs(ah - 0.875) < 1e-12)
  }

  test("hillTailIndex: hand-computed alpha on a small tail") {
    val sp = spark; import sp.implicits._
    // top-3 of {8,4,2,1}: x_k = 2, mean ln(x/2) = (ln4+ln2+0)/3 = ln2
    // → alpha = 1/ln2
    val df = Seq((8.0, 1L), (4.0, 2L), (2.0, 3L), (1.0, 4L))
      .toDF("v", "id")
    val r = Profiling.hillTailIndex(df, "v", "id", k = 3).collect().head
    assert(r.getAs[Long]("k") === 3L)
    assert(r.getAs[Double]("x_k") === 2.0)
    assert(math.abs(r.getAs[Double]("hill_alpha") - 1.0 / math.log(2)) < 1e-12)
    // non-positive values are excluded before the cut
    val withZero = Seq((8.0, 1L), (0.0, 2L), (-3.0, 3L), (2.0, 4L))
      .toDF("v", "id")
    val r2 = Profiling.hillTailIndex(withZero, "v", "id", k = 5)
      .collect().head
    assert(r2.getAs[Long]("k") === 2L)
  }

  test("rocAuc property: equals O(n^2) pair counting on random tied data") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(4242)
    (1 to 4).foreach { trial =>
      // coarse scores force heavy ties — the midrank path under test
      val rows = (1 to 120).map { _ =>
        (rnd.nextInt(12).toDouble, rnd.nextBoolean())
      }
      val pos = rows.filter(_._2).map(_._1)
      val neg = rows.filterNot(_._2).map(_._1)
      if (pos.nonEmpty && neg.nonEmpty) {
        val pairs = for (p <- pos; n <- neg)
          yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0
        val want = pairs.sum / (pos.size.toDouble * neg.size)
        val got = Profiling.rocAuc(rows.toDF("s", "y"), "s", col("y"))
          .collect().head.getAs[Double]("auc")
        assert(math.abs(got - want) < 1e-9, s"trial $trial: $got vs $want")
      }
    }
  }

  test("fdAudit: holding, violated, and key dependencies") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, "us", "gold"), (2L, "us", "gold"),
      (3L, "uk", "gold"), (4L, "uk", "silver")).toDF("id", "country", "tier")
    val out = Profiling.fdAudit(df, Seq(
      ("id", "tier"), ("country", "tier")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_keys"), r.getAs[Long]("n_violating_keys"),
          r.getAs[Boolean]("holds"))).toMap
    assert(out(("id", "tier")) === ((4L, 0L, true)), "id is a key")
    // country 'uk' maps to two tiers → violated
    assert(out(("country", "tier")) === ((2L, 1L, false)))
  }

  test("hillTailIndex: hand dyadic tail, tie-proof top-k, degenerate flat tail NULL") {
    val sp = spark; import sp.implicits._
    // top-3 of {8,4,2,1,1} at m=2: xmin=2, sum ln = ln4+ln2 = 3 ln2
    // -> alpha = 2/(3 ln2)
    val df = Seq(8L, 4L, 2L, 1L, 1L).toDF("v")
    val r = Profiling.hillTailIndex(df, "v", m = 2).collect().head
    assert(r.getAs[Long]("m") === 2L)
    assert(r.getAs[Double]("xmin") === 2.0)
    assert(math.abs(r.getAs[Double]("tail_index")
      - 2.0 / (3 * math.log(2.0))) < 1e-6)
    // tie at the boundary: whichever 2-copy survives, values identical
    val tied = Seq(8L, 4L, 2L, 2L, 2L).toDF("v")
    val rt = Profiling.hillTailIndex(tied, "v", m = 2).collect().head
    assert(rt.getAs[Double]("xmin") === 2.0)
    assert(math.abs(rt.getAs[Double]("tail_index")
      - 2.0 / (3 * math.log(2.0))) < 1e-6)
    // all-equal tail: sum ln = 0 -> NULL, not a division blowup
    val flat = Seq(3L, 3L, 3L, 3L).toDF("v")
    val rf = Profiling.hillTailIndex(flat, "v", m = 2).collect().head
    assert(rf.isNullAt(rf.fieldIndex("tail_index")))
  }

  test("kendallTauB: perfect concordance is 1; tied 2x2 square is 0") {
    val sp = spark; import sp.implicits._
    val mono = Seq((1, 1), (2, 2), (3, 3)).toDF("x", "y")
    val r = Profiling.kendallTauB(mono, "x", "y").collect().head
    assert(r.getAs[Long]("concordant") === 3L)
    assert(r.getAs[Long]("discordant") === 0L)
    assert(r.getAs[Double]("tau_b") === 1.0)

    // (1,1)(1,2)(2,1)(2,2): C=1 D=1, ties_x=ties_y=2, n0=6
    val sq = Seq((1, 1), (1, 2), (2, 1), (2, 2)).toDF("x", "y")
    val r2 = Profiling.kendallTauB(sq, "x", "y").collect().head
    assert(r2.getAs[Long]("n0") === 6L)
    assert(r2.getAs[Long]("ties_x") === 2L && r2.getAs[Long]("ties_y") === 2L)
    assert(r2.getAs[Long]("concordant") === 1L)
    assert(r2.getAs[Long]("discordant") === 1L)
    assert(r2.getAs[Double]("tau_b") === 0.0)
  }
}
