package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Statistical operators checked against hand-computed values. */
class StatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.local("stats-spec", cores = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("chiSquared: textbook 2x2 table, dof, independence gives chi2=0") {
    val sp = spark; import sp.implicits._
    // classic 2x2: rows (male, female) x cols (left, right) with counts
    // 30/10 and 10/30 — row/col totals 40 each, N=80, every expected
    // cell 20, every contribution (10)^2/20 = 5, chi2 = 20, dof = 1
    val rows = Seq.fill(30)(("m", "l")) ++ Seq.fill(10)(("m", "r")) ++
      Seq.fill(10)(("f", "l")) ++ Seq.fill(30)(("f", "r"))
    val out = Relational.chiSquared(rows.toDF("g", "h"), "g", "h").collect()
    assert(out.length === 4)
    val cells = out.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(cells(("m", "l"))._1 === 30L && cells(("m", "r"))._1 === 10L)
    cells.values.foreach { case (_, exp, contrib) =>
      assert(math.abs(exp - 20.0) < 1e-12)
      assert(math.abs(contrib - 5.0) < 1e-12)
    }
    out.foreach { r =>
      assert(math.abs(r.getDouble(5) - 20.0) < 1e-12, "chi2 total")
      assert(r.getLong(6) === 1L, "dof")
    }
    // perfectly independent table → chi2 = 0
    val ind = (for { g <- Seq("a", "b"); h <- Seq("x", "y", "z"); _ <- 1 to 5 }
      yield (g, h)).toDF("g", "h")
    val out2 = Relational.chiSquared(ind, "g", "h").collect()
    assert(out2.length === 6)
    out2.foreach { r =>
      assert(math.abs(r.getDouble(5)) < 1e-12)
      assert(r.getLong(6) === 2L)
    }
  }

  test("skyline2D: frontier per group, dominated rows dropped, ties on one axis") {
    val sp = spark; import sp.implicits._
    val pts = Seq(
      // group g1: frontier is (10,3) and (8,1); (10,5) loses to (10,3)
      // on the tie-broken axis, (9,4) and (7,2) are strictly dominated
      ("g1", 10.0, 5L), ("g1", 10.0, 3L), ("g1", 9.0, 4L),
      ("g1", 8.0, 1L), ("g1", 7.0, 2L),
      // group g2: a single row is always on its frontier
      ("g2", 1.0, 9L)).toDF("g", "mx", "mn")
    val out = Relational.skyline2D(pts, "g", "mx", "mn")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(out === Set(("g1", 10.0, 3L), ("g1", 8.0, 1L), ("g2", 1.0, 9L)))
    // rows coincident on BOTH axes collapse to one representative
    val dup = Seq(("g", 5.0, 2L), ("g", 5.0, 2L)).toDF("g", "mx", "mn")
    assert(Relational.skyline2D(dup, "g", "mx", "mn").count() === 1L)
  }

  test("ksStatistic: known shifted samples, identical samples give 0") {
    val sp = spark; import sp.implicits._
    // A = {1,2,3,4}, B = {3,4,5,6}: |CDF_A - CDF_B| peaks at 0.5
    val df = (Seq(1, 2, 3, 4).map(v => (v.toDouble, "a")) ++
      Seq(3, 4, 5, 6).map(v => (v.toDouble, "b"))).toDF("v", "c")
    val r = Relational.ksStatistic(df, "v", "c", "a", "b").collect().head
    assert(math.abs(r.getDouble(0) - 0.5) < 1e-12)
    assert(r.getLong(1) === 4L && r.getLong(2) === 4L)
    // identical distributions → KS = 0, other cohorts ignored
    val same = (Seq(1, 2, 3).flatMap(v => Seq((v.toDouble, "a"), (v.toDouble, "b"))) ++
      Seq((99.0, "zz"))).toDF("v", "c")
    val r2 = Relational.ksStatistic(same, "v", "c", "a", "b").collect().head
    assert(math.abs(r2.getDouble(0)) < 1e-12)
    assert(r2.getLong(1) === 3L && r2.getLong(2) === 3L)
  }

  test("olsRegression: exact line recovered, noisy r2 < 1, degenerate x dropped") {
    val sp = spark; import sp.implicits._
    // group p: y = 3x + 2 exactly → slope 3, intercept 2, r2 = 1
    // group q: one point off the line → 0 < r2 < 1
    // group z: constant x → zero variance, excluded
    val df = (Seq((1.0, 5.0), (2.0, 8.0), (3.0, 11.0), (4.0, 14.0))
      .map { case (x, y) => ("p", x, y) } ++
      Seq(("q", 1.0, 1.0), ("q", 2.0, 2.0), ("q", 3.0, 4.0)) ++
      Seq(("z", 5.0, 1.0), ("z", 5.0, 2.0))).toDF("g", "x", "y")
    val out = Relational.olsRegression(df, "g", "x", "y").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet === Set("p", "q"), "zero-variance group excluded")
    val (np, sp_, ip, r2p) = out("p")
    assert(np === 4L)
    assert(math.abs(sp_ - 3.0) < 1e-12 && math.abs(ip - 2.0) < 1e-12)
    assert(math.abs(r2p - 1.0) < 1e-12)
    // group q by hand: slope = 1.5, intercept = 1/3 - ... compute from
    // sums: n=3 sx=6 sy=7 sxy=17 sxx=14 syy=21 →
    // slope = (51-42)/(42-36) = 1.5; intercept = (7-9)/3; r2 = 81/(6*14)
    val (nq, sq, iq, r2q) = out("q")
    assert(nq === 3L)
    assert(math.abs(sq - 1.5) < 1e-12)
    assert(math.abs(iq - (7.0 - 1.5 * 6.0) / 3.0) < 1e-12)
    assert(math.abs(r2q - 81.0 / (6.0 * 14.0)) < 1e-12)
    assert(r2q > 0 && r2q < 1)
  }

  test("mannWhitneyU: clean separation, midrank ties, U_a + U_b = n_a*n_b") {
    val sp = spark; import sp.implicits._
    // disjoint samples: every A below every B → U_a = 0, U_b = 4
    val clean = Seq((1.0, "a"), (2.0, "a"), (3.0, "b"), (4.0, "b")).toDF("v", "c")
    val r = Relational.mannWhitneyU(clean, "v", "c", "a", "b").collect().head
    assert(math.abs(r.getDouble(0)) < 1e-12 && math.abs(r.getDouble(1) - 4.0) < 1e-12)
    // ties: A={1,2,2}, B={2,3}; the three 2s share midrank 3 →
    // RA = 1+3+3 = 7, U_a = 7 − 3·4/2 = 1, U_b = 6 − 1 = 5
    // (pair count check: only the two (2,2) ties contribute 0.5 each)
    val tied = Seq((1.0, "a"), (2.0, "a"), (2.0, "a"), (2.0, "b"), (3.0, "b"))
      .toDF("v", "c")
    val t = Relational.mannWhitneyU(tied, "v", "c", "a", "b").collect().head
    assert(math.abs(t.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(t.getDouble(1) - 5.0) < 1e-12)
    assert(t.getLong(2) === 3L && t.getLong(3) === 2L)
  }

  test("twoProportionZ: hand-computed pooled z, symmetric flip negates") {
    val sp = spark; import sp.implicits._
    // arm 0: 2/4 convert; arm 1: 1/4 → phat = 3/8,
    // z = 0.25 / sqrt(0.375·0.625·0.5)
    val users = Seq((0L, 1L), (0L, 1L), (0L, 0L), (0L, 0L),
      (1L, 1L), (1L, 0L), (1L, 0L), (1L, 0L)).toDF("variant", "conv")
    val r = Relational.twoProportionZ(users, "variant", "conv").collect().head
    assert(math.abs(r.getDouble(0) - 0.5) < 1e-12)
    assert(math.abs(r.getDouble(1) - 0.25) < 1e-12)
    assert(r.getLong(2) === 4L && r.getLong(3) === 4L)
    val want = 0.25 / math.sqrt(0.375 * 0.625 * 0.5)
    assert(math.abs(r.getDouble(4) - want) < 1e-12)
    // swapping the arms flips the sign, same magnitude
    val flipped = users.select((lit(1L) - col("variant")).as("variant"), col("conv"))
    val f = Relational.twoProportionZ(flipped, "variant", "conv").collect().head
    assert(math.abs(f.getDouble(4) + want) < 1e-12)
  }

  test("decileReport: even split on distinct values, tied rows stay in one bucket") {
    val sp = spark; import sp.implicits._
    // 1..20 once each, k=4: four buckets of 5 with exact bounds/means
    val even = (1 to 20).map(_.toDouble).toDF("v")
    val got = Relational.decileReport(even, "v", k = 4).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got === Map(
      1L -> (5L, 1.0, 5.0, 3.0), 2L -> (5L, 6.0, 10.0, 8.0),
      3L -> (5L, 11.0, 15.0, 13.0), 4L -> (5L, 16.0, 20.0, 18.0)))
    // 6 copies of one value straddling the midpoint all land together
    // (ntile would split them 4/2 across the boundary)
    val tied = (Seq(1.0) ++ Seq.fill(6)(2.0) ++ Seq(9.0)).toDF("v")
    val t = Relational.decileReport(tied, "v", k = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(t === Map(1L -> (7L, 1.0, 2.0), 2L -> (1L, 9.0, 9.0)))
  }

  test("weightedQuantiles: cumulative-weight thresholds, repeated values merge") {
    val sp = spark; import sp.implicits._
    // weights: 1@w1, 2@w2 (split across rows), 3@w1 -> W=4
    // cum: 1->1, 2->3, 3->4; q25 needs cum>=1 -> 1; q50 cum>=2 -> 2;
    // q75 cum>=3 -> 2 (the heavy value absorbs the quantile)
    val df = Seq((1.0, 1.0), (2.0, 1.0), (2.0, 1.0), (3.0, 1.0))
      .toDF("v", "w")
    val r = Relational.weightedQuantiles(df, "v", "w", Seq(0.25, 0.5, 0.75))
      .collect().head
    assert(r.getDouble(0) === 1.0) // wq25
    assert(r.getDouble(1) === 2.0) // wq50
    assert(r.getDouble(2) === 2.0) // wq75
    assert(r.getDouble(3) === 4.0) // total_w
  }

  test("orderedPrefixSums: distributed branch equals the single-window path") {
    val sp = spark; import sp.implicits._
    // every fixture-scale run takes the small-support fast path, so the
    // range-partition + broadcast-offsets branch (the 100 TB path) gets
    // pinned here: forcing smallSupportRows = 0 must reproduce the
    // default path bit-for-bit on a randomized two-measure support —
    // including negative measures, duplicates-free ordered keys, and a
    // support far wider than one range partition's share
    val rnd = new scala.util.Random(7)
    val support = rnd.shuffle((0 until 500).toList)
      .map(i => (i.toDouble, rnd.nextInt(100).toLong, rnd.nextDouble() - 0.5))
      .toDF("v", "na", "wt")
    val cums = Seq("__ca" -> col("na"), "__cw" -> col("wt"))
    def collectSorted(df: org.apache.spark.sql.DataFrame) = df
      .select(col("v"), col("__ca"), col("__ca_total"), col("__cw"), col("__cw_total"))
      .orderBy(col("v")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        math.rint(r.getDouble(3) * 1e9), math.rint(r.getDouble(4) * 1e9)))
    val small = collectSorted(Relational.orderedPrefixSums(support, "v", cums))
    val dist = collectSorted(
      Relational.orderedPrefixSums(support, "v", cums, smallSupportRows = 0L))
    assert(small.length === 500)
    assert(small.toSeq === dist.toSeq)
    // and the running sums are what a local scan computes
    val byV = support.orderBy(col("v")).collect()
      .map(r => (r.getDouble(0), r.getLong(1).toDouble))
    var run = 0.0
    val expected = byV.map { case (v, na) => run += na; (v, run) }
    expected.zip(small).foreach { case ((v, cum), (v2, ca, caTot, _, _)) =>
      assert(v === v2 && math.abs(cum - ca) < 1e-9)
      assert(math.abs(caTot - expected.last._2) < 1e-9)
    }
  }

  test("quantileNormalize: identity on matching cohorts, maps onto global values") {
    val sp = spark; import sp.implicits._
    // two cohorts with IDENTICAL distributions: each value normalizes
    // to itself (its global rank fraction lands back on its own run)
    val same = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val outSame = Relational.quantileNormalize(same, "g", "v").collect()
    outSame.foreach { r =>
      assert(r.getAs[Double]("value") === r.getAs[Double]("normalized"))
    }
    // shifted cohort: b = a + 100; quantile normalization maps both
    // onto the same global targets rank-for-rank, erasing the shift
    val shifted = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 101.0), ("b", 102.0), ("b", 103.0)).toDF("g", "v")
    val out = Relational.quantileNormalize(shifted, "g", "v").collect()
      .map(r => (r.getString(0), r.getAs[Double]("value")) ->
        r.getAs[Double]("normalized")).toMap
    // within-cohort midranks 1,2,3 → p = i/3 → global ranks
    // ceil(p·6) = 2, 4, 6 → global sorted values 2, 101, 103
    assert(out(("a", 1.0)) === 2.0 && out(("b", 101.0)) === 2.0)
    assert(out(("a", 2.0)) === 101.0 && out(("b", 102.0)) === 101.0)
    assert(out(("a", 3.0)) === 103.0 && out(("b", 103.0)) === 103.0)
    // both cohorts landed on the SAME normalized ladder
    assert(out(("a", 1.0)) === out(("b", 101.0)))
  }

  test("mutualInformation: zero under independence, equals entropy when determined") {
    val sp = spark; import sp.implicits._
    // balanced independent grid: p(x,y) = p(x)p(y) exactly → MI 0
    val indep = (for (a <- Seq("x", "y"); b <- Seq(1, 2); _ <- 1 to 3)
      yield (a, b)).toDF("a", "b")
    val r0 = Relational.mutualInformation(indep, "a", "b").collect().head
    assert(math.abs(r0.getAs[Double]("mi")) < 1e-12)
    // b = f(a) bijectively → MI = H(a) = H(b) = ln 2, nmi = 1
    val det = Seq(("x", 1), ("x", 1), ("y", 2), ("y", 2)).toDF("a", "b")
    val r1 = Relational.mutualInformation(det, "a", "b").collect().head
    assert(math.abs(r1.getAs[Double]("mi") - math.log(2)) < 1e-12)
    assert(math.abs(r1.getAs[Double]("nmi") - 1.0) < 1e-12)
  }

  test("liftCurve: perfect scorer concentrates gain, uniform scorer has lift 1") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.functions.col
    // 100 rows, scores 100..1 descending, positives = the top 10 scores
    val rows = (1 to 100).map(i => (101.0 - i, i <= 10))
    val out = Relational.liftCurve(rows.toDF("s", "y"), "s", col("y"))
      .collect().map(r => r.getAs[Int]("decile") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
          r.getAs[Double]("gain"), r.getAs[Double]("lift"))).toMap
    assert(out.keySet === (1 to 10).toSet)
    // decile 1 holds ALL positives: gain 1, lift 10
    assert(out(1)._1 === 10L && out(1)._2 === 10L)
    assert(math.abs(out(1)._3 - 1.0) < 1e-12)
    assert(math.abs(out(1)._4 - 10.0) < 1e-12)
    // later deciles add no positives; lift decays as 10/d
    assert(out(5)._2 === 0L)
    assert(math.abs(out(5)._4 - 2.0) < 1e-12)
    assert(math.abs(out(10)._4 - 1.0) < 1e-12)
  }

  test("spearmanCorrelation property: equals local midrank Pearson on random data") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(9191)
    def midranks(vs: Seq[Double]): Seq[Double] = {
      val sorted = vs.sorted
      val first = sorted.zipWithIndex.groupBy(_._1)
        .view.mapValues(g => g.map(_._2).sum.toDouble / g.size + 1).toMap
      vs.map(first)
    }
    (1 to 3).foreach { trial =>
      val xs = Seq.fill(90)(rnd.nextInt(8).toDouble)    // heavy ties
      val ys = xs.map(x => x * rnd.nextDouble() + rnd.nextInt(5))
      val rx = midranks(xs); val ry = midranks(ys)
      val n = xs.size.toDouble
      val want = (n * rx.zip(ry).map { case (a, b) => a * b }.sum -
        rx.sum * ry.sum) /
        math.sqrt((n * rx.map(a => a * a).sum - rx.sum * rx.sum) *
          (n * ry.map(a => a * a).sum - ry.sum * ry.sum))
      val got = Profiling.spearmanCorrelation(
        xs.zip(ys).toDF("x", "y"), "x", "y")
        .collect().head.getAs[Double]("spearman_rho")
      assert(math.abs(got - want) < 1e-9, s"trial $trial: $got vs $want")
    }
  }

  test("normCdf: A&S polynomial within 1.5e-7 of known quantiles") {
    val sp = spark; import sp.implicits._
    val xs = Seq(-2.0, -1.0, 0.0, 1.0, 1.959964, 2.575829)
    val got = xs.toDF("x")
      .select(Relational.normCdf(col("x")).as("p"))
      .collect().map(_.getDouble(0))
    val want = Seq(0.0227501, 0.1586553, 0.5, 0.8413447, 0.975, 0.995)
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 2e-6, s"$g vs $w")
    }
  }

  test("bhFdr: strong drift rejected, null groups survive the battery") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(31)
    // group "drift": halves separated by 10 sigma; four null groups
    // whose halves share one distribution — BH must reject only the
    // drifted one even at battery size 5
    def rows(g: String, shift: Double) =
      (1 to 200).map(i => (g, i <= 100,
        (if (i <= 100) shift else 0.0) + rnd.nextGaussian()))
    val df = (rows("drift", 10.0) ++ rows("n1", 0.0) ++ rows("n2", 0.0) ++
      rows("n3", 0.0) ++ rows("n4", 0.0)).toDF("g", "h", "v")
    val out = Relational.bhFdr(df, "g", col("h"), "v")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("p_value"), r.getAs[Boolean]("rejected"))).toMap
    assert(out("drift")._2, s"drifted group must reject: ${out("drift")}")
    assert(out("drift")._1 < 1e-6)
    Seq("n1", "n2", "n3", "n4").foreach { g =>
      assert(out(g)._1 > 0.001 || !out(g)._2, s"null group $g: ${out(g)}")
    }
  }

  test("abcClassification: hand-computed cumulative classes") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.functions.col
    // totals 50, 30, 15, 5 → cum shares .5 (A), .8 (A), .95 (B), 1 (C)
    val rows = Seq(("p1", 50.0), ("p2", 30.0), ("p3", 15.0), ("p4", 5.0))
    val out = Relational.abcClassification(rows.toDF("item", "v"),
      "item", col("v")).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("cum_share"), r.getAs[String]("abc_class"))).toMap
    assert(math.abs(out("p1")._1 - 0.5) < 1e-12 && out("p1")._2 === "A")
    assert(math.abs(out("p2")._1 - 0.8) < 1e-12 && out("p2")._2 === "A")
    assert(math.abs(out("p3")._1 - 0.95) < 1e-12 && out("p3")._2 === "B")
    assert(out("p4")._2 === "C")
  }

  test("targetEncodeLoo: excludes own label, singleton falls back to global") {
    val sp = spark; import sp.implicits._
    // cat a: y = 1, 3, 5 → LOO for the 1-row is (3+5)/2 = 4
    // cat b: single row → global LOO = (1+3+5+7 − 7)/(4−1) = 3
    val df = Seq((1L, "a", 1.0), (2L, "a", 3.0), (3L, "a", 5.0),
      (4L, "b", 7.0)).toDF("id", "cat", "y")
    val out = Relational.targetEncodeLoo(df, "cat", "y", "id")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("te_loo")).toMap
    assert(math.abs(out(1L) - 4.0) < 1e-12)
    assert(math.abs(out(2L) - 3.0) < 1e-12)
    assert(math.abs(out(3L) - 2.0) < 1e-12)
    assert(math.abs(out(4L) - 3.0) < 1e-12, "singleton uses global LOO")
  }

  test("rfmSegmentation: hand-computed quintiles and segments") {
    val sp = spark; import sp.implicits._
    // customer i (1..5): i orders of 1000 each, last order (6-i) days
    // before the anchor (customer 5 ordered last on the anchor day via
    // recency 1 → wait: last_d = anchor - (6-i); customer 5 → anchor-1;
    // add customer 0 ordering ON the anchor so recencies are 0..5.
    // Quintile boundaries over 6 values {0..5} at [.2,.4,.6,.8]:
    // pos = q*(n-1) = 1.0, 2.0, 3.0, 4.0 → exactly {1,2,3,4}.
    // recency(i) = 6-i for i 1..5, 0 for cust 0:
    //   r up-counts (#b < v): v=0→0, 1→0, 2→1, 3→2, 4→3, 5→4
    //   r_score = 5 - that: cust0(r=0)→5, c5(r=1)→5, c4(r=2)→4,
    //   c3(r=3)→3, c2(r=4)→2, c1(r=5)→1
    // frequency: cust0 has 1 order, i has i → values {1,1,2,3,4,5},
    //   boundaries q_cont: pos 1..4 of sorted {1,1,2,3,4,5} →
    //   {1, 2, 3, 4}; f_score: 1→1, 2→2, 3→3, 4→4, 5→5
    // monetary = 1000·frequency → same ranks as f.
    val day0 = java.sql.Timestamp.valueOf("2024-03-10 12:00:00")
    def daysBefore(k: Int) = new java.sql.Timestamp(
      day0.getTime - k * 86400000L)
    val orders = (
      Seq((0L, daysBefore(0), 1000.0)) ++
        (1 to 5).flatMap(i => (1 to i).map(j =>
          (i.toLong, daysBefore(6 - i + j - 1), 1000.0)))
    ).toDF("c", "dt", "amt")
    val out = Relational.rfmSegmentation(orders, "c", "dt", "amt")
      .collect().map(r => (r.getAs[String]("segment"), r.getAs[Int]("r_score"),
        r.getAs[Int]("f_score"), r.getAs[Int]("m_score"),
        r.getAs[Long]("n_customers"), r.getAs[Double]("total_monetary")))
    val bySeg = out.groupBy(_._1)
    // cust5: r=5? recency(5): last order = daysBefore(6-5+5-1)=daysBefore(5)?
    // orders for i span j=1..i at offsets (6-i+j-1): max date = j=i →
    // offset 6-i+i-1 = 5 — WRONG direction: use min offset. j=i gives
    // offset 5 for every customer. Fix below in the assertion: offsets
    // (6-i+j-1) for j=1..i run 6-i .. 5, so the LATEST order (smallest
    // offset) is 6-i — recency(i) = 6-i as designed.
    assert(out.map(_._5).sum === 6L)
    val champions = bySeg.get("champions").toSeq.flatten
    assert(champions.exists(t => t._2 === 5 && t._3 === 5 && t._4 === 5),
      s"cust5 must be a champion: $out")
    assert(bySeg.contains("hibernating"), s"cust1 (r=1,f=1) hibernates: $out")
    val hib = bySeg("hibernating")
    assert(hib.exists(t => t._2 === 1 && t._3 === 1 && t._4 === 1 &&
      t._6 === 1000.0))
  }

  test("cuped: perfect covariate kills all variance, contrast unbiased") {
    val sp = spark; import sp.implicits._
    // y = 3x + 10*arm with x symmetric across arms: cov(x, arm) = 0 so
    // θ = 3 exactly, and the adjusted y' = 10*arm + 6 is CONSTANT per
    // arm — var_cuped must be 0 while the arm contrast (10) survives
    val units = Seq(
      (0L, 1.0, 3.0), (0L, 2.0, 6.0), (0L, 3.0, 9.0),
      (1L, 1.0, 13.0), (1L, 2.0, 16.0), (1L, 3.0, 19.0)
    ).toDF("variant", "x", "y")
    val out = Relational.cuped(units, "variant", "x", "y").collect()
      .map(r => r.getAs[Long]("variant") ->
        (r.getAs[Long]("n"), r.getAs[Double]("mean_raw"),
          r.getAs[Double]("mean_cuped"), r.getAs[Double]("var_raw"),
          r.getAs[Double]("var_cuped"))).toMap
    assert(out(0L) === ((3L, 6.0, 6.0, 9.0, 0.0)))
    assert(out(1L) === ((3L, 16.0, 16.0, 9.0, 0.0)))
    // contrast identical raw vs adjusted (balanced x ⇒ no bias)
    assert(out(1L)._3 - out(0L)._3 === 10.0)
  }

  test("logisticIrls: matches a local replay of 2 IRLS steps; slope sign is right") {
    val sp = spark; import sp.implicits._
    val data = Seq((0.0, 0.0), (1.0, 0.0), (2.0, 1.0), (3.0, 1.0))
    val out = Relational.logisticIrls(
      data.toDF("x", "y"), "x", "y", iterations = 2).collect().head
    // local replica of the pinned recurrence
    var (b0, b1) = (0.0, 0.0)
    for (_ <- 1 to 2) {
      val rows = data.map { case (x, y) =>
        val eta = b0 + b1 * x
        val p = 1.0 / (1.0 + math.exp(-eta))
        val w = p * (1 - p)
        (x, w, eta + (y - p) / w)
      }
      val sw = rows.map(_._2).sum
      val swx = rows.map(r => r._2 * r._1).sum
      val swxx = rows.map(r => r._2 * r._1 * r._1).sum
      val swz = rows.map(r => r._2 * r._3).sum
      val swxz = rows.map(r => r._2 * r._1 * r._3).sum
      val det = sw * swxx - swx * swx
      val nb0 = (swxx * swz - swx * swxz) / det
      val nb1 = (sw * swxz - swx * swz) / det
      b0 = nb0; b1 = nb1
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out.getAs[Double]("b0") - r6(b0)) < 1e-9)
    assert(math.abs(out.getAs[Double]("b1") - r6(b1)) < 1e-9)
    assert(out.getAs[Long]("n") === 4L)
    assert(out.getAs[Double]("b1") > 0, "separating data needs a positive slope")
    val ll = data.map { case (x, y) =>
      y * (b0 + b1 * x) - math.log(1 + math.exp(b0 + b1 * x)) }.sum / 4
    assert(math.abs(out.getAs[Double]("mean_loglik") - r6(ll)) < 1e-6)
  }

  test("conformalCoverage: finite-sample order statistic and test coverage by hand") {
    val sp = spark; import sp.implicits._
    // calibration (even ids 0..18): s = 0.05·(k+1) for k = 0..9 →
    // sorted scores 0.05..0.50; n_cal = 10, ⌈11·0.9⌉ = 10 → q̂ = 0.50
    val cal = (0 until 10).map(k => (2L * k, 0.05 * (k + 1)))
    // test (odd ids): three under q̂, one over
    val test = Seq((1L, 0.10), (3L, 0.49), (5L, 0.50), (7L, 0.51))
    val out = Relational.conformalCoverage(
      (cal ++ test).toDF("user_id", "s"), alpha = 0.1).collect().head
    assert(out.getAs[Long]("n_cal") === 10L)
    assert(out.getAs[Long]("n_test") === 4L)
    assert(out.getAs[Double]("qhat") === 0.5)
    assert(out.getAs[Double]("coverage") === 0.75) // 0.51 escapes
  }

  test("expectedCalibrationError: hand bins; perfect calibration gives 0 gaps") {
    val sp = spark; import sp.implicits._
    // bin 1 (p 0.12/0.18): conf mean 0.15, accuracy 0.5 → gap 0.35 (n=2)
    // bin 9 (p 0.92 and p=1.0 clamped): conf 0.96, acc 1.0 → gap 0.04 (n=2)
    val scored = Seq((0.0, 0.12), (1.0, 0.18), (1.0, 0.92), (1.0, 1.0))
      .toDF("y", "p")
    val out = Relational.expectedCalibrationError(scored).collect()
      .map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n"), r.getAs[Double]("mean_conf"),
          r.getAs[Double]("accuracy"), r.getAs[Double]("abs_gap"),
          r.getAs[Double]("ece"))).toMap
    assert(out(1L)._1 === 2L && out(1L)._2 === 0.15 && out(1L)._3 === 0.5)
    assert(out(1L)._4 === 0.35)
    assert(out(9L)._1 === 2L && out(9L)._2 === 0.96 && out(9L)._4 === 0.04)
    // ece = (2·0.35 + 2·0.04) / 4 = 0.195, same constant on every row
    assert(out.values.forall(_._5 === 0.195))
  }

  test("psiBySeries: identical halves are 0; a planted shift raises psi past 0.25") {
    val sp = spark; import sp.implicits._
    // series A: ref and cur are the SAME 100-value staircase → every
    // decile bin matches → psi exactly 0
    val same = (1 to 100).flatMap(i =>
      Seq(("A", i.toDouble, true), ("A", i.toDouble, false)))
    // series B: cur shifted far right of ref → mass leaves low bins
    val shift = (1 to 100).map(i => ("B", i.toDouble, true)) ++
      (1 to 100).map(i => ("B", i + 1000.0, false))
    val out = Relational.psiBySeries(
      (same ++ shift).toDF("event_type", "v", "__ref"))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
          r.getAs[Double]("psi"))).toMap
    assert(out("A") === ((100L, 100L, 0.0)))
    assert(out("B")._3 > 0.25, s"shifted series must alarm: ${out("B")}")
  }

  test("didFromUserPeriods: parallel-trends null gives 0; planted lift recovered exactly") {
    val sp = spark; import sp.implicits._
    // both arms drift +5 pre→post; treated gets +3 extra → ATT = 3.
    // Within-cell values vary so the pooled SE is positive.
    val units = Seq(
      (0L, 10.0, 15.0), (0L, 12.0, 17.0), (0L, 14.0, 19.0),
      (1L, 20.0, 28.0), (1L, 22.0, 30.0), (1L, 24.0, 32.0)
    ).toDF("treated", "pre", "post")
    val out = Relational.didFromUserPeriods(units).collect().head
    assert(out.getAs[Double]("treated_pre") === 22.0)
    assert(out.getAs[Double]("treated_post") === 30.0)
    assert(out.getAs[Double]("control_pre") === 12.0)
    assert(out.getAs[Double]("control_post") === 17.0)
    assert(out.getAs[Double]("att") === 3.0)
    // four cells each var_samp = 4, n = 3 → se = sqrt(16/3)
    assert(math.abs(out.getAs[Double]("se") - math.sqrt(16.0 / 3)) < 1e-6)
    // pure parallel trends → ATT exactly 0
    val nul = Seq((0L, 10.0, 15.0), (0L, 20.0, 25.0),
      (1L, 30.0, 35.0), (1L, 40.0, 45.0)).toDF("treated", "pre", "post")
    assert(Relational.didFromUserPeriods(nul).collect().head
      .getAs[Double]("att") === 0.0)
  }

  test("qiniDeciles: front-loaded uplift accumulates; balanced null is flat") {
    val sp = spark; import sp.implicits._
    // 20 users, scores = 20..1 by id. Treated (odd ids) convert iff
    // score > 10 (the model ranks persuadables first); control never.
    val scored = (1L to 20L).map { id =>
      val p = (21 - id).toDouble / 20 // id 1 highest score
      val treated = id % 2
      val y = if (treated == 1 && id <= 10) 1.0 else 0.0
      (id, y, p, treated)
    }
    val out = Relational.qiniDeciles(scored.toDF("user_id", "y", "p", "treated"))
      .collect().map(r => r.getAs[Long]("decile") ->
        (r.getAs[Long]("n_t"), r.getAs[Long]("n_c"),
          r.getAs[Long]("conv_t"), r.getAs[Long]("conv_c"),
          r.getAs[Double]("uplift"), r.getAs[Double]("qini"))).toMap
    assert(out.size === 10)
    // each decile = 2 users (one per arm); first five deciles have the
    // treated converter → uplift 1, then 0
    for (d <- 1L to 5L) assert(out(d) === ((1L, 1L, 1L, 0L, 1.0, d.toDouble)))
    for (d <- 6L to 10L) assert(out(d) === ((1L, 1L, 0L, 0L, 0.0, 5.0)))
  }

  test("q232 delivery SLA: percentile ordering and item-count conservation") {
    val d = "/root/testdata/sf0.001"
    val rows = Relational.q232DeliverySla(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90, mx) = (r.getAs[Double]("p50_days"),
        r.getAs[Double]("p90_days"), r.getAs[Long]("max_days"))
      assert(p50 <= p90 && p90 <= mx,
        s"${r.getAs[java.sql.Date]("order_month")}: $p50 / $p90 / $mx")
      // NOTE: the synthetic fixture draws ship dates independently of
      // order dates, so negative lags exist — the operator reports
      // them honestly rather than clamping
    }
    val total = rows.map(_.getAs[Long]("n_items")).sum
    assert(total === graft.core.Tables.lineitem(spark, d).count(),
      "every lineitem must land in exactly one month bucket")
  }

  test("brierDecomposition: hand Murphy terms; REL-RES+UNC identity on constant-bin forecasts") {
    val sp = spark; import sp.implicits._
    // bin2: p=.25 x5 with one positive; bin8: p=.85 x5 with four:
    // brier=.1625, REL=.0025, RES=.09, UNC=.25 (identity holds since
    // p is constant within each bin)
    val scored = (Seq((1.0, 0.25)) ++ Seq.fill(4)((0.0, 0.25)) ++
      Seq.fill(4)((1.0, 0.85)) ++ Seq((0.0, 0.85))).toDF("y", "p")
    val r = Relational.brierDecomposition(scored).collect().head
    assert(r.getAs[Long]("n") === 10L)
    assert(math.abs(r.getAs[Double]("brier") - 0.1625) < 1e-9)
    assert(math.abs(r.getAs[Double]("reliability") - 0.0025) < 1e-9)
    assert(math.abs(r.getAs[Double]("resolution") - 0.09) < 1e-9)
    assert(math.abs(r.getAs[Double]("uncertainty") - 0.25) < 1e-9)
    assert(math.abs(r.getAs[Double]("brier") -
      (r.getAs[Double]("reliability") - r.getAs[Double]("resolution")
        + r.getAs[Double]("uncertainty"))) < 1e-9)
  }

  test("brierDecomposition: perfect binary forecasts score zero everywhere but uncertainty") {
    val sp = spark; import sp.implicits._
    val scored = (Seq.fill(3)((1.0, 1.0)) ++ Seq.fill(3)((0.0, 0.0)))
      .toDF("y", "p")
    val r = Relational.brierDecomposition(scored).collect().head
    assert(r.getAs[Double]("brier") === 0.0)
    assert(r.getAs[Double]("reliability") === 0.0)
    assert(math.abs(r.getAs[Double]("resolution") - 0.25) < 1e-9)
    assert(math.abs(r.getAs[Double]("uncertainty") - 0.25) < 1e-9)
  }

  test("permutationTest: observed diff exact, determinism, and null-effect p=1") {
    val sp = spark; import sp.implicits._
    val units = Seq(
      (1L, true, 10.0, 2L), (2L, false, 2.0, 2L),
      (3L, true, 6.0, 2L), (4L, false, 2.0, 2L)
    ).toDF("unit", "grp", "s", "c")
    val r1 = Relational.permutationTest(units, "unit", "grp", "s", "c",
      b = 64).collect().head
    // group means: (10+6)/4 = 4 vs (2+2)/4 = 1
    assert(r1.getAs[Double]("obs_diff") === 3.0)
    assert(r1.getAs[Long]("b") === 64L)
    val p = r1.getAs[Double]("p_value")
    assert(p >= 1.0 / 65 - 1e-9 && p <= 1.0)
    // pure-function permutations: a second run is bit-identical
    val r2 = Relational.permutationTest(units, "unit", "grp", "s", "c",
      b = 64).collect().head
    assert(r1 === r2)
    // zero observed effect (all unit values equal): every VALID
    // replicate's diff is exactly 0 >= 0 -> p = 1. 40 units so no
    // replicate one-sides (a one-sided replicate is NULL by contract)
    val nul = (1L to 40L).map(i => (i, i % 2 == 1, 4.0, 1L))
      .toDF("unit", "grp", "s", "c")
    val rn = Relational.permutationTest(nul, "unit", "grp", "s", "c",
      b = 16).collect().head
    assert(rn.getAs[Double]("obs_diff") === 0.0)
    assert(rn.getAs[Double]("p_value") === 1.0)
  }

  test("cmhTest: hand single- and two-stratum chi2, balanced null, n<=1 strata skipped") {
    val sp = spark; import sp.implicits._
    def stratum(k: String, rows: Seq[(Boolean, Boolean)]) =
      rows.map { case (e, o) => (k, e, o) }
    // exposed 10 with 5 hits, unexposed 10 with 0:
    // E=2.5, V=10*10*5*15/(400*19)=0.986842, chi2=(2.5)^2/V=6.333333
    val one = stratum("a", Seq.fill(5)((true, true)) ++
      Seq.fill(5)((true, false)) ++ Seq.fill(10)((false, false)))
    val r1 = Relational.cmhTest(one.toDF("k", "e", "o"), "k", "e", "o")
      .collect().head
    assert(r1.getAs[Long]("n_strata") === 1L)
    assert(r1.getAs[Long]("sum_a") === 5L)
    assert(math.abs(r1.getAs[Double]("sum_e") - 2.5) < 1e-6)
    assert(math.abs(r1.getAs[Double]("cmh_chi2") - 6.333333) < 1e-5)
    // duplicated stratum doubles numerator AND variance: chi2 doubles
    val r2 = Relational.cmhTest((one ++ stratum("b", one.map(t => (t._2, t._3))))
      .toDF("k", "e", "o"), "k", "e", "o").collect().head
    assert(math.abs(r2.getAs[Double]("cmh_chi2") - 2 * 6.333333) < 1e-4)
    // balanced outcome rates -> chi2 0; singleton stratum ignored
    val bal = stratum("a", Seq.fill(5)((true, true)) ++
      Seq.fill(5)((true, false)) ++ Seq.fill(5)((false, true)) ++
      Seq.fill(5)((false, false))) ++ stratum("tiny", Seq((true, true)))
    val r3 = Relational.cmhTest(bal.toDF("k", "e", "o"), "k", "e", "o")
      .collect().head
    assert(r3.getAs[Long]("n_strata") === 1L, "n=1 stratum must be skipped")
    assert(math.abs(r3.getAs[Double]("cmh_chi2")) < 1e-9)
  }
}
