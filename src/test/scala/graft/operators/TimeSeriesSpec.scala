package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Hand-computed series for the time-series diagnostics — the oracles
  * (q143–q145) prove cross-engine equality on the fixture; these pin
  * the arithmetic on closed-form series (known ACF, a planted level
  * shift, an exact weekly pattern) and the calendar-gap edge cases.
  */
class TimeSeriesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.local("timeseries-spec", cores = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** (dayIndex, count) pairs → an events frame with `count` rows on
    * each day (ts at noon so no boundary ambiguity).
    */
  private def eventsFor(daily: Seq[(Long, Int)]): DataFrame = {
    val sp = spark; import sp.implicits._
    daily.toDF("day", "cnt")
      .select(explode(sequence(lit(1), col("cnt"))).as("i"), col("day"))
      .select(timestamp_micros(col("day") * 86400000000L + 43200000000L)
        .as("ts"))
  }

  test("dailyAcf: closed-form series 1..5 gives acf(1)=0.4, acf(2)=-0.1") {
    val e = eventsFor((0L to 4L).map(d => d -> (d.toInt + 1)))
    val acf = TimeSeries.dailyAcf(e, maxLag = 3).collect()
      .map(r => r.getAs[Int]("lag") ->
        (r.getAs[Long]("m_pairs"), r.getAs[Double]("acf"))).toMap
    // mean 3, denom Σ(x-3)²=10; lag1 Σ=4, lag2 Σ=-1, lag3 Σ=-4
    assert(acf(1)._1 === 4L)
    assert(math.abs(acf(1)._2 - 0.4) < 1e-12)
    assert(acf(2)._1 === 3L)
    assert(math.abs(acf(2)._2 - (-0.1)) < 1e-12)
    assert(math.abs(acf(3)._2 - (-0.4)) < 1e-12)
  }

  test("dailyAcf: a calendar gap drops pairs instead of shifting them") {
    // days 0,1,2,4 — lag-1 pairs are (1,0),(2,1),(4,3→absent): m=2;
    // day 4 pairs with day 3 which never existed, never with day 2
    val e = eventsFor(Seq(0L -> 1, 1L -> 2, 2L -> 3, 4L -> 4))
    val m = TimeSeries.dailyAcf(e, maxLag = 2).collect()
      .map(r => r.getAs[Int]("lag") -> r.getAs[Long]("m_pairs")).toMap
    assert(m(1) === 2L) // (1,0),(2,1)
    assert(m(2) === 2L) // (2,0),(4,2)
  }

  test("cusumChangepoint: planted level shift peaks at the break day") {
    // 5,5,5 then 9,9,9: μ=7, S=[-2,-4,-6,-4,-2,0] — argmax |S| on day 2
    val e = eventsFor(Seq(0L -> 5, 1L -> 5, 2L -> 5, 3L -> 9, 4L -> 9, 5L -> 9))
    val rows = TimeSeries.cusumChangepoint(e).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Double]("cusum_dev"), r.getAs[Boolean]("is_changepoint")))
      .toMap
    assert(rows(0L)._1 === -2.0 && !rows(0L)._2)
    assert(rows(2L)._1 === -6.0 && rows(2L)._2)
    assert(rows(5L)._1 === 0.0 && !rows(5L)._2)
    assert(rows.values.count(_._2) === 1)
  }

  test("seasonalDecompose: exact weekly pattern decomposes to zero residual") {
    // x_t = 10 + (day mod 7): every centered week sums to 70+21 → trend
    // 13 exactly; seasonal(dow) = dow - 3; residual 0 everywhere a
    // trend exists; 3-day edges have null trend
    val e = eventsFor((0L to 13L).map(d => d -> (10 + (d % 7)).toInt))
    val rows = TimeSeries.seasonalDecompose(e).collect()
    assert(rows.length === 14)
    rows.foreach { r =>
      val day = r.getAs[Long]("day")
      if (day < 3 || day > 10) {
        assert(r.isNullAt(r.fieldIndex("trend")), s"day $day should be edge")
      } else {
        assert(r.getAs[Double]("trend") === 13.0)
        assert(math.abs(r.getAs[Double]("seasonal") -
          (r.getAs[Long]("dow") - 3.0)) < 1e-9)
        assert(math.abs(r.getAs[Double]("residual")) < 1e-9)
      }
    }
  }

  test("seasonalDecompose: a gap invalidates the centered week (range frame)") {
    // days 0..9 with day 4 missing: days 1..7 would each see a 7-day
    // centered window, but any window covering day 4 has only 6 rows →
    // null trend; with 0..3,5..9 the only full windows are none
    val e = eventsFor((0L to 9L).filter(_ != 4L).map(d => d -> 10))
    val rows = TimeSeries.seasonalDecompose(e).collect()
    assert(rows.forall(_.isNullAt(rows.head.fieldIndex("trend"))))
  }

  test("theilSenTrend: exact slope on a linear series, immune to an outlier day") {
    // days 0..9 with n = 100 + 3·day → every pairwise slope is 3
    val lin = eventsFor((0L to 9L).map(d => d -> (100 + 3 * d).toInt))
    val r = TimeSeries.theilSenTrend(lin).collect().head
    assert(r.getAs[Long]("n_days") === 10L)
    assert(r.getAs[Long]("n_pairs") === 45L)
    assert(math.abs(r.getAs[Double]("slope") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - 100.0) < 1e-9)
    // one 10x spam day: median of pairwise slopes stays 3 where OLS
    // would be dragged far off
    val spam = eventsFor((0L to 9L).map(d =>
      d -> (if (d == 5L) 1030 else (100 + 3 * d).toInt)))
    val r2 = TimeSeries.theilSenTrend(spam).collect().head
    assert(math.abs(r2.getAs[Double]("slope") - 3.0) < 1e-9)
  }

  test("weeklyEtaSquared: pure weekly pattern 1, flat series ~0") {
    val sp = spark; import sp.implicits._
    // 28 days, counts = exact function of dow → eta² = 1
    val weekly = eventsFor((0L to 27L).map(d => d -> (10 + (d % 7).toInt * 3)))
      .withColumn("event_type", lit("t"))
    val r1 = TimeSeries.weeklyEtaSquared(weekly).collect().head
    assert(r1.getAs[Long]("n_days") === 28L)
    assert(math.abs(r1.getAs[Double]("eta_sq") - 1.0) < 1e-12)
    // variation independent of dow: 14 days alternating 10/20 with
    // period 2 — day d and d+7 have opposite parity, so every dow
    // group is exactly {10, 20} → group means equal → eta² = 0
    val flat = eventsFor((0L to 13L).map(d => d -> (if (d % 2 == 0) 10 else 20)))
      .withColumn("event_type", lit("t"))
    val r2 = TimeSeries.weeklyEtaSquared(flat).collect().head
    assert(math.abs(r2.getAs[Double]("eta_sq")) < 1e-12)
  }

  test("ewmaDaily: closed form matches the direct recurrence, gaps carry level") {
    // counts 4, 10, 2, 8 on days 0,1,2,5 (gap at 3-4): EWMA is over the
    // OBSERVED series — s1=4, s2=.3*10+.7*4, s3=.3*2+.7*s2, s4=.3*8+.7*s3
    val counts = Seq(0L -> 4, 1L -> 10, 2L -> 2, 5L -> 8)
    val e = eventsFor(counts)
    val got = TimeSeries.ewmaDaily(e, alpha = 0.3).collect()
      .map(r => r.getAs[Long]("day") -> r.getAs[Double]("ewma")).toMap
    var s = 0.0
    counts.zipWithIndex.foreach { case ((day, x), i) =>
      s = if (i == 0) x.toDouble else 0.3 * x + 0.7 * s
      assert(math.abs(got(day) - s) < 1e-6, s"day $day: got ${got(day)} want $s")
    }
    assert(got.size === 4)
  }

  test("ewmaDaily: constant series is a fixed point") {
    val e = eventsFor((0L to 20L).map(_ -> 7))
    val rows = TimeSeries.ewmaDaily(e, alpha = 0.3).collect()
    rows.foreach(r => assert(math.abs(r.getAs[Double]("ewma") - 7.0) < 1e-6))
  }

  test("bestMeanShift: planted level shift located exactly; constant series ties to k=1") {
    val sp = spark; import sp.implicits._
    // series a: [10,10,10,50,50] → split after k=3; global mean 26,
    // BSS = 3·(10−26)² + 2·(50−26)² = 768 + 1152 = 1920
    // series b: constant → every BSS = 0, smallest-k tiebreak → k=1
    val daily = Seq(
      ("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 10L),
      ("a", 4L, 50L), ("a", 5L, 50L),
      ("b", 1L, 5L), ("b", 2L, 5L), ("b", 3L, 5L)
    ).toDF("et", "day", "n")
    val out = TimeSeries.bestMeanShift(daily, "et", "day", "n").collect()
      .map(r => r.getAs[String]("et") ->
        (r.getAs[Long]("split_day"), r.getAs[Long]("k"),
          r.getAs[Long]("n_days"), r.getAs[Double]("mean_left"),
          r.getAs[Double]("mean_right"), r.getAs[Double]("bss"))).toMap
    assert(out("a") === ((3L, 3L, 5L, 10.0, 50.0, 1920.0)))
    assert(out("b") === ((1L, 1L, 3L, 5.0, 5.0, 0.0)))
  }

  test("saxWords: z-norm + PAA replayed by hand; constant series is all-'b'; shape invariance") {
    val sp = spark; import sp.implicits._
    // series s: 4 days [1,2,3,4] into 2 segments; μ=2.5, σ=std([1..4]);
    // PAA = mean of z over each half → symmetric ±v
    val daily = Seq(
      ("s", 1L, 1L), ("s", 2L, 2L), ("s", 3L, 3L), ("s", 4L, 4L),
      // 10× the volume, same shape → identical word
      ("t", 1L, 10L), ("t", 2L, 20L), ("t", 3L, 30L), ("t", 4L, 40L),
      // constant → z defined 0; a breakpoint value bins UP (0 → 'c')
      ("c", 1L, 7L), ("c", 2L, 7L)
    ).toDF("et", "day", "n")
    val out = TimeSeries.saxWords(daily, "et", "day", "n", segments = 2)
      .collect().map(r => (r.getAs[String]("et"), r.getAs[Long]("segment")) ->
        (r.getAs[Double]("paa"), r.getAs[String]("symbol"))).toMap
    val sd = math.sqrt(Seq(1.0, 2, 3, 4).map(x => (x - 2.5) * (x - 2.5)).sum / 3)
    val v = (1.5 / sd + 0.5 / sd) / 2 // ≈ 0.7746 > 0.6745
    assert(math.abs(out(("s", 0L))._1 + v) < 1e-6)
    assert(out(("s", 0L))._2 === "a")
    assert(math.abs(out(("s", 1L))._1 - v) < 1e-6)
    assert(out(("s", 1L))._2 === "d")
    // shape invariance: 10× volume, same word
    assert(out(("t", 0L)) === out(("s", 0L)))
    assert(out(("t", 1L)) === out(("s", 1L)))
    assert(out(("c", 0L)) === ((0.0, "c")))
    assert(out(("c", 1L)) === ((0.0, "c")))
  }

  test("seasonalNaiveBacktest: exact weekly pattern gives MASE 0; trend favors naive-1") {
    val sp = spark; import sp.implicits._
    // series w: 21 days of an exact period-7 pattern → every seasonal
    // error is 0 while daily steps are nonzero → MASE exactly 0
    val weekly = (0 until 21).map(d =>
      ("w", d.toLong, (10 + (d % 7)).toDouble))
    // series r: pure linear ramp → |y_t − y_{t−7}| = 7, |y_t − y_{t−1}|
    // = 1 → MASE exactly 7 (weekly structure is an illusion here)
    val ramp = (0 until 21).map(d => ("r", d.toLong, d.toDouble))
    val out = TimeSeries.seasonalNaiveBacktest(
      (weekly ++ ramp).toDF("et", "day", "n"), "et", "day", "n", season = 7)
      .collect().map(r => r.getAs[String]("et") ->
        (r.getAs[Long]("n_days"), r.getAs[Double]("mae_snaive"),
          r.getAs[Double]("mae_naive1"), r.getAs[Double]("mase"))).toMap
    assert(out("w")._1 === 21L)
    assert(out("w")._2 === 0.0)
    assert(out("w")._4 === 0.0)
    assert(out("r") === ((21L, 7.0, 1.0, 7.0)))
  }
}
