package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Fellegi–Sunter linkage scoring against hand-computed weights. */
class LinkageSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.local("linkage-spec", cores = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("felligiSunterScores: hand-computed weights, classes, blocking") {
    val sp = spark; import sp.implicits._
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    // block "smith": r1/r2 near-identical (name agrees at θ, both fields
    // agree); r1/r3 share the block but disagree everywhere measurable;
    // r4 sits in another block → no cross-block pairs at all
    val recs = Seq(
      (1L, "smith john", "acme", "gold"),
      (2L, "smith johnn", "acme", "gold"),
      (3L, "smith zzzzzzzz", "bolt", "lead"),
      (4L, "jones mary", "acme", "gold")).toDF("id", "name", "brand", "tier")
    val out = Linkage.felligiSunterScores(recs, "id", "name",
      substring_index(col("name"), " ", 1),
      nameTheta = 0.9, nameM = 0.9, nameU = 0.05,
      fields = Seq(("brand", 0.95, 0.2), ("tier", 0.9, 0.25)),
      upperT = 6.0, lowerT = 2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(3), r.getString(4))).toMap
    assert(out.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)),
      "exactly the within-block pairs")
    val full = lg2(0.9 / 0.05) + lg2(0.95 / 0.2) + lg2(0.9 / 0.25)
    assert(math.abs(out((1L, 2L))._1 - full) < 1e-12)
    assert(out((1L, 2L))._2 === "match")
    val none = lg2(0.1 / 0.95) + lg2(0.05 / 0.8) + lg2(0.1 / 0.75)
    assert(math.abs(out((1L, 3L))._1 - none) < 1e-12)
    assert(out((1L, 3L))._2 === "non_match")
    assert(math.abs(out((2L, 3L))._1 - none) < 1e-12)
  }

  test("mutualBestMatch: only symmetric argmaxes survive; ties break to min partner") {
    val sp = spark; import sp.implicits._
    // chain 1-2-3-4 with weights 5,7,6: best(2)=3 and best(3)=2 agree;
    // 1 wants 2 (unreciprocated), 4 wants 3 (unreciprocated)
    val chain = Seq((1L, 2L, 5.0), (2L, 3L, 7.0), (3L, 4L, 6.0))
      .toDF("a_id", "b_id", "match_weight")
    val out = Linkage.mutualBestMatch(chain, "a_id", "b_id", "match_weight")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((2L, 3L, 7.0)))
    // exact tie: 1's candidates 2 and 3 at equal weight -> min partner
    // (2) wins, and since 1 is 2's only candidate the pair is mutual
    val tie = Seq((1L, 2L, 5.0), (1L, 3L, 5.0))
      .toDF("a_id", "b_id", "match_weight")
    val out2 = Linkage.mutualBestMatch(tie, "a_id", "b_id", "match_weight")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out2.toSeq === Seq((1L, 2L)))
  }

  test("mutualBestMatch: packed argmax handles negative and fractional weights exactly") {
    val sp = spark; import sp.implicits._
    // all-negative weights exercise the 2^29 packing offset; the
    // surviving weight must round-trip the pack bit-exactly at 6 dp
    val neg = Seq((1L, 2L, -3.25), (2L, 3L, -1.000001), (3L, 4L, -2.5))
      .toDF("a_id", "b_id", "match_weight")
    val out = Linkage.mutualBestMatch(neg, "a_id", "b_id", "match_weight")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((2L, 3L, -1.000001)))
    // weight 0 boundary and id 0
    val zero = Seq((0L, 1L, 0.0), (1L, 2L, -0.000001))
      .toDF("a_id", "b_id", "match_weight")
    val outz = Linkage.mutualBestMatch(zero, "a_id", "b_id", "match_weight")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(outz.toSeq === Seq((0L, 1L, 0.0)))
  }

  test("fsParameterEm: planted dup/non-dup mixture separates m from u") {
    val sp = spark; import sp.implicits._
    // one block: 6 clean duplicates of "alpha beta gamma" with matching
    // attrs, plus 8 unrelated records with scattered attrs — EM must
    // learn m (agreement among matches) >> u (agreement among
    // non-matches) for every field without any labels
    val dups = (1L to 6L).map(i =>
      (i, "alpha beta gamma", "B1", "T1"))
    val rest = (10L to 17L).map(i =>
      (i, s"alpha zz$i-unrelated-${i * 7}", s"B${i % 5}", s"T${i % 7}"))
    val recs = (dups ++ rest).toDF("id", "name", "brand", "typ")
    val out = Linkage.fsParameterEm(recs, "id", "name",
        org.apache.spark.sql.functions.lit("one-block"),
        nameTheta = 0.95, fields = Seq("brand", "typ"), iterations = 10)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    out.foreach { case (f, (m, u)) =>
      assert(m > 0.8 && m > u + 0.3, s"field $f: m=$m u=$u not separated")
    }
    val p = Linkage.fsParameterEm(recs, "id", "name",
        org.apache.spark.sql.functions.lit("one-block"),
        nameTheta = 0.95, fields = Seq("brand", "typ"), iterations = 10)
      .collect().head.getDouble(3)
    // 15 true-match pairs of 91 total ≈ 0.16 — EM's p must land nearby
    assert(p > 0.08 && p < 0.3, s"match proportion off: $p")
  }
}
