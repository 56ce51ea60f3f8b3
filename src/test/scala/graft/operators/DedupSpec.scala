package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Keep-latest compaction semantics on planted change streams — the
  * cases a naive max(ts) join gets wrong (payload from a DIFFERENT row
  * than the winning timestamp, timestamp ties).
  */
class DedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.local("dedup-spec", cores = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("latestSnapshot: latest row wins whole, ties break on the ordering tail") {
    val sp = spark; import sp.implicits._
    val e = Seq(
      // key (1, a): three versions; us=30 wins and carries ITS payload
      (1L, "a", 10L, 100L, 1.0), (1L, "a", 30L, 101L, 3.0),
      (1L, "a", 20L, 102L, 2.0),
      // key (1, b): same us — higher event_id wins
      (1L, "b", 50L, 200L, 5.0), (1L, "b", 50L, 201L, 6.0),
      // key (2, a): singleton passes through
      (2L, "a", 70L, 300L, 7.0)
    ).toDF("user_id", "event_type", "us", "event_id", "value")
    val got = Dedup.latestSnapshot(e,
      keys = Seq("user_id", "event_type"),
      ordering = Seq("us", "event_id"),
      payload = Seq("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got === Map(
      (1L, "a") -> (30L, 101L, 3.0),
      (1L, "b") -> (50L, 201L, 6.0),
      (2L, "a") -> (70L, 300L, 7.0)))
  }

  test("latestSnapshot plan: map-side partial aggregate before the only exchange") {
    val sp = spark; import sp.implicits._
    val e = Seq((1L, "a", 10L, 100L, 1.0))
      .toDF("user_id", "event_type", "us", "event_id", "value")
    val plan = Dedup.latestSnapshot(e, Seq("user_id", "event_type"),
      Seq("us", "event_id"), Seq("value"))
      .queryExecution.executedPlan.toString
    // the exchange must move partially-combined candidates (one row per
    // key per task), never raw history — and no window operator at all
    assert(plan.contains("partial_max_by"), plan)
    assert(plan.indexOf("partial_max_by") > plan.indexOf("Exchange"),
      s"partial aggregate is not below the exchange:\n$plan")
    assert(!plan.contains("Window"), s"window sort crept in:\n$plan")
  }

  test("thresholdCurve: monotone counts, hand-planted similarity levels") {
    val sp = spark; import sp.implicits._
    // docs 1/2 share a long run (high jaccard); 3/4 overlap mildly;
    // 5 is unrelated
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base + " extra"),
      (3L, (1 to 15).map(i => s"w$i").mkString(" ") + " " +
        (1 to 15).map(i => s"z$i").mkString(" ")),
      (4L, (1 to 15).map(i => s"w$i").mkString(" ") + " " +
        (1 to 15).map(i => s"y$i").mkString(" ")),
      (5L, (1 to 30).map(i => s"q$i").mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.thresholdCurve(docs, "doc_id", "text",
      Seq(0.3, 0.6, 0.9)).collect()
      .map(r => r.getAs[Double]("threshold") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs_touched"))).toMap
    // counts can only shrink as the threshold rises
    assert(out(0.3)._1 >= out(0.6)._1 && out(0.6)._1 >= out(0.9)._1)
    // the near-identical pair survives a high bar; the mild overlap
    // does not
    assert(out(0.9)._1 === 1L && out(0.9)._2 === 2L)
    assert(out(0.3)._1 >= 2L)
  }

  test("passageDedup: shared block excised everywhere, tails and singles immune") {
    val sp = spark; import sp.implicits._
    def toks(prefix: String, n: Int): String =
      (1 to n).map(i => s"$prefix$i").mkString(" ")
    val shared = toks("x", 16) // a full 16-token block, planted in A and B
    val docs = Seq(
      (1L, shared + " " + toks("a", 16)), // A: boilerplate + own block
      (2L, shared + " " + toks("b", 16)), // B: boilerplate + own block
      (3L, toks("c", 40)), // C: unique, must round-trip bit-for-bit
      (4L, toks("y", 16) + " " + toks("y", 16)), // D: self-repeat, df=1 → kept
      (5L, toks("z", 5)), // E: short tail only, never removable
      (6L, toks("z", 5)) // F: same short tail in another doc — still kept
    ).toDF("doc_id", "text")
    val out = Dedup.passageDedup(docs, "doc_id", "text",
      blockTokens = 16, minDf = 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_blocks"), r.getAs[Long]("n_removed"),
          r.getAs[String]("cleaned_text"))).toMap
    assert(out(1L) === ((2L, 1L, toks("a", 16))))
    assert(out(2L) === ((2L, 1L, toks("b", 16))))
    assert(out(3L) === ((3L, 0L, toks("c", 40))), "unique doc must round-trip")
    assert(out(4L)._2 === 0L, "within-doc repeat is not boilerplate")
    assert(out(5L) === ((1L, 0L, toks("z", 5))),
      "short tails never count toward df nor get removed")
    assert(out(6L)._2 === 0L)
  }

  test("passageDedup: every occurrence of a boilerplate block goes, even repeats") {
    val sp = spark; import sp.implicits._
    val b = (1 to 16).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, b + " " + b), // carrier with the block TWICE
      (2L, b)
    ).toDF("doc_id", "text")
    val out = Dedup.passageDedup(docs, "doc_id", "text", 16, 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_removed"), r.getAs[String]("cleaned_text"))).toMap
    assert(out(1L) === ((2L, "")))
    assert(out(2L) === ((1L, "")))
  }

  test("duplicatedSpans: shared span surfaces with doc reach + occurrences; solo spans pruned") {
    val sp = spark; import sp.implicits._
    val span = "w1 w2 w3 w4"
    val docs = Seq(
      (1L, s"a $span b"), // one occurrence
      (2L, s"$span c $span"), // two occurrences, same doc
      (3L, "totally different words here entirely")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(docs, "doc_id", "text", n = 4, minDocs = 2)
      .collect().map(r => r.getAs[String]("span") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_occ"),
          r.getAs[Long]("min_doc"))).toMap
    // the only span in >= 2 docs is the planted one: docs {1,2},
    // three total occurrences (doc 2 contributes two), earliest doc 1
    assert(out === Map(span -> ((2L, 3L, 1L))))
    // spanGrams emits ALL positions (no distinct): doc with a repeat
    val grams = Seq((9L, "x y x y x")).toDF("doc_id", "text")
    val all = Dedup.duplicatedSpans(grams, "doc_id", "text", n = 2, minDocs = 1)
      .collect().map(r => r.getAs[String]("span") -> r.getAs[Long]("n_occ"))
      .toMap
    assert(all === Map("x y" -> 2L, "y x" -> 2L))
  }

  test("spanNovelty: shared spans count against novelty; unique doc scores 1; short docs absent") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "w1 w2 w3 w4 x"), // spans: [w1..w4] (shared), [w2..x] (unique)
      (2L, "a w1 w2 w3 w4"), // spans: [a..w3] (unique), [w1..w4] (shared)
      (3L, "p q r s t"), // both spans unique -> novelty 1
      (4L, "too short") // no 4-token span -> absent
    ).toDF("doc_id", "text")
    val out = Dedup.spanNovelty(docs, "doc_id", "text", n = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("dup_spans"),
          r.getAs[Double]("novelty"))).toMap
    assert(out(1L) === ((2L, 1L, 0.5)))
    assert(out(2L) === ((2L, 1L, 0.5)))
    assert(out(3L) === ((2L, 0L, 1.0)))
    assert(!out.contains(4L))
  }

  test("passageOverlapDepth: deeper shared spans raise depth; hot spans capped out") {
    val sp = spark; import sp.implicits._
    // levels (2,4): docs 1/2 share a 4-token passage -> depth 4 with
    // three shared base (2-token) spans; docs 1/3 share ONLY the
    // 2-token span "d x1" -> depth 2; docs 5/6/7 share a span in
    // 3 docs > maxDf=2 -> capped away, no pairs at all
    val docs = Seq(
      (1L, "a b c d x1"), (2L, "y1 a b c d"), (3L, "d x1 z1 z2 z3"),
      (5L, "hot span p1"), (6L, "hot span p2"), (7L, "hot span p3")
    ).toDF("doc_id", "text")
    val out = Dedup.passageOverlapDepth(docs, "doc_id", "text",
      levels = Seq(2, 4), maxDf = 2)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Long]("n_shared_8"), r.getAs[Long]("depth"))).toMap
    assert(out((1L, 2L)) === ((3L, 4L))) // "a b","b c","c d" + the 4-span
    assert(out((1L, 3L)) === ((1L, 2L))) // only "d x1"
    assert(!out.keys.exists(p => p._1 >= 5L),
      s"capped hot span must produce no pairs: ${out.keys}")
    assert(out.size === 2)
  }
}
