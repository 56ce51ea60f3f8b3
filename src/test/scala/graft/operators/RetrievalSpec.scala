package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lower}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** BM25 retrieval ([[Retrieval.bm25TopK]]) on planted geometry, and
  * quota sampling ([[CorpusOps.quotaSample]]) count/determinism
  * properties.
  */
class RetrievalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.local("retrieval-spec", cores = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("BM25: a document saturated with the query's rare term ranks first") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (10L, "zebra zebra zebra common common"),
      (11L, "zebra common common common common"),
      (12L, "common common common common common"),
      (13L, "other words entirely here now")).toDF("doc_id", "text")
    val queries = Seq((1L, "zebra")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, queries, "doc_id", "text", k = 3)
      .orderBy("rank").collect()
    // only the two zebra docs match; tf 3 > tf 1 at equal length
    assert(out.map(_.getLong(2)).toSeq === Seq(10L, 11L))
    assert(out.map(_.getInt(1)).toSeq === Seq(1, 2))
    assert(out(0).getDouble(3) > out(1).getDouble(3))
  }

  test("BM25: length normalization — same tf, shorter document wins") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (20L, "needle filler"),
      (21L, "needle filler filler filler filler filler filler filler"))
      .toDF("doc_id", "text")
    val queries = Seq((1L, "needle")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, queries, "doc_id", "text", k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(20L, 21L))
  }

  test("BM25: multi-term scores are additive over matched terms only") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (30L, "alpha beta gap gap"),
      (31L, "alpha gap gap gap"),
      (32L, "gap gap gap gap")).toDF("doc_id", "text")
    val queries = Seq((1L, "alpha beta missingterm")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, queries, "doc_id", "text", k = 3)
      .orderBy("rank").collect()
    // two matched terms beat one; no-match docs are absent entirely
    assert(out.map(_.getLong(2)).toSeq === Seq(30L, 31L))
  }

  test("quota sample: exact counts, rank span, determinism, stability") {
    val sp = spark; import sp.implicits._
    val docs = (1L to 100L).map(i => (i, if (i <= 70) "big" else "small"))
      .toDF("doc_id", "stratum")
    val s1 = CorpusOps.quotaSample(docs, "doc_id", "stratum", quota = 10)
    val counts = s1.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("big" -> 10L, "small" -> 10L))
    assert(s1.agg(org.apache.spark.sql.functions.max("sample_rank"))
      .head().getInt(0) === 10)
    // quota above the stratum size keeps the whole stratum
    val s2 = CorpusOps.quotaSample(docs, "doc_id", "stratum", quota = 50)
    assert(s2.where(col("stratum") === "small").count() === 30)
    // same input, same picks (pure function of (stratum, id))
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids1b = CorpusOps.quotaSample(docs, "doc_id", "stratum", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids1b)
    // growing a stratum never invents new hash order among survivors:
    // picks from the 100-doc corpus that survive in the 150-doc corpus
    // keep their relative rank order
    val grown = (1L to 150L).map(i => (i, if (i <= 120) "big" else "small"))
      .toDF("doc_id", "stratum")
    val s3 = CorpusOps.quotaSample(grown, "doc_id", "stratum", 10)
      .select("doc_id", "sample_rank").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val common = s1.select("doc_id", "sample_rank").collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .filter { case (id, _) => s3.contains(id) }
    val reRanked = common.sortBy(_._2).map { case (id, _) => s3(id) }
    assert(reRanked.toSeq === reRanked.sorted.toSeq)
  }

  test("RRF fusion: both-list docs beat single-list docs; scores are exact rank sums") {
    val out = Retrieval.q100HybridRrf(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    val byQuery = out.groupBy(_._1)
    byQuery.foreach { case (q, rows) =>
      // ranks are 1..n dense within each query, descending by score
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to rows.length).toSeq, s"query $q ranks")
      assert(sorted.map(-_._4).toSeq === sorted.map(-_._4).toSeq.sorted, s"query $q order")
      // every rrf score must be one of the representable rank sums:
      // 1/(60+i), or 1/(60+i) + 1/(60+j), for i,j in 1..10 (rounded 1e-6)
      val single = (1 to 10).map(i => BigDecimal(1.0 / (60 + i))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toSet
      val both = (for { i <- 1 to 10; j <- 1 to 10 } yield
        BigDecimal(1.0 / (60 + i) + 1.0 / (60 + j))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toSet
      rows.foreach { case (_, _, doc, s) =>
        assert(single.contains(s) || both.contains(s), s"query $q doc $doc score $s")
      }
      // any doc appearing in both legs must outrank every single-leg doc:
      // min both-list score 2/70 > max single-list score 1/61
      val (dual, mono) = rows.partition(r => both.contains(r._4) && !single.contains(r._4))
      if (dual.nonEmpty && mono.nonEmpty)
        assert(dual.map(_._2).max < mono.map(_._2).min, s"query $q fusion order")
    }
  }

  test("phraseSearch: overlaps count, order matters, no cross-token false hits") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "a b c x a b c"), // two clean occurrences
      (2L, "a a a a"), // overlapping starts of "a a": 3
      (3L, "c b a"), // reversed order — no hit
      (4L, "a b"), // truncated phrase — no hit for "a b c"
      (5L, "x a b c y")).toDF("doc_id", "text")
    val abc = Retrieval.phraseSearch(docs, "doc_id", "text", "a b c")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(abc === Map(1L -> 2L, 5L -> 1L))
    val aa = Retrieval.phraseSearch(docs, "doc_id", "text", "a a")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aa === Map(2L -> 3L), "overlapping occurrences each count")
    val single = Retrieval.phraseSearch(docs, "doc_id", "text", "c")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(single === Map(1L -> 2L, 3L -> 1L, 5L -> 1L))
  }

  test("ndcgAtK: the ideal ranking scores exactly 1, others strictly less") {
    val sp = spark; import sp.implicits._
    // local replica of the md5-derived grade (same arithmetic as the
    // operator's portable-determinism scheme)
    def rel(salt: String, q: Long, d: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt|$q|$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(md, 16) % 4
    }
    val corpus = (100L to 139L)
    val qid = 1L
    val graded = corpus.map(d => (d, rel("t", qid, d)))
    // ideal ranking: rel desc, doc asc
    val ideal = graded.sortBy { case (d, r) => (-r, d) }.take(5)
      .zipWithIndex.map { case ((d, _), i) => (qid, i + 1, d) }
    val idealDf = ideal.toDF("query_id", "rank", "doc_id")
    val corpusDf = corpus.toDF("doc_id")
    val top = Retrieval.ndcgAtK(idealDf, corpusDf, k = 5, relSalt = "t")
      .collect().head
    assert(top.getAs[Double]("ndcg") === 1.0,
      s"ideal ranking must score 1, got $top")
    // worst ranking: rel asc — must score strictly below 1 (grades in
    // 0..3 over 40 docs guarantee the top-5 and bottom-5 grade sets
    // differ)
    val worst = graded.sortBy { case (d, r) => (r, d) }.take(5)
      .zipWithIndex.map { case ((d, _), i) => (qid, i + 1, d) }
    val low = Retrieval.ndcgAtK(worst.toDF("query_id", "rank", "doc_id"),
      corpusDf, k = 5, relSalt = "t").collect().head
    assert(low.getAs[Double]("ndcg") < 1.0)
    assert(low.getAs[Double]("ndcg") >= 0.0)
    assert(low.getAs[Double]("idcg") === top.getAs[Double]("idcg"))
    // hand-check the discount arithmetic on the ideal list
    val expDcg = ideal.map { case (_, rank, d) =>
      (math.pow(2.0, rel("t", qid, d)) - 1.0) / (math.log(rank + 1.0) / math.log(2.0))
    }.sum
    assert(math.abs(top.getAs[Double]("dcg") -
      BigDecimal(expDcg).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      < 1e-9)
  }

  test("mrrRecallAtK: matches an independent local replay of the grade scheme") {
    val sp = spark; import sp.implicits._
    def rel(salt: String, q: Long, d: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt|$q|$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(md, 16) % 4
    }
    val corpus = (100L to 139L)
    val k = 5
    // two queries, system ranking = doc-id order over the first k docs
    val system = for (q <- Seq(1L, 2L); i <- 0 until k)
      yield (q, i + 1, 100L + i)
    val out = Retrieval.mrrRecallAtK(
      system.toDF("query_id", "rank", "doc_id"),
      corpus.toDF("doc_id"), k = k, relSalt = "t")
      .collect().map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("first_rel_rank"), r.getAs[Double]("rr"),
          r.getAs[Long]("hits"), r.getAs[Long]("n_rel"),
          r.getAs[Double]("recall"))).toMap
    for (q <- Seq(1L, 2L)) {
      val grades = system.filter(_._1 == q)
        .map { case (_, rank, d) => (rank, rel("t", q, d) >= 2) }
      val fr = grades.collect { case (rank, true) => rank }
        .minOption.getOrElse(0)
      val hits = grades.count(_._2).toLong
      val nRel = corpus.count(d => rel("t", q, d) >= 2).toLong
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val exp = (fr.toLong, if (fr == 0) 0.0 else r6(1.0 / fr),
        hits, nRel, r6(hits.toDouble / nRel))
      assert(out(q) === exp, s"query $q: got ${out(q)} want $exp")
    }
  }

  test("trigramSearch: equals the naive scan; permuted-trigram false candidates verified away") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"),          // contains "quick br"
      (2L, "QUICK BRown shouting case"),    // case-insensitive hit
      (3L, "brown quick"),                  // all trigrams of "ck b"? no
      // doc 4 holds every trigram of "quick br" but in an order that
      // never forms the substring -> candidate that verify must kill
      (4L, "quicks bro ck black ick ui"),
      (5L, "nothing here"),
      (6L, "qb")                            // shorter than a trigram
    ).toDF("doc_id", "text")
    val pattern = "quick br"
    val got = Retrieval.trigramSearch(docs, "doc_id", "text", pattern)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val naive = docs
      .where(lower($"text").contains(pattern.toLowerCase))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got === naive)
    assert(got === Set(1L, 2L))
    intercept[IllegalArgumentException] {
      Retrieval.trigramSearch(docs, "doc_id", "text", "ab")
    }
  }
}
