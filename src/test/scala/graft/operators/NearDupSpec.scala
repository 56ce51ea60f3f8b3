package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Approximate near-dup operators measured against exact baselines:
  * LSH is allowed to miss (bounded recall) but never to hallucinate
  * (verification steps make precision exact).
  */
class NearDupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.local("neardup-spec", cores = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("minhash recall vs exact jaccard on the documents fixture") {
    val exact = Dedup.q34JaccardPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assume(exact.nonEmpty, "fixture has no near-dup pairs at this threshold")
    // generous estimate cut: the signature estimate of a 0.6-jaccard pair
    // concentrates around 0.6 with sd ≈ sqrt(.6*.4/128) ≈ 0.043
    val approx = NearDup.minHashPairs(
        graft.core.Tables.documents(spark, sfDir), "doc_id", "text",
        threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"minhash recall $recall over ${exact.size} exact pairs")
  }

  test("prefix-filtered jaccard join equals the full inverted-index join") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    def run(strategy: String): Set[(Long, Long, Double)] =
      Dedup.jaccardSimilarityJoin(docs, "doc_id", "text",
          threshold = 0.6, strategy = strategy)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 1e9) / 1e9)).toSet
    val naive = run("inverted")
    val filtered = run("prefix")
    assert(naive.nonEmpty)
    assert(filtered === naive, "prefix filtering must be lossless")
  }

  test("auto strategy: flat df picks inverted, hot shingles pick prefix (bounded candidates)") {
    val sp = spark; import sp.implicits._
    // the fixture corpus has flat shingle document frequency
    val docs = graft.core.Tables.documents(spark, sfDir)
    assert(Dedup.chooseStrategy(docs, "doc_id", "text", sampleFraction = 1.0)
      === "inverted")

    // hot-shingle corpus: every doc shares a stop-shingle run, so the
    // inverted path's candidate count is ~#hot·n²/2 — far past the
    // candidates-per-doc crossover
    val n = 300
    val hot = (0 until n).map { i =>
      val unique = (0 until 30).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, s"the quick brown fox jumps over the lazy sleeping dog $unique")
    }.toDF("doc_id", "text")
    assert(Dedup.chooseStrategy(hot, "doc_id", "text", sampleFraction = 1.0)
      === "prefix")

    // and the prefix path is LOSSLESS on it while never materializing the
    // n²/2 hot-shingle candidates: with threshold .6 and ~34 shingles per
    // doc, each prefix keeps ~|S|-⌈.3|S|⌉+1 ≈ 24 RAREST shingles — the
    // shared hot shingles rank last and drop out, so no pair survives
    val pairs = Dedup.jaccardSimilarityJoin(hot, "doc_id", "text",
      threshold = 0.6, strategy = "prefix").collect()
    assert(pairs.isEmpty) // no pair has true jaccard ≥ 0.6
    // equivalence on the hot corpus too
    val viaInverted = Dedup.jaccardSimilarityJoin(hot, "doc_id", "text",
      threshold = 0.6, strategy = "inverted").collect()
    assert(viaInverted.isEmpty)
  }

  test("minhash estimate tracks exact jaccard") {
    val exact = Dedup.q34JaccardPairs(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)) -> r.getDouble(2))).toMap
    val est = NearDup.minHashPairs(
        graft.core.Tables.documents(spark, sfDir), "doc_id", "text",
        threshold = 0.45)
      .collect().map(r => ((r.getLong(0), r.getLong(1)) -> r.getDouble(2))).toMap
    val common = exact.keySet.intersect(est.keySet)
    assume(common.nonEmpty)
    common.foreach { k =>
      assert(math.abs(exact(k) - est(k)) < 0.2,
        s"pair $k exact=${exact(k)} est=${est(k)}")
    }
  }

  test("simhash finds planted token-overlap duplicates, skips disjoint docs") {
    val sp = spark; import sp.implicits._
    val base = (0 until 60).map(i => s"word$i").mkString(" ")
    val nearDup = base.replace("word59", "changed") // 3 of 58 shingles differ
    val unrelated = (0 until 60).map(i => s"other$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base), (3L, nearDup), (4L, unrelated))
      .toDF("doc_id", "text")
    val pairs = NearDup.simHashPairs(docs, "doc_id", "text",
        maxHamming = 7, chunks = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "identical docs must pair at hamming 0")
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)),
      "small perturbation should stay within hamming bound")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "disjoint-vocabulary doc must not pair")
  }

  test("embedding LSH pairs: planted near-identical vectors recovered exactly") {
    val dim = 32
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val originals = (0 until 40).map(i => (i.toLong, vec()))
    // plant 10 near-duplicates of the first 10 vectors (ids 100+i)
    val dups = (0 until 10).map { i =>
      val (id, v) = originals(i)
      (100L + id, v.map(x => x + 0.001f * rnd.nextGaussian().toFloat))
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType))))
    val rows = (originals ++ dups).map { case (id, v) => Row(id, v.toSeq) }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), schema)

    val pairs = NearDup.embeddingPairs(df, "vec_id", "embedding", dim,
        threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 10).map(i => (i.toLong, 100L + i)).toSet
    assert(expected.subsetOf(pairs),
      s"missed planted pairs: ${expected.diff(pairs)}")
    // precision is exact: any extra pair must genuinely exceed threshold —
    // with random gaussians at dim 32 this is (nearly) impossible
    assert(pairs.size <= expected.size + 1, s"unexpected extra pairs: $pairs")
  }

  test("ANN top-k recovers planted nearest neighbor") {
    val dim = 32
    val rnd = new scala.util.Random(11)
    def vec(): Array[Float] = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val corpus = (0 until 200).map(i => (i.toLong, vec()))
    val queries = (0 until 20).map { i =>
      val (id, v) = corpus(i)
      (1000L + id, v.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType))))
    def toDF(s: Seq[(Long, Array[Float])]): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(s.map { case (id, v) => Row(id, v.toSeq) }, 2),
        schema)

    val got = Similarity.annCosineTopK(
        toDF(corpus), toDF(queries), "vec_id", "embedding", dim, k = 5)
      .where(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val hit = queries.count { case (qid, _) => got.get(qid).contains(qid - 1000L) }
    assert(hit >= 18, s"ANN top-1 recall $hit/20")
  }

  test("centroid drift: per-label centroids vs corpus centroid, exact on a known geometry") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("label", IntegerType),
      StructField("embedding", ArrayType(FloatType))))
    // label 0 points along x, label 1 along y → corpus centroid (.5, .5);
    // both labels sit at cos 1/√2 from it
    val rows = Seq(
      Row(1L, 0, Seq(1.0f, 0.0f)), Row(2L, 0, Seq(1.0f, 0.0f)),
      Row(3L, 1, Seq(0.0f, 1.0f)), Row(4L, 1, Seq(0.0f, 1.0f)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val got = Similarity.centroidDrift(df, "label", "embedding", 2)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(0)._1 === 2L && got(1)._1 === 2L)
    assert(math.abs(got(0)._2 - 1.0 / math.sqrt(2)) < 1e-12)
    assert(math.abs(got(1)._2 - 1.0 / math.sqrt(2)) < 1e-12)
    // a label aligned with the corpus mean scores higher than one askew
    val rows2 = rows :+ Row(5L, 2, Seq(1.0f, 1.0f))
    val df2 = spark.createDataFrame(spark.sparkContext.parallelize(rows2, 2), schema)
    val got2 = Similarity.centroidDrift(df2, "label", "embedding", 2)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(got2(2) > got2(0) && got2(2) > got2(1),
      "the centroid-aligned label must show the least drift (highest cosine)")
  }

  test("hard negatives: the positive is evicted by the ceiling, ranks stay dense") {
    val dim = 16
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val corpus = (0 until 100).map(i => (i.toLong, vec()))
    // each anchor is an exact copy of a corpus vector (cosine 1.0 with it)
    val anchors = (0 until 5).map { i => (1000L + i, corpus(i)._2) }
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType))))
    def toDF(s: Seq[(Long, Array[Float])]): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(s.map { case (id, v) => Row(id, v.toSeq) }, 2),
        schema)

    val out = Similarity.hardNegatives(
      toDF(corpus), toDF(anchors), "vec_id", "embedding",
      k = 5, positiveCeiling = 0.8).collect()
    val byAnchor = out.groupBy(_.getLong(0))
    assert(byAnchor.keySet === anchors.map(_._1).toSet, "every anchor mined")
    byAnchor.foreach { case (qid, rows) =>
      assert(rows.forall(_.getDouble(2) < 0.8), "all below the ceiling")
      assert(!rows.exists(_.getLong(1) === qid - 1000L),
        "the exact duplicate (the positive) must never be returned")
      assert(rows.map(_.getInt(3)).sorted.toSeq === (1 to rows.length),
        "ranks dense from 1 after the eviction, no gap where the positive was")
      assert(rows.length === 5, "k hard negatives per anchor")
    }
    // the mined negatives are the hardest legal ones: rank-1 cosine is the
    // max over the full below-ceiling candidate set
    val brute = Similarity.bruteCosineTopK(
      toDF(corpus), toDF(anchors), "vec_id", "embedding", k = 100)
      .where(col("cos_sim") < 0.8)
      .collect().groupBy(_.getLong(0))
    byAnchor.foreach { case (qid, rows) =>
      val bestLegal = brute(qid).map(_.getDouble(2)).max
      val minedBest = rows.filter(_.getInt(3) == 1).head.getDouble(2)
      assert(math.abs(minedBest - bestLegal) < 1e-12)
    }
  }

  test("incremental near-dup: corpus hit, intra-batch hit, unique doc kept") {
    val sp = spark; import sp.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val corpus = Seq(
      (100L, base),                                   // original in the corpus
      (101L, base),                                   // corpus-internal exact dup
      (102L, "wholly different corpus text about ships and harbors and tides"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, base + " phi"),                            // near-copy of corpus 100/101
      (2L, "completely novel batch document with fresh vocabulary entirely"),
      (3L, "completely novel batch document with fresh vocabulary entirely too"))
      .toDF("doc_id", "text")                         // 3 near-copies 2 (earlier id)
    val out = NearDup.incrementalNearDup(batch, corpus, "doc_id", "text")
      .collect().map(r =>
        r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(out(1L) === ((true, false, false)), "corpus near-copy flagged")
    assert(out(2L) === ((false, false, true)),
      "unique doc kept — corpus-internal dups (100 vs 101) must produce no " +
        "candidate pairs and never affect batch verdicts")
    assert(out(3L) === ((false, true, false)), "intra-batch later id flagged")
  }

  test("incremental near-dup matches the exact batch-vs-corpus relation on the fixture") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val batch = docs.where(col("doc_id") < 100)
    val corpus = docs.where(col("doc_id") >= 100)
    val got = NearDup.incrementalNearDup(batch, corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    // exact reference: all verified pairs over the whole table, classified
    val exact = NearDup.minHashVerifiedPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expCorpus = exact.collect {
      case (a, b) if a < 100 && b >= 100 => a
      case (a, b) if b < 100 && a >= 100 => b
    }.toSet
    val expBatch = exact.collect {
      case (a, b) if a < 100 && b < 100 => math.max(a, b)
    }.toSet
    got.foreach { case (id, (dupC, dupB)) =>
      assert(dupC === expCorpus.contains(id), s"dup_of_corpus for $id")
      assert(dupB === expBatch.contains(id), s"dup_in_batch for $id")
    }
  }

  test("editDistanceJoin: planted edit classes found, distance-2 excluded") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      1L -> "spark", 2L -> "spark", // equal
      3L -> "sparks", // insertion vs 1/2
      4L -> "spank", // substitution vs 1/2
      5L -> "spak", // deletion vs 1/2 AND vs 4 (substitution+shift? no: ed(spak,spank)=1 insert)
      6L -> "flink" // far from everything
    ).toDF("id", "name")
    val got = NearDup.editDistanceJoin(docs, "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      a <- 1L to 6L; b <- (a + 1) to 6L
    } yield (a, b)).toSet
    val names = Map(1L -> "spark", 2L -> "spark", 3L -> "sparks",
      4L -> "spank", 5L -> "spak", 6L -> "flink")
    def lev(s: String, t: String): Int = {
      val d = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to s.length; j <- 1 to t.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      d(s.length)(t.length)
    }
    val want = brute.flatMap { case (a, b) =>
      val dd = lev(names(a), names(b))
      if (dd <= 1) Some((a, b, dd)) else None
    }
    assert(got === want)
  }

  test("editDistanceJoin property: equals brute force on random 3-letter-alphabet corpora") {
    // adversarial alphabet: tiny {a,b,c} over short lengths maximizes
    // accidental near-misses, duplicate strings, and shared deletion
    // variants between NON-matching pairs (candidate ≠ match)
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(4242)
    def lev(s: String, t: String): Int = {
      val d = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to s.length; j <- 1 to t.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      d(s.length)(t.length)
    }
    (1 to 4).foreach { c =>
      val strs = (1L to 60L).map { id =>
        id -> (1 to (1 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }
      val got = NearDup.editDistanceJoin(strs.toDF("id", "name"), "id", "name")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val m = strs.toMap
      val want = (for {
        a <- 1L to 60L; b <- (a + 1) to 60L
        dd = lev(m(a), m(b)) if dd <= 1
      } yield (a, b, dd)).toSet
      assert(got === want, s"case $c")
    }
  }

  test("editDistanceJoin is complete vs brute-force levenshtein on fixture part names") {
    import org.apache.spark.sql.functions._
    val p = graft.core.Tables.part(spark, "/root/testdata/sf0.001")
      .select(col("p_partkey").as("id"), col("p_name").as("name"))
    val got = NearDup.q99EditPairs(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over the same corpus (originals + derived typos)
    val m = (col("id") % length(col("name"))).cast("int")
    val corpus = p.unionByName(p.where(col("id") % 10 === 0)
      .select((col("id") + lit(10000000L)).as("id"),
        concat(col("name").substr(lit(1), m),
          col("name").substr(m + 2, length(col("name")))).as("name")))
    val a = corpus.select(col("id").as("a_id"), col("name").as("a_name"))
    val b = corpus.select(col("id").as("b_id"), col("name").as("b_name"))
    val brute = a.crossJoin(b).where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        levenshtein(col("a_name"), col("b_name")).cast("int").as("dist"))
      .where(col("dist") <= 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(brute.nonEmpty, "fixture must yield at least the planted typo pairs")
    assert(got === brute)
  }

  test("jaroWinklerJoin: pairs only within a block, once each, threshold applied") {
    val sp = spark; import sp.implicits._
    val recs = Seq(
      (1L, "jonathan smith", "j"), (2L, "jonathon smith", "j"),
      (3L, "jon smithers", "j"),
      (4L, "jonathan smith", "k"), // identical name, different block
      (5L, "zzz unrelated", "j")
    ).toDF("id", "name", "blk")
    val got = NearDup.jaroWinklerJoin(recs, "id", "name", col("blk"), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairs = got.map(t => (t._1, t._2)).toSet
    // 1-2 match (one substitution), 4 is blocked away, 5 is below threshold
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "cross-block pair")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L), "sub-threshold pair")
    assert(got.forall(t => t._1 < t._2 && t._3 >= 0.9))
    // values agree with the kernel
    got.foreach { case (a, b, jw) =>
      val names = Map(1L -> "jonathan smith", 2L -> "jonathon smith",
        3L -> "jon smithers", 5L -> "zzz unrelated")
      val want = graft.functions.JaroWinklerImpl.sim(
        org.apache.spark.unsafe.types.UTF8String.fromString(names(a)),
        org.apache.spark.unsafe.types.UTF8String.fromString(names(b)))
      assert(jw === want)
    }
  }

  test("goldenRecords: duplicates + typos collapse, transitive chain, singleton kept") {
    val sp = spark; import sp.implicits._
    // {1,2,3}: exact dup + trailing typo, all pairwise >= 0.97;
    // {5,6,7}: 5-6 and 6-7 pass 0.97 but 5-7 alone scores 0.9636 —
    // only transitive closure puts them in one cluster;
    // {9}: no candidate at all
    val recs = Seq(
      (1L, "alpha industries"), (2L, "alpha industries"),
      (3L, "alpha industriez"),
      (5L, "beta corp"), (6L, "beta corpx"), (7L, "beta corpxy"),
      (9L, "gamma llc")).toDF("id", "name")
    val out = NearDup.goldenRecords(recs, "id", "name",
      org.apache.spark.sql.functions.substring_index(
        org.apache.spark.sql.functions.col("name"), " ", 1), threshold = 0.97)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(out.keySet === Set(1L, 5L, 9L))
    assert(out(1L) === ((3L, 1L, "alpha industries")),
      "16-char tie broken to the smallest id")
    assert(out(5L) === ((3L, 7L, "beta corpxy")),
      "longest name wins the canonical slot")
    assert(out(9L) === ((1L, 9L, "gamma llc")))
  }

  test("sortedNeighborhoodJoin: catches cross-block pairs, respects window") {
    val sp = spark; import sp.implicits._
    // "alpha kettle" vs "alphb kettle": first tokens differ, so q110's
    // first-word hash blocking can never pair them — sort adjacency
    // does. The zz* names are similar to each other but > window apart
    // from the alph* pair alphabetically, exercising the cut.
    val recs = (Seq(
      (1L, "alpha kettle"), (2L, "alphb kettle"),
      (3L, "zz wrench x")) ++
      (10L to 25L).map(i => (i, s"m$i middle filler")))
      .toDF("id", "name")
    val out = NearDup.sortedNeighborhoodJoin(recs, "id", "name",
      window = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 2L)),
      "sort-adjacent near-identical names must pair")
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L),
      "nothing within the window resembles the zz name")
  }

  test("sortedNeighborhoodJoin: duplicate names collapse to one representative") {
    val sp = spark; import sp.implicits._
    val recs = Seq((5L, "same name"), (9L, "same name"), (2L, "same namf"))
      .toDF("id", "name")
    val out = NearDup.sortedNeighborhoodJoin(recs, "id", "name",
      window = 5, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the duplicate "same name" contributes only its min id (5)
    assert(out === Set((5L, 2L)))
  }

  test("randomProjection: matches a local replay of the sign matrix; linear; width-gated") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.functions.col
    def sgn(salt: String, j: Int, i: Int): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt|$j|$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0L) 1.0 else -1.0
    }
    val v = Seq(1.0f, 2.0f, -3.0f, 0.5f)
    val df = Seq((1L, v), (2L, v.map(_ * 2)), (9L, Seq(1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.randomProjection(df, "vec_id", "embedding",
      inDims = 4, outDims = 2, salt = "t").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def proj(j: Int, xs: Seq[Float]): Double = r6(
      xs.zipWithIndex.map { case (x, i0) =>
        x.toDouble * sgn("t", j, i0 + 1) }.sum / math.sqrt(2.0))
    assert(out(1L) === ((proj(0, v), proj(1, v))))
    // linearity: doubling the vector doubles every projection
    assert(math.abs(out(2L)._1 - 2 * out(1L)._1) < 2e-6)
    assert(math.abs(out(2L)._2 - 2 * out(1L)._2) < 2e-6)
    // a row with the wrong width is gated out, not mis-projected
    assert(!out.contains(9L))
  }

  test("knnLabelVote: planted geometry classifies; 1-1 vote tie takes min label") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.functions.col
    val corpus = (
      (100L to 104L).map(i => (i, Seq(1.0f, 0.0f + (i - 100) * 0.01f), 1)) ++
      (110L to 114L).map(i => (i, Seq(0.0f + (i - 110) * 0.01f, 1.0f), 2))
    ).toDF("vec_id", "embedding", "label")
    val queries = Seq(
      (1L, Seq(1.0f, 0.05f), 1), // deep in the label-1 cone
      (2L, Seq(0.05f, 1.0f), 2) // deep in the label-2 cone
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnLabelVote(corpus, queries,
      "vec_id", "embedding", "label", k = 3)
      .collect().map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Int]("predicted"), r.getAs[Long]("votes"),
          r.getAs[Boolean]("correct"))).toMap
    assert(out(1L) === ((1, 3L, true)))
    assert(out(2L) === ((2, 3L, true)))
    // exact 1-1 vote tie (k=2, one neighbor per label) -> min label
    val two = Seq((100L, Seq(1.0f, 0.0f), 5), (101L, Seq(0.0f, 1.0f), 3))
      .toDF("vec_id", "embedding", "label")
    val q = Seq((1L, Seq(0.7f, 0.7f), 5)).toDF("vec_id", "embedding", "label")
    val tie = Similarity.knnLabelVote(two, q, "vec_id", "embedding",
      "label", k = 2).collect().head
    assert(tie.getAs[Int]("predicted") === 3)
    assert(!tie.getAs[Boolean]("correct"))
  }

  test("classifierReport: hand confusion counts, zero-denominator conventions") {
    val sp = spark; import sp.implicits._
    val preds = Seq(
      (1, 1), (1, 1), (1, 2), // label 1: 2 tp, 1 fn(as 2)
      (2, 1), // label 2: 0 tp, predicted as 1
      (3, 3) // label 3: perfect
    ).toDF("true_label", "predicted")
    val out = Similarity.classifierReport(preds)
      .collect().map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("support"), r.getAs[Long]("tp"), r.getAs[Long]("fp"),
          r.getAs[Long]("fn"), r.getAs[Double]("precision"),
          r.getAs[Double]("recall"), r.getAs[Double]("f1"))).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // label 1: tp=2, npred=3 (two true-1 + one true-2) -> p=2/3, r=2/3
    assert(out(1) === ((3L, 2L, 1L, 1L, r6(2.0 / 3), r6(2.0 / 3), r6(2.0 / 3))))
    // label 2: tp=0, npred=1 -> p=0, r=0, f1=0
    assert(out(2) === ((1L, 0L, 1L, 1L, 0.0, 0.0, 0.0)))
    assert(out(3) === ((1L, 1L, 0L, 0L, 1.0, 1.0, 1.0)))
  }

  test("topPrincipalComponent: planted axis recovered with explained share 1") {
    val sp = spark; import sp.implicits._
    // all variance on dim 1, zero-mean by construction: v -> e1 in
    // one step, lambda = sum of squares = 250, explained = 1
    val emb = Seq(
      (1L, Seq(10.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(-10.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Seq(5.0f, 0.0f, 0.0f, 0.0f)),
      (4L, Seq(-5.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val rows = Similarity.topPrincipalComponent(emb, "embedding",
      dims = 4, iterations = 3).collect()
      .map(r => r.getAs[Int]("dim") ->
        (r.getAs[Double]("loading"), r.getAs[Double]("lambda"),
          r.getAs[Double]("explained_share"))).toMap
    assert(rows.keySet === Set(1, 2, 3, 4))
    assert(math.abs(rows(1)._1 - 1.0) < 1e-6)
    (2 to 4).foreach(d => assert(rows(d)._1 === 0.0))
    assert(math.abs(rows(1)._2 - 250.0) < 1e-3)
    assert(math.abs(rows(1)._3 - 1.0) < 1e-6)
  }

  test("topPrincipalComponent: zero-variance input rejects instead of dividing by zero") {
    val sp = spark; import sp.implicits._
    val emb = Seq((1L, Seq(1.0f, 1.0f)), (2L, Seq(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.topPrincipalComponent(emb, "embedding", dims = 2)
    }
  }
}
