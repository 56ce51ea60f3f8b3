package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Language-ID and winnowing fingerprints on planted data (the fixture's
  * lang labels are random, so detector accuracy must be proven on
  * synthetic languages with genuinely distinct character statistics).
  */
class TextOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.local("textops-spec", cores = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Three synthetic "languages" with disjoint character vocabularies. */
  private def corpus(docsPerLang: Int, seed: Int) = {
    val sp = spark; import sp.implicits._
    val vocab = Map(
      "aa" -> Seq("karak", "tolpa", "minko", "zarbu", "pelto", "krato"),
      "bb" -> Seq("whistle", "grumble", "fiddle", "thistle", "rumble", "middle"),
      "cc" -> Seq("oxyphen", "zygote", "xylem", "physio", "glyph", "nymph"))
    val rnd = new scala.util.Random(seed)
    val rows = for {
      (lang, words) <- vocab.toSeq
      i <- 0 until docsPerLang
    } yield (s"$lang-$i", lang,
      Seq.fill(30)(words(rnd.nextInt(words.size))).mkString(" "))
    rows.toDF("doc_id", "lang", "text")
  }

  test("n-gram language ID: train on one sample, classify a held-out sample") {
    val train = corpus(20, seed = 1)
    val test = corpus(10, seed = 2) // same languages, different docs
    val profiles = LangId.trainProfiles(train, "text", "lang")
    val predicted = LangId.classify(test, "doc_id", "text", profiles)
    val joined = predicted.join(test, Seq("doc_id"))
    val correct = joined.where(col("predicted_lang") === col("lang")).count()
    val total = joined.count()
    assert(total === 30)
    assert(correct.toDouble / total >= 0.95,
      s"lang-id accuracy $correct/$total")
  }

  test("winnowing: shared substrings produce shared fingerprints, disjoint text doesn't") {
    val sp = spark; import sp.implicits._
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, s"prefix one $shared suffix alpha"),
      (2L, s"completely different start $shared tail omega"),
      (3L, "unrelated content entirely made of other words and letters"))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.winnowFingerprints(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fp(1L).intersect(fp(2L)).nonEmpty,
      "docs sharing a long substring must share fingerprints")
    assert(fp(1L).intersect(fp(3L)).isEmpty,
      "disjoint docs should share no fingerprints")
    // deterministic across partitionings
    val fp2 = TextAnalysis.winnowFingerprints(docs.repartition(3), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fp === fp2)
  }

  test("stripCommonNgrams removes shared spans everywhere, leaves unique text alone") {
    val sp = spark; import sp.implicits._
    val shared = "alpha beta gamma delta epsilon zeta" // 6 tokens → 2 5-grams
    val docs = Seq(
      (1L, s"one two three $shared four five"),
      (2L, s"$shared six seven eight nine ten"),
      (3L, "eleven twelve thirteen fourteen fifteen sixteen seventeen"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.stripCommonNgrams(docs, "doc_id", "text",
        n = 5, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) === ("one two three four five", 6L))
    assert(out(2L) === ("six seven eight nine ten", 6L))
    assert(out(3L) === ("eleven twelve thirteen fourteen fifteen sixteen seventeen", 0L))
  }

  test("hashedTfComponents ≡ posexplode(hashingTfVectors) — the codegen" +
    " join shape and the array HOF shape agree value-for-value") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.functions.{col, posexplode}
    val docs = Seq(
      (1L, "alpha beta alpha gamma gamma gamma"),
      (2L, "delta"),
      (3L, "epsilon zeta eta theta iota kappa lambda mu nu xi"))
      .toDF("doc_id", "text")
    val viaArray = TextAnalysis.hashingTfVectors(docs, "doc_id", "text", dim = 16)
      .select(col("doc_id"), posexplode(col("vec")).as(Seq("i", "component")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val viaJoin = TextAnalysis.hashedTfComponents(docs, "doc_id", "text", dim = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(viaJoin.keySet === viaArray.keySet)
    assert(viaJoin.size === 3 * 16)
    viaJoin.foreach { case (k, v) =>
      assert(math.abs(v - viaArray(k)) < 1e-12, s"slot $k: $v vs ${viaArray(k)}")
    }
  }

  test("stripCommonNgrams: doc shorter than n and fully-covered doc survive") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // identical 5-token docs
      (3L, "tiny doc"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.stripCommonNgrams(docs, "doc_id", "text",
        n = 5, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) === ("", 5L), "fully-shared doc is emptied, not dropped")
    assert(out(2L) === ("", 5L))
    assert(out(3L) === ("tiny doc", 0L))
  }

  test("stripCommonNgrams: boilerplate-dense long doc — gap walk keeps " +
    "order and exact survivors at ~97% coverage") {
    val sp = spark; import sp.implicits._
    // 40-token shared block repeated 12× with one unique token between
    // occurrences: 480 of 494 tokens covered. The old array_contains
    // rebuild was O(tokens × covered) here; the gap walk is linear, and
    // this pins that its output (token order across many gaps, adjacent
    // covered runs, a trailing gap) matches the semantics exactly.
    val block = (0 until 40).map(i => s"b$i").mkString(" ")
    val doc1 = (0 until 12).map(k => s"u$k " + block).mkString(" ") +
      " tail0 tail1"
    val docs = Seq((1L, doc1), (2L, block)).toDF("doc_id", "text")
    val out = TextAnalysis.stripCommonNgrams(docs, "doc_id", "text",
        n = 5, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val survivors = (0 until 12).map(k => s"u$k").mkString(" ") + " tail0 tail1"
    assert(out(1L) === ((survivors, 480L)))
    assert(out(2L) === (("", 40L)), "doc that IS the boilerplate is emptied")
  }

  test("pmiCollocations: hand-computed PMI, min-count gate, bigrams stay in-doc") {
    val sp = spark; import sp.implicits._
    // unigrams: a=3 b=3 c=1 (T=7); bigrams: doc1 (a,b)(b,a)(a,b),
    // doc2 (a,b)(b,c) (B=5); only (a,b) hits minCount=2
    val docs = Seq("a b a b", "a b c").toDF("text")
    val out = TextAnalysis.pmiCollocations(docs, "text", minCount = 2L).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getString(0), r.getString(1)) === ("a", "b"))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((3L, 3L, 3L)))
    val expected = math.log((3.0 / 5.0) / ((3.0 / 7.0) * (3.0 / 7.0))) / math.log(2.0)
    assert(math.abs(r.getDouble(5) - expected) < 1e-12)
    // a doc boundary is never crossed: "x y" + "y x" has no (y,y) bigram
    val two = Seq("x y", "y x").toDF("text")
    val pairs = TextAnalysis.pmiCollocations(two, "text", minCount = 1L)
      .collect().map(r2 => (r2.getString(0), r2.getString(1))).toSet
    assert(pairs === Set(("x", "y"), ("y", "x")))
  }

  test("native winnow_hash ≡ the HOF formulation bit-for-bit on the fixture") {
    val sp = spark; import sp.implicits._
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      // edge shapes the fused loop must agree on: shorter than k,
      // shorter than k+window, mixed case, repeated minima
      .unionByName(Seq(
        (900001L, "abc"), (900002L, "ABCDEFGHIJ"), (900003L, "aaaaaaaaaaaaaaaa"),
        (900004L, "The Quick Brown Fox!")).toDF("doc_id", "text"))
    val native = TextAnalysis.winnowFingerprints(docs, "doc_id", "text",
      portableHash = true)
      .select(col("doc_id"), col("fingerprints"), col("n_fingerprints"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getInt(2))).toMap
    val hof = TextAnalysis.hofWinnowFingerprints(docs, "doc_id", "text",
      k = 8, window = 6, portableHash = true)
      .select(col("doc_id"), col("fingerprints"), col("n_fingerprints"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getInt(2))).toMap
    assert(native.keySet === hof.keySet)
    native.foreach { case (id, (fps, n)) =>
      assert(n === hof(id)._2, s"count mismatch for doc $id")
      assert(fps === hof(id)._1, s"fingerprints mismatch for doc $id")
    }
  }

  test("zipfFit: exact least-squares on a constructed rank-frequency curve") {
    val sp = spark; import sp.implicits._
    // frequencies 8/4/2/1 for tokens a/b/c/d → ranks 1..4; slope and
    // intercept of ln(freq) on ln(rank) computed locally with the same
    // least-squares formulas
    val words = Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c") ++ Seq("d")
    val docs = Seq(words.mkString(" ")).toDF("text")
    val r = TextAnalysis.zipfFit(docs, "text", topN = 10).collect().head
    assert(r.getLong(0) === 4L)
    val xs = (1 to 4).map(i => math.log(i.toDouble))
    val ys = Seq(8.0, 4.0, 2.0, 1.0).map(math.log)
    val mx = xs.sum / 4; val my = ys.sum / 4
    val sxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val sxx = xs.map(x => (x - mx) * (x - mx)).sum
    val syy = ys.map(y => (y - my) * (y - my)).sum
    val slope = sxy / sxx
    assert(math.abs(r.getDouble(1) - slope) < 1e-9)
    assert(math.abs(r.getDouble(2) - (my - slope * mx)) < 1e-9)
    assert(math.abs(r.getDouble(3) - sxy * sxy / (sxx * syy)) < 1e-9)
    // frequency ties break by token, deterministically: equal-count
    // tokens must produce the same fit regardless of input row order
    val tied = Seq("x y", "y x").toDF("text")
    val t1 = TextAnalysis.zipfFit(tied, "text", topN = 10).collect().head
    assert(t1.getLong(0) === 2L && math.abs(t1.getDouble(1)) < 1e-12,
      "flat curve has slope 0")
  }

  test("fingerprintOverlap: verbatim-quote pair detected, disjoint docs silent") {
    val sp = spark; import sp.implicits._
    val quote = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, s"alpha bravo charlie $quote delta echo"),
      (2L, s"zulu yankee $quote xray whiskey victor"),
      (3L, "completely unrelated content with different characters qqq www")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.fingerprintOverlap(docs, "doc_id", "text", minShared = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length === 1, s"only the quoting pair, got ${out.toSeq}")
    val (a, b, shared, overlap) = out.head
    assert(a === 1L && b === 2L)
    assert(shared >= 5L)
    assert(overlap > 0.0 && overlap <= 1.0)
  }

  test("tokenEntropy: uniform=log2(k), constant=0, skewed by hand") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "a a a a"), (2L, "a b c d"), (3L, "a a b")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 === 4L && math.abs(out(1L)._2) < 1e-12)
    assert(out(2L)._1 === 4L && math.abs(out(2L)._2 - 2.0) < 1e-12)
    val h3 = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3)) / math.log(2.0)
    assert(out(3L)._1 === 3L && math.abs(out(3L)._2 - h3) < 1e-12)
  }

  test("readability: hand-computed Flesch, punctuation runs, vowelless words") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "the cat. sat!! on mat?"),
      (2L, "b2b 42 #")).toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1: 5 words, 3 sentence runs ('.', '!!', '?'), 5 vowel groups
    val r1 = out(1L)
    assert(r1.getAs[Int]("n_words") === 5)
    assert(r1.getAs[Int]("n_sentences") === 3)
    assert(r1.getAs[Int]("n_syllables") === 5)
    val flesch = 206.835 - 1.015 * (5.0 / 3) - 84.6 * (5.0 / 5)
    assert(math.abs(r1.getAs[Double]("flesch") - flesch) < 1e-9)
    val fk = 0.39 * (5.0 / 3) + 11.8 * (5.0 / 5) - 15.59
    assert(math.abs(r1.getAs[Double]("fk_grade") - fk) < 1e-9)
    // doc 2: zero punctuation → min 1 sentence; all three words are
    // vowelless → one syllable each
    val r2 = out(2L)
    assert(r2.getAs[Int]("n_sentences") === 1)
    assert(r2.getAs[Int]("n_syllables") === 3)
  }

  test("stemLight: every rule branch and its guards") {
    val sp = spark; import sp.implicits._
    val cases = Seq(
      "stresses" -> "stress", // sses → ss
      "ponies" -> "poni",     // ies → i
      "glass" -> "glass",     // ss unchanged
      "cats" -> "cat",        // s-drop
      "gas" -> "gas",         // s-drop length guard (≤3 keeps s)
      "modeling" -> "model",  // ing-strip
      "string" -> "string",   // ing vowel guard (str has no vowel)
      "modeled" -> "model",   // ed-strip (after s-rules no-op)
      "red" -> "red",         // ed length guard
      "deed" -> "deed",       // ed length guard boundary (len 4)
      "speed" -> "spe",       // ed-strip at len 5 with vowel stem
      "plain" -> "plain")     // no rule fires
    val got = cases.map(_._1).toDF("t")
      .select(org.apache.spark.sql.functions.col("t"),
        TextAnalysis.stemLight(org.apache.spark.sql.functions.col("t"))
          .as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(got(in) === want, s"stem($in)")
    }
  }

  test("crossEntropyQuality: rare-token docs score higher than common-token docs") {
    val sp = spark; import sp.implicits._
    // "the" dominates the corpus; doc 3 is all rare tokens
    val docs = Seq(
      (1L, "the the the the the the the the"),
      (2L, "the the the cat"),
      (3L, "zyx qwv kjh gfd")).toDF("doc_id", "text")
    val out = TextAnalysis.crossEntropyQuality(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("cross_entropy"))).toMap
    assert(out(1L)._1 === 8L)
    assert(out(1L)._2 < out(2L)._2, "pure-common doc scores lowest")
    assert(out(2L)._2 < out(3L)._2, "rare-token doc scores highest")
    // hand value for doc 1: p(the) = (11+1)/(16+6); -ln of it
    assert(math.abs(out(1L)._2 - (-math.log(12.0 / 22.0))) < 1e-12)
  }

  test("tokenBurstiness: clumped token scores high, uniform token zero") {
    val sp = spark; import sp.implicits._
    // 10 docs; "burst" appears 10x in doc 1 only; "even" once per doc
    val docs = (1L to 10L).map { i =>
      val burst = if (i == 1L) Seq.fill(10)("burst") else Seq.empty
      (i, (Seq("even") ++ burst).mkString(" "))
    }.toDF("doc_id", "text")
    val out = TextAnalysis.tokenBurstiness(docs, "doc_id", "text",
      minCount = 5, topN = 10).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_total"), r.getAs[Long]("n_docs"),
          r.getAs[Double]("fano"))).toMap
    // burst: mean 1, E[x²] = 10 → var 9 → fano 9 (zeros included)
    assert(out("burst")._1 === 10L && out("burst")._2 === 1L)
    assert(math.abs(out("burst")._3 - 9.0) < 1e-12)
    // even: present in every doc exactly once → fano 0
    assert(out("even")._2 === 10L)
    assert(math.abs(out("even")._3) < 1e-12)
  }

  test("labelConfusion: clean labels sit on the diagonal, planted mislabel surfaces") {
    val sp = spark; import sp.implicits._
    // two sharply distinct "languages" by character statistics; doc 6
    // carries ee-text under an oo label — the audit must expose it
    val ee = "the bee sees three green trees every evening indeed"
    val oo = "zoom moon spoon soon wool cool fool pool tool stool"
    val docs = Seq(
      (1L, ee + " freely", "ee"), (2L, ee + " between", "ee"),
      (3L, oo + " gloom", "oo"), (4L, oo + " roost", "oo"),
      (5L, ee + " seen", "ee"),
      (6L, ee + " decree", "oo")).toDF("doc_id", "text", "lang")
    val out = LangId.labelConfusion(docs, "doc_id", "text", "lang")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Double]("frac"),
          r.getAs[Boolean]("agree"))).toMap
    assert(out(("ee", "ee"))._1 === 3L && out(("ee", "ee"))._3)
    // the mislabeled doc shows up as declared-oo predicted-ee
    assert(out(("oo", "ee"))._1 === 1L && !out(("oo", "ee"))._3)
    assert(math.abs(out(("oo", "ee"))._2 - 1.0 / 3) < 1e-12)
    assert(out(("oo", "oo"))._1 === 2L)
  }

  test("vocabCoverage: hand-computed crossing ranks, ties deterministic") {
    val sp = spark; import sp.implicits._
    // counts: a=60, b=20, c=10, d=10 (mass 100, vocab 4)
    val text = (Seq.fill(60)("a") ++ Seq.fill(20)("b") ++
      Seq.fill(10)("c") ++ Seq.fill(10)("d")).mkString(" ")
    val out = TextAnalysis.vocabCoverage(Seq((1L, text)).toDF("id", "text"),
      "text").collect()
      .map(r => r.getAs[Double]("coverage") ->
        (r.getAs[Long]("k_tokens"), r.getAs[Long]("vocab_size"),
          r.getAs[Long]("total_tokens"))).toMap
    // cum mass by rank: 60, 80, 90, 100
    assert(out(0.5) === ((1L, 4L, 100L)))  // 60 ≥ 50
    assert(out(0.8) === ((2L, 4L, 100L)))  // 80 ≥ 80
    assert(out(0.9) === ((3L, 4L, 100L)))  // c/d tie: same mass per step
    assert(out(0.99) === ((4L, 4L, 100L)))
  }

  test("countMinHeavyHitters: never underestimates, exact when uncollided") {
    val sp = spark; import sp.implicits._
    // heavy token far above minExact plus light noise tokens
    val docs = Seq((1L,
      (Seq.fill(150)("heavy") ++ (1 to 40).map(i => s"light$i"))
        .mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.countMinHeavyHitters(docs, "text",
      depth = 4, width = 1024, minExact = 100).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("token") === "heavy")
    assert(r.getAs[Long]("exact_count") === 150L)
    assert(r.getAs[Boolean]("never_underestimates"))
    // 41 tokens in 4×1024 cells: collisions are unlikely to hit all 4
    // rows of "heavy", so the min-estimate is exact here
    assert(r.getAs[Long]("cms_estimate") === 150L)
    assert(r.getAs[Double]("overestimate_frac") === 0.0)
  }

  test("bloomMembership: no false negatives ever; tiny filter saturates to fp") {
    val sp = spark; import sp.implicits._
    val members = Seq((1L, (1 to 40).map(i => s"m$i").mkString(" ")))
      .toDF("doc_id", "text")
    val probes = Seq((2L,
      ((1 to 40).map(i => s"m$i") ++ (1 to 60).map(i => s"x$i"))
        .mkString(" "))).toDF("doc_id", "text")
    // roomy filter: members found, fp rare
    val big = TextAnalysis.bloomMembership(members, probes, "text",
      bits = 8192, hashes = 4).collect().head
    assert(big.getAs[Long]("n_true_members") === 40L)
    assert(big.getAs[Boolean]("no_false_negatives"))
    // 16 bits for 40 members: essentially every bit set → non-members
    // collide massively, yet the invariant still holds
    val tiny = TextAnalysis.bloomMembership(members, probes, "text",
      bits = 16, hashes = 2).collect().head
    assert(tiny.getAs[Boolean]("no_false_negatives"))
    assert(tiny.getAs[Double]("fp_rate") > 0.5,
      s"a saturated filter must false-positive: ${tiny.getAs[Double]("fp_rate")}")
  }

  test("knBigramLogProb: hand-computed KN probabilities; continuation mass sums to 1") {
    val sp = spark; import sp.implicits._
    // corpus bigrams: (a,b)×2, (a,c)×1 → c(a)=3, N₁₊(a·)=2,
    // N₁₊(·b)=N₁₊(·c)=1, |types|=2, D=0.75
    //   P(b|a) = (2−.75)/3 + .75·2/3·(1/2) = 2/3
    //   P(c|a) = (1−.75)/3 + .75·2/3·(1/2) = 1/3   (mass sums to 1)
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.knBigramLogProb(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("mean_logprob_kn"))).toMap
    assert(out(1L)._1 === 1L)
    assert(math.abs(out(1L)._2 - math.log(2.0 / 3.0)) < 1e-12)
    assert(math.abs(out(2L)._2 - math.log(2.0 / 3.0)) < 1e-12)
    assert(math.abs(out(3L)._2 - math.log(1.0 / 3.0)) < 1e-12)
    // a 1-token doc has no bigrams and must be absent, not zero-scored
    assert(!out.contains(4L))
  }

  test("rougeN: hand-computed clipped overlaps; repeats clip; empty bigram side scores 0") {
    val sp = spark; import sp.implicits._
    val pairs = Seq(
      (1L, "the cat sat", "the cat ate food"),
      (2L, "a a a", "a"), // clipping: overlap is min(3,1)=1, not 3
      (3L, "solo", "solo") // no bigrams on either side
    ).toDF("pair_id", "hyp", "ref")
    val out = TextAnalysis.rougeN(pairs, "pair_id", "hyp", "ref")
      .collect().map(r => r.getAs[Long]("pair_id") -> r).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val p1 = out(1L)
    assert(p1.getAs[Long]("r1_overlap") === 2L) // the, cat
    assert(p1.getAs[Double]("r1_precision") === r6(2.0 / 3))
    assert(p1.getAs[Double]("r1_recall") === 0.5)
    assert(p1.getAs[Double]("r1_f1") ===
      r6(2 * (2.0 / 3) * 0.5 / (2.0 / 3 + 0.5)))
    assert(p1.getAs[Long]("r2_overlap") === 1L) // "the cat"
    assert(p1.getAs[Double]("r2_precision") === 0.5)
    assert(p1.getAs[Double]("r2_recall") === r6(1.0 / 3))
    val p2 = out(2L)
    assert(p2.getAs[Long]("r1_overlap") === 1L)
    assert(p2.getAs[Double]("r1_precision") === r6(1.0 / 3))
    assert(p2.getAs[Double]("r1_recall") === 1.0)
    val p3 = out(3L)
    assert(p3.getAs[Long]("r1_overlap") === 1L)
    assert(p3.getAs[Long]("r2_overlap") === 0L)
    assert(p3.getAs[Double]("r2_f1") === 0.0)
  }

  test("repetitionRuns: hand islands, non-adjacent repeats don't extend runs") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "a a a b b c"),    // max run 3, 6 tokens 3 distinct -> .5
      (2L, "x y z"),          // no repetition at all
      (3L, "t t t t t t t t"),// one 8-run, 1 distinct -> 7/8
      (4L, "a b a b a b")     // repeats but NEVER adjacent: max run 1
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionRuns(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("max_run"),
          r.getAs[Double]("repeat_fraction"))).toMap
    assert(out(1L) === ((6L, 3L, 0.5)))
    assert(out(2L) === ((3L, 1L, 0.0)))
    assert(out(3L) === ((8L, 8L, 0.875)))
    assert(out(4L) === ((6L, 1L, 0.666667)))
  }

  test("heapsFit: exact power-law corpus recovers beta=0.5, c=1, r2=1") {
    val sp = spark; import sp.implicits._
    // checkpoints (N, V): (1,1), (4,2), (9,3) — exactly V = N^0.5
    val docs = Seq(
      (1L, "a"),
      (2L, "a a b"),
      (3L, "c a a b b")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.heapsFit(docs, "doc_id", "text")
      .collect().head
    assert(r.getAs[Long]("n_points") === 3L)
    assert(math.abs(r.getAs[Double]("c") - 1.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("beta") - 0.5) < 1e-6)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-6)
  }

  test("heapsFit: repetitive corpus drives beta toward zero") {
    val sp = spark; import sp.implicits._
    val docs = (1L to 20L).map(i => (i, "a b c d e"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.heapsFit(docs, "doc_id", "text")
      .collect().head
    assert(r.getAs[Double]("beta") < 0.2,
      s"templated corpus must have a near-flat vocab curve, got ${r.getAs[Double]("beta")}")
  }

  test("goodTuring: hand-computed count-of-counts, tail gap yields NULL r_star") {
    val sp = spark; import sp.implicits._
    // tokens: a a a b b c -> freqs 3,2,1 -> N_1=N_2=N_3=1, N=6
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val out = TextAnalysis.goodTuring(docs, "text")
      .collect().map(r => r.getAs[Long]("r") -> r).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(math.abs(out(1L).getAs[Double]("r_star") - 2.0) < 1e-9)
    assert(math.abs(out(1L).getAs[Double]("p_gt") - 2.0 / 6.0) < 1e-6)
    assert(math.abs(out(2L).getAs[Double]("r_star") - 3.0) < 1e-9)
    assert(out(3L).isNullAt(out(3L).fieldIndex("r_star")))
    for (r <- Seq(1L, 2L, 3L))
      assert(math.abs(out(r).getAs[Double]("p0") - 1.0 / 6.0) < 1e-6)
  }
}
