package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** PII redaction and repetition-signal semantics on planted rows — the
  * oracle (q60/q61) proves cross-engine equality on the fixture; these
  * pin the tricky cases the fixture cannot plant (adjacent matches,
  * pattern-order interplay, degenerate repetition extremes).
  */
class PrivacySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.local("privacy-spec", cores = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("redactPii masks every type, counts pre-redaction occurrences") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, "mail a.b-c+tag@sub.example.org and x@y.io ok"),
      (2L, "host 192.168.001.042 then call 555-867-5309"),
      (3L, "ssn 123-45-6789 is not phone 123-456-7890"),
      (4L, "clean text, no identifiers at all")).toDF("id", "text")
    val out = Privacy.redactPii(df, "text").collect()
      .map(r => r.getAs[Long]("id") -> r).toMap

    assert(out(1L).getAs[String]("text") === "mail <EMAIL> and <EMAIL> ok")
    assert(out(1L).getAs[Int]("n_emails") === 2)
    assert(out(2L).getAs[String]("text") === "host <IP> then call <PHONE>")
    assert(out(2L).getAs[Int]("n_ips") === 1)
    assert(out(2L).getAs[Int]("n_phones") === 1)
    // SSN (3-2-4) and phone (3-3-4) shapes must not cross-match
    assert(out(3L).getAs[String]("text") === "ssn <ID> is not phone <PHONE>")
    assert(out(3L).getAs[Int]("n_ids") === 1)
    assert(out(3L).getAs[Int]("n_phones") === 1)
    assert(out(4L).getAs[String]("text") === "clean text, no identifiers at all")
    assert(Seq("n_emails", "n_ips", "n_ids", "n_phones")
      .forall(c => out(4L).getAs[Int](c) === 0))
  }

  test("IP-before-phone ordering: dotted quads never leave partial digits") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, "addr 10.255.254.7 port open")).toDF("id", "text")
    val r = Privacy.redactPii(df, "text").head()
    assert(r.getAs[String]("text") === "addr <IP> port open")
    assert(r.getAs[Int]("n_phones") === 0)
  }

  test("kAnonymity: hand-computed class sizes, risk fraction, all-safe table") {
    val sp = spark; import sp.implicits._
    // classes: (us,m)=3 rows, (us,f)=1, (uk,m)=2 → k=3 flags two
    // classes (1+2=3 risky rows of 6)
    val df = Seq(
      ("us", "m"), ("us", "m"), ("us", "m"),
      ("us", "f"),
      ("uk", "m"), ("uk", "m")).toDF("country", "sex")
    val r = Privacy.kAnonymity(df, Seq("country", "sex"), k = 3L).collect().head
    assert(r.getLong(0) === 3L) // n_classes
    assert(r.getLong(1) === 6L) // n_rows
    assert(r.getLong(2) === 2L) // n_risky_classes
    assert(r.getLong(3) === 3L) // n_risky_rows
    assert(math.abs(r.getDouble(4) - 0.5) < 1e-12)
    assert(r.getLong(5) === 1L) // min_class_size
    // k=1 can never flag anything
    val safe = Privacy.kAnonymity(df, Seq("country", "sex"), k = 1L).collect().head
    assert(safe.getLong(2) === 0L && safe.getDouble(4) === 0.0)
  }

  test("repetition signals: stuffed doc flagged, varied doc kept") {
    val sp = spark; import sp.implicits._
    // 20× the same bigram back-to-back: top bigram dominates, every
    // trigram duplicated
    val stuffed = Seq.fill(20)("buy now").mkString(" ")
    // all-distinct tokens: every bigram/trigram unique
    val varied = (1 to 40).map(i => s"w$i").mkString(" ")
    val out = TextAnalysis.repetitionSignals(
      Seq((1L, stuffed), (2L, varied)).toDF("doc_id", "text"),
      "doc_id", "text").collect().map(r => r.getLong(0) -> r).toMap

    val s = out(1L)
    assert(s.getAs[Double]("top_bigram_frac") > 0.45) // "buy now" ~ half of all bigrams
    assert(s.getAs[Double]("dup_trigram_frac") === 1.0)
    assert(!s.getAs[Boolean]("keep"))

    val v = out(2L)
    assert(v.getAs[Double]("top_bigram_frac") < 0.05)
    assert(v.getAs[Double]("dup_trigram_frac") === 0.0)
    assert(v.getAs[Boolean]("keep"))
  }

  test("repetition signals: docs shorter than n drop out consistently") {
    val sp = spark; import sp.implicits._
    val out = TextAnalysis.repetitionSignals(
      Seq((1L, "solo"), (2L, "two tokens here okay")).toDF("doc_id", "text"),
      "doc_id", "text").collect()
    // the 1-token doc has no bigrams at all → no output row (matches the
    // oracle, where unnest of an empty list yields no rows)
    assert(out.map(_.getLong(0)).toSet === Set(2L))
  }

  test("lDiversity: hand-computed distinct-l and entropy-l per class") {
    val sp = spark; import sp.implicits._
    // class g1: sensitive a,a,b,b → l=2, H=ln2, entropy-l=2 exactly
    // class g2: c,c,c → l=1, entropy-l=1 (homogeneous: the attack case)
    val df = Seq(
      ("g1", "a"), ("g1", "a"), ("g1", "b"), ("g1", "b"),
      ("g2", "c"), ("g2", "c"), ("g2", "c")).toDF("qi", "s")
    val out = Privacy.lDiversity(df, Seq("qi"), "s").collect()
      .map(r => r.getAs[String]("qi") ->
        (r.getAs[Long]("class_size"), r.getAs[Long]("l_distinct"),
          r.getAs[Double]("entropy_l"))).toMap
    assert(out("g1") === ((4L, 2L, out("g1")._3)))
    assert(math.abs(out("g1")._3 - 2.0) < 1e-12)
    assert(out("g2")._1 === 3L && out("g2")._2 === 1L)
    assert(math.abs(out("g2")._3 - 1.0) < 1e-12)
  }

  test("tCloseness: hand-computed ordered EMD per class") {
    val sp = spark; import sp.implicits._
    // sensitive domain {1,2,3} (m=3); global q = (6/8, 1/8, 1/8)
    val df = Seq(
      ("gA", 1), ("gA", 1), ("gA", 2), ("gA", 3),
      ("gB", 1), ("gB", 1), ("gB", 1), ("gB", 1)).toDF("qi", "s")
    val out = Privacy.tCloseness(df, Seq("qi"), "s").collect()
      .map(r => r.getAs[String]("qi") ->
        (r.getAs[Long]("class_size"), r.getAs[Double]("t_emd"))).toMap
    // global q = (6/8, 1/8, 1/8)
    // gA p = (2/4, 1/4, 1/4): d=(-.25, .125, .125), cums=(-.25,-.125,0)
    //   → EMD = (.25+.125+0)/2 = 0.1875
    // gB p = (1,0,0): d=(.25,-.125,-.125), cums=(.25,.125,0)
    //   → EMD = (.25+.125)/2 = 0.1875
    assert(out("gA")._1 === 4L)
    assert(math.abs(out("gA")._2 - 0.1875) < 1e-12)
    assert(math.abs(out("gB")._2 - 0.1875) < 1e-12)
  }

  test("tCloseness: identical class distributions score zero") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      ("a", 1), ("a", 2), ("a", 2),
      ("b", 1), ("b", 2), ("b", 2)).toDF("qi", "s")
    val out = Privacy.tCloseness(df, Seq("qi"), "s").collect()
    assert(out.length === 2)
    out.foreach(r => assert(math.abs(r.getAs[Double]("t_emd")) < 1e-12))
  }

  test("dpNoisedCounts: exact counts preserved, noise deterministic and Laplace-shaped") {
    val sp = spark; import sp.implicits._
    val df = (1 to 40).map(i => ("g" + (i % 4), i)).toDF("g", "x")
    // the RELEASE shape must not publish the exact count next to the
    // noised one — that would void the privacy story outright
    assert(!Privacy.dpNoisedCounts(df, Seq("g"), 1.0, "s")
      .columns.contains("n"))
    val rel = Privacy.dpNoisedCounts(df, Seq("g"), epsilon = 1.0,
      salt = "s", releaseExact = true)
    val out = rel.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet === Set("g0", "g1", "g2", "g3"))
    assert(out.values.forall(_._1 === 10L))
    // reproducible: the identical salted release
    val again = Privacy.dpNoisedCounts(df, Seq("g"), 1.0, "s",
        releaseExact = true).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    out.foreach { case (g, (_, v)) => assert(again(g) === v) }
    // replicate the inverse-CDF arithmetic from first principles
    val md = java.security.MessageDigest.getInstance("MD5")
    out.foreach { case (g, (n, noised)) =>
      val hex = md.digest(s"s|$g".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val u = java.lang.Long.parseLong(hex, 16).toDouble / (1L << 60)
      val c = u - 0.5
      val want = n + -1.0 * math.signum(c) * math.log(1 - 2 * math.abs(c))
      assert(math.abs(noised - want) < 1e-9, s"group $g")
    }
    // a different salt is a different release (default release shape:
    // (keys..., n_noised) only)
    val resalted = Privacy.dpNoisedCounts(df, Seq("g"), 1.0, "s2").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.exists { case (g, (_, v)) => resalted(g) != v })
  }
}
