package graft.functions

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.NearDup

class FunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.local("functions-spec", cores = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("cosine_similarity matches the higher-order-function baseline on the fixture") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.where(col("vec_id") === 0)
      .select(col("embedding").as("qe")).crossJoin(e.limit(200))
    val toD = (c: org.apache.spark.sql.Column) =>
      transform(c, x => x.cast(DoubleType))
    val both = q.select(
      col("vec_id"),
      expr("cosine_similarity(embedding, qe)").as("native"),
      NearDup.cosine(toD(col("embedding")), toD(col("qe"))).as("hof"))
    val rows = both.collect()
    assert(rows.length === 200)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12,
        s"vec ${r.getLong(0)}: native=${r.getDouble(1)} hof=${r.getDouble(2)}")
    }
  }

  test("cosine_similarity participates in whole-stage codegen") {
    val e = Tables.embeddings(spark, sfDir)
    val plan = e.select(expr("cosine_similarity(embedding, embedding)").as("s"))
      .queryExecution.executedPlan
    // the projection containing the expression must sit inside a
    // WholeStageCodegen stage (i.e. doGenCode was used, not eval fallback)
    val codegenStages = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.nonEmpty, s"no codegen stage in:\n$plan")
    assert(codegenStages.exists(_.toString.contains("cosine_similarity")),
      s"cosine_similarity not inside codegen stage:\n$plan")
  }

  test("cosine_similarity null/zero/mismatch semantics") {
    val sp = spark; import sp.implicits._
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType)), StructField("b", ArrayType(DoubleType))))
    def run(a: Seq[java.lang.Double], b: Seq[java.lang.Double]): Option[Double] = {
      val df = spark.createDataFrame(
        java.util.Arrays.asList(Row(a, b)), schema)
      val r = df.select(expr("cosine_similarity(a, b)")).head()
      if (r.isNullAt(0)) None else Some(r.getDouble(0))
    }
    assert(run(Seq(1.0, 0.0), Seq(1.0, 0.0)).exists(v => math.abs(v - 1.0) < 1e-12))
    assert(run(Seq(1.0, 0.0), Seq(0.0, 1.0)).exists(v => math.abs(v) < 1e-12))
    assert(run(Seq(1.0, 0.0), Seq(-1.0, 0.0)).exists(v => math.abs(v + 1.0) < 1e-12))
    assert(run(null, Seq(1.0, 2.0)) === None) // null array → null
    assert(run(Seq(0.0, 0.0), Seq(1.0, 2.0)) === None) // zero norm → null
    assert(run(Seq(1.0, null), Seq(1.0, 2.0)) === None) // null element → null
    intercept[Exception] { run(Seq(1.0), Seq(1.0, 2.0)) } // length mismatch
  }

  test("hyperplane_buckets matches the interpreted HOF fold bit-for-bit") {
    val dim = 64; val tables = 8; val bits = 8; val seed = 42L
    val e = Tables.embeddings(spark, sfDir).limit(300)
    // the historical formulation: one aggregate(zip_with(e, plane)) fold
    // per (table, bit), planes drawn in the same t-major order
    val rnd = new scala.util.Random(seed)
    val planes = Seq.fill(tables)(Seq.fill(bits)(Seq.fill(dim)(lit(rnd.nextGaussian()))))
    val eD = transform(col("embedding"), x => x.cast(DoubleType))
    val hofKeys = planes.map { tbl =>
      tbl.zipWithIndex.map { case (p, j) =>
        val proj = aggregate(
          zip_with(eD, array(p: _*), (x, y) => x * y), lit(0.0), (a, v) => a + v)
        when(proj > 0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)
    }
    val both = e.select(
      col("vec_id"),
      GraftFunctions.hyperplaneBuckets(col("embedding"), dim, tables, bits, seed)
        .as("fused"),
      array(hofKeys: _*).as("hof"))
    both.collect().foreach { r =>
      assert(r.getSeq[Int](1) === r.getSeq[Int](2),
        s"vec ${r.getLong(0)}: fused=${r.getSeq[Int](1)} hof=${r.getSeq[Int](2)}")
    }
  }

  test("hyperplane_buckets null semantics: null element → null buckets (intentional strictness)") {
    // Deviates from the historical HOF fold on purpose (that one treated
    // a null projection as a 0 bit): a vector with null components has
    // no meaningful cosine — the exact-verify stage nulls it out too —
    // so such rows drop out of LSH bucketing instead of colliding in an
    // arbitrary bucket. Documented in HyperplaneBuckets's scaladoc.
    val schema = StructType(Seq(StructField("e", ArrayType(DoubleType))))
    def run(e: Seq[java.lang.Double]): Boolean = { // isNull of the bucket array
      val df = spark.createDataFrame(java.util.Arrays.asList(Row(e)), schema)
      df.select(GraftFunctions.hyperplaneBuckets(col("e"), 4, 2, 4, 7L).as("b"))
        .head().isNullAt(0)
    }
    assert(!run(Seq(1.0, 2.0, 3.0, 4.0))) // clean row buckets normally
    assert(run(Seq(1.0, null, 3.0, 4.0))) // null element → null buckets
    assert(run(null))                     // null array → null buckets
  }

  test("hyperplane_buckets participates in whole-stage codegen") {
    val e = Tables.embeddings(spark, sfDir)
    val plan = e.select(
      GraftFunctions.hyperplaneBuckets(col("embedding"), 64, 8, 8, 42L).as("b"))
      .queryExecution.executedPlan
    val codegenStages = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.nonEmpty, s"no codegen stage in:\n$plan")
    assert(codegenStages.exists(_.toString.contains("hyperplane_buckets")),
      s"hyperplane_buckets not inside codegen stage:\n$plan")
  }

  test("VectorAvg aggregator computes per-label centroids") {
    val e = Tables.embeddings(spark, sfDir)
    val got = e.groupBy(col("label"))
      .agg(VectorAvg.of(64)(col("embedding")).as("centroid"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    // manual baseline via explode + avg per dimension
    val want = e.select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("col").cast(DoubleType)).as("m"))
      .collect().groupBy(_.getInt(0))
      .map { case (l, rows) =>
        l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
    assert(got.keySet === want.keySet)
    got.foreach { case (l, c) =>
      c.zip(want(l)).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-5, s"label $l centroid mismatch")
      }
    }
  }

  test("jaro_winkler matches DuckDB-pinned reference values exactly") {
    val sp = spark; import sp.implicits._
    // values taken verbatim from duckdb jaro_winkler_similarity — the
    // q110 oracle; covers transpositions, the 0.7 boost threshold (0.6
    // case gets NO boost despite a 4-char prefix), the 4-char prefix
    // cap, window-excluded swaps, and empty strings
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
      ("CRATE", "TRACE", 0.7333333333333334),
      ("abcdxxxxxx", "abcdyyyyyy", 0.6),
      ("ab", "abcdefghijklmnop", 0.7666666666666667),
      ("hello", "hello ", 0.9666666666666667),
      ("aaapple", "apple", 0.9142857142857143),
      ("ab", "ba", 0.0),
      ("abc", "xyz", 0.0),
      ("", "abc", 0.0),
      ("", "", 0.0),
      ("a", "a", 1.0))
    val got = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(expr("jaro_winkler(a, b)")).collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((a, b, want), g) =>
      assert(g === want, s"jaro_winkler('$a','$b')")
    }
    // null propagates
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(expr("jaro_winkler(a, b)")).collect()
    assert(n.head.isNullAt(0))
  }

  test("jaro_winkler participates in whole-stage codegen and agrees with eval") {
    val p = Tables.part(spark, sfDir).limit(200)
      .select(col("p_name").as("a"), reverse(col("p_name")).as("b"))
    val plan = p.select(expr("jaro_winkler(a, b)").as("s"))
      .queryExecution.executedPlan
    val codegenStages = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.exists(_.toString.contains("jaro_winkler")),
      s"jaro_winkler not inside codegen stage:\n$plan")
    // codegen result == interpreted kernel on real strings
    val got = p.select(col("a"), col("b"),
      expr("jaro_winkler(a, b)").as("s")).collect()
    got.foreach { r =>
      val want = JaroWinklerImpl.sim(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)),
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)))
      assert(r.getDouble(2) === want,
        s"codegen/eval divergence on ('${r.getString(0)}','${r.getString(1)}')")
    }
  }

  test("jaro_winkler_gte ≡ jaro_winkler >= θ — admission bound never flips a verdict") {
    val sp = spark; import sp.implicits._
    // adversarial mix: near-misses around several thresholds, shared
    // letter bags with low positional agreement (the bound's weak
    // spot), anagrams, non-ASCII (bound must stand aside), empties,
    // and real fixture names against shuffled variants
    val words = Seq("almond", "antique", "rose", "metallic", "misty",
      "thistle", "burnished", "cornsilk")
    val synth = for {
      a <- words; b <- words
    } yield (a + " " + b, b + " " + a)
    val pairs = (synth ++ Seq(
      ("MARTHA", "MARHTA"), ("CRATE", "TRACE"), ("ab", "ba"),
      ("café au lait", "cafe au lait"), ("żółć", "zolc"),
      ("", "x"), ("", ""), ("same string", "same string"),
      ("listen", "silent"), ("dusty rose metallic", "rose dusty metallic")))
      .toDF("a", "b")
    for (theta <- Seq(0.7, 0.85, 0.92, 0.99)) {
      val rows = pairs.select(col("a"), col("b"),
        expr(s"jaro_winkler_gte(a, b, $theta)").as("g"),
        (expr("jaro_winkler(a, b)") >= theta).as("want")).collect()
      rows.foreach { r =>
        assert(r.getBoolean(2) === r.getBoolean(3),
          s"gate mismatch at θ=$theta on ('${r.getString(0)}','${r.getString(1)}')")
      }
    }
    // fixture sweep: every blocked pair's gate verdict matches the
    // plain-expression comparison (the q110 join path end-to-end)
    val p = Tables.part(spark, sfDir)
      .select(col("p_name").as("n"), substring_index(col("p_name"), " ", 1).as("blk"))
    val joined = p.join(p.select(col("n").as("n2"), col("blk")), Seq("blk"))
      .limit(20000)
      .select(expr("jaro_winkler_gte(n, n2, 0.92)").as("g"),
        (expr("jaro_winkler(n, n2)") >= 0.92).as("want"))
      .where(col("g") =!= col("want"))
    assert(joined.count() === 0L)
  }

  test("hex_long ≡ conv(s,16,10) on md5 slices; edge semantics; codegen agrees with eval") {
    val sp = spark; import sp.implicits._
    // the exact production shape: 8- and 15-hex slices of md5 output
    val rows = (0 until 2000).map(i => s"boot|$i").toDF("s")
      .select(md5(col("s")).as("h"))
      .select(substring(col("h"), 1, 8).as("h8"), substring(col("h"), 1, 15).as("h15"))
    val diff = rows.select(
        expr("hex_long(h8)").as("a8"),
        conv(col("h8"), 16, 10).cast("long").as("c8"),
        expr("hex_long(h15)").as("a15"),
        conv(col("h15"), 16, 10).cast("long").as("c15"))
      .where(col("a8") =!= col("c8") || col("a15") =!= col("c15"))
    assert(diff.count() === 0L)
    // codegen path runs in the query above; pin the interpreted eval too
    val e = graft.functions.HexLong(
      org.apache.spark.sql.catalyst.expressions.Literal("00ff00ff"))
    assert(e.eval(null) === 0x00ff00ffL)
    assert(graft.functions.HexLong(
      org.apache.spark.sql.catalyst.expressions.Literal("ABCdef")).eval(null)
      === 0xabcdefL)
    // null for empty, non-hex, or overflow-length inputs
    Seq("", "xyz", "12g4", "0123456789abcdef").foreach { bad =>
      assert(graft.functions.HexLong(
        org.apache.spark.sql.catalyst.expressions.Literal(bad)).eval(null) === null,
        s"input '$bad'")
    }
  }

  test("jaro_winkler ASCII byte fast path ≡ char path; non-ASCII falls back; scratch grows") {
    import org.apache.spark.unsafe.types.UTF8String
    def sim(a: String, b: String): Double =
      graft.functions.JaroWinklerImpl.sim(
        UTF8String.fromString(a), UTF8String.fromString(b))
    // non-ASCII pairs route through the String kernel — prefix boost,
    // accents as distinct chars, and mixed ascii/non-ascii operands
    assert(sim("café", "cafe") === sim("cafX", "cafe"),
      "é must behave as one non-matching char, like any other")
    assert(sim("über", "über") === 1.0)
    assert(sim("naïve", "naive") > 0.8)
    // strings longer than the 64-slot initial scratch force a regrow,
    // and a SUBSEQUENT short pair must still be correct (stale flags
    // from the long call would corrupt the match arrays if ensure()
    // cleared the wrong range)
    val long1 = "x" * 100 + "abc"
    val long2 = "x" * 100 + "acb"
    val longSim = sim(long1, long2)
    assert(longSim > 0.9 && longSim < 1.0)
    assert(sim("MARTHA", "MARHTA") === 0.9611111111111111)
    // repeat in the same thread: scratch reuse must not leak state
    assert(sim("MARTHA", "MARHTA") === 0.9611111111111111)
    assert(sim("a", "a") === 1.0)
  }

  test("lgamma: exact at small integers, recurrence-stable, reflection below 0.5") {
    val lg = LogGammaImpl.lgamma _
    assert(math.abs(lg(1.0)) < 1e-13)
    assert(math.abs(lg(2.0)) < 1e-13)
    // lgamma(10) = ln(9!) = ln 362880
    assert(math.abs(lg(10.0) - math.log(362880.0)) < 1e-10)
    // lgamma(0.5) = ln sqrt(pi)
    assert(math.abs(lg(0.5) - 0.5 * math.log(math.Pi)) < 1e-12)
    // recurrence lgamma(x+1) - lgamma(x) = ln(x) across magnitudes —
    // at x=1e6 lgamma≈1.28e7, so 1 ulp is ~2e-9: ulp-level tolerance
    for (x <- Seq(3.7, 42.0, 1234.5, 1.0e6))
      assert(math.abs((lg(x + 1.0) - lg(x)) - math.log(x)) < 1e-8, s"x=$x")
    // reflection branch: Gamma(0.3) known to 1e-10
    assert(math.abs(lg(0.3) - math.log(2.991568987687590)) < 1e-10)
    assert(lg(0.0).isNaN && lg(-3.0).isNaN)
  }

  test("lgamma is SQL-callable and participates in whole-stage codegen") {
    val one = spark.sql("SELECT lgamma(10.0) AS v").collect().head.getDouble(0)
    assert(math.abs(one - math.log(362880.0)) < 1e-10)
    val e = Tables.embeddings(spark, sfDir)
    val plan = e.select(expr("lgamma(vec_id + 1)").as("v"))
      .queryExecution.executedPlan
    val codegenStages = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.exists(_.toString.contains("lgamma")),
      s"lgamma not inside codegen stage:\n$plan")
  }

  test("BottomKAgg: exact k-smallest set, partitioning-invariant, merge via heap") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(267)
    val rows = Seq.fill(5000)((rnd.nextLong(), rnd.nextDouble() * 1000))
    val want = rows.sortBy(identity).take(64).map(_._2).sorted
    for (parts <- Seq(1, 3, 17)) {
      val got = rows.toDF("hk", "v").repartition(parts)
        .agg(graft.functions.BottomKAgg.of(64)($"hk", $"v"))
        .collect().head.getSeq[Double](0)
      assert(got === want, s"parts=$parts")
    }
    // fewer rows than k: keeps everything
    val small = Seq((3L, 1.0), (1L, 9.0), (2L, 5.0))
    val all = small.toDF("hk", "v")
      .agg(graft.functions.BottomKAgg.of(64)($"hk", $"v"))
      .collect().head.getSeq[Double](0)
    assert(all === Seq(1.0, 5.0, 9.0))
    // hash ties break on value
    val ties = Seq((7L, 5.0), (7L, 1.0), (7L, 3.0))
    val two = ties.toDF("hk", "v")
      .agg(graft.functions.BottomKAgg.of(2)($"hk", $"v"))
      .collect().head.getSeq[Double](0)
    assert(two === Seq(1.0, 3.0))
  }

  test("multi_contains: hand cases, failure links, suffix outputs, early exit") {
    import graft.functions.MultiContains
    def run(s: String, pats: Seq[String]): Seq[Int] = {
      val e = MultiContains(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(s),
          org.apache.spark.sql.types.StringType), pats)
      e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toIntArray().toSeq
    }
    // nested patterns ending at the same position exercise the merged
    // suffix-output lists: "abcd" contains "abcd", "bc", "c", "bcd"
    assert(run("abcd", Seq("abcd", "bc", "c", "bcd", "xx")) === Seq(0, 1, 2, 3))
    // failure links: after matching prefix "ab" of "abx", the "bc"
    // match must still fire on "abc"
    assert(run("abc", Seq("abx", "bc")) === Seq(1))
    // overlap: occurrences may overlap arbitrarily
    assert(run("aaaa", Seq("aa", "aaa", "aaaa", "aaaaa")) === Seq(0, 1, 2))
    // duplicates of a pattern report once; absent patterns never
    assert(run("xyxyxy", Seq("xy", "yx", "zz")) === Seq(0, 1))
    // empty text matches nothing
    assert(run("", Seq("a")) === Seq())
    // unicode (code units, same as contains)
    assert(run("καλημέρα", Seq("λημ", "zzz", "ρα")) === Seq(0, 2))
    assert(intercept[IllegalArgumentException](
      run("x", Seq("ok", ""))).getMessage.contains("empty pattern"))
  }

  test("cdc_chunks: reconstruction, boundary rule, insertion-shift invariance") {
    import graft.functions.CdcChunks
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    def run(s: String, k: Int = 8, d: Long = 64L): Seq[String] =
      CdcChunks(Literal(UTF8String.fromString(s), StringType), k, d)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(StringType).map(_.toString).toSeq
    val rnd = new scala.util.Random(264)
    def rs(n: Int): String =
      Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    // chunks always concatenate back to the input; none empty
    for (_ <- 1 to 50) {
      val s = rs(rnd.nextInt(400))
      val cs = run(s)
      assert(cs.mkString === s)
      assert(cs.forall(_.nonEmpty))
    }
    // boundary rule replay: every cut position has a qualifying gram
    val s = rs(2000)
    val cs = run(s)
    var off = 0
    cs.init.foreach { c =>
      off += c.length
      val gram = s.substring(off - 8, off)
      val h = (0 until 8).map(j => gram.charAt(j).toLong *
        math.pow(31.0, j).toLong).sum
      assert(h % 64 === 0, s"cut at $off without a qualifying gram")
    }
    // THE CDC property: a prefix insertion leaves all chunks after the
    // first boundary identical (fixed-size blocks would all shift)
    val base = rs(1500)
    val shifted = "INSERTED-PREFIX-" + base
    val a = run(base).toSet
    val b = run(shifted).toSet
    val shared = a.intersect(b)
    assert(shared.size >= a.size - 2,
      s"insertion broke content alignment: ${shared.size} of ${a.size} chunks survive")
    // short strings: one whole chunk; empty: none
    assert(run("tiny") === Seq("tiny"))
    assert(run("") === Seq())
  }

  test("multi_contains ≡ per-pattern contains on random strings (property)") {
    val rnd = new scala.util.Random(263)
    val alphabet = "abcd"
    def rs(n: Int): String =
      Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    for (_ <- 1 to 200) {
      val text = rs(2 + rnd.nextInt(40))
      val pats = Seq.fill(1 + rnd.nextInt(8))(rs(1 + rnd.nextInt(5))).distinct
      val e = graft.functions.MultiContains(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(text),
          org.apache.spark.sql.types.StringType), pats)
      val got = e.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toIntArray().toSeq
      val want = pats.indices.filter(i => text.contains(pats(i)))
      assert(got === want, s"text=$text pats=$pats")
    }
  }

  test("multi_contains is SQL-callable; null text → null; q263 shape") {
    val out = spark.sql(
      "SELECT multi_contains('big table scan', 'table', 'scan slow', 'big table') AS h")
      .collect().head.getSeq[Int](0)
    assert(out === Seq(0, 2))
    val nul = spark.sql(
      "SELECT multi_contains(CAST(NULL AS STRING), 'x') AS h").collect().head
    assert(nul.isNullAt(0))
    // the q263 projection runs end-to-end on the fixture
    val q = graft.operators.TextAnalysis.q263Blocklist(spark, sfDir)
    val rows = q.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mask = r.getAs[Long]("hit_mask")
      assert(java.lang.Long.bitCount(mask) === r.getAs[Int]("n_hits"))
    }
  }

  test("band_hashes is bit-identical to the hash(slice(...)) HOF formulation") {
    // random signatures of several lengths, including SHORT arrays
    // whose tail slices truncate (empty slice must hash to the bare
    // seed, matching hash(slice(...)) of an empty array)
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map { i =>
      val n = Seq(128, 128, 128, 7, 0, 3)(i % 6)
      (i.toLong, Seq.fill(n)(rnd.nextLong()))
    }
    val df = spark.createDataFrame(rows).toDF("id", "sig")
    for ((bands, r) <- Seq((32, 4), (16, 8), (8, 1))) {
      val both = df.select(
        expr(s"band_hashes(sig, $bands, $r)").as("native"),
        transform(sequence(lit(0), lit(bands - 1)),
          j => hash(slice(col("sig"), j * r + 1, lit(r)))).as("hof"))
      both.collect().foreach { row =>
        assert(row.getSeq[Int](0) === row.getSeq[Int](1),
          s"mismatch at bands=$bands r=$r")
      }
    }
    // null signature stays null
    val nul = spark.sql(
      "SELECT band_hashes(CAST(NULL AS ARRAY<BIGINT>), 4, 2) AS h")
      .collect().head
    assert(nul.isNullAt(0))
  }

  test("band_hashes skips null ELEMENTS exactly like hash(slice(...))") {
    // Murmur3Hash passes the chain value through unchanged on a null
    // array element; the signature pipelines never produce one, but the
    // function is registered session-wide for SQL, so the semantics
    // must match (the r13 advice item: folding garbage instead of
    // skipping would silently break the bit-equality contract)
    val both = spark.sql(
      """SELECT array(1L, CAST(NULL AS BIGINT), NULL, NULL, 5L, 6L) AS sig""")
      .select(
        expr("band_hashes(sig, 3, 2)").as("native"),
        transform(sequence(lit(0), lit(2)),
          j => hash(slice(col("sig"), j * 2 + 1, lit(2)))).as("hof"))
      .collect().head
    assert(both.getSeq[Int](0) === both.getSeq[Int](1))
    // an all-null band must equal hash(array(NULL, NULL)) = bare seed
    val bare = spark.sql(
      "SELECT hash(array(CAST(NULL AS BIGINT), CAST(NULL AS BIGINT))) AS h")
      .collect().head.getInt(0)
    assert(both.getSeq[Int](0)(1) === bare)
  }
}
