package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Text-analysis operators for a training-data pipeline (E15): token
  * counting, quality scoring, language distribution, fingerprinting,
  * term frequencies. Everything is per-row expressions + hash aggregates
  * — embarrassingly parallel, no driver-side loops, so a 100 TB corpus
  * maps to a plain scan→project→partial-agg pipeline.
  *
  * All declared variants are DuckDB-oracle-checked, so only functions
  * with identical cross-engine semantics are used (split on a literal,
  * md5, simple double arithmetic).
  */
object TextAnalysis {

  /** Stopword list used for quality ratios (tiny, engine-side constant;
    * in production this would be a broadcast set per language).
    */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  private def tokens(c: Column): Column = split(c, " ")

  /** BPE-ish tokenizer regex: letter runs, digit runs, or single
    * non-space symbols — identical semantics in Java and RE2 dialects.
    */
  val TokenRegex = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  /** Per-document token statistics + exact md5 fingerprint. Counts both
    * whitespace tokens and regex (BPE-ish) tokens.
    */
  def q28TextStats(spark: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    Tables.documents(spark, d).select(
      col("doc_id"),
      col("lang"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_uniq_tokens"),
      size(regexp_extract_all(col("text"), lit(TokenRegex), lit(0)))
        .as("n_regex_tokens"),
      (length(col("text")).cast(DoubleType) / size(toks)).as("chars_per_token"),
      array_contains(toks, "spark").as("mentions_spark"),
      md5(col("text")).as("fingerprint"))
  }

  val q28Sql: String =
    s"""SELECT doc_id, lang,
      | CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
      | CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq_tokens,
      | CAST(len(regexp_extract_all(text, '$TokenRegex')) AS INT) AS n_regex_tokens,
      | CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) AS chars_per_token,
      | list_contains(string_split(text, ' '), 'spark') AS mentions_spark,
      | md5(text) AS fingerprint
      |FROM documents""".stripMargin

  /** TF-IDF scores: for each (document, token), tf · ln(N / df) with
    * raw term counts — two hash aggregates (per-doc term counts, global
    * document frequencies) and one broadcastable join on token. Output
    * limited to scores ≥ 0.5 to keep the relation small. At 100 TB the
    * shape is identical; df is a tiny side table (vocabulary-sized)
    * that broadcasts.
    */
  def q48Tfidf(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    // corpus size as a broadcast 1-row aggregate, not a driver action:
    // at 100 TB a separate .count() would be one extra full pass
    val nDf = docs.agg(count(lit(1)).cast(DoubleType).as("__n"))
    val terms = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val tf = terms.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df_ = terms.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df_), Seq("token"))
      .crossJoin(broadcast(nDf))
      .select(col("doc_id"), col("token"),
        (col("tf").cast(DoubleType) * log(col("__n") / col("df")))
          .as("tfidf"))
      .where(col("tfidf") >= 0.5)
  }

  val q48Sql: String =
    """WITH terms AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM terms GROUP BY 1, 2),
      |df AS (SELECT token, count(*) AS df FROM
      |  (SELECT DISTINCT doc_id, token FROM terms) GROUP BY 1),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
      |SELECT doc_id, tf.token AS token,
      |  CAST(tf AS DOUBLE) * ln(n.n / df.df) AS tfidf
      |FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
      |WHERE CAST(tf AS DOUBLE) * ln(n.n / df.df) >= 0.5""".stripMargin

  /** Winnowing document fingerprints (Schleimer et al.'s local
    * algorithm): roll a hash over character k-grams, take the minimum
    * hash of every `window`-length window (rightmost minimum), and keep
    * the distinct minima — a position-robust fingerprint set used for
    * plagiarism/copy detection. Guarantee: any shared substring of
    * length ≥ window+k−1 contributes at least one common fingerprint.
    *
    * Pure per-row expressions: k-gram hashes via xxhash64 substrings
    * (or, with `portableHash`, a base-31 polynomial over code points
    * that any engine reproduces exactly — the declared q46 uses it so
    * the DuckDB oracle can recompute the fingerprints), window minima
    * via a transform over positions — no shuffle at all. Winnowing only
    * needs hash *determinism*, not distribution, so the polynomial is a
    * valid fingerprint family.
    */
  def winnowFingerprints(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      window: Int = 6,
      portableHash: Boolean = false): DataFrame = {
    // portable path: ONE native per-row loop (graft.functions.WinnowHash,
    // semantics pinned to the SQL formulation below — see
    // `hofWinnowFingerprints`, kept as the parity reference). The HOF
    // chain evaluated ~23M interpreted lambda elements at sf0.1 (~12 s);
    // the fused loop is milliseconds — the q76 lesson at its extreme.
    if (portableHash)
      docs.select(col(idCol),
        graft.functions.GraftFunctions
          .winnowHash(col(textCol), k, window).as("fingerprints"))
        .withColumn("n_fingerprints", size(col("fingerprints")))
    else
      hofWinnowFingerprints(docs, idCol, textCol, k, window, portableHash)
  }

  /** The original SQL higher-order-function formulation — the portable
    * variant is the semantic REFERENCE the native [[winnowFingerprints]]
    * path is spec-pinned against (TextOpsSpec), and the xxhash64
    * variant remains the production path for callers that don't need
    * cross-engine reproducibility.
    */
  private[operators] def hofWinnowFingerprints(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      window: Int,
      portableHash: Boolean): DataFrame = {
    val gramHash =
      if (portableHash)
        (0 until k).map(j =>
          s"CAST(ascii(substring(__t, i + $j, 1)) AS BIGINT) * ${pow31(j)}")
          .mkString(" + ")
      else s"xxhash64(substring(__t, i, $k))"
    docs
      .withColumn("__t", lower(col(textCol)))
      // LAZY checkpoint: __t must reach the per-position lambdas as a
      // materialized COLUMN — CollapseProject deems lower() cheap and
      // would otherwise inline it into every per-element evaluation,
      // making the pass O(len³)-interpreted.
      .localCheckpoint(false)
      .withColumn("__hashes", expr(
        s"transform(sequence(1, greatest(length(__t) - ${k - 1}, 1)), " +
          s"i -> $gramHash)"))
      .withColumn("__mins", expr(
        s"array_distinct(transform(sequence(1, greatest(size(__hashes) - ${window - 1}, 1)), " +
          s"i -> array_min(slice(__hashes, i, $window))))"))
      .select(col(idCol), col("__mins").as("fingerprints"),
        size(col("__mins")).as("n_fingerprints"))
  }

  private def pow31(j: Int): Long = (0 until j).foldLeft(1L)((a, _) => a * 31L)

  /** Declared q46: portable-hash winnowing, projected to exactly
    * recomputable scalars (count + min/max fingerprint).
    */
  def q46WinnowFingerprints(spark: SparkSession, d: String): DataFrame =
    winnowFingerprints(Tables.documents(spark, d), "doc_id", "text",
      portableHash = true)
      .select(col("doc_id"), col("n_fingerprints"),
        array_min(col("fingerprints")).as("fp_min"),
        array_max(col("fingerprints")).as("fp_max"))

  /** Oracle for q46: full SQL recomputation of the winnowing pipeline —
    * base-31 polynomial 8-gram hashes, 6-windows (end-inclusive slices),
    * rightmost-robust distinct minima.
    */
  val q46Sql: String = {
    val poly = (0 until 8).map(j =>
      s"CAST(ascii(substring(p, CAST(i + $j AS INT), 1)) AS BIGINT) * ${pow31(j)}")
      .mkString(" + ")
    s"""WITH g AS (
       | SELECT doc_id, list_transform(range(1, greatest(length(p) - 7, 1) + 1),
       |   i -> $poly) AS hs
       | FROM (SELECT doc_id, lower(text) AS p FROM documents)),
       |m AS (
       | SELECT doc_id, list_distinct(list_transform(
       |   range(1, greatest(len(hs) - 5, 1) + 1),
       |   i -> list_min(array_slice(hs, i, i + 5)))) AS mins
       | FROM g)
       |SELECT doc_id, CAST(len(mins) AS INT) AS n_fingerprints,
       | list_min(mins) AS fp_min, list_max(mins) AS fp_max
       |FROM m""".stripMargin
  }

  /** Gopher-style per-document quality filter (declared q50): length,
    * type-token ratio, stopword density, and most-frequent-token
    * repetition, folded into a keep/drop decision with a reasons
    * string — the gate a training-data pipeline applies before dedup.
    * Every metric is exact-integer aggregation + one division, so the
    * whole row (booleans included) is hash-checked against the DuckDB
    * oracle. Shape at scale: one narrow pass for the array metrics, one
    * explode + two hash aggregates for the repetition metric, one join
    * on doc_id.
    */
  def q50QualityFilter(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val toks = tokens(col("text"))
    val stopArr = array(Stopwords.map(lit): _*)
    val base = docs.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      (size(array_distinct(toks)).cast(DoubleType) / size(toks)).as("ttr"),
      (size(filter(toks, t => array_contains(stopArr, t))).cast(DoubleType) /
        size(toks)).as("stop_frac"))
    val rep = docs.select(col("doc_id"), explode(toks).as("tk"))
      .groupBy(col("doc_id"), col("tk")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg((max(col("cnt")).cast(DoubleType) / sum(col("cnt"))).as("max_tok_frac"))
    base.join(rep, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("ttr"), col("stop_frac"),
        col("max_tok_frac"),
        (col("n_tokens") >= 20 && col("ttr") >= 0.35 &&
          col("stop_frac") <= 0.5 && col("max_tok_frac") <= 0.2).as("keep"),
        concat_ws(",",
          when(col("n_tokens") < 20, lit("too_short")),
          when(col("ttr") < 0.35, lit("low_ttr")),
          when(col("stop_frac") > 0.5, lit("stopword_heavy")),
          when(col("max_tok_frac") > 0.2, lit("repetitive"))).as("fail_reasons"))
  }

  val q50Sql: String = {
    val stopList = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |b AS (SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
       |  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
       |  CAST(len(list_filter(toks, tk -> list_contains([$stopList], tk))) AS DOUBLE)
       |    / len(toks) AS stop_frac
       | FROM t),
       |tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
       |c AS (SELECT doc_id, tk, count(*) AS cnt FROM tok GROUP BY 1, 2),
       |m AS (SELECT doc_id, CAST(max(cnt) AS DOUBLE) / sum(cnt) AS max_tok_frac
       |      FROM c GROUP BY 1)
       |SELECT b.doc_id, n_tokens, ttr, stop_frac, max_tok_frac,
       | (n_tokens >= 20 AND ttr >= 0.35 AND stop_frac <= 0.5
       |   AND max_tok_frac <= 0.2) AS keep,
       | concat_ws(',',
       |   CASE WHEN n_tokens < 20 THEN 'too_short' END,
       |   CASE WHEN ttr < 0.35 THEN 'low_ttr' END,
       |   CASE WHEN stop_frac > 0.5 THEN 'stopword_heavy' END,
       |   CASE WHEN max_tok_frac > 0.2 THEN 'repetitive' END) AS fail_reasons
       |FROM b JOIN m USING (doc_id)""".stripMargin
  }

  /** Declared q52 — the end-to-end training-data corpus pipeline,
    * composed from the engine's own stages: quality-filter
    * ([[q50QualityFilter]] keep rule) → exact dedup (token-set md5
    * fingerprint, keep lowest doc_id — [[Dedup.q30ExactDedup]]'s rule)
    * → per-language corpus summary. One declared query proves the
    * stages compose without driver round-trips: filter is a narrow
    * pass, dedup one shuffle, the summary one aggregate — the whole
    * pipeline is three exchanges at any scale.
    */
  def q52CorpusPipeline(spark: SparkSession, d: String): DataFrame = {
    val quality = q50QualityFilter(spark, d).where(col("keep"))
      .select(col("doc_id"), col("n_tokens"))
    val docs = Tables.documents(spark, d)
      .join(quality, Seq("doc_id"))
    val toks = tokens(col("text"))
    val deduped = docs
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        md5(concat_ws(" ", array_sort(array_distinct(toks)))).as("__fp"))
      .groupBy(col("__fp"))
      .agg(min_by(struct(col("doc_id"), col("lang"), col("n_tokens")), col("doc_id"))
        .as("__keep"))
      .select(col("__keep.doc_id"), col("__keep.lang"), col("__keep.n_tokens"))
    deduped.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast(LongType)).as("total_tokens"),
        min(col("doc_id")).as("first_doc_id"))
  }

  val q52Sql: String = {
    val stopList = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
       |b AS (SELECT doc_id, lang, toks, CAST(len(toks) AS INT) AS n_tokens,
       |  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
       |  CAST(len(list_filter(toks, tk -> list_contains([$stopList], tk))) AS DOUBLE)
       |    / len(toks) AS stop_frac
       | FROM t),
       |tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
       |c AS (SELECT doc_id, tk, count(*) AS cnt FROM tok GROUP BY 1, 2),
       |m AS (SELECT doc_id, CAST(max(cnt) AS DOUBLE) / sum(cnt) AS max_tok_frac
       |      FROM c GROUP BY 1),
       |kept AS (
       | SELECT b.doc_id, lang, toks, n_tokens FROM b JOIN m USING (doc_id)
       | WHERE n_tokens >= 20 AND ttr >= 0.35 AND stop_frac <= 0.5
       |   AND max_tok_frac <= 0.2),
       |fp AS (SELECT doc_id, lang, n_tokens,
       |  md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS f
       | FROM kept),
       |dedup AS (
       | SELECT f, min(doc_id) AS doc_id FROM fp GROUP BY f),
       |final AS (SELECT fp.doc_id, fp.lang, fp.n_tokens
       |  FROM fp JOIN dedup ON fp.doc_id = dedup.doc_id AND fp.f = dedup.f)
       |SELECT lang, count(*) AS n_docs,
       | CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       | min(doc_id) AS first_doc_id
       |FROM final GROUP BY lang""".stripMargin
  }

  /** Per-language corpus quality profile: doc counts, length stats,
    * stopword ratio, vocabulary richness. One shuffle on `lang`.
    */
  def q29LangQuality(spark: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    val stopArr = array(Stopwords.map(lit): _*)
    Tables.documents(spark, d)
      .select(
        col("lang"),
        col("n_chars"),
        size(toks).as("n_toks"),
        size(array_intersect(array_distinct(toks), stopArr)).as("n_stop_kinds"),
        (size(array_distinct(toks)).cast(DoubleType) / size(toks)).as("ttr"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        avg(col("n_chars").cast(DoubleType)).as("avg_chars"),
        avg(col("n_toks").cast(DoubleType)).as("avg_tokens"),
        avg(col("n_stop_kinds").cast(DoubleType)).as("avg_stop_kinds"),
        avg(col("ttr")).as("avg_ttr"))
  }

  val q29Sql: String =
    s"""SELECT lang, count(*) AS n_docs,
      | avg(CAST(n_chars AS DOUBLE)) AS avg_chars,
      | avg(CAST(len(string_split(text, ' ')) AS DOUBLE)) AS avg_tokens,
      | avg(CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
      |   [${TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")}])) AS DOUBLE)) AS avg_stop_kinds,
      | avg(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |   / len(string_split(text, ' '))) AS avg_ttr
      |FROM documents GROUP BY lang""".stripMargin

  /** Declared q54: exact heavy hitters gated on the `freqItems` sketch.
    * The single-pass sketch guarantees a SUPERSET of all items above
    * the support fraction (false positives possible, false negatives
    * impossible), so `found_by_sketch` is deterministically true for
    * every exact heavy hitter even though the sketch itself may vary —
    * a sketch regression (missed heavy hitter) flips a boolean and the
    * driver's compare goes red. The sketch result is vocabulary-bounded
    * driver metadata, like any broadcast side.
    */
  def q54HeavyHitters(spark: SparkSession, d: String): DataFrame = {
    val support = 0.003
    val tok = Tables.documents(spark, d)
      .select(explode(tokens(col("text"))).as("tk"))
    val sketch: Seq[String] = tok.stat.freqItems(Array("tk"), support)
      .head().getSeq[Any](0).map(String.valueOf)
    val tot = tok.agg(count(lit(1)).cast(DoubleType).as("__n"))
    tok.groupBy(col("tk")).agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(tot))
      .where(col("freq") > col("__n") * support)
      .select(col("tk").as("token"), col("freq"),
        col("tk").isin(sketch: _*).as("found_by_sketch"))
  }

  val q54Sql: String =
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tk FROM documents),
      |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tok),
      |c AS (SELECT tk, count(*) AS freq FROM tok GROUP BY 1)
      |SELECT tk AS token, freq, true AS found_by_sketch
      |FROM c, tot WHERE freq > n * 0.003""".stripMargin

  /** Global term frequencies via explode (generator surface, E11/E15):
    * one wide shuffle on token — the classic word count, which at 100 TB
    * is partial-agg'd map-side before the exchange.
    */
  def q31TokenFreq(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
      .where(col("freq") >= 10)

  val q31Sql: String =
    """SELECT token, count(*) AS freq
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |GROUP BY token HAVING count(*) >= 10""".stripMargin

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1 — the
    * "repetitious text" filters): fraction of all bigram occurrences
    * taken by the single most frequent bigram, and fraction of trigram
    * occurrences whose trigram occurs more than once. Heavily repeated
    * boilerplate (nav bars, spam keyword stuffing) scores high on both;
    * natural prose stays low.
    *
    * One explode over a combined (n, gram) array → one hash-aggregate
    * chain — a single shuffle regardless of how many n-gram orders are
    * requested, embarrassingly parallel at corpus scale.
    */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // n-gram construction deliberately avoids higher-order lambdas
    // (transform/aggregate evaluate INTERPRETED per element — measured 4×
    // slower here): posexplode is a codegen generator, lead() a plain
    // window over the doc partition, so the whole build stays in
    // whole-stage codegen. One shuffle on doc id covers the window AND
    // pre-partitions the per-(doc, gram) counting that follows.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__id")).orderBy(col("__pos"))
    val seqd = docs.select(col(idCol).as("__id"),
      posexplode(tokens(col(textCol))).as(Seq("__pos", "tok")))
      .select(col("__id"), col("tok"),
        lead(col("tok"), 1).over(w).as("__t1"),
        lead(col("tok"), 2).over(w).as("__t2"))
    val grams = seqd.select(col("__id"), explode(array(
      when(col("__t1").isNotNull,
        struct(lit(2).as("n"), concat_ws(" ", col("tok"), col("__t1")).as("g"))),
      when(col("__t2").isNotNull,
        struct(lit(3).as("n"),
          concat_ws(" ", col("tok"), col("__t1"), col("__t2")).as("g")))))
      .as("x"))
      .where(col("x").isNotNull)
      .select(col("__id"), col("x.n").as("n"), col("x.g").as("g"))
    val counts = grams.groupBy(col("__id"), col("n"), col("g"))
      .agg(count(lit(1)).as("c"))
    val per = counts.groupBy(col("__id"), col("n")).agg(
      (max(col("c")).cast(DoubleType) / sum(col("c"))).as("top_frac"),
      (sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).cast(DoubleType) /
        sum(col("c"))).as("dup_frac"))
    per.groupBy(col("__id")).agg(
      max(when(col("n") === 2, col("top_frac"))).as("top_bigram_frac"),
      max(when(col("n") === 3, col("dup_frac"))).as("dup_trigram_frac"))
      .select(col("__id").as(idCol), col("top_bigram_frac"), col("dup_trigram_frac"),
        (col("top_bigram_frac") <= 0.2 && col("dup_trigram_frac") <= 0.3).as("keep"))
  }

  /** Unigram language-model scoring — the CCNet-style perplexity proxy
    * for quality filtering, with the corpus itself as the model: every
    * document is scored by the mean natural-log probability of its
    * tokens under the corpus-wide unigram distribution. Low scores =
    * rare-token-heavy docs (gibberish, encoding damage); suspiciously
    * high scores = boilerplate. A real pipeline trains the model on a
    * trusted reference corpus and scores candidates — the operator takes
    * them as two arguments for exactly that; the declared query uses the
    * self-scoring special case so the oracle can replicate it from one
    * table.
    *
    * Shape: one explode → one token-count aggregate (map-side combined)
    * → broadcast-join of the counts back onto the occurrences → one
    * per-doc mean. The model side is vocabulary-bounded, so the join
    * side that grows with the corpus never re-shuffles twice.
    */
  def unigramLogProb(
      model: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val occ = docs.select(col(idCol).as("__id"),
      explode(tokens(col(textCol))).as("tok"))
    // Two corpus passes are INHERENT here (counts must complete before
    // scoring, and the vocab-bounded count side broadcasts — there is no
    // common exchange for Spark to reuse, unlike q45's shared-aggregate
    // case). In self-scoring mode the branches at least share the
    // occurrence relation, keeping the plans' scan sides identical.
    val counts = (if (model eq docs) occ
                  else model.select(explode(tokens(col(textCol))).as("tok")))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    occ.join(counts, Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy(col("__id"))
      .agg(
        count(lit(1)).cast(IntegerType).as("n_tokens"),
        avg(log(col("cnt").cast(DoubleType) / col("total").cast(DoubleType)))
          .as("avg_logprob"))
      .select(col("__id").as(idCol), col("n_tokens"), col("avg_logprob"))
  }

  /** Declared q64 — self-scored unigram log-probs on the fixture. */
  def q64UnigramLogProb(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    unigramLogProb(docs, docs, "doc_id", "text")
  }

  val q64Sql: String =
    """WITH occ AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |c AS (SELECT tok, count(*) AS cnt FROM occ GROUP BY tok),
      |t AS (SELECT sum(cnt) AS total FROM c)
      |SELECT occ.doc_id,
      |  CAST(count(*) AS INT) AS n_tokens,
      |  avg(ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))) AS avg_logprob
      |FROM occ JOIN c USING (tok) CROSS JOIN t
      |GROUP BY occ.doc_id""".stripMargin

  /** Add-1-smoothed bigram LM scoring — one Markov order past
    * [[unigramLogProb]], and a long step toward the n-gram-LM
    * (CCNet/KenLM) perplexity filter real pipelines run: a document of
    * individually common tokens in nonsense ORDER scores fine under a
    * unigram model and terribly here. Smoothing uses add-1 over the
    * context-token vocabulary, so unseen transitions are finite-scored:
    * P(b|a) = (c(a,b) + 1) / (c(a) + V).
    *
    * Shape at scale: ONE bigram explode feeds everything — transition
    * counts, context totals (derived from the transition counts, no
    * second pass), and V (a broadcast one-row aggregate) — then one
    * bigram-keyed hash join scores the occurrences and one per-doc
    * mean reduces. Explicit non-null filters on the join keys keep the
    * exploded subtree identical across its consumers (the q84 reuse
    * lesson).
    */
  def bigramLogProb(
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    // zip_with over two slices, NOT transform(i -> element_at(toks, i)):
    // a lambda that indexes `toks` would get the split() inlined into the
    // per-element body (the q65/q76 CollapseProject trap) and re-tokenize
    // the document once per bigram — O(len²) per row, measured 4.3 s vs
    // 0.6 s at sf0.1. zip_with's array arguments evaluate once per ROW.
    val bg = docs
      .where(size(toks) >= 2)
      .select(col(idCol).as("__id"),
        explode(zip_with(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("__bg"))
      .select(col("__id"), col("__bg.a").as("a"), col("__bg.b").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
    val bc = bg.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
    val cc = bc.groupBy(col("a")).agg(sum(col("c_ab")).as("c_a"))
    val v = bc.agg(countDistinct(col("a")).as("v"))
    bg.join(bc, Seq("a", "b"))
      .join(cc, Seq("a"))
      .crossJoin(broadcast(v))
      .groupBy(col("__id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        avg(log((col("c_ab") + 1).cast(DoubleType) /
          (col("c_a") + col("v")).cast(DoubleType))).as("mean_logprob"))
      .select(col("__id").as(idCol), col("n_bigrams"), col("mean_logprob"))
  }

  /** Declared q90 — self-scored smoothed bigram log-probs. */
  def q90BigramLogProb(spark: SparkSession, d: String): DataFrame =
    bigramLogProb(Tables.documents(spark, d), "doc_id", "text")

  val q90Sql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |bg AS (
      |  SELECT doc_id, toks[x.i] AS a, toks[x.i + 1] AS b
      |  FROM t, LATERAL (
      |    SELECT unnest(generate_series(1, len(toks) - 1)) AS i) AS x
      |  WHERE len(toks) >= 2),
      |bc AS (SELECT a, b, count(*) AS c_ab FROM bg GROUP BY 1, 2),
      |cc AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM bc GROUP BY 1),
      |v AS (SELECT count(DISTINCT a) AS v FROM bc)
      |SELECT bg.doc_id, count(*) AS n_bigrams,
      |  avg(ln((c_ab + 1) / CAST(c_a + v.v AS DOUBLE))) AS mean_logprob
      |FROM bg JOIN bc USING (a, b) JOIN cc USING (a) CROSS JOIN v
      |GROUP BY bg.doc_id""".stripMargin

  /** Declared q61 — [[repetitionSignals]] over the documents fixture. */
  def q61Repetition(spark: SparkSession, d: String): DataFrame =
    repetitionSignals(Tables.documents(spark, d), "doc_id", "text")

  val q61Sql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |g AS (
      |  SELECT doc_id, 2 AS n,
      |    unnest(list_transform(generate_series(1, len(toks) - 1),
      |      i -> toks[i] || ' ' || toks[i + 1])) AS g
      |  FROM t
      |  UNION ALL
      |  SELECT doc_id, 3 AS n,
      |    unnest(list_transform(generate_series(1, len(toks) - 2),
      |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS g
      |  FROM t),
      |c AS (SELECT doc_id, n, g, count(*) AS c FROM g GROUP BY 1, 2, 3),
      |p AS (SELECT doc_id, n,
      |        CAST(max(c) AS DOUBLE) / sum(c) AS top_frac,
      |        CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / sum(c)
      |          AS dup_frac
      |      FROM c GROUP BY 1, 2)
      |SELECT doc_id,
      |  max(CASE WHEN n = 2 THEN top_frac END) AS top_bigram_frac,
      |  max(CASE WHEN n = 3 THEN dup_frac END) AS dup_trigram_frac,
      |  (max(CASE WHEN n = 2 THEN top_frac END) <= 0.2
      |    AND max(CASE WHEN n = 3 THEN dup_frac END) <= 0.3) AS keep
      |FROM p GROUP BY 1""".stripMargin

  /** Positioned n-grams: element k of the result is the n-gram starting
    * at token k (same slice/zip_with build as [[Dedup.shingles]] — each
    * argument evaluated once, no interpreted higher-order lambda).
    */
  private def posNgrams(toks: Column, n: Int): Column = {
    val m = greatest(size(toks) - (n - 1), lit(0))
    (2 to n).foldLeft(slice(toks, lit(1), m)) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k), m), (a, b) => concat(a, lit(" "), b))
    }
  }

  /** Cross-document repeated-span removal (the C4/RefinedWeb
    * boilerplate rule, token-level): drop every token covered by an
    * `n`-gram that occurs in ≥ `minDocs` DISTINCT documents. Shared
    * spans — navigation chrome, license blurbs, templated text — vanish
    * from every document at once; unique content is untouched.
    *
    * Scale shape: positioned n-grams are a per-row projection
    * (posexplode), the document-frequency aggregate is one hash
    * shuffle, and the common-gram set (repeated across ≥ minDocs docs)
    * is orders of magnitude smaller than the corpus — AQE broadcasts
    * it back onto the gram stream. Matched gram starts collapse to one
    * per-document array (the only other shuffle, sized by boilerplate
    * HITS, not tokens), and the cleaned text is rebuilt map-side from
    * the tokens array by walking the gaps between sorted covered
    * positions (linear in doc length even at ~100% coverage); nothing
    * is quadratic and nothing driver-side.
    *
    * @return (idCol, clean_text, n_removed) — one row per input doc
    */
  def stripCommonNgrams(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      minDocs: Int = 2): DataFrame = {
    val base = docs.select(col(idCol).as("__id"), tokens(col(textCol)).as("toks"))
    // grams are JOIN KEYS only (reassembly reads tokens, never gram
    // text), so they shuffle as xxhash64 longs — the df aggregate and
    // the coverage join move 8 bytes per gram instead of ~40-byte
    // strings (this aggregate is the operator's dominant exchange)
    val grams = base.select(col("__id"),
      posexplode(posNgrams(col("toks"), n)).as(Seq("gpos", "gram")))
      .select(col("__id"), col("gpos"), xxhash64(col("gram")).as("gram"))
    val common = grams.groupBy(col("gram"))
      .agg(countDistinct(col("__id")).as("df"))
      .where(col("df") >= minDocs)
      .select(col("gram"))
    // Common-gram START positions collapse to one per-document array
    // (bounded by the doc's own token count), and the text is rebuilt
    // MAP-SIDE from the tokens array with an index-aware filter. The
    // former shape shuffled THREE token-level relations (exploded
    // coverage positions → distinct, re-exploded tokens → anti-join,
    // then a collect_list re-assembly); this shuffles only the
    // common-gram HITS (tiny after the df gate) plus one |docs|-sized
    // join — at 100 TB the shuffled bytes drop from O(total tokens) to
    // O(boilerplate hits). Measured 2.4 → ~1.1 s suite-context sf0.1.
    val starts = grams.join(common, Seq("gram"))
      .groupBy(col("__id"))
      .agg(collect_set(col("gpos")).as("__starts"))
    // Rebuild is LINEAR in doc length: the covered set (sorted distinct
    // positions) partitions [0, len) into gaps, and the kept positions
    // are exactly those gaps — one zip_with over (sentinel-padded)
    // boundary pairs, one O(1) element_at per kept token. The previous
    // shape tested every token with array_contains(__covered, i), an
    // O(tokens × covered) scan that went quadratic for boilerplate-
    // dense long docs (round-11 advisor). NOTE sequence(a, b) with
    // a > b generates a DESCENDING range, so empty gaps need the
    // explicit b-1 >= a+1 guard.
    base.join(starts, Seq("__id"), "left")
      .select(col("__id"), col("toks"),
        array_sort(array_distinct(flatten(transform(
          coalesce(col("__starts"), array().cast("array<int>")),
          s => sequence(s, s + (n - 1)))))).as("__covered"))
      .select(col("__id").as(idCol),
        concat_ws(" ", transform(
          flatten(zip_with(
            concat(array(lit(-1)), col("__covered")),
            concat(col("__covered"), array(size(col("toks")))),
            (a, b) => when(b - 1 >= a + 1, sequence(a + 1, b - 1))
              .otherwise(array().cast("array<int>")))),
          p => element_at(col("toks"), p + 1)))
          .as("clean_text"),
        // covered ⊆ [0, size(toks)) by construction (gram starts come
        // from posNgrams' size-(n-1) slice), so the count IS the size
        size(col("__covered")).cast(LongType).as("n_removed"))
  }

  /** Feature-hashing TF vectorizer (the "hashing trick"): token →
    * md5-derived bucket in [0, dim), per-document bucket counts,
    * L2-normalized dense vector. Turns raw text into cosine-comparable
    * vectors with NO trained model and NO vocabulary state — the
    * embedding-free on-ramp to [[Similarity]] / [[NearDup]] /
    * [[Components]]. md5 (not xxhash64) keeps the bucket assignment
    * engine-portable, so the whole vector is oracle-checkable.
    *
    * Scale shape: explode → one (doc, bucket) hash aggregate →
    * per-doc map assembly; vector width is a constant `dim`, so state
    * per document is bounded and nothing is driver-side.
    */
  def hashingTfVectors(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int = 64): DataFrame = {
    val bucket = pmod(
      graft.functions.GraftFunctions.hexLong(substring(md5(col("__t")), 1, 8)),
      lit(dim.toLong)).cast(IntegerType)
    val counts = docs
      .select(col(idCol).as("__id"), explode(tokens(col(textCol))).as("__t"))
      .groupBy(col("__id"), bucket.as("bucket"))
      .agg(count(lit(1)).as("c"))
    val withMap = counts.groupBy(col("__id"))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("c")))).as("m"))
    val dense = transform(sequence(lit(0), lit(dim - 1)),
      i => coalesce(element_at(col("m"), i), lit(0L)).cast(DoubleType))
    // normalization via aggregate's FINISH lambda: the sum-of-squares
    // lands in a lambda variable, so the per-element division reads a
    // bound value. A separate `__norm` column would be inlined into the
    // transform lambda by CollapseProject and the O(dim) norm fold
    // would re-run PER ELEMENT — O(dim²) per row, the difference
    // between 0.2 s and 1.6 s at sf0.1.
    withMap
      .withColumn("__dense", dense)
      .select(col("__id").as(idCol),
        aggregate(col("__dense"), lit(0.0), (acc, x) => acc + x * x,
          acc => transform(col("__dense"), x => x / sqrt(acc))).as("vec"))
  }

  /** Row-per-component twin of [[hashingTfVectors]]: the same
    * L2-normalized hashed-TF values as (idCol, i, component) rows,
    * computed WITHOUT ever assembling the array — (doc, bucket) counts,
    * a per-doc norm, and a dense 64-slot frame joined back. Everything
    * stays inside whole-stage codegen (no higher-order-function
    * lambdas, no ObjectHashAggregate map assembly), which measures
    * 6–7x faster than `posexplode(hashingTfVectors(...).vec)` at
    * sf0.1; use the array form only when downstream genuinely wants a
    * vector column (q77's cosine top-k).
    */
  def hashedTfComponents(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int = 64): DataFrame = {
    val bucket = pmod(
      graft.functions.GraftFunctions.hexLong(substring(md5(col("__t")), 1, 8)),
      lit(dim.toLong)).cast(IntegerType)
    val counts = docs
      .select(col(idCol).as("__id"), explode(tokens(col(textCol))).as("__t"))
      .groupBy(col("__id"), bucket.as("i"))
      .agg(count(lit(1)).cast(DoubleType).as("__c"))
    val norms = counts.groupBy(col("__id"))
      .agg(sqrt(sum(col("__c") * col("__c"))).as("__n"))
    norms
      .select(col("__id"), col("__n"),
        explode(sequence(lit(0), lit(dim - 1))).as("i"))
      .join(counts, Seq("__id", "i"), "left")
      .select(col("__id").as(idCol), col("i"),
        (coalesce(col("__c"), lit(0.0)) / col("__n")).as("component"))
  }

  /** Declared q76: 64-dim hashed TF vectors for every document, one
    * (doc_id, i, component) row per vector slot — the driver harness
    * canonicalizes results through a pandas sort that cannot order raw
    * array cells, so declared outputs must be scalar columns (the
    * full-vector compare is preserved: every component is its own
    * hashed row).
    */
  def q76HashingTf(spark: SparkSession, d: String): DataFrame =
    hashedTfComponents(Tables.documents(spark, d), "doc_id", "text")

  val q76Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |b AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substring(md5(t), 1, 8))::BIGINT % 64 AS INT) AS bucket
      |  FROM tok),
      |m AS (SELECT doc_id, histogram(bucket) AS h FROM b GROUP BY doc_id),
      |d AS (SELECT doc_id,
      |        list_transform(range(0, 64),
      |          i -> CAST(coalesce(map_extract(h, CAST(i AS INT))[1], 0) AS DOUBLE)) AS dense
      |      FROM m),
      |n AS (SELECT doc_id, dense,
      |        sqrt(list_sum(list_transform(dense, x -> x * x))) AS nrm
      |      FROM d)
      |SELECT doc_id, CAST(x.i AS INT) AS i, dense[x.i + 1] / nrm AS component
      |FROM n, LATERAL (SELECT unnest(generate_series(0, 63)) AS i) AS x""".stripMargin

  /** Declared q77: document search with NO embedding model — hashed TF
    * vectors ([[hashingTfVectors]]) fed straight into the brute-force
    * cosine top-k ([[Similarity.bruteCosineTopK]], broadcast query
    * side). Full oracle: DuckDB recomputes the identical md5-bucket
    * vectors and ranking.
    */
  def q77HashedDocTopK(spark: SparkSession, d: String): DataFrame = {
    val vecs = hashingTfVectors(Tables.documents(spark, d), "doc_id", "text")
    Similarity.bruteCosineTopK(
      vecs.where(col("doc_id") >= 5), vecs.where(col("doc_id") < 5),
      "doc_id", "vec", k = 5)
  }

  val q77Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |b AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substring(md5(t), 1, 8))::BIGINT % 64 AS INT) AS bucket
      |  FROM tok),
      |m AS (SELECT doc_id, histogram(bucket) AS h FROM b GROUP BY doc_id),
      |dd AS (SELECT doc_id,
      |        list_transform(range(0, 64),
      |          i -> CAST(coalesce(map_extract(h, CAST(i AS INT))[1], 0) AS DOUBLE)) AS dense
      |      FROM m),
      |n AS (SELECT doc_id, dense,
      |        sqrt(list_sum(list_transform(dense, x -> x * x))) AS nrm
      |      FROM dd),
      |v AS (SELECT doc_id, list_transform(dense, x -> x / nrm) AS vec FROM n)
      |SELECT query_id, vec_id, cos_sim, rank FROM (
      | SELECT q.doc_id AS query_id, c.doc_id AS vec_id,
      |  list_dot_product(c.vec, q.vec) /
      |    (sqrt(list_dot_product(c.vec, c.vec)) *
      |     sqrt(list_dot_product(q.vec, q.vec))) AS cos_sim,
      |  CAST(row_number() OVER (PARTITION BY q.doc_id
      |    ORDER BY cos_sim DESC, c.doc_id) AS INT) AS rank
      | FROM (SELECT * FROM v WHERE doc_id >= 5) c
      | CROSS JOIN (SELECT * FROM v WHERE doc_id < 5) q) t
      |WHERE rank <= 5""".stripMargin

  /** Declared q73 over the documents fixture (n=5, minDocs=2 — the
    * planted near-duplicates share long spans, so the rule has real
    * work to do).
    */
  def q73StripCommon(spark: SparkSession, d: String): DataFrame =
    stripCommonNgrams(Tables.documents(spark, d), "doc_id", "text")

  /** PMI collocation mining — token bigrams whose co-occurrence beats
    * chance by pointwise mutual information, the classic phrase-mining
    * signal ("new york" scores high, "of the" scores ~0). PMI =
    * log2(p(ab) / (p(a)·p(b))) with p(ab) over bigram occurrences and
    * p(·) over unigram occurrences.
    *
    * Scale shape: bigrams pair up MAP-SIDE inside each document's token
    * array (`zip_with` against its own tail — no window over exploded
    * tokens, no shuffle before counting); bigram and unigram counts are
    * vocabulary-bounded aggregates; the min-count gate prunes the
    * bigram relation before its two unigram joins (AQE broadcasts the
    * vocab side when small); the only driver values are the two scalar
    * totals.
    */
  def pmiCollocations(docs: DataFrame, textCol: String,
      minCount: Long): DataFrame = {
    val toks = docs.select(split(col(textCol), " ").as("a"))
    val uni = toks.select(explode(col("a")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val bi = toks
      .select(explode(zip_with(col("a"),
        slice(col("a"), lit(2), greatest(size(col("a")) - 1, lit(0))),
        (x, y) => struct(x.as("w1"), y.as("w2")))).as("p"))
      .where(col("p.w2").isNotNull)
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minCount)
    // the two corpus totals ride the SAME execution as broadcast
    // scalars (house style — no driver round trips outside
    // Explain/bench harnesses)
    val totalUni = uni.agg(sum(col("n")).cast("double").as("__tu"))
    val totalBi = toks
      .agg(sum(greatest(size(col("a")) - 1, lit(0))).cast("double").as("__tb"))
    bi
      .join(uni.select(col("w").as("w1"), col("n").as("n_a")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("n").as("n_b")), Seq("w2"))
      .crossJoin(broadcast(totalUni))
      .crossJoin(broadcast(totalBi))
      .select(col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
        log2((col("n_ab").cast("double") / col("__tb")) /
          ((col("n_a").cast("double") / col("__tu")) *
            (col("n_b").cast("double") / col("__tu")))).as("pmi"))
  }

  /** Declared q118: corpus-wide collocations seen ≥ 5 times. */
  def q118Collocations(spark: SparkSession, d: String): DataFrame =
    pmiCollocations(Tables.documents(spark, d), "text", minCount = 5L)

  val q118Sql: String =
    """WITH t AS (SELECT string_split(text, ' ') AS a FROM documents),
      |occ AS (SELECT unnest(a) AS w FROM t),
      |uni AS (SELECT w, count(*) AS n FROM occ GROUP BY 1),
      |tu AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM uni),
      |bp AS (SELECT unnest(list_zip(a, a[2:])) AS p FROM t),
      |bi AS (SELECT p[1] AS w1, p[2] AS w2, count(*) AS n_ab
      |       FROM bp WHERE p[2] IS NOT NULL
      |       GROUP BY 1, 2 HAVING count(*) >= 5),
      |tb AS (SELECT CAST(sum(greatest(len(a) - 1, 0)) AS DOUBLE) AS t FROM t)
      |SELECT w1, w2, CAST(n_ab AS BIGINT) AS n_ab,
      |  CAST(ua.n AS BIGINT) AS n_a, CAST(ub.n AS BIGINT) AS n_b,
      |  log2((CAST(n_ab AS DOUBLE) / tb.t) /
      |    ((CAST(ua.n AS DOUBLE) / tu.t) * (CAST(ub.n AS DOUBLE) / tu.t)))
      |    AS pmi
      |FROM bi
      |JOIN uni ua ON bi.w1 = ua.w
      |JOIN uni ub ON bi.w2 = ub.w
      |CROSS JOIN tu CROSS JOIN tb""".stripMargin

  /** Per-document token Shannon entropy — the information-density twin
    * of the q61 repetition signals: keyword-stuffed or boilerplate text
    * concentrates mass on few tokens (low entropy), natural prose
    * spreads it. Occurrences collapse to (doc, token) counts in one
    * shuffle; per-doc totals are a window over that vocabulary-bounded
    * count relation (partitioned by doc — never over raw tokens), and
    * the entropy sum is a second pass over the same partitioning.
    */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
    val cnt = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
      .withColumn("t", sum(col("c")).over(w))
    val p = col("c").cast("double") / col("t")
    cnt.groupBy(col(idCol))
      .agg(min(col("t")).as("n_tokens"),
        (-sum(p * log2(p))).as("entropy"))
  }

  /** Declared q119 over the documents fixture. */
  def q119Entropy(spark: SparkSession, d: String): DataFrame =
    tokenEntropy(Tables.documents(spark, d), "doc_id", "text")

  val q119Sql: String =
    """WITH occ AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |c AS (SELECT doc_id, tok, count(*) AS c FROM occ GROUP BY 1, 2),
      |t AS (SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) AS t FROM c)
      |SELECT doc_id, CAST(min(t) AS BIGINT) AS n_tokens,
      |  -sum((CAST(c AS DOUBLE) / t) * log2(CAST(c AS DOUBLE) / t)) AS entropy
      |FROM t GROUP BY 1""".stripMargin

  val q73Sql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |idx AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i FROM t),
      |g AS (SELECT doc_id, i, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |        || ' ' || toks[i+3] || ' ' || toks[i+4] AS gram FROM idx),
      |common AS (SELECT gram FROM g GROUP BY gram
      |           HAVING count(DISTINCT doc_id) >= 2),
      |cov AS (SELECT DISTINCT g.doc_id, g.i + u.o AS pos
      |        FROM g JOIN common USING (gram),
      |             unnest([0, 1, 2, 3, 4]) AS u(o)),
      |tok AS (SELECT doc_id, unnest(range(1, len(toks) + 1)) AS pos, toks FROM t),
      |tok2 AS (SELECT doc_id, pos, toks[pos] AS token FROM tok),
      |kept AS (SELECT tok2.doc_id, tok2.pos, tok2.token FROM tok2
      |         LEFT JOIN cov ON tok2.doc_id = cov.doc_id AND tok2.pos = cov.pos
      |         WHERE cov.pos IS NULL)
      |SELECT t.doc_id,
      |  coalesce(string_agg(kept.token, ' ' ORDER BY kept.pos), '') AS clean_text,
      |  len(t.toks) - count(kept.token) AS n_removed
      |FROM t LEFT JOIN kept USING (doc_id)
      |GROUP BY t.doc_id, len(t.toks)""".stripMargin

  /** Zipf's-law fit over the corpus rank–frequency curve — the
    * one-glance corpus-health diagnostic (natural language sits near
    * slope −1 on log–log axes; scraped boilerplate, template spam, or a
    * broken tokenizer bend the curve). Least-squares of ln(freq) on
    * ln(rank) over the top-`topN` tokens, via the codegen `regr_*`
    * aggregates.
    *
    * Scale shape: token frequencies are a vocabulary-bounded aggregate
    * (one shuffle with map-side combine); the explicit top-N cap makes
    * the single-partition ranking window a constant-size step at ANY
    * corpus scale; the fit is a 1-row aggregate. Ties rank
    * deterministically by (freq desc, token asc) so both engines see
    * the identical curve.
    */
  def zipfFit(docs: DataFrame, textCol: String, topN: Int): DataFrame = {
    val freq = docs.select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val top = freq.orderBy(col("n").desc, col("w")).limit(topN)
    val ranked = top.select(col("n"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("w"))).as("r"))
    ranked.agg(
      count(lit(1)).as("n_ranked"),
      regr_slope(log(col("n")), log(col("r"))).as("slope"),
      regr_intercept(log(col("n")), log(col("r"))).as("intercept"),
      regr_r2(log(col("n")), log(col("r"))).as("r2"))
  }

  /** Declared q137: Zipf fit over the top 1000 corpus tokens. */
  def q137ZipfFit(spark: SparkSession, d: String): DataFrame =
    zipfFit(Tables.documents(spark, d), "text", topN = 1000)

  val q137Sql: String =
    """WITH occ AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |f AS (SELECT w, count(*) AS n FROM occ GROUP BY 1),
      |top AS (SELECT w, n FROM f ORDER BY n DESC, w LIMIT 1000),
      |r AS (SELECT n, row_number() OVER (ORDER BY n DESC, w) AS rk FROM top)
      |SELECT CAST(count(*) AS BIGINT) AS n_ranked,
      |  regr_slope(ln(n), ln(rk)) AS slope,
      |  regr_intercept(ln(n), ln(rk)) AS intercept,
      |  regr_r2(ln(n), ln(rk)) AS r2
      |FROM r""".stripMargin

  /** Winnow-fingerprint copy detection (the MOSS shape): document pairs
    * sharing ≥ `minShared` winnowing fingerprints, with the overlap
    * fraction against the smaller fingerprint set. The winnowing
    * guarantee makes this a SUBSTRING-level near-dup signal — any
    * shared run of ≥ window+k−1 characters contributes a shared
    * fingerprint — complementing the token-shingle Jaccard family
    * (which a long verbatim quote inside an otherwise-different
    * document does not trip).
    *
    * Scale shape: the same inverted-index discipline as every LSH join
    * here — fingerprints explode linearly (bounded per doc by text
    * length / window), one shuffle on the fingerprint key, the
    * min-count gate prunes pairs before the two size joins. The
    * `maxDf` document-frequency cap is LOAD-BEARING, not cosmetic:
    * a boilerplate 13-char run shared by f documents emits C(f,2)
    * pair rows from one key (the fixture's hottest fingerprint sits in
    * ~80% of docs — unbounded, the pair relation goes quadratic in
    * corpus size). Capping df bounds the join output by df²·|vocab|
    * and matches MOSS practice: a fingerprint that common is
    * boilerplate, not copying, and carries no signal. Both the pair
    * join and the overlap denominators see only retained (rare)
    * fingerprints.
    */
  def fingerprintOverlap(docs: DataFrame, idCol: String, textCol: String,
      minShared: Long, maxDf: Long = 20L): DataFrame = {
    // LAZY checkpoint BEFORE the explode = a hard optimizer barrier AND
    // the production shape (the fingerprint index is materialized once
    // and read by four consumers: df stats, both join sides, per-doc
    // sizes). Without it this is the round-3/round-4 collapse trap at
    // its worst: `fingerprints` has a single reference under a
    // Generate, so the optimizer merges the whole __t → __hashes →
    // __mins chain — lower(text) included — into the generator input's
    // per-element lambda bodies, turning the winnow pass
    // O(len³)-interpreted (measured: minutes for 500 fixture docs;
    // with the barrier, sub-second).
    val fp = winnowFingerprints(docs, idCol, textCol, portableHash = true)
      .select(col(idCol).as("__id"), col("fingerprints"))
      .localCheckpoint(false)
      .select(col("__id"), explode(col("fingerprints")).as("__fp"))
    // df relation is fingerprint-vocabulary-sized; the semi-join
    // broadcasts under AQE whenever it is small
    val rareKeys = fp.groupBy(col("__fp")).agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxDf)
      .select(col("__fp"))
    val rare = fp.join(rareKeys, Seq("__fp"), "left_semi")
    val shared = rare.select(col("__id").as("id_a"), col("__fp"))
      .join(rare.select(col("__id").as("id_b"), col("__fp")), Seq("__fp"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
    // fingerprints are per-doc distinct, so the per-doc count relation
    // is exactly the retained-fingerprint count — vocabulary-scale
    val nfp = rare.groupBy(col("__id")).agg(count(lit(1)).as("__n"))
    shared
      .join(nfp.select(col("__id").as("id_a"), col("__n").as("n_a")), Seq("id_a"))
      .join(nfp.select(col("__id").as("id_b"), col("__n").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("n_shared"),
        (col("n_shared").cast(DoubleType) / least(col("n_a"), col("n_b")))
          .as("overlap"))
  }

  /** Declared q138: copy-detection pairs at ≥5 shared rare
    * fingerprints (df ≤ 20).
    */
  def q138FingerprintOverlap(spark: SparkSession, d: String): DataFrame =
    fingerprintOverlap(Tables.documents(spark, d), "doc_id", "text",
      minShared = 5L, maxDf = 20L)

  /** Oracle: full SQL recomputation — q46's winnowing CTEs, then the
    * unnest self-join.
    */
  val q138Sql: String = {
    val poly = (0 until 8).map(j =>
      s"CAST(ascii(substring(p, CAST(i + $j AS INT), 1)) AS BIGINT) * ${pow31(j)}")
      .mkString(" + ")
    s"""WITH g AS (
       | SELECT doc_id, list_transform(range(1, greatest(length(p) - 7, 1) + 1),
       |   i -> $poly) AS hs
       | FROM (SELECT doc_id, lower(text) AS p FROM documents)),
       |m AS (
       | SELECT doc_id, list_distinct(list_transform(
       |   range(1, greatest(len(hs) - 5, 1) + 1),
       |   i -> list_min(array_slice(hs, i, i + 5)))) AS mins
       | FROM g),
       |fp0 AS (SELECT doc_id, unnest(mins) AS fp FROM m),
       |rarekeys AS (SELECT fp FROM fp0 GROUP BY fp HAVING count(*) <= 20),
       |fp AS (SELECT doc_id, fp FROM fp0 WHERE fp IN (SELECT fp FROM rarekeys)),
       |sh AS (
       | SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
       | FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
       | GROUP BY 1, 2 HAVING count(*) >= 5),
       |n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM fp GROUP BY doc_id)
       |SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared,
       |  CAST(n_shared AS DOUBLE) / least(na.n, nb.n) AS overlap
       |FROM sh
       |JOIN n na ON sh.id_a = na.doc_id
       |JOIN n nb ON sh.id_b = nb.doc_id""".stripMargin
  }

  /** Vowel-group pattern shared by the readability formula on both
    * engines (Java + RE2 dialects agree on this class).
    */
  val VowelGroup = "[aeiouyAEIOUY]+"

  /** Flesch reading-ease + Flesch–Kincaid grade per document — the
    * classic complexity gate a curation pipeline runs alongside
    * [[languageQualityScores]] (too-easy text is template spam,
    * too-hard is OCR noise). Standard approximations: sentences =
    * `[.!?]+` runs (min 1), syllables = vowel groups with every
    * vowel-less word (digits, symbols) counted as one syllable.
    *
    * Scale shape: a pure per-row projection — regexp counts plus one
    * higher-order filter over the token array — no shuffle, one scan.
    *
    * @return (idCol, n_words, n_sentences, n_syllables, flesch, fk_grade)
    */
  def readability(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val words = size(toks)
    val sentences = greatest(
      size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0))), lit(1))
    val syllables =
      size(regexp_extract_all(col(textCol), lit(VowelGroup), lit(0))) +
        size(filter(toks, w => !w.rlike("[aeiouyAEIOUY]")))
    docs.select(col(idCol),
      words.as("n_words"),
      sentences.as("n_sentences"),
      syllables.as("n_syllables"),
      (lit(206.835)
        - lit(1.015) * (words.cast(DoubleType) / sentences)
        - lit(84.6) * (syllables.cast(DoubleType) / words)).as("flesch"),
      (lit(0.39) * (words.cast(DoubleType) / sentences)
        + lit(11.8) * (syllables.cast(DoubleType) / words)
        - lit(15.59)).as("fk_grade"))
  }

  /** Declared q146: readability over the corpus with sentence breaks
    * PLANTED deterministically (the fixture text carries no
    * punctuation, so the declared query ends a sentence after every
    * "the" — the q60 plant convention; the oracle plants identically,
    * exercising the sentence-run counter on every row).
    */
  def q146Readability(spark: SparkSession, d: String): DataFrame = {
    val planted = Tables.documents(spark, d).select(col("doc_id"),
      regexp_replace(col("text"), "\\bthe\\b", "the.").as("text"))
    readability(planted, "doc_id", "text")
  }

  val q146Sql: String = {
    val vg = VowelGroup
    s"""WITH planted AS (
       |  SELECT doc_id, regexp_replace(text, '\\bthe\\b', 'the.', 'g') AS text
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS INT) AS n_words,
       |  CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS INT)
       |    AS n_sentences,
       |  CAST(len(regexp_extract_all(text, '$vg'))
       |    + len(list_filter(string_split(text, ' '),
       |          w -> NOT regexp_matches(w, '[aeiouyAEIOUY]'))) AS INT)
       |    AS n_syllables,
       |  206.835
       |    - 1.015 * (CAST(len(string_split(text, ' ')) AS DOUBLE)
       |        / greatest(len(regexp_extract_all(text, '[.!?]+')), 1))
       |    - 84.6 * (CAST(len(regexp_extract_all(text, '$vg'))
       |        + len(list_filter(string_split(text, ' '),
       |              w -> NOT regexp_matches(w, '[aeiouyAEIOUY]'))) AS DOUBLE)
       |        / len(string_split(text, ' '))) AS flesch,
       |  0.39 * (CAST(len(string_split(text, ' ')) AS DOUBLE)
       |        / greatest(len(regexp_extract_all(text, '[.!?]+')), 1))
       |    + 11.8 * (CAST(len(regexp_extract_all(text, '$vg'))
       |        + len(list_filter(string_split(text, ' '),
       |              w -> NOT regexp_matches(w, '[aeiouyAEIOUY]'))) AS DOUBLE)
       |        / len(string_split(text, ' '))) - 15.59 AS fk_grade
       |FROM planted""".stripMargin
  }

  /** Light suffix-stripping stemmer (Porter step 1a + the high-yield
    * -ing/-ed rules): collapses inflected forms so frequency-based
    * corpus analyses (vocabulary growth, topic keywords, dedup
    * shingles) count "model/models/modeling" as one lexeme. Rules are
    * deliberately closed-form — ordered suffix tests plus a
    * contains-a-vowel guard — so the IDENTICAL rule chain runs as a
    * codegen `CASE` on both engines; this is a deterministic text
    * normalizer, not a linguistics engine.
    */
  def stemLight(t: Column): Column = {
    val len = length(t)
    // step 1a: plural stripping (ordered: sses > ies > ss > s)
    val u = when(t.endsWith("sses"), t.substr(lit(1), len - 2))
      .when(t.endsWith("ies"), t.substr(lit(1), len - 2))
      .when(t.endsWith("ss"), t)
      .when(t.endsWith("s") && len > 3, t.substr(lit(1), len - 1))
      .otherwise(t)
    val ulen = length(u)
    // -ing / -ed strip only when a vowel remains in the stem (keeps
    // "string"-like monosyllables from collapsing to consonant husks)
    when(u.endsWith("ing") && ulen > 5 &&
        u.substr(lit(1), ulen - 3).rlike("[aeiou]"),
        u.substr(lit(1), ulen - 3))
      .when(u.endsWith("ed") && ulen > 4 &&
        u.substr(lit(1), ulen - 2).rlike("[aeiou]"),
        u.substr(lit(1), ulen - 2))
      .otherwise(u)
  }

  /** Stem frequency table over a corpus: lowercase alphabetic tokens
    * through [[stemLight]], counted, top-`topN` by (count, stem).
    * One explode + one vocabulary-keyed aggregate + a
    * TakeOrderedAndProject — the q84/TF-IDF scale shape.
    */
  def stemFrequencies(docs: DataFrame, textCol: String,
      topN: Int = 100): DataFrame =
    docs
      .select(explode(split(lower(col(textCol)), " ")).as("__t"))
      .where(col("__t").rlike("^[a-z]+$"))
      .select(stemLight(col("__t")).as("stem"))
      .groupBy(col("stem")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("stem"))
      .limit(topN)

  /** Inflection probe planted into every document by the DECLARED
    * q156 (the q60 plant convention — the synthetic fixture vocabulary
    * has zero inflected forms, so without it the oracle would never
    * execute a single rule branch). One word per branch: sses→ss
    * (merging with the planted bare "stress"), ies→i, ss-unchanged,
    * s-drop, the s length guard ("gas"), ing-strip, the ing vowel
    * guard ("string"), ed-strip, and both ed length/vowel guards.
    */
  val StemProbe: String = "stress stresses ponies glass cats gas " +
    "modeling string modeled red deed speed"

  /** Declared q156: top-100 stems of the corpus with [[StemProbe]]
    * appended to every document.
    */
  def q156Stems(spark: SparkSession, d: String): DataFrame =
    stemFrequencies(
      Tables.documents(spark, d)
        .select(concat(col("text"), lit(" " + StemProbe)).as("text")),
      "text", topN = 100)

  val q156Sql: String =
    s"""WITH tk AS (
      |  SELECT lower(unnest(string_split(text || ' $StemProbe', ' ')))
      |    AS t
      |  FROM documents),
      |a AS (SELECT t FROM tk WHERE regexp_matches(t, '^[a-z]+$$')),
      |s1 AS (
      |  SELECT CASE
      |    WHEN t LIKE '%sses' THEN left(t, length(t) - 2)
      |    WHEN t LIKE '%ies' THEN left(t, length(t) - 2)
      |    WHEN t LIKE '%ss' THEN t
      |    WHEN t LIKE '%s' AND length(t) > 3 THEN left(t, length(t) - 1)
      |    ELSE t END AS u
      |  FROM a),
      |s2 AS (
      |  SELECT CASE
      |    WHEN u LIKE '%ing' AND length(u) > 5
      |      AND regexp_matches(left(u, length(u) - 3), '[aeiou]')
      |      THEN left(u, length(u) - 3)
      |    WHEN u LIKE '%ed' AND length(u) > 4
      |      AND regexp_matches(left(u, length(u) - 2), '[aeiou]')
      |      THEN left(u, length(u) - 2)
      |    ELSE u END AS stem
      |  FROM s1)
      |SELECT stem, CAST(count(*) AS BIGINT) AS n
      |FROM s2 GROUP BY 1
      |ORDER BY n DESC, stem LIMIT 100""".stripMargin

  /** Per-document cross-entropy against the corpus unigram model —
    * the CCNet-style quality/outlier filter: documents whose tokens
    * are collectively improbable under the corpus distribution
    * (boilerplate, gibberish, wrong-domain text) score high and get
    * cut. Smoothing is add-1 over the corpus vocabulary so unseen-in-
    * corpus is impossible by construction (every doc token IS corpus
    * mass) but the formula stays the standard smoothed estimator.
    *
    * Scale shape: ONE explode feeds both the corpus counts and the
    * per-doc token relation (same single-explode discipline as
    * [[sourceDivergence]]); the scoring join is vocabulary-keyed; the
    * per-doc aggregate is one shuffle on doc id.
    *
    * @return per doc: doc_id, n_tokens, cross_entropy (nats/token)
    */
  def crossEntropyQuality(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val tok = docs
      .select(col(idCol).as("__id"),
        explode(split(col(textCol), " ")).as("__t"))
      .where(col("__t").isNotNull && col("__id").isNotNull)
      .localCheckpoint()
    val counts = tok.groupBy(col("__t")).agg(count(lit(1)).as("__c"))
    val glob = counts.agg(sum(col("__c")).as("__n"),
      count(lit(1)).as("__v"))
    val p = (col("__c") + 1).cast("double") / (col("__n") + col("__v"))
    tok.join(counts, Seq("__t"))
      .crossJoin(broadcast(glob))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        avg(-log(p)).as("cross_entropy"))
  }

  /** Declared q166: corpus-model cross-entropy of every document. */
  def q166CrossEntropy(spark: SparkSession, d: String): DataFrame =
    crossEntropyQuality(Tables.documents(spark, d), "doc_id", "text")

  val q166Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |  FROM documents),
      |counts AS (SELECT t, count(*) AS c FROM tok GROUP BY 1),
      |g AS (
      |  SELECT CAST(sum(c) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v
      |  FROM counts)
      |SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |  avg(-ln((counts.c + 1) / (g.n + g.v))) AS cross_entropy
      |FROM tok JOIN counts USING (t) CROSS JOIN g
      |GROUP BY tok.doc_id""".stripMargin

  /** Token burstiness (Fano factor over documents): var/mean of a
    * token's per-document count, zeros included — the "does this term
    * clump into a few documents or spread evenly" corpus-health
    * signal (bursty terms are topical/templated; uniform terms are
    * function words). F = 1 for Poisson scatter, ≫ 1 for bursts.
    *
    * Scale shape: one explode to (doc, token, count), one
    * vocabulary-keyed re-aggregate (Σc and Σc² give the with-zeros
    * moments against the broadcast document total), one top-k.
    *
    * @return top-`topN` by (fano desc, token) among tokens with
    *         ≥ `minCount` total occurrences
    */
  def tokenBurstiness(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long = 50, topN: Int = 20): DataFrame = {
    val perDoc = docs
      .select(col(idCol).as("__id"),
        explode(split(col(textCol), " ")).as("__t"))
      .where(col("__t").isNotNull && col("__id").isNotNull)
      .groupBy(col("__id"), col("__t"))
      .agg(count(lit(1)).as("__c"))
    val nDocs = docs.agg(countDistinct(col(idCol)).as("__d"))
    val mean = col("__s").cast("double") / col("__d")
    val ex2 = col("__ss").cast("double") / col("__d")
    perDoc.groupBy(col("__t"))
      .agg(sum(col("__c")).as("__s"),
        sum(col("__c") * col("__c")).as("__ss"),
        count(lit(1)).as("n_docs"))
      .where(col("__s") >= minCount)
      .crossJoin(broadcast(nDocs))
      .select(col("__t").as("token"), col("__s").as("n_total"),
        col("n_docs"),
        ((ex2 - mean * mean) / mean).as("fano"))
      .orderBy(col("fano").desc, col("token"))
      .limit(topN)
  }

  /** Declared q171: the corpus's burstiest tokens. */
  def q171Burstiness(spark: SparkSession, d: String): DataFrame =
    tokenBurstiness(Tables.documents(spark, d), "doc_id", "text")

  val q171Sql: String =
    """WITH pd AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |  FROM documents),
      |c AS (SELECT doc_id, t, count(*) AS c FROM pd GROUP BY 1, 2),
      |d AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS d
      |      FROM documents),
      |m AS (
      |  SELECT t, sum(c) AS s, sum(c * c) AS ss, count(*) AS n_docs
      |  FROM c GROUP BY 1 HAVING sum(c) >= 50)
      |SELECT t AS token, CAST(s AS BIGINT) AS n_total,
      |  CAST(n_docs AS BIGINT) AS n_docs,
      |  ((ss / d.d) - (s / d.d) * (s / d.d)) / (s / d.d) AS fano
      |FROM m CROSS JOIN d
      |ORDER BY fano DESC, token LIMIT 20""".stripMargin

  /** Vocabulary coverage curve — how many distinct tokens (ranked by
    * frequency) it takes to cover {50, 80, 90, 99}% of all token
    * occurrences: the tokenizer-budget / compression diagnostic
    * behind "a 32k vocab covers 99.5% of this corpus". Within a
    * frequency tie every token adds the same mass, so the crossing
    * rank is deterministic no matter how ties order.
    *
    * Scale shape: one explode + vocabulary-keyed counts, descending
    * ranks via [[Relational.orderedPrefixSums]] on the negated count,
    * one final aggregate producing a 4-row literal unpivot.
    */
  def vocabCoverage(docs: DataFrame, textCol: String,
      thresholds: Seq[Double] = Seq(0.5, 0.8, 0.9, 0.99)): DataFrame = {
    val sup = docs
      .select(explode(split(col(textCol), " ")).as("__t"))
      .where(col("__t").isNotNull)
      .groupBy(col("__t")).agg(count(lit(1)).as("__c"))
      .withColumn("__negc", -col("__c"))
    val k = Relational.orderedPrefixSums(sup, "__negc",
      Seq("__m" -> col("__c"), "__r" -> lit(1L)))
    val aggs = thresholds.zipWithIndex.map { case (t, i) =>
      min(when(col("__m") >= col("__m_total") * t, col("__r")))
        .cast("long").as(s"__k$i")
    }
    val one = k.agg(
      max(col("__r_total")).cast("long").as("__vocab"),
      (max(col("__m_total")).cast("long").as("__mass") +: aggs): _*)
    val rows = explode(array(thresholds.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("coverage"), col(s"__k$i").as("k_tokens"),
        col("__vocab").as("vocab_size"), col("__mass").as("total_tokens"))
    }: _*))
    one.select(rows.as("r")).select(col("r.*"))
  }

  /** Declared q175: the corpus's token-coverage curve. */
  def q175VocabCoverage(spark: SparkSession, d: String): DataFrame =
    vocabCoverage(Tables.documents(spark, d), "text")

  val q175Sql: String =
    """WITH tk AS (
      |  SELECT unnest(string_split(text, ' ')) AS t FROM documents),
      |sup AS (SELECT t, count(*) AS c FROM tk GROUP BY 1),
      |k AS (
      |  SELECT c,
      |    CAST(sum(c) OVER (ORDER BY -c
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |      AS m,
      |    CAST(row_number() OVER (ORDER BY -c) AS BIGINT) AS r,
      |    CAST((SELECT sum(c) FROM sup) AS DOUBLE) AS mass,
      |    CAST((SELECT count(*) FROM sup) AS BIGINT) AS vocab
      |  FROM sup),
      |s AS (
      |  SELECT max(vocab) AS vocab, CAST(max(mass) AS BIGINT) AS mass,
      |    min(CASE WHEN m >= mass * 0.5 THEN r END) AS k50,
      |    min(CASE WHEN m >= mass * 0.8 THEN r END) AS k80,
      |    min(CASE WHEN m >= mass * 0.9 THEN r END) AS k90,
      |    min(CASE WHEN m >= mass * 0.99 THEN r END) AS k99
      |  FROM k)
      |SELECT CAST(0.5 AS DOUBLE) AS coverage, k50 AS k_tokens,
      |  vocab AS vocab_size, mass AS total_tokens FROM s
      |UNION ALL SELECT CAST(0.8 AS DOUBLE), k80, vocab, mass FROM s
      |UNION ALL SELECT CAST(0.9 AS DOUBLE), k90, vocab, mass FROM s
      |UNION ALL SELECT CAST(0.99 AS DOUBLE), k99, vocab, mass FROM s""".stripMargin

  /** Count-Min sketch over token frequencies with PORTABLE hashing —
    * the mergeable fixed-memory sketch a streaming/sharded pipeline
    * keeps instead of an unbounded vocabulary: d rows × w counters,
    * bucket_j(t) = md5-derived (the engine's determinism scheme, so
    * the oracle builds the bit-identical sketch in SQL), estimate =
    * min over rows. CMS guarantees est ≥ truth and
    * P[est > truth + εN] small with w = ⌈e/ε⌉.
    *
    * The declared query is the honesty gate the approximate operators
    * use: report heavy tokens with BOTH the exact count and the
    * sketch estimate plus the never-underestimates invariant as a
    * column — hash-compared, so the sketch arithmetic itself is
    * oracle-pinned.
    *
    * Scale shape: token counts once (vocabulary-keyed); the sketch is
    * a d×w-bounded aggregate of the support; estimates re-join the
    * support through its d bucket ids. Nothing row-scale past the
    * first aggregate.
    */
  def countMinHeavyHitters(docs: DataFrame, textCol: String,
      depth: Int = 4, width: Int = 1024,
      minExact: Long = 100): DataFrame = {
    val counts = docs
      .select(explode(split(col(textCol), " ")).as("__t"))
      .where(col("__t").isNotNull)
      .groupBy(col("__t")).agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    def bucket(j: Column, t: Column): Column =
      pmod(graft.functions.GraftFunctions.hexLong(
        substring(md5(concat_ws("|", j.cast("string"), t)), 1, 15)),
        lit(width.toLong))
    val rows = counts.select(col("__t"), col("__c"),
        explode(sequence(lit(0), lit(depth - 1))).as("__j"))
      .withColumn("__b", bucket(col("__j"), col("__t")))
    val sketch = rows.groupBy(col("__j"), col("__b"))
      .agg(sum(col("__c")).as("__cell"))
    val est = rows
      .join(sketch, Seq("__j", "__b"))
      .groupBy(col("__t"), col("__c"))
      .agg(min(col("__cell")).as("__est"))
    val n = counts.agg(sum(col("__c")).as("__nn"))
    est.where(col("__c") >= minExact)
      .crossJoin(broadcast(n))
      .select(col("__t").as("token"), col("__c").as("exact_count"),
        col("__est").as("cms_estimate"),
        (col("__est") >= col("__c")).as("never_underestimates"),
        ((col("__est") - col("__c")).cast("double") / col("__nn"))
          .as("overestimate_frac"))
  }

  /** Declared q185: sketch-vs-exact for every token with ≥100
    * occurrences.
    */
  def q185CountMin(spark: SparkSession, d: String): DataFrame =
    countMinHeavyHitters(Tables.documents(spark, d), "text")

  val q185Sql: String =
    """WITH counts AS (
      |  SELECT t, count(*) AS c FROM (
      |    SELECT unnest(string_split(text, ' ')) AS t FROM documents)
      |  GROUP BY 1),
      |rows_ AS (
      |  SELECT t, c, j,
      |    ('0x' || substring(md5(CAST(j AS VARCHAR) || '|' || t), 1, 15))
      |      ::BIGINT % 1024 AS b
      |  FROM counts, generate_series(0, 3) s(j)),
      |sketch AS (
      |  SELECT j, b, sum(c) AS cell FROM rows_ GROUP BY 1, 2),
      |est AS (
      |  SELECT r.t, r.c, min(sk.cell) AS est
      |  FROM rows_ r JOIN sketch sk ON sk.j = r.j AND sk.b = r.b
      |  GROUP BY 1, 2),
      |n AS (SELECT CAST(sum(c) AS DOUBLE) AS nn FROM counts)
      |SELECT t AS token, CAST(c AS BIGINT) AS exact_count,
      |  CAST(est AS BIGINT) AS cms_estimate,
      |  est >= c AS never_underestimates,
      |  (est - c) / n.nn AS overestimate_frac
      |FROM est CROSS JOIN n
      |WHERE c >= 100""".stripMargin

  /** Bloom-filter membership sketch with PORTABLE hashing — the third
    * leg of the sketch family (HLL distinct / Count-Min counts /
    * Bloom membership): build an m-bit filter over one corpus slice's
    * vocabulary, probe another slice, and report the measured
    * false-positive rate next to the structural no-false-negatives
    * invariant. Bits are md5-derived like q185's buckets, so the
    * oracle assembles the bit-identical filter in SQL.
    *
    * Scale shape: the filter is a ≤(k·|vocab_A|)-row (bit) relation —
    * domain-bounded; the probe is a k-explode + one join on bit id +
    * a per-token count; membership truth is one semi-join. Nothing
    * row-scale past the vocabulary aggregates.
    *
    * @return one row: n_probe, n_bloom_pos, n_true_members,
    *         n_false_pos, fp_rate, no_false_negatives
    */
  def bloomMembership(memberDocs: DataFrame, probeDocs: DataFrame,
      textCol: String, bits: Int = 8192, hashes: Int = 4): DataFrame = {
    def vocab(df: DataFrame): DataFrame = df
      .select(explode(split(col(textCol), " ")).as("__t"))
      .where(col("__t").isNotNull).distinct()
    def bitOf(j: Column, t: Column): Column =
      pmod(graft.functions.GraftFunctions.hexLong(
        substring(md5(concat_ws("|", j.cast("string"), t)), 1, 15)),
        lit(bits.toLong))
    val memberV = vocab(memberDocs).localCheckpoint()
    val filter = memberV
      .select(explode(sequence(lit(0), lit(hashes - 1))).as("__j"),
        col("__t"))
      .select(bitOf(col("__j"), col("__t")).as("__bit"))
      .distinct()
    val probeV = vocab(probeDocs).localCheckpoint()
    val hits = probeV
      .select(col("__t"), explode(sequence(lit(0), lit(hashes - 1))).as("__j"))
      .withColumn("__bit", bitOf(col("__j"), col("__t")))
      .join(filter, Seq("__bit"), "left_semi")
      .groupBy(col("__t")).agg(count(lit(1)).as("__set"))
      .where(col("__set") === hashes)
      .select(col("__t"), lit(true).as("__bloom"))
    val truth = probeV.join(memberV, Seq("__t"), "left_semi")
      .select(col("__t"), lit(true).as("__member"))
    probeV
      .join(hits, Seq("__t"), "left")
      .join(truth, Seq("__t"), "left")
      .agg(count(lit(1)).as("n_probe"),
        sum(when(col("__bloom"), 1L).otherwise(0L)).as("n_bloom_pos"),
        sum(when(col("__member"), 1L).otherwise(0L)).as("n_true_members"),
        sum(when(col("__bloom") && col("__member").isNull, 1L)
          .otherwise(0L)).as("n_false_pos"),
        when(sum(when(col("__member").isNull, 1L).otherwise(0L)) > 0,
          sum(when(col("__bloom") && col("__member").isNull, 1L)
            .otherwise(0L)).cast("double") /
            sum(when(col("__member").isNull, 1L).otherwise(0L)))
          .as("fp_rate"),
        (sum(when(col("__member") && col("__bloom").isNull, 1L)
          .otherwise(0L)) === 0).as("no_false_negatives"))
  }

  /** Declared q186: filter built over src1 vocabulary, probed with the
    * rest of the corpus PLUS planted probe-only tokens (the q60 plant
    * convention — the fixture's vocabulary is fully shared across
    * sources, so without the plant there are zero true non-members
    * and the false-positive axis would go untested).
    */
  def q186Bloom(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val probes = docs.where(col("source") =!= "src1")
      .select(col("source"),
        concat(col("text"), lit(" zznonmember"), col("doc_id"))
          .as("text"))
    bloomMembership(docs.where(col("source") === "src1"), probes, "text")
  }

  val q186Sql: String =
    """WITH mv AS (
      |  SELECT DISTINCT unnest(string_split(text, ' ')) AS t
      |  FROM documents WHERE source = 'src1'),
      |pv AS (
      |  SELECT DISTINCT
      |    unnest(string_split(text || ' zznonmember' || doc_id, ' ')) AS t
      |  FROM documents WHERE source <> 'src1'),
      |f AS (
      |  SELECT DISTINCT
      |    ('0x' || substring(md5(CAST(j AS VARCHAR) || '|' || t), 1, 15))
      |      ::BIGINT % 8192 AS bit
      |  FROM mv, generate_series(0, 3) s(j)),
      |hits AS (
      |  SELECT t FROM (
      |    SELECT p.t,
      |      ('0x' || substring(md5(CAST(j AS VARCHAR) || '|' || p.t), 1, 15))
      |        ::BIGINT % 8192 AS bit
      |    FROM pv p, generate_series(0, 3) s(j)) x
      |  WHERE bit IN (SELECT bit FROM f)
      |  GROUP BY t HAVING count(*) = 4),
      |truth AS (SELECT t FROM pv WHERE t IN (SELECT t FROM mv))
      |SELECT CAST(count(*) AS BIGINT) AS n_probe,
      |  CAST(sum(CASE WHEN h.t IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_bloom_pos,
      |  CAST(sum(CASE WHEN tr.t IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_true_members,
      |  CAST(sum(CASE WHEN h.t IS NOT NULL AND tr.t IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_false_pos,
      |  CASE WHEN sum(CASE WHEN tr.t IS NULL THEN 1 ELSE 0 END) > 0 THEN
      |    CAST(sum(CASE WHEN h.t IS NOT NULL AND tr.t IS NULL THEN 1 ELSE 0 END)
      |      AS DOUBLE)
      |      / sum(CASE WHEN tr.t IS NULL THEN 1 ELSE 0 END) END AS fp_rate,
      |  sum(CASE WHEN tr.t IS NOT NULL AND h.t IS NULL THEN 1 ELSE 0 END) = 0
      |    AS no_false_negatives
      |FROM pv
      |LEFT JOIN hits h ON h.t = pv.t
      |LEFT JOIN truth tr ON tr.t = pv.t""".stripMargin

  /** Interpolated Kneser–Ney bigram scoring — the smoothing that
    * actually ships in n-gram LM filters (KenLM's default), one rung
    * above [[bigramLogProb]]'s add-1: instead of pretending unseen
    * transitions are uniformly cheap, mass discounted from every seen
    * bigram (absolute discount D = 0.75) is re-spent proportional to
    * each word's CONTINUATION fertility — how many distinct contexts
    * it follows — so "Francisco" (frequent but only after "San")
    * stops looking like a good continuation everywhere:
    *
    *   P(b|a) = (c(a,b) − D)/c(a) + D·N₁₊(a·)/c(a) · N₁₊(·b)/|bigram types|
    *
    * Every factor derives from the SAME bigram-count relation — no
    * extra corpus pass over q90's shape: one explode, one (a,b)
    * aggregate, two marginal aggregates of IT, one broadcast scalar.
    * Self-scored (model trained on the corpus being scored), so
    * c(a,b) ≥ 1 > D and every log is finite.
    */
  def knBigramLogProb(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      discount: Double = 0.75): DataFrame = {
    val toks = split(col(textCol), " ")
    // zip_with, not transform-with-index: see [[bigramLogProb]]
    val bg = docs
      .where(size(toks) >= 2)
      .select(col(idCol).as("__id"),
        explode(zip_with(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("__bg"))
      .select(col("__id"), col("__bg.a").as("a"), col("__bg.b").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
    val bc = bg.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
    val ca = bc.groupBy(col("a"))
      .agg(sum(col("c_ab")).as("c_a"), count(lit(1)).as("n1f"))
    val cb = bc.groupBy(col("b")).agg(count(lit(1)).as("n1b"))
    val tot = bc.agg(count(lit(1)).cast(DoubleType).as("nbg"))
    val p = (col("c_ab").cast(DoubleType) - lit(discount)) /
      col("c_a").cast(DoubleType) +
      lit(discount) * col("n1f").cast(DoubleType) / col("c_a").cast(DoubleType) *
        (col("n1b").cast(DoubleType) / col("nbg"))
    bg.join(bc, Seq("a", "b"))
      .join(ca, Seq("a"))
      .join(cb, Seq("b"))
      .crossJoin(broadcast(tot))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_bigrams"),
        avg(log(p)).as("mean_logprob_kn"))
      .select(col("__id").as(idCol), col("n_bigrams"), col("mean_logprob_kn"))
  }

  /** Declared q205 — KN-smoothed self-scored bigram log-probs. */
  def q205KnBigram(spark: SparkSession, d: String): DataFrame =
    knBigramLogProb(Tables.documents(spark, d), "doc_id", "text")

  /** ROUGE-1/ROUGE-2 (Lin 2004) between paired texts — the n-gram
    * overlap score summarization/distillation evals run over
    * hypothesis/reference pairs: clipped overlap
    * Σ_g min(c_hyp(g), c_ref(g)), precision over hypothesis mass,
    * recall over reference mass, F1. Distinct from the near-dup
    * detectors: those find WHICH texts overlap; this SCORES a known
    * pairing for generation quality.
    *
    * Scale shape: both sides explode to (pair, gram) count relations
    * (map-side combined), the clipped overlap is one (pair, gram)-
    * keyed equi-join + per-pair sum — never a text×text product; the
    * pairing relation is the caller's and arbitrary.
    *
    * @param pairs (pairIdCol, hypCol, refCol) — one row per pair
    * @return per pair: r1/r2 overlap + precision/recall/F1 (6 dp);
    *         empty gram sides score 0, not null
    */
  def rougeN(pairs: DataFrame, pairIdCol: String, hypCol: String,
      refCol: String): DataFrame = {
    val p = pairs.select(col(pairIdCol).as("pid"),
      col(hypCol).as("__h"), col(refCol).as("__r"))
      .localCheckpoint() // both gram sizes consume it twice
    def gramCounts(textCol: String, n: Int, side: String) = {
      val toks = split(col(textCol), " ")
      val grams = if (n == 1) toks else Dedup.spanGrams(toks, n)
      p.select(col("pid"), explode(grams).as("g"))
        .groupBy(col("pid"), col("g"))
        .agg(count(lit(1)).as(s"c_$side"))
    }
    def scores(n: Int, tag: String) = {
      val h = gramCounts("__h", n, "h")
      val r = gramCounts("__r", n, "r")
      val ov = h.join(r, Seq("pid", "g"))
        .groupBy(col("pid"))
        .agg(sum(least(col("c_h"), col("c_r"))).as("__ov"))
      val th = h.groupBy(col("pid")).agg(sum(col("c_h")).as("__th"))
      val tr = r.groupBy(col("pid")).agg(sum(col("c_r")).as("__tr"))
      val pr = when(col("__th") > 0,
        col("__ov").cast("double") / col("__th")).otherwise(lit(0.0))
      val rc = when(col("__tr") > 0,
        col("__ov").cast("double") / col("__tr")).otherwise(lit(0.0))
      p.select(col("pid"))
        .join(th, Seq("pid"), "left").join(tr, Seq("pid"), "left")
        .join(ov, Seq("pid"), "left")
        .select(col("pid"),
          coalesce(col("__ov"), lit(0L)).as(s"${tag}_overlap"),
          round(coalesce(pr, lit(0.0)), 6).as(s"${tag}_precision"),
          round(coalesce(rc, lit(0.0)), 6).as(s"${tag}_recall"),
          round(when(coalesce(pr, lit(0.0)) + coalesce(rc, lit(0.0)) > 0,
            lit(2.0) * pr * rc / (pr + rc)).otherwise(lit(0.0)), 6)
            .as(s"${tag}_f1"))
    }
    scores(1, "r1").join(scores(2, "r2"), Seq("pid"))
      .withColumnRenamed("pid", pairIdCol)
  }

  /** Declared q216: each even-id document scored as a "hypothesis"
    * against the next odd-id document as "reference" — an arbitrary
    * but engine-replayable pairing that pins the metric machinery.
    */
  def q216Rouge(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val hyp = docs.where(pmod(col("doc_id"), lit(2L)) === 0)
      .select(col("doc_id").as("pair_id"), col("text").as("hyp"))
    val ref = docs.select((col("doc_id") - 1).as("pair_id"),
      col("text").as("ref"))
    rougeN(hyp.join(ref, Seq("pair_id")), "pair_id", "hyp", "ref")
  }

  val q216Sql: String =
    """WITH hyp AS (
      |  SELECT doc_id AS pid, string_split(text, ' ') AS t
      |  FROM documents WHERE doc_id % 2 = 0),
      |ref AS (
      |  SELECT doc_id - 1 AS pid, string_split(text, ' ') AS t
      |  FROM documents WHERE (doc_id - 1) % 2 = 0),
      |pairs AS (SELECT hyp.pid FROM hyp JOIN ref USING (pid)),
      |h1 AS (SELECT pid, g, count(*) AS c FROM
      |  (SELECT pid, unnest(t) AS g FROM hyp
      |   WHERE pid IN (SELECT pid FROM pairs)) GROUP BY 1, 2),
      |r1 AS (SELECT pid, g, count(*) AS c FROM
      |  (SELECT pid, unnest(t) AS g FROM ref
      |   WHERE pid IN (SELECT pid FROM pairs)) GROUP BY 1, 2),
      |h2 AS (SELECT pid, g, count(*) AS c FROM
      |  (SELECT pid, unnest(list_transform(generate_series(1, len(t) - 1),
      |     i -> t[i] || ' ' || t[i+1])) AS g FROM hyp
      |   WHERE pid IN (SELECT pid FROM pairs)) GROUP BY 1, 2),
      |r2 AS (SELECT pid, g, count(*) AS c FROM
      |  (SELECT pid, unnest(list_transform(generate_series(1, len(t) - 1),
      |     i -> t[i] || ' ' || t[i+1])) AS g FROM ref
      |   WHERE pid IN (SELECT pid FROM pairs)) GROUP BY 1, 2),
      |m1 AS (
      |  SELECT p.pid,
      |    coalesce(ov.ov, 0) AS ov, coalesce(th.th, 0) AS th,
      |    coalesce(tr.tr, 0) AS tr
      |  FROM pairs p
      |  LEFT JOIN (SELECT h1.pid, sum(least(h1.c, r1.c)) AS ov
      |             FROM h1 JOIN r1 USING (pid, g) GROUP BY 1) ov
      |    ON ov.pid = p.pid
      |  LEFT JOIN (SELECT pid, sum(c) AS th FROM h1 GROUP BY 1) th
      |    ON th.pid = p.pid
      |  LEFT JOIN (SELECT pid, sum(c) AS tr FROM r1 GROUP BY 1) tr
      |    ON tr.pid = p.pid),
      |m2 AS (
      |  SELECT p.pid,
      |    coalesce(ov.ov, 0) AS ov, coalesce(th.th, 0) AS th,
      |    coalesce(tr.tr, 0) AS tr
      |  FROM pairs p
      |  LEFT JOIN (SELECT h2.pid, sum(least(h2.c, r2.c)) AS ov
      |             FROM h2 JOIN r2 USING (pid, g) GROUP BY 1) ov
      |    ON ov.pid = p.pid
      |  LEFT JOIN (SELECT pid, sum(c) AS th FROM h2 GROUP BY 1) th
      |    ON th.pid = p.pid
      |  LEFT JOIN (SELECT pid, sum(c) AS tr FROM r2 GROUP BY 1) tr
      |    ON tr.pid = p.pid),
      |sc1 AS (
      |  SELECT pid, CAST(ov AS BIGINT) AS r1_overlap,
      |    CASE WHEN th > 0 THEN CAST(ov AS DOUBLE) / th ELSE 0.0 END AS p,
      |    CASE WHEN tr > 0 THEN CAST(ov AS DOUBLE) / tr ELSE 0.0 END AS r
      |  FROM m1),
      |sc2 AS (
      |  SELECT pid, CAST(ov AS BIGINT) AS r2_overlap,
      |    CASE WHEN th > 0 THEN CAST(ov AS DOUBLE) / th ELSE 0.0 END AS p,
      |    CASE WHEN tr > 0 THEN CAST(ov AS DOUBLE) / tr ELSE 0.0 END AS r
      |  FROM m2)
      |SELECT sc1.pid AS pair_id,
      |  sc1.r1_overlap, round(sc1.p, 6) AS r1_precision,
      |  round(sc1.r, 6) AS r1_recall,
      |  round(CASE WHEN sc1.p + sc1.r > 0
      |    THEN 2.0 * sc1.p * sc1.r / (sc1.p + sc1.r) ELSE 0.0 END, 6)
      |    AS r1_f1,
      |  sc2.r2_overlap, round(sc2.p, 6) AS r2_precision,
      |  round(sc2.r, 6) AS r2_recall,
      |  round(CASE WHEN sc2.p + sc2.r > 0
      |    THEN 2.0 * sc2.p * sc2.r / (sc2.p + sc2.r) ELSE 0.0 END, 6)
      |    AS r2_f1
      |FROM sc1 JOIN sc2 USING (pid)""".stripMargin

  val q205Sql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |bg AS (
      |  SELECT doc_id, toks[x.i] AS a, toks[x.i + 1] AS b
      |  FROM t, LATERAL (
      |    SELECT unnest(generate_series(1, len(toks) - 1)) AS i) AS x
      |  WHERE len(toks) >= 2),
      |bc AS (SELECT a, b, count(*) AS c_ab FROM bg GROUP BY 1, 2),
      |ca AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a,
      |         count(*) AS n1f FROM bc GROUP BY 1),
      |cb AS (SELECT b, count(*) AS n1b FROM bc GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS DOUBLE) AS nbg FROM bc)
      |SELECT bg.doc_id, count(*) AS n_bigrams,
      |  avg(ln((CAST(c_ab AS DOUBLE) - 0.75) / CAST(c_a AS DOUBLE)
      |    + 0.75 * CAST(n1f AS DOUBLE) / CAST(c_a AS DOUBLE)
      |      * (CAST(n1b AS DOUBLE) / tot.nbg))) AS mean_logprob_kn
      |FROM bg JOIN bc USING (a, b) JOIN ca USING (a) JOIN cb USING (b)
      |CROSS JOIN tot
      |GROUP BY bg.doc_id""".stripMargin

  /** Within-document repetition-run audit — the degenerate-generation
    * signal ("the the the the …") an LLM-output or scrape-quality
    * filter screens for, DISTINCT from corpus-level span dedup
    * ([[graft.operators.Dedup]]): here the repetition is consecutive
    * tokens inside one document. Per doc: the longest run of the same
    * token repeated back-to-back (gaps-and-islands via a lag flag +
    * running sum — both windows share ONE (doc, position) sort, no
    * second exchange) and the repeated-token mass 1 − distinct/total.
    *
    * Scale shape: one posexplode, one doc-keyed window shuffle, one
    * hash aggregate per island, one per doc. Cost is token count —
    * the same as any tokenizing pass — and every key is doc-bounded,
    * so skew equals longest-document skew, the usual bound.
    */
  def repetitionRuns(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__id")).orderBy(col("__pos"))
    val toks = docs
      .select(col(idCol).as("__id"),
        posexplode(split(lower(col(textCol)), " ")).as(Seq("__pos", "__tok")))
    val runs = toks
      .withColumn("__new",
        when(lag(col("__tok"), 1).over(w) === col("__tok"), 0L)
          .otherwise(1L))
      .withColumn("__run",
        sum(col("__new")).over(w.rowsBetween(Long.MinValue, 0)))
      .groupBy(col("__id"), col("__run"), col("__tok"))
      .agg(count(lit(1)).as("__len"))
    val perDoc = toks.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("__tok")).as("__nd"))
    runs.groupBy(col("__id"))
      .agg(max(col("__len")).as("max_run"))
      .join(perDoc, Seq("__id"))
      .select(col("__id").as(idCol), col("n_tokens"), col("max_run"),
        round((col("n_tokens") - col("__nd")).cast("double") /
          col("n_tokens").cast("double"), 6).as("repeat_fraction"))
  }

  /** Heaps'-law vocabulary-growth fit — V(N) ≈ C·N^β estimated from
    * the corpus's own ingest order (doc_id): the corpus-health check
    * that tells an LLM-data pipeline whether new documents still add
    * vocabulary (β near the 0.4–0.6 natural-text band) or the feed
    * has gone repetitive/templated (β → 0). Companion to
    * [[zipfFit]]'s frequency-axis power law.
    *
    * Per ingest checkpoint (one per doc): cumulative tokens N and
    * cumulative distinct types V; the fit is ordinary least squares
    * on (ln N, ln V). V comes from FIRST OCCURRENCES — each type
    * contributes +1 at its min(doc_id) — so no checkpoint ever
    * re-scans the past: one aggregate for per-doc token counts, one
    * for first occurrences, one [[Relational.orderedPrefixSums]]
    * pass over the doc-bounded support for both running sums, and a
    * closed-form OLS aggregate. No quadratic re-counting, no window
    * over raw tokens.
    *
    * @return one row: n_points, c, beta, r2 (6 dp)
    */
  def heapsFit(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol).as("__doc"),
        explode(split(lower(col(textCol)), " ")).as("__tok"))
      .where(length(col("__tok")) > 0)
      .localCheckpoint()
    val perDoc = toks.groupBy(col("__doc"))
      .agg(count(lit(1)).as("__n"))
    val firsts = toks.groupBy(col("__tok"))
      .agg(min(col("__doc")).as("__doc"))
      .groupBy(col("__doc"))
      .agg(count(lit(1)).as("__v"))
    val sup = perDoc.join(firsts, Seq("__doc"), "left")
      .select(col("__doc"), col("__n"),
        coalesce(col("__v"), lit(0L)).as("__v"))
    val pts = Relational
      .orderedPrefixSums(sup, "__doc",
        Seq("__cn" -> col("__n"), "__cv" -> col("__v")))
      .where(col("__cn") > 0 && col("__cv") > 0)
      .select(log(col("__cn").cast("double")).as("__x"),
        log(col("__cv").cast("double")).as("__y"))
    val s = pts.agg(count(lit(1)).cast("double").as("__m"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__y") * col("__y")).as("__syy"))
    // ANSI mode raises on /0 where DuckDB yields NULL — guard the
    // degenerate corpora (constant N, or constant V -> zero y
    // variance) to the same NULL the oracle would produce
    val dx = col("__m") * col("__sxx") - col("__sx") * col("__sx")
    val dy = col("__m") * col("__syy") - col("__sy") * col("__sy")
    val beta = when(dx =!= 0.0,
      (col("__m") * col("__sxy") - col("__sx") * col("__sy")) / dx)
    val corr2 = when(dx * dy =!= 0.0,
      pow(col("__m") * col("__sxy") - col("__sx") * col("__sy"), 2.0) /
        (dx * dy))
    s.select(col("__m").cast("long").as("n_points"),
      round(exp((col("__sy") - beta * col("__sx")) / col("__m")), 6)
        .as("c"),
      round(beta, 6).as("beta"), round(corr2, 6).as("r2"))
  }

  /** Declared q244: Heaps' fit over the documents corpus in doc_id
    * order.
    */
  def q244HeapsFit(spark: SparkSession, d: String): DataFrame =
    heapsFit(Tables.documents(spark, d), "doc_id", "text")

  val q244Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
      |  FROM documents),
      |tk AS (SELECT doc_id, t FROM tok WHERE length(t) > 0),
      |per_doc AS (SELECT doc_id, count(*) AS n FROM tk GROUP BY 1),
      |firsts AS (
      |  SELECT doc_id, count(*) AS v FROM (
      |    SELECT t, min(doc_id) AS doc_id FROM tk GROUP BY 1)
      |  GROUP BY 1),
      |sup AS (
      |  SELECT p.doc_id, p.n, coalesce(f.v, 0) AS v
      |  FROM per_doc p LEFT JOIN firsts f USING (doc_id)),
      |pts AS (
      |  SELECT ln(CAST(sum(n) OVER (ORDER BY doc_id) AS DOUBLE)) AS x,
      |    ln(CAST(sum(v) OVER (ORDER BY doc_id) AS DOUBLE)) AS y
      |  FROM sup
      |  QUALIFY sum(n) OVER (ORDER BY doc_id) > 0
      |    AND sum(v) OVER (ORDER BY doc_id) > 0),
      |s AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS m,
      |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
      |    sum(x * x) AS sxx, sum(y * y) AS syy
      |  FROM pts)
      |SELECT CAST(m AS BIGINT) AS n_points,
      |  round(exp((sy - ((m * sxy - sx * sy) / (m * sxx - sx * sx)) * sx)
      |    / m), 6) AS c,
      |  round((m * sxy - sx * sy) / (m * sxx - sx * sx), 6) AS beta,
      |  round(pow(m * sxy - sx * sy, 2)
      |    / ((m * sxx - sx * sx) * (m * syy - sy * sy)), 6) AS r2
      |FROM s""".stripMargin

  /** Declared q242: repetition-run audit over the documents corpus. */
  def q242RepetitionRuns(spark: SparkSession, d: String): DataFrame =
    repetitionRuns(Tables.documents(spark, d), "doc_id", "text")

  val q242Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS t
      |  FROM documents),
      |pos AS (SELECT CAST(range AS INT) AS i FROM range(1, 100000)),
      |seq AS (
      |  SELECT doc_id, i, t[i] AS tok
      |  FROM toks JOIN pos ON pos.i <= len(t)),
      |flag AS (
      |  SELECT doc_id, i, tok,
      |    CASE WHEN lag(tok) OVER (PARTITION BY doc_id ORDER BY i) = tok
      |         THEN 0 ELSE 1 END AS nw
      |  FROM seq),
      |runs AS (
      |  SELECT doc_id, tok,
      |    sum(nw) OVER (PARTITION BY doc_id ORDER BY i
      |                  ROWS UNBOUNDED PRECEDING) AS run_id
      |  FROM flag),
      |rl AS (
      |  SELECT doc_id, run_id, count(*) AS len
      |  FROM runs GROUP BY 1, 2),
      |per_doc AS (
      |  SELECT doc_id, count(*) AS n_tokens,
      |    count(DISTINCT tok) AS nd
      |  FROM seq GROUP BY 1)
      |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(max(len) AS BIGINT) AS max_run,
      |  round(CAST(n_tokens - nd AS DOUBLE) / n_tokens, 6)
      |    AS repeat_fraction
      |FROM rl JOIN per_doc USING (doc_id)
      |GROUP BY doc_id, n_tokens, nd""".stripMargin

  /** Good–Turing frequency smoothing — the count-of-counts estimate
    * r* = (r+1)·N_{r+1}/N_r that reallocates probability mass to rare
    * and unseen events (Good 1953; the Katz-backoff ingredient). Per
    * frequency r: N_r, the smoothed r*, and the smoothed probability
    * r* over N; p0 = N_1/N (the unseen-token mass) rides every row. An
    * r with no r+1 class gets NULL r* (tail gap — real implementations
    * switch to a fitted power law there, cf. the q137 Zipf fit).
    *
    * Scale shape: token freq (one shuffle on token), count-of-counts
    * (one shuffle on freq, thousands of rows), a metadata-scale lead
    * join on r+1. Reports the `classes` SMALLEST frequency classes —
    * the low-count regime where GT smoothing is actually used (on a
    * natural corpus that is r = 1, 2, 3, …).
    */
  def goodTuring(docs: DataFrame, textCol: String, classes: Int = 25): DataFrame = {
    val freqs = docs
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("__r"))
    val cc = freqs.groupBy(col("__r")).agg(count(lit(1)).as("__nr"))
      .localCheckpoint()
    val tot = cc.agg(
      sum(col("__r") * col("__nr")).cast("double").as("__n"),
      sum(when(col("__r") === 1, col("__nr"))).cast("double").as("__n1"))
    val next = cc.select((col("__r") - 1).as("__r"), col("__nr").as("__nrNext"))
    cc.orderBy(col("__r")).limit(classes)
      .join(next, Seq("__r"), "left")
      .crossJoin(broadcast(tot))
      .select(col("__r").as("r"), col("__nr").as("n_r"),
        round((col("__r") + 1).cast("double") * col("__nrNext") / col("__nr"), 6)
          .as("r_star"),
        round((col("__r") + 1).cast("double") * col("__nrNext") /
          col("__nr") / col("__n"), 6).as("p_gt"),
        round(col("__n1") / col("__n"), 6).as("p0"))
  }

  /** Declared q256: GT-smoothed token frequencies of the corpus. */
  def q256GoodTuring(spark: SparkSession, d: String): DataFrame =
    goodTuring(Tables.documents(spark, d), "text")

  val q256Sql: String =
    """WITH f AS (
      |  SELECT token, count(*) AS r
      |  FROM (SELECT unnest(string_split(text, ' ')) AS token
      |        FROM documents)
      |  GROUP BY token),
      |cc AS (SELECT r, count(*) AS nr FROM f GROUP BY 1),
      |t AS (
      |  SELECT CAST(sum(r * nr) AS DOUBLE) AS n,
      |    CAST(sum(CASE WHEN r = 1 THEN nr END) AS DOUBLE) AS n1
      |  FROM cc),
      |low AS (SELECT r, nr FROM cc ORDER BY r LIMIT 25)
      |SELECT low.r, low.nr AS n_r,
      |  round((low.r + 1) * CAST(nx.nr AS DOUBLE) / low.nr, 6) AS r_star,
      |  round((low.r + 1) * CAST(nx.nr AS DOUBLE) / low.nr / t.n, 6)
      |    AS p_gt,
      |  round(t.n1 / t.n, 6) AS p0
      |FROM low LEFT JOIN cc nx ON nx.r = low.r + 1
      |CROSS JOIN t""".stripMargin

  /** The q263 blocklist — phrase patterns over the fixture vocabulary,
    * deliberately including nested/overlapping entries ("table" inside
    * "table value", "fast merge" vs "merge") so the automaton's
    * failure links and suffix outputs carry real weight.
    */
  val BlocklistPatterns: Seq[String] = Seq(
    "fast merge", "slow scan", "big table", "hash join", "stream window",
    "customer query", "table value", "table", "scan slow", "merge",
    "sort column", "group value", "window stream", "query big",
    "agg row", "line sort")

  /** Declared q263: blocklist audit over the documents corpus — ONE
    * Aho–Corasick automaton pass per document
    * ([[graft.functions.MultiContains]]) reports which of the
    * [[BlocklistPatterns]] occur, projected to a hit count and a
    * 2^index bitmask so the relation is scalar-hashable. The DuckDB
    * oracle recomputes both via the k-`contains` fold the automaton
    * replaces — any transition/failure-link/output-merge bug in the
    * automaton is a per-row hash mismatch against the naive plan.
    *
    * Scale shape: pure per-row projection, no shuffle; the automaton
    * builds once per task and the pass is O(|text| + matches)
    * regardless of blocklist size — vs k full contains scans (k =
    * 10³–10⁵ in production blocklists).
    */
  def q263Blocklist(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.multiContains(
          col("text"), BlocklistPatterns).as("__h"))
      .select(col("doc_id"),
        size(col("__h")).as("n_hits"),
        expr("aggregate(__h, CAST(0 AS BIGINT), " +
          "(a, x) -> a + shiftleft(CAST(1 AS BIGINT), x))").as("hit_mask"))

  val q263Sql: String = {
    val hits = BlocklistPatterns.map(p => s"contains(text, '$p')")
    s"""SELECT doc_id,
       |  CAST(${hits.map(h => s"(CASE WHEN $h THEN 1 ELSE 0 END)")
        .mkString(" + ")} AS INT) AS n_hits,
       |  CAST(${hits.zipWithIndex.map { case (h, i) =>
        s"(CASE WHEN $h THEN ${1L << i} ELSE 0 END)" }
        .mkString(" + ")} AS BIGINT) AS hit_mask
       |FROM documents""".stripMargin
  }
}
