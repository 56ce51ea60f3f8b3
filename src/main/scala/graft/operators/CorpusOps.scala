package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Corpus-construction operators a large-scale training-data pipeline
  * needs beyond dedup/quality (SURVEY.md §2.E/§2.G): benchmark
  * decontamination, token-budget sharding, and deterministic stratified
  * sampling. All three are declared oracle queries — the sampling and
  * hashing primitives are chosen to be engine-reproducible (md5-derived
  * uniforms, exact integer division points) so DuckDB can recompute
  * them bit-for-bit.
  */
object CorpusOps {

  /** Benchmark decontamination: for every corpus document, the maximum
    * shingle CONTAINMENT |A∩B| / |A| against any reference document
    * (A = corpus doc's word-3-gram set, B = a reference doc's) — the
    * standard train/test-overlap check before training on scraped data.
    * Containment, not Jaccard: a short benchmark prompt fully embedded
    * in a long document is contamination even though Jaccard is tiny.
    *
    * Shape at scale: inverted-index join on shingles — reference side
    * is benchmark-sized (small), corpus side streams through one hash
    * shuffle; no cross join. Intersections are counted per (corpus,
    * ref) pair only where ≥1 shingle collides, then max-reduced per
    * corpus doc. Exact (no LSH): decontamination wants recall 1.
    *
    * @return every corpus doc (with ≥3 tokens): (idCol,
    *         max_containment, contaminated)
    */
  def decontaminate(
      corpus: DataFrame,
      reference: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.6): DataFrame = {
    def shingled(df: DataFrame) = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("__id"),
        Dedup.shingles(split(col(textCol), " ")).as("__sh"))
      .where(size(col("__sh")) > 0)

    val c = shingled(corpus)
    val r = shingled(reference)
    val cInv = c.select(col("__id").as("__cid"), col("__sh"),
      explode(col("__sh")).as("__s")).select(col("__cid"), col("__s"))
    val rInv = r.select(col("__id").as("__rid"), explode(col("__sh")).as("__s"))

    // the reference side is benchmark-sized by definition — broadcast it
    // so the corpus-scale inverted index never shuffles: the join is
    // map-side, and only matched (corpus, ref) rows reach the aggregate
    val inter = cInv.join(broadcast(rInv), Seq("__s"))
      .groupBy(col("__cid"), col("__rid"))
      .agg(count(lit(1)).as("__n_inter"))
    val best = inter.groupBy(col("__cid")).agg(max(col("__n_inter")).as("__best_raw"))

    // containment denominator is the corpus doc's own shingle count;
    // max(n_inter)/|A| == max(n_inter/|A|) since |A| is constant per doc
    c.select(col("__id").as("__cid"), size(col("__sh")).as("__n_sh"))
      .join(best, Seq("__cid"), "left")
      .select(col("__cid").as(idCol),
        coalesce(col("__best_raw").cast(DoubleType) / col("__n_sh"), lit(0.0))
          .as("max_containment"))
      .withColumn("contaminated", col("max_containment") >= threshold)
  }

  /** Declared q56: corpus = doc_id ≥ 100, reference/benchmark = doc_id
    * < 100, over the documents fixture.
    */
  def q56Decontaminate(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    decontaminate(
      docs.where(col("doc_id") >= 100), docs.where(col("doc_id") < 100),
      "doc_id", "text")
  }

  /** Oracle: naive all-pairs containment (safe at oracle scale). */
  val q56Sql: String =
    """WITH sh AS (
      | SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
      |   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
      | FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      | WHERE len(t) >= 3),
      |corpus AS (SELECT * FROM sh WHERE doc_id >= 100),
      |ref AS (SELECT * FROM sh WHERE doc_id < 100),
      |pairs AS (
      | SELECT c.doc_id, max(len(list_intersect(c.sh, r.sh))) AS best
      | FROM corpus c JOIN ref r ON len(list_intersect(c.sh, r.sh)) > 0
      | GROUP BY 1)
      |SELECT c.doc_id,
      | COALESCE(CAST(p.best AS DOUBLE) / len(c.sh), 0.0) AS max_containment,
      | COALESCE(CAST(p.best AS DOUBLE) / len(c.sh), 0.0) >= 0.6 AS contaminated
      |FROM corpus c LEFT JOIN pairs p USING (doc_id)""".stripMargin

  /** Token-budget sharding: assign documents (in stable `idCol` order)
    * to contiguous shards of ≈`budgetTokens` whitespace tokens each —
    * how training corpora are cut into fixed-size chunks. A document's
    * shard is floor(prefixTokens / budget) where prefixTokens counts
    * all earlier documents' tokens.
    *
    * The global ordered prefix sum is computed DISTRIBUTED: range-
    * partition by id, per-partition token totals to the driver (one row
    * per partition — metadata scale), exclusive prefix offsets
    * broadcast back, then a window PARTITIONED by the range partition
    * finishes the cumulative sum — no single-partition window at any
    * size, and the result is independent of where the range boundaries
    * fall.
    *
    * @return per-shard summary (shard_id, n_docs, total_tokens)
    */
  def tokenShards(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      budgetTokens: Long): DataFrame = {
    // the ordered running sum rides the shared scaffold
    // ([[Relational.orderedPrefixSums]]): range-partitioned windows with
    // driver-broadcast offsets above its small-support bound, one
    // single-partition window below it — this was the fifth hand copy
    // of that shape, and the only one double-executing its source
    val toks = docs
      .select(col(idCol).as("__id"), size(split(col(textCol), " ")).as("__tok"))
    Relational.orderedPrefixSums(toks, "__id", Seq("__cum" -> col("__tok")))
      .withColumn("__prior", col("__cum") - col("__tok"))
      .withColumn("shard_id", floor(col("__prior") / budgetTokens.toDouble).cast(LongType))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("total_tokens"))
  }

  /** Rendezvous (highest-random-weight) shard routing — the
    * consistent-placement primitive for distributing a corpus across
    * workers/stores: each document goes to the shard whose
    * md5-derived weight for (salt, doc, shard) is highest. Adding or
    * removing a shard moves ONLY the documents whose argmax changes
    * (~1/n of the corpus) — the property modulo-hashing lacks — and the
    * assignment is a pure function of the id (the q58 determinism
    * rule): stable across runs, engines, and partitionings.
    *
    * Scale shape: a constant ×`shards` explode inside the scan
    * pipeline, then one map-combined `max_by` aggregate on the id —
    * no shuffle beyond the id-key aggregate, no driver state.
    */
  def rendezvousRoute(docs: DataFrame, idCol: String, shards: Int,
      salt: String): DataFrame = {
    require(shards > 0, "need at least one shard")
    val key = graft.functions.GraftFunctions.hexLong(
      substring(md5(concat_ws("|", lit(salt),
        col(idCol).cast(StringType), col("__s").cast(StringType))), 1, 15))
    docs.select(col(idCol), explode(sequence(lit(0), lit(shards - 1))).as("__s"))
      .withColumn("__key", key)
      .groupBy(col(idCol))
      .agg(max_by(col("__s"), col("__key")).as("shard"))
  }

  /** Declared q142: 10-way rendezvous routing of the documents corpus. */
  def q142RendezvousRoute(spark: SparkSession, d: String): DataFrame =
    rendezvousRoute(Tables.documents(spark, d), "doc_id", shards = 10,
      salt = "route")

  val q142Sql: String =
    """WITH r AS (
      |  SELECT doc_id, s.s AS s,
      |    ('0x' || substring(md5('route' || '|' ||
      |      CAST(doc_id AS VARCHAR) || '|' || CAST(s.s AS VARCHAR)),
      |      1, 15))::BIGINT AS key
      |  FROM documents CROSS JOIN (SELECT unnest(range(0, 10)) AS s) s)
      |SELECT doc_id, CAST(arg_max(s, key) AS INT) AS shard
      |FROM r GROUP BY doc_id""".stripMargin

  /** Declared q57: 2000-token shards over the documents fixture. */
  def q57TokenShards(spark: SparkSession, d: String): DataFrame =
    tokenShards(Tables.documents(spark, d), "doc_id", "text", budgetTokens = 2000L)

  val q57Sql: String =
    """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS tok FROM documents),
      |c AS (SELECT doc_id, tok,
      |  COALESCE(sum(tok) OVER (ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
      | FROM t)
      |SELECT CAST(floor(prior / 2000.0) AS BIGINT) AS shard_id,
      | count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS total_tokens
      |FROM c GROUP BY 1""".stripMargin

  /** Deterministic stratified sampling: keep a document iff its
    * md5-derived uniform in [0,1) falls under its stratum's rate — the
    * reproducible (re-runnable, engine-portable) way to rebalance a
    * corpus by language/source/quality tier. No RNG state: the "random"
    * draw is a pure function of the id, so the sample is stable across
    * runs, engines, and partitionings, and composable (a doc's fate
    * never depends on other docs).
    */
  def stratifiedSample(
      docs: DataFrame,
      idCol: String,
      stratumCol: String,
      rates: Map[String, Double],
      defaultRate: Double): DataFrame = {
    val u = graft.functions.GraftFunctions
      .hexLong(substring(md5(col(idCol).cast(StringType)), 1, 15))
      .cast(DoubleType) / lit((1L << 60).toDouble)
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(stratumCol) === k, lit(r)).otherwise(acc)
    }
    docs.where(u < rate)
  }

  /** Declared q58: keep 50% of English, 20% of everything else. */
  def q58StratifiedSample(spark: SparkSession, d: String): DataFrame =
    stratifiedSample(Tables.documents(spark, d), "doc_id", "lang",
      Map("en" -> 0.5), defaultRate = 0.2)
      .select(col("doc_id"), col("lang"))

  val q58Sql: String =
    """SELECT doc_id, lang FROM documents
      |WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      |   / 1152921504606846976.0
      |  < CASE WHEN lang = 'en' THEN 0.5 ELSE 0.2 END""".stripMargin

  /** Deterministic QUOTA sampling: exactly min(quota, |stratum|)
    * documents per stratum, chosen by md5-hash order — the eval-set /
    * human-review-batch construction step where a FIXED count per
    * language/source matters (rate-based [[stratifiedSample]] only
    * hits a count in expectation). The hash order is a pure function
    * of (stratum, id): stable across runs, engines, and partitionings,
    * and adding documents to a stratum can only displace the
    * hash-largest picks — no RNG state, no global sort.
    *
    * Scale shape: one hash shuffle on the stratum key; the windowed
    * rank with the filter directly above it compiles to
    * WindowGroupLimit, so each partition retains only `quota` rows per
    * stratum during the shuffle read.
    *
    * @return input columns plus `sample_rank` (1-based within stratum)
    */
  def quotaSample(
      docs: DataFrame,
      idCol: String,
      stratumCol: String,
      quota: Int): DataFrame = {
    val u = md5(concat_ws("|", col(stratumCol), col(idCol).cast(StringType)))
    val w = Window.partitionBy(col(stratumCol)).orderBy(u, col(idCol))
    docs.withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= quota)
  }

  /** Declared q95: exactly 30 docs per language (or the whole stratum
    * when smaller).
    */
  def q95QuotaSample(spark: SparkSession, d: String): DataFrame =
    quotaSample(Tables.documents(spark, d), "doc_id", "lang", quota = 30)
      .select(col("doc_id"), col("lang"), col("sample_rank"))

  val q95Sql: String =
    """SELECT doc_id, lang, CAST(rn AS INT) AS sample_rank FROM (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(lang || '|' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 30""".stripMargin

  /** Per-domain document caps — the web-corpus balancing step that stops
    * a handful of giant domains from dominating the training mix
    * (RefinedWeb/C4 keep per-host quotas; same idea here, keyed on any
    * domain column). Deterministic preference order inside a domain:
    * longest documents first, doc id as tiebreak, so reruns and engines
    * agree row-for-row.
    *
    * Scale shape: one hash shuffle on the domain key, then a windowed
    * rank with the filter directly above it — Spark compiles that to
    * WindowGroupLimit, so each partition keeps only `cap` rows per
    * domain during the shuffle read; no domain's full posting list is
    * ever materialized.
    */
  def domainCap(
      docs: DataFrame,
      idCol: String,
      domainCol: String,
      qualityCol: String,
      cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(col(qualityCol).desc, col(idCol))
    docs.withColumn("__rank", row_number().over(w))
      .where(col("__rank") <= cap)
      .drop("__rank")
  }

  /** Declared q62: at most 8 docs per source, longest-first. */
  def q62DomainCap(spark: SparkSession, d: String): DataFrame =
    domainCap(Tables.documents(spark, d), "doc_id", "source", "n_chars", 8)
      .select(col("doc_id"), col("source"), col("n_chars"))

  val q62Sql: String =
    """SELECT doc_id, source, n_chars FROM (
      |  SELECT doc_id, source, n_chars,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY n_chars DESC, doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= 8""".stripMargin

  /** Deterministic corpus shuffle — the training-order randomization
    * step: every epoch pipeline needs documents in a pseudorandom order
    * that is REPRODUCIBLE (resume from a checkpoint, re-run a job, share
    * the order across engines). Position = rank of md5(seed ‖ id): the
    * hash gives uniform dispersion, the seed gives a different
    * permutation per epoch, and no RNG state exists anywhere.
    *
    * Scale shape: a global sort — Spark range-partitions on the hash
    * (sampled boundaries), so the sort is fully distributed; nothing
    * single-node. This is the one operator where a total order is the
    * POINT, so the sort is irreducible.
    */
  def deterministicShuffle(
      docs: DataFrame,
      idCol: String,
      seed: String): DataFrame = {
    // An unpartitioned row_number() window would move the whole corpus
    // to ONE partition. Instead: distributed range-partitioned sort on
    // the hash, then zipWithIndex — partition k's indexes all precede
    // partition k+1's (range partitioning orders the partitions), so
    // positions equal the global hash rank with no single-node stage.
    val spark = docs.sparkSession
    val kc = "__graft_shuffle_key"
    val sorted = docs
      .withColumn(kc, md5(concat(lit(seed), lit("|"), col(idCol).cast(StringType))))
      .repartitionByRange(spark.sparkContext.defaultParallelism, col(kc))
      .sortWithinPartitions(kc)
    val outSchema = org.apache.spark.sql.types.StructType(
      docs.schema.fields.toSeq :+
        org.apache.spark.sql.types.StructField("position", LongType, nullable = false))
    val n = docs.schema.size
    val rows = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq.take(n) :+ (i + 1))
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Declared q67: epoch-0 shuffle order of the documents fixture. */
  def q67Shuffle(spark: SparkSession, d: String): DataFrame =
    deterministicShuffle(Tables.documents(spark, d), "doc_id", "epoch0")
      .select(col("doc_id"), col("position"))

  val q67Sql: String =
    """SELECT doc_id,
      |  row_number() OVER (ORDER BY md5('epoch0' || '|' || CAST(doc_id AS VARCHAR)))
      |    AS position
      |FROM documents""".stripMargin

  /** Length-bucketed batch assignment — pad-efficient batching for
    * training/inference: documents are bucketed by length so each batch
    * holds similar-length sequences (padding waste is bounded by the
    * bucket width), then numbered into fixed-size batches inside the
    * bucket in a deterministic order. Returns (id, bucket, batch_idx).
    *
    * Scale shape: one shuffle on the bucket key, ranking within buckets
    * only — no global sort, no driver state; bucket count is chosen by
    * the caller so partitions stay balanced.
    */
  def lengthBucketedBatches(
      docs: DataFrame,
      idCol: String,
      lengthCol: String,
      bucketWidth: Int,
      batchSize: Int): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0, "bucketWidth and batchSize must be positive")
    val bucket = floor(col(lengthCol).cast(DoubleType) / bucketWidth).cast(LongType)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(bucket).orderBy(col(idCol))
    docs.select(
      col(idCol),
      bucket.as("bucket"),
      (floor((row_number().over(w) - 1).cast(DoubleType) / batchSize))
        .cast(LongType).as("batch_idx"))
  }

  /** Declared q68: 50-char buckets, batches of 8. */
  def q68LengthBatches(spark: SparkSession, d: String): DataFrame =
    lengthBucketedBatches(Tables.documents(spark, d), "doc_id", "n_chars", 50, 8)

  val q68Sql: String =
    """SELECT doc_id,
      |  CAST(floor(n_chars / 50.0) AS BIGINT) AS bucket,
      |  CAST(floor((row_number() OVER (
      |      PARTITION BY CAST(floor(n_chars / 50.0) AS BIGINT)
      |      ORDER BY doc_id) - 1) / 8.0) AS BIGINT) AS batch_idx
      |FROM documents""".stripMargin

  /** Fixed-size token chunking with overlap — the doc→context-window
    * splitter every RAG/pretraining pipeline needs. Chunk starts advance
    * by `chunkSize - overlap` tokens; the tail chunk may be short but is
    * never empty; a doc shorter than one chunk yields itself. Pure
    * per-row array expressions (no shuffle, no state): at 100 TB this is
    * a map-only pass.
    *
    * Chunk-count arithmetic uses an explicit `floor` before the integer
    * cast: Spark truncates double→int while other engines round, so the
    * floor keeps the formula engine-portable (the oracle replicates it
    * verbatim).
    */
  def chunk(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    val toks = split(col(textCol), " ")
    val n = size(toks)
    val nChunks = when(n <= chunkSize, lit(1)).otherwise(
      floor((n - chunkSize).cast("double") / stride).cast("int") + lit(2) -
        // a final window that would start past the last token is dropped:
        // starts are 0, stride, 2*stride, ...; the +2 counts the first
        // full window plus the ceil of the remainder — when the remainder
        // divides evenly the extra start coincides with the end and would
        // produce an empty chunk
        when(((n - chunkSize) % stride) === 0, lit(1)).otherwise(lit(0)))
    docs.select(
      col(idCol),
      posexplode(transform(sequence(lit(0), nChunks - 1),
        i => concat_ws(" ", slice(toks, i * stride + 1, lit(chunkSize))))))
      .select(col(idCol), col("pos").as("chunk_idx"),
        col("col").as("chunk_text"),
        size(split(col("col"), " ")).as("chunk_tokens"))
  }

  /** Declared q63: 32-token chunks with 8-token overlap. */
  def q63Chunk(spark: SparkSession, d: String): DataFrame =
    chunk(Tables.documents(spark, d), "doc_id", "text", 32, 8)

  val q63Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks,
      |    len(string_split(text, ' ')) AS n
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, toks,
      |    CASE WHEN n <= 32 THEN 1
      |         ELSE CAST(floor((n - 32) / 24.0) AS INT) + 2 -
      |           CASE WHEN (n - 32) % 24 = 0 THEN 1 ELSE 0 END
      |    END AS n_chunks
      |  FROM t)
      |SELECT doc_id,
      |  x.i AS chunk_idx,
      |  array_to_string(toks[x.i * 24 + 1 : x.i * 24 + 32], ' ') AS chunk_text,
      |  len(toks[x.i * 24 + 1 : x.i * 24 + 32]) AS chunk_tokens
      |FROM c, LATERAL (
      |  SELECT unnest(generate_series(0, n_chunks - 1)) AS i) AS x""".stripMargin

  /** Declared q192: q63's chunking through the NATIVE user-defined
    * table function [[graft.functions.ChunkTokens]] instead of the HOF
    * chain — same parameters (32-token chunks, 8 overlap), same output
    * columns, same DuckDB oracle. The `expr` call resolves the
    * `chunk_tokens` Generator registered by
    * [[graft.functions.GraftExtensions]], and the analyzer plans it as
    * `GenerateExec` (LATERAL VIEW), so the two declared queries pin the
    * Generator surface end-to-end: registration → resolution →
    * execution → bit-identical rows (the parity spec compares against
    * [[chunk]] directly; the oracle catches either path drifting).
    */
  def q192ChunkUdtf(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"), expr("chunk_tokens(text, 32, 8)"))

  val q192Sql: String = q63Sql

  /** Order-invariant corpus content digest (declared q82): per source,
    * a fingerprint of the document CONTENTS that any engine, any
    * partitioning, and any row order reproduce bit-for-bit — XOR and
    * sum of md5-derived per-doc words plus the doc count. The
    * dataset-versioning primitive: two pipelines producing the same
    * digest hold the same corpus, a changed digest pinpoints the
    * source that drifted. One projection + one hash aggregate; both
    * combiners are commutative/associative, so map-side partial
    * aggregation applies at any scale.
    */
  def corpusDigest(
      docs: DataFrame,
      groupCol: String,
      contentCols: Seq[String]): DataFrame = {
    val word = graft.functions.GraftFunctions.hexLong(substring(md5(
      concat_ws("\u0001", contentCols.map(col): _*)), 1, 12))
    docs.select(col(groupCol), word.as("__w"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        bit_xor(col("__w")).as("digest_xor"),
        sum(col("__w")).as("digest_sum"))
  }

  def q82CorpusDigest(spark: SparkSession, d: String): DataFrame =
    corpusDigest(Tables.documents(spark, d), "source",
      Seq("doc_id", "text", "lang"))

  val q82Sql: String =
    """SELECT source, count(*) AS n_docs,
      | bit_xor(w) AS digest_xor, CAST(sum(w) AS BIGINT) AS digest_sum
      |FROM (
      |  SELECT source,
      |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || chr(1) || text
      |      || chr(1) || lang), 1, 12))::BIGINT AS w
      |  FROM documents)
      |GROUP BY source""".stripMargin

  /** Deterministic multi-source mixture (the Pile/Dolma training-mix
    * step): each source contributes its rows weighted by `weight` —
    * > 1 upsamples (whole copies plus a hash-sampled fractional copy),
    * < 1 downsamples. Keep rule for copy k of a row: md5-uniform over
    * (source, id, k) < weight − k, so membership is a pure per-row
    * expression — reproducible across runs, engines, and partitionings;
    * no RNG state, no shuffle. A 100 TB mix is a union of filtered
    * scans.
    *
    * @return input columns plus (source, copy)
    */
  def mixSources(
      sources: Seq[(String, DataFrame, Double)],
      idCol: String): DataFrame = {
    require(sources.nonEmpty, "mixSources needs at least one source")
    sources.map { case (name, df, w) =>
      require(w > 0, s"weight for '$name' must be positive, got $w")
      val copies = math.ceil(w).toInt
      val u = graft.functions.GraftFunctions.hexLong(substring(md5(
        concat_ws(":", lit(name), col(idCol).cast(StringType),
          col("copy").cast(StringType))), 1, 15))
        .cast(DoubleType) / lit((1L << 60).toDouble)
      df.withColumn("copy", explode(sequence(lit(0), lit(copies - 1))))
        .where(u < lit(w) - col("copy"))
        .withColumn("source", lit(name))
    }.reduce(_ unionByName _)
  }

  /** Declared q75: upsample English 1.5×, downsample the rest to 0.5×
    * — the canonical "more of the good stuff" rebalance.
    */
  def q75Mixture(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("lang"))
    mixSources(Seq(
      ("en", docs.where(col("lang") === "en"), 1.5),
      ("rest", docs.where(col("lang") =!= "en"), 0.5)), "doc_id")
      .select(col("doc_id"), col("lang"), col("copy"), col("source"))
  }

  val q75Sql: String =
    """WITH b AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN lang = 'en' THEN 'en' ELSE 'rest' END AS source,
      |    CASE WHEN lang = 'en' THEN 1.5 ELSE 0.5 END AS w
      |  FROM documents),
      |c AS (SELECT doc_id, lang, source, w, unnest([0, 1]) AS copy FROM b)
      |SELECT doc_id, lang, copy, source FROM c
      |WHERE ('0x' || substring(md5(source || ':' || CAST(doc_id AS VARCHAR)
      |    || ':' || CAST(copy AS VARCHAR)), 1, 15))::BIGINT
      |   / 1152921504606846976.0 < w - copy""".stripMargin

  /** Greedy next-fit sequence packing — the step that turns a cleaned
    * corpus into fixed-token-budget training sequences: documents are
    * hash-sharded, each shard is walked in deterministic order, and a
    * document opens a new pack whenever it would overflow the current
    * one (a document longer than the budget gets a pack of its own).
    * This is the packing rule the big pretraining pipelines use
    * (next-fit, not best-fit: one pass, no lookahead, stable under
    * streaming) — chunking (q63) splits docs, length-bucketing (q68)
    * batches them, THIS assembles them into sequences.
    *
    * Packing is inherently sequential, so the parallelism unit is the
    * shard: an md5-derived hash spreads documents uniformly, one
    * shuffle groups each shard, and the greedy walk runs inside a
    * bounded `aggregate` lambda over the shard's sorted doc list. The
    * caller sizes `numShards` so shards stay a few hundred docs — at
    * 100 TB that means more shards, never bigger ones; there is no
    * global sort, no driver state, and no cross-shard dependency.
    *
    * @return (shard, idCol, tokens, pack_id) — pack_id is 1-based and
    *         scoped to its shard
    */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int,
      numShards: Int): DataFrame = {
    require(budget > 0 && numShards > 0, "budget and numShards must be positive")
    val idType = docs.schema(idCol).dataType
    val elemType = ArrayType(StructType(Seq(
      StructField("id", idType),
      StructField("tokens", LongType),
      StructField("pack", LongType))))
    val tokens = size(split(col(textCol), " ")).cast(LongType)
    val shard = pmod(
      graft.functions.GraftFunctions.hexLong(substring(md5(concat_ws("|",
        lit("pack"), col(idCol).cast(StringType))), 1, 6)),
      lit(numShards.toLong))
    val base = docs.select(shard.as("shard"), col(idCol).as("id"),
      tokens.as("tokens"))
    // fill starts past the budget so the first document always opens
    // pack 1; an oversized document overflows whatever is open AND
    // leaves fill > budget, so the next document opens a fresh pack too
    val zero = struct(
      lit(0L).as("pack"), lit(budget.toLong + 1L).as("fill"),
      array().cast(elemType).as("out"))
    val b = lit(budget.toLong)
    base.groupBy(col("shard"))
      .agg(sort_array(collect_list(struct(col("id"), col("tokens")))).as("ds"))
      .select(col("shard"), explode(aggregate(col("ds"), zero,
        (acc, x) => {
          val over = acc.getField("fill") + x.getField("tokens") > b
          val pack = when(over, acc.getField("pack") + 1L)
            .otherwise(acc.getField("pack"))
          struct(
            pack.as("pack"),
            when(over, x.getField("tokens"))
              .otherwise(acc.getField("fill") + x.getField("tokens"))
              .as("fill"),
            concat(acc.getField("out"), array(struct(
              x.getField("id").as("id"),
              x.getField("tokens").as("tokens"),
              pack.as("pack")))).as("out"))
        },
        acc => acc.getField("out"))).as("e"))
      .select(col("shard"), col("e.id").as(idCol),
        col("e.tokens").as("tokens"), col("e.pack").as("pack_id"))
  }

  /** Declared q83: 256-token packs over 16 shards. */
  def q83Pack(spark: SparkSession, d: String): DataFrame =
    packSequences(Tables.documents(spark, d), "doc_id", "text", 256, 16)

  val q83Sql: String =
    """WITH RECURSIVE base AS (
      |  SELECT doc_id,
      |    ('0x' || substring(md5('pack' || '|' || CAST(doc_id AS VARCHAR)),
      |      1, 6))::BIGINT % 16 AS shard,
      |    len(string_split(text, ' ')) AS tokens
      |  FROM documents),
      |o AS (
      |  SELECT doc_id, shard, tokens,
      |    row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      |  FROM base),
      |walk AS (
      |  SELECT doc_id, shard, tokens, rn, 1::BIGINT AS pack_id, tokens AS fill
      |  FROM o WHERE rn = 1
      |  UNION ALL
      |  SELECT o.doc_id, o.shard, o.tokens, o.rn,
      |    CASE WHEN w.fill + o.tokens > 256 THEN w.pack_id + 1
      |         ELSE w.pack_id END,
      |    CASE WHEN w.fill + o.tokens > 256 THEN o.tokens
      |         ELSE w.fill + o.tokens END
      |  FROM walk w JOIN o ON o.shard = w.shard AND o.rn = w.rn + 1)
      |SELECT shard, doc_id, tokens, pack_id FROM walk""".stripMargin

  /** Per-source token-distribution KL divergence against the corpus —
    * the mixture-drift signal: how far each source's unigram
    * distribution sits from the overall mix. Used to pick mixture
    * weights (q75), catch a source whose content shifted between
    * crawls, and rank sources by distinctiveness. KL(p_s ‖ p_corpus)
    * = Σ_t p_s(t)·ln(p_s(t)/p(t)); every term is well-defined because
    * each source's tokens are part of the corpus total (q ≥ p/N > 0).
    *
    * Shape at scale: ONE explode over the corpus builds the
    * (source, token, count) relation; the per-source totals, the
    * corpus-wide token counts, and the grand total all derive from it
    * (no second pass). The only data-scale shuffle is vocabulary-keyed;
    * the grand total is a broadcast one-row aggregate (the TF-IDF
    * pattern), and source totals broadcast too (sources are few).
    *
    * @return (source, n_tokens, kl)
    */
  def sourceDivergence(
      docs: DataFrame,
      sourceCol: String,
      textCol: String): DataFrame = {
    // the explicit non-null filter on BOTH grouping keys matters: the three
    // downstream joins would otherwise push different isnotnull() filters
    // into their copy of this subtree, the subtrees would stop being
    // identical, and ReuseExchange could no longer collapse them — the
    // corpus would be exploded once per consumer instead of once
    // (PlanShapeSpec pins the single-explode shape)
    val st = docs
      .select(col(sourceCol).as("source"),
        explode(split(col(textCol), " ")).as("tok"))
      .where(col("source").isNotNull && col("tok").isNotNull)
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val perSource = st.groupBy(col("source")).agg(sum(col("c")).as("n_s"))
    val perToken = st.groupBy(col("tok")).agg(sum(col("c")).as("c_t"))
    val total = perSource.agg(sum(col("n_s")).as("n"))
    val p = col("c").cast(DoubleType) / col("n_s")
    val q = col("c_t").cast(DoubleType) / col("n")
    st.join(broadcast(perSource), Seq("source"))
      .join(perToken, Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy(col("source"), col("n_s").as("n_tokens"))
      .agg(sum(p * log(p / q)).as("kl"))
  }

  /** Declared q84: source-vs-corpus unigram KL over the documents
    * fixture.
    */
  def q84SourceKl(spark: SparkSession, d: String): DataFrame =
    sourceDivergence(Tables.documents(spark, d), "source", "text")

  val q84Sql: String =
    """WITH tk AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |st AS (SELECT source, tok, count(*) AS c FROM tk GROUP BY 1, 2),
      |s AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM st GROUP BY 1),
      |t AS (SELECT tok, CAST(sum(c) AS BIGINT) AS c_t FROM st GROUP BY 1),
      |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM st)
      |SELECT st.source, s.n_s AS n_tokens,
      |  sum((c / n_s) * ln((c / n_s) / (c_t / n.n))) AS kl
      |FROM st JOIN s USING (source) JOIN t USING (tok) CROSS JOIN n
      |GROUP BY 1, 2""".stripMargin

  /** Quality-proportional importance resampling (the FineWeb/DSIR-style
    * step after hard filtering): each document is kept with probability
    * equal to a per-document weight in [0, 1], using the same
    * md5-derived uniform as [[mixSources]] — reproducible across runs,
    * engines, and partitionings, no RNG state, no shuffle. Documents
    * the weight likes are kept (almost) always; low-weight documents
    * survive at their weight's rate instead of being cliff-dropped,
    * which preserves distributional coverage a hard threshold destroys.
    *
    * The weight is caller-supplied as a Column so any signal plugs in
    * (model score, lexical diversity, source prior). A 100 TB corpus
    * passes through as ONE filtered scan: keep/drop is a pure per-row
    * expression.
    *
    * @return kept rows: (idCol, weight, u) — emitting the uniform makes
    *         the keep decision auditable downstream
    */
  def importanceSample(
      docs: DataFrame,
      idCol: String,
      weight: Column,
      salt: String = "imp"): DataFrame = {
    val u = graft.functions.GraftFunctions
      .hexLong(substring(md5(concat_ws("|", lit(salt),
        col(idCol).cast(StringType))), 1, 15))
      .cast(DoubleType) / lit((1L << 60).toDouble)
    docs.select(col(idCol), weight.as("weight"), u.as("u"))
      .where(col("u") < col("weight"))
  }

  /** Declared q86: resample by lexical diversity (distinct-token ratio —
    * token-soup repetition scores low, varied text scores high). The
    * ratio is a per-row array expression: no explode, no shuffle.
    */
  def q86ImportanceSample(spark: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), " ")
    val diversity = size(array_distinct(toks)).cast(DoubleType) /
      size(toks).cast(DoubleType)
    importanceSample(Tables.documents(spark, d), "doc_id", diversity)
  }

  val q86Sql: String =
    """SELECT doc_id, weight, u FROM (
      |  SELECT doc_id,
      |    len(list_distinct(string_split(text, ' ')))
      |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS weight,
      |    ('0x' || substring(md5('imp' || '|' || CAST(doc_id AS VARCHAR)),
      |      1, 15))::BIGINT / 1152921504606846976.0 AS u
      |  FROM documents)
      |WHERE u < weight""".stripMargin

  /** Per-source dataset card — the governance summary every corpus
    * release ships: doc and token volume, language purity, exact-dup
    * rate, lexical diversity, and the token-length median, one row per
    * source. This is the composition layer over the pipeline's
    * signals: the numbers a mixture designer (q75), a contamination
    * reviewer (q56), or a release auditor reads first.
    *
    * Shape at scale: ONE grouped pass — every signal is a per-row
    * expression aggregated in the same groupBy (the exact-distinct
    * fingerprint count rides the same shuffle via Expand); no joins,
    * no second scan, no driver math.
    */
  def datasetCard(
      docs: DataFrame,
      sourceCol: String,
      textCol: String,
      langCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val base = docs.select(col(sourceCol).as("source"),
      size(toks).cast(LongType).as("__nt"),
      (col(langCol) === "en").cast(DoubleType).as("__en"),
      md5(col(textCol)).as("__fp"),
      (size(array_distinct(toks)).cast(DoubleType) /
        size(toks).cast(DoubleType)).as("__div"))
    base.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("__nt")).as("total_tokens"),
      avg(col("__en")).as("pct_en"),
      (lit(1.0) - countDistinct(col("__fp")).cast(DoubleType) /
        count(lit(1)).cast(DoubleType)).as("dup_rate"),
      avg(col("__div")).as("mean_diversity"),
      expr("median(CAST(__nt AS DOUBLE))").cast(DoubleType).as("median_tokens"))
  }

  /** Declared q89: the dataset card of the documents fixture. */
  def q89DatasetCard(spark: SparkSession, d: String): DataFrame =
    datasetCard(Tables.documents(spark, d), "source", "text", "lang")

  val q89Sql: String =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
      |  avg(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END) AS pct_en,
      |  1.0 - count(DISTINCT md5(text)) / CAST(count(*) AS DOUBLE) AS dup_rate,
      |  avg(len(list_distinct(string_split(text, ' ')))
      |    / CAST(len(string_split(text, ' ')) AS DOUBLE)) AS mean_diversity,
      |  CAST(median(CAST(len(string_split(text, ' ')) AS DOUBLE)) AS DOUBLE)
      |    AS median_tokens
      |FROM documents GROUP BY source""".stripMargin

  /** Per-source quality calibration: the percent-rank of a quality
    * score WITHIN its source — the normalization step that makes
    * scores comparable across sources before a global keep-threshold
    * or mixture weight is applied (a raw score cliff that keeps 80% of
    * curated text would annihilate a noisier crawl; percentiles keep
    * the same fraction of each source's own distribution). Ties break
    * on the id so the rank is total and engine-reproducible.
    *
    * Shape at scale: one shuffle on the source key; the rank window
    * sorts within each source partition only — no global sort. Sources
    * are the partition unit, so a giant source dominates its partition:
    * at 100 TB, pre-split hot sources by a salt column if one source is
    * most of the corpus (the quality signal is i.i.d. within a source,
    * so salted percentiles converge to the same calibration).
    */
  def calibrateQuality(
      docs: DataFrame,
      idCol: String,
      sourceCol: String,
      score: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(score.asc, col(idCol).asc)
    docs.select(col(idCol), col(sourceCol).as("source"),
      score.as("score"), percent_rank().over(w).as("pct_in_source"))
  }

  /** Declared q91: lexical-diversity calibration per source. */
  def q91QualityCalibration(spark: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), " ")
    calibrateQuality(Tables.documents(spark, d), "doc_id", "source",
      size(array_distinct(toks)).cast(DoubleType) /
        size(toks).cast(DoubleType))
  }

  val q91Sql: String =
    """SELECT doc_id, source, score,
      |  percent_rank() OVER (PARTITION BY source ORDER BY score, doc_id)
      |    AS pct_in_source
      |FROM (
      |  SELECT doc_id, source,
      |    len(list_distinct(string_split(text, ' ')))
      |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS score
      |  FROM documents)""".stripMargin

  /** Leakage-free train/val/test split: the split is drawn per CLUSTER,
    * not per document, so a group of near-duplicates can never straddle
    * the boundary — the classic eval-contamination bug where the test
    * set "generalizes" to near-copies of training docs. Input is any
    * (row → cluster label) assignment (exact-dup fingerprints, Jaccard
    * components, semantic clusters); singletons are their own cluster.
    * The draw is the same md5 uniform as [[mixSources]]: deterministic,
    * partitioning-invariant, a pure per-row expression over the cluster
    * label — at 100 TB the split is a map-only pass over the
    * already-clustered corpus.
    */
  def clusterSplit(
      assignments: DataFrame,
      clusterCol: String,
      trainFrac: Double = 0.8,
      valFrac: Double = 0.1,
      salt: String = "split"): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1,
      s"need trainFrac > 0, valFrac >= 0, trainFrac + valFrac < 1; " +
        s"got $trainFrac/$valFrac")
    val u = graft.functions.GraftFunctions
      .hexLong(substring(md5(concat_ws("|", lit(salt),
        col(clusterCol).cast(StringType))), 1, 15))
      .cast(DoubleType) / lit((1L << 60).toDouble)
    assignments.withColumn("split",
      when(u < trainFrac, "train")
        .when(u < trainFrac + valFrac, "val")
        .otherwise("test"))
  }

  /** Weighted sampling WITHOUT replacement — Efraimidis–Spirakis
    * exponential races: each row gets key = ln(u)/w (u the md5-derived
    * uniform, w its weight) and the global top-k by key IS an exact
    * weighted sample without replacement. Unlike [[importanceSample]]
    * (independent keep/drop, random output size), this returns EXACTLY
    * k rows, the contract a "sample 10k docs for eval, bigger docs
    * proportionally more often" request carries.
    *
    * Scale shape: the key is a pure per-row expression and the top-k is
    * TakeOrderedAndProject — per-partition heaps of k rows merged on
    * the driver, never a global sort, no shuffle of the corpus. Like
    * every sampler here the draw is md5-derived: reproducible across
    * runs, engines, and partitionings, which is what makes the DuckDB
    * oracle replay exact.
    */
  def weightedSample(
      docs: DataFrame,
      idCol: String,
      weight: Column,
      k: Int,
      salt: String = "wsample"): DataFrame = {
    val u = graft.functions.GraftFunctions
      .hexLong(substring(md5(concat_ws("|", lit(salt),
        col(idCol).cast(StringType))), 1, 15))
      .cast(DoubleType) / lit((1L << 60).toDouble)
    // filter BEFORE the key projection: ANSI mode makes ln(u)/0 an
    // error, not an infinity, so zero-weight rows must never reach it
    docs.where(weight.cast(DoubleType) > 0)
      .select(col(idCol), weight.cast(DoubleType).as("weight"),
        (log(u) / weight.cast(DoubleType)).as("key"))
      .orderBy(col("key").desc, col(idCol))
      .limit(k)
  }

  /** Declared q109: 200 documents drawn without replacement with
    * probability proportional to token count (the "sample an eval set,
    * long docs proportionally more" draw).
    */
  def q109WeightedSample(spark: SparkSession, d: String): DataFrame =
    weightedSample(Tables.documents(spark, d), "doc_id",
      size(split(col("text"), " ")), k = 200)

  val q109Sql: String =
    """SELECT doc_id, weight, key FROM (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS weight,
      |    ln(('0x' || substring(md5('wsample' || '|' ||
      |        CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      |      / 1152921504606846976.0)
      |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS key
      |  FROM documents)
      |WHERE weight > 0
      |ORDER BY key DESC, doc_id LIMIT 200""".stripMargin

  /** Deterministic proportional stratified sampling — exactly
    * ⌈frac·n_h⌉ rows from every stratum, chosen by a salted md5 order
    * (the q109 determinism scheme), so every stratum of a mixed corpus
    * is represented at the same rate regardless of skew — the
    * eval-slice / data-card sampler where uniform sampling would
    * starve small sources.
    *
    * Scale shape: one shuffle on the stratum key; stratum sizes and
    * ranks come from two window passes over that same partitioning
    * (Catalyst plans one exchange + one sort). Exact per-stratum k
    * requires the per-stratum rank — that sort is the price of
    * exactness; when approximate rates suffice at extreme scale, the
    * salted-hash THRESHOLD filter (keep iff u < frac — a pure
    * projection, no shuffle at all) is the documented fallback with
    * binomial rather than exact stratum counts.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      frac: Double, salt: String): DataFrame = {
    val key = md5(concat_ws("|", lit(salt), col(idCol).cast("string")))
    val w = Window.partitionBy(col(stratumCol)).orderBy(key, col(idCol))
    val cw = Window.partitionBy(col(stratumCol))
    df.select(col(stratumCol), col(idCol))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__nh", count(lit(1)).over(cw))
      .where(col("__rn") <= ceil(col("__nh") * lit(frac)))
      .select(col(stratumCol), col(idCol))
  }

  /** Declared q160: 20% per-source stratified sample of the corpus. */
  def q160StratifiedSample(spark: SparkSession, d: String): DataFrame =
    stratifiedSample(graft.core.Tables.documents(spark, d),
      "source", "doc_id", frac = 0.2, salt = "strat")

  val q160Sql: String =
    """WITH r AS (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5('strat' || '|' || CAST(doc_id AS VARCHAR)),
      |        doc_id) AS rn,
      |    count(*) OVER (PARTITION BY source) AS nh
      |  FROM documents)
      |SELECT source, doc_id FROM r
      |WHERE rn <= ceil(nh * 0.2)""".stripMargin

  /** Weighted log-odds distinctive terms per source (Monroe, Colaresi
    * & Quinn 2008, "Fightin' Words", informative Dirichlet prior) —
    * WHICH tokens make a source different, where [[sourceDivergence]]
    * says only how much. For token w in source s with count y_sw,
    * source total n_s, corpus count y_w, corpus total N, and prior
    * a_w = a0·y_w/N:
    *
    *   δ = ln((y_sw+a_w)/(n_s+a0−y_sw−a_w)) − ln((y_w+a_w)/(N+a0−y_w−a_w))
    *   z = δ / sqrt(1/(y_sw+a_w) + 1/(y_w+a_w))
    *
    * The z-scored odds shrink rare-token noise (the raw-PMI failure
    * mode) without a frequency cutoff. Top-`perSource` by (z, token).
    *
    * Scale shape: the q84 single-explode discipline — one
    * (source, token, count) aggregate feeds marginals and the scoring
    * join; ranking is a per-source window over vocabulary-bounded
    * rows.
    */
  def logOddsKeywords(docs: DataFrame, sourceCol: String, textCol: String,
      a0: Double = 100.0, perSource: Int = 5): DataFrame = {
    val st = docs
      .select(col(sourceCol).as("source"),
        explode(split(col(textCol), " ")).as("tok"))
      .where(col("source").isNotNull && col("tok").isNotNull)
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("__y"))
      .localCheckpoint()
    val perSrc = st.groupBy(col("source")).agg(sum(col("__y")).as("__ns"))
    val perTok = st.groupBy(col("tok")).agg(sum(col("__y")).as("__yw"))
    val tot = perSrc.agg(sum(col("__ns")).as("__n"))
    val aw = lit(a0) * col("__yw") / col("__n")
    val num = (col("__y") + aw) /
      (col("__ns") + lit(a0) - col("__y") - aw)
    val den = (col("__yw") + aw) /
      (col("__n") + lit(a0) - col("__yw") - aw)
    val delta = log(num) - log(den)
    val z = delta / sqrt(lit(1.0) / (col("__y") + aw) +
      lit(1.0) / (col("__yw") + aw))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("__z").desc, col("tok"))
    st.join(broadcast(perSrc), Seq("source"))
      .join(perTok, Seq("tok"))
      .crossJoin(broadcast(tot))
      .withColumn("__z", z)
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= perSource)
      .select(col("source"), col("tok").as("token"),
        col("__y").as("n_in_source"), col("__yw").as("n_corpus"),
        col("__z").as("log_odds_z"))
  }

  /** Declared q167: top-5 distinctive tokens of every source. */
  def q167LogOddsKeywords(spark: SparkSession, d: String): DataFrame =
    logOddsKeywords(graft.core.Tables.documents(spark, d),
      "source", "text")

  val q167Sql: String =
    """WITH tk AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |st AS (SELECT source, tok, count(*) AS y FROM tk GROUP BY 1, 2),
      |s AS (SELECT source, CAST(sum(y) AS DOUBLE) AS ns FROM st GROUP BY 1),
      |t AS (SELECT tok, CAST(sum(y) AS DOUBLE) AS yw FROM st GROUP BY 1),
      |n AS (SELECT CAST(sum(y) AS DOUBLE) AS n FROM st),
      |z AS (
      |  SELECT st.source, st.tok, st.y, t.yw,
      |    (ln((st.y + 100.0 * t.yw / n.n)
      |        / (s.ns + 100.0 - st.y - 100.0 * t.yw / n.n))
      |     - ln((t.yw + 100.0 * t.yw / n.n)
      |        / (n.n + 100.0 - t.yw - 100.0 * t.yw / n.n)))
      |    / sqrt(1.0 / (st.y + 100.0 * t.yw / n.n)
      |         + 1.0 / (t.yw + 100.0 * t.yw / n.n)) AS z
      |  FROM st JOIN s USING (source) JOIN t USING (tok) CROSS JOIN n)
      |SELECT source, tok AS token, CAST(y AS BIGINT) AS n_in_source,
      |  CAST(yw AS BIGINT) AS n_corpus, z AS log_odds_z
      |FROM z
      |QUALIFY row_number() OVER (PARTITION BY source
      |  ORDER BY z DESC, tok) <= 5""".stripMargin

  /** Quality-gate attrition report — run the ingest filter cascade and
    * report where documents die: each doc is attributed to its FIRST
    * failing gate (gates in pipeline order), so the report reads as a
    * funnel ("22% die at the length gate, 9% at repetition…") — the
    * data-card table every corpus release publishes next to q50's
    * actual filter.
    *
    * Scale shape: one codegen projection computes every gate flag in a
    * single scan, one domain-bounded aggregate per stage.
    */
  def filterCascade(docs: DataFrame, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val nTok = size(toks)
    val uniqRatio = size(array_distinct(toks)).cast("double") / nTok
    val charsPerTok = length(col(textCol)).cast("double") / nTok
    val stage = when(nTok < 20, "1_too_short")
      .when(uniqRatio < 0.3, "2_repetitive")
      .when(charsPerTok > 12, "3_token_soup")
      .otherwise("4_pass")
    val n = docs.agg(count(lit(1)).as("__n"))
    docs.select(stage.as("stage"))
      .groupBy(col("stage")).agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(n))
      .select(col("stage"), col("n_docs"),
        (col("n_docs").cast("double") / col("__n")).as("frac"))
  }

  /** Declared q177: the corpus's gate-attrition funnel. */
  def q177FilterCascade(spark: SparkSession, d: String): DataFrame =
    filterCascade(graft.core.Tables.documents(spark, d), "text")

  val q177Sql: String =
    """WITH f AS (
      |  SELECT CASE
      |    WHEN len(string_split(text, ' ')) < 20 THEN '1_too_short'
      |    WHEN CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |         / len(string_split(text, ' ')) < 0.3 THEN '2_repetitive'
      |    WHEN CAST(length(text) AS DOUBLE)
      |         / len(string_split(text, ' ')) > 12 THEN '3_token_soup'
      |    ELSE '4_pass' END AS stage
      |  FROM documents),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM f)
      |SELECT stage, CAST(count(*) AS BIGINT) AS n_docs,
      |  count(*) / max(n.n) AS frac
      |FROM f CROSS JOIN n GROUP BY stage""".stripMargin

  /** Sampling-temperature mixture weights (mBERT/XLM-R's
    * exponentiated-share scheme): a group's sampling share is
    * p_g ∝ n_g^α with α ∈ (0,1] — α = 1 reproduces the natural
    * distribution, α → 0 flattens it, and the boost column
    * (temp share / natural share) is the per-group up/down-sampling
    * factor the q75 mixer would be fed. THE multilingual-balance
    * knob: without it, low-resource languages starve.
    *
    * Scale shape: one hash aggregate to group counts, one broadcast
    * scalar normalizer, one projection — group-domain-bounded after
    * the single pass.
    */
  def temperatureMixture(df: DataFrame, groupCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum(col("n_docs")).as("__tot"),
      sum(pow(col("n_docs").cast("double"), alpha)).as("__ptot"))
    counts.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_docs"),
        round(col("n_docs").cast("double") / col("__tot"), 6)
          .as("natural_share"),
        round(pow(col("n_docs").cast("double"), alpha) / col("__ptot"), 6)
          .as("temp_share"),
        round((pow(col("n_docs").cast("double"), alpha) / col("__ptot")) /
          (col("n_docs").cast("double") / col("__tot")), 6).as("boost"))
  }

  /** Declared q221: language balance at temperature α = 0.5. */
  def q221TemperatureMix(spark: SparkSession, d: String): DataFrame =
    temperatureMixture(
      graft.core.Tables.documents(spark, d), "lang", alpha = 0.5)

  val q221Sql: String =
    """WITH c AS (
      |  SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
      |t AS (
      |  SELECT CAST(sum(n_docs) AS DOUBLE) AS tot,
      |    sum(pow(CAST(n_docs AS DOUBLE), 0.5)) AS ptot
      |  FROM c)
      |SELECT lang, n_docs,
      |  round(n_docs / t.tot, 6) AS natural_share,
      |  round(pow(CAST(n_docs AS DOUBLE), 0.5) / t.ptot, 6) AS temp_share,
      |  round((pow(CAST(n_docs AS DOUBLE), 0.5) / t.ptot) /
      |    (n_docs / t.tot), 6) AS boost
      |FROM c CROSS JOIN t""".stripMargin

  /** One BPE merge-round statistic — the adjacent-character-pair
    * counts over the corpus word vocabulary, weighted by word
    * frequency: exactly the argmax table byte-pair-encoding tokenizer
    * training (Sennrich 2016) computes each round before applying the
    * top merge. Reported as the top-k ladder (count desc, pair asc —
    * pinned) rather than just the argmax, which is the report a
    * tokenizer-training pipeline actually reviews.
    *
    * Scale shape: the corpus collapses to its word-frequency VOCAB in
    * one hash aggregate (Heaps'-law-bounded — millions of words, not
    * corpus-sized); pair expansion walks each vocab word once via an
    * in-plan `sequence`/`transform` (no UDF, no re-scan), and the
    * ladder is a pair-domain-bounded aggregate topped by one
    * WindowGroupLimit. Word length is capped at 63 chars in BOTH
    * engines (cross-engine parity for the expansion bound; longer
    * "words" are URL/garbage-shaped and excluded by contract).
    *
    * @return rank, pair, n_words (distinct vocab words containing),
    *         total (frequency-weighted occurrence count)
    */
  def bpePairCounts(docs: DataFrame, textCol: String,
      k: Int = 20): DataFrame = {
    require(k >= 1)
    val vocab = docs
      .select(explode(split(lower(col(textCol)), " ")).as("__w"))
      .where(length(col("__w")).between(2, 63))
      .groupBy(col("__w"))
      .agg(count(lit(1)).as("__f"))
    val pairs = vocab
      .select(col("__w"), col("__f"), explode(expr(
        "transform(sequence(1, length(__w) - 1), " +
          "i -> substring(__w, i, 2))")).as("pair"))
      .groupBy(col("pair"))
      .agg(countDistinct(col("__w")).as("n_words"),
        sum(col("__f")).as("total"))
    val ladder = Window.orderBy(col("total").desc, col("pair"))
    pairs.withColumn("rank", row_number().over(ladder))
      .where(col("rank") <= k)
      .select(col("rank"), col("pair"), col("n_words"), col("total"))
  }

  /** Declared q238: the top-20 BPE merge candidates over the
    * documents corpus.
    */
  def q238BpePairs(spark: SparkSession, d: String): DataFrame =
    bpePairCounts(Tables.documents(spark, d), "text", k = 20)

  val q238Sql: String =
    """WITH words AS (
      |  SELECT w, count(*) AS f FROM (
      |    SELECT unnest(string_split(lower(text), ' ')) AS w
      |    FROM documents)
      |  WHERE length(w) BETWEEN 2 AND 63 GROUP BY 1),
      |pos AS (SELECT CAST(range AS INT) AS i FROM range(1, 64)),
      |pairs AS (
      |  SELECT substr(w, i, 2) AS pair, w, f
      |  FROM words JOIN pos ON pos.i <= length(w) - 1)
      |SELECT CAST(row_number() OVER (ORDER BY sum(f) DESC, pair)
      |    AS INT) AS rank,
      |  pair, CAST(count(DISTINCT w) AS BIGINT) AS n_words,
      |  CAST(sum(f) AS BIGINT) AS total
      |FROM pairs GROUP BY pair
      |QUALIFY rank <= 20""".stripMargin

  /** Source-pair corpus overlap matrix — exact Jaccard similarity of
    * the distinct DISCRIMINATIVE word-shingle sets of every pair of
    * sources: the "which ingest feeds duplicate each other" audit that
    * decides dedup priority and mixture double-counting BEFORE any
    * document-level near-dup pass. Shingles carried by more than
    * `maxDocDf` documents are boilerplate (license headers, templated
    * navigation) and are excised from every set — the q138
    * fingerprint-overlap lesson: a corpus-wide shingle contributes to
    * every pairwise intersection while signalling nothing about shared
    * provenance, and it is exactly the key whose carrier list blows up
    * any shingle-keyed join.
    *
    * Scale shape: ONE wide aggregate keyed on the shingle collapses
    * the per-document-distinct shingle relation to (shingle → doc
    * frequency, source set) — `collect_set` is bounded by the SOURCE
    * count, not the doc count, so the aggregate state is fixed-size
    * per key. Set sizes re-aggregate from the exploded source sets,
    * and pair intersections come from IN-ROW pair expansion of each
    * sorted source set (k ≤ #sources pairs per shingle, generated by a
    * higher-order transform — no self-join on the shingle key at all;
    * r7's (source, shingle) self-join paid a second full-relation
    * shuffle and was the one uncapped hot-key join left in the repo).
    * Pairs with an empty intersection are absent by contract (their
    * Jaccard is 0; emitting the full quadratic grid would be noise).
    *
    * @return src_a < src_b, n_a, n_b, inter, jaccard (6 dp)
    */
  def sourceOverlap(docs: DataFrame, sourceCol: String,
      textCol: String, shingleWidth: Int = 3,
      maxDocDf: Long = 20L): DataFrame = {
    require(shingleWidth >= 1)
    require(maxDocDf >= 2, s"maxDocDf < 2 empties every intersection")
    val perDoc = docs
      .select(col(sourceCol).as("__src"),
        split(lower(col(textCol)), " ").as("__toks"))
      // sequence with start > stop DESCENDS in Spark — short docs
      // need the explicit empty-array guard; array_distinct INSIDE the
      // row makes the exploded relation per-document-distinct, which
      // is what makes count(*) below a document frequency. Shingle
      // identity travels as a 64-bit hash, not the ~25-char string —
      // the output carries only SET CARDINALITIES, so any injective-
      // in-practice key works, and the hashed key roughly halves the
      // bytes through the one full-relation shuffle (collision odds
      // over an m-shingle vocabulary are ~m²/2⁶⁵ — ~10⁻⁷ at 5 M
      // shingles; a collision would merge two shingles' carrier sets,
      // deterministically per corpus)
      .select(col("__src"), explode(expr(
        s"CASE WHEN size(__toks) >= $shingleWidth THEN array_distinct(" +
          s"transform(sequence(0, size(__toks) - $shingleWidth), " +
          s"i -> xxhash64(array_join(slice(__toks, i + 1, $shingleWidth), ' ')))) " +
          "ELSE array() END")).as("__sh"))
    val bySh = perDoc.groupBy(col("__sh"))
      .agg(count(lit(1)).as("__df"),
        collect_set(col("__src")).as("__srcs"))
      .where(col("__df") <= maxDocDf)
      .select(array_sort(col("__srcs")).as("__srcs"))
      // feeds both the size and the pair aggregates — vocabulary-scale
      .localCheckpoint()
    val sizes = bySh
      .select(explode(col("__srcs")).as("__src"))
      .groupBy(col("__src"))
      .agg(count(lit(1)).as("__n"))
    val inter = bySh
      .select(explode(expr(
        "flatten(transform(__srcs, (a, i) -> " +
          "transform(slice(__srcs, i + 2, size(__srcs)), " +
          "b -> struct(a AS src_a, b AS src_b))))")).as("__p"))
      .select(col("__p.src_a").as("src_a"), col("__p.src_b").as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("__src").as("src_a"), col("__n").as("n_a")),
        Seq("src_a"))
      .join(sizes.select(col("__src").as("src_b"), col("__n").as("n_b")),
        Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("inter"),
        round(col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"), 6)
          .as("jaccard"))
  }

  /** Declared q239: the 20-source overlap matrix of the documents
    * corpus on word-3-shingles with document frequency ≤ 20.
    */
  def q239SourceOverlap(spark: SparkSession, d: String): DataFrame =
    sourceOverlap(Tables.documents(spark, d), "source", "text")

  val q239Sql: String =
    """WITH toks AS (
      |  SELECT source, string_split(lower(text), ' ') AS t FROM documents),
      |sh0 AS (
      |  SELECT source, unnest(list_distinct(list_transform(
      |    range(0, greatest(len(t) - 2, 0)),
      |    i -> concat_ws(' ', t[i + 1], t[i + 2], t[i + 3])))) AS sh
      |  FROM toks),
      |keep AS (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= 20),
      |rel AS (
      |  SELECT DISTINCT source, sh FROM sh0
      |  WHERE sh IN (SELECT sh FROM keep)),
      |sizes AS (SELECT source, count(*) AS n FROM rel GROUP BY 1),
      |inter AS (
      |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
      |  FROM rel a JOIN rel b ON a.sh = b.sh AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT src_a, src_b,
      |  CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
      |  CAST(inter AS BIGINT) AS inter,
      |  round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) AS jaccard
      |FROM inter
      |JOIN sizes sa ON sa.source = src_a
      |JOIN sizes sb ON sb.source = src_b""".stripMargin

  /** Content-defined-chunk storage-dedup audit per source — chunk every
    * document with [[graft.functions.CdcChunks]] (rolling-hash
    * boundaries, expected chunk ≈ `divisor` chars) and measure how much
    * of each source's byte volume is redundant at chunk granularity:
    * the rsync/LBFS measurement a snapshotting corpus store runs to
    * size its dedup win BEFORE building the chunk index. Because
    * boundaries are content-defined, shared passages chunk identically
    * regardless of their offset in the carrying documents — exactly
    * what offset-based fixed blocks miss.
    *
    * Scale shape: one generator pass (chunking is per-row native
    * work), one (source, chunk-hash) aggregate — chunk identity
    * travels as md5, never the chunk text, past the first shuffle —
    * then a source-keyed rollup. Linear in corpus bytes.
    *
    * @return per source: n_chunks, n_unique, chars_total,
    *         chars_unique, dedup_ratio = 1 − unique/total chars (6 dp)
    */
  def cdcDedupBySource(docs: DataFrame, sourceCol: String,
      textCol: String, k: Int = 8, divisor: Long = 64L): DataFrame = {
    val byHash = docs
      .select(col(sourceCol).as("source"),
        explode(graft.functions.GraftFunctions.cdcChunks(
          col(textCol), k, divisor)).as("__c"))
      .groupBy(col("source"), md5(col("__c")).as("__h"))
      .agg(count(lit(1)).as("__cnt"), max(length(col("__c"))).as("__len"))
    byHash.groupBy(col("source"))
      .agg(sum(col("__cnt")).as("n_chunks"),
        count(lit(1)).as("n_unique"),
        sum(col("__cnt") * col("__len")).as("chars_total"),
        sum(col("__len")).as("chars_unique"))
      .select(col("source"), col("n_chunks"), col("n_unique"),
        col("chars_total"), col("chars_unique"),
        round(lit(1.0) - col("chars_unique").cast("double") /
          col("chars_total"), 6).as("dedup_ratio"))
  }

  /** Declared q264: the 20-source CDC dedup audit (k=8, divisor=64). */
  def q264CdcDedup(spark: SparkSession, d: String): DataFrame =
    cdcDedupBySource(Tables.documents(spark, d), "source", "text")

  val q264Sql: String = {
    val pow31 = (0 until 8).map(j => math.pow(31.0, j).toLong)
    val poly = (0 until 8).map(j =>
      s"CAST(ascii(substring(text, CAST(i + $j AS INT), 1)) AS BIGINT) * ${pow31(j)}")
      .mkString(" + ")
    s"""WITH g AS (
       |  SELECT doc_id, source, text,
       |    list_transform(range(1, greatest(length(text) - 7, 0) + 1),
       |      i -> $poly) AS hs
       |  FROM documents),
       |cutpos AS (
       |  SELECT doc_id, source, text,
       |    unnest(list_filter(range(1, len(hs) + 1), i -> hs[i] % 64 = 0)) + 7 AS cut
       |  FROM g),
       |cuts AS (
       |  SELECT doc_id, source, text, 0 AS cut FROM documents
       |  UNION ALL SELECT doc_id, source, text, cut FROM cutpos),
       |chunks AS (
       |  SELECT source, substring(text, CAST(cut + 1 AS INT),
       |    CAST(coalesce(lead(cut) OVER (PARTITION BY doc_id ORDER BY cut),
       |      length(text)) - cut AS INT)) AS c
       |  FROM cuts),
       |u AS (
       |  SELECT source, md5(c) AS h, count(*) AS cnt, max(length(c)) AS len
       |  FROM chunks WHERE length(c) > 0 GROUP BY 1, 2)
       |SELECT source,
       |  CAST(sum(cnt) AS BIGINT) AS n_chunks,
       |  CAST(count(*) AS BIGINT) AS n_unique,
       |  CAST(sum(cnt * len) AS BIGINT) AS chars_total,
       |  CAST(sum(len) AS BIGINT) AS chars_unique,
       |  round(1 - CAST(sum(len) AS DOUBLE) / sum(cnt * len), 6) AS dedup_ratio
       |FROM u GROUP BY source""".stripMargin
  }

  /** Jensen–Shannon divergence between every pair of sources' unigram
    * distributions — the SYMMETRIC, bounded companion to
    * [[sourceDivergence]]'s KL-vs-mixture: JSD(P,Q) ∈ [0,1] bits, 0 =
    * identical token mix, 1 = disjoint vocabularies. The standard
    * corpus-mixture design signal ("which feeds are redundant, which
    * add diversity") next to [[sourceOverlap]]'s set-level Jaccard.
    *
    * Token-keyed, never distribution-materialized-per-pair: the
    * corpus collapses to the (source, token, p) relation once; one
    * self-join on the token key yields every pair's shared-token
    * terms (Σ over shared tokens of p·ln(2p/(p+q)) and the mirrored q
    * term), and each side's UNSHARED mass — which contributes exactly
    * mass·ln2 to its half — falls out as (1 − Σ shared p), no
    * anti-join needed. Pairs sharing no token are absent by contract
    * (their JSD is exactly 1).
    *
    * @return src_a < src_b, shared_tokens, jsd (bits, 6 dp)
    */
  def sourceJsDivergence(docs: DataFrame, sourceCol: String,
      textCol: String): DataFrame = {
    val w = Window.partitionBy(col("__src"))
    val dist = docs
      .select(col(sourceCol).as("__src"),
        explode(split(lower(col(textCol)), " ")).as("__tok"))
      .where(length(col("__tok")) > 0)
      .groupBy(col("__src"), col("__tok"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__tot", sum(col("__c")).over(w))
      .select(col("__src"), col("__tok"),
        (col("__c").cast("double") / col("__tot").cast("double"))
          .as("__p"))
      .localCheckpoint()
    val ln2 = math.log(2.0)
    dist.select(col("__src").as("src_a"), col("__tok"),
        col("__p").as("__pa"))
      .join(dist.select(col("__src").as("src_b"), col("__tok"),
        col("__p").as("__pb")), Seq("__tok"))
      .where(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("shared_tokens"),
        sum(col("__pa") * log(lit(2.0) * col("__pa")
          / (col("__pa") + col("__pb")))).as("__ta"),
        sum(col("__pb") * log(lit(2.0) * col("__pb")
          / (col("__pa") + col("__pb")))).as("__tb"),
        sum(col("__pa")).as("__sa"), sum(col("__pb")).as("__sb"))
      .select(col("src_a"), col("src_b"), col("shared_tokens"),
        round((lit(0.5) * (col("__ta") + (lit(1.0) - col("__sa")) * ln2)
          + lit(0.5) * (col("__tb") + (lit(1.0) - col("__sb")) * ln2))
          / ln2, 6).as("jsd"))
  }

  /** Declared q243: the source-pair JSD matrix of the documents
    * corpus.
    */
  def q243SourceJsd(spark: SparkSession, d: String): DataFrame =
    sourceJsDivergence(Tables.documents(spark, d), "source", "text")

  val q243Sql: String =
    """WITH tok AS (
      |  SELECT source, unnest(string_split(lower(text), ' ')) AS t
      |  FROM documents),
      |dist AS (
      |  SELECT source, t,
      |    CAST(count(*) AS DOUBLE)
      |      / CAST(sum(count(*)) OVER (PARTITION BY source) AS DOUBLE)
      |      AS p
      |  FROM tok WHERE length(t) > 0 GROUP BY 1, 2),
      |j AS (
      |  SELECT a.source AS src_a, b.source AS src_b,
      |    count(*) AS shared_tokens,
      |    sum(a.p * ln(2 * a.p / (a.p + b.p))) AS ta,
      |    sum(b.p * ln(2 * b.p / (a.p + b.p))) AS tb,
      |    sum(a.p) AS sa, sum(b.p) AS sb
      |  FROM dist a JOIN dist b ON a.t = b.t AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT src_a, src_b, CAST(shared_tokens AS BIGINT) AS shared_tokens,
      |  round((0.5 * (ta + (1.0 - sa) * ln(2))
      |    + 0.5 * (tb + (1.0 - sb) * ln(2))) / ln(2), 6) AS jsd
      |FROM j""".stripMargin
}
