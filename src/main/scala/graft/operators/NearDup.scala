package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate near-duplicate detection at corpus scale (E13): MinHash
  * LSH, SimHash, and random-hyperplane LSH over embeddings. All three
  * follow the same shape — per-row signature (narrow), explode to
  * (bucket, id) (narrow), self-join on bucket (one shuffle), verify
  * candidates (one join) — so cost is O(n·bands + candidates), never
  * O(n²). Signatures are seeded deterministically: same input + params →
  * same output, which is what makes the rows-only correctness checks and
  * recall specs reproducible.
  */
object NearDup {

  /** Universal-hash modulus, shared with [[graft.functions.MinHashAgg]]. */
  private val P = graft.functions.MinHashAgg.P

  /** Word 3-gram shingle set — shared with the exact Jaccard join so the
    * approximate and exact paths measure the same similarity.
    */
  def shingleSet(textCol: Column): Column =
    Dedup.shingles(split(textCol, " "))

  /** MinHash-LSH candidate pairs with signature-estimated Jaccard.
    *
    * Pipeline: shingle → xxhash64 → k min-hash aggregates (one shuffle
    * on id; map-side partial min keeps it cheap) → band hashes → explode
    * → self-join on (band, bandHash) → distinct pairs → estimate
    * similarity as the fraction of equal signature components.
    *
    * With `numHashes` = bands·rowsPerBand, the S-curve threshold is
    * ≈ (1/bands)^(1/rowsPerBand); defaults target ~0.4 Jaccard.
    *
    * @return (idA, idB, est_jaccard) with idA < idB, est ≥ `threshold`
    */
  def minHashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.6,
      seed: Long = 42L): DataFrame =
    minHashCandidates(docs, idCol, textCol, numHashes, bands, seed)
      .select(col("id_a"), col("id_b"),
        (aggregate(
          zip_with(col("__sig_a"), col("__sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast(DoubleType) / numHashes).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)

  /** Banded candidate pairs with both signatures attached, no similarity
    * estimate. Callers that verify candidates exactly project the ids
    * only, and column pruning then drops the k-long signatures from the
    * band shuffle entirely — the estimate is a per-candidate interpreted
    * 2k-element fold, the dominant verify-side cost when evaluated and
    * discarded.
    */
  private def minHashCandidates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int,
      bands: Int,
      seed: Long): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands

    val exploded = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("__id"), explode(shingleSet(col(textCol))).as("__s"))
      .select(col("__id"), pmod(xxhash64(col("__s")), lit(P)).as("__x"))

    // one typed aggregate computing the whole k-signature per doc
    // (primitive-array buffer via ObjectHashAggregate — see MinHashAgg)
    val sigs = exploded.groupBy(col("__id"))
      .agg(graft.functions.MinHashAgg.of(numHashes, seed)(col("__x")).as("__sig"))

    // Signatures ride through the band explode, so the expensive min-hash
    // aggregation has exactly two consumers (the two sides of the bucket
    // self-join) and Spark reuses one shuffle for both — no join-backs.
    // Cost: each band row carries the k-long signature (~1 KB at k=128);
    // the bucket join's shuffle grows by that factor but stays linear.
    val withBands = sigs.select(
      col("__id"), col("__sig"),
      posexplode(expr(s"band_hashes(__sig, $bands, $r)")))
      .withColumnRenamed("pos", "__band")
      .withColumnRenamed("col", "__bh")

    val left = withBands.select(
      col("__id").as("id_a"), col("__sig").as("__sig_a"), col("__band"), col("__bh"))
    val right = withBands.select(
      col("__id").as("id_b"), col("__sig").as("__sig_b"), col("__band"), col("__bh"))
    left.join(right, Seq("__band", "__bh"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /** MinHash-LSH candidates verified with EXACT shingle-set Jaccard —
    * the production dedup pipeline shape (candidates → verify), and the
    * form whose output is exactly comparable to an all-pairs oracle:
    * precision is 1 by construction, and recall is 1 whenever every
    * true pair ≥ `threshold` collides in ≥1 band (deterministic given
    * the seed; the driver's DuckDB compare is the gate, and the spec
    * measures recall explicitly). Candidate volume is O(n·bands), the
    * exact join only touches candidate pairs.
    *
    * @return (id_a, id_b, jaccard) with id_a < id_b, exact jaccard ≥
    *         `threshold`
    */
  def minHashVerifiedPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.6,
      numHashes: Int = 128,
      bands: Int = 32,
      seed: Long = 42L): DataFrame = {
    val sets = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("__id"), shingleSet(col(textCol)).as("__sh"))
      .where(size(col("__sh")) > 0)
    // candidates: every banded collision, no estimate — the exact
    // verification below decides, so evaluating the signature-fold
    // estimate here would be pure waste
    val candidates = minHashCandidates(docs, idCol, textCol,
      numHashes = numHashes, bands = bands, seed = seed)
      .select(col("id_a"), col("id_b"))
    candidates
      .join(sets.select(col("__id").as("id_a"), col("__sh").as("__sh_a")), Seq("id_a"))
      .join(sets.select(col("__id").as("id_b"), col("__sh").as("__sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("__sh_a"), col("__sh_b"))).cast(DoubleType) /
          (size(col("__sh_a")) + size(col("__sh_b")) -
            size(array_intersect(col("__sh_a"), col("__sh_b"))))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Oracle for [[minHashVerifiedPairs]]: the naive exact all-pairs
    * Jaccard join (safe at oracle scale), column-aligned with the
    * declared query.
    */
  val q35Sql: String =
    """SELECT id_a, id_b, jaccard FROM (
      | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      |   (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
      | FROM (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
      |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
      |       FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      |       WHERE len(t) >= 3) a
      | JOIN (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
      |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
      |       FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      |       WHERE len(t) >= 3) b
      | ON a.doc_id < b.doc_id)
      |WHERE jaccard >= 0.6""".stripMargin

  /** Incremental near-dup ingest — the production shape of MinHash
    * dedup: a NEW batch arrives, and each batch document is checked for
    * a near-duplicate (exact shingle Jaccard ≥ `threshold`) against the
    * already-ingested CORPUS and against earlier (smaller-id) documents
    * of the same batch. Corpus documents are never compared with each
    * other: the bucket join keeps only pairs with a batch side, so a
    * 100 TB corpus contributes signatures to the index but no
    * corpus×corpus candidate ever materializes — per-ingest cost scales
    * with the batch, not the corpus. Candidates are exact-verified
    * (precision 1), same contract as [[minHashVerifiedPairs]].
    *
    * `dup_in_batch` flags a match with ANY smaller-id batch doc
    * (whether or not that doc is itself kept) — the conservative
    * one-pass rule ingest pipelines use; transitive-group
    * representative selection is [[Components.connectedComponents]]'s
    * job when needed.
    *
    * @return one row per batch document: (idCol, dup_of_corpus,
    *         dup_in_batch, keep)
    */
  def incrementalNearDup(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.6,
      numHashes: Int = 128,
      bands: Int = 32,
      seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands
    def side(df: DataFrame, isBatch: Boolean) = df.select(
      col(idCol).as("__id"), col(textCol).as("__text"),
      lit(isBatch).as("__is_batch"))
    val tagged = side(corpus, isBatch = false)
      .unionByName(side(batch, isBatch = true))
      .repartition(batch.sparkSession.sparkContext.defaultParallelism)

    val sets = tagged
      .select(col("__id"), col("__is_batch"), shingleSet(col("__text")).as("__sh"))
      .where(size(col("__sh")) > 0)
    val sigs = sets
      .select(col("__id"), col("__is_batch"), explode(col("__sh")).as("__s"))
      .select(col("__id"), col("__is_batch"),
        pmod(xxhash64(col("__s")), lit(P)).as("__x"))
      .groupBy(col("__id"), col("__is_batch"))
      .agg(graft.functions.MinHashAgg.of(numHashes, seed)(col("__x")).as("__sig"))
    val withBands = sigs.select(
      col("__id"), col("__is_batch"),
      posexplode(expr(s"band_hashes(__sig, $bands, $r)")))
      .withColumnRenamed("pos", "__band")
      .withColumnRenamed("col", "__bh")

    val left = withBands.select(col("__id").as("id_a"),
      col("__is_batch").as("__batch_a"), col("__band"), col("__bh"))
    val right = withBands
      .where(col("__is_batch"))
      .select(col("__id").as("id_b"), col("__band"), col("__bh"))
    // candidate gate: the right side is always batch; the left side is
    // corpus, or an earlier batch doc — corpus×corpus never survives
    val candidates = left.join(right, Seq("__band", "__bh"))
      .where(!col("__batch_a") || col("id_a") < col("id_b"))
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("__batch_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")

    val verified = candidates
      .join(sets.select(col("__id").as("id_a"), col("__sh").as("__sh_a")), Seq("id_a"))
      .join(sets.select(col("__id").as("id_b"), col("__sh").as("__sh_b")), Seq("id_b"))
      .where((size(array_intersect(col("__sh_a"), col("__sh_b"))).cast(DoubleType) /
        (size(col("__sh_a")) + size(col("__sh_b")) -
          size(array_intersect(col("__sh_a"), col("__sh_b"))))) >= threshold)
      .groupBy(col("id_b"))
      .agg(
        max(when(!col("__batch_a"), true).otherwise(false)).as("__dup_corpus"),
        max(when(col("__batch_a"), true).otherwise(false)).as("__dup_batch"))

    batch.select(col(idCol))
      .join(verified.withColumnRenamed("id_b", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__dup_corpus"), lit(false)).as("dup_of_corpus"),
        coalesce(col("__dup_batch"), lit(false)).as("dup_in_batch"),
        (!coalesce(col("__dup_corpus"), lit(false)) &&
          !coalesce(col("__dup_batch"), lit(false))).as("keep"))
  }

  /** Declared q96: ingest doc_id < 100 as the new batch against the
    * doc_id ≥ 100 corpus.
    */
  def q96IncrementalNearDup(
      spark: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val docs = graft.core.Tables.documents(spark, d)
    incrementalNearDup(
      docs.where(col("doc_id") < 100), docs.where(col("doc_id") >= 100),
      "doc_id", "text")
  }

  /** Oracle: exact all-pairs Jaccard on both pair classes (batch×corpus
    * and intra-batch ordered pairs) — safe at oracle scale, and exactly
    * the relation the engine's LSH+verify must reproduce (precision 1;
    * recall 1 whenever every true pair collides in ≥1 band, the same
    * deterministic gate q35 is held to).
    */
  val q96Sql: String =
    """WITH sh AS (
      | SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
      |          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
      | FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      | WHERE len(t) >= 3),
      |b AS (SELECT * FROM sh WHERE doc_id < 100),
      |c AS (SELECT * FROM sh WHERE doc_id >= 100),
      |pc AS (
      | SELECT b.doc_id FROM b JOIN c ON
      |  CAST(len(list_intersect(b.sh, c.sh)) AS DOUBLE) /
      |   (len(b.sh) + len(c.sh) - len(list_intersect(b.sh, c.sh))) >= 0.6
      | GROUP BY 1),
      |pb AS (
      | SELECT b2.doc_id FROM b b2 JOIN b b1 ON b1.doc_id < b2.doc_id AND
      |  CAST(len(list_intersect(b1.sh, b2.sh)) AS DOUBLE) /
      |   (len(b1.sh) + len(b2.sh) - len(list_intersect(b1.sh, b2.sh))) >= 0.6
      | GROUP BY 1)
      |SELECT d.doc_id,
      | pc.doc_id IS NOT NULL AS dup_of_corpus,
      | pb.doc_id IS NOT NULL AS dup_in_batch,
      | pc.doc_id IS NULL AND pb.doc_id IS NULL AS keep
      |FROM (SELECT doc_id FROM documents WHERE doc_id < 100) d
      |LEFT JOIN pc USING (doc_id)
      |LEFT JOIN pb USING (doc_id)""".stripMargin

  /** Portable 60-bit hash: the first 15 hex digits of md5, read
    * big-endian — one `conv` expression instead of the historical 15×
    * substring/ascii/case packing, and reproducible in any engine with
    * md5 + hex-string-to-int (DuckDB: `('0x' || substring(md5(s),1,15))
    * ::BIGINT`; the declared q36 is hash-checked against a DuckDB oracle
    * recomputing it). 60 not 64 bits so the value stays inside a signed
    * long.
    */
  private[operators] def portable60(s: Column): Column =
    graft.functions.GraftFunctions.hexLong(substring(md5(s), 1, 15))

  /** SimHash near-duplicate pairs with exact Hamming verification.
    *
    * 64-bit SimHash over the shingle set (per-bit ±1 votes, sign →
    * bit). Candidates come from banding the fingerprint into
    * `chunks` equal pieces: by pigeonhole, any pair within
    * `maxHamming` ≤ chunks−1 shares at least one identical chunk, so
    * recall is 100% — this is an exact algorithm with an LSH-shaped
    * cost profile.
    *
    * `portableHash` swaps xxhash64 (fast production default) for the
    * md5-derived [[portable60]] (60-bit), making the whole result
    * engine-reproducible — the declared q36 runs that variant so the
    * DuckDB oracle can recompute the exact Hamming pairs.
    *
    * @return (idA, idB, hamming) with hamming ≤ `maxHamming`
    */
  def simHashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      chunks: Int = 4,
      portableHash: Boolean = false): DataFrame = {
    require(maxHamming < chunks, "pigeonhole needs maxHamming < chunks")
    val bits = if (portableHash) 60 else 64
    require(bits % chunks == 0, s"chunks must divide $bits")
    val chunkBits = bits / chunks

    val exploded = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("__id"), explode(shingleSet(col(textCol))).as("__s"))
      .select(col("__id"),
        (if (portableHash) portable60(col("__s")) else xxhash64(col("__s"))).as("__h"))

    val voteCols = (0 until bits).map { i =>
      sum(when(col("__h").bitwiseAND(lit(1L << i)) =!= 0, 1).otherwise(-1)).as(s"__v_$i")
    }
    val fingerprints = exploded.groupBy(col("__id"))
      .agg(voteCols.head, voteCols.tail: _*)
      .select(col("__id"),
        (0 until bits).map { i =>
          when(col(s"__v_$i") > 0, lit(1L << i)).otherwise(0L)
        }.reduce(_ + _).as("__fp"))

    val withChunks = fingerprints.select(
      col("__id"), col("__fp"),
      posexplode(array((0 until chunks).map { j =>
        shiftright(col("__fp"), j * chunkBits)
          .bitwiseAND(lit((1L << chunkBits) - 1))
      }: _*)))
      .withColumnRenamed("pos", "__chunk")
      .withColumnRenamed("col", "__ch")

    val left = withChunks.select(
      col("__id").as("id_a"), col("__fp").as("__fp_a"), col("__chunk"), col("__ch"))
    val right = withChunks.select(
      col("__id").as("id_b"), col("__fp").as("__fp_b"), col("__chunk"), col("__ch"))
    left.join(right, Seq("__chunk", "__ch"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("__fp_a").bitwiseXOR(col("__fp_b"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Oracle for the declared q36 (portable-hash SimHash): full SQL
    * recomputation — shingles, md5-packed 60-bit hashes, per-bit ±1
    * votes, fingerprint pack, exact all-pairs Hamming ≤ 3. Because the
    * pigeonhole banding is exact, the banded Spark result must equal
    * this brute-force recompute bit-for-bit.
    */
  val q36Sql: String = {
    val h60 = "('0x' || substring(m, 1, 15))::BIGINT"
    val votes = (0 until 60).map { i =>
      s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS v$i"
    }.mkString(", ")
    val pack = (0 until 60).map { i =>
      s"(CASE WHEN v$i > 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH sh AS (
       | SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
       |   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
       | FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
       | WHERE len(t) >= 3),
       |h AS (SELECT doc_id, $h60 AS h FROM (SELECT doc_id, md5(s) AS m FROM sh)),
       |v AS (SELECT doc_id, $votes FROM h GROUP BY doc_id),
       |fp AS (SELECT doc_id, $pack AS fp FROM v)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       | CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
       |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fp, b.fp)) <= 3""".stripMargin
  }

  /** Declared q59 — embedding near-dup with a FULL structural oracle:
    * plant five identical twins (vec_id + 10000, the [[Similarity]]
    * twin device), run the hyperplane-LSH + exact-verify pipeline over
    * corpus ∪ twins, and emit every pair at cosine ≥ 0.95 — DuckDB
    * recomputes the exact all-pairs relation, so any bucketing, join,
    * or verification divergence is a hash mismatch on real pairs (same
    * upgrade q72 got; no constant-true gate). Deterministic: an
    * identical vector lands in identical buckets in EVERY table (same
    * sign bits) so twin recall is 1, and the fixture's max non-twin
    * cosine is ~0.6 (verified at sf0.01/sf0.1), so the ≥ 0.95 pair set
    * is exactly the twins on both sides — no threshold boundary risk.
    */
  def q59EmbeddingDedupGate(
      spark: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val e = graft.core.Tables.embeddings(spark, d)
    val base = e.select(col("vec_id"), col("embedding"))
    val corpus = base.unionByName(Similarity.twinQueries(e))
    embeddingPairs(corpus, "vec_id", "embedding", 64, threshold = 0.95)
      .select(col("id_a"), col("id_b"), round(col("cos_sim"), 6).as("cos_sim"))
  }

  val q59Sql: String =
    """WITH corpus AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 10000, list_transform(embedding, x -> CAST(x AS DOUBLE))
      |  FROM embeddings WHERE vec_id BETWEEN 5 AND 9)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_cosine_similarity(a.e, b.e), 6) AS cos_sim
      |FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.e, b.e) >= 0.95""".stripMargin

  /** Cosine of two double-array columns, computed as one sequential fold
    * (deterministic, cross-engine reproducible).
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))
  }

  private def toDouble(c: Column): Column = transform(c, x => x.cast(DoubleType))

  /** Random-hyperplane LSH near-duplicate pairs over an embedding
    * column, with exact cosine verification of candidates.
    *
    * `tables` independent hash tables of `bitsPerTable` sign-bits each:
    * a pair at cosine c collides in one table with prob
    * (1 − acos(c)/π)^bits; multiple tables drive recall → 1 while the
    * bucket join stays linear. Candidates are verified with exact
    * cosine, so precision is 1 — only recall is approximate.
    *
    * @return (idA, idB, cos_sim) with cos_sim ≥ `threshold`
    */
  def embeddingPairs(
      vectors: DataFrame,
      idCol: String,
      embCol: String,
      dim: Int,
      threshold: Double = 0.9,
      tables: Int = 8,
      bitsPerTable: Int = 8,
      seed: Long = 42L): DataFrame = {
    // per-table packed sign-bit bucket keys in one fused codegen pass
    // (seed-identical to the historical per-plane HOF folds — see
    // HyperplaneBuckets)
    val bucketed = vectors.select(
      col(idCol).as("__id"),
      posexplode(graft.functions.GraftFunctions
        .hyperplaneBuckets(col(embCol), dim, tables, bitsPerTable, seed)))
      .withColumnRenamed("pos", "__t")
      .withColumnRenamed("col", "__bucket")

    // the bucket join and the pair dedup carry ONLY (id_a, id_b): a
    // candidate colliding in several of the `tables` hash tables must
    // not shuffle 2×dim doubles per collision — at 100 TB that dedup
    // shuffle would dwarf the verify step. Vectors are re-joined by id
    // AFTER dedup, once per surviving candidate side.
    val left = bucketed.select(col("__id").as("id_a"), col("__t"), col("__bucket"))
    val right = bucketed.select(col("__id").as("id_b"), col("__t"), col("__bucket"))
    val pairs = left.join(right, Seq("__t", "__bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    // LAZY checkpoint: the two post-dedup id-joins then read ONE
    // materialized copy of the caller's plan instead of re-running it
    // per side (a union+transform corpus like q72's would otherwise be
    // evaluated twice more here). The bucketing pass above is still an
    // independent evaluation — callers' vector plans must be
    // deterministic, or buckets and verified vectors could diverge.
    val vecs = vectors.select(col(idCol).as("__id"), toDouble(col(embCol)).as("__e"))
      .localCheckpoint(false)
    pairs
      .join(vecs.select(col("__id").as("id_a"), col("__e").as("__e_a")), Seq("id_a"))
      .join(vecs.select(col("__id").as("id_b"), col("__e").as("__e_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.GraftFunctions
          .cosineSimilarity(col("__e_a"), col("__e_b")).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  /** Edit-distance ≤ 1 join via single-deletion neighborhoods (the
    * FastSS/SymSpell blocking). Every string generates its length+1
    * deletion variants (position 0 = the string itself); two strings at
    * Levenshtein distance ≤ 1 provably share at least one variant —
    * equal strings share themselves, an indel pair shares the shorter
    * string, a substitution pair shares the deletion at the edited
    * position — so the variant-key self-join is a COMPLETE candidate
    * generator with LINEAR output (len+1 keys per row), no all-pairs
    * step anywhere. Candidates are verified with the codegen
    * `levenshtein` (precision 1), so the declared result is exact.
    * Scale shape: one generator, one shuffle on the variant key,
    * per-candidate verification — the same bucket-join discipline as
    * MinHash/SimHash, applied to typo-level string identity (entity
    * resolution over names/titles, OCR noise, near-identical URLs).
    */
  def editDistanceJoin(
      docs: DataFrame, idCol: String, nameCol: String): DataFrame = {
    val named = docs.select(col(idCol).as("id"), col(nameCol).as("name"))
    // identical-string mass never enters the candidate space: candidate
    // generation runs on DISTINCT names (real corpora have heavy
    // duplication — one hot name must not cost cluster² candidates ×
    // variants), and id pairs are expanded back only as final output
    val dn = named.select(col("name")).distinct()
    val keyed = dn
      .select(col("name"),
        explode(sequence(lit(0), length(col("name")))).as("pos"))
      .select(col("name"),
        when(col("pos") === 0, col("name"))
          .otherwise(concat(
            col("name").substr(lit(1), col("pos") - 1),
            col("name").substr(col("pos") + 1,
              length(col("name")) - col("pos"))))
          .as("variant"))
    // Probe leg repartitioned on the variant key (explicit count = the
    // session's shuffle-partition knob): with a broadcastable build
    // side the candidate generation + levenshtein verify otherwise run
    // at the upstream stage's AQE-coalesced partition count — tiny
    // bytes, heavy per-row compute, the case AQE's byte advisory
    // cannot see (measured cpu ≈ wall on q99 at local[32]).
    // The verify filter runs BEFORE the pair dedup: dist is a pure
    // function of the pair, so filtering first is result-identical,
    // keeps the kernel inside the wide probe stage, and shrinks the
    // dedup exchange to the (few) true edit-distance-≤1 pairs.
    val nPart = keyed.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val namePairs = keyed
      .select(col("name").as("a_name"), col("variant"))
      .repartition(nPart, col("variant"))
      .join(keyed.select(col("name").as("b_name"), col("variant")),
        Seq("variant"))
      .where(col("a_name") <= col("b_name"))
      .select(col("a_name"), col("b_name"),
        levenshtein(col("a_name"), col("b_name")).as("dist"))
      .where(col("dist") <= 1)
      .dropDuplicates("a_name", "b_name")
    // expand name pairs to id pairs; a same-name pair carries its whole
    // id cluster (kept once via a_id < b_id), cross-name pairs are
    // normalized to (least, greatest) — disjoint id sets, no dedup needed
    namePairs
      .join(named.select(col("id").as("a_id"), col("name").as("a_name")),
        Seq("a_name"))
      .join(named.select(col("id").as("b_id"), col("name").as("b_name")),
        Seq("b_name"))
      .where(col("a_name") =!= col("b_name") || col("a_id") < col("b_id"))
      .select(least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"), col("dist"))
  }

  /** Declared q99: typo-level entity resolution over part names —
    * every 10th part re-issued with ONE character deleted at a
    * position derived from its key (a deterministic typo generator
    * both engines replay exactly, the q72 planted-twin pattern), then
    * [[editDistanceJoin]] finds every pair within Levenshtein 1.
    * Oracle: all-pairs levenshtein in DuckDB — any completeness gap in
    * the deletion-neighborhood blocking is a missing row, any
    * verification gap an extra one.
    */
  def q99EditPairs(spark: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val p = graft.core.Tables.part(spark, d)
      .select(col("p_partkey").as("id"), col("p_name").as("name"))
    val m = (col("id") % length(col("name"))).cast("int")
    val typos = p.where(col("id") % 10 === 0)
      .select((col("id") + lit(10000000L)).as("id"),
        concat(
          col("name").substr(lit(1), m),
          col("name").substr(m + 2, length(col("name")))).as("name"))
    editDistanceJoin(p.unionByName(typos), "id", "name")
      .select(col("a_id"), col("b_id"), col("dist").cast("int").as("dist"))
  }

  val q99Sql: String =
    """WITH corpus AS (
      |  SELECT p_partkey AS id, p_name AS name FROM part
      |  UNION ALL
      |  SELECT p_partkey + 10000000,
      |    substring(p_name, 1, CAST(p_partkey % length(p_name) AS INT)) ||
      |    substring(p_name, CAST(p_partkey % length(p_name) AS INT) + 2,
      |      length(p_name))
      |  FROM part WHERE p_partkey % 10 = 0)
      |SELECT a.id AS a_id, b.id AS b_id,
      |  CAST(levenshtein(a.name, b.name) AS INT) AS dist
      |FROM corpus a JOIN corpus b ON a.id < b.id
      |WHERE abs(length(a.name) - length(b.name)) <= 1
      |  AND levenshtein(a.name, b.name) <= 1""".stripMargin

  /** Blocked Jaro–Winkler similarity join — the fuzzy entity-resolution
    * primitive (customer/vendor/product record matching). Candidate
    * pairs come ONLY from equality on a caller-supplied blocking key
    * (sort-neighborhood keys, phonetic codes, first tokens…): the join
    * is a plain hash equi-join on the block, so at 100 TB the cost is
    * Σ per-block pairs — the blocking designer's knob — never n². The
    * similarity itself is the native codegen'd
    * [[graft.functions.JaroWinkler]] expression evaluated inside the
    * join's filter stage.
    *
    * @return (a_id, b_id, jw) for distinct within-block pairs with
    *         jw ≥ threshold, each pair once (a_id < b_id)
    */
  def jaroWinklerJoin(
      records: DataFrame,
      idCol: String,
      strCol: String,
      blockCol: Column,
      threshold: Double): DataFrame = {
    val a = records.select(col(idCol).as("a_id"), col(strCol).as("a_str"),
      blockCol.as("block"))
    val b = records.select(col(idCol).as("b_id"), col(strCol).as("b_str"),
      blockCol.as("block"))
    val jw = graft.functions.GraftFunctions.jaroWinkler(col("a_str"), col("b_str"))
    // provable length gate: jw ≥ θ forces jaro ≥ (θ−0.4)/0.6 (prefix
    // boost adds at most 0.4·(1−j)), and jaro ≤ (min/max + 2)/3, so
    // min(|a|,|b|)/max(|a|,|b|) ≥ 5θ−4 — a three-instruction filter
    // that drops pairs BEFORE the O(n·window) kernel, no false negatives
    val lenGate =
      if (threshold > 0.8)
        least(length(col("a_str")), length(col("b_str"))).cast("double") >=
          lit(5.0 * threshold - 4.0) *
            greatest(length(col("a_str")), length(col("b_str")))
      else lit(true)
    // jaro_winkler_gte runs the histogram admission bound per pair and
    // the exact kernel only on survivors; the final projection then
    // recomputes jw for the (few) emitted rows.
    // The probe leg is hash-repartitioned on the block key to the
    // session's shuffle-partition count BEFORE the join: when the
    // relation is small enough to broadcast, the probe stage otherwise
    // inherits the SCAN's split count (one small parquet file = one
    // task), serializing the whole JW kernel mass on a single core —
    // measured cpu ≈ wall at local[32] on q110/q125/q218. The explicit
    // partition count pins the exchange against AQE coalescing (bytes
    // are tiny, compute is not — the one case AQE's byte-sized
    // advisory cannot see), matches the join's required distribution
    // on the shuffle path (no second exchange at scale), and tracks
    // the session's scale knob rather than a local constant.
    val nPart = a.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    a.repartition(nPart, col("block")).join(b, Seq("block"))
      .where(col("a_id") < col("b_id") && lenGate &&
        graft.functions.GraftFunctions.jaroWinklerGte(
          col("a_str"), col("b_str"), threshold))
      .select(col("a_id"), col("b_id"), jw.as("jw"))
  }

  /** Declared q110: fuzzy part-name matching — pairs of parts whose
    * names agree at Jaro–Winkler ≥ 0.92, blocked on the name's first
    * token (TPC-H part names share a small color vocabulary, the
    * classic sorted-neighborhood blocking shape). Oracle replays with
    * DuckDB's own `jaro_winkler_similarity`, so every match-window,
    * transposition, boost-threshold, and prefix-cap detail of the
    * native expression is value-checked on real data.
    */
  def q110JaroWinkler(spark: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val p = graft.core.Tables.part(spark, d)
      .select(col("p_partkey").as("id"), col("p_name").as("name"))
    jaroWinklerJoin(p, "id", "name",
      substring_index(col("name"), " ", 1), threshold = 0.92)
  }

  /** End-to-end entity resolution: blocked fuzzy join → connected
    * components → one GOLDEN RECORD per entity cluster (longest name,
    * ties to the smallest id) — the "dedupe a vendor list" workflow
    * composed from the engine's own primitives. Scale shape inherits
    * from its parts: candidate pairs are Σ per-block (never n²) with
    * the q110 histogram admission gate, clustering is the O(log d)
    * pointer-jumping CC, and canonical selection is one row_number
    * window over cluster-keyed records. Singletons are their own
    * golden record.
    */
  def goldenRecords(records: DataFrame, idCol: String, nameCol: String,
      blockCol: Column, threshold: Double): DataFrame = {
    val pairs = jaroWinklerJoin(records, idCol, nameCol, blockCol, threshold)
    val cc = Components.connectedComponents(pairs, "a_id", "b_id")
    val labeled = records
      .select(col(idCol).as("id"), col(nameCol).as("name"))
      .join(cc.select(col("node").as("id"), col("comp")), Seq("id"), "left")
      .select(col("id"), col("name"),
        coalesce(col("comp"), col("id")).as("cluster_id"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(length(col("name")).desc, col("id").asc)
    labeled
      .withColumn("__rn", row_number().over(w))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_records"),
        max(when(col("__rn") === 1, col("id"))).as("canonical_id"),
        max(when(col("__rn") === 1, col("name"))).as("canonical_name"))
  }

  /** Declared q125 over a deterministically PERTURBED vendor list: the
    * fixture's part names carry only 64 distinct values (pure
    * duplicates — jw is 1.0 or far below any threshold), so each
    * record appends a version tag derived from its key
    * (`name + " rev" + partkey % 3`). Same-name records then agree at
    * jw ≈ 0.97–1.0 through genuinely fuzzy matches (one trailing
    * character apart), and the resolved clusters recover the 64 base
    * entities through transitive closure, not string equality. The
    * oracle replays the identical perturbation, pair relation,
    * recursive closure, and argmax.
    */
  def q125GoldenRecords(spark: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    // every 4th record: the declared query is the WORKFLOW (pairs →
    // closure → canonical), and the fixture's 64-name duplication makes
    // the full list a degenerate near-clique whose pair volume measures
    // only the jw kernel (q110 already owns that measurement)
    val p = graft.core.Tables.part(spark, d)
      .where(pmod(col("p_partkey"), lit(4L)) === 0L)
      .select(col("p_partkey").as("id"),
        concat(col("p_name"), lit(" rev"),
          pmod(col("p_partkey"), lit(3L)).cast("string")).as("name"))
    goldenRecords(p, "id", "name",
      substring_index(col("name"), " ", 1), threshold = 0.95)
  }

  val q125Sql: String =
    """WITH RECURSIVE p AS (
      |  SELECT p_partkey AS id,
      |    p_name || ' rev' || CAST(p_partkey % 3 AS VARCHAR) AS name
      |  FROM part WHERE p_partkey % 4 = 0),
      |b AS (SELECT id, name, string_split(name, ' ')[1] AS blk FROM p),
      |pairs AS (
      |  SELECT x.id AS u, y.id AS v
      |  FROM b x JOIN b y ON x.blk = y.blk AND x.id < y.id
      |  WHERE jaro_winkler_similarity(x.name, y.name) >= 0.95),
      |edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
      |reach(u, v) AS (
      |  SELECT u, v FROM edges
      |  UNION
      |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u),
      |comp AS (SELECT u AS id, least(u, min(v)) AS cluster_id
      |         FROM reach GROUP BY u),
      |lab AS (
      |  SELECT p.id, p.name, coalesce(c.cluster_id, p.id) AS cluster_id
      |  FROM p LEFT JOIN comp c USING (id)),
      |rn AS (
      |  SELECT *, row_number() OVER (PARTITION BY cluster_id
      |    ORDER BY length(name) DESC, id ASC) AS rn FROM lab)
      |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_records,
      |  CAST(max(CASE WHEN rn = 1 THEN id END) AS BIGINT) AS canonical_id,
      |  max(CASE WHEN rn = 1 THEN name END) AS canonical_name
      |FROM rn GROUP BY cluster_id""".stripMargin

  val q110Sql: String =
    """WITH p AS (
      |  SELECT p_partkey AS id, p_name AS name,
      |    string_split(p_name, ' ')[1] AS block
      |  FROM part)
      |SELECT a.id AS a_id, b.id AS b_id,
      |  jaro_winkler_similarity(a.name, b.name) AS jw
      |FROM p a JOIN p b ON a.block = b.block AND a.id < b.id
      |WHERE jaro_winkler_similarity(a.name, b.name) >= 0.92""".stripMargin

  /** Sorted-neighborhood entity-resolution candidates (Hernández &
    * Stolfo 1995): order records by the match key and compare each to
    * its `window` successors — the classic complement to hash blocking
    * ([[jaroWinklerJoin]]'s first-word blocks miss pairs whose first
    * token differs; the sort catches anything lexicographically
    * close). Duplicate names collapse to their min-id representative
    * first (exact duplicates are q30's job; they would only bloat the
    * neighborhood).
    *
    * DISTRIBUTED formulation: the global sort position comes from
    * [[Relational.orderedPrefixSums]] over the distinct-name relation
    * (range-partitioned above the cutoff — no single-partition window,
    * the trap the textbook lead()-based form hides), and "the next w
    * records" becomes an INTEGER EQUI-JOIN on rank+k after a bounded
    * k ≤ `window` explode. Verification is the codegen
    * `jaro_winkler_gte` admission kernel.
    */
  def sortedNeighborhoodJoin(records: DataFrame, idCol: String,
      nameCol: String, window: Int, threshold: Double): DataFrame = {
    val names = records
      .where(col(nameCol).isNotNull)
      .groupBy(col(nameCol).as("__name"))
      .agg(min(col(idCol)).as("__id"))
    val ranked = Relational
      .orderedPrefixSums(names.withColumn("__one", lit(1L)), "__name",
        Seq("__r" -> col("__one")))
      .select(col("__r").cast("long").as("__r"), col("__id"),
        col("__name"))
      // two consumers (both join legs) — materialize the rank pass once
      .localCheckpoint()
    val probes = ranked
      .select(col("__r"), col("__id").as("a_id"),
        col("__name").as("a_name"),
        explode(sequence(lit(1), lit(window))).as("__k"))
      .select((col("__r") + col("__k")).as("__r2"),
        col("a_id"), col("a_name"))
    probes
      .join(ranked.select(col("__r").as("__r2"), col("__id").as("b_id"),
        col("__name").as("b_name")), Seq("__r2"))
      .where(graft.functions.GraftFunctions.jaroWinklerGte(
        col("a_name"), col("b_name"), threshold))
      .select(col("a_id"), col("b_id"),
        graft.functions.GraftFunctions.jaroWinkler(
          col("a_name"), col("b_name")).as("jw_sim"))
  }

  /** Declared q172: sorted-neighborhood candidates over part names,
    * window 10 at 0.88 (the fixture name vocabulary is 2-token — nothing clears 0.92 in sort order) — the q110 resolution run under its
    * complementary blocking scheme.
    */
  def q172SortedNeighborhood(spark: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val p = graft.core.Tables.part(spark, d)
      .select(col("p_partkey").as("id"), col("p_name").as("name"))
    sortedNeighborhoodJoin(p, "id", "name", window = 10, threshold = 0.88)
  }

  val q172Sql: String =
    """WITH names AS (
      |  SELECT p_name AS name, min(p_partkey) AS id
      |  FROM part WHERE p_name IS NOT NULL GROUP BY 1),
      |ranked AS (
      |  SELECT name, id, row_number() OVER (ORDER BY name) AS r
      |  FROM names),
      |pairs AS (
      |  SELECT a.id AS a_id, b.id AS b_id, a.name AS an, b.name AS bn
      |  FROM ranked a JOIN ranked b
      |    ON b.r BETWEEN a.r + 1 AND a.r + 10)
      |SELECT a_id, b_id, jaro_winkler_similarity(an, bn) AS jw_sim
      |FROM pairs
      |WHERE jaro_winkler_similarity(an, bn) >= 0.88""".stripMargin

  // ---- persisted signature index (the production ingest shape) -------

  /** Per-document signature-index rows: (idCol, sh, sig) where `sh` is
    * the sorted 64-bit shingle-hash set (the exact-verify tokens — a
    * 64-bit space makes a cross-doc hash collision ~1e-14-improbable,
    * vs the signature's own 31-bit universal-hash domain) and `sig` is
    * the [[graft.functions.MinHashAgg]] signature computed from the
    * SAME pmod values [[incrementalNearDup]] uses — so candidates and
    * verdicts derived from the index are identical to the from-text
    * path's. Docs with no shingles (< 3 tokens) carry empty arrays:
    * they can never candidate-match, but the index row records their
    * admission (the replay-recovery path reads it back).
    *
    * This is what a 100 TB ingest feed maintains as its own table:
    * per-trigger dedup then touches the INDEX (O(docs × numHashes)
    * metadata) and the batch, never the corpus text.
    */
  def signatureRows(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 128,
      seed: Long = 42L): DataFrame = {
    // DDL-stable array type: the table log round-trips schemas through
    // DDL, which cannot express element containsNull=false — a raw
    // xxhash64-built array (containsNull=false) would append-mismatch
    // the very schema its own seed write created
    val ddlArray = ArrayType(LongType, containsNull = true)
    val base = docs
      .select(col(idCol), shingleSet(col(textCol)).as("__shs"))
      .select(col(idCol),
        array_sort(array_distinct(
          transform(col("__shs"), s => xxhash64(s)))).cast(ddlArray).as("sh"))
    val sigs = base.where(size(col("sh")) > 0)
      .select(col(idCol), explode(col("sh")).as("__h"))
      .groupBy(col(idCol))
      .agg(graft.functions.MinHashAgg.of(numHashes, seed)(
        pmod(col("__h"), lit(P))).as("sig"))
    base.join(sigs, Seq(idCol), "left")
      .select(col(idCol), col("sh"),
        coalesce(col("sig"), array().cast(ddlArray)).cast(ddlArray).as("sig"))
  }

  /** [[incrementalNearDup]] verdicts computed from signature-index rows
    * instead of text: `batchSigs` / `corpusSigs` are [[signatureRows]]-
    * shaped. Returns one row per BATCH doc (including no-shingle docs:
    * always keep): (idCol, dup_of_corpus, dup_in_batch, keep). The
    * banding (hash over signature slices) matches the from-text path
    * exactly, so the candidate sets — and with them recall — are the
    * same; verification is exact Jaccard over the 64-bit shingle-hash
    * sets. Corpus×corpus pairs never materialize (right side of the
    * band join is batch-only).
    */
  def indexedNearDupVerdicts(
      batchSigs: DataFrame,
      corpusSigs: DataFrame,
      idCol: String,
      threshold: Double = 0.6,
      bands: Int = 32,
      numHashes: Int = 128): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes=$numHashes must be divisible by bands=$bands")
    val r = numHashes / bands
    def side(df: DataFrame, isBatch: Boolean) = df.select(
      col(idCol).as("__id"), col("sh").as("__sh"),
      col("sig").as("__sig"), lit(isBatch).as("__is_batch"))
    val tagged = side(corpusSigs, isBatch = false)
      .unionByName(side(batchSigs, isBatch = true))
      .where(size(col("__sig")) > 0)
      // fail LOUDLY if an index row was built with a different
      // numHashes than this banding assumes: a silent mis-slice would
      // band over a prefix of the signature (wrong candidate sets,
      // recall loss) with no error anywhere downstream
      .withColumn("__sig",
        when(size(col("__sig")) === numHashes, col("__sig"))
          .otherwise(raise_error(concat(
            lit(s"indexedNearDupVerdicts: signature length != numHashes=$numHashes for id "),
            col("__id").cast("string")))))
    val withBands = tagged.select(
      col("__id"), col("__is_batch"),
      posexplode(expr(s"band_hashes(__sig, $bands, $r)")))
      .withColumnRenamed("pos", "__band")
      .withColumnRenamed("col", "__bh")
    val left = withBands.select(col("__id").as("id_a"),
      col("__is_batch").as("__batch_a"), col("__band"), col("__bh"))
    val right = withBands.where(col("__is_batch"))
      .select(col("__id").as("id_b"), col("__band"), col("__bh"))
    val candidates = left.join(right, Seq("__band", "__bh"))
      .where(!col("__batch_a") || col("id_a") < col("id_b"))
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("__batch_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    val sets = tagged.select(col("__id"), col("__sh"))
    val verified = candidates
      .join(sets.select(col("__id").as("id_a"), col("__sh").as("__sh_a")), Seq("id_a"))
      .join(sets.select(col("__id").as("id_b"), col("__sh").as("__sh_b")), Seq("id_b"))
      .where((size(array_intersect(col("__sh_a"), col("__sh_b"))).cast(DoubleType) /
        (size(col("__sh_a")) + size(col("__sh_b")) -
          size(array_intersect(col("__sh_a"), col("__sh_b"))))) >= threshold)
      .groupBy(col("id_b"))
      .agg(
        max(when(!col("__batch_a"), true).otherwise(false)).as("__dup_corpus"),
        max(when(col("__batch_a"), true).otherwise(false)).as("__dup_batch"))
    batchSigs.select(col(idCol))
      .join(verified.withColumnRenamed("id_b", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__dup_corpus"), lit(false)).as("dup_of_corpus"),
        coalesce(col("__dup_batch"), lit(false)).as("dup_in_batch"),
        (!coalesce(col("__dup_corpus"), lit(false)) &&
          !coalesce(col("__dup_batch"), lit(false))).as("keep"))
  }

  /** [[indexedNearDupVerdicts]] semantics over a BAND-BUCKETED
    * persisted index — the truly corpus-free per-trigger shape. The
    * flat (id, sig) index still made every trigger scan the whole
    * signature relation (read every sig array, compute every band
    * hash): corpus-linear with a small constant, measured 1.6× wall /
    * 2.0× cpu per trigger at 10× corpus (round-13 IngestLadder). Here
    * the corpus side arrives through two PRUNED point-lookup reads the
    * caller supplies (file-skipping via [[graft.tables.DeltaLikeTable.
    * readPruned]] on the persisted band/signature tables):
    *
    *   - `corpusBandsFor(bhs)`: (idCol, band, bh) rows from files whose
    *     bh stat-range covers a batch band hash — candidate generation
    *     touches ≤ |batch|·bands files' worth of index rows, not the
    *     corpus;
    *   - `corpusShFor(Some(ids))`: (idCol, sh) rows from files whose id
    *     range covers a candidate — exact verification touches the
    *     collision set's files only. `corpusShFor(None)` must return
    *     the full relation: the guard for a degenerate batch whose
    *     collision set exceeds `maxPrunedLookup` (the driver-side id
    *     collect must stay metadata-bounded, so past the cap the
    *     verify joins against the full scan instead — the flat-index
    *     behavior, correctness unchanged).
    *
    * Candidate SEMANTICS are pinned to [[indexedNearDupVerdicts]]:
    * same band_hashes banding, same id_a < id_b in-batch rule, same
    * exact-Jaccard verify over 64-bit shingle sets, same output shape —
    * the q283 oracle being q278's SQL is what driver-checks that pin.
    *
    * Both returned probe relations are SUPERSETS (file granularity);
    * the equi-joins here re-apply the exact predicate, so pruning can
    * never change a verdict, only the bytes touched.
    */
  def bandedNearDupVerdicts(
      batchSigs: DataFrame,
      corpusBandsFor: Seq[Int] => DataFrame,
      corpusShFor: Option[Seq[Any]] => DataFrame,
      idCol: String,
      threshold: Double = 0.6,
      bands: Int = 32,
      numHashes: Int = 128,
      maxPrunedLookup: Int = 100000): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes=$numHashes must be divisible by bands=$bands")
    val r = numHashes / bands
    val batch = batchSigs
      .select(col(idCol).as("__id"), col("sh").as("__sh"), col("sig").as("__sig"))
      .where(size(col("__sig")) > 0)
      // same loud length guard as the flat path — a mis-built index
      // row must never silently band over a signature prefix
      .withColumn("__sig",
        when(size(col("__sig")) === numHashes, col("__sig"))
          .otherwise(raise_error(concat(
            lit(s"bandedNearDupVerdicts: signature length != numHashes=$numHashes for id "),
            col("__id").cast("string")))))
    val batchBands = batch.select(col("__id"),
      posexplode(expr(s"band_hashes(__sig, $bands, $r)")))
      .withColumnRenamed("pos", "__band")
      .withColumnRenamed("col", "__bh")
      // consumed thrice (probe collect + corpus join + in-batch join);
      // batch-sized
      .localCheckpoint()
    // probe set: ≤ |batch|·bands ints by construction — driver-safe
    val bhVals = batchBands.select(col("__bh")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val corpusCand = corpusBandsFor(bhVals)
      .select(col(idCol).as("id_a"), col("band").as("__band"),
        col("bh").as("__bh"))
      // batch side broadcast: the corpus index is probed map-side,
      // never shuffled
      .join(broadcast(batchBands.select(col("__id").as("id_b"),
        col("__band"), col("__bh"))), Seq("__band", "__bh"))
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), lit(false).as("__batch_a"), col("id_b"))
    val inBatchCand = batchBands
      .select(col("__id").as("id_a"), col("__band"), col("__bh"))
      .join(batchBands.select(col("__id").as("id_b"), col("__band"),
        col("__bh")), Seq("__band", "__bh"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), lit(true).as("__batch_a"), col("id_b"))
    val candidates = corpusCand.unionByName(inBatchCand)
      .dropDuplicates("id_a", "id_b")
      // consumed twice (corpus-id probe + verify); collision-set-sized
      .localCheckpoint()
    val corpusIds = candidates.where(!col("__batch_a"))
      .select(col("id_a")).distinct()
    val nCorpusIds = corpusIds.count()
    val corpusSh = {
      val base =
        if (nCorpusIds <= maxPrunedLookup)
          corpusShFor(Some(corpusIds.collect().map(_.get(0)).toSeq))
        else corpusShFor(None)
      // re-apply the exact id predicate over the file-granularity
      // superset
      base.select(col(idCol).as("__id"), col("sh").as("__sh"))
        .join(broadcast(corpusIds.withColumnRenamed("id_a", "__id")),
          Seq("__id"), "left_semi")
    }
    val sets = batch.select(col("__id"), col("__sh")).unionByName(corpusSh)
    val verified = candidates
      .join(sets.select(col("__id").as("id_a"), col("__sh").as("__sh_a")), Seq("id_a"))
      .join(sets.select(col("__id").as("id_b"), col("__sh").as("__sh_b")), Seq("id_b"))
      .where((size(array_intersect(col("__sh_a"), col("__sh_b"))).cast(DoubleType) /
        (size(col("__sh_a")) + size(col("__sh_b")) -
          size(array_intersect(col("__sh_a"), col("__sh_b"))))) >= threshold)
      .groupBy(col("id_b"))
      .agg(
        max(when(!col("__batch_a"), true).otherwise(false)).as("__dup_corpus"),
        max(when(col("__batch_a"), true).otherwise(false)).as("__dup_batch"))
    batchSigs.select(col(idCol))
      .join(verified.withColumnRenamed("id_b", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__dup_corpus"), lit(false)).as("dup_of_corpus"),
        coalesce(col("__dup_batch"), lit(false)).as("dup_in_batch"),
        (!coalesce(col("__dup_corpus"), lit(false)) &&
          !coalesce(col("__dup_batch"), lit(false))).as("keep"))
  }
}
