package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Similarity search over embedding columns (E14).
  *
  * The scale shape: query vectors are few (broadcast), candidates are
  * the 100 TB side (scanned once, partial top-k per partition via the
  * rank window's sort being pushed into each shuffle partition). The
  * brute-force form is the correctness baseline; [[annCosineTopK]] is
  * the sub-linear path that prunes candidates with the same
  * random-hyperplane LSH used by [[NearDup.embeddingPairs]].
  */
object Similarity {

  private def toDouble(c: Column): Column = transform(c, x => x.cast(DoubleType))

  /** Brute-force top-k cosine neighbors — the exact baseline. The query
    * side is broadcast so the join is shuffle-free; the rank window's
    * sort runs per shuffle partition with WindowGroupLimit pushdown.
    */
  def bruteCosineTopK(
      candidates: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int = 10): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("qe"))
    val c = candidates.select(col(idCol).as("vec_id"), col(embCol).as("ce"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    c.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        graft.functions.GraftFunctions
          .cosineSimilarity(col("ce"), col("qe")).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Declared q32: brute-force top-10 for the fixed query set (vec_id <
    * 5) against the rest of the corpus.
    */
  def q32CosineTopK(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(spark, d)
    bruteCosineTopK(e.where(col("vec_id") >= 5), e.where(col("vec_id") < 5),
      "vec_id", "embedding")
  }

  val q32Sql: String =
    """SELECT query_id, vec_id, cos_sim, rank FROM (
      | SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
      |  list_dot_product(list_transform(c.embedding, x -> CAST(x AS DOUBLE)),
      |                   list_transform(q.embedding, x -> CAST(x AS DOUBLE)))
      |   / (sqrt(list_dot_product(list_transform(c.embedding, x -> CAST(x AS DOUBLE)),
      |                            list_transform(c.embedding, x -> CAST(x AS DOUBLE))))
      |    * sqrt(list_dot_product(list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
      |                            list_transform(q.embedding, x -> CAST(x AS DOUBLE))))) AS cos_sim,
      |  CAST(row_number() OVER (PARTITION BY q.vec_id
      |    ORDER BY cos_sim DESC, c.vec_id) AS INT) AS rank
      | FROM (SELECT * FROM embeddings WHERE vec_id >= 5) c
      | CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q) t
      |WHERE rank <= 10""".stripMargin

  /** Approximate top-k: LSH-bucket the corpus once, probe each query's
    * buckets across all tables, exact-rank only the collided candidates.
    * Candidate volume is O(queries · bucket occupancy), not O(n·queries);
    * recall is tunable via tables × bitsPerTable (see the spec, which
    * measures it against the brute-force baseline).
    */
  def annCosineTopK(
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      dim: Int,
      k: Int = 10,
      tables: Int = 8,
      bitsPerTable: Int = 8,
      seed: Long = 42L): DataFrame = {
    // one fused codegen pass per row computes every table's packed
    // sign-bit key (seed-identical to the historical per-plane HOF folds
    // — see HyperplaneBuckets); both sides share the planes so they
    // bucket identically
    def bucketize(df: DataFrame, id: String, emb: String): DataFrame =
      df.select(col(id).as("__id"), toDouble(col(emb)).as("__e"),
        posexplode(graft.functions.GraftFunctions
          .hyperplaneBuckets(col(emb), dim, tables, bitsPerTable, seed)))
        .withColumnRenamed("pos", "__t")
        .withColumnRenamed("col", "__bucket")

    val corpus = bucketize(vectors, idCol, embCol)
    val probes = bucketize(queries, idCol, embCol)
      .select(col("__id").as("query_id"), col("__e").as("__qe"),
        col("__t"), col("__bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    corpus.join(probes, Seq("__t", "__bucket"))
      .where(col("__id") =!= col("query_id"))
      .dropDuplicates("query_id", "__id")
      .select(col("query_id"), col("__id").as("vec_id"),
        graft.functions.GraftFunctions
          .cosineSimilarity(col("__e"), col("__qe")).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Twin query set: five corpus vectors re-labeled (+10000). Each twin
    * query has a deterministic exact nearest neighbor — its identical
    * original at cosine 1.0 — which sign-LSH and IVF MUST retrieve at
    * rank 1 (an identical vector lands in identical buckets / the same
    * probed list regardless of seed or config). This makes a hard
    * driver-visible gate possible on a fixture with no planted
    * high-similarity pairs (max non-twin pair cosine ≈ 0.5, a regime
    * outside the LSH retrieval contract; graded-recall behavior on
    * planted neighborhoods is measured in NearDupSpec/IvfIndexSpec).
    */
  private[operators] def twinQueries(e: DataFrame): DataFrame =
    e.where(col("vec_id").between(5, 9))
      .select((col("vec_id") + lit(10000L)).as("vec_id"), col("embedding"))

  /** Declared q37: ANN search over twin queries; the oracle pins the
    * query set and asserts each twin is retrieved at rank 1 — a
    * bucketing, join, or ranking regression goes driver-visible red.
    */
  def q37AnnRecallGate(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(spark, d)
    val ann = annCosineTopK(
      e.where(col("vec_id") >= 5), twinQueries(e), "vec_id", "embedding", 64)
    ann.groupBy(col("query_id"))
      .agg(max(when(col("rank") === 1 &&
        col("vec_id") === col("query_id") - 10000L, 1)).as("__t"))
      .select(col("query_id"), (col("__t") === 1).as("twin_at_rank_1"))
  }

  val q37Sql: String =
    """SELECT vec_id + 10000 AS query_id, true AS twin_at_rank_1
      |FROM embeddings WHERE vec_id BETWEEN 5 AND 9""".stripMargin

  /** Hard-negative mining for contrastive/embedding training: for each
    * query (anchor), the top-k most-similar candidates whose cosine sits
    * BELOW `positiveCeiling` — similar enough to be hard, not so similar
    * they are the positive itself (or a near-duplicate of it, which
    * would poison the loss as a false negative). The ceiling filter runs
    * before the rank window, so positives never occupy top-k slots.
    *
    * Scale shape is the brute-force one: anchors broadcast, the corpus
    * side streams through one scan, ranking is per-anchor with
    * WindowGroupLimit pushdown. For corpus-scale anchor sets, run the
    * same ceiling + rank over [[annCosineTopK]] candidates instead.
    */
  def hardNegatives(
      candidates: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int = 10,
      positiveCeiling: Double = 0.8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("qe"))
    val c = candidates.select(col(idCol).as("vec_id"), col(embCol).as("ce"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    c.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        graft.functions.GraftFunctions
          .cosineSimilarity(col("ce"), col("qe")).as("cos_sim"))
      .where(col("cos_sim") < positiveCeiling)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Declared q85: hard negatives for the twin anchors. Each twin's
    * exact duplicate (cosine 1.0) sits in the candidate set; the 0.8
    * ceiling must evict it, so every returned row is a genuine
    * below-ceiling neighbor — rank 1 is the hardest usable negative,
    * not the positive.
    */
  def q85HardNegatives(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(spark, d)
    hardNegatives(e.where(col("vec_id") >= 5), twinQueries(e),
      "vec_id", "embedding", k = 5)
  }

  val q85Sql: String =
    """SELECT query_id, vec_id, cos_sim, rank FROM (
      | SELECT query_id, vec_id, cos_sim,
      |  CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY cos_sim DESC, vec_id) AS INT) AS rank
      | FROM (
      |  SELECT q.vec_id + 10000 AS query_id, c.vec_id AS vec_id,
      |   list_dot_product(list_transform(c.embedding, x -> CAST(x AS DOUBLE)),
      |                    list_transform(q.embedding, x -> CAST(x AS DOUBLE)))
      |    / (sqrt(list_dot_product(list_transform(c.embedding, x -> CAST(x AS DOUBLE)),
      |                             list_transform(c.embedding, x -> CAST(x AS DOUBLE))))
      |     * sqrt(list_dot_product(list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
      |                             list_transform(q.embedding, x -> CAST(x AS DOUBLE))))) AS cos_sim
      |  FROM (SELECT * FROM embeddings WHERE vec_id >= 5) c
      |  CROSS JOIN (SELECT * FROM embeddings WHERE vec_id BETWEEN 5 AND 9) q
      |  WHERE c.vec_id <> q.vec_id + 10000) s
      | WHERE cos_sim < 0.8) t
      |WHERE rank <= 5""".stripMargin

  /** Per-group embedding centroid vs the corpus centroid — the
    * embedding-space drift monitor: a label (source, language, crawl
    * snapshot) whose centroid swings away from the corpus mean signals
    * distribution shift the token-level KL (q84) can't see. Centroids
    * come from the typed [[graft.functions.VectorAvg]] aggregator
    * (map-side partial merge, one shuffle of per-partition sums —
    * dim doubles per group, not per row); the corpus centroid is a
    * broadcast one-row aggregate.
    *
    * Oracle comparability: VectorAvg sums in double and truncates the
    * finished mean to float32; the oracle replicates the truncation
    * (`CAST(avg AS REAL)`) so both engines feed bit-identical floats
    * into the double cosine — which uses the same `dot / sqrt(na·nb)`
    * form as [[graft.functions.CosineSimilarity]].
    */
  def centroidDrift(
      vecs: DataFrame,
      groupCol: String,
      embCol: String,
      dim: Int): DataFrame = {
    val per = vecs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_vecs"),
        graft.functions.VectorAvg.of(dim)(col(embCol)).as("__c"))
    val corpus = vecs.agg(
      graft.functions.VectorAvg.of(dim)(col(embCol)).as("__all"))
    per.crossJoin(broadcast(corpus))
      .select(col(groupCol), col("n_vecs"),
        graft.functions.GraftFunctions
          .cosineSimilarity(col("__c"), col("__all")).as("centroid_cos"))
  }

  /** Declared q88: label-level centroid drift over the embeddings
    * fixture — the first driver-visible oracle exercising the VectorAvg
    * UDAF end-to-end.
    */
  def q88CentroidDrift(spark: SparkSession, d: String): DataFrame =
    centroidDrift(Tables.embeddings(spark, d), "label", "embedding", 64)

  val q88Sql: String =
    """WITH ex AS (
      |  SELECT label, i,
      |    CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
      |  FROM embeddings, range(1, 65) r(i)),
      |per AS (SELECT label, i, CAST(avg(v) AS REAL) AS c FROM ex GROUP BY 1, 2),
      |tot AS (SELECT i, CAST(avg(v) AS REAL) AS c FROM ex GROUP BY 1),
      |n AS (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY 1),
      |dots AS (
      |  SELECT per.label,
      |    sum(CAST(per.c AS DOUBLE) * CAST(tot.c AS DOUBLE)) AS ab,
      |    sum(CAST(per.c AS DOUBLE) * CAST(per.c AS DOUBLE)) AS aa,
      |    sum(CAST(tot.c AS DOUBLE) * CAST(tot.c AS DOUBLE)) AS bb
      |  FROM per JOIN tot USING (i) GROUP BY per.label)
      |SELECT n.label, n.n_vecs, ab / sqrt(aa * bb) AS centroid_cos
      |FROM dots JOIN n USING (label)""".stripMargin

  /** Int8 scalar quantization of an embedding column — the 4× memory
    * shrink every ANN index at 100 TB scale applies before anything else
    * (FAISS's SQ8). Per vector: symmetric scale = max|x| / 127, each
    * element rounds to [-127, 127], and the root-mean-square
    * reconstruction error is reported so a pipeline can gate on
    * quantization loss. Pure per-row array math in one codegen
    * projection: no shuffle, no state.
    *
    * Floats are widened to double BEFORE any arithmetic: float32
    * division differs between engines' evaluation orders, while
    * float→double widening is exact and double math is IEEE-identical —
    * that is what makes the declared query hash-comparable.
    */
  def quantizeInt8(
      vecs: DataFrame,
      idCol: String,
      embCol: String): DataFrame = {
    val xs = transform(col(embCol), x => x.cast(DoubleType))
    // the max-abs reduction lands in aggregate's FINISH lambda so
    // `scale` is a BOUND VALUE inside the per-element lambdas below —
    // written as a sibling expression it would be inlined into each
    // lambda body and the O(dim) fold would re-run per element
    // (O(dim²) per row; see hashingTfVectors for the same trap)
    val packed = aggregate(
      xs, lit(0d), (acc, x) => greatest(acc, abs(x)),
      mx => {
        val scale = mx / lit(127.0)
        val q = when(scale === 0d, transform(xs, _ => lit(0)))
          .otherwise(transform(xs, x => round(x / scale).cast(IntegerType)))
        val err = when(scale === 0d, lit(0d)).otherwise(
          sqrt(aggregate(
            zip_with(xs, q, (x, qi) => {
              val d = x - qi.cast(DoubleType) * scale
              d * d
            }),
            lit(0d), (acc, v) => acc + v) / size(col(embCol))))
        // positional checksum pins every quantized VALUE in the oracle
        // hash without emitting 64 columns
        val checksum = aggregate(
          zip_with(q, sequence(lit(1), size(col(embCol))),
            (qi, i) => qi.cast(LongType) * i.cast(LongType)),
          lit(0L), (acc, v) => acc + v)
        struct(scale.as("scale"), err.as("rms_err"), checksum.as("q_checksum"))
      })
    vecs.select(
      col(idCol),
      packed.getField("scale").as("scale"),
      packed.getField("rms_err").as("rms_err"),
      packed.getField("q_checksum").as("q_checksum"))
  }

  /** Declared q65 — SQ8 over the embeddings fixture. */
  def q65QuantizeInt8(spark: SparkSession, d: String): DataFrame =
    quantizeInt8(Tables.embeddings(spark, d), "vec_id", "embedding")

  val q65Sql: String =
    """WITH v AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs,
      |    len(embedding) AS n
      |  FROM embeddings),
      |s AS (
      |  SELECT vec_id, xs, n,
      |    list_max(list_transform(xs, x -> abs(x))) / 127.0 AS scale
      |  FROM v),
      |q AS (
      |  SELECT vec_id, xs, n, scale,
      |    CASE WHEN scale = 0 THEN list_transform(xs, x -> 0)
      |         ELSE list_transform(xs, x -> CAST(round(x / scale) AS INT))
      |    END AS qs
      |  FROM s)
      |SELECT vec_id, scale,
      |  CASE WHEN scale = 0 THEN 0.0
      |       ELSE sqrt(list_sum(list_transform(generate_series(1, n),
      |              i -> (xs[i] - qs[i] * scale) * (xs[i] - qs[i] * scale))) / n)
      |  END AS rms_err,
      |  CAST(list_sum(list_transform(generate_series(1, n),
      |    i -> CAST(qs[i] AS BIGINT) * i)) AS BIGINT) AS q_checksum
      |FROM q""".stripMargin

  /** Johnson–Lindenstrauss random projection with a ±1 (Achlioptas,
    * JCSS 2003) sign matrix: p_j = Σ_i s(j,i)·x_i / √d_out. The signs
    * come from the repo's md5 portable-determinism scheme, so the
    * "random" matrix is a 512-entry CONSTANT any engine recomputes —
    * and on the Spark side it is baked into the plan as literal
    * arrays: the whole projection is one codegen'd
    * `aggregate(zip_with(...))` per output dim. Map-only, zero
    * shuffles, zero joins — the preprocessing step that makes
    * downstream ANN/clustering 8× narrower at 100 TB.
    *
    * @param inDims  input dimensionality (signs are plan constants,
    *                so the width is fixed up front; rows are required
    *                to match)
    * @return idCol plus p0..p{outDims−1} doubles (6 dp)
    */
  def randomProjection(df: DataFrame, idCol: String, vecCol: String,
      inDims: Int, outDims: Int, salt: String): DataFrame = {
    require(outDims >= 1 && inDims >= 1)
    // native codegen'd signed dot per output dim — the HOF
    // aggregate(zip_with(...)) formulation is CodegenFallback and left
    // the whole projection interpreted (PlanShapeSpec pins the fix);
    // division happens AFTER the sum so term arithmetic stays bitwise
    // identical to the SQL oracle
    val scale = math.sqrt(outDims.toDouble)
    val projs = (0 until outDims).map { j =>
      round(graft.functions.GraftFunctions
        .signedDot(col(vecCol), salt, j, inDims, outDims) / scale, 6)
        .as(s"p$j")
    }
    df.where(size(col(vecCol)) === inDims)
      .select(col(idCol) +: projs: _*)
  }

  /** Declared q208: the 64-dim fixture embeddings sketched to 8 dims. */
  def q208RandomProjection(spark: SparkSession, d: String): DataFrame =
    randomProjection(Tables.embeddings(spark, d), "vec_id", "embedding",
      inDims = 64, outDims = 8, salt = "rp")

  /** k-NN label probe — the standard embedding-quality eval: predict
    * each held-out vector's label by majority vote over its k nearest
    * corpus neighbors (tie → smaller label id; vote counts over the
    * [[bruteCosineTopK]] list). A kNN probe that beats chance means
    * the embedding space actually encodes the labels — run before
    * trusting the space for retrieval or clustering.
    *
    * Scale shape: the query side is small (broadcast through the
    * top-k), the vote is a (query, label)-keyed hash aggregate over
    * k·|queries| rows, argmax via one rank window over the same tiny
    * relation.
    */
  def knnLabelVote(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, labelCol: String, k: Int): DataFrame = {
    val top = bruteCosineTopK(corpus, queries, idCol, embCol, k)
    val votes = top
      .join(corpus.select(col(idCol).as("vec_id"),
        col(labelCol).as("__nl")), Seq("vec_id"))
      .groupBy(col("query_id"), col("__nl"))
      .agg(count(lit(1)).as("__v"))
    val byVotes = Window.partitionBy(col("query_id"))
      .orderBy(col("__v").desc, col("__nl"))
    val pred = votes
      .withColumn("__rk", row_number().over(byVotes))
      .where(col("__rk") === 1)
      .select(col("query_id"), col("__nl").as("predicted"),
        col("__v").as("votes"))
    pred.join(queries.select(col(idCol).as("query_id"),
        col(labelCol).as("true_label")), Seq("query_id"))
      .select(col("query_id"), col("predicted").cast("int").as("predicted"),
        col("votes"), col("true_label").cast("int").as("true_label"),
        (col("predicted") === col("true_label")).as("correct"))
  }

  /** Declared q222: 10-NN label vote for vec_id < 10 probes. */
  def q222KnnLabel(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(spark, d)
    knnLabelVote(e.where(col("vec_id") >= 10), e.where(col("vec_id") < 10),
      "vec_id", "embedding", "label", k = 10)
  }

  private val knnCoreSql: String =
    """sc AS (
      | SELECT q.vec_id AS query_id, c.vec_id AS vec_id, c.label AS nl,
      |  list_dot_product(list_transform(c.embedding, x -> CAST(x AS DOUBLE)),
      |                   list_transform(q.embedding, x -> CAST(x AS DOUBLE)))
      |   / (sqrt(list_dot_product(list_transform(c.embedding, x -> CAST(x AS DOUBLE)),
      |                            list_transform(c.embedding, x -> CAST(x AS DOUBLE))))
      |    * sqrt(list_dot_product(list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
      |                            list_transform(q.embedding, x -> CAST(x AS DOUBLE)))))
      |   AS cos_sim
      | FROM embeddings c CROSS JOIN embeddings q
      | WHERE q.vec_id < 10 AND c.vec_id >= 10),
      |top AS (
      | SELECT query_id, nl FROM sc
      | QUALIFY row_number() OVER (PARTITION BY query_id
      |   ORDER BY cos_sim DESC, vec_id) <= 10),
      |votes AS (
      | SELECT query_id, nl, count(*) AS v FROM top GROUP BY 1, 2),
      |pred AS (
      | SELECT query_id, nl AS predicted, v AS votes FROM votes
      | QUALIFY row_number() OVER (PARTITION BY query_id
      |   ORDER BY v DESC, nl) = 1),
      |labeled AS (
      | SELECT p.query_id, CAST(p.predicted AS INT) AS predicted, p.votes,
      |   CAST(q.label AS INT) AS true_label,
      |   p.predicted = q.label AS correct
      | FROM pred p JOIN embeddings q ON q.vec_id = p.query_id)""".stripMargin

  val q222Sql: String =
    s"""WITH $knnCoreSql
       |SELECT query_id, predicted, votes, true_label, correct
       |FROM labeled""".stripMargin

  /** Per-label classifier report over the q222 predictions —
    * support / tp / fp / fn / precision / recall / F1 per TRUE label
    * (zero-denominator conventions pinned to 0). The report relation
    * is label-domain-bounded; everything reduces to two tiny hash
    * aggregates over the prediction relation.
    */
  def q223KnnReport(spark: SparkSession, d: String): DataFrame =
    classifierReport(q222KnnLabel(spark, d))

  /** Per-label precision/recall/F1 from a (true_label, predicted)
    * relation — the report half of [[q223KnnReport]], reusable for
    * any classifier's predictions.
    */
  def classifierReport(predictions: DataFrame): DataFrame = {
    val preds = predictions
      .select(col("true_label"), col("predicted"))
      .localCheckpoint() // consumed by the per-true and per-pred rollups
    val byTrue = preds.groupBy(col("true_label").as("label"))
      .agg(count(lit(1)).as("support"),
        count(when(col("predicted") === col("true_label"), 1)).as("tp"))
    val byPred = preds.groupBy(col("predicted").as("label"))
      .agg(count(lit(1)).as("__npred"))
    val p = col("tp").cast("double") /
      when(col("__npred") > 0, col("__npred"))
    val r = col("tp").cast("double") / col("support")
    byTrue.join(byPred, Seq("label"), "left")
      .select(col("label"), col("support"), col("tp"),
        (coalesce(col("__npred"), lit(0L)) - col("tp")).as("fp"),
        (col("support") - col("tp")).as("fn"),
        round(coalesce(p, lit(0.0)), 6).as("precision"),
        round(r, 6).as("recall"),
        round(when(coalesce(p, lit(0.0)) + r > 0,
          lit(2.0) * coalesce(p, lit(0.0)) * r / (coalesce(p, lit(0.0)) + r))
          .otherwise(lit(0.0)), 6).as("f1"))
  }

  val q223Sql: String =
    s"""WITH $knnCoreSql,
       |byt AS (
       | SELECT true_label AS label, count(*) AS support,
       |   sum(CASE WHEN predicted = true_label THEN 1 ELSE 0 END) AS tp
       | FROM labeled GROUP BY 1),
       |byp AS (
       | SELECT predicted AS label, count(*) AS npred FROM labeled GROUP BY 1)
       |SELECT byt.label, CAST(support AS BIGINT) AS support,
       |  CAST(tp AS BIGINT) AS tp,
       |  CAST(coalesce(npred, 0) - tp AS BIGINT) AS fp,
       |  CAST(support - tp AS BIGINT) AS fn,
       |  round(coalesce(CAST(tp AS DOUBLE) / nullif(npred, 0), 0.0), 6)
       |    AS precision,
       |  round(CAST(tp AS DOUBLE) / support, 6) AS recall,
       |  round(CASE WHEN coalesce(CAST(tp AS DOUBLE) / nullif(npred, 0), 0.0)
       |      + CAST(tp AS DOUBLE) / support > 0
       |    THEN 2.0 * coalesce(CAST(tp AS DOUBLE) / nullif(npred, 0), 0.0)
       |      * (CAST(tp AS DOUBLE) / support)
       |      / (coalesce(CAST(tp AS DOUBLE) / nullif(npred, 0), 0.0)
       |        + CAST(tp AS DOUBLE) / support)
       |    ELSE 0.0 END, 6) AS f1
       |FROM byt LEFT JOIN byp ON byp.label = byt.label""".stripMargin

  val q208Sql: String = {
    // single-line column expressions: a line starting with "||" would
    // be mangled by stripMargin, so no margins anywhere in this SQL
    val cols = (0 until 8).map { j =>
      s"round(list_sum(list_transform(generate_series(1, 64), " +
        s"i -> CAST(embedding[i] AS DOUBLE) * " +
        s"(CASE WHEN ('0x' || substring(md5('rp|$j|' || CAST(i AS VARCHAR)), " +
        s"1, 15))::BIGINT % 2 = 0 THEN 1.0 ELSE -1.0 END))) / sqrt(8), 6) AS p$j"
    }.mkString(",\n  ")
    s"SELECT vec_id,\n  $cols\nFROM embeddings WHERE len(embedding) = 64"
  }

  /** Top principal component of an embedding table by PINNED power
    * iteration on the (mean-centered) covariance — the first-line
    * embedding-space diagnostic: a dominant component explaining most
    * variance is the classic anisotropic-collapse smell, and the
    * loadings say WHICH dims carry it. Run-to-convergence is neither
    * oracle-expressible nor stage-count-deterministic, so the
    * iteration count is part of the contract (3 from the uniform
    * start), as is every rounding pin: means → 9 dp, each iterate's
    * unnormalized image w → 4 dp, each normalized v → 9 dp — both
    * engines then operate on bit-identical vectors at every step
    * regardless of their internal summation order.
    *
    * Scale shape: never materializes a d×d covariance and never
    * shuffles — one aggregate pass for the means, one per iteration
    * computing all d image sums (the projection u = x̃ᵀv is a
    * 64-term codegen'd row expression computed ONCE per row, then
    * reused by every per-dim sum), with total variance folded into
    * the final pass. Driver state is the d-vector between passes
    * (dimension-bounded, the [[IvfIndex]] centroid precedent).
    * λ is the Rayleigh quotient v₂ᵀw₃ and explained_share = λ/Σ‖x̃‖².
    *
    * @return one row per dim: dim, loading (6 dp), lambda,
    *         explained_share (both constant across rows)
    */
  def topPrincipalComponent(emb: DataFrame, vecCol: String, dims: Int,
      iterations: Int = 3): DataFrame = {
    require(iterations >= 1 && dims >= 1)
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val x = emb.where(size(col(vecCol)) === dims)
    def xe(j: Int): Column = element_at(col(vecCol), j + 1).cast("double")
    val meanRow = x
      .select((0 until dims).map(j => avg(xe(j)).as(s"m$j")): _*)
      .collect().head
    val m = (0 until dims).map(j => r(meanRow.getDouble(j), 9))
    def xc(j: Int): Column = xe(j) - lit(m(j))
    var v = Array.fill(dims)(r(1.0 / math.sqrt(dims.toDouble), 9))
    var lambda = 0.0
    var tvar = 0.0
    for (it <- 1 to iterations) {
      val u = (0 until dims).map(j => xc(j) * lit(v(j)))
        .reduce(_ + _).as("__u")
      val projected = x.select(col(vecCol), u)
      val aggs = (0 until dims)
        .map(j => sum(col("__u") * xc(j)).as(s"w$j")) ++
        (if (it == iterations)
          Seq(sum((0 until dims).map(j => xc(j) * xc(j))
            .reduce(_ + _)).as("t"))
        else Nil)
      val row = projected.agg(aggs.head, aggs.tail: _*).collect().head
      val w = Array.tabulate(dims)(j => r(row.getDouble(j), 4))
      if (it == iterations) {
        tvar = r(row.getDouble(dims), 4)
        lambda = r(w.zip(v).map { case (a, b) => a * b }.sum, 6)
      }
      val norm = math.sqrt(w.map(t => t * t).sum)
      require(norm > 0, "power iteration collapsed to the zero vector")
      v = w.map(t => r(t / norm, 9))
    }
    val explained = r(lambda / tvar, 6)
    val sp = emb.sparkSession
    import sp.implicits._
    (0 until dims)
      .map(j => (j + 1, r(v(j), 6), lambda, explained))
      .toDF("dim", "loading", "lambda", "explained_share")
  }

  /** Declared q246: the fixture embeddings' top principal component
    * after 3 pinned power iterations.
    */
  def q246TopPc(spark: SparkSession, d: String): DataFrame =
    topPrincipalComponent(Tables.embeddings(spark, d), "embedding",
      dims = 64, iterations = 3)

  val q246Sql: String =
    """WITH pos AS (SELECT CAST(range AS INT) AS i FROM range(1, 65)),
      |xe AS (
      |  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      |  FROM embeddings, pos WHERE len(embedding) = 64),
      |mn AS (SELECT i, round(avg(x), 9) AS m FROM xe GROUP BY 1),
      |xc AS (SELECT vec_id, i, x - m AS xc FROM xe JOIN mn USING (i)),
      |u1 AS (SELECT vec_id, sum(xc * 0.125) AS u FROM xc GROUP BY 1),
      |w1 AS (
      |  SELECT i, round(sum(xc.xc * u1.u), 4) AS w
      |  FROM xc JOIN u1 USING (vec_id) GROUP BY i),
      |v1 AS (SELECT i,
      |  round(w / (SELECT sqrt(sum(w * w)) FROM w1), 9) AS v FROM w1),
      |u2 AS (
      |  SELECT vec_id, sum(xc.xc * v1.v) AS u
      |  FROM xc JOIN v1 USING (i) GROUP BY vec_id),
      |w2 AS (
      |  SELECT i, round(sum(xc.xc * u2.u), 4) AS w
      |  FROM xc JOIN u2 USING (vec_id) GROUP BY i),
      |v2 AS (SELECT i,
      |  round(w / (SELECT sqrt(sum(w * w)) FROM w2), 9) AS v FROM w2),
      |u3 AS (
      |  SELECT vec_id, sum(xc.xc * v2.v) AS u
      |  FROM xc JOIN v2 USING (i) GROUP BY vec_id),
      |w3 AS (
      |  SELECT i, round(sum(xc.xc * u3.u), 4) AS w
      |  FROM xc JOIN u3 USING (vec_id) GROUP BY i),
      |v3 AS (SELECT i,
      |  round(w / (SELECT sqrt(sum(w * w)) FROM w3), 9) AS v FROM w3),
      |lam AS (
      |  SELECT round(sum(v2.v * w3.w), 6) AS l
      |  FROM v2 JOIN w3 USING (i)),
      |tv AS (SELECT round(sum(xc * xc), 4) AS t FROM xc)
      |SELECT i AS dim, round(v3.v, 6) AS loading, lam.l AS lambda,
      |  round(lam.l / tv.t, 6) AS explained_share
      |FROM v3 CROSS JOIN lam CROSS JOIN tv""".stripMargin
}
