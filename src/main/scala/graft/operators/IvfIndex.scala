package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{GraftFunctions, VectorAvg}

/** IVF (inverted-file) index for approximate nearest-neighbor search —
  * the second scale path next to hyperplane LSH
  * ([[Similarity.annCosineTopK]]).
  *
  * Build: k-means-lite over cosine distance. Initial centroids are a
  * deterministic hash-ordered sample; each refinement step is one
  * broadcast join (vectors × centroids, centroid count is small by
  * design) + one [[VectorAvg]] aggregation — both distributed, no
  * driver-side math over the corpus. Vectors land in exactly one list.
  *
  * Search: score query × centroids (broadcast), keep `nProbe` nearest
  * lists, join those lists' vectors only, exact-rank with the codegen'd
  * [[graft.functions.CosineSimilarity]]. Cost per query is
  * O(nProbe/nLists · n) instead of O(n); recall is tunable via nProbe
  * (spec-measured against brute force).
  */
object IvfIndex {

  /** (centroids: list_id|centroid, assignments: id|list_id|emb). */
  final case class Ivf(centroids: DataFrame, assignments: DataFrame)

  private def toDouble(c: Column): Column = transform(c, x => x.cast(DoubleType))

  /** Assign every vector to its max-cosine centroid: one broadcast join
    * + one `max_by` hash aggregate. The previous window-argmax shuffled
    * n·nLists rows and SORTED each __id group just to keep rank 1; the
    * aggregate keeps one running best per vector (partial map-side, no
    * sort) — the shape that survives 100 TB. Ties break to the lowest
    * list_id via the (sim, -list_id) ordering struct, matching the old
    * window's (sim desc, list_id asc).
    */
  private def assign(vectors: DataFrame, centroids: DataFrame): DataFrame =
    vectors.crossJoin(broadcast(centroids))
      .withColumn("__sim",
        GraftFunctions.cosineSimilarity(col("__e"), col("centroid")))
      .groupBy(col("__id"))
      .agg(max_by(
        struct(col("list_id"), col("__e")),
        struct(col("__sim"), (-col("list_id")).as("__nl"))).as("__best"))
      .select(col("__id"), col("__best.list_id").as("list_id"), col("__best.__e").as("__e"))

  def build(
      vectors: DataFrame,
      idCol: String,
      embCol: String,
      dim: Int,
      nLists: Int,
      iterations: Int = 2,
      seed: Long = 42L): Ivf = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val base = vectors.select(
      col(idCol).as("__id"), toDouble(col(embCol)).as("__e"))

    // Centroids are nLists rows — driver metadata, not data. Each step
    // collects them to a LocalRelation so (a) the k-means lineage is cut
    // at every iteration (a chained-DataFrame `var` would re-execute the
    // whole sample→assign→avg chain on EVERY downstream action of every
    // consumer), and (b) the assign broadcast is a literal local plan,
    // not a recomputed subtree. The sample's hash order also assigns
    // list_ids here, driver-side, instead of a degenerate
    // single-partition window.
    def localize(rows: Array[(Int, Seq[Double])]): DataFrame =
      rows.toSeq.toDF("list_id", "centroid")

    var centroids = localize(
      base.orderBy(xxhash64(col("__id"), lit(seed)))
        .limit(nLists)
        .select(col("__e"))
        .collect()
        .zipWithIndex
        .map { case (r, i) => (i + 1, r.getSeq[Double](0)) })

    (1 to iterations).foreach { _ =>
      centroids = localize(
        assign(base, centroids)
          .groupBy(col("list_id"))
          .agg(VectorAvg.of(dim)(
            transform(col("__e"), x => x.cast(FloatType))).as("cf"))
          .select(col("list_id"), toDouble(col("cf")).as("centroid"))
          .collect()
          .map(r => (r.getInt(0), r.getSeq[Double](1))))
    }
    Ivf(centroids, assign(base, centroids))
  }

  /** Approximate top-k: probe the `nProbe` nearest lists per query. */
  def search(
      ivf: Ivf,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int = 10,
      nProbe: Int = 2): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"), toDouble(col(embCol)).as("__qe"))

    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__csim").desc, col("list_id"))
    val probes = q.crossJoin(broadcast(ivf.centroids))
      .withColumn("__csim",
        GraftFunctions.cosineSimilarity(col("__qe"), col("centroid")))
      .withColumn("__rn", row_number().over(wProbe))
      .where(col("__rn") <= nProbe)
      .select(col("query_id"), col("__qe"), col("list_id"))

    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    probes.join(ivf.assignments, Seq("list_id"))
      .where(col("__id") =!= col("query_id"))
      .select(col("query_id"), col("__id").as("vec_id"),
        GraftFunctions.cosineSimilarity(col("__e"), col("__qe")).as("cos_sim"))
      .withColumn("rank", row_number().over(wRank))
      .where(col("rank") <= k)
  }

  /** Declared q44: IVF search over twin queries (see
    * [[Similarity.twinQueries]]), gated two ways: each twin must come
    * back at rank 1 (deterministic — an identical vector's list is the
    * query's top probe), and the per-query overlap with the brute-force
    * exact top-10 must clear a calibrated floor. Probe/build regressions
    * go driver-visible red.
    */
  def q44IvfRecallGate(spark: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val e = graft.core.Tables.embeddings(spark, d)
    val corpus = e.where(col("vec_id") >= 5)
    val twins = Similarity.twinQueries(e)
    val ivf = build(corpus, "vec_id", "embedding", 64, nLists = 8)
    val approx = search(ivf, twins, "vec_id", "embedding", k = 10, nProbe = 3)
    val twinHit = approx.groupBy(col("query_id"))
      .agg(count(lit(1)).as("k"),
        max(when(col("rank") === 1 &&
          col("vec_id") === col("query_id") - 10000L, 1)).as("__t"))
    val exact = Similarity.bruteCosineTopK(corpus, twins, "vec_id", "embedding")
      .select(col("query_id"), col("vec_id"))
    exact
      .join(approx.select(col("query_id"), col("vec_id"), lit(1).as("__f")),
        Seq("query_id", "vec_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("__n"), count(col("__f")).as("__hits"))
      .join(twinHit, Seq("query_id"))
      .select(col("query_id"), col("k"), (col("__t") === 1).as("twin_at_rank_1"),
        (col("__hits").cast(DoubleType) / col("__n") >= 0.2).as("overlap_ge_020"))
  }

  val q44Sql: String =
    """SELECT vec_id + 10000 AS query_id, CAST(10 AS BIGINT) AS k,
      | true AS twin_at_rank_1, true AS overlap_ge_020
      |FROM embeddings WHERE vec_id BETWEEN 5 AND 9""".stripMargin
}
