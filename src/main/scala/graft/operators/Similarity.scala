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

  /** Brute-force top-k cosine neighbors for a fixed query set (vec_id <
    * 5) against the rest of the corpus. The query side is broadcast —
    * the join is shuffle-free; the window ranks per query.
    */
  def q32CosineTopK(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(spark, d)
    val queries = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val candidates = e.where(col("vec_id") >= 5)
      .select(col("vec_id"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    candidates.crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        graft.functions.GraftFunctions
          .cosineSimilarity(col("ce"), col("qe")).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 10)
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
}
