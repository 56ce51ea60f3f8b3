package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.core.Tables

/** Lexical retrieval over the corpus: BM25 — the no-model search
  * baseline every data pipeline needs (eval-set mining, targeted corpus
  * audits, hard-query selection) before any embedding index exists.
  * Complements the vector side ([[Similarity]]/[[IvfIndex]]) and the
  * hashed-TF cosine search ([[TextAnalysis.hashingTfVectors]], q77)
  * with the classic probabilistic-relevance ranking.
  *
  * Scale shape: the corpus is tokenized ONCE into a postings relation
  * (doc, term, tf) — one explode + one hash aggregate; document-length
  * and corpus stats (N, avgdl) reduce to one broadcast row; the query
  * side is search-request-sized by definition and broadcasts into the
  * postings join, so the corpus never reshuffles per query. Scoring is
  * additive over matched terms (map-side partial aggregation applies)
  * and top-k is a partitioned window (WindowGroupLimit pushes the limit
  * into the shuffle). A 100 TB corpus costs one postings build; each
  * query batch is a broadcast join over it.
  */
object Retrieval {

  /** BM25 top-k: for each query row, the `k` highest-scoring documents.
    *
    * Scores are rounded to 1e-6 BEFORE ranking (and emitted rounded) so
    * the rank order is reproducible across engines: float summation
    * order may differ at the ulp level, and an unrounded
    * order-by-double would let that noise flip ranks between
    * equal-scored near-duplicate documents.
    *
    * @return (query_id, rank, doc_id, score)
    */
  def bm25TopK(
      docs: DataFrame,
      queries: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val toks = docs.select(col(idCol).as("__doc"),
      split(col(textCol), " ").as("__t"))
    val postings = toks
      .select(col("__doc"), explode(col("__t")).as("__term"))
      .groupBy(col("__doc"), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val lens = toks.select(col("__doc"), size(col("__t")).cast(DoubleType).as("__dl"))
    // corpus constants: one row, broadcast into the scoring join
    val stats = lens.agg(
      count(lit(1)).cast(DoubleType).as("__n"), avg(col("__dl")).as("__avgdl"))
    val dfreq = postings.groupBy(col("__term"))
      .agg(count(lit(1)).cast(DoubleType).as("__df"))
    // query terms de-duplicated per query (binary query-term weighting)
    val qterms = queries.select(col(idCol).as("__qid"),
      explode(array_distinct(split(col(textCol), " "))).as("__term"))

    val contrib = postings
      .join(broadcast(qterms), Seq("__term"))
      .join(dfreq, Seq("__term"))
      .join(lens, Seq("__doc"))
      .crossJoin(broadcast(stats))
      .select(col("__qid"), col("__doc"),
        (log(lit(1.0) + (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))) *
          (col("__tf") * lit(k1 + 1.0)) /
          (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
          .as("__c"))
    val scored = contrib.groupBy(col("__qid"), col("__doc"))
      .agg(round(sum(col("__c")), 6).as("score"))
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("score").desc, col("__doc"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("__qid").as("query_id"), col("rank"),
        col("__doc").as("doc_id"), col("score"))
  }

  /** Declared q94: the first five documents as queries against the rest
    * of the corpus (same split as q77), BM25 top-5 each.
    */
  def q94Bm25TopK(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    bm25TopK(
      docs.where(col("doc_id") >= 5), docs.where(col("doc_id") < 5),
      "doc_id", "text", k = 5)
  }

  val q94Sql: String =
    """WITH corpus AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id >= 5),
      |tf AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(t) AS term FROM corpus) GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM corpus),
      |st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(CAST(len(t) AS DOUBLE)) AS avgdl
      |       FROM corpus),
      |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
      |q AS (
      |  SELECT doc_id AS qid, unnest(list_distinct(string_split(text, ' '))) AS term
      |  FROM documents WHERE doc_id < 5),
      |sc AS (
      |  SELECT q.qid, tf.doc_id,
      |    round(sum(ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5)) *
      |      (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))), 6) AS score
      |  FROM q JOIN tf USING (term) JOIN df USING (term)
      |  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT qid, doc_id, score,
      |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
      |  FROM sc)
      |SELECT qid AS query_id, CAST(rank AS INT) AS rank, doc_id, score
      |FROM ranked WHERE rank <= 5""".stripMargin
}
