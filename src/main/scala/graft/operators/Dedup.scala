package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Deduplication operators for a training-data pipeline (E12–E13).
  *
  * Three tiers, by scale behavior:
  *   - [[q30ExactDedup]]: exact duplicate collapse on a content
  *     fingerprint — one hash shuffle; the workhorse at any scale.
  *   - [[q34JaccardPairs]]: *exact* similarity join via a shingle
  *     inverted index — no O(n²) cross join, but the index join's cost
  *     grows with shingle document frequency; right up to ~10⁸ docs.
  *   - [[NearDup.minHashPairs]] (declared as q35, rows-only checked):
  *     MinHash-LSH — candidate generation is O(n·bands), the scalable
  *     path for 100 TB corpora where even the inverted index is too hot.
  */
object Dedup {

  /** Word 3-gram shingle set (distinct), the unit of textual overlap. */
  private[operators] def shingles(toks: Column): Column =
    array_distinct(transform(
      sequence(lit(1), size(toks) - 2),
      i => concat_ws(" ",
        element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))

  /** Exact dedup on the bag-of-words fingerprint: md5 of the sorted
    * distinct token set. Near-duplicates that are reorderings/repetitions
    * of the same vocabulary collapse to one representative (min doc_id) —
    * a deterministic keep-first policy the oracle can replay.
    */
  def q30ExactDedup(spark: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.documents(spark, d)
      .select(col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(toks)))).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
  }

  val q30Sql: String =
    """SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint,
      | min(doc_id) AS keep_doc_id, count(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  /** Exact n-gram Jaccard similarity join: all pairs with shingle-set
    * Jaccard ≥ 0.6, computed with an inverted shingle index — explode to
    * (shingle, doc), self-join on shingle, count shared shingles per
    * pair, then |A∩B| / (|A|+|B|−|A∩B|). Every step is a hash shuffle;
    * no cross join. At extreme scale, ultra-frequent shingles make the
    * index join skewed — that's when the MinHash-LSH variant (q35) takes
    * over as the approximate path.
    */
  def q34JaccardPairs(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), shingles(split(col("text"), " ")).as("sh"))
      .where(size(col("sh")) > 0)
    val counts = docs.select(col("doc_id"), size(col("sh")).as("n_sh"))
    val inverted = docs.select(col("doc_id"), explode(col("sh")).as("s"))
    val a = inverted.select(col("doc_id").as("doc_a"), col("s"))
    val b = inverted.select(col("doc_id").as("doc_b"), col("s"))
    val inter = a.join(b, Seq("s"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(counts.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), Seq("doc_a"))
      .join(counts.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast(DoubleType) /
          (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
      .where(col("jaccard") >= 0.6)
  }

  val q34Sql: String =
    """SELECT doc_a, doc_b, jaccard FROM (
      | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
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
}
