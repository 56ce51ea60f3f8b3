package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Character-n-gram language identification (E15's lang-ID heuristic):
  * the classic profile method — a language's character-trigram
  * frequency profile is learned from labeled text, and a document is
  * assigned the label whose profile it overlaps most.
  *
  * Shape at scale: profile training is one explode + two hash
  * aggregates over the labeled corpus; the resulting profiles (top-N
  * trigrams per language — a few KB each) broadcast into the scoring
  * join, so classifying a 100 TB corpus is a broadcast join + window,
  * never a shuffle of the corpus by language.
  */
object LangId {

  /** One row per lower-cased character trigram occurrence (text padded
    * with two boundary spaces so short tokens still contribute).
    */
  private def trigramRows(df: DataFrame, textCol: String): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .withColumn("__padded", concat(lit("  "), lower(col(textCol)), lit("  ")))
      .select(col("*"),
        explode(sequence(lit(1), length(col("__padded")) - 2)).as("__pos"))
      .withColumn("__tri", expr("substring(__padded, __pos, 3)"))
      .drop("__padded", "__pos")

  /** Train per-language trigram profiles: the `topN` most frequent
    * trigrams per label with their in-language relative frequency.
    *
    * @return (lang, trigram, weight) — small; intended for broadcast
    */
  def trainProfiles(
      labeled: DataFrame,
      textCol: String,
      langCol: String,
      topN: Int = 300): DataFrame = {
    val tri = trigramRows(labeled.select(col(langCol).as("__lang"), col(textCol)), textCol)
      .groupBy(col("__lang"), col("__tri"))
      .agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col("__lang")).orderBy(col("__n").desc, col("__tri"))
    val total = Window.partitionBy(col("__lang"))
    tri
      .withColumn("__rank", row_number().over(w))
      .withColumn("__total", sum(col("__n")).over(total))
      .where(col("__rank") <= topN)
      .select(col("__lang").as("lang"), col("__tri").as("trigram"),
        (col("__n").cast(DoubleType) / col("__total")).as("weight"))
  }

  /** Classify each document: score = Σ weight of profile trigrams it
    * contains (per occurrence), normalized by document trigram count;
    * predicted language = argmax score (ties → lexicographic lang).
    */
  def classify(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      profiles: DataFrame): DataFrame = {
    val tri = trigramRows(docs.select(col(idCol).as("__id"), col(textCol)), textCol)
      .groupBy(col("__id"), col("__tri"))
      .agg(count(lit(1)).as("__occ"))
    val scored = tri
      .join(broadcast(profiles), tri("__tri") === profiles("trigram"))
      .groupBy(col("__id"), col("lang"))
      .agg(sum(col("__occ") * col("weight")).as("__score"))
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("__score").desc, col("lang"))
    scored
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("__id").as(idCol), col("lang").as("predicted_lang"),
        col("__score").as("lang_score"))
  }
}
