package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of suite-shared materialized relations — localCheckpointed
  * DataFrames built once per (application, fixture dir) and reused by
  * several declared queries (the BM25 postings/scores consumed by
  * q94/q100/q195/q207 are the canonical case). The Bench/Verify
  * harnesses sweep every persistent RDD between queries to stop dead
  * checkpoint blocks from evicting live shuffle memory; relations
  * registered here are the exception — they are deliberately alive
  * across queries, so the sweeps skip their RDD ids.
  *
  * Memory bound: entries are index-sized (queries × matched docs for
  * BM25), never corpus-sized, and there is one per dataset dir per
  * process — the same amortization a real search engine gets from
  * keeping its inverted index resident across queries.
  */
object SharedRelations {
  private val ids = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** RDD ids the inter-query sweeps must not unpersist. */
  def isShared(id: Int): Boolean = ids.contains(id)

  /** Build-and-register: runs `build` (expected to end in
    * `.localCheckpoint()`) and records whatever persistent RDDs the
    * build pinned so the harness sweeps keep them alive. Callers
    * memoize the returned DataFrame themselves (keyed by app + dir).
    * Harness runs are sequential, so the before/after snapshot cannot
    * capture another query's blocks.
    */
  def checkpointShared(spark: SparkSession)(build: => DataFrame): DataFrame = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = build
    val after = spark.sparkContext.getPersistentRDDs.keySet
    (after -- before).foreach(ids.add(_))
    df
  }
}
