package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.NearDup
import graft.tables.{DeltaLikeSink, DeltaLikeTable, DeltaLog}

/** Streaming corpus ingest with near-dup filtering — the composition a
  * production training-data feed actually runs: each micro-batch is
  * deduplicated against the CURRENT corpus table
  * ([[NearDup.incrementalNearDup]]: MinHash candidates + exact
  * verification, corpus×corpus never compared) and the survivors are
  * appended with [[DeltaLikeSink]]'s exactly-once contract (the
  * (queryId, batchId) Txn watermark skips replayed batches, so a
  * restarted query neither duplicates rows nor re-admits documents the
  * original attempt already ingested).
  *
  * The corpus read resolves the LATEST snapshot at each batch, so a
  * document admitted by batch N blocks its near-copies from batch N+1
  * onward; within one batch the smaller-id document wins (the
  * `dup_in_batch` rule).
  *
  * Scale shape per batch: corpus signatures are an index-shaped scan
  * (one groupBy over the corpus shingles), candidates are bucket-join
  * rows with a batch side only, verification touches candidates only —
  * ingest cost scales with the batch and the collision set, never
  * corpus².
  */
object IngestDedup {

  /** The foreachBatch function: dedup `batch` against the table at
    * `path` (and itself), append the keepers exactly-once.
    */
  def appendDeduped(
      path: String,
      queryId: String,
      idCol: String,
      textCol: String,
      threshold: Double = 0.6)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // replayed batch: skip BEFORE recomputing verdicts — the corpus has
    // grown since (it contains this very batch), so re-deriving keep
    // flags against it would be wrong as well as wasted
    if (batchId <= DeltaLikeSink.lastCommittedBatchIn(path, queryId)) return
    val corpus =
      if (DeltaLog.forPath(path).exists)
        DeltaLikeTable.forPath(spark, path).toDF.select(col(idCol), col(textCol))
      else batch.select(col(idCol), col(textCol)).limit(0)
    val keepIds = NearDup
      .incrementalNearDup(batch, corpus, idCol, textCol, threshold)
      .where(col("keep"))
      .select(col(idCol))
    DeltaLikeSink.appendBatch(path, queryId)(
      batch.join(keepIds, Seq(idCol)), batchId)
  }

  /** Wire a document stream into a deduplicating corpus sink:
    * {{{
    * IngestDedup.writeStream(docs.writeStream, "/corpus", "ingest",
    *     "doc_id", "text")
    *   .option("checkpointLocation", ...)
    *   .start()
    * }}}
    */
  def writeStream[T](
      writer: DataStreamWriter[T],
      path: String,
      queryId: String,
      idCol: String,
      textCol: String,
      threshold: Double = 0.6): DataStreamWriter[T] =
    writer.foreachBatch { (batch: org.apache.spark.sql.Dataset[T], batchId: Long) =>
      appendDeduped(path, queryId, idCol, textCol, threshold)(batch.toDF(), batchId)
    }
}
