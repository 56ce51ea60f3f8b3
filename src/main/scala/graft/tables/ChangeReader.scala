package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental consumption of a deltalike table: the rows ADDED between
  * two versions, read from exactly the data files those commits added —
  * the batch building block of change-data-capture and of a streaming
  * source (a driver loop that tracks its last-seen version and calls
  * [[changesSince]] per trigger consumes the table incrementally with
  * no reprocessing).
  *
  * Append-only semantics: versions whose commit also REMOVED files
  * (overwrite, merge rewrites, OPTIMIZE) are not representable as
  * pure row-adds. By default they fail the read; `skipRewrites = true`
  * skips OPTIMIZE versions specifically, which are logical no-ops —
  * their adds are rewrites of already-delivered rows, so skipping them
  * preserves exactly-once row delivery.
  */
object ChangeReader {

  /** Rows added in versions (`sinceVersion`, latest]. */
  def changesSince(
      spark: SparkSession,
      path: String,
      sinceVersion: Long,
      skipRewrites: Boolean = true): DataFrame = {
    val log = DeltaLog.forPath(path)
    val latest = log.latestVersion
    require(latest >= 0, s"not a deltalike table: $path")
    require(sinceVersion <= latest,
      s"sinceVersion $sinceVersion is beyond latest $latest")
    val snap = log.snapshot() // schema + partition columns of the head
    val addedFiles = ((sinceVersion + 1) to latest).flatMap { v =>
      val acts = log.actions(v)
      val removes = acts.collect { case r: RemoveFile => r }
      val adds = acts.collect { case a: AddFile => a }
      val op = acts.collectFirst { case c: CommitInfo => c.operation }.getOrElse("")
      if (removes.isEmpty) adds
      else if (op == "OPTIMIZE" && skipRewrites) Seq.empty
      else throw new UnsupportedOperationException(
        s"version $v of $path rewrites files (op=$op); " +
          "incremental reads cover append-only history")
    }
    DeltaLikeTable.readSnapshot(spark,
      snap.copy(files = addedFiles, version = latest))
  }

  /** Current head version, for callers tracking their own offset. */
  def latestVersion(path: String): Long = DeltaLog.forPath(path).latestVersion
}
