package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory mirroring the reference's session surface
  * (`/root/reference/sparkcode/titanic_example_delta.py:4-12`: builder +
  * config injection + log level), tuned for this container: `local[N]`,
  * shuffle partitions sized to cores (not the 200 default), AQE on so
  * runtime stats can re-plan skewed shuffles/joins — the same settings
  * that matter on a real multi-executor cluster.
  */
object GraftSession {
  /** Drop known-noisy per-row warning loggers to ERROR. The bounded
    * single-partition windows this engine uses deliberately (see
    * BASELINE.md "Single-partition window inventory") make WindowExec
    * emit `No Partition Defined` once per plan — at 190 queries × 3
    * bench reps the flood drowned the round-6 driver artifact's summary
    * JSON line (BENCH_r06 `parsed: null`). Must run AFTER
    * `setLogLevel`, which reconfigures the root logger.
    */
  def quietNoisyLoggers(): Unit = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.{Filter, LoggerContext}
    import org.apache.logging.log4j.core.config.Configurator
    import org.apache.logging.log4j.core.filter.RegexFilter
    // Suppress the specific known-noisy MESSAGES, not whole loggers at
    // ERROR — dropping org.apache.spark.rdd.MapPartitionsRDD to ERROR
    // would also hide real WARNs from that class (e.g. failed block
    // recovery on a lost checkpoint partition). Configurator.setLevel
    // first so a concrete LoggerConfig exists to hang the filter on.
    def denyMessage(logger: String, regex: String): Unit = {
      Configurator.setLevel(logger, Level.WARN)
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      val lc = ctx.getConfiguration.getLoggerConfig(logger)
      // idempotent: sessions are created per spec suite, and addFilter
      // chains CompositeFilters — only install on a bare config
      if (lc.getName == logger && lc.getFilter == null) {
        lc.addFilter(RegexFilter.createFilter(
          regex, null, false, Filter.Result.DENY, Filter.Result.NEUTRAL))
        ctx.updateLoggers()
      }
    }
    // WindowExecBase warns once per plan on the deliberately-bounded
    // single-partition windows (see BASELINE.md "Single-partition window
    // inventory") — at ~275 queries × 3 bench reps the flood drowned the
    // round-6 driver artifact's summary JSON line (BENCH_r06 parsed:null).
    // The filters hang on the PACKAGE logger configs because Spark's
    // Logging names loggers after the runtime class (WindowExec /
    // MapPartitionsRDD / ...), and a message-scoped deny at the package
    // level is harmless to every other event.
    denyMessage("org.apache.spark.sql.execution.window",
      ".*No Partition Defined for Window operation.*")
    // the harness sweeps dead localCheckpoint blocks between queries;
    // each unpersist logs a "lineage has been truncated" WARN
    denyMessage("org.apache.spark.rdd",
      ".*lineage.*truncated.*")
  }

  def local(
      appName: String = "graft",
      cores: Int = Runtime.getRuntime.availableProcessors(),
      extraConf: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // streaming sort aggregates where the operator pre-sorts its input
      // on the grouping key (the jaccard wedge kernels): a no-op unless
      // a child's ordering already satisfies the grouping
      .config("spark.sql.execution.replaceHashWithSortAgg", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Bound the in-memory status store (kept even with the UI off):
      // defaults retain 1000 SQLExecutionUIData plan graphs + 100k task
      // wrappers, and a long-lived session running hundreds of distinct
      // plans accumulates them as old-gen residue — the suite-tail GC
      // inflation BASELINE.md tracks on the heavy wedge rows. These
      // processes never serve a UI; keep enough history for post-mortem
      // probes only. Mirrored in Bench/Verify/QueryTimer.
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
    extraConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    quietNoisyLoggers()
    spark
  }
}
