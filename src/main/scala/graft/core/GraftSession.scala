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
    import org.apache.logging.log4j.Level
    import org.apache.logging.log4j.core.config.Configurator
    Configurator.setLevel("org.apache.spark.sql.execution.window", Level.ERROR)
    // the harness sweeps dead localCheckpoint blocks between queries;
    // each unpersist logs a "lineage has been truncated" WARN — ~300
    // queries × 3 reps of that flooded every round's bench capture
    Configurator.setLevel("org.apache.spark.rdd.MapPartitionsRDD", Level.ERROR)
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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extraConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    quietNoisyLoggers()
    spark
  }
}
