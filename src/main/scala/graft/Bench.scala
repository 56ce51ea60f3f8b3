package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed JVM warmup on the tiny fixture: codegen compilation, shuffle
    // machinery, and parquet reader init otherwise land on whichever query
    // happens to run first (~6s of pure startup attributed to one query)
    try SparkEntry.entry(spark).count()
    catch { case _: Throwable => () }
    // one untimed ITERATIVE query too: the loop path (per-iteration
    // localCheckpoint + driver-scheduled convergence jobs) JIT-compiles
    // separately from the one-shot plans above, and its first run costs
    // 2-3x its steady state — without this, that JIT lands inside the
    // first timed run of whichever iterative query (q45/q69/q72/q81)
    // comes up first
    try SparkEntry.queries("q69_dedup_clusters")(spark, "/root/testdata/sf0.001").count()
    catch { case _: Throwable => () }
    // median of 3 runs per query: single-shot timing under machine load
    // has shown ~2.7x variance on this box, which is larger than any
    // engine-side regression we'd want to detect
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(1)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
