package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
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
    // engine-side regression we'd want to detect.
    // A query that throws is recorded as an ERROR, never as a timing —
    // round 4 emitted 0.06-0.14s "timings" for queries that crashed at
    // plan time, which silently polluted BASELINE refreshes.
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // local-iteration aid, mirroring Verify: SPARK_GRAFT_ONLY=q1,q2
    // times a subset (the driver never sets it → full run)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val times = Iterator.range(0, 3).takeWhile(_ => !errors.contains(name)).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
          None
        }
      }.toSeq.sorted
      if (times.size == 3) timings(name) = times(1)
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val qs = timings.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = timings.values.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    // the JSON line after a long sbt run can fall off the driver's tail
    // capture (round 4: parsed came back empty) — persist it to a file
    // too, and print it immediately, before spark.stop() noise
    Files.createDirectories(Paths.get("target"))
    Files.writeString(Paths.get("target/bench.json"), json + "\n")
    println(json)
    System.out.flush()
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"[bench] ${errors.size} queries FAILED: ${errors.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}
