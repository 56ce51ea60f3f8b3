package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Scale-exponent probe that is robust to HOST-level CPU contention:
  * wall-clock on this box swings 2-3× between identical runs (the
  * hypervisor steals cycles invisibly — guest loadavg 0.0 runs have
  * measured 2.4× apart), so exponent math over wall times is noise.
  * Per-task `executorCpuTime` is actual on-CPU nanoseconds and stays
  * stable under steal; summing it over a query's tasks gives the
  * work-done measure the 10×/30× scaling rows need.
  *
  * Usage: runMain graft.TaskCpuProbe <queryName> <sfDir> [reps=2]
  * Prints one line per rep: cpu-seconds, run-seconds (task wall sum),
  * wall-seconds (driver-observed), then a MIN summary line.
  */
object TaskCpuProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // host steal + big-heap full GCs have stalled the in-JVM
      // heartbeat loop past the 120 s default, making the local
      // executor self-terminate mid-probe ("unable to send heartbeats
      // to driver more than 60 times"); a probe exists to measure
      // slow regimes, so give liveness plumbing generous slack
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpuNs = new java.util.concurrent.atomic.AtomicLong()
    val runMs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        Option(t.taskMetrics).foreach { m =>
          cpuNs.addAndGet(m.executorCpuTime)
          runMs.addAndGet(m.executorRunTime)
        }
    })
    // untimed warmup on the tiny fixture (codegen + shuffle machinery)
    try SparkEntry.entry(spark).count()
    catch { case _: Throwable => () }
    var minCpu = Double.MaxValue
    (1 to reps).foreach { i =>
      cpuNs.set(0L); runMs.set(0L)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously ([spark-private bus —
      // no public flush hook]; the count() barrier plus a short settle
      // empties it in practice, and cross-rep bleed only perturbs the
      // NEXT rep's sum upward, never the min)
      Thread.sleep(1500)
      val cpu = cpuNs.get / 1e9
      minCpu = math.min(minCpu, cpu)
      println(f"REP$i $name cpu=$cpu%.1f run=${runMs.get / 1e3}%.1f wall=$wall%.1f")
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!graft.core.SharedRelations.isShared(spark, id))
          rdd.unpersist(blocking = true)
      }
    }
    println(f"MIN $name cpu_sec=$minCpu%.1f")
    spark.stop()
  }
}
