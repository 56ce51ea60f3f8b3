package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints `explain("formatted")` for the named
  * queries (or all) against a fixture dir — the iterate-on-the-plan
  * loop (is the filter pushed? is the dim broadcast? how wide are the
  * codegen stages?).
  *
  * Usage: runMain graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      // streaming sort aggregates where the operator pre-sorts its input
      // on the grouping key (the jaccard wedge kernels): a no-op unless
      // a child's ordering already satisfies the grouping
      .config("spark.sql.execution.replaceHashWithSortAgg", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      // "exec:<name>" executes the query and prints the FINAL adaptive
      // plan — with AQE on, exchange/stage reuse only appears there,
      // not in the static explain
      if (n.startsWith("exec:")) {
        val df = SparkEntry.queries(n.stripPrefix("exec:"))(spark, sfDir)
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
