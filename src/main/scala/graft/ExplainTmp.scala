package graft
object ExplainTmp {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.operators.Linkage.q140LinkageScores(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.optimizedPlan.toString
    val n = "jaro_winkler".r.findAllIn(plan).length
    println(s"JW_OCCURRENCES_IN_OPTIMIZED_PLAN: $n")
    spark.stop()
  }
}
