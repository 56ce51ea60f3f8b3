package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** The two explicit shuffle-management patterns: salting for skewed
  * joins (result-equality pinned) and bucketing for co-located joins
  * (shuffle elimination asserted on the physical plan).
  */
class ScalePatternsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.local("scale-patterns", cores = 4,
      extraConf = Map(
        "spark.sql.warehouse.dir" ->
          Files.createTempDirectory("graft_wh").toString,
        // force real shuffle joins so the bucketing effect is observable
        "spark.sql.autoBroadcastJoinThreshold" -> "-1"))
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("salted join equals plain join on skewed data (inner and left)") {
    val sp = spark; import sp.implicits._
    // 90% of rows share one hot key
    val large = (1 to 20000).map { i =>
      (if (i % 10 != 0) 1L else (i % 50).toLong, s"payload$i")
    }.toDF("k", "payload")
    val small = (0 to 60).map(k => (k.toLong, s"dim$k")).toDF("k", "attr")

    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

    val plainInner = canon(large.join(small, Seq("k"), "inner"))
    val saltedInner = canon(Skew.saltedJoin(large, small, "k", 8, "inner"))
    assert(saltedInner === plainInner)

    val smallGappy = small.where($"k" =!= 1L) // hot key unmatched
    val plainLeft = canon(large.join(smallGappy, Seq("k"), "left"))
    val saltedLeft = canon(Skew.saltedJoin(large, smallGappy, "k", 8, "left"))
    assert(saltedLeft === plainLeft)

    intercept[IllegalArgumentException] {
      Skew.saltedJoin(large, small, "k", 8, "full_outer")
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    val sp = spark; import sp.implicits._
    val a = (1 to 5000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 5000).map(i => (i.toLong, s"vb$i")).toDF("k", "vb")
    a.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_a")
    b.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_b")

    val joined = spark.table("bkt_a").join(spark.table("bkt_b"), Seq("k"))
    assert(joined.count() === 5000)

    val executed = joined.queryExecution.executedPlan
    val finalPlan = executed match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = finalPlan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty,
      s"bucketed join must not shuffle, found ${shuffles.size}:\n$finalPlan")

    // contrast: the same join on unbucketed frames does shuffle
    val unbucketed = a.join(b, Seq("k"))
    unbucketed.count()
    val ubPlan = unbucketed.queryExecution.executedPlan match {
      case ad: AdaptiveSparkPlanExec => ad.executedPlan
      case p => p
    }
    assert(ubPlan.collect { case s: ShuffleExchangeExec => s }.nonEmpty)
  }
}
