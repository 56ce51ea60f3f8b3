package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.tables.DeltaLikeTable

/** Versioned-table (deltalike) behaviors declared as oracle-checked
  * queries: the reference's overwrite→merge→read/time-travel sequence
  * (`/root/reference/sparkcode/titanic_example_delta.py:25-70`) replayed
  * on the `customer` fixture so DuckDB can recompute the expected
  * relation with plain SQL (SURVEY.md §5.1: anti-join + union).
  */
object Versioned {

  /** Deterministic merge source: first 10 customers with zeroed balance
    * (update arm) + two synthetic rows (insert arm).
    */
  private def mergeSource(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val updates = Tables.customer(spark, d)
      .where(col("c_custkey") <= 10)
      .withColumn("c_acctbal", lit(0.0))
    val inserts = Seq(
      (9000001L, "Customer#9000001", 1, 111.1, "BUILDING"),
      (9000002L, "Customer#9000002", 2, 222.2, "MACHINERY"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    updates.union(inserts)
  }

  /** Overwrite customer as v0, MERGE the deterministic source, return the
    * post-merge snapshot (B1+B2+B4 in one verifiable relation).
    */
  def q26MergeUpsert(spark: SparkSession, d: String): DataFrame = {
    val path = Files.createTempDirectory("graft_merge").toString
    DeltaLikeTable.write(Tables.customer(spark, d), path, "overwrite")
    val t = DeltaLikeTable.forPath(spark, path)
    t.as("old").merge(mergeSource(spark, d).as("new"),
        "old.c_custkey = new.c_custkey")
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
    spark.read.format("deltalike").load(path)
  }

  val q26Sql: String =
    """SELECT c_custkey, c_name, c_nationkey, CAST(0.0 AS DOUBLE) AS c_acctbal,
      | c_mktsegment FROM customer WHERE c_custkey <= 10
      |UNION ALL
      |SELECT * FROM customer WHERE c_custkey > 10
      |UNION ALL
      |SELECT * FROM (VALUES
      | (CAST(9000001 AS BIGINT), 'Customer#9000001', 1, 111.1, 'BUILDING'),
      | (CAST(9000002 AS BIGINT), 'Customer#9000002', 2, 222.2, 'MACHINERY'))
      | t(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)""".stripMargin

  /** Same write+merge, then a `versionAsOf 0` read — time travel must see
    * the pre-merge table unchanged (B5).
    */
  def q27TimeTravel(spark: SparkSession, d: String): DataFrame = {
    val path = Files.createTempDirectory("graft_tt").toString
    DeltaLikeTable.write(Tables.customer(spark, d), path, "overwrite")
    val t = DeltaLikeTable.forPath(spark, path)
    t.as("old").merge(mergeSource(spark, d).as("new"),
        "old.c_custkey = new.c_custkey")
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
    spark.read.format("deltalike").option("versionAsOf", "0").load(path)
  }

  val q27Sql: String = "SELECT * FROM customer"

  /** Same overwrite+MERGE, then the ROW-LEVEL change feed of the merge
    * version (CDC across a rewriting commit,
    * [[graft.tables.ChangeReader.changeFeed]]): each genuinely updated
    * customer surfaces as delete(pre-image) + insert(post-image), each
    * new customer as one insert, and rows the rewrite merely copied
    * surface zero times — including matched rows the update left
    * bit-identical (acctbal already 0), which the multiset diff cancels.
    */
  def q55ChangeFeed(spark: SparkSession, d: String): DataFrame = {
    val path = Files.createTempDirectory("graft_cdc").toString
    DeltaLikeTable.write(Tables.customer(spark, d), path, "overwrite")
    val t = DeltaLikeTable.forPath(spark, path)
    t.as("old").merge(mergeSource(spark, d).as("new"),
        "old.c_custkey = new.c_custkey")
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
    graft.tables.ChangeReader.changeFeed(spark, path, 0)
      .select(col("c_custkey"), col("c_acctbal"),
        col("_change_type").as("change_type"),
        col("_commit_version").as("commit_version"))
  }

  val q55Sql: String =
    """SELECT c_custkey, CAST(0.0 AS DOUBLE) AS c_acctbal,
      | 'insert' AS change_type, CAST(1 AS BIGINT) AS commit_version
      |FROM customer WHERE c_custkey <= 10 AND c_acctbal <> 0.0
      |UNION ALL
      |SELECT c_custkey, c_acctbal, 'delete', CAST(1 AS BIGINT)
      |FROM customer WHERE c_custkey <= 10 AND c_acctbal <> 0.0
      |UNION ALL
      |SELECT * FROM (VALUES
      | (CAST(9000001 AS BIGINT), 111.1, 'insert', CAST(1 AS BIGINT)),
      | (CAST(9000002 AS BIGINT), 222.2, 'insert', CAST(1 AS BIGINT)))
      | t(c_custkey, c_acctbal, change_type, commit_version)""".stripMargin
}
