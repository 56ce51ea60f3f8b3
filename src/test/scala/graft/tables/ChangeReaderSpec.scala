package graft.tables

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

class ChangeReaderSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.local("changereader-spec", cores = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("incremental reads deliver each appended row exactly once") {
    val sp = spark; import sp.implicits._
    val path = Files.createTempDirectory("cdc").toString
    DeltaLikeTable.write((1 to 50).map(i => (i.toLong, s"v$i")).toDF("id", "v"), path)

    // consumer loop: track offset, read deltas
    var offset = ChangeReader.latestVersion(path) // saw v0 as the initial load
    val seen = scala.collection.mutable.Set.empty[Long]
    seen ++= DeltaLikeTable.forPath(spark, path).toDF
      .select("id").collect().map(_.getLong(0))

    (1 to 3).foreach { round =>
      DeltaLikeTable.write(
        (round * 100 until round * 100 + 10).map(i => (i.toLong, s"r$i")).toDF("id", "v"),
        path, "append")
      val delta = ChangeReader.changesSince(spark, path, offset)
      offset = ChangeReader.latestVersion(path)
      val ids = delta.select("id").collect().map(_.getLong(0))
      assert(ids.length === 10, s"round $round delivered ${ids.length}")
      assert(ids.forall(i => i >= round * 100 && i < round * 100 + 10))
      ids.foreach(i => assert(seen.add(i), s"row $i delivered twice"))
    }
    assert(seen.size === 80)
    // caught-up consumer gets an empty delta
    assert(ChangeReader.changesSince(spark, path, offset).count() === 0)
  }

  test("OPTIMIZE versions are skipped; rewriting versions are rejected") {
    val sp = spark; import sp.implicits._
    val path = Files.createTempDirectory("cdc_opt").toString
    DeltaLikeTable.write((1 to 30).map(i => (i.toLong, s"v$i")).toDF("id", "v"), path)
    val offset = ChangeReader.latestVersion(path)
    DeltaLikeTable.write((31 to 40).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
      path, "append")
    val t = DeltaLikeTable.forPath(spark, path)
    t.optimize() // rewrite, logical no-op
    // delta across the optimize: only the true appends, not the rewrite
    val delta = ChangeReader.changesSince(spark, path, offset)
    assert(delta.count() === 10)

    // a merge is a genuine rewrite → incremental read refuses
    t.as("t").merge(
        Seq((1L, "UPD")).toDF("id", "v").as("s"), "t.id = s.id")
      .whenMatchedUpdateAll().execute()
    val e = intercept[UnsupportedOperationException] {
      ChangeReader.changesSince(spark, path, offset).count()
    }
    assert(e.getMessage.contains("rewrites files"))
  }

  test("changeFeed delivers row-level changes across MERGE/DELETE exactly once") {
    val sp = spark; import sp.implicits._
    val path = Files.createTempDirectory("cdc_feed").toString
    DeltaLikeTable.write((1 to 5).map(i => (i.toLong, s"v$i")).toDF("id", "v"), path)
    val t = DeltaLikeTable.forPath(spark, path)

    // v1: MERGE updating one row and inserting one — the rewrite copies
    // the 4 untouched rows into a new file; those must NOT reappear
    t.as("t").merge(
        Seq((2L, "UPD"), (99L, "NEW")).toDF("id", "v").as("s"), "t.id = s.id")
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()

    def rows(feed: org.apache.spark.sql.DataFrame): Set[(Long, String, String, Long)] =
      feed.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet

    assert(rows(ChangeReader.changeFeed(spark, path, 0)) === Set(
      (2L, "UPD", "insert", 1L), // update post-image
      (2L, "v2", "delete", 1L),  // update pre-image
      (99L, "NEW", "insert", 1L)))

    // v2: DELETE — pre-image rows surface as deletes only
    t.delete("id = 3")
    assert(rows(ChangeReader.changeFeed(spark, path, 1)) ===
      Set((3L, "v3", "delete", 2L)))

    // v3 OPTIMIZE is a logical no-op; v4 append surfaces as plain inserts
    t.optimize()
    DeltaLikeTable.write(Seq((100L, "x")).toDF("id", "v"), path, "append")
    assert(rows(ChangeReader.changeFeed(spark, path, 2)) ===
      Set((100L, "x", "insert", 4L)))

    // whole-history feed replays the table: v0 initial load as inserts,
    // then every change exactly once; inserts minus deletes = head state
    val full = ChangeReader.changeFeed(spark, path, -1)
    assert(full.where("_commit_version = 0").count() === 5)
    val net = full.where("_change_type = 'insert'")
      .select("id", "v")
      .exceptAll(full.where("_change_type = 'delete'").select("id", "v"))
    assert(rowsOf(net) === rowsOf(t.toDF.select("id", "v")))
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
}
