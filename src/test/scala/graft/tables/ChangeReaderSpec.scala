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
}
