package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The suite-shared relation contract: a checkpoint built through
  * [[SharedRelations.checkpointShared]] must survive the harness'
  * inter-query unpersist sweep (the exact filter Bench/Verify run) and
  * stay queryable, while an ordinary localCheckpoint built outside the
  * registry is swept. This is what lets q94/q100/q195/q207 and
  * q45/q173 share one materialized build per run.
  */
class SharedRelationsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.local("shared-relations-spec", cores = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("registered checkpoints survive the harness sweep; others are swept") {
    val sp = spark; import sp.implicits._
    val shared = SharedRelations.checkpointShared(sp) {
      (1 to 100).toDF("n").localCheckpoint()
    }
    val unshared = (1 to 50).toDF("n").localCheckpoint()
    assert(shared.count() === 100 && unshared.count() === 50)

    // the exact sweep Bench/Verify run between queries
    sp.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!SharedRelations.isShared(id)) rdd.unpersist(blocking = true)
    }

    val persisted = sp.sparkContext.getPersistentRDDs.keySet
    assert(persisted.exists(SharedRelations.isShared),
      "the registered checkpoint's blocks must still be persisted")
    // and the shared relation still answers queries after the sweep
    assert(shared.agg(sum(col("n"))).head.getLong(0) === 5050L)
  }
}
