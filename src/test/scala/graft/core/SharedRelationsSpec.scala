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
  * q45/q173 share one materialized build per run. The registry is
  * keyed by (applicationId, rddId) because RDD ids restart at 0 per
  * SparkContext — a bare-id registry would shield unrelated RDDs in a
  * later session of the same JVM.
  */
class SharedRelationsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.local("shared-relations-spec", cores = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("registered checkpoints survive the harness sweep; others are swept") {
    val sp = spark; import sp.implicits._
    val shared = SharedRelations.checkpointShared(sp, "spec-shared") {
      (1 to 100).toDF("n").localCheckpoint()
    }
    val unshared = (1 to 50).toDF("n").localCheckpoint()
    assert(shared.count() === 100 && unshared.count() === 50)

    // the exact sweep Bench/Verify run between queries
    sp.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!SharedRelations.isShared(sp, id)) rdd.unpersist(blocking = true)
    }

    val persisted = sp.sparkContext.getPersistentRDDs.keySet
    assert(persisted.exists(SharedRelations.isShared(sp, _)),
      "the registered checkpoint's blocks must still be persisted")
    // and the shared relation still answers queries after the sweep
    assert(shared.agg(sum(col("n"))).head.getLong(0) === 5050L)
  }

  test("builds are named and timed for the bench's shared:<name> rows") {
    val sp = spark; import sp.implicits._
    SharedRelations.checkpointShared(sp, "spec-timed") {
      (1 to 10).toDF("n").localCheckpoint()
    }
    val secs = SharedRelations.buildSeconds(sp)
    assert(secs.contains("spec-timed") && secs("spec-timed") > 0.0,
      s"build time must be recorded under its name, got $secs")
  }

  test("registrations do not alias RDD ids across applications") {
    // RDD ids restart at 0 per SparkContext: ids registered under THIS
    // application must not shield same-numbered RDDs of a different
    // application from the sweep (the sbt test JVM runs many sessions
    // sequentially — exactly the scenario where a bare-id registry
    // reintroduces the dead-checkpoint eviction problem).
    val sp = spark; import sp.implicits._
    SharedRelations.checkpointShared(sp, "spec-alias") {
      (1 to 5).toDF("n").localCheckpoint()
    }
    val sharedIds = sp.sparkContext.getPersistentRDDs.keySet
      .filter(SharedRelations.isShared(sp, _))
    assert(sharedIds.nonEmpty)
    val firstApp = sp.sparkContext.applicationId
    // a second SEQUENTIAL session in the same JVM (local mode allows one
    // SparkContext at a time, so the first must stop; leave the new one
    // as the suite session for afterAll)
    sp.stop()
    spark = GraftSession.local("shared-relations-spec-2", cores = 4)
    assert(spark.sparkContext.applicationId != firstApp)
    // nothing registered under the new application: every id registered
    // under the OLD application must read as NOT shared here, even
    // though fresh RDDs of this context will reuse those id numbers
    assert(!sharedIds.exists(SharedRelations.isShared(spark, _)),
      "ids registered under another application must not be shared here")
  }
}
