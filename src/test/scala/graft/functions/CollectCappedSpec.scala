package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** The capped collect's overflow contract: groups at the cap survive
  * sorted, groups past it collapse to null (never a truncated list —
  * a silently clipped member list would make the df-capped pair plans
  * emit WRONG pairs instead of dropping the boilerplate key), and the
  * cap holds across partial/merge boundaries.
  */
class CollectCappedSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.local("collect-capped-spec", cores = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("at-cap groups collect sorted; over-cap groups are null, not clipped") {
    val sp = spark; import sp.implicits._
    // key 1: 3 members (under cap 3), shuffled order
    // key 2: exactly 3 (at cap)
    // key 3: 4 (over cap -> null)
    val rows = Seq((1L, 30L), (1L, 10L), (1L, 20L),
      (2L, 2L), (2L, 1L), (2L, 3L),
      (3L, 1L), (3L, 2L), (3L, 3L), (3L, 4L))
    val df = rows.toDF("k", "v")
      .repartition(4) // force partial buffers + merge
      .groupBy(col("k"))
      .agg(CollectCapped.of(3)(col("v")).as("ids"))
    val got = df.collect().map(r =>
      r.getLong(0) -> Option(r.getSeq[Long](1)).map(_.toList)).toMap
    assert(got(1L) === Some(List(10L, 20L, 30L)))
    assert(got(2L) === Some(List(1L, 2L, 3L)))
    assert(got(3L) === None, "over-cap group must collapse to null")
  }

  test("merge absorbs overflow from either side") {
    val sp = spark; import sp.implicits._
    // 40 members over 8 partitions with cap 5: every partial is small
    // but the merged group overflows -> null
    val df = (1L to 40L).map((9L, _)).toDF("k", "v")
      .repartition(8)
      .groupBy(col("k"))
      .agg(CollectCapped.of(5)(col("v")).as("ids"))
    assert(df.collect().head.isNullAt(1))
  }
}
