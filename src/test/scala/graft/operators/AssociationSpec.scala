package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Association-rule metrics on hand-countable baskets. */
class AssociationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.local("association-spec", cores = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("associationRules: counts, metrics, min-count gate, duplicate lines collapse") {
    val sp = spark; import sp.implicits._
    // 4 baskets: {1,2} {1,2} {1,2,3} {3}; basket 2 lists item 1 twice —
    // the (basket,item) dedup must make that count once
    val items = Seq(
      (10L, 1L), (10L, 2L),
      (20L, 1L), (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 2L), (30L, 3L),
      (40L, 3L)).toDF("bk", "it")
    val out = Association.associationRules(items, "bk", "it", minCount = 2L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7))).toMap
    // only 1↔2 co-occur ≥ 2 times (3 baskets); 1-3 and 2-3 co-occur once
    assert(out.keySet === Set((1L, 2L), (2L, 1L)))
    val (nab, na, nb, sup, conf, lift) = out((1L, 2L))
    assert(nab === 3L && na === 3L && nb === 3L)
    assert(math.abs(sup - 0.75) < 1e-12, "3 of 4 baskets")
    assert(math.abs(conf - 1.0) < 1e-12, "every 1-basket has 2")
    // lift = conf * N / n_b = 1.0 * 4 / 3
    assert(math.abs(lift - 4.0 / 3.0) < 1e-12)
    // symmetric counts → symmetric metrics here
    assert(out((2L, 1L)) === out((1L, 2L)))
  }
}
