package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Statistical operators checked against hand-computed values. */
class StatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.local("stats-spec", cores = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("chiSquared: textbook 2x2 table, dof, independence gives chi2=0") {
    val sp = spark; import sp.implicits._
    // classic 2x2: rows (male, female) x cols (left, right) with counts
    // 30/10 and 10/30 — row/col totals 40 each, N=80, every expected
    // cell 20, every contribution (10)^2/20 = 5, chi2 = 20, dof = 1
    val rows = Seq.fill(30)(("m", "l")) ++ Seq.fill(10)(("m", "r")) ++
      Seq.fill(10)(("f", "l")) ++ Seq.fill(30)(("f", "r"))
    val out = Relational.chiSquared(rows.toDF("g", "h"), "g", "h").collect()
    assert(out.length === 4)
    val cells = out.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(cells(("m", "l"))._1 === 30L && cells(("m", "r"))._1 === 10L)
    cells.values.foreach { case (_, exp, contrib) =>
      assert(math.abs(exp - 20.0) < 1e-12)
      assert(math.abs(contrib - 5.0) < 1e-12)
    }
    out.foreach { r =>
      assert(math.abs(r.getDouble(5) - 20.0) < 1e-12, "chi2 total")
      assert(r.getLong(6) === 1L, "dof")
    }
    // perfectly independent table → chi2 = 0
    val ind = (for { g <- Seq("a", "b"); h <- Seq("x", "y", "z"); _ <- 1 to 5 }
      yield (g, h)).toDF("g", "h")
    val out2 = Relational.chiSquared(ind, "g", "h").collect()
    assert(out2.length === 6)
    out2.foreach { r =>
      assert(math.abs(r.getDouble(5)) < 1e-12)
      assert(r.getLong(6) === 2L)
    }
  }
}
