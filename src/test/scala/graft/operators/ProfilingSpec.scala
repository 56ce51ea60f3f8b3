package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Column profiling on a planted frame with nulls and mixed types. */
class ProfilingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.local("profiling-spec", cores = 4)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("profileColumns: nulls, distincts, typed min/max, one row per column") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, Some(2.5), Some("b"), Some(Timestamp.valueOf("2024-01-02 03:04:05"))),
      (2L, None, Some("a"), None),
      (3L, Some(7.0), Some("a"), Some(Timestamp.valueOf("2024-06-01 00:00:00"))),
      (4L, Some(2.5), None, Some(Timestamp.valueOf("2024-06-01 00:00:00"))))
      .toDF("id", "x", "s", "t")
    val out = Profiling.profileColumns(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size === 4)
    val id = out("id")
    assert(id.getLong(1) === 4L && id.getLong(2) === 0L && id.getLong(3) === 4L)
    assert(id.getDouble(4) === 1.0 && id.getDouble(5) === 4.0)
    assert(id.isNullAt(6) && id.isNullAt(7))
    val x = out("x")
    assert(x.getLong(2) === 1L, "one null in x")
    assert(x.getLong(3) === 2L, "distinct ignores nulls, dedups 2.5")
    assert(x.getDouble(4) === 2.5 && x.getDouble(5) === 7.0)
    val s = out("s")
    assert(s.getLong(2) === 1L && s.getLong(3) === 2L)
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getString(6) === "a" && s.getString(7) === "b")
    val t = out("t")
    assert(t.getLong(2) === 1L)
    assert(t.getString(6) === "2024-01-02 03:04:05")
    assert(t.getString(7) === "2024-06-01 00:00:00")
  }

  test("profileColumns: approxDistinct swaps exact counts for HLL sketches") {
    val sp = spark; import sp.implicits._
    val df = (1 to 1000).map(i => i.toLong).toDF("v")
    val nd = Profiling.profileColumns(df, approxDistinct = true)
      .collect().head.getLong(3)
    // HLL at default rsd 5%: the estimate lands near 1000, not at it
    assert(nd > 900L && nd < 1100L)
  }

  test("benfordDigits: leading digit across magnitudes, non-positives excluded") {
    val sp = spark; import sp.implicits._
    val df = Seq(1.0, 19.5, 123.0, 2.5, 900.0, 0.0, -55.0).toDF("v")
    val out = Profiling.benfordDigits(df, "v").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(out.keySet === Set(1L, 2L, 9L), "zero and negatives excluded")
    val (n1, f1, b1) = out(1L)
    assert(n1 === 3L, "1.0, 19.5, 123.0 all lead with 1")
    assert(math.abs(f1 - 0.6) < 1e-12, "3 of 5 positive values")
    assert(math.abs(b1 - math.log10(2.0)) < 1e-12)
    assert(out(2L)._1 === 1L && out(9L)._1 === 1L)
  }
}
