package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering key for OPTIMIZE ... ZORDER BY — the
  * standard trick (Delta, Iceberg, Hudi all ship it) that makes
  * multi-dimensional data skipping work: rows are sorted along an
  * interleaved-bit space-filling curve, so each output file covers a
  * small hyper-rectangle of the keyed dimensions and its min/max stats
  * become selective on EVERY z-ordered column, not just a lexicographic
  * leading one.
  *
  * Bucketing: each column is quantile-bucketed into 256 ranks (edges
  * from one `approxQuantile` pass — a distributed aggregate whose
  * result is 255 doubles per column, i.e. metadata-scale), which makes
  * the curve robust to skewed value distributions. Numeric, date and
  * timestamp columns bucket by order; other types bucket by hash
  * (useful for equality skipping only). The per-row bucket lookup is a
  * 255-step fold — interpreted, but OPTIMIZE is an offline maintenance
  * job, not a query path.
  */
private[tables] object ZOrder {

  private val Buckets = 256 // 8 bits per dimension

  /** The z-value column for `cols` over `df`'s current contents. */
  def zvalue(df: DataFrame, cols: Seq[String]): Column = {
    val n = cols.length
    require(n >= 1 && n <= 4, s"zorder supports 1..4 columns, got $n")
    // rank-normalize each dimension to an ordered double
    val ordered: Seq[(String, Column)] = cols.map { c =>
      val dt = df.schema(c).dataType
      val oc = dt match {
        case _: NumericType => col(c).cast(DoubleType)
        case DateType       => unix_date(col(c)).cast(DoubleType)
        case TimestampType  => col(c).cast(DoubleType)
        case _              => xxhash64(col(c)).cast(DoubleType)
      }
      (c, oc)
    }
    // one pass computes all columns' quantile edges
    val probs = (1 until Buckets).map(_.toDouble / Buckets).toArray
    val tmpNames = ordered.indices.map(i => s"__graft_zsrc_$i")
    val tmp = df.select(ordered.zip(tmpNames).map {
      case ((_, oc), name) => oc.as(name)
    }: _*)
    val edges: Array[Array[Double]] =
      tmp.stat.approxQuantile(tmpNames.toArray, probs, 0.01)

    // bucket id = number of edges <= value (0..255); null → bucket 0
    val bucketCols = ordered.zipWithIndex.map { case ((_, oc), i) =>
      val edgeArr = array(edges(i).map(lit(_)).toIndexedSeq: _*)
      coalesce(
        aggregate(edgeArr, lit(0),
          (acc, e) => acc + when(oc >= e, 1).otherwise(0)),
        lit(0))
    }
    // interleave the 8 bucket bits of each dimension
    (0 until 8).flatMap { b =>
      bucketCols.zipWithIndex.map { case (bc, ci) =>
        shiftleft(shiftright(bc, b).bitwiseAND(lit(1)), b * n + ci)
      }
    }.reduce(_ + _) // bit positions are disjoint: + is bitwise OR
  }
}
