package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded bottom-k state for [[BottomKAgg]]: a max-heap over
  * (hashKey, value) pairs stored in parallel primitive arrays —
  * `n` live entries, root at index 0. Heap ORDER within the arrays is
  * an implementation detail; the retained SET is exactly the k
  * lexicographically-smallest pairs, which is what makes the aggregate
  * merge- and partition-order-independent.
  */
case class BottomKBuf(var n: Int, hk: Array[Long], v: Array[Double])

/** Deterministic bottom-k sampling sketch — the mergeable,
  * partition-order-independent uniform sample behind hash-reservoir
  * quantile estimation: keep the k rows whose (hash, value) pair is
  * lexicographically smallest, where the hash is the engine's
  * md5-derived uniform key ([[HexLong]] scheme). Because the sample is
  * a pure SET FUNCTION of the input (no RNG, no order dependence), the
  * DuckDB oracle reproduces it EXACTLY with `ORDER BY hk, v LIMIT k` —
  * so approximate quantiles read off the sample hash-compare across
  * engines, something no randomized reservoir or GK/KLL sketch (whose
  * state depends on arrival order) can offer. Rank error is the
  * standard uniform-sample bound O(1/√k).
  *
  * The buffer is a primitive max-heap: per row one comparison against
  * the root, O(log k) sift only for the rows that actually enter the
  * sample (k·(1 + ln(n/k)) expected sifts over n rows); merge pushes
  * the smaller heap's entries through the same path. Runs through
  * ObjectHashAggregateExec with live object buffers (the [[MinHashAgg]]
  * argument).
  *
  * Output: the sample's VALUES sorted ascending — quantile q reads
  * element ⌈q·n⌉ (1-based, floored at 1).
  */
final class BottomKAgg(k: Int)
    extends Aggregator[(Long, Double), BottomKBuf, Seq[Double]] {
  require(k > 0)

  override def zero: BottomKBuf =
    BottomKBuf(0, new Array[Long](k), new Array[Double](k))

  @inline private def less(h1: Long, v1: Double, h2: Long, v2: Double): Boolean =
    h1 < h2 || (h1 == h2 && v1 < v2)

  private def siftDown(b: BottomKBuf, start: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var m = i
      if (l < b.n && less(b.hk(m), b.v(m), b.hk(l), b.v(l))) m = l
      if (r < b.n && less(b.hk(m), b.v(m), b.hk(r), b.v(r))) m = r
      if (m == i) return
      val th = b.hk(i); b.hk(i) = b.hk(m); b.hk(m) = th
      val tv = b.v(i); b.v(i) = b.v(m); b.v(m) = tv
      i = m
    }
  }

  private def add(b: BottomKBuf, h: Long, x: Double): BottomKBuf = {
    if (b.n < k) {
      var i = b.n
      b.hk(i) = h; b.v(i) = x; b.n += 1
      // sift up
      while (i > 0) {
        val p = (i - 1) / 2
        if (less(b.hk(p), b.v(p), b.hk(i), b.v(i))) {
          val th = b.hk(p); b.hk(p) = b.hk(i); b.hk(i) = th
          val tv = b.v(p); b.v(p) = b.v(i); b.v(i) = tv
          i = p
        } else i = 0
      }
    } else if (less(h, x, b.hk(0), b.v(0))) {
      b.hk(0) = h; b.v(0) = x
      siftDown(b, 0)
    }
    b
  }

  override def reduce(b: BottomKBuf, in: (Long, Double)): BottomKBuf =
    add(b, in._1, in._2)

  override def merge(a: BottomKBuf, b: BottomKBuf): BottomKBuf = {
    var i = 0
    var acc = a
    while (i < b.n) { acc = add(acc, b.hk(i), b.v(i)); i += 1 }
    acc
  }

  override def finish(b: BottomKBuf): Seq[Double] = {
    val out = new Array[Double](b.n)
    System.arraycopy(b.v, 0, out, 0, b.n)
    java.util.Arrays.sort(out)
    out.toSeq
  }

  override def bufferEncoder: Encoder[BottomKBuf] =
    ExpressionEncoder[BottomKBuf]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object BottomKAgg {
  /** Column form over (hashKey BIGINT, value DOUBLE) — the tuple input
    * encoder flattens to two parameters.
    */
  def of(k: Int): (Column, Column) => Column =
    (hk, v) => udaf(new BottomKAgg(k)).apply(hk, v)
}
