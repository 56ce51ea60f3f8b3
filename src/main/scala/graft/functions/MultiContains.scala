package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native multi-pattern substring search — Aho–Corasick (1975) over a
  * PLAN-CONSTANT pattern list: one automaton pass per row reports which
  * patterns occur, in O(|text| + matches) regardless of pattern count.
  * This is the blocklist/taxonomy-tagging primitive of a curation
  * pipeline (k is 10³–10⁵ in production: banned phrases, PII trigger
  * terms, topic lexicons), where the naive plan — k separate
  * `contains()` scans — costs O(k·|text|) per row and k Catalyst
  * predicates; at 100 TB the automaton turns a blocklist sweep from
  * k full-corpus scans into one.
  *
  * Returns the DISTINCT indices (0-based, ascending) of the patterns
  * present as substrings — `size(...) > 0` is "matches any",
  * `size(...)` the hit count, and the indices themselves drive
  * per-pattern reporting. Matching is exact code-unit equality (callers
  * lowercase both sides for case-insensitive semantics), identical to
  * `contains()` per pattern — the DuckDB oracles recompute it as a
  * per-pattern `contains` fold.
  *
  * The automaton (goto trie + BFS failure links + merged output sets)
  * builds lazily once per deserialized expression instance —
  * microseconds for realistic blocklists, amortized over every row the
  * task processes. The scan early-exits once every pattern has been
  * seen. Row-level `CodegenFallback` is deliberate: the work is one
  * native loop per row (the [[WinnowHash]] argument).
  */
case class MultiContains(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(patterns.nonEmpty, "multi_contains needs at least one pattern")
  require(patterns.forall(_.nonEmpty), "empty pattern matches everything")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "multi_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  @transient private lazy val auto = MultiContains.build(patterns)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val hit = new Array[Boolean](patterns.length)
    var nHit = 0
    var state = 0
    var i = 0
    val n = s.length
    while (i < n && nHit < patterns.length) {
      state = auto.step(state, s.charAt(i))
      var o = auto.outHead(state)
      while (o >= 0) {
        val p = auto.outPat(o)
        if (!hit(p)) { hit(p) = true; nHit += 1 }
        o = auto.outNext(o)
      }
      i += 1
    }
    val out = new Array[Any](nHit)
    var p = 0; var w = 0
    while (p < hit.length) { if (hit(p)) { out(w) = p; w += 1 }; p += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MultiContains {

  /** Compiled automaton: per-node char→child maps, failure links, and
    * merged output-pattern lists (so a visited node yields every
    * pattern ending there — directly or via suffix links — without
    * walking the failure chain at match time).
    */
  final class Automaton(
      gotoMaps: Array[java.util.HashMap[Character, Integer]],
      fail: Array[Int],
      val outHead: Array[Int],   // node -> first output cell (-1 = none)
      val outPat: Array[Int],    // cell -> pattern index
      val outNext: Array[Int]) { // cell -> next cell (-1 = end)

    /** One transition with failure fallback; root misses stay at root. */
    def step(state: Int, c: Char): Int = {
      var st = state
      while (st != 0 && !gotoMaps(st).containsKey(c)) st = fail(st)
      val nxt = gotoMaps(st).get(c)
      if (nxt == null) 0 else nxt.intValue()
    }
  }

  def build(patterns: Seq[String]): Automaton = {
    val gotoMaps = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val ends = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
    // trie
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var st = 0
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        val nxt = gotoMaps(st).get(c)
        if (nxt == null) {
          gotoMaps += new java.util.HashMap[Character, Integer]()
          ends += Nil
          gotoMaps(st).put(c, gotoMaps.size - 1)
          st = gotoMaps.size - 1
        } else st = nxt.intValue()
        i += 1
      }
      ends(st) = pi :: ends(st)
    }
    val n = gotoMaps.size
    val fail = new Array[Int](n)
    val merged = Array.fill(ends.length)(List.empty[Int])
    // BFS failure links; merge suffix outputs as we go (parents are
    // finalized before children, so one hop suffices)
    val q = new java.util.ArrayDeque[Integer]()
    gotoMaps(0).forEach { (_, child) =>
      fail(child) = 0; q.add(child)
    }
    (0 until n).foreach(i => merged(i) = ends(i))
    while (!q.isEmpty) {
      val u = q.poll().intValue()
      merged(u) = ends(u) ::: merged(fail(u))
      gotoMaps(u).forEach { (c, child) =>
        var f = fail(u)
        while (f != 0 && !gotoMaps(f).containsKey(c)) f = fail(f)
        val t = gotoMaps(f).get(c)
        fail(child) =
          if (t == null || t.intValue() == child.intValue()) 0
          else t.intValue()
        q.add(child)
      }
    }
    // flatten merged output lists into parallel cell arrays
    val outHead = Array.fill(n)(-1)
    val cells = scala.collection.mutable.ArrayBuffer[(Int, Int)]() // (pat, next)
    (0 until n).foreach { st =>
      merged(st).foreach { pi =>
        cells += ((pi, outHead(st)))
        outHead(st) = cells.size - 1
      }
    }
    new Automaton(gotoMaps.toArray, fail, outHead,
      cells.map(_._1).toArray, cells.map(_._2).toArray)
  }
}
