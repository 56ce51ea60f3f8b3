package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** User-defined TABLE function (§2.E17's Generator surface): fixed-size
  * token chunking with overlap as a native Catalyst `Generator` — one
  * input document row expands to `n_chunks` output rows of
  * `(chunk_idx, chunk_text, chunk_tokens)`. The UDTF twin of
  * [[graft.operators.CorpusOps.chunk]]'s HOF formulation
  * (`posexplode(transform(sequence(...)))`), pinned to IDENTICAL
  * semantics (parity spec + the same DuckDB oracle):
  *
  *  - tokens = `split(text, " ")` semantics (regex split, trailing
  *    empties kept — `"".split(" ", -1)` yields `[""]`, so an empty
  *    document still emits one chunk, exactly like the HOF path);
  *  - chunk starts advance by `chunkSize − overlap`; a final window
  *    that would START past the last token is dropped (the
  *    `(n−size) % stride == 0` correction in the count formula);
  *  - a document shorter than one chunk yields itself;
  *  - `chunk_tokens` is the slice length, which equals
  *    `size(split(chunk_text, " "))` because single-space joins
  *    round-trip token counts.
  *
  * The Generator contract makes this run through `GenerateExec`
  * (Spark's LATERAL VIEW machinery): rows stream out per input row with
  * no array materialization in the plan — at 100 TB this is the same
  * map-only pass as the HOF path, minus the intermediate
  * `ArrayData[String]` the `transform` formulation allocates per row.
  * Null input produces no rows (outer-generate semantics are the
  * caller's opt-in), matching `posexplode(null)`.
  */
case class ChunkTokens(child: Expression, chunkSize: Int, overlap: Int)
    extends Generator with CodegenFallback {

  require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
    s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")

  private val stride = chunkSize - overlap

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "chunk_tokens"

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("chunk_text", StringType, nullable = false),
    StructField("chunk_tokens", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) return Nil
    // regex-split with limit -1, identical to Spark's split(text, " ")
    val toks = raw.asInstanceOf[UTF8String].toString.split(" ", -1)
    val n = toks.length
    val nChunks =
      if (n <= chunkSize) 1
      else (n - chunkSize) / stride + 2 -
        (if ((n - chunkSize) % stride == 0) 1 else 0)
    val out = new Array[InternalRow](nChunks)
    var i = 0
    while (i < nChunks) {
      val from = i * stride
      val until = math.min(from + chunkSize, n)
      val sb = new java.lang.StringBuilder()
      var j = from
      while (j < until) {
        if (j > from) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = InternalRow(i, UTF8String.fromString(sb.toString), until - from)
      i += 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
