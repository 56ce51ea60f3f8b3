package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Engine extension entry point, injected via
  * `SparkSession.builder.withExtensions` (done by
  * [[graft.core.GraftSession]]) or
  * `spark.sql.extensions=graft.functions.GraftExtensions` on
  * spark-submit — the public mechanism third-party engines use to add
  * native functions without forking Spark.
  *
  * Registers:
  *   - `cosine_similarity(array, array)` → [[CosineSimilarity]] (native
  *     codegen expression), callable from SQL and `expr(...)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(
        classOf[CosineSimilarity].getName, null, "cosine_similarity",
        "cosine_similarity(a, b) - cosine similarity of two numeric arrays",
        ""),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"cosine_similarity expects 2 arguments, got ${children.length}")
        CosineSimilarity(children.head, children(1))
      }))
  }
}
