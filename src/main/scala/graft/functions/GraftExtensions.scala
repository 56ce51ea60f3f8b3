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
  *   - [[graft.tables.DeltalikeMergeRule]] — resolution rule turning
  *     SQL `MERGE INTO deltalike.`path`` into the native merge command.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // hint-resolution batch: runs BEFORE ResolveSQLOnFile, which would
    // otherwise reject the deltalike.`path` target as a direct file query
    ext.injectHintResolutionRule(_ => new graft.tables.DeltalikeMergeRule)
    ext.injectResolutionRule(s => new graft.tables.DeltalikeReadResolution(s))
    // statements Spark's grammar lacks (RESTORE, constraints, VACUUM,
    // OPTIMIZE) — claimed by pattern, everything else delegated
    ext.injectParser((_, delegate) => new graft.tables.GraftSqlParser(delegate))
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
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(
        classOf[JaroWinkler].getName, null, "jaro_winkler",
        "jaro_winkler(a, b) - Jaro-Winkler similarity of two strings",
        ""),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"jaro_winkler expects 2 arguments, got ${children.length}")
        JaroWinkler(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler_gte"),
      new ExpressionInfo(
        classOf[JaroWinklerGte].getName, null, "jaro_winkler_gte",
        "jaro_winkler_gte(a, b, theta) - exact jaro_winkler(a,b) >= theta " +
          "with a histogram admission bound before the kernel",
        ""),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3,
          s"jaro_winkler_gte expects 3 arguments, got ${children.length}")
        val theta = children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
              if v != null =>
            v.toString.toDouble
          case other => throw new IllegalArgumentException(
            s"jaro_winkler_gte threshold must be a literal, got $other")
        }
        JaroWinklerGte(children.head, children(1), theta)
      }))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_buckets"),
      new ExpressionInfo(
        classOf[HyperplaneBuckets].getName, null, "hyperplane_buckets",
        "hyperplane_buckets(e, dim, tables, bits, seed) - LSH bucket keys, " +
          "one packed sign-bit int per hash table",
        ""),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 5,
          s"hyperplane_buckets expects 5 arguments, got ${children.length}")
        // shape args must be literals: the plane matrix is baked into the
        // expression at plan time
        def intArg(i: Int): Int = children(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"hyperplane_buckets arg ${i + 1} must be an int literal, got $other")
        }
        def longArg(i: Int): Long = children(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
          case other => throw new IllegalArgumentException(
            s"hyperplane_buckets arg ${i + 1} must be a long literal, got $other")
        }
        HyperplaneBuckets(children.head, intArg(1), intArg(2), intArg(3), longArg(4))
      }))
    ext.injectFunction((
      FunctionIdentifier("signed_dot"),
      new ExpressionInfo(
        classOf[SignedDot].getName, null, "signed_dot",
        "signed_dot(e, salt, j, inDims, outDims) - one JL +/-1 projection " +
          "dim as a raw signed sum (divide by sqrt(outDims) outside)",
        ""),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 5,
          s"signed_dot expects 5 arguments, got ${children.length}")
        def strArg(i: Int): String = children(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(
            v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
          case other => throw new IllegalArgumentException(
            s"signed_dot arg ${i + 1} must be a string literal, got $other")
        }
        def intArg(i: Int): Int = children(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"signed_dot arg ${i + 1} must be an int literal, got $other")
        }
        SignedDot(children.head, strArg(1), intArg(2), intArg(3), intArg(4))
      }))
    ext.injectFunction((
      FunctionIdentifier("hex_long"),
      new ExpressionInfo(
        classOf[HexLong].getName, null, "hex_long",
        "hex_long(s) - parse <=15 hex chars to BIGINT " +
          "(DuckDB ('0x' || s)::BIGINT semantics)",
        ""),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1,
          s"hex_long expects 1 argument, got ${children.length}")
        HexLong(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("winnow_hash"),
      new ExpressionInfo(
        classOf[WinnowHash].getName, null, "winnow_hash",
        "winnow_hash(s, k, window) - winnowing fingerprint minima over " +
          "base-31 k-gram code-point hashes",
        ""),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3,
          s"winnow_hash expects 3 arguments, got ${children.length}")
        def intArg(i: Int): Int = children(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"winnow_hash arg ${i + 1} must be an int literal, got $other")
        }
        WinnowHash(children.head, intArg(1), intArg(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("band_hashes"),
      new ExpressionInfo(
        classOf[BandHashes].getName, null, "band_hashes",
        "band_hashes(sig, bands, r) - LSH band hashes: Murmur3 chain " +
          "(seed 42) over each r-slice of the signature, bit-identical " +
          "to transform(sequence(0,bands-1), j -> hash(slice(sig, " +
          "j*r+1, r)))",
        ""),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3,
          s"band_hashes expects 3 arguments, got ${children.length}")
        def intArg(i: Int): Int = children(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"band_hashes arg ${i + 1} must be an int literal, got $other")
        }
        BandHashes(children.head, intArg(1), intArg(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("cdc_chunks"),
      new ExpressionInfo(
        classOf[CdcChunks].getName, null, "cdc_chunks",
        "cdc_chunks(s, k, divisor) - content-defined chunking: split s " +
          "where the base-31 k-gram code-point hash % divisor == 0",
        ""),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3,
          s"cdc_chunks expects 3 arguments, got ${children.length}")
        def longArg(i: Int): Long = children(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
          case other => throw new IllegalArgumentException(
            s"cdc_chunks arg ${i + 1} must be an integer literal, got $other")
        }
        CdcChunks(children.head, longArg(1).toInt, longArg(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("multi_contains"),
      new ExpressionInfo(
        classOf[MultiContains].getName, null, "multi_contains",
        "multi_contains(s, p1, p2, ...) - Aho-Corasick multi-pattern " +
          "search: distinct 0-based indices of the literal patterns " +
          "present as substrings, ascending",
        ""),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length >= 2,
          s"multi_contains expects a string column plus >=1 pattern " +
            s"literals, got ${children.length} arguments")
        val pats = children.tail.zipWithIndex.map {
          case (org.apache.spark.sql.catalyst.expressions.Literal(
            v: org.apache.spark.unsafe.types.UTF8String, _), _) => v.toString
          case (other, i) => throw new IllegalArgumentException(
            s"multi_contains pattern ${i + 1} must be a string literal, got $other")
        }
        MultiContains(children.head, pats)
      }))
    ext.injectFunction((
      FunctionIdentifier("chunk_tokens"),
      new ExpressionInfo(
        classOf[ChunkTokens].getName, null, "chunk_tokens",
        "chunk_tokens(text, chunkSize, overlap) - table function: expand a " +
          "document into overlapping fixed-size token chunks " +
          "(chunk_idx, chunk_text, chunk_tokens)",
        ""),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3,
          s"chunk_tokens expects 3 arguments, got ${children.length}")
        def intArg(i: Int): Int = children(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"chunk_tokens arg ${i + 1} must be an int literal, got $other")
        }
        ChunkTokens(children.head, intArg(1), intArg(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("lgamma"),
      new ExpressionInfo(
        classOf[LogGamma].getName, null, "lgamma",
        "lgamma(x) - natural log of the gamma function (Lanczos, " +
          "matches libm lgamma to ~1e-13)",
        ""),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1,
          s"lgamma expects 1 argument, got ${children.length}")
        LogGamma(children.head)
      }))
  }
}
