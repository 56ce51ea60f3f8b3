package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{call_function, lit}

/** Column-API entry points for the engine's native functions. These
  * resolve through the session function registry, so the session must
  * carry [[GraftExtensions]] — true for [[graft.core.GraftSession]] and
  * the Verify/Bench mains; external sessions opt in with
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftFunctions {

  /** Codegen'd cosine similarity over two `array<float|double>` columns
    * (see [[CosineSimilarity]]). Floats are widened to double inside the
    * fused loop — numerically identical to casting the array first.
    */
  def cosineSimilarity(a: Column, b: Column): Column =
    call_function("cosine_similarity", a, b)

  /** Fused LSH sign-bit projection (see [[HyperplaneBuckets]]): all
    * `tables` bucket keys for one embedding in a single codegen'd
    * matrix–vector pass.
    */
  def hyperplaneBuckets(e: Column, dim: Int, tables: Int, bits: Int, seed: Long): Column =
    call_function("hyperplane_buckets", e, lit(dim), lit(tables), lit(bits), lit(seed))

  /** Codegen'd Jaro–Winkler similarity of two string columns (see
    * [[JaroWinkler]]; semantics pinned to DuckDB's
    * `jaro_winkler_similarity`).
    */
  def jaroWinkler(a: Column, b: Column): Column =
    call_function("jaro_winkler", a, b)

  /** Exact `jaroWinkler(a, b) >= theta` with an O(|a|+|b|) histogram
    * admission bound ahead of the quadratic kernel — use in the filter
    * position of fuzzy joins ([[graft.operators.NearDup.jaroWinklerJoin]]).
    */
  def jaroWinklerGte(a: Column, b: Column, theta: Double): Column =
    call_function("jaro_winkler_gte", a, b, lit(theta))

  /** Codegen'd hex-string → BIGINT parse (see [[HexLong]]; semantics
    * pinned to DuckDB's `('0x' || s)::BIGINT` for ≤15 hex chars) — the
    * fast path for the md5-derived-uniform determinism scheme.
    */
  def hexLong(s: Column): Column =
    call_function("hex_long", s)

  /** One JL ±1 projection dimension as a codegen'd signed sum (see
    * [[SignedDot]]); divide by √outDims OUTSIDE so the arithmetic
    * order matches the SQL oracle's list_sum/sqrt exactly.
    */
  def signedDot(e: Column, salt: String, j: Int, inDims: Int,
      outDims: Int): Column =
    call_function("signed_dot", e, lit(salt), lit(j), lit(inDims), lit(outDims))

  /** Native winnowing fingerprints (see [[WinnowHash]]; semantics
    * pinned to the portable base-31 SQL formulation the q46/q138
    * oracles recompute).
    */
  def winnowHash(s: Column, k: Int, window: Int): Column =
    call_function("winnow_hash", s, lit(k), lit(window))

  /** Codegen'd log-Γ (see [[LogGamma]]; Lanczos, pinned to libm/DuckDB
    * `lgamma` within ~1e-13) — the log-factorial primitive behind the
    * exact count tests (hypergeometric/Fisher, Poisson pmf).
    */
  def lgamma(x: Column): Column =
    call_function("lgamma", x)

  /** Aho–Corasick multi-pattern search (see [[MultiContains]]): the
    * distinct 0-based indices of `patterns` present in `s` as
    * substrings, ascending — one automaton pass regardless of pattern
    * count, vs k `contains` scans.
    */
  def multiContains(s: Column, patterns: Seq[String]): Column =
    call_function("multi_contains", (s +: patterns.map(lit)): _*)

  /** Content-defined chunking (see [[CdcChunks]]): substrings split
    * where the base-31 k-gram code-point hash ≡ 0 (mod divisor) —
    * expected chunk length ≈ divisor.
    */
  def cdcChunks(s: Column, k: Int, divisor: Long): Column =
    call_function("cdc_chunks", s, lit(k), lit(divisor))
}
