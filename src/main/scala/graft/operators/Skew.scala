package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (SURVEY.md north star: "salting for skew, AQE for runtime re-plan").
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting remains the tool when a single key's rows exceed what one
  * task should hold even after AQE splitting (e.g. a null-key flood or
  * one viral entity), or when AQE is unavailable (streaming joins).
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key`, spreading each hot key of the
    * large side over `saltFactor` partitions: the large side gets a
    * deterministic per-row salt (hash of the whole row, so identical
    * keys scatter), the small side is replicated `saltFactor`×, and the
    * join runs on (key, salt).
    *
    * Result equality with the plain join holds for `inner` and `left`
    * (large-preserving) joins; small-preserving types would duplicate
    * unmatched small rows and are rejected.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"salted join preserves the large side only; got $joinType")
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val saltCol = "__graft_salt"
    val salted = large.withColumn(saltCol,
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val replicated = small
      .withColumn(saltCol, explode(sequence(lit(0L), lit(saltFactor - 1L))))
    salted.join(replicated, Seq(key, saltCol), joinType).drop(saltCol)
  }
}
