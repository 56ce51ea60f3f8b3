package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Data-layout effectiveness audits — the declared, oracle-checked
  * counterpart of the `tables.ZOrder` maintenance path (SURVEY §2.F3:
  * `OPTIMIZE ... ZORDER BY`). `MaintenanceSpec` pins the pruning factor
  * of the production z-order writer; this relation DERIVES the same
  * skipping arithmetic from first principles at data scale so an
  * independent engine can replay every number: which files a min/max
  * pruner would scan under a Morton layout vs a single-column linear
  * sort, for range probes on either keyed dimension and on their box.
  *
  * Morton clustering is why multi-dimensional skipping works at 100 TB:
  * each z-range file covers a small hyper-rectangle of the keyed
  * dimensions, so per-file min/max stats stay selective on EVERY
  * z-ordered column rather than only the lexicographic leading one.
  * The audit makes that claim quantitative: the linear layout scans
  * ~every file for a probe on the trailing dimension while the z-order
  * layout scans O(√files).
  *
  * Determinism contract (what makes this oracle-able where
  * `ZOrder.zvalue`'s `approxQuantile` bucketing is not): buckets are
  * equi-width over the exact min/max — integer arithmetic only, no
  * sketch state — and file assignment is a closed-form z-range split.
  * Scale shape: one 1-row min/max aggregate broadcast back, one
  * (layout, file) aggregate over the doubled row stream; everything
  * after is metadata-scale (≤ 2·files rows).
  */
object Layout {

  private val Buckets = 256 // 8 bits per dimension
  private val Files = 64    // z >> 10 (16-bit z), pk-bucket >> 2

  /** Per-(layout, probe) file-skipping audit over `df` keyed by two
    * numeric columns. Layouts: `zorder` (files = equal-width ranges of
    * the interleaved 16-bit Morton value) and `linear` (files =
    * equal-width ranges of dimension 1 only — the "sorted by leading
    * column" baseline). Probes: the central decile of each dimension
    * and their box. A file is scanned when its [min, max] interval
    * intersects the probe on every constrained dimension.
    */
  def zorderSkipAudit(df: DataFrame, dim1: String, dim2: String): DataFrame = {
    val mm = df.agg(
      min(col(dim1)).as("p_min"), max(col(dim1)).as("p_max"),
      min(col(dim2)).as("s_min"), max(col(dim2)).as("s_max"))

    def bucket(c: Column, lo: Column, hi: Column): Column =
      least(floor((c - lo) * Buckets / (hi - lo + lit(1)))
        .cast("long"), lit(Buckets - 1L))

    val bpk = bucket(col(dim1), col("p_min"), col("p_max"))
    val bsk = bucket(col(dim2), col("s_min"), col("s_max"))
    // interleave the 8 bucket bits: dim1 odd positions, dim2 even
    val z = (0 until 8).map { b =>
      shiftleft(shiftright(bpk, b).bitwiseAND(lit(1L)), 2 * b + 1) +
        shiftleft(shiftright(bsk, b).bitwiseAND(lit(1L)), 2 * b)
    }.reduce(_ + _)

    val rows = df.crossJoin(broadcast(mm)).select(
      col(dim1).as("pk"), col(dim2).as("sk"),
      floor(z / lit(65536 / Files)).cast("long").as("file_z"),
      floor(bpk / lit(Buckets / Files)).cast("long").as("file_lin"))

    val stats = rows
      .select(col("pk"), col("sk"), explode(array(
        struct(lit("zorder").as("layout"), col("file_z").as("file")),
        struct(lit("linear").as("layout"), col("file_lin").as("file"))))
        .as("lf"))
      .groupBy(col("lf.layout").as("layout"), col("lf.file").as("file"))
      .agg(min("pk").as("f_pmin"), max("pk").as("f_pmax"),
        min("sk").as("f_smin"), max("sk").as("f_smax"),
        count(lit(1)).as("n_rows"))

    // central-decile probe bounds per dimension, from the same min/max
    def lo10(l: Column, h: Column): Column = l + floor((h - l) * 45 / 100)
    def hi10(l: Column, h: Column): Column = l + floor((h - l) * 55 / 100)
    val probes = mm.select(explode(array(
      struct(lit("pk_range").as("probe"),
        lo10(col("p_min"), col("p_max")).as("plo"),
        hi10(col("p_min"), col("p_max")).as("phi"),
        lit(null).cast("long").as("slo"), lit(null).cast("long").as("shi")),
      struct(lit("sk_range").as("probe"),
        lit(null).cast("long").as("plo"), lit(null).cast("long").as("phi"),
        lo10(col("s_min"), col("s_max")).as("slo"),
        hi10(col("s_min"), col("s_max")).as("shi")),
      struct(lit("box").as("probe"),
        lo10(col("p_min"), col("p_max")).as("plo"),
        hi10(col("p_min"), col("p_max")).as("phi"),
        lo10(col("s_min"), col("s_max")).as("slo"),
        hi10(col("s_min"), col("s_max")).as("shi")))).as("p"))
      .select(col("p.*"))

    val scanned =
      (col("plo").isNull || (col("f_pmax") >= col("plo") &&
        col("f_pmin") <= col("phi"))) &&
      (col("slo").isNull || (col("f_smax") >= col("slo") &&
        col("f_smin") <= col("shi")))

    stats.crossJoin(broadcast(probes))
      .groupBy(col("layout"), col("probe"))
      .agg(count(lit(1)).as("files_total"),
        sum(when(scanned, 1L).otherwise(0L)).as("files_scanned"),
        sum(when(scanned, col("n_rows")).otherwise(0L)).as("rows_scanned"))
  }

  /** Declared q276: the audit over lineitem keyed by
    * (l_partkey, l_suppkey) — 6 rows: {zorder, linear} × {pk_range,
    * sk_range, box}.
    */
  def q276ZorderSkip(spark: SparkSession, d: String): DataFrame =
    zorderSkipAudit(Tables.lineitem(spark, d), "l_partkey", "l_suppkey")

  val q276Sql: String = {
    // 16-term Morton interleave, written out for the oracle
    val z = (0 until 8).map { b =>
      s"(((bpk >> $b) & 1) << ${2 * b + 1}) + (((bsk >> $b) & 1) << ${2 * b})"
    }.mkString(" + ")
    s"""WITH mm AS (
       |  SELECT min(l_partkey) AS p_min, max(l_partkey) AS p_max,
       |         min(l_suppkey) AS s_min, max(l_suppkey) AS s_max
       |  FROM lineitem),
       |b AS (
       |  SELECT l_partkey AS pk, l_suppkey AS sk,
       |    least(CAST(floor((l_partkey - p_min) * 256.0
       |      / (p_max - p_min + 1)) AS BIGINT), 255) AS bpk,
       |    least(CAST(floor((l_suppkey - s_min) * 256.0
       |      / (s_max - s_min + 1)) AS BIGINT), 255) AS bsk
       |  FROM lineitem, mm),
       |zf AS (
       |  SELECT pk, sk, CAST(floor(($z) / 1024.0) AS BIGINT) AS file_z,
       |    CAST(floor(bpk / 4.0) AS BIGINT) AS file_lin
       |  FROM b),
       |stats AS (
       |  SELECT layout, file, min(pk) AS f_pmin, max(pk) AS f_pmax,
       |    min(sk) AS f_smin, max(sk) AS f_smax,
       |    count(*) AS n_rows
       |  FROM (
       |    SELECT 'zorder' AS layout, file_z AS file, pk, sk FROM zf
       |    UNION ALL
       |    SELECT 'linear' AS layout, file_lin AS file, pk, sk FROM zf)
       |  GROUP BY 1, 2),
       |probes AS (
       |  SELECT 'pk_range' AS probe,
       |    p_min + CAST(floor((p_max - p_min) * 45 / 100) AS BIGINT) AS plo,
       |    p_min + CAST(floor((p_max - p_min) * 55 / 100) AS BIGINT) AS phi,
       |    CAST(NULL AS BIGINT) AS slo, CAST(NULL AS BIGINT) AS shi
       |  FROM mm
       |  UNION ALL
       |  SELECT 'sk_range', NULL, NULL,
       |    s_min + CAST(floor((s_max - s_min) * 45 / 100) AS BIGINT),
       |    s_min + CAST(floor((s_max - s_min) * 55 / 100) AS BIGINT)
       |  FROM mm
       |  UNION ALL
       |  SELECT 'box',
       |    p_min + CAST(floor((p_max - p_min) * 45 / 100) AS BIGINT),
       |    p_min + CAST(floor((p_max - p_min) * 55 / 100) AS BIGINT),
       |    s_min + CAST(floor((s_max - s_min) * 45 / 100) AS BIGINT),
       |    s_min + CAST(floor((s_max - s_min) * 55 / 100) AS BIGINT)
       |  FROM mm)
       |SELECT layout, probe,
       |  CAST(count(*) AS BIGINT) AS files_total,
       |  CAST(sum(CASE WHEN
       |      (plo IS NULL OR (f_pmax >= plo AND f_pmin <= phi)) AND
       |      (slo IS NULL OR (f_smax >= slo AND f_smin <= shi))
       |    THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
       |  CAST(sum(CASE WHEN
       |      (plo IS NULL OR (f_pmax >= plo AND f_pmin <= phi)) AND
       |      (slo IS NULL OR (f_smax >= slo AND f_smin <= shi))
       |    THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
       |FROM stats, probes
       |GROUP BY 1, 2""".stripMargin
  }
}
