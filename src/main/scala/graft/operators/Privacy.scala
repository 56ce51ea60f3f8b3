package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** PII redaction for a training-data pipeline: mask emails, phone
  * numbers, IPv4 addresses and SSN-like ids before a corpus leaves the
  * ingestion boundary. Reference scope: the reference repo has no
  * privacy surface (SURVEY.md §2.E) — this is part of the mandated
  * LLM-pipeline extension set.
  *
  * Design: one `regexp_replace` chain per row — a pure projection, no
  * shuffle, fully whole-stage-codegen'd, so the cost at 100 TB is one
  * scan. Patterns are deliberately RE2-safe (no back-references, no
  * look-around) so the exact same regexes run on Java's engine and on
  * RE2-based engines (DuckDB oracle, Go tooling) with identical
  * semantics.
  *
  * Order matters and is fixed: IP before phone (an IPv4 octet sequence
  * `1.222.333.4444` could otherwise partially match the dotted phone
  * form), SSN before phone (both dashed digit shapes; SSN `3-2-4` is
  * more specific than phone `3-3-4`).
  */
object Privacy {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val SsnPattern = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val PhonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** The redaction chain (order-sensitive, see scaladoc). */
  def redact(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Pattern, "<IP>")
    val noSsn = regexp_replace(noIp, SsnPattern, "<ID>")
    regexp_replace(noSsn, PhonePattern, "<PHONE>")
  }

  /** Per-type match counts BEFORE redaction — the audit trail a
    * compliance pipeline keeps alongside the masked corpus.
    */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> size(regexp_extract_all(text, lit(EmailPattern), lit(0))),
    "n_ips" -> size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0))),
    "n_ids" -> size(regexp_extract_all(text, lit(SsnPattern), lit(0))),
    "n_phones" -> size(regexp_extract_all(text, lit(PhonePattern), lit(0))))

  /** Apply [[redact]] to `textCol`, keeping all other columns and
    * appending the audit counts.
    */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    // counts FIRST: they must see the pre-redaction text (col(textCol)
    // resolves against whatever frame it is applied to)
    val withCounts = piiCounts(col(textCol)).foldLeft(df) {
      case (d, (n, c)) => d.withColumn(n, c)
    }
    withCounts.withColumn(textCol, redact(col(textCol)))
  }

  /** Declared q60: plant deterministic PII derived from `doc_id` into
    * the synthetic corpus (the fixture text contains none), then redact
    * and audit. The plant step is part of the DECLARED QUERY, not the
    * operator — the oracle plants the identical strings in SQL, so the
    * hash compare exercises the full regex battery on every row.
    */
  def q60RedactPii(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val planted = docs.select(
      col("doc_id"),
      concat(
        col("text"),
        lit(" contact u"), col("doc_id"), lit("@mail.org"),
        lit(" ip 10.1."), col("doc_id") % 256, lit(".7"),
        lit(" ssn "), lpad((col("doc_id") % 900 + 100).cast("string"), 3, "0"),
        lit("-42-1234"),
        lit(" tel 555-01"), lpad((col("doc_id") % 10).cast("string"), 1, "0"),
        lit("-2368")).as("text"))
    val counts = piiCounts(col("text"))
    planted.select(
      col("doc_id") +: redact(col("text")).as("redacted") +:
        counts.map { case (n, c) => c.cast("int").as(n) }: _*)
  }

  /** DuckDB oracle for q60: identical plant + identical RE2-safe
    * patterns. DuckDB's `regexp_replace` needs the `'g'` flag for
    * replace-all (Spark's replaces all by default); counts via
    * `len(regexp_extract_all(...))`.
    */
  val q60Sql: String = {
    // single-quoted SQL strings pass backslashes through verbatim, so the
    // Scala pattern constants embed unchanged
    val (email, ip, ssn, phone) = (EmailPattern, Ipv4Pattern, SsnPattern, PhonePattern)
    s"""WITH planted AS (
       |  SELECT doc_id,
       |    text || ' contact u' || doc_id || '@mail.org'
       |      || ' ip 10.1.' || (doc_id % 256) || '.7'
       |      || ' ssn ' || lpad(CAST(doc_id % 900 + 100 AS VARCHAR), 3, '0')
       |      || '-42-1234'
       |      || ' tel 555-01' || lpad(CAST(doc_id % 10 AS VARCHAR), 1, '0')
       |      || '-2368' AS text
       |  FROM documents)
       |SELECT doc_id,
       |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
       |    '$email', '<EMAIL>', 'g'),
       |    '$ip', '<IP>', 'g'),
       |    '$ssn', '<ID>', 'g'),
       |    '$phone', '<PHONE>', 'g') AS redacted,
       |  CAST(len(regexp_extract_all(text, '$email')) AS INT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$ip')) AS INT) AS n_ips,
       |  CAST(len(regexp_extract_all(text, '$ssn')) AS INT) AS n_ids,
       |  CAST(len(regexp_extract_all(text, '$phone')) AS INT) AS n_phones
       |FROM planted""".stripMargin
  }

  /** k-anonymity audit over quasi-identifier columns — the
    * re-identification risk gate a privacy pipeline runs before a
    * dataset (or the metadata side of a training corpus) leaves the
    * boundary: every row must be indistinguishable from ≥ k−1 others on
    * its quasi-identifier tuple, and the audit reports how much of the
    * table fails that bar.
    *
    * Scale shape: one hash aggregate on the quasi-identifier key
    * (map-side combined), then a 1-row re-aggregate over the
    * equivalence-class relation — class cardinality is bounded by the
    * quasi-identifier domain, not the row count. No driver state.
    *
    * @return one row: n_classes, n_rows, n_risky_classes (< k members),
    *         n_risky_rows, risk_frac, min_class_size
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__sz"))
    classes.agg(
      count(lit(1)).as("n_classes"),
      sum(col("__sz")).as("n_rows"),
      sum(when(col("__sz") < k, 1L).otherwise(0L)).as("n_risky_classes"),
      sum(when(col("__sz") < k, col("__sz")).otherwise(0L)).as("n_risky_rows"),
      (sum(when(col("__sz") < k, col("__sz")).otherwise(0L)).cast("double") /
        sum(col("__sz"))).as("risk_frac"),
      min(col("__sz")).as("min_class_size"))
  }

  /** Declared q139: customer re-identification risk at k=10 over
    * (nation, market segment, account-balance band).
    */
  def q139KAnonymity(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d).select(
      col("c_nationkey"),
      col("c_mktsegment"),
      floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"))
    kAnonymity(c, Seq("c_nationkey", "c_mktsegment", "bal_band"), k = 10L)
  }

  /** l-diversity audit — the companion gate to [[kAnonymity]]: a
    * k-anonymous class is still unsafe if everyone in it shares the
    * same SENSITIVE value (homogeneity attack). Reports, per
    * quasi-identifier class, distinct-l (count of distinct sensitive
    * values) and entropy-l (exp of the Shannon entropy of the
    * sensitive distribution — the effective number of values an
    * attacker must distinguish).
    *
    * Scale shape: one hash aggregate on (quasi-ids, sensitive), a
    * re-aggregate to classes, and a broadcast-joined per-class total —
    * class count is domain-bounded, nothing driver-side.
    *
    * @return per class: quasi cols…, class_size, l_distinct, entropy_l
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    val qi = quasiCols.map(col)
    val cells = df.groupBy(qi :+ col(sensitiveCol): _*)
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(qi: _*)
    val withTot = cells.withColumn("__t", sum(col("__c")).over(w))
    val p = col("__c").cast("double") / col("__t")
    withTot.groupBy(qi: _*)
      .agg(min(col("__t")).as("class_size"),
        count(lit(1)).as("l_distinct"),
        exp(-sum(p * log(p))).as("entropy_l"))
  }

  /** Declared q148: l-diversity of the account-balance band (the
    * sensitive attribute) within (nation, market-segment) classes —
    * the q139 audit turned on its homogeneity axis.
    */
  def q148LDiversity(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d).select(
      col("c_nationkey"), col("c_mktsegment"),
      floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"))
    lDiversity(c, Seq("c_nationkey", "c_mktsegment"), "bal_band")
  }

  val q148Sql: String =
    """WITH cells AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
      |    count(*) AS c
      |  FROM customer GROUP BY 1, 2, 3),
      |t AS (
      |  SELECT c_nationkey, c_mktsegment, c,
      |    sum(c) OVER (PARTITION BY c_nationkey, c_mktsegment) AS t
      |  FROM cells)
      |SELECT c_nationkey, c_mktsegment,
      |  CAST(min(t) AS BIGINT) AS class_size,
      |  CAST(count(*) AS BIGINT) AS l_distinct,
      |  exp(-sum((CAST(c AS DOUBLE) / t) * ln(CAST(c AS DOUBLE) / t)))
      |    AS entropy_l
      |FROM t GROUP BY 1, 2""".stripMargin

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    * third leg of the privacy triad after [[kAnonymity]] and
    * [[lDiversity]]: a class is unsafe if its SENSITIVE-value
    * distribution diverges from the table-wide one (skewness attack),
    * even when it is diverse. For an ORDERED sensitive attribute the
    * distance is the Earth Mover's Distance with unit ground distance
    * between adjacent values, which closes to
    * `Σ_i |cum(p−q)_i| / (m−1)` over the ordered value domain.
    *
    * Scale shape: one hash aggregate on (quasi-ids, sensitive) — the
    * only pass over the data — then everything operates on the cell
    * relation, bounded by |QI domain| × |sensitive domain|. The dense
    * class×value grid needed for the cumulative walk is a broadcast
    * cross join of two domain-bounded relations; the per-class
    * cumulative window partitions on the class key. No driver state.
    *
    * @return per class: quasi cols…, class_size, t_emd (0 = identical
    *         to global, 1 = all mass at opposite ends)
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    val qi = quasiCols.map(col)
    val cells = df.groupBy(qi :+ col(sensitiveCol): _*)
      .agg(count(lit(1)).as("__c"))
      // three domain-bounded consumers below — compute the data pass once
      .localCheckpoint()
    val classes = cells.groupBy(qi: _*).agg(sum(col("__c")).as("class_size"))
    val buckets = cells.groupBy(col(sensitiveCol))
      .agg(sum(col("__c")).as("__g"))
    val glob = cells.agg(sum(col("__c")).as("__tot"),
      countDistinct(col(sensitiveCol)).as("__m"))
    val grid = classes
      .crossJoin(broadcast(buckets))
      .crossJoin(broadcast(glob))
      .join(cells, quasiCols :+ sensitiveCol, "left")
      .na.fill(0L, Seq("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qi: _*).orderBy(col(sensitiveCol))
    grid
      .withColumn("__cum", sum(
        col("__c").cast("double") / col("class_size") -
          col("__g").cast("double") / col("__tot")).over(w))
      .groupBy(qi :+ col("class_size"): _*)
      .agg((sum(abs(col("__cum"))) / (max(col("__m")) - 1)).as("t_emd"))
  }

  /** Declared q149: t-closeness of the account-balance band within
    * (nation, market-segment) classes — q148's audit turned on its
    * skewness axis, completing the k-anonymity / l-diversity /
    * t-closeness triad over the same quasi-identifier schema.
    */
  def q149TCloseness(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d).select(
      col("c_nationkey"), col("c_mktsegment"),
      floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"))
    tCloseness(c, Seq("c_nationkey", "c_mktsegment"), "bal_band")
  }

  val q149Sql: String =
    """WITH cells AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
      |    count(*) AS c
      |  FROM customer GROUP BY 1, 2, 3),
      |classes AS (
      |  SELECT c_nationkey, c_mktsegment, sum(c) AS class_size
      |  FROM cells GROUP BY 1, 2),
      |buckets AS (SELECT bal_band, sum(c) AS g FROM cells GROUP BY 1),
      |gl AS (
      |  SELECT sum(c) AS tot, count(DISTINCT bal_band) AS m FROM cells),
      |grid AS (
      |  SELECT cl.c_nationkey, cl.c_mktsegment, cl.class_size,
      |    b.bal_band, b.g, gl.tot, gl.m,
      |    coalesce(ce.c, 0) AS c
      |  FROM classes cl CROSS JOIN buckets b CROSS JOIN gl
      |  LEFT JOIN cells ce ON ce.c_nationkey = cl.c_nationkey
      |    AND ce.c_mktsegment = cl.c_mktsegment
      |    AND ce.bal_band = b.bal_band),
      |cums AS (
      |  SELECT c_nationkey, c_mktsegment, class_size, m,
      |    sum(CAST(c AS DOUBLE) / class_size - CAST(g AS DOUBLE) / tot)
      |      OVER (PARTITION BY c_nationkey, c_mktsegment
      |            ORDER BY bal_band) AS cum
      |  FROM grid)
      |SELECT c_nationkey, c_mktsegment,
      |  CAST(class_size AS BIGINT) AS class_size,
      |  sum(abs(cum)) / (max(m) - 1) AS t_emd
      |FROM cums GROUP BY 1, 2, class_size""".stripMargin

  val q139Sql: String =
    """WITH cls AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
      |    count(*) AS sz
      |  FROM customer GROUP BY 1, 2, 3)
      |SELECT CAST(count(*) AS BIGINT) AS n_classes,
      |  CAST(sum(sz) AS BIGINT) AS n_rows,
      |  CAST(sum(CASE WHEN sz < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_classes,
      |  CAST(sum(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS BIGINT) AS n_risky_rows,
      |  CAST(sum(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS DOUBLE) / sum(sz)
      |    AS risk_frac,
      |  CAST(min(sz) AS BIGINT) AS min_class_size
      |FROM cls""".stripMargin

  /** Differentially-private count release — per-group counts with
    * Laplace(1/ε) noise, the standard ε-DP mechanism for publishing a
    * histogram (event volumes, cohort sizes) without exposing any
    * individual's presence. Noise is DERIVED from an md5 of the group
    * key + salt (the repo's determinism scheme, q109/q133): the
    * release is reproducible and the oracle adds bit-identical noise.
    *
    * NOT a production ε-DP mechanism as-is: hash-derived noise is
    * recoverable by anyone who knows the salt, so the salt must be a
    * per-release-epoch SECRET (and rotated per epoch — reusing one
    * lets releases be differenced); production would draw real
    * randomness outside any replayable path. To keep the release
    * surface honest, the exact count is NOT in the default output —
    * publishing n beside n_noised voids the guarantee outright. Set
    * `releaseExact = true` only for internal diagnostics, never for
    * an external release.
    *
    * Inverse-CDF sampling: u ~ U(0,1) from 60 hash bits, c = u − ½,
    * noise = −(1/ε)·sign(c)·ln(1 − 2|c|).
    *
    * Scale shape: one map-combined hash aggregate, then a pure
    * projection (md5 + ln) over the domain-bounded group relation.
    */
  def dpNoisedCounts(df: DataFrame, keyCols: Seq[String],
      epsilon: Double, salt: String,
      releaseExact: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "need at least one grouping column")
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val h = md5(concat_ws("|",
      lit(salt) +: keyCols.map(c => col(c).cast("string")): _*))
    val u = graft.functions.GraftFunctions.hexLong(substring(h, 1, 15))
      .cast("double") / lit(1152921504606846976.0)
    val c = u - lit(0.5)
    val noise = lit(-1.0 / epsilon) * signum(c) *
      log(lit(1.0) - lit(2.0) * abs(c))
    val out = counts.withColumn("n_noised", col("n") + noise)
    if (releaseExact) out else out.drop("n")
  }

  /** Declared q158: ε=1 DP release of (event_type, day) volumes —
    * release-shaped output: noised counts only, no exact n.
    */
  def q158DpRelease(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d).select(col("event_type"),
      expr("unix_micros(ts) div 86400000000").as("day"))
    dpNoisedCounts(e, Seq("event_type", "day"), epsilon = 1.0, salt = "dp")
  }

  val q158Sql: String =
    """WITH g AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |u AS (
      |  SELECT event_type, day, n,
      |    ('0x' || substring(md5('dp' || '|' || event_type || '|' ||
      |       CAST(day AS VARCHAR)), 1, 15))::BIGINT
      |      / 1152921504606846976.0 - 0.5 AS c
      |  FROM g)
      |SELECT event_type, CAST(day AS BIGINT) AS day,
      |  n + (-1.0) * sign(c) * ln(1 - 2 * abs(c)) AS n_noised
      |FROM u""".stripMargin
}
