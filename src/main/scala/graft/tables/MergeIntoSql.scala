package graft.tables

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.graftbridge.GraftSqlBridge

/** SQL `MERGE INTO` over deltalike tables (SURVEY.md §7 stretch; §2.B7):
  *
  * {{{
  * MERGE INTO deltalike.`/path/to/table` AS t
  * USING source_view AS s
  * ON t.k = s.k
  * WHEN MATCHED [AND cond] THEN UPDATE SET * | SET c = e, ...
  * WHEN MATCHED [AND cond] THEN DELETE
  * WHEN NOT MATCHED [AND cond] THEN INSERT * | (cols) VALUES (exprs)
  * WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET c = e, ... | DELETE
  * }}}
  *
  * Spark's parser already produces [[MergeIntoTable]]; the injected
  * resolution rule [[DeltalikeMergeRule]] intercepts plans whose target
  * is the `deltalike`.`<path>` identifier before the analyzer would
  * fail to resolve it, and rewrites them into a runnable command that
  * drives the existing [[MergeBuilder]] (same three-phase execution,
  * cardinality guard, log commit). Clause expressions are carried as
  * SQL text (the rule fires pre-resolution, so `.sql` round-trips the
  * parsed form) and re-resolved by the builder against the aliased
  * target/source frames.
  */
class DeltalikeMergeRule extends Rule[LogicalPlan] {

  private object DeltalikeTarget {
    def unapply(plan: LogicalPlan): Option[(String, Option[String])] = plan match {
      case SubqueryAlias(ident, UnresolvedRelation(Seq("deltalike", path), _, _)) =>
        Some((path, Some(ident.name)))
      case UnresolvedRelation(Seq("deltalike", path), _, _) =>
        Some((path, None))
      case _ => None
    }
  }

  /** `path` or `path@v<N>` (Delta-style time-travel suffix). */
  private def splitVersion(raw: String): (String, Long) = {
    val m = "^(.*)@v([0-9]+)$".r
    raw match {
      case m(p, v) => (p, v.toLong)
      case _       => (raw, -1L)
    }
  }

  // top-down: the MERGE/INSERT target must be claimed by its command
  // before the generic read-rewrite would consume the inner relation
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsDown {
    case MergeIntoTable(DeltalikeTarget(path, alias), source, cond,
        matched, notMatched, notMatchedBySource, withSchemaEvolution) =>
      DeltalikeMergeCommand(
        path, alias, source, cond.sql,
        matched.map(MergeClauseSpec.from),
        notMatched.map(MergeClauseSpec.from),
        withSchemaEvolution,
        notMatchedBySource.map(MergeClauseSpec.from))

    case DeleteFromTable(DeltalikeTarget(path, alias), condition) =>
      DeltalikeDeleteCommand(path, alias, Option(condition).map(_.sql))

    case UpdateTable(DeltalikeTarget(path, alias), assignments, condition) =>
      DeltalikeUpdateCommand(path, alias,
        assignments.map(a => MergeClauseSpec.colNameOf(a.key) -> a.value.sql),
        condition.map(_.sql))

    case InsertIntoStatement(DeltalikeTarget(path, _), partitionSpec,
        userCols, query, overwrite, _, byName) =>
      if (partitionSpec.nonEmpty || userCols.nonEmpty)
        throw new UnsupportedOperationException(
          "deltalike INSERT: partition specs / column lists are not supported")
      DeltalikeInsertCommand(path, query, overwrite, byName)

    // time-travel reads with Spark's own temporal grammar:
    // SELECT ... FROM deltalike.`path` VERSION AS OF 3
    // SELECT ... FROM deltalike.`path` TIMESTAMP AS OF '2026-08-12T10:00:00Z'
    case org.apache.spark.sql.catalyst.analysis.RelationTimeTravel(
        UnresolvedRelation(Seq("deltalike", raw), _, _), ts, ver) =>
      val (path, suffixV) = splitVersion(raw)
      val version = ver.map(_.toLong).getOrElse(suffixV)
      val timestamp = ts.map {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString
        case other => throw new UnsupportedOperationException(
          s"deltalike TIMESTAMP AS OF requires a literal, got $other")
      }
      DeltalikeResolvedRead(path, version, timestamp)

    // bare reads: SELECT ... FROM deltalike.`path[@vN]`
    case UnresolvedRelation(Seq("deltalike", raw), _, _) =>
      val (path, version) = splitVersion(raw)
      DeltalikeResolvedRead(path, version)

    // change-feed reads: SELECT ... FROM deltalike_cdf.`path[@vN]` —
    // row-level changes SINCE version N (exclusive, Delta CDF's
    // convention); without a suffix the whole history arrives as
    // changes (v0's rows as inserts). Same two-phase resolution as the
    // snapshot read.
    case UnresolvedRelation(Seq("deltalike_cdf", raw), _, _) =>
      val (path, version) = splitVersion(raw) // -1 when no @vN suffix
      DeltalikeResolvedChanges(path, version)
  }
}

/** Placeholder swapped in by the read rewrite; post-hoc resolution
  * ([[DeltalikeReadResolution]]) replaces it with the snapshot's plan.
  * Split in two phases because building the scan needs the active
  * SparkSession, which hint-batch rules should not assume.
  */
case class DeltalikeResolvedRead(
    path: String,
    version: Long,
    timestamp: Option[String] = None)
    extends LeafNode {
  override def output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq.empty
  override lazy val resolved: Boolean = false
}

/** Change-feed sibling of [[DeltalikeResolvedRead]]: resolves to
  * `ChangeReader.changeFeed(path, sinceVersion)` — row-level changes
  * (incl. rewriting commits) with `_change_type`/`_commit_version`.
  */
case class DeltalikeResolvedChanges(path: String, sinceVersion: Long)
    extends LeafNode {
  override def output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq.empty
  override lazy val resolved: Boolean = false
}

/** Resolution-batch rule: [[DeltalikeResolvedRead]] → actual scan plan. */
class DeltalikeReadResolution(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case DeltalikeResolvedRead(path, version, timestamp) =>
      val t = DeltaLikeTable.forPath(spark, path)
      val v = timestamp.fold(version)(ts =>
        t.log.versionAtTimestamp(DeltaLikeSource.parseTimestamp(ts)))
      t.toDF(v).queryExecution.logical
    case DeltalikeResolvedChanges(path, since) =>
      ChangeReader.changeFeed(spark, path, since).queryExecution.logical
  }
}

/** One parsed WHEN clause carried as SQL text. `kind` ∈
  * {update_all, update, delete, insert_all, insert}.
  */
case class MergeClauseSpec(
    kind: String,
    condSql: Option[String],
    assignments: Seq[(String, String)])

object MergeClauseSpec {
  private def colName(e: Expression): String = e match {
    case u: UnresolvedAttribute => u.nameParts.last
    case other                  => other.sql
  }

  /** Unqualified assignment-target column name (strips a table alias). */
  private[tables] def colNameOf(e: Expression): String = colName(e)

  def from(a: MergeAction): MergeClauseSpec = a match {
    case UpdateStarAction(c) =>
      MergeClauseSpec("update_all", c.map(_.sql), Seq.empty)
    case UpdateAction(c, _, fromStar) if fromStar =>
      MergeClauseSpec("update_all", c.map(_.sql), Seq.empty)
    case UpdateAction(c, assigns, _) =>
      MergeClauseSpec("update", c.map(_.sql),
        assigns.map(as => colName(as.key) -> as.value.sql))
    case DeleteAction(c) =>
      MergeClauseSpec("delete", c.map(_.sql), Seq.empty)
    case InsertStarAction(c) =>
      MergeClauseSpec("insert_all", c.map(_.sql), Seq.empty)
    case InsertAction(c, assigns) =>
      MergeClauseSpec("insert", c.map(_.sql),
        assigns.map(as => colName(as.key) -> as.value.sql))
    case other =>
      throw new UnsupportedOperationException(s"deltalike MERGE: $other")
  }
}

/** INSERT INTO / INSERT OVERWRITE a deltalike table from SQL. */
case class DeltalikeInsertCommand(
    path: String,
    query: LogicalPlan,
    overwrite: Boolean,
    byName: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    val raw = GraftSqlBridge.ofRows(spark, query)
    val target = DeltaLikeTable.forPath(spark, path).toDF.schema
    // store-assignment: align positionally (or by name) and cast each
    // column to the table's declared type, like INSERT into any SQL table
    val aligned =
      if (byName) raw.select(
        target.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
      else {
        require(raw.schema.length == target.length,
          s"deltalike INSERT: ${raw.schema.length} columns vs table's ${target.length}")
        raw.select(target.fields.zip(raw.columns).map { case (f, c) =>
          col(c).cast(f.dataType).as(f.name)
        }.toIndexedSeq: _*)
      }
    DeltaLikeTable.write(aligned, path, if (overwrite) "overwrite" else "append",
      operation = "INSERT")
    Seq.empty
  }
}

/** SQL `DELETE FROM deltalike.`path` [AS t] [WHERE cond]`. */
case class DeltalikeDeleteCommand(
    path: String,
    targetAlias: Option[String],
    condSql: Option[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.lit
    val table = DeltaLikeTable.forPath(spark, path)
    val aliased = targetAlias.fold(table)(table.as)
    aliased.delete(condSql.map(expr).getOrElse(lit(true)))
    Seq.empty
  }
}

/** SQL `UPDATE deltalike.`path` [AS t] SET c = e, ... [WHERE cond]`. */
case class DeltalikeUpdateCommand(
    path: String,
    targetAlias: Option[String],
    assignments: Seq[(String, String)],
    condSql: Option[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.lit
    val table = DeltaLikeTable.forPath(spark, path)
    val aliased = targetAlias.fold(table)(table.as)
    aliased.update(
      condSql.map(expr).getOrElse(lit(true)),
      assignments.map { case (c, v) => c -> expr(v) }.toMap)
    Seq.empty
  }
}

case class DeltalikeMergeCommand(
    path: String,
    targetAlias: Option[String],
    source: LogicalPlan,
    condSql: String,
    matched: Seq[MergeClauseSpec],
    notMatched: Seq[MergeClauseSpec],
    schemaEvolution: Boolean = false,
    notMatchedBySource: Seq[MergeClauseSpec] = Seq.empty)
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val sourceDF = GraftSqlBridge.ofRows(spark, source)
    val table = DeltaLikeTable.forPath(spark, path)
    var builder = targetAlias.fold(table)(table.as)
      .merge(sourceDF, expr(condSql))
    if (schemaEvolution) builder = builder.withSchemaEvolution()
    def cond(c: Option[String]) = c.map(expr)
    (matched ++ notMatched).foreach { cl =>
      builder = (cl.kind, cond(cl.condSql)) match {
        case ("update_all", None)    => builder.whenMatchedUpdateAll()
        case ("update_all", Some(c)) => builder.whenMatchedUpdateAll(c)
        case ("update", None) =>
          builder.whenMatchedUpdate(cl.assignments.map(kv => kv._1 -> expr(kv._2)).toMap)
        case ("update", Some(c)) =>
          builder.whenMatchedUpdate(c, cl.assignments.map(kv => kv._1 -> expr(kv._2)).toMap)
        case ("delete", None)        => builder.whenMatchedDelete()
        case ("delete", Some(c))     => builder.whenMatchedDelete(c)
        case ("insert_all", None)    => builder.whenNotMatchedInsertAll()
        case ("insert_all", Some(c)) => builder.whenNotMatchedInsertAll(c)
        case ("insert", None) =>
          builder.whenNotMatchedInsert(cl.assignments.map(kv => kv._1 -> expr(kv._2)).toMap)
        case ("insert", Some(c)) =>
          builder.whenNotMatchedInsert(c, cl.assignments.map(kv => kv._1 -> expr(kv._2)).toMap)
        case (k, _) => throw new IllegalStateException(s"unknown clause kind $k")
      }
    }
    notMatchedBySource.foreach { cl =>
      builder = (cl.kind, cond(cl.condSql)) match {
        case ("update", None) =>
          builder.whenNotMatchedBySourceUpdate(
            cl.assignments.map(kv => kv._1 -> expr(kv._2)).toMap)
        case ("update", Some(c)) =>
          builder.whenNotMatchedBySourceUpdate(
            c, cl.assignments.map(kv => kv._1 -> expr(kv._2)).toMap)
        case ("delete", None)    => builder.whenNotMatchedBySourceDelete()
        case ("delete", Some(c)) => builder.whenNotMatchedBySourceDelete(c)
        case (k, _) => throw new UnsupportedOperationException(
          s"deltalike MERGE: NOT MATCHED BY SOURCE supports UPDATE SET/DELETE, not $k")
      }
    }
    builder.execute()
    Seq.empty
  }
}
