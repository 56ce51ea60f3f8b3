package graft.tables

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL DDL/maintenance statements for deltalike tables that Spark's
  * grammar doesn't know — injected as a thin parser wrapper (the same
  * mechanism Delta Lake uses for its extensions). Only statements
  * matching the `deltalike.`path`` patterns below are claimed; every
  * other string goes to the delegate parser untouched.
  *
  * {{{
  * RESTORE TABLE deltalike.`/p` TO VERSION AS OF 3
  * RESTORE TABLE deltalike.`/p` TO TIMESTAMP AS OF '2026-08-12T10:00:00Z'
  * ALTER TABLE deltalike.`/p` ADD CONSTRAINT positive CHECK (bal >= 0)
  * ALTER TABLE deltalike.`/p` DROP CONSTRAINT positive
  * ALTER TABLE deltalike.`/p` RENAME COLUMN a TO b
  * ALTER TABLE deltalike.`/p` DROP COLUMN a
  * ALTER TABLE deltalike.`/p` ADD COLUMN c BIGINT
  * ALTER TABLE deltalike.`/p` ALTER COLUMN c TYPE BIGINT
  * DESCRIBE HISTORY deltalike.`/p`
  * DESCRIBE DETAIL deltalike.`/p`
  * CREATE TABLE deltalike.`/clone` SHALLOW CLONE deltalike.`/p`
  * CONVERT TO DELTALIKE parquet.`/dir` [PARTITIONED BY (k)]
  * VACUUM deltalike.`/p` [RETAIN 4 VERSIONS] [DRY RUN]
  * OPTIMIZE deltalike.`/p` [WHERE part_pred] [ZORDER BY (c1, c2)]
  * }}}
  */
final class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    parseGraftStatement(sqlText, delegate).getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(s: String) = delegate.parseExpression(s)
  override def parseTableIdentifier(s: String): TableIdentifier =
    delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String): Seq[String] =
    delegate.parseMultipartIdentifier(s)
  override def parseQuery(s: String): LogicalPlan = delegate.parseQuery(s)
  override def parseRoutineParam(s: String): StructType = delegate.parseRoutineParam(s)
  override def parseDataType(s: String): DataType = delegate.parseDataType(s)
  override def parseTableSchema(s: String): StructType = delegate.parseTableSchema(s)
}

object GraftSqlParser {
  private val RestoreVersion =
    """(?is)\s*RESTORE\s+TABLE\s+deltalike\s*\.\s*`([^`]+)`\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  private val RestoreTimestamp =
    """(?is)\s*RESTORE\s+TABLE\s+deltalike\s*\.\s*`([^`]+)`\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""".r
  private val AddConstraint =
    """(?is)\s*ALTER\s+TABLE\s+deltalike\s*\.\s*`([^`]+)`\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*""".r
  private val DropConstraint =
    """(?is)\s*ALTER\s+TABLE\s+deltalike\s*\.\s*`([^`]+)`\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*""".r
  private val RenameColumn =
    """(?is)\s*ALTER\s+TABLE\s+deltalike\s*\.\s*`([^`]+)`\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*;?\s*""".r
  private val DropColumn =
    """(?is)\s*ALTER\s+TABLE\s+deltalike\s*\.\s*`([^`]+)`\s+DROP\s+COLUMN\s+(\w+)\s*;?\s*""".r
  private val AddColumn =
    """(?is)\s*ALTER\s+TABLE\s+deltalike\s*\.\s*`([^`]+)`\s+ADD\s+COLUMN\s+(\w+)\s+(.+?)\s*;?\s*""".r
  private val AlterColumnType =
    """(?is)\s*ALTER\s+TABLE\s+deltalike\s*\.\s*`([^`]+)`\s+ALTER\s+COLUMN\s+(\w+)\s+TYPE\s+(.+?)\s*;?\s*""".r
  private val DescribeHistory =
    """(?is)\s*DESC(?:RIBE)?\s+HISTORY\s+deltalike\s*\.\s*`([^`]+)`\s*;?\s*""".r
  private val DescribeDetail =
    """(?is)\s*DESC(?:RIBE)?\s+DETAIL\s+deltalike\s*\.\s*`([^`]+)`\s*;?\s*""".r
  private val ShallowClone =
    """(?is)\s*CREATE\s+TABLE\s+deltalike\s*\.\s*`([^`]+)`\s+SHALLOW\s+CLONE\s+deltalike\s*\.\s*`([^`]+)`\s*;?\s*""".r
  private val CreateTableAs =
    """(?is)\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?deltalike\s*\.\s*`([^`]+)`(?:\s+PARTITIONED\s+BY\s*\(([^)]*)\))?\s+AS\s+(.+?)\s*;?\s*""".r
  private val ConvertToDeltalike =
    """(?is)\s*CONVERT\s+TO\s+DELTALIKE\s+parquet\s*\.\s*`([^`]+)`(?:\s+PARTITIONED\s+BY\s*\(([^)]*)\))?\s*;?\s*""".r
  private val Vacuum =
    """(?is)\s*VACUUM\s+deltalike\s*\.\s*`([^`]+)`(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?(\s+DRY\s+RUN)?\s*;?\s*""".r
  private val Optimize =
    """(?is)\s*OPTIMIZE\s+deltalike\s*\.\s*`([^`]+)`(?:\s+WHERE\s+(.+?))?(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*;?\s*""".r

  private[tables] def parseGraftStatement(
      sql: String, delegate: ParserInterface): Option[LogicalPlan] =
    sql match {
      // mutually exclusive with ShallowClone ("AS <query>" vs
      // "SHALLOW CLONE"); the CTAS source query is parsed by the
      // session's own parser so deltalike reads / CTEs / joins work
      case CreateTableAs(ifNotExists, path, partCols, query) =>
        Some(DeltalikeCreateTableAsCommand(path,
          delegate.parseQuery(query),
          Option(partCols).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
            .getOrElse(Seq.empty),
          ifNotExists != null))
      case RestoreVersion(path, v) =>
        Some(DeltalikeRestoreCommand(path, Some(v.toLong), None))
      case RestoreTimestamp(path, ts) =>
        Some(DeltalikeRestoreCommand(path, None, Some(ts)))
      case AddConstraint(path, name, check) =>
        Some(DeltalikeAddConstraintCommand(path, name, check))
      case DropConstraint(path, name) =>
        Some(DeltalikeDropConstraintCommand(path, name))
      case RenameColumn(path, from, to) =>
        Some(DeltalikeRenameColumnCommand(path, from, to))
      case DropColumn(path, name) =>
        Some(DeltalikeDropColumnCommand(path, name))
      case AddColumn(path, name, typeDdl) =>
        Some(DeltalikeAddColumnCommand(path, name, typeDdl))
      case AlterColumnType(path, name, typeDdl) =>
        Some(DeltalikeAlterColumnTypeCommand(path, name, typeDdl))
      case DescribeHistory(path) =>
        Some(DeltalikeDescribeHistoryCommand(path))
      case DescribeDetail(path) =>
        Some(DeltalikeDescribeDetailCommand(path))
      case ShallowClone(target, source) =>
        Some(DeltalikeShallowCloneCommand(source, target))
      case ConvertToDeltalike(path, partCols) =>
        Some(DeltalikeConvertCommand(path,
          Option(partCols).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
            .getOrElse(Seq.empty)))
      case Vacuum(path, retain, dry) =>
        Some(DeltalikeVacuumCommand(path,
          Option(retain).map(_.toInt).getOrElse(1), dry != null))
      case Optimize(path, where, zorder) =>
        Some(DeltalikeOptimizeCommand(path,
          Option(zorder).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
            .getOrElse(Seq.empty),
          Option(where).map(_.trim)))
      case _ => None
    }
}

case class DeltalikeRestoreCommand(
    path: String,
    version: Option[Long],
    timestamp: Option[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = DeltaLikeTable.forPath(spark, path)
    val v = version.getOrElse(
      t.log.versionAtTimestamp(DeltaLikeSource.parseTimestamp(timestamp.get)))
    t.restore(v)
    Seq.empty
  }
}

case class DeltalikeAddConstraintCommand(path: String, name: String, check: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    DeltaLikeTable.forPath(spark, path).addConstraint(name, check)
    Seq.empty
  }
}

case class DeltalikeDropConstraintCommand(path: String, name: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    DeltaLikeTable.forPath(spark, path).dropConstraint(name)
    Seq.empty
  }
}

case class DeltalikeRenameColumnCommand(path: String, from: String, to: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    DeltaLikeTable.forPath(spark, path).renameColumn(from, to)
    Seq.empty
  }
}

case class DeltalikeDropColumnCommand(path: String, column: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    DeltaLikeTable.forPath(spark, path).dropColumn(column)
    Seq.empty
  }
}

case class DeltalikeAddColumnCommand(path: String, column: String, typeDdl: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    DeltaLikeTable.forPath(spark, path).addColumn(column, typeDdl)
    Seq.empty
  }
}

case class DeltalikeAlterColumnTypeCommand(
    path: String, column: String, typeDdl: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    DeltaLikeTable.forPath(spark, path).alterColumnType(column, typeDdl)
    Seq.empty
  }
}

case class DeltalikeDescribeDetailCommand(path: String)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{ArrayType, BooleanType, LongType, StringType}

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] = Seq(
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("num_records", LongType, nullable = false)(),
    AttributeReference("partition_columns", ArrayType(StringType), nullable = true)(),
    AttributeReference("bloom_filter_columns", ArrayType(StringType), nullable = true)(),
    AttributeReference("constraints", ArrayType(StringType), nullable = true)(),
    AttributeReference("deletion_vectors", BooleanType, nullable = false)(),
    AttributeReference("column_mapping", BooleanType, nullable = false)(),
    AttributeReference("generated_columns", ArrayType(StringType), nullable = true)(),
    AttributeReference("identity_columns", ArrayType(StringType), nullable = true)(),
    AttributeReference("cluster_by", ArrayType(StringType), nullable = true)())

  override def run(spark: SparkSession): Seq[Row] =
    DeltaLikeTable.forPath(spark, path).detail().collect().toSeq
}

case class DeltalikeDescribeHistoryCommand(path: String)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{IntegerType, LongType, StringType, TimestampType}

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("timestamp", TimestampType, nullable = true)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("num_added_files", IntegerType, nullable = false)(),
    AttributeReference("num_removed_files", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    DeltaLikeTable.forPath(spark, path).historyDF().collect().toSeq
}

case class DeltalikeShallowCloneCommand(source: String, target: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    DeltaLikeTable.forPath(spark, source).shallowCloneTo(target)
    Seq.empty
  }
}

/** `CREATE TABLE [IF NOT EXISTS] deltalike.`/p` [PARTITIONED BY (k)]
  * AS <query>` — the SQL-first way a table is born. The query plan is
  * parsed by the session's own parser (so deltalike reads, CTEs, joins
  * all work as the source) and committed as v0 through the normal
  * write path (footer stats, partitioned layout).
  */
case class DeltalikeCreateTableAsCommand(
    path: String,
    query: LogicalPlan,
    partitionColumns: Seq[String],
    ifNotExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val log = DeltaLog.forPath(path)
    if (log.exists) {
      if (ifNotExists) return Seq.empty
      throw new IllegalStateException(
        s"deltalike table already exists at $path (use IF NOT EXISTS)")
    }
    val df = org.apache.spark.sql.graftbridge.GraftSqlBridge.ofRows(spark, query)
    DeltaLikeTable.write(df, path, "overwrite", operation = "CREATE TABLE AS SELECT",
      partitionBy = partitionColumns)
    Seq.empty
  }
}

case class DeltalikeConvertCommand(path: String, partitionColumns: Seq[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    DeltaLikeTable.convert(spark, path, partitionColumns)
    Seq.empty
  }
}

case class DeltalikeVacuumCommand(
    path: String,
    retainVersions: Int,
    dryRun: Boolean = false)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.StringType

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("path", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    DeltaLikeTable.forPath(spark, path)
      .vacuum(retainVersions, dryRun).map(Row(_))
}

case class DeltalikeOptimizeCommand(
    path: String,
    zorderBy: Seq[String],
    where: Option[String] = None)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    DeltaLikeTable.forPath(spark, path)
      .optimize(targetFiles = 1, zorderBy = zorderBy, where = where)
    Seq.empty
  }
}
