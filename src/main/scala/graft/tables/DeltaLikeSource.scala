package graft.tables

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SQLContext}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** `spark.read.format("deltalike")` / `df.write.format("deltalike")` —
  * the format-string sugar over [[DeltaLikeTable]] mirroring how the
  * reference addresses its versioned tables
  * (`/root/reference/sparkcode/titanic_example_delta.py:25,56-58,64-70`:
  * `format("delta")` with `versionAsOf` as a read option).
  *
  * Read path: resolve version → prune files against pushed filters via
  * [[DataSkipping]] → delegate to the stock vectorized parquet reader
  * (which does its own row-group pushdown), so the custom layer is
  * metadata-only. Registered by short name through the standard
  * `DataSourceRegister` service file.
  */
final class DeltaLikeSource
    extends RelationProvider
    with CreatableRelationProvider
    with StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "deltalike"

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("deltalike: 'path' is required"))
    val base = schema.getOrElse(DeltaLog.forPath(path).snapshot().schema)
    val resolved =
      if (parameters.get("readChangeFeed").exists(_.toBoolean))
        ChangeReader.withChangeSchema(base)
      else base
    (shortName(), resolved)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("deltalike: 'path' is required"))
    new DeltaLikeStreamSource(sqlContext.sparkSession, path,
      skipChangeCommits = parameters.get("skipChangeCommits").exists(_.toBoolean),
      readChangeFeed = parameters.get("readChangeFeed").exists(_.toBoolean),
      maxVersionsPerTrigger = parameters.get("maxVersionsPerTrigger").map { s =>
        val n = s.toLong
        require(n > 0, s"maxVersionsPerTrigger must be positive, got $n")
        n
      })
  }

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("deltalike: 'path' is required"))
    require(!(parameters.contains("versionAsOf") && parameters.contains("timestampAsOf")),
      "deltalike: versionAsOf and timestampAsOf are mutually exclusive")
    val log = DeltaLog.forPath(path)
    val version = parameters.get("timestampAsOf") match {
      case Some(ts) => log.versionAtTimestamp(DeltaLikeSource.parseTimestamp(ts))
      case None     => parameters.get("versionAsOf").map(_.toLong).getOrElse(-1L)
    }
    new DeltaLikeRelation(sqlContext, log.snapshot(version))
  }

  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("deltalike: 'path' is required"))
    val m = mode match {
      case SaveMode.Overwrite => "overwrite"
      case SaveMode.Append    => "append"
      case other =>
        throw new IllegalArgumentException(s"deltalike: unsupported save mode $other")
    }
    DeltaLikeTable.write(data, path, m,
      mergeSchema = parameters.get("mergeSchema").exists(_.toBoolean),
      bloomFilterColumns = parameters.get("bloomFilterColumns")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Seq.empty),
      enableDeletionVectors = parameters.get("enableDeletionVectors").exists(_.toBoolean),
      autoCompact = parameters.get("autoCompact").exists(_.toBoolean),
      clusterBy = parameters.get("clusterBy")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Seq.empty),
      // "id" or "id:start:step[:default]" — comma-separated declarations
      identityColumns = parameters.get("identityColumn")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).map { decl =>
          decl.split(":") match {
            case Array(c)         => c -> DeltaLikeTable.IdentityColumn()
            case Array(c, st, sp) =>
              c -> DeltaLikeTable.IdentityColumn(st.toLong, sp.toLong)
            case Array(c, st, sp, "default") =>
              c -> DeltaLikeTable.IdentityColumn(st.toLong, sp.toLong, always = false)
            case _ => throw new IllegalArgumentException(
              s"deltalike: bad identityColumn declaration '$decl' " +
                "(want name[:start:step[:default]])")
          }
        }.toMap).getOrElse(Map.empty))
    createRelation(sqlContext, parameters)
  }
}

private[tables] object DeltaLikeSource {
  /** `timestampAsOf` accepts epoch millis or ISO-8601 (date, date+time,
    * with or without zone; zoneless strings read as UTC).
    */
  private[tables] def parseTimestamp(s: String): Long = {
    val t = s.trim
    if (t.forall(_.isDigit)) t.toLong
    else {
      val normalized = if (t.contains("T") || !t.contains(" ")) t else t.replace(" ", "T")
      try java.time.Instant.parse(normalized).toEpochMilli
      catch {
        case _: java.time.format.DateTimeParseException =>
          try java.time.LocalDateTime.parse(normalized)
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
          catch {
            case _: java.time.format.DateTimeParseException =>
              java.time.LocalDate.parse(normalized)
                .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
          }
      }
    }
  }
}

private[tables] final class DeltaLikeRelation(
    ctx: SQLContext,
    snap: Snapshot)
    extends BaseRelation
    with PrunedFilteredScan {

  override def sqlContext: SQLContext = ctx
  override def schema: StructType = snap.schema

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val spark = ctx.sparkSession
    val kept = DataSkipping.prune(snap, filters.toSeq)
    // shared snapshot reader: handles empty file lists and partitioned
    // layouts (basePath reconstruction) identically to the object API
    val base = DeltaLikeTable.readSnapshot(spark, snap.copy(files = kept))
    val filtered = filters.flatMap(toColumn).foldLeft(base)(_.filter(_))
    val projected =
      if (requiredColumns.isEmpty) filtered.select()
      else filtered.select(requiredColumns.map(col).toSeq: _*)
    projected.rdd
  }

  /** sources.Filter → Column; None for shapes we let Spark re-apply. */
  private def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v)            => Some(col(a) === lit(v))
    case EqualNullSafe(a, v)      => Some(col(a) <=> lit(v))
    case GreaterThan(a, v)        => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v)           => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
    case In(a, vs)                => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a)                => Some(col(a).isNull)
    case IsNotNull(a)             => Some(col(a).isNotNull)
    case And(l, r)                => for { a <- toColumn(l); b <- toColumn(r) } yield a && b
    case Or(l, r)                 => for { a <- toColumn(l); b <- toColumn(r) } yield a || b
    case Not(c)                   => toColumn(c).map(!_)
    case StringStartsWith(a, v)   => Some(col(a).startsWith(v))
    case StringEndsWith(a, v)     => Some(col(a).endsWith(v))
    case StringContains(a, v)     => Some(col(a).contains(v))
    case _                        => None
  }
}
