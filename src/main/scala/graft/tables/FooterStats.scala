package graft.tables

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file min/max/null-count stats from parquet FOOTERS — metadata
  * I/O (a few KB per file), not a data re-scan. The previous stats pass
  * re-read every byte just written, doubling write I/O; the footers
  * already carry per-row-group statistics computed by the writer, so a
  * commit now touches each data file's tail block only. This is the
  * same trick Iceberg uses for its manifests; Delta collects in write
  * tasks — either way, never a second scan.
  *
  * Strictly conservative, mirroring [[DataSkipping]]'s contract: any
  * column whose chunks lack usable stats (missing, NaN, INT96
  * timestamps, truncated binaries) simply gets no min/max entry and is
  * never pruned on. Partition-column stats are reconstructed from the
  * `col=value` path segments (min = max = value), so partition-predicate
  * file pruning falls out of the ordinary skipping path.
  */
object FooterStats {

  /** Stats-bearing AddFile for one staged file.
    *
    * @param relPath  path relative to the table root, partition dirs
    *                 included (e.g. "k=1/part-0.parquet")
    */
  def forFile(
      conf: Configuration,
      file: String,
      relPath: String,
      sizeBytes: Long,
      schema: StructType,
      partitionCols: Seq[String]): AddFile = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new HPath(file), conf))
    val (rowCount, mins, maxs, nulls) =
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        val rows = blocks.map(_.getRowCount).sum
        val mins = scala.collection.mutable.Map.empty[String, String]
        val maxs = scala.collection.mutable.Map.empty[String, String]
        val nulls = scala.collection.mutable.Map.empty[String, Long]
        schema.fields
          .filter(f => supported(f.dataType) && !partitionCols.contains(f.name))
          .foreach { field =>
            val chunks = blocks.map(b =>
              b.getColumns.asScala.find(_.getPath.toDotString == field.name))
            if (chunks.nonEmpty && chunks.forall(_.isDefined)) {
              val ccs = chunks.map(_.get)
              val stats = ccs.map(_.getStatistics)
              if (stats.forall(s => s != null && s.isNumNullsSet))
                nulls(field.name) = stats.map(_.getNumNulls).sum
              // min/max usable iff every chunk either has a real value or
              // is provably all-null
              val usable = ccs.forall { cc =>
                val s = cc.getStatistics
                s != null && (s.hasNonNullValue ||
                  (s.isNumNullsSet && s.getNumNulls == cc.getValueCount))
              }
              if (usable) {
                val logical = ccs.head.getPrimitiveType.getLogicalTypeAnnotation
                val vals = stats.filter(_.hasNonNullValue).flatMap { s =>
                  for {
                    mi <- decode(field, logical, s.genericGetMin.asInstanceOf[AnyRef])
                    ma <- decode(field, logical, s.genericGetMax.asInstanceOf[AnyRef])
                  } yield (mi, ma)
                }
                // only publish when every value-bearing chunk decoded
                if (vals.length == stats.count(_.hasNonNullValue) && vals.nonEmpty) {
                  mins(field.name) = vals.map(_._1).reduce(
                    (a, b) => if (cmp(field.dataType, a, b) <= 0) a else b)
                  maxs(field.name) = vals.map(_._2).reduce(
                    (a, b) => if (cmp(field.dataType, a, b) >= 0) a else b)
                }
              }
            }
          }
        (rows, mins, maxs, nulls)
      } finally reader.close()

    // partition values ride in the path: min = max = value, null partition
    // → all-null counts
    relPath.split('/').dropRight(1).foreach { seg =>
      val eq = seg.indexOf('=')
      if (eq > 0) {
        val name = unescapePath(seg.substring(0, eq))
        val raw = unescapePath(seg.substring(eq + 1))
        schema.fields.find(f => f.name == name && partitionCols.contains(name))
          .foreach { field =>
            if (raw == "__HIVE_DEFAULT_PARTITION__") nulls(field.name) = rowCount
            else {
              nulls(field.name) = 0L
              partitionStat(field.dataType, raw).foreach { enc =>
                mins(field.name) = enc
                maxs(field.name) = enc
              }
            }
          }
      }
    }

    AddFile(relPath, sizeBytes, rowCount,
      mins.toMap, maxs.toMap, nulls.toMap)
  }

  private def supported(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | DateType | TimestampType | BooleanType => true
    case _ => false
  }

  /** Footer value → encoded stat string (see
    * [[DeltaLikeTable.encodeStat]] for the format contract); None when
    * the physical/logical shape isn't one we can order reliably.
    */
  private def decode(
      field: StructField,
      logical: LogicalTypeAnnotation,
      v: AnyRef): Option[String] = (field.dataType, v) match {
    case (_, null) => None
    // NaN AND ±Infinity withheld: the stat format is BigDecimal-parsed at
    // prune time (cmp / DataSkipping.compare), where "Infinity" would
    // throw — and a NaN-/Inf-bearing chunk's min/max ordering is not
    // trustworthy anyway. No stat → never pruned, the conservative side.
    case (FloatType, f: java.lang.Float) =>
      if (f.isNaN || f.isInfinite) None else Some(f.toString)
    case (DoubleType, d: java.lang.Double) =>
      if (d.isNaN || d.isInfinite) None else Some(d.toString)
    case (dec: DecimalType, i: java.lang.Integer) =>
      Some(new java.math.BigDecimal(
        java.math.BigInteger.valueOf(i.longValue), dec.scale).toPlainString)
    case (dec: DecimalType, l: java.lang.Long)
        if logical.isInstanceOf[LogicalTypeAnnotation.DecimalLogicalTypeAnnotation] =>
      Some(new java.math.BigDecimal(
        java.math.BigInteger.valueOf(l), dec.scale).toPlainString)
    case (dec: DecimalType, b: org.apache.parquet.io.api.Binary) =>
      Some(new java.math.BigDecimal(
        new java.math.BigInteger(b.getBytes), dec.scale).toPlainString)
    case (ByteType | ShortType | IntegerType, i: java.lang.Integer) =>
      Some(i.toString)
    case (LongType, l: java.lang.Long) => Some(l.toString)
    case (DateType, i: java.lang.Integer) => Some(i.toString) // epoch days
    case (TimestampType, l: java.lang.Long) =>
      logical match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          t.getUnit match {
            case TimeUnit.MICROS => Some(l.toString)
            case TimeUnit.MILLIS => Some((l * 1000L).toString)
            case _               => None
          }
        case _ => None // INT96 etc: stats unreliable
      }
    case (StringType, b: org.apache.parquet.io.api.Binary) =>
      Some(new String(b.getBytes, java.nio.charset.StandardCharsets.UTF_8))
    case (BooleanType, b: java.lang.Boolean) => Some(b.toString)
    case _ => None
  }

  /** Order two encoded stats under the column type (same orderings
    * [[DataSkipping]] uses at prune time).
    */
  private def cmp(dt: DataType, a: String, b: String): Int = dt match {
    case _: NumericType =>
      new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b))
    case StringType =>
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
    case DateType | TimestampType => java.lang.Long.compare(a.toLong, b.toLong)
    case BooleanType => java.lang.Boolean.compare(a.toBoolean, b.toBoolean)
    case _ => 0
  }

  /** Encode a partition-directory value under the stat format. */
  private def partitionStat(dt: DataType, raw: String): Option[String] = dt match {
    case _: NumericType => Some(new java.math.BigDecimal(raw).toPlainString)
    case StringType     => Some(raw)
    case DateType       => Some(java.time.LocalDate.parse(raw).toEpochDay.toString)
    case BooleanType    => Some(raw.toBoolean.toString)
    case _              => None // timestamps: format/zone-dependent, keep unpruned
  }

  /** Undo Hive-style %xx path escaping (no '+'-as-space semantics). */
  private[tables] def unescapePath(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
        isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
}
