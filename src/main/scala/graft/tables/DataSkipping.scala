package graft.tables

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** File-level pruning from the per-file min/max/null-count stats recorded
  * in the log at write time (the optional Delta-style data-skipping layer,
  * SURVEY.md §4). Given the scan's pushed filters, drop files that
  * provably contain no qualifying row — at 100 TB a selective predicate
  * then opens a small subset of files instead of the whole table.
  *
  * Strictly conservative: any file with missing stats, an unsupported
  * filter shape, or a type we don't order is KEPT. Correctness never
  * depends on skipping; it only removes provably-empty scans.
  */
object DataSkipping {

  def prune(snap: Snapshot, filters: Seq[Filter]): Seq[AddFile] =
    filters.foldLeft(snap.files)((fs, f) => fs.filter(mayMatch(snap.schema, _, f)))

  /** false only when `file` provably has no row satisfying `filter`. */
  private[tables] def mayMatch(schema: StructType, file: AddFile, filter: Filter): Boolean =
    filter match {
      case EqualTo(a, v) =>
        cmpStat(schema, file, a, v) match {
          case Some((lo, hi)) => lo <= 0 && hi >= 0 // min<=v && max>=v
          case None           => true
        }
      case GreaterThan(a, v) =>
        cmpStat(schema, file, a, v).forall { case (_, hi) => hi > 0 }
      case GreaterThanOrEqual(a, v) =>
        cmpStat(schema, file, a, v).forall { case (_, hi) => hi >= 0 }
      case LessThan(a, v) =>
        cmpStat(schema, file, a, v).forall { case (lo, _) => lo < 0 }
      case LessThanOrEqual(a, v) =>
        cmpStat(schema, file, a, v).forall { case (lo, _) => lo <= 0 }
      case In(a, vs) =>
        vs.isEmpty || inMayMatch(schema, file, a, vs)
      case IsNull(a) =>
        file.nullCounts.get(a).forall(_ > 0)
      case IsNotNull(a) =>
        file.nullCounts.get(a).forall(_ < file.numRecords)
      case And(l, r) => mayMatch(schema, file, l) && mayMatch(schema, file, r)
      case Or(l, r)  => mayMatch(schema, file, l) || mayMatch(schema, file, r)
      case _         => true // Not / string matches / unknown: keep
    }

  /** `In`-specific fast path. A point-lookup probe set (the banded
    * signature index reads thousands of band-hash / doc-id values per
    * trigger) routed through the per-value EqualTo path re-parses the
    * same two file stats once per VALUE — O(|vs|) BigDecimal builds per
    * file. For integral columns, parse the file's [min, max] ONCE and
    * range-check each probe as a primitive long. Same conservative
    * contract: any parse failure or non-integral shape falls back to
    * the per-value path (which itself keeps on anything it can't order).
    */
  private def inMayMatch(
      schema: StructType,
      file: AddFile,
      a: String,
      vs: Array[Any]): Boolean = {
    val integral = schema.fields.find(_.name == a).map(_.dataType) match {
      case Some(ByteType | ShortType | IntegerType | LongType) => true
      case _                                                   => false
    }
    if (integral && vs.forall(_.isInstanceOf[java.lang.Number])) {
      (file.minValues.get(a), file.maxValues.get(a)) match {
        case (Some(mi), Some(ma)) =>
          try {
            val lo = mi.toLong
            val hi = ma.toLong
            // longValue truncation on a fractional probe can only
            // over-keep (an int column never equals 2.5 anyway)
            vs.exists { v =>
              val x = v.asInstanceOf[java.lang.Number].longValue
              x >= lo && x <= hi
            }
          } catch { case scala.util.control.NonFatal(_) => true }
        case _ => true
      }
    } else vs.exists(v => mayMatch(schema, file, EqualTo(a, v)))
  }

  /** (sign of min-v, sign of max-v) for attribute `a` vs literal `v`,
    * None when stats or ordering are unavailable (→ keep the file).
    */
  private def cmpStat(
      schema: StructType,
      file: AddFile,
      a: String,
      v: Any): Option[(Int, Int)] =
    for {
      field <- schema.fields.find(_.name == a)
      if v != null
      mi <- file.minValues.get(a)
      ma <- file.maxValues.get(a)
      lo <- compare(field.dataType, mi, v)
      hi <- compare(field.dataType, ma, v)
    } yield (lo, hi)

  /** Compare an encoded stat (see [[DeltaLikeTable.encodeStat]]) with a
    * pushed-filter literal under the column's type ordering. Any parse
    * failure (e.g. an "Infinity" stat written by an older log, or an
    * infinite filter literal) yields None → keep the file: the contract
    * is strictly conservative, never an exception at scan time.
    */
  private def compare(dt: DataType, stat: String, v: Any): Option[Int] =
    try compareUnsafe(dt, stat, v)
    catch { case scala.util.control.NonFatal(_) => None }

  private def compareUnsafe(dt: DataType, stat: String, v: Any): Option[Int] = dt match {
    case _: NumericType =>
      numeric(v).map(b => new java.math.BigDecimal(stat).compareTo(b))
    case StringType =>
      // UTF8String order (unsigned UTF-8 bytes) — the order Spark used to
      // compute the min/max and will use to evaluate the filter. Java
      // String.compareTo (UTF-16 code units) disagrees for strings mixing
      // supplementary-plane chars with U+E000..U+FFFF, which could prune
      // a file that actually holds matching rows.
      v match {
        case s: String =>
          Some(org.apache.spark.unsafe.types.UTF8String.fromString(stat)
            .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(s)))
        case _ => None
      }
    case TimestampType =>
      (v match {
        case t: java.sql.Timestamp =>
          Some(t.getTime / 1000 * 1000000L + t.getNanos / 1000)
        case i: java.time.Instant =>
          Some(i.getEpochSecond * 1000000L + i.getNano / 1000)
        case _ => None
      }).map(us => java.lang.Long.compare(stat.toLong, us))
    case DateType =>
      (v match {
        case d: java.sql.Date      => Some(d.toLocalDate.toEpochDay)
        case d: java.time.LocalDate => Some(d.toEpochDay)
        case _                     => None
      }).map(ed => java.lang.Long.compare(stat.toLong, ed))
    case BooleanType =>
      v match {
        case b: java.lang.Boolean =>
          Some(java.lang.Boolean.compare(stat.toBoolean, b))
        case _ => None
      }
    case _ => None
  }

  private def numeric(v: Any): Option[java.math.BigDecimal] = v match {
    case n: java.lang.Number => Some(new java.math.BigDecimal(n.toString))
    case _                   => None
  }
}
