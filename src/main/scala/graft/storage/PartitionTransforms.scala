package graft.storage

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style HIDDEN partition transforms: the table partitions on
  * a value DERIVED from a source column (`days(ts)`, `bucket(16, k)`,
  * ...), the derived value lives only in directory names, and queries
  * keep filtering the RAW column — the planner translates raw-space
  * predicates into transform space and prunes directories without the
  * user ever naming (or even knowing about) the partition layout.
  * That kills the classic partition-column bug class: nobody forgets
  * `WHERE event_date = ...` next to `WHERE event_ts BETWEEN ...`,
  * because there is no separate partition column to forget.
  *
  * Every transform here is TIMEZONE-FREE by construction (the stats-v2
  * lesson): `days`/`hours` are epoch arithmetic on the timestamp's
  * micros — never a session-zone rendering — so a table written under
  * one session timezone prunes exactly under any other.
  *
  * Supported (spec grammar is the canonical manifest form):
  *  - `days(c)`   — epoch day of a timestamp (floor micros/86.4e9) or
  *                  the day ordinal of a date
  *  - `hours(c)`  — epoch hour of a timestamp
  *  - `bucket(n, c)` — `pmod(hash(c), n)` (Murmur3, Spark's own
  *                  `functions.hash`), any hashable type; prunes
  *                  EQUALITY predicates only
  *  - `truncate(n, c)` — first `n` chars of a string, or `v − pmod(v,
  *                  n)` of an integral; prefix/floor truncation is
  *                  monotone, so RANGE predicates prune too
  *
  * Derived directory names are prefixed (`_days_c`, `_bucket_c`, ...)
  * and validated against the schema at table creation, so they can
  * never shadow a real column.
  */
object PartitionTransforms {

  private val MicrosPerDay = 86400000000L
  private val MicrosPerHour = 3600000000L

  /** One translated skip vote on a derived directory value: admit dirs
    * whose value sits in [lo, hi] (either side open when None),
    * compared numerically (`numeric`) or lexicographically. Evaluated
    * by [[admitDir]] — shared by the driver walk and the distributed
    * checkpoint prune. */
  final case class HiddenVote(dirName: String, lo: Option[String],
                              hi: Option[String], numeric: Boolean)

  sealed trait Transform extends Serializable {
    /** Source (logical) column the transform derives from. */
    def src: String
    /** The derived partition-directory column name. */
    def dirName: String
    /** Canonical spec text — round-trips through the manifest. */
    def spec: String
    /** The derived value as a Column over the source column. */
    def derive(c: Column): Column
    /** Translate a raw-space bound pair on `src` (Catalyst literal
      * values, `dt` the source type) into a dir-value vote; None =
      * this transform cannot prune the predicate (fail open). */
    def voteFor(dt: DataType, lo: Option[Any], hi: Option[Any]): Option[HiddenVote]
  }

  final case class Days(src: String) extends Transform {
    val dirName = s"_days_$src"
    def spec = s"days($src)"
    def derive(c: Column): Column =
      // exact for |micros| < 2^53 (year ~2255); day boundaries are
      // exact multiples so the floor can never straddle one
      floor(unix_micros(c) / lit(MicrosPerDay.toDouble)).cast("long")
    def voteFor(dt: DataType, lo: Option[Any], hi: Option[Any]): Option[HiddenVote] =
      dt match {
        case TimestampType =>
          def d(v: Any) = Math.floorDiv(v.asInstanceOf[Long], MicrosPerDay)
          Some(HiddenVote(dirName, lo.map(d(_).toString), hi.map(d(_).toString),
            numeric = true))
        case _ => None
      }
  }

  /** `days` of a DATE column — the value IS the day ordinal. */
  final case class DaysOfDate(src: String) extends Transform {
    val dirName = s"_days_$src"
    def spec = s"days($src)"
    def derive(c: Column): Column = datediff(c, lit("1970-01-01").cast("date"))
    def voteFor(dt: DataType, lo: Option[Any], hi: Option[Any]): Option[HiddenVote] =
      dt match {
        case DateType =>
          Some(HiddenVote(dirName, lo.map(_.toString), hi.map(_.toString),
            numeric = true))
        case _ => None
      }
  }

  final case class Hours(src: String) extends Transform {
    val dirName = s"_hours_$src"
    def spec = s"hours($src)"
    def derive(c: Column): Column =
      floor(unix_micros(c) / lit(MicrosPerHour.toDouble)).cast("long")
    def voteFor(dt: DataType, lo: Option[Any], hi: Option[Any]): Option[HiddenVote] =
      dt match {
        case TimestampType =>
          def h(v: Any) = Math.floorDiv(v.asInstanceOf[Long], MicrosPerHour)
          Some(HiddenVote(dirName, lo.map(h(_).toString), hi.map(h(_).toString),
            numeric = true))
        case _ => None
      }
  }

  final case class Bucket(n: Int, src: String) extends Transform {
    val dirName = s"_bucket_$src"
    def spec = s"bucket($n, $src)"
    def derive(c: Column): Column = pmod(hash(c), lit(n))
    /** Equality only: a range of raw values scatters across buckets. */
    def voteFor(dt: DataType, lo: Option[Any], hi: Option[Any]): Option[HiddenVote] =
      (lo, hi) match {
        case (Some(a), Some(b)) if a == b =>
          // EXACTLY functions.hash: Murmur3, seed 42. The Literal
          // CONSTRUCTOR (not .create) — `a` is already the Catalyst
          // internal value (UTF8String / micros Long / days Int), and
          // .create's converter would reject e.g. a raw timestamp Long
          val h = org.apache.spark.sql.catalyst.expressions.Murmur3Hash(
            Seq(org.apache.spark.sql.catalyst.expressions.Literal(a, dt)),
            42).eval(null).asInstanceOf[Int]
          val b0 = ((h % n) + n) % n
          Some(HiddenVote(dirName, Some(b0.toString), Some(b0.toString),
            numeric = true))
        case _ => None
      }
  }

  final case class TruncateStr(n: Int, src: String) extends Transform {
    val dirName = s"_trunc_$src"
    def spec = s"truncate($n, $src)"
    def derive(c: Column): Column = substring(c, 1, n)
    /** Prefix truncation is monotone: s ≥ L ⇒ take(n)(s) ≥ take(n)(L). */
    def voteFor(dt: DataType, lo: Option[Any], hi: Option[Any]): Option[HiddenVote] = {
      def t(v: Any) = {
        val s = v match {
          case u: UTF8String => u.toString
          case other => other.toString
        }
        s.substring(0, math.min(n, s.length))
      }
      Some(HiddenVote(dirName, lo.map(t), hi.map(t), numeric = false))
    }
  }

  final case class TruncateInt(n: Int, src: String) extends Transform {
    val dirName = s"_trunc_$src"
    def spec = s"truncate($n, $src)"
    /** `v − pmod(v, n)`: floor-style truncation, monotone, exact for
      * negatives (pmod is non-negative). */
    def derive(c: Column): Column = (c - pmod(c, lit(n))).cast("long")
    def voteFor(dt: DataType, lo: Option[Any], hi: Option[Any]): Option[HiddenVote] = {
      def t(v: Any): String = {
        val l = v match {
          case i: java.lang.Integer => i.longValue
          case l: java.lang.Long => l.longValue
          case s: java.lang.Short => s.longValue
          case b: java.lang.Byte => b.longValue
          case other => return other.toString // unexpected: fail open upstream
        }
        (l - (((l % n) + n) % n)).toString
      }
      Some(HiddenVote(dirName, lo.map(t), hi.map(t), numeric = true))
    }
  }

  private val DaysRe = """days\(\s*([^)\s]+)\s*\)""".r
  private val HoursRe = """hours\(\s*([^)\s]+)\s*\)""".r
  private val BucketRe = """bucket\(\s*(\d+)\s*,\s*([^)\s]+)\s*\)""".r
  private val TruncRe = """truncate\(\s*(\d+)\s*,\s*([^)\s]+)\s*\)""".r

  /** Parse one spec against the table schema (the schema picks the
    * date-vs-timestamp and string-vs-integral variants and rejects
    * unsupported source types LOUDLY — at table creation, not at
    * query time). */
  def parse(spec: String, schema: StructType): Transform = {
    def typeOf(c: String): DataType = {
      require(schema.fieldNames.contains(c),
        s"hidden partition transform '$spec': column '$c' is not in the schema")
      schema(c).dataType
    }
    spec.trim match {
      case DaysRe(c) => typeOf(c) match {
        case TimestampType => Days(c)
        case DateType => DaysOfDate(c)
        case t => throw new IllegalArgumentException(
          s"days($c): needs a timestamp or date column, got $t")
      }
      case HoursRe(c) => typeOf(c) match {
        case TimestampType => Hours(c)
        case t => throw new IllegalArgumentException(
          s"hours($c): needs a timestamp column, got $t")
      }
      case BucketRe(n, c) =>
        require(n.toInt > 0, s"bucket($n, $c): bucket count must be positive")
        typeOf(c) // any hashable type
        Bucket(n.toInt, c)
      case TruncRe(n, c) =>
        require(n.toInt > 0, s"truncate($n, $c): width must be positive")
        typeOf(c) match {
          case StringType => TruncateStr(n.toInt, c)
          case ByteType | ShortType | IntegerType | LongType => TruncateInt(n.toInt, c)
          case t => throw new IllegalArgumentException(
            s"truncate($n, $c): needs a string or integral column, got $t")
        }
      case other => throw new IllegalArgumentException(
        s"unsupported hidden partition transform '$other' — supported: " +
          "days(c), hours(c), bucket(n, c), truncate(n, c)")
    }
  }

  def parseAll(specs: Seq[String], schema: StructType): Seq[Transform] =
    specs.map(parse(_, schema))

  /** Does a partition dir admit every vote? The dir spells
    * `name=value[/...]`; a missing segment, the null-partition
    * sentinel, or an unparsable value keeps the dir — hidden pruning
    * is an optimization, never a filter (the raw predicate still runs
    * on the scan). Shared by the driver walk and the distributed
    * checkpoint prune. */
  def admitDir(dir: String, votes: Seq[HiddenVote]): Boolean = {
    if (votes.isEmpty) return true
    val segs = dir.split('/').filter(_.nonEmpty).flatMap { seg =>
      val i = seg.indexOf('=')
      if (i <= 0) None else Some(seg.substring(0, i) -> seg.substring(i + 1))
    }.toMap
    votes.forall { v =>
      segs.get(v.dirName) match {
        case None => true
        case Some("__HIVE_DEFAULT_PARTITION__") => true
        case Some(raw) =>
          if (v.numeric)
            scala.util.Try(raw.toLong).toOption match {
              case None => true
              case Some(x) =>
                v.lo.forall(l => x >= l.toLong) && v.hi.forall(h => x <= h.toLong)
            }
          else {
            // dir segments are PATH-ESCAPED (space → %20, ...); the
            // vote bounds are raw values — unescape before comparing
            // or an escapable char would reorder lexicographically and
            // mis-prune (lost rows, not just a missed optimization)
            val dec = org.apache.spark.sql.catalyst.catalog
              .ExternalCatalogUtils.unescapePathName(raw)
            v.lo.forall(dec >= _) && v.hi.forall(dec <= _)
          }
      }
    }
  }
}
