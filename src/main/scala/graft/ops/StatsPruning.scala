package graft.ops

import org.apache.spark.sql.sources._

import graft.ops.MergeTable.{ColStat, DataFileEntry}

/** File-skipping over manifest statistics: evaluates standard data-source
  * [[org.apache.spark.sql.sources.Filter]] predicates against each file's
  * per-column `[min,max]` box and null counts
  * ([[MergeTable.DataFileEntry]]), keeping exactly the files that COULD
  * hold a matching row.
  *
  * The contract is the usual skipping one — conservative in one
  * direction only:
  *
  *  - `canMatch == false` is a PROOF: no visible row of the file can
  *    satisfy the predicate (min/max bounds are inclusive over all
  *    physical rows, so they bound any deletion-vector-visible subset
  *    too).
  *  - `canMatch == true` means "unknown or possible" — absent stats
  *    (legacy entries, beyond-cap columns, all-NaN files, unsupported
  *    types), un-translatable literals, and un-analyzable filter shapes
  *    all land here. The engine re-evaluates every filter row-wise after
  *    the scan, so keeping too much is a cost, never a wrong answer.
  *
  * Reference behavior (`brian-burrows/trail-condition-etl`): the
  * fetch-window endpoints (`redis_store.py:21-35`) answer range lookups
  * by key bounds; this is the same bounds-first shape applied at the
  * file-listing tier, where at 100 TB it is the difference between
  * reading a handful of parquet files and reading all of them.
  */
object StatsPruning {

  /** Files of `files` whose stats cannot REFUTE every filter — the
    * conjunction semantics of a pushed filter array. `resolve` maps a
    * predicate's LOGICAL column name to the PHYSICAL name stats are
    * keyed by (column mapping); identity for unmapped tables. */
  def prune(files: Seq[DataFileEntry], filters: Seq[Filter],
      resolve: String => String = identity): Seq[DataFileEntry] =
    if (filters.isEmpty) files
    else files.filter(f => filters.forall(canMatch(f, _, resolve)))

  /** Whether this filter SHAPE can ever contribute to skipping — what a
    * scan reports as its pushed (stats-consulted) filters. A `true` here
    * does not promise pruning on every file (stats may be absent); it
    * promises the shape is consulted. */
  def prunable(filter: Filter): Boolean = filter match {
    case _: EqualTo | _: EqualNullSafe | _: GreaterThan |
        _: GreaterThanOrEqual | _: LessThan | _: LessThanOrEqual |
        _: In | _: IsNull | _: IsNotNull | _: StringStartsWith => true
    case And(l, r) => prunable(l) || prunable(r)
    case Or(l, r) => prunable(l) && prunable(r)
    case _ => false
  }

  /** Is file-level [[canMatch]] ROW-exact for this filter, given that
    * every referenced column is POINT-FILED (one non-null value per
    * file, no DVs — [[MergeTable.isPointFor]])? On point files every row
    * of a file shares each leaf's verdict, so file-level boolean algebra
    * equals row-level — PROVIDED each leaf actually decides: a null
    * literal, an inconvertible literal, an empty IN list, or an
    * unhandled shape keeps the file conservatively and is NOT exact.
    * A filter passing this check may be CLAIMED by the scan (returned as
    * fully handled from pushFilters): pruning alone keeps exactly the
    * matching rows, which also makes metadata aggregate answers over the
    * pruned file set exact. */
  def rowExactOnPoints(filter: Filter, pointCol: String => Boolean,
      tagOf: String => Option[String]): Boolean = {
    def conv(a: String, v: Any): Boolean =
      v != null && pointCol(a) &&
        tagOf(a).exists(t => toStatValue(t, v).nonEmpty)
    filter match {
      case EqualTo(a, v) => conv(a, v)
      case EqualNullSafe(a, v) => if (v == null) pointCol(a) else conv(a, v)
      case GreaterThan(a, v) => conv(a, v)
      case GreaterThanOrEqual(a, v) => conv(a, v)
      case LessThan(a, v) => conv(a, v)
      case LessThanOrEqual(a, v) => conv(a, v)
      case In(a, vs) => vs != null && vs.nonEmpty && vs.forall(conv(a, _))
      case IsNull(a) => pointCol(a)
      case IsNotNull(a) => pointCol(a)
      case StringStartsWith(a, p) =>
        p != null && pointCol(a) && tagOf(a).contains("string")
      case And(l, r) => rowExactOnPoints(l, pointCol, tagOf) &&
        rowExactOnPoints(r, pointCol, tagOf)
      case Or(l, r) => rowExactOnPoints(l, pointCol, tagOf) &&
        rowExactOnPoints(r, pointCol, tagOf)
      case _ => false
    }
  }

  /** Can any visible row of `f` satisfy `filter`? (false = provably no) */
  def canMatch(f: DataFileEntry, filter: Filter,
      resolve: String => String = identity): Boolean = {
    def statOf(f: DataFileEntry, a: String): Option[ColStat] =
      statOfPhys(f, resolve(a))
    def statNulls(f: DataFileEntry, a: String): Option[Long] =
      statNullsPhys(f, resolve(a))
    def mayHoldNull(f: DataFileEntry, a: String): Boolean =
      statNulls(f, a) match {
        case Some(0L) => false
        case _ => true
      }
    def allNullRefutes(f: DataFileEntry, a: String): Boolean =
      statNulls(f, a) match {
        case Some(n) => n < f.numRows
        case None => true
      }
    def valuePossible(f: DataFileEntry, a: String, v: Any,
        test: String => String => String => String => Boolean): Boolean =
      statOf(f, a) match {
        case Some(cs) => toStatValue(cs.t, v) match {
          case Some(s) => test(cs.min)(cs.max)(s)(cs.t)
          case None => true
        }
        case None => allNullRefutes(f, a)
      }
    filter match {
    case EqualTo(a, v) => valuePossible(f, a, v, lo => hi => s => t =>
      leq(t, lo, s) && leq(t, s, hi))
    case EqualNullSafe(a, v) =>
      if (v == null) mayHoldNull(f, a)
      else valuePossible(f, a, v, lo => hi => s => t =>
        leq(t, lo, s) && leq(t, s, hi))
    case GreaterThan(a, v) => valuePossible(f, a, v, _ => hi => s => t =>
      leq(t, s, hi) && !leq(t, hi, s)) // hi > v
    case GreaterThanOrEqual(a, v) => valuePossible(f, a, v, _ => hi => s => t =>
      leq(t, s, hi))
    case LessThan(a, v) => valuePossible(f, a, v, lo => _ => s => t =>
      leq(t, lo, s) && !leq(t, s, lo)) // lo < v
    case LessThanOrEqual(a, v) => valuePossible(f, a, v, lo => _ => s => t =>
      leq(t, lo, s))
    case In(a, vs) =>
      if (vs == null || vs.isEmpty) true
      else if (vs.exists(_ == null)) true // null literal: stay conservative
      else vs.exists(v => valuePossible(f, a, v, lo => hi => s => t =>
        leq(t, lo, s) && leq(t, s, hi)))
    case IsNull(a) => mayHoldNull(f, a)
    case IsNotNull(a) =>
      // provably all-null (every physical row) → no visible non-null row
      statNulls(f, a) match {
        case Some(n) => n < f.numRows
        case None => true
      }
    case StringStartsWith(a, p) =>
      if (p == null) true
      else statOf(f, a) match {
        case Some(cs) if cs.t == "string" =>
          // strings with prefix p occupy [p, nextPrefix(p)) in UTF-8
          // byte order — overlap iff max ≥ p and (when bounded) min <
          // nextPrefix(p); all comparisons at the BYTE level (a string
          // round-trip of the incremented prefix would re-encode bytes
          // ≥ 0x80 and break the order)
          val pb = p.getBytes("UTF-8")
          bytesCmp(cs.max.getBytes("UTF-8"), pb) >= 0 &&
            nextPrefixBytes(pb).forall(np =>
              bytesCmp(cs.min.getBytes("UTF-8"), np) < 0)
        case Some(_) => true // non-string stat: shape mismatch, keep
        case None => allNullRefutes(f, a)
      }
    case And(l, r) => canMatch(f, l, resolve) && canMatch(f, r, resolve)
    case Or(l, r) => canMatch(f, l, resolve) || canMatch(f, r, resolve)
    case AlwaysFalse() => false
    case _ => true // Not, EndsWith, Contains, UDF-backed, future shapes
    }
  }

  /** Case-tolerant stat lookup by PHYSICAL name (Spark resolution is
    * case-insensitive by default; stats are keyed by the schema's exact
    * spelling). */
  private def statOfPhys(f: DataFileEntry, a: String): Option[ColStat] =
    f.stats.get(a).orElse {
      val lower = a.toLowerCase(java.util.Locale.ROOT)
      f.stats.collectFirst {
        case (k, v) if k.toLowerCase(java.util.Locale.ROOT) == lower => v
      }
    }

  private def statNullsPhys(f: DataFileEntry, a: String): Option[Long] =
    f.nullCounts.get(a).orElse {
      val lower = a.toLowerCase(java.util.Locale.ROOT)
      f.nullCounts.collectFirst {
        case (k, v) if k.toLowerCase(java.util.Locale.ROOT) == lower => v
      }
    }

  /** Predicate literal → canonical stat-domain string (the
    * [[MergeTable.ColStat]] rendering). None = not translatable into this
    * stat's domain (caller keeps the file). NaN is deliberately None:
    * stats files containing NaN carry no entry, and `c = NaN` against a
    * NaN-free box can't be refuted by [min,max] logic under Spark's
    * NaN-largest ordering without extra bookkeeping. */
  private def toStatValue(tag: String, v: Any): Option[String] = (tag, v) match {
    case (_, null) => None
    case ("long", n: java.lang.Number) => n match {
      case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
          _: java.lang.Long => Some(n.longValue.toString)
      case _ => None // fractional literal vs integral column: keep
    }
    case ("double", n: java.lang.Number) =>
      val d = n.doubleValue
      if (d.isNaN) None else Some(d.toString)
    case ("string", s: String) => Some(s)
    case ("timestamp", ts: java.sql.Timestamp) =>
      val i = ts.toInstant
      Some((i.getEpochSecond * 1000000L + i.getNano / 1000L).toString)
    case ("timestamp", i: java.time.Instant) =>
      Some((i.getEpochSecond * 1000000L + i.getNano / 1000L).toString)
    case ("date", d: java.sql.Date) => Some(d.toLocalDate.toEpochDay.toString)
    case ("date", d: java.time.LocalDate) => Some(d.toEpochDay.toString)
    case ("decimal", d: java.math.BigDecimal) => Some(d.toPlainString)
    case ("decimal", d: BigDecimal) => Some(d.underlying.toPlainString)
    case ("decimal", n: java.lang.Number) => // integral/double literal vs decimal column
      scala.util.Try(new java.math.BigDecimal(n.toString).toPlainString).toOption
    case _ => None
  }

  /** a ≤ b in the stat domain named by `t` (mirrors the manifest's
    * rendering: longs/micros/days compare numerically, doubles as
    * doubles, strings in UTF-8 byte order — the UTF8String order Spark
    * itself compares strings in). */
  private[graft] def leq(t: String, a: String, b: String): Boolean = t match {
    case "long" | "timestamp" | "date" => a.toLong <= b.toLong
    case "double" => a.toDouble <= b.toDouble
    case "string" => utf8Cmp(a, b) <= 0
    case "decimal" =>
      new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b)) <= 0
    case _ => true
  }

  private def utf8Cmp(a: String, b: String): Int =
    bytesCmp(a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  private def bytesCmp(x: Array[Byte], y: Array[Byte]): Int = {
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  /** Smallest byte string strictly greater than every string with prefix
    * `p` (UTF-8 byte order): increment the rightmost non-0xff byte and
    * truncate. None when p is all 0xff bytes — the prefix range is
    * right-unbounded. */
  private def nextPrefixBytes(p: Array[Byte]): Option[Array[Byte]] = {
    var i = p.length - 1
    while (i >= 0 && (p(i) & 0xff) == 0xff) i -= 1
    if (i < 0) None
    else {
      val out = java.util.Arrays.copyOf(p, i + 1)
      out(i) = (out(i) + 1).toByte
      Some(out)
    }
  }
}
