package graft.ops

import java.time.ZoneId

import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.unsafe.types.UTF8String

/** Wall-clock instant parsing for the timestamp-addressed doors
  * (`timestampAsOf`, `startingTimestamp`/`endingTimestamp`,
  * `graft_changes_since`).
  *
  * Every door historically took epoch-millis integers only; users write
  * instants as timestamps. This accepts BOTH on every door:
  *
  *  - an integer string → epoch millis, exactly as before;
  *  - anything else → Spark's own timestamp-string grammar
  *    ([[DateTimeUtils.stringToTimestamp]]: `2026-08-16`,
  *    `2026-08-16 12:00:00.123`, ISO `T` forms, trailing zone offsets /
  *    `Z`), zoneless forms interpreted in the session timezone —
  *    identical to what `CAST(s AS TIMESTAMP)` would produce.
  *
  * Sub-millisecond precision rounds CONSERVATIVELY for the door's
  * reading: a start bound ("at or after T") rounds up, an end bound
  * ("at or before T") rounds down — commit instants are millisecond
  * grained, and rounding toward the bound would silently widen the
  * range.
  */
object GraftInstants {

  private val IntLiteral = """[+-]?\d+""".r

  private def sessionZone: ZoneId =
    ZoneId.of(SQLConf.get.sessionLocalTimeZone)

  /** Parse an option/argument string as epoch millis. `ceil` picks the
    * rounding of sub-millisecond digits: true for start bounds
    * (at-or-after), false for end bounds (at-or-before). */
  def parseMillis(s: String, what: String, ceil: Boolean): Long = {
    val t = s.trim
    t match {
      case IntLiteral() => t.toLong
      case _ =>
        val micros = DateTimeUtils
          .stringToTimestamp(UTF8String.fromString(t), sessionZone)
          .getOrElse(throw new IllegalArgumentException(
            s"$what must be epoch millis or a timestamp string " +
              s"(e.g. '2026-08-16 12:00:00' or ISO-8601), got: '$s'"))
        microsToMillis(micros, ceil)
    }
  }

  /** Micros → millis with the door-appropriate rounding. */
  def microsToMillis(micros: Long, ceil: Boolean): Long =
    if (ceil) Math.floorDiv(micros + 999L, 1000L)
    else Math.floorDiv(micros, 1000L)
}
