package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal, RuntimeReplaceable, TruncDate, TruncTimestamp}
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Impala-style `trunc(ts_or_date, 'UNIT')`.
  *
  * Impala registers trunc over TIMESTAMP with Oracle-style unit spellings
  * (SYYYY/YYYY/Q/MM/DDD/DAY/HH/MI, …; catalog/BuiltinsDb.java registers the
  * generated ScalarBuiltins surface) and raises on unknown units. Spark's
  * builtin `trunc(date, fmt)` returns DATE. One name must serve both, so
  * this expression resolves the child first, then rewrites itself:
  *
  *  - DATE child → Spark's [[TruncDate]] (still returns DATE; sub-day units
  *    are rejected — the reference doesn't support the DATE type at all,
  *    Type.java:92-110, so Spark-compatible behavior wins here);
  *  - otherwise → [[TruncTimestamp]] with the Impala unit mapped to Spark's.
  *
  * Unknown units throw at planning time, matching Impala's error behavior
  * rather than Spark's NULL-for-bad-format.
  */
case class ImpalaTrunc(ts: Expression, fmt: Expression) extends RuntimeReplaceable {

  private def unit: String = fmt match {
    case Literal(u: UTF8String, _) =>
      ImpalaFunctions.truncUnits.getOrElse(
        u.toString.toUpperCase,
        throw new IllegalArgumentException(s"trunc: unsupported unit '$u'"))
    case _ =>
      throw new IllegalArgumentException("trunc: unit must be a string literal")
  }

  // def, not lazy val: the analyzer may consult replacement while `ts` is
  // still an UnresolvedAttribute; caching that state would pin an
  // unresolved replacement forever.
  override def replacement: Expression = {
    // The replacement is expanded after analysis, so neither the
    // analyzer's ResolveTimeZone nor its implicit type coercion will touch
    // it — set the session zone and insert NTZ↔LTZ casts explicitly (the
    // session runs in UTC, making the round-trip lossless; Impala
    // TIMESTAMP is timezone-less, SURVEY §1.2).
    val tz = Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    ts.dataType match {
      case DateType =>
        if (Set("hour", "minute", "second", "millisecond", "microsecond")(unit))
          throw new IllegalArgumentException(s"trunc: unit '$unit' not valid for DATE input")
        // day-level truncation of a DATE is the identity — Spark's
        // TruncDate would silently return NULL for units below week
        else if (unit == "day") ts
        else TruncDate(ts, Literal(unit))
      case TimestampNTZType =>
        Cast(TruncTimestamp(Literal(unit), Cast(ts, TimestampType, tz), tz),
          TimestampNTZType, tz)
      case _ => TruncTimestamp(Literal(unit), ts, tz)
    }
  }

  override def children: Seq[Expression] = Seq(ts, fmt)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ImpalaTrunc =
    copy(ts = c(0), fmt = c(1))
  override def prettyName: String = "trunc"
}
