package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

object LongPairsUtil {
  /** Length-ORDERED pair expansion over PACKED ids (`(m << 40) | id`,
    * m = the record's token-set size < 2²³, id < 2⁴⁰): emits only pairs
    * whose sizes satisfy the Jaccard length lemma
    * `tE6 · max(mᵢ, mⱼ) ≤ 1e6 · min(mᵢ, mⱼ)` — the AllPairs
    * length-ordering optimization (Bayardo, Ma & Srikant WWW'07 §3.1).
    * Each block is SORTED by packed value (= by m, then id) and scanned
    * with a sliding window, so length-INCOMPATIBLE pairs are never even
    * touched: per element the inner loop starts at the first compatible
    * size and stops at the last, making block cost O(k·log k + emitted)
    * instead of k². Same (min, max) pair convention and diagonal
    * semantics as [[pairs]]; with tE6 = 0 the emitted set equals
    * [[pairs]] exactly (spec-pinned). */
  def pairsLen(ls: ArrayData, rs: ArrayData, same: Boolean, tE6: Long): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    def emit(x: Long, y: Long): Unit = {
      val row = new GenericInternalRow(2)
      row.setLong(0, math.min(x, y))
      row.setLong(1, math.max(x, y))
      out += row
    }
    val l = ls.toLongArray()
    java.util.Arrays.sort(l)
    if (same) {
      var i = 0
      while (i < l.length) {
        val x = l(i)
        val mx = x >>> 40
        var j = i + 1
        var go = true
        while (go && j < l.length) {
          val y = l(j)
          // sorted ⇒ my ≥ mx, so only the upper bound can break
          if ((y >>> 40) * tE6 > mx * 1000000L) go = false
          else {
            if (x != y) emit(x, y)
            j += 1
          }
        }
        i += 1
      }
    } else {
      val r = rs.toLongArray()
      java.util.Arrays.sort(r)
      var i = 0
      var lo = 0 // monotone window start: l is sorted by m too
      while (i < l.length) {
        val x = l(i)
        val mx = x >>> 40
        while (lo < r.length && (r(lo) >>> 40) * 1000000L < mx * tE6) lo += 1
        var j = lo
        var go = true
        while (go && j < r.length) {
          val y = r(j)
          if ((y >>> 40) * tE6 > mx * 1000000L) go = false
          else {
            if (x != y) emit(x, y)
            j += 1
          }
        }
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Cross-pair expansion of one bounded block in a compiled loop
    * (graft.llmops.Dedup.boundedPairs): emits (min id, max id) for every
    * (x, y) ∈ ls × rs. `same` marks a diagonal sub-block (ls == rs):
    * there only x < y is emitted, so each unordered pair appears exactly
    * once instead of twice-then-filtered. Replaces an interpreted
    * `flatten(transform(ls, x -> transform(rs, …)))` that allocated k²
    * structs per block through per-element lambda calls. */
  def pairs(ls: ArrayData, rs: ArrayData, same: Boolean): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    val nl = ls.numElements()
    val nr = rs.numElements()
    var i = 0
    while (i < nl) {
      val x = ls.getLong(i)
      var j = 0
      while (j < nr) {
        val y = rs.getLong(j)
        if (if (same) x < y else x != y) {
          val row = new GenericInternalRow(2)
          row.setLong(0, math.min(x, y))
          row.setLong(1, math.max(x, y))
          out += row
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `long_pairs(array<bigint>, array<bigint>, boolean)` →
  * array<struct<a bigint, b bigint>> — bounded-block id-pair expansion
  * for the dedup candidate stages; explode the result. */
case class LongPairs(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), BooleanType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"long_pairs expects (array<bigint>, array<bigint>, boolean), got $other")
    }

  override def nullSafeEval(ls: Any, rs: Any, same: Any): Any =
    LongPairsUtil.pairs(ls.asInstanceOf[ArrayData], rs.asInstanceOf[ArrayData],
      same.asInstanceOf[Boolean])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ls, rs, sm) => s"graft.functions.LongPairsUtil.pairs($ls, $rs, $sm)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): LongPairs =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "long_pairs"
}

/** `long_pairs_len(array<bigint>, array<bigint>, boolean, bigint)` →
  * array<struct<a bigint, b bigint>> — [[LongPairs]] over PACKED
  * `(m << 40) | id` values with the Jaccard length filter applied
  * DURING generation ([[LongPairsUtil.pairsLen]]): sorted blocks +
  * sliding window, never touching length-incompatible pairs. */
case class LongPairsLen(first: Expression, second: Expression,
                        third: Expression, fourth: Expression)
  extends QuaternaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), BooleanType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"long_pairs_len expects (array<bigint>, array<bigint>, boolean, bigint), got $other")
    }

  override def nullSafeEval(ls: Any, rs: Any, same: Any, tE6: Any): Any =
    LongPairsUtil.pairsLen(ls.asInstanceOf[ArrayData], rs.asInstanceOf[ArrayData],
      same.asInstanceOf[Boolean], tE6.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ls, rs, sm, t) =>
      s"graft.functions.LongPairsUtil.pairsLen($ls, $rs, $sm, $t)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): LongPairsLen =
    copy(first = f, second = s, third = t, fourth = q)
  override def prettyName: String = "long_pairs_len"
}
