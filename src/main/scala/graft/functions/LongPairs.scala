package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

object LongPairsUtil {
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
