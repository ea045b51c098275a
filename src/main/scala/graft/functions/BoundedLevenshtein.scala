package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Banded Levenshtein kernel, codegen-callable (static forwarder). */
object BoundedLevenshteinUtil {

  /** Exact edit distance when ≤ k, else k+1 — the verification kernel an
    * entity-resolution pipeline wants: O((2k+1)·n) time and O(m) space
    * versus the full O(n·m) DP, with an early exit the moment the whole
    * band exceeds k (for k=1 on 100-char strings that is ~30× less work,
    * and the candidate verifier is the hot loop of a blocked ER join).
    * Clamping to k+1 keeps the function total and SARGable: `bounded ≤ k`
    * ⇔ `levenshtein ≤ k` exactly.
    *
    * Distances are measured over Unicode CODE POINTS, not UTF-16 code
    * units, matching Spark's built-in `levenshtein`
    * (`UTF8String.levenshteinDistance` iterates code points): for
    * supplementary-plane input like emoji, one character is one edit, not
    * two. The always-on strength-reduction rewrite depends on this parity. */
  def dist(a: UTF8String, b: UTF8String, k: Int): Int = {
    val s = a.toString.codePoints().toArray
    val t = b.toString.codePoints().toArray
    val n = s.length
    val m = t.length
    if (math.abs(n - m) > k) return k + 1
    val inf = k + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    java.util.Arrays.fill(prev, inf)
    var j = 0
    while (j <= math.min(m, k)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      var best = inf
      if (i <= k) { cur(0) = i; best = i }
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      var jj = lo
      while (jj <= hi) {
        val cost = if (s(i - 1) == t(jj - 1)) 0 else 1
        var v = prev(jj - 1) + cost
        val del = prev(jj) + 1
        val ins = cur(jj - 1) + 1
        if (del < v) v = del
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(jj) = v
        if (v < best) best = v
        jj += 1
      }
      if (best > k) return inf // whole band over budget: cannot recover
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    if (prev(m) > inf) inf else prev(m)
  }
}

/** `levenshtein_bounded(a, b, k)` — edit distance clamped at k+1 via a
  * banded DP with early exit; whole-stage-codegen friendly through the
  * static kernel. Equivalent to `LEAST(levenshtein(a, b), k+1)` (parity
  * spec-pinned), but O(k·n) instead of O(n·m) — the difference between a
  * cheap verifier and the hot loop dominating a blocked ER join at
  * 100 TB. */
case class BoundedLevenshtein(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    BoundedLevenshteinUtil.dist(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.BoundedLevenshteinUtil.dist($a, $b, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedLevenshtein =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "levenshtein_bounded"
}
