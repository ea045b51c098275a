package graft

import org.apache.spark.sql.types.DecimalType

/** Decimal arithmetic result-type conformance vs the reference's rules
  * (analysis/TypesUtil.java:getDecimalArithmeticResultType, 160-196).
  *
  * Verified identical (property-tested below, pre-38-cap):
  *  - ADD/SUBTRACT: precision = max(s1,s2) + max(p1-s1,p2-s2) + 1,
  *    scale = max(s1,s2)   (TypesUtil.java:171-174)
  *  - MOD: precision = min(p1-s1,p2-s2) + max(s1,s2), scale = max(s1,s2)
  *    (TypesUtil.java:190-192)
  *
  * Documented divergences (asserted, so a Spark behavior change trips):
  *  - MULTIPLY: reference uses p1+p2 ("does not need +1",
  *    TypesUtil.java:154-156); Spark uses p1+p2+1.
  *  - DIVIDE: reference min result scale is 4
  *    (DECIMAL_DIVISION_SCALE_INCREMENT, TypesUtil.java:176-188); Spark's
  *    is 6. Same formula otherwise: scale = max(min, s1+p2+1),
  *    precision = p1-s1+s2+scale.
  */
class DecimalConformanceSpec extends EngineSuite {

  private def resultType(p1: Int, s1: Int, p2: Int, s2: Int, op: String): DecimalType =
    spark.sql(
      s"SELECT CAST(1 AS DECIMAL($p1,$s1)) $op CAST(1 AS DECIMAL($p2,$s2)) AS r")
      .schema("r").dataType.asInstanceOf[DecimalType]

  /** deterministic (p, s) grid, pre-38-cap territory */
  private val grid: Seq[(Int, Int)] =
    for {
      p <- Seq(1, 2, 5, 9, 10, 18)
      s <- Seq(0, 1, p / 2, p).distinct
    } yield (p, s)

  test("ADD/SUBTRACT result types match the reference formula") {
    for (((p1, s1), (p2, s2)) <- grid.flatMap(a => grid.map(b => (a, b)))) {
      val want = DecimalType(
        math.max(s1, s2) + math.max(p1 - s1, p2 - s2) + 1, math.max(s1, s2))
      assert(resultType(p1, s1, p2, s2, "+") == want, s"add ($p1,$s1)+($p2,$s2)")
      assert(resultType(p1, s1, p2, s2, "-") == want, s"sub ($p1,$s1)-($p2,$s2)")
    }
  }

  test("MOD result types match the reference formula") {
    for (((p1, s1), (p2, s2)) <- grid.flatMap(a => grid.map(b => (a, b)))) {
      val want = DecimalType(
        math.min(p1 - s1, p2 - s2) + math.max(s1, s2), math.max(s1, s2))
      assert(resultType(p1, s1, p2, s2, "%") == want, s"mod ($p1,$s1)%($p2,$s2)")
    }
  }

  test("MULTIPLY: Spark's p1+p2+1 vs reference p1+p2 (documented divergence)") {
    assert(resultType(10, 2, 6, 3, "*") == DecimalType(17, 5)) // ref: (16,5)
  }

  test("DIVIDE: Spark min scale 6 vs reference 4 (documented divergence)") {
    // s1 + p2 + 1 = 0 + 2 + 1 = 3 → clamps to engine minimum
    assert(resultType(4, 0, 2, 0, "/") == DecimalType(10, 6)) // ref: (8,4)
  }

  test("38-precision cap: results clamp like the reference's MAX_PRECISION handling") {
    // both engines cap at 38 (ScalarType.MAX_PRECISION); Spark's
    // allowPrecisionLoss keeps at least 6 fractional digits — pin it so a
    // conf or version change is caught
    assert(resultType(38, 10, 38, 10, "+") == DecimalType(38, 9))
    assert(resultType(30, 10, 30, 10, "*") == DecimalType(38, 6))
  }

  test("assignment-compatible (union) type matches getDecimalAssignmentCompatibleType") {
    // digitsBefore+digitsAfter rule (TypesUtil.java:74-92)
    val t = spark.sql(
      """SELECT r FROM (
        |  SELECT CAST(1 AS DECIMAL(10,5)) AS r
        |  UNION ALL SELECT CAST(1 AS DECIMAL(12,3)) AS r) t""".stripMargin)
      .schema("r").dataType
    assert(t == DecimalType(14, 5))
  }
}
