package graft

/** Implicit-cast (assignment-compatibility) conformance vs the
  * reference's type matrix (`catalog/Type.java:605-770`,
  * compatibilityMatrix) over the FIXTURES.md §B.1 alltypes column set.
  *
  * The probe is the UNION result type: the reference defines the matrix
  * as the "smallest" type a slot of either input type can be assigned
  * to, which is exactly what a UNION operand pair resolves to.
  *
  * Verified identical (the whole numeric widening lattice):
  *  - TINYINT/SMALLINT/INT/BIGINT pairs → the wider integer
  *  - every integer + FLOAT → FLOAT (the reference keeps INT+FLOAT and
  *    BIGINT+FLOAT at FLOAT in the non-strict matrix, Type.java:700-713,
  *    and so does Spark's precedence list)
  *  - every integer + DOUBLE → DOUBLE; FLOAT + DOUBLE → DOUBLE
  *  - DATE + TIMESTAMP → TIMESTAMP (Type.java:745-746)
  *
  * Documented divergences (asserted, so a Spark behavior change trips):
  *  - BOOLEAN + numeric: the reference widens (BOOLEAN is its smallest
  *    numeric, Type.java:644-649); Spark refuses the implicit cast.
  *  - numeric + STRING: INVALID in the reference (Type.java:670+);
  *    Spark (non-ANSI) resolves the union to STRING.
  *  - TIMESTAMP + STRING: TIMESTAMP in the reference ("we can convert
  *    some but not all string values", Type.java:760-762); Spark
  *    resolves the union to STRING (it casts string→timestamp only in
  *    comparisons, not assignments).
  */
class TypeCompatibilitySpec extends EngineSuite {

  /** alltypes (FIXTURES.md §B.1) as a one-row view of typed columns. */
  private def alltypes(): Unit =
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW g_alltypes AS SELECT
        |  CAST(1 AS INT) AS id, CAST(true AS BOOLEAN) AS bool_col,
        |  CAST(1 AS TINYINT) AS tinyint_col, CAST(1 AS SMALLINT) AS smallint_col,
        |  CAST(1 AS INT) AS int_col, CAST(1 AS BIGINT) AS bigint_col,
        |  CAST(1.5 AS FLOAT) AS float_col, CAST(1.5 AS DOUBLE) AS double_col,
        |  '2024-05-05' AS date_string_col, 'abc' AS string_col,
        |  TIMESTAMP '2024-05-05 12:00:00' AS timestamp_col,
        |  DATE '2024-05-05' AS date_col""".stripMargin)

  private def unionType(a: String, b: String): String = {
    alltypes()
    spark.sql(
      s"SELECT $a AS c FROM g_alltypes UNION ALL SELECT $b FROM g_alltypes")
      .schema("c").dataType.simpleString
  }

  test("integer lattice matches the reference matrix") {
    assert(unionType("tinyint_col", "smallint_col") == "smallint")
    assert(unionType("tinyint_col", "int_col") == "int")
    assert(unionType("tinyint_col", "bigint_col") == "bigint")
    assert(unionType("smallint_col", "int_col") == "int")
    assert(unionType("smallint_col", "bigint_col") == "bigint")
    assert(unionType("int_col", "bigint_col") == "bigint")
  }

  test("integer × floating pairs match the reference matrix (incl. the FLOAT rows)") {
    assert(unionType("tinyint_col", "float_col") == "float")
    assert(unionType("smallint_col", "float_col") == "float")
    // the reference's deliberate non-strict choices (Type.java:700-713)
    assert(unionType("int_col", "float_col") == "float")
    assert(unionType("bigint_col", "float_col") == "float")
    assert(unionType("tinyint_col", "double_col") == "double")
    assert(unionType("int_col", "double_col") == "double")
    assert(unionType("bigint_col", "double_col") == "double")
    assert(unionType("float_col", "double_col") == "double")
  }

  test("DATE + TIMESTAMP widens to TIMESTAMP") {
    assert(unionType("date_col", "timestamp_col") == "timestamp")
  }

  test("BOOLEAN + numeric: reference widens, Spark rejects (documented divergence)") {
    alltypes()
    val e = intercept[Exception](spark.sql(
      "SELECT bool_col AS c FROM g_alltypes UNION ALL SELECT int_col FROM g_alltypes")
      .schema)
    assert(e.getMessage.contains("INCOMPATIBLE_COLUMN_TYPE"), e.getMessage.take(200))
  }

  test("numeric/timestamp + STRING: reference INVALID/TIMESTAMP, Spark resolves to STRING (documented divergence)") {
    assert(unionType("int_col", "string_col") == "string")
    assert(unionType("double_col", "string_col") == "string")
    assert(unionType("timestamp_col", "string_col") == "string")
  }

  test("comparison coercion: INT < FLOAT compares as the reference plans it (no silent DOUBLE)") {
    alltypes()
    // the reference's comment calls out MySQL's compare-as-DOUBLE as the
    // behavior it rejects; both engines compare INT vs FLOAT at FLOAT
    val top = spark.sql(
      "SELECT int_col < float_col AS c FROM g_alltypes")
      .queryExecution.analyzed.toString.linesIterator.next()
    assert(top.contains("as float) <") && !top.contains("as double"), top)
  }
}
