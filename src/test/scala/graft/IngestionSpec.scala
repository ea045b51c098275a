package graft

import org.apache.spark.sql.types._

/** Ingestion robustness — a 100 TB corpus always contains malformed
  * records; the engine must quarantine rather than abort (PERMISSIVE
  * mode + _corrupt_record), with FAILFAST available when strictness is
  * wanted. */
class IngestionSpec extends EngineSuite {

  private val goodAndBad = Seq(
    """{"id": 1, "text": "ok"}""",
    """{"id": 2, "text": "also ok"}""",
    """{"id": oops not json""",
    """{"id": 3, "text": "fine"}""")

  test("PERMISSIVE JSON ingestion quarantines corrupt records") {
    val s = spark
    import s.implicits._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType),
      StructField("_corrupt_record", StringType)))
    val df = s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(goodAndBad.toDS()).cache()
    assert(df.filter("_corrupt_record IS NULL").count() == 3)
    assert(df.filter("_corrupt_record IS NOT NULL").count() == 1)
    df.unpersist()
  }

  test("FAILFAST JSON ingestion aborts on the corrupt record") {
    val s = spark
    import s.implicits._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val e = intercept[Exception] {
      s.read.schema(schema).option("mode", "FAILFAST")
        .json(goodAndBad.toDS()).collect()
    }
    assert(e.getMessage.toLowerCase.contains("malformed") ||
      e.getCause != null)
  }
}
