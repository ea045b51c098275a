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

  test("parquet schema evolution: mergeSchema unifies old and new file generations") {
    // a long-lived ingestion directory accumulates files written under
    // successive schemas (the reference handles this via ALTER TABLE ADD
    // COLUMNS + per-file footer schemas); Spark's mergeSchema read must
    // surface the union schema with NULLs for columns absent in older
    // files
    val s = spark
    import s.implicits._
    val dir = s"/tmp/graft_schema_evo_${System.nanoTime()}"
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.parquet(s"$dir/gen=1")
    Seq((3L, "c", 9.5), (4L, "d", 7.5)).toDF("id", "name", "score")
      .write.parquet(s"$dir/gen=2")
    // the old generation genuinely lacks the column (what makes the
    // NULL-fill assertion below meaningful)
    assert(s.read.parquet(s"$dir/gen=1").columns.sorted.toSeq == Seq("id", "name"))
    val merged = s.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("gen", "id", "name", "score"))
    val rows = merged.orderBy("id").collect()
    assert(rows.length == 4)
    assert(rows.take(2).forall(_.isNullAt(rows.head.fieldIndex("score"))),
      "old-generation rows must read NULL for the added column")
    assert(rows.drop(2).map(_.getAs[Double]("score")).sorted.toSeq == Seq(7.5, 9.5))
    // evolved column is still filterable (pushdown over the union schema)
    assert(merged.filter(org.apache.spark.sql.functions.col("score") > 8).count() == 1)
  }
}
