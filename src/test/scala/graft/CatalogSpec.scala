package graft

/** Catalog/metadata statement surface — SHOW FUNCTIONS / DESCRIBE /
  * TRUNCATE / REFRESH (service/MetadataOp.java:53-645,
  * TruncateStmt/ResetMetadataStmt). */
class CatalogSpec extends EngineSuite {

  test("SHOW FUNCTIONS lists the engine's registered surface") {
    graft.engine.GraftSession.attach(spark)
    val fns = spark.sql("SHOW FUNCTIONS").collect().map(_.getString(0)).toSet
    Seq("fnv_hash", "murmur_hash", "group_concat", "distinctpc", "ndv",
      "zeroifnull", "decode", "minhash64", "vec_cosine")
      .foreach(f => assert(fns.contains(f), s"missing $f"))
  }

  test("DESCRIBE shows the schema of a registered table") {
    QuerySpec.prepared(spark, sfDir)
    val cols = spark.sql("DESCRIBE nation").collect().map(_.getString(0)).toSet
    assert(Set("n_nationkey", "n_name", "n_regionkey").subsetOf(cols))
  }

  test("LOAD DATA analogue: move files into a table location + refresh") {
    val s = spark
    QuerySpec.prepared(s, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_load").toFile
    try {
      s.table("region").limit(3).write.mode("overwrite").parquet(dir.getPath)
      val t = s.read.parquet(dir.getPath)
      t.createOrReplaceTempView("loaded_t")
      assert(s.table("loaded_t").count() == 3)
      // LOAD DATA INPATH = drop new files into the location, then refresh
      s.table("region").write.mode("append").parquet(dir.getPath)
      s.catalog.refreshByPath(dir.getPath)
      assert(s.read.parquet(dir.getPath).count() == 8)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }

  test("TRUNCATE TABLE empties a managed table; REFRESH re-reads it") {
    val s = spark
    QuerySpec.prepared(s, sfDir)
    s.sql("DROP TABLE IF EXISTS graft_trunc_t")
    s.table("region").write.saveAsTable("graft_trunc_t")
    assert(s.table("graft_trunc_t").count() == 5)
    s.sql("TRUNCATE TABLE graft_trunc_t")
    assert(s.table("graft_trunc_t").count() == 0)
    s.sql("REFRESH TABLE graft_trunc_t") // ResetMetadataStmt analogue
    assert(s.table("graft_trunc_t").count() == 0)
    s.sql("DROP TABLE IF EXISTS graft_trunc_t")
  }
}
