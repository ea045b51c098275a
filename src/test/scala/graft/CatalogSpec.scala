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

  test("CHAR/VARCHAR enforce their length limit on write; CHAR pads, VARCHAR keeps spaces") {
    // catalog/ScalarType.java:252-370 — fixed/var-length char semantics.
    // Value-level behavior is oracle-checked end-to-end by q156; this
    // pins the write-side rejection, which no oracle row can express.
    val s = spark
    QuerySpec.prepared(s, sfDir)
    s.sql("DROP TABLE IF EXISTS graft_char_t")
    s.sql("CREATE TABLE graft_char_t (c CHAR(3), v VARCHAR(3)) USING parquet")
    try {
      val ce = intercept[Exception](
        s.sql("INSERT INTO graft_char_t VALUES ('abcd', 'ab')").collect())
      assert(ce.getMessage.contains("EXCEED_LIMIT_LENGTH") ||
        ce.getMessage.toLowerCase.contains("length"), ce.getMessage.take(200))
      val ve = intercept[Exception](
        s.sql("INSERT INTO graft_char_t VALUES ('ab', 'abcd')").collect())
      assert(ve.getMessage.contains("EXCEED_LIMIT_LENGTH") ||
        ve.getMessage.toLowerCase.contains("length"), ve.getMessage.take(200))
      // exactly-at-limit and under-limit both write; CHAR reads padded
      s.sql("INSERT INTO graft_char_t VALUES ('abc', 'abc'), ('a', 'a ')")
      val rows = s.sql(
        "SELECT c, v, length(c) AS lc, length(v) AS lv FROM graft_char_t ORDER BY c")
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3)))
      assert(rows.toSeq == Seq(("a  ", "a ", 3, 2), ("abc", "abc", 3, 3)))
    } finally s.sql("DROP TABLE IF EXISTS graft_char_t")
  }

  test("CREATE TABLE LIKE PARQUET: schema inferred from a data file") {
    // CreateTableLikeFileStmt.java:1-372 — the reference infers a table
    // schema from a Parquet footer. Spark analogue: read the footer, use
    // the schema for an empty table.
    val s = spark
    val inferred = s.read.parquet(s"$sfDir/nation.parquet").schema
    s.sql("DROP TABLE IF EXISTS graft_like_parquet_t")
    s.catalog.createTable("graft_like_parquet_t", "parquet", inferred,
      Map.empty[String, String])
    try {
      val cols = s.table("graft_like_parquet_t").schema.fieldNames.toSeq
      assert(cols == Seq("n_nationkey", "n_name", "n_regionkey"))
      assert(s.table("graft_like_parquet_t").count() == 0)
    } finally s.sql("DROP TABLE IF EXISTS graft_like_parquet_t")
  }

  test("CREATE TABLE LIKE AVRO: Avro schema JSON converted to a table schema") {
    // util/AvroSchemaParser.java:1-214 + CreateTableLikeFileStmt.java —
    // schema-only frontend (no Avro data connector in this runtime):
    // primitives map per the reference table, union-with-null is the
    // nullability idiom and unwraps, array/map/record nest, bytes is a
    // decimal carrier, field docs become column comments.
    import org.apache.spark.sql.types._
    val s = spark
    val json =
      """{"type": "record", "name": "cust", "fields": [
        |  {"name": "id", "type": "long"},
        |  {"name": "name", "type": ["null", "string"], "doc": "display name"},
        |  {"name": "active", "type": "boolean"},
        |  {"name": "score", "type": ["float", "null"]},
        |  {"name": "tags", "type": {"type": "array", "items": "string"}},
        |  {"name": "attrs", "type": {"type": "map", "values": "int"}},
        |  {"name": "bal",
        |   "type": {"type": "bytes", "logicalType": "decimal", "precision": 12, "scale": 2}},
        |  {"name": "whole", "type": {"type": "bytes", "logicalType": "decimal", "precision": 9}},
        |  {"name": "addr", "type": {"type": "record", "name": "addr_t", "fields": [
        |    {"name": "city", "type": "string"}, {"name": "zip", "type": "int"}]}}
        |]}""".stripMargin
    val st = graft.sources.AvroSchemas.toStructType(json)
    assert(st("id").dataType == LongType)
    assert(st("name").dataType == StringType && st("name").nullable)
    assert(st("name").metadata.getString("comment") == "display name")
    assert(st("active").dataType == BooleanType)
    assert(st("score").dataType == FloatType)
    assert(st("tags").dataType == ArrayType(StringType))
    assert(st("attrs").dataType == MapType(StringType, IntegerType))
    assert(st("bal").dataType == DecimalType(12, 2))
    assert(st("whole").dataType == DecimalType(9, 0), "scale must default to 0")
    assert(st("addr").dataType ==
      StructType(Seq(StructField("city", StringType), StructField("zip", IntegerType))))
    // the DDL surface: an empty parquet-backed table with that schema
    s.sql("DROP TABLE IF EXISTS graft_like_avro_t")
    graft.sources.AvroSchemas.createTableLikeAvro(s, "graft_like_avro_t", json)
    try {
      assert(s.table("graft_like_avro_t").schema.fieldNames.toSeq == st.fieldNames.toSeq)
      assert(s.table("graft_like_avro_t").count() == 0)
    } finally s.sql("DROP TABLE IF EXISTS graft_like_avro_t")
  }

  test("CREATE TABLE LIKE AVRO: rejects what the reference rejects") {
    def rejects(json: String, needle: String): Unit = {
      val e = intercept[graft.sources.AvroSchemas.UnsupportedAvroTypeException](
        graft.sources.AvroSchemas.toStructType(json))
      assert(e.getMessage.contains(needle), s"got: ${e.getMessage}")
    }
    def field(t: String): String =
      s"""{"type": "record", "name": "r", "fields": [{"name": "c", "type": $t}]}"""
    // top level must be a record
    rejects("""{"type": "enum", "name": "e", "symbols": ["A"]}""",
      "must be of type RECORD")
    // enum / fixed / non-nullable union columns are unsupported
    rejects(field("""{"type": "enum", "name": "ce", "symbols": ["A", "B"]}"""),
      "Unsupported type 'enum' of column 'c'")
    rejects(field("""{"type": "fixed", "name": "cf", "size": 16}"""),
      "Unsupported type 'fixed' of column 'c'")
    rejects(field("""["int", "string"]"""), "Unsupported type 'union' of column 'c'")
    // a 3-branch union is NOT the nullability idiom, even with a null branch
    rejects(field("""["null", "int", "string"]"""), "Unsupported type 'union'")
    // bytes only carries decimals
    rejects(field("""{"type": "bytes"}"""), "logicalType for column 'c'")
    rejects(field("""{"type": "bytes", "logicalType": "uuid"}"""),
      "Unsupported logicalType: 'uuid'")
    rejects(field("""{"type": "bytes", "logicalType": "decimal", "scale": 2}"""),
      "No 'precision' property")
    rejects(
      field("""{"type": "bytes", "logicalType": "decimal", "precision": 9, "scale": -1}"""),
      "Invalid decimal 'scale'")
    // malformed schema JSON propagates Avro's own parse exception
    intercept[org.apache.avro.SchemaParseException](
      graft.sources.AvroSchemas.toStructType("{ not avro"))
  }

  test("Avro schema generation: columns render as the reference converter writes them") {
    // util/AvroSchemaConverter.java:52-209 — the direction the reference
    // runs when an Avro table is created without an explicit schema.
    import org.apache.spark.sql.types._
    val st = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType,
        metadata = new MetadataBuilder().putString("comment", "display name").build()),
      StructField("small", ShortType),
      StructField("seen", TimestampType),
      StructField("bal", DecimalType(12, 2)),
      StructField("tags", ArrayType(StringType)),
      StructField("attrs", MapType(IntegerType, DoubleType)),
      StructField("addr", StructType(Seq(
        StructField("city", StringType), StructField("zip", IntegerType))))))
    val json = graft.sources.AvroSchemas.toAvroSchema(st, "cust")
    val parsed = new org.apache.avro.Schema.Parser().parse(json)
    assert(parsed.getName == "cust")
    def colType(n: String): org.apache.avro.Schema = {
      val u = parsed.getField(n).schema()
      // every column is a [null, T] union, null first, as the reference writes
      assert(u.getType == org.apache.avro.Schema.Type.UNION &&
        u.getTypes.get(0).getType == org.apache.avro.Schema.Type.NULL, u.toString)
      u.getTypes.get(1)
    }
    assert(colType("id").getType == org.apache.avro.Schema.Type.LONG)
    assert(colType("name").getType == org.apache.avro.Schema.Type.STRING)
    assert(parsed.getField("name").doc() == "display name")
    assert(colType("small").getType == org.apache.avro.Schema.Type.INT,
      "smallint must widen to int")
    assert(colType("seen").getType == org.apache.avro.Schema.Type.STRING,
      "timestamp renders as string")
    val dec = colType("bal")
    assert(dec.getType == org.apache.avro.Schema.Type.BYTES &&
      dec.getObjectProp("logicalType") == "decimal" &&
      dec.getObjectProp("precision") == 12 && dec.getObjectProp("scale") == 2, dec.toString)
    // map keys are string by the Avro spec regardless of the declared key
    assert(colType("attrs").getType == org.apache.avro.Schema.Type.MAP)
    assert(colType("addr").getName == "record_0", "nested records are counter-named")
    // default name, and the reference's rejection phrasing
    assert(new org.apache.avro.Schema.Parser()
      .parse(graft.sources.AvroSchemas.toAvroSchema(StructType(Nil)))
      .getName == "baseRecord")
    val e = intercept[UnsupportedOperationException](
      graft.sources.AvroSchemas.toAvroSchema(StructType(Seq(StructField("d", DateType)))))
    assert(e.getMessage.contains("cannot be converted to an Avro type"), e.getMessage)
    // round trip through the parser half recovers the schema up to the
    // documented widenings (short→int, timestamp→string, string map keys)
    val back = graft.sources.AvroSchemas.toStructType(json)
    assert(back("id").dataType == LongType && back("bal").dataType == DecimalType(12, 2))
    assert(back("small").dataType == IntegerType && back("seen").dataType == StringType)
    assert(back("attrs").dataType == MapType(StringType, DoubleType))
    assert(back("addr").dataType ==
      StructType(Seq(StructField("city", StringType), StructField("zip", IntegerType))))
  }

  test("ALTER TABLE: add columns, set/unset tblproperties, rename") {
    // AlterTable*Stmt.java family (sql-parser.cup:1823-2240).
    val s = spark
    s.sql("DROP TABLE IF EXISTS graft_alter_t")
    s.sql("DROP TABLE IF EXISTS graft_alter_renamed")
    s.sql("CREATE TABLE graft_alter_t (id INT, name STRING) USING parquet")
    try {
      s.sql("ALTER TABLE graft_alter_t ADD COLUMNS (extra DOUBLE)")
      assert(s.table("graft_alter_t").schema.fieldNames.contains("extra"))
      s.sql("ALTER TABLE graft_alter_t SET TBLPROPERTIES ('graft.note' = 'kudu-style')")
      val props = s.sql("SHOW TBLPROPERTIES graft_alter_t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("graft.note").contains("kudu-style"))
      s.sql("ALTER TABLE graft_alter_t RENAME TO graft_alter_renamed")
      assert(s.catalog.tableExists("graft_alter_renamed"))
      assert(!s.catalog.tableExists("graft_alter_t"))
    } finally {
      s.sql("DROP TABLE IF EXISTS graft_alter_t")
      s.sql("DROP TABLE IF EXISTS graft_alter_renamed")
    }
  }

  test("CREATE DATABASE / USE / SHOW TABLES IN / DROP DATABASE") {
    val s = spark
    s.sql("DROP DATABASE IF EXISTS graft_db CASCADE")
    s.sql("CREATE DATABASE graft_db")
    try {
      s.sql("CREATE TABLE graft_db.t1 (id INT) USING parquet")
      val tables = s.sql("SHOW TABLES IN graft_db").collect()
        .map(_.getString(1)).toSet
      assert(tables.contains("t1"))
      s.sql("USE graft_db")
      assert(s.catalog.currentDatabase == "graft_db")
      s.sql("USE default")
    } finally {
      s.sql("USE default")
      s.sql("DROP DATABASE IF EXISTS graft_db CASCADE")
    }
  }

  test("SHOW PARTITIONS and SHOW CREATE TABLE round-trip a partitioned table") {
    val s = spark
    QuerySpec.prepared(s, sfDir)
    s.sql("DROP TABLE IF EXISTS graft_part_t")
    s.table("region").write.partitionBy("r_name").saveAsTable("graft_part_t")
    try {
      val parts = s.sql("SHOW PARTITIONS graft_part_t").collect()
        .map(_.getString(0)).toSet
      assert(parts.size == 5 && parts.exists(_.startsWith("r_name=")), parts)
      val ddl = s.sql("SHOW CREATE TABLE graft_part_t").collect().head.getString(0)
      assert(ddl.contains("graft_part_t") && ddl.contains("PARTITIONED BY"), ddl)

      // SHOW FILES (ShowFilesStmt, sql-parser.cup:5818-5840): one row
      // per data file with size and owning partition; a PARTITION spec
      // narrows through partition pruning to exactly that partition's
      // files
      val files = graft.operators.Dml.showFiles(s, "graft_part_t").collect()
      assert(files.length >= 5, files.length.toString)
      assert(files.forall(_.getAs[Long]("size_bytes") > 0))
      assert(files.map(_.getAs[String]("partition")).toSet
        .forall(_.startsWith("r_name=")), files.map(_.toSeq).mkString(", "))
      val one = graft.operators.Dml.showFiles(s, "graft_part_t",
        Map("r_name" -> "ASIA")).collect()
      assert(one.nonEmpty && one.forall(_.getAs[String]("partition") == "r_name=ASIA"),
        one.map(_.toSeq).mkString(", "))
      assert(one.length < files.length, "partition spec must prune the listing")
    } finally s.sql("DROP TABLE IF EXISTS graft_part_t")
  }

  test("ALTER TABLE ADD/DROP PARTITION and RECOVER PARTITIONS") {
    // AlterTableAddPartitionStmt / AlterTableDropPartitionStmt /
    // AlterTableRecoverPartitionsStmt — the partition-DDL trio the
    // reference analyzes; Spark serves all three natively on
    // partitioned datasource tables (RECOVER doubles as MSCK REPAIR).
    val s = spark
    QuerySpec.prepared(s, sfDir)
    s.sql("DROP TABLE IF EXISTS graft_pddl_t")
    s.sql("""CREATE TABLE graft_pddl_t (id BIGINT, day INT)
            |USING parquet PARTITIONED BY (day)""".stripMargin)
    try {
      s.sql("INSERT INTO graft_pddl_t PARTITION (day=1) VALUES (10)")
      s.sql("ALTER TABLE graft_pddl_t ADD PARTITION (day=2)")
      // an added-but-empty partition is visible to SHOW PARTITIONS,
      // contributes no rows (exactly the reference's HMS semantics —
      // and the documented caveat behind opt-in partition-key scans)
      val parts = s.sql("SHOW PARTITIONS graft_pddl_t").collect()
        .map(_.getString(0)).toSet
      assert(parts == Set("day=1", "day=2"), parts.toString)
      assert(s.table("graft_pddl_t").count() == 1)
      // ADD on an existing partition: IF NOT EXISTS passes, bare form errors
      s.sql("ALTER TABLE graft_pddl_t ADD IF NOT EXISTS PARTITION (day=2)")
      val dup = intercept[Exception](
        s.sql("ALTER TABLE graft_pddl_t ADD PARTITION (day=2)"))
      assert(dup.getMessage.toUpperCase.contains("ALREADY EXIST"), dup.getMessage)
      // DROP removes metadata and data visibility
      s.sql("ALTER TABLE graft_pddl_t DROP PARTITION (day=1)")
      assert(s.table("graft_pddl_t").count() == 0)
      assert(s.sql("SHOW PARTITIONS graft_pddl_t").collect()
        .map(_.getString(0)).toSet == Set("day=2"))
      // RECOVER PARTITIONS: a directory written behind the catalog's
      // back registers after recovery (the reference's use case —
      // files landed by an external loader)
      val loc = s.sql("DESCRIBE EXTENDED graft_pddl_t").collect()
        .find(_.getString(0) == "Location").get.getString(1)
      val s2 = s
      import s2.implicits._
      Seq(30L).toDF("id").write.mode("overwrite")
        .parquet(s"$loc/day=3")
      s.sql("ALTER TABLE graft_pddl_t RECOVER PARTITIONS")
      assert(s.sql("SHOW PARTITIONS graft_pddl_t").collect()
        .map(_.getString(0)).toSet == Set("day=2", "day=3"))
      assert(s.table("graft_pddl_t").count() == 1)
    } finally s.sql("DROP TABLE IF EXISTS graft_pddl_t")
  }

  test("CREATE TABLE LIKE an existing table copies schema, not data") {
    // CreateTableLikeStmt.java — the reference clones a table's shape
    val s = spark
    QuerySpec.prepared(s, sfDir)
    for (t <- Seq("graft_like_src", "graft_like_dst"))
      s.sql(s"DROP TABLE IF EXISTS $t")
    s.table("region").write.saveAsTable("graft_like_src")
    try {
      s.sql("CREATE TABLE graft_like_dst LIKE graft_like_src")
      assert(s.table("graft_like_dst").schema == s.table("graft_like_src").schema)
      assert(s.table("graft_like_dst").count() == 0)
      assert(s.table("graft_like_src").count() == 5)
    } finally for (t <- Seq("graft_like_src", "graft_like_dst"))
      s.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("DESCRIBE DATABASE surfaces the db's catalog metadata") {
    // DescribeDbStmt.java — name/location rows in the JDBC shape
    QuerySpec.prepared(spark, sfDir)
    val rows = spark.sql("DESCRIBE DATABASE default").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows.keySet.exists(_.toLowerCase.contains("namespace")) ||
      rows.keySet.exists(_.toLowerCase.contains("database")), rows.toString)
  }

  test("ALTER TABLE SET LOCATION repoints the table at existing files") {
    // AlterTableSetLocationStmt.java — metadata-only repoint; the next
    // read serves the new location's files
    val s = spark
    QuerySpec.prepared(s, sfDir)
    s.sql("DROP TABLE IF EXISTS graft_loc_t")
    // a repointed-then-dropped managed table leaves its ORIGINAL
    // warehouse dir behind (DROP removes the current location only) —
    // clear it or the next run's saveAsTable hits LOCATION_ALREADY_EXISTS
    locally {
      val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir"))
      val dir = new java.io.File(
        if (wh.getScheme == null) wh.getPath else new java.io.File(wh).getPath,
        "graft_loc_t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete(): Unit
      }
      rm(dir)
    }
    val alt = java.nio.file.Files.createTempDirectory("graft_setloc").toString
    s.table("nation").limit(7).write.mode("overwrite").parquet(alt)
    s.table("nation").write.saveAsTable("graft_loc_t")
    try {
      assert(s.table("graft_loc_t").count() == 25)
      s.sql(s"ALTER TABLE graft_loc_t SET LOCATION '$alt'")
      s.sql("REFRESH TABLE graft_loc_t")
      assert(s.table("graft_loc_t").count() == 7)
    } finally s.sql("DROP TABLE IF EXISTS graft_loc_t")
  }

  test("column DDL: comment changes apply; type/replace/drop guard v1 tables") {
    // AlterTableChangeColStmt / AlterTableAddReplaceColsStmt /
    // AlterTableDropColStmt: the reference's Hive model edits these as
    // pure metadata (readers reinterpret files). Spark's v1 parquet
    // tables ACCEPT comment-only changes and REJECT type-narrowing /
    // replace / drop (data-layout consistency guard; v2 catalogs
    // support the full set) — pin both sides of that divergence.
    val s = spark
    QuerySpec.prepared(s, sfDir)
    s.sql("DROP TABLE IF EXISTS graft_coldd_t")
    s.sql("CREATE TABLE graft_coldd_t (a INT, b STRING) USING parquet")
    try {
      s.sql("ALTER TABLE graft_coldd_t ALTER COLUMN a COMMENT 'the a column'")
      val described = s.sql("DESCRIBE graft_coldd_t").collect()
        .map(r => r.getString(0) -> r.getString(2)).toMap
      assert(described("a") == "the a column")
      def rejected(sql: String): Unit = {
        val e = intercept[Exception](s.sql(sql))
        assert(e.getMessage.toUpperCase.contains("NOT SUPPORTED") ||
          e.getMessage.contains("NOT_SUPPORTED"), e.getMessage.take(200))
      }
      rejected("ALTER TABLE graft_coldd_t CHANGE COLUMN a a BIGINT")
      rejected("ALTER TABLE graft_coldd_t REPLACE COLUMNS (x INT)")
      rejected("ALTER TABLE graft_coldd_t DROP COLUMN b")
    } finally s.sql("DROP TABLE IF EXISTS graft_coldd_t")
  }

  test("CREATE TABLE USING the external data source registers a queryable table") {
    // CreateDataSrcStmt + CreateTableDataSrcStmt (EXTERNAL data source
    // API tables): the DSv2 provider IS the registration — a catalog
    // table over ExtDataSource serves SQL with pushdown like any table
    val s = spark
    QuerySpec.prepared(s, sfDir)
    s.sql("DROP TABLE IF EXISTS graft_extsrc_t")
    s.sql(
      """CREATE TABLE graft_extsrc_t USING graft.sources.ExtDataSource
        |OPTIONS (rows '100', partitions '2')""".stripMargin)
    try {
      assert(s.sql("SELECT COUNT(*) AS n FROM graft_extsrc_t")
        .collect().head.getLong(0) == 100L)
      val filtered = s.sql(
        "SELECT id FROM graft_extsrc_t WHERE id >= 90 ORDER BY id")
      assert(filtered.collect().map(_.getLong(0)).toSeq == (90L until 100L))
    } finally s.sql("DROP TABLE IF EXISTS graft_extsrc_t")
  }

  test("GetTypeInfo analogue serves the supported-type matrix in the JDBC shape") {
    // MetadataOp.java:557-645: one row per supported primitive type
    // (INVALID/DATE/DATETIME and parameterized DECIMAL/CHAR/VARCHAR are
    // skipped), 18 GetTypeInfo columns. The values are pinned against the
    // SURVEY §1.2 mapping, not read back from the implementation.
    val df = graft.operators.Dml.typeInfo(spark)
    assert(df.columns.toSeq == Seq(
      "TYPE_NAME", "DATA_TYPE", "PRECISION", "LITERAL_PREFIX",
      "LITERAL_SUFFIX", "CREATE_PARAMS", "NULLABLE", "CASE_SENSITIVE",
      "SEARCHABLE", "UNSIGNED_ATTRIBUTE", "FIXED_PREC_SCALE",
      "AUTO_INCREMENT", "LOCAL_TYPE_NAME", "MINIMUM_SCALE",
      "MAXIMUM_SCALE", "SQL_DATA_TYPE", "SQL_DATETIME_SUB",
      "NUM_PREC_RADIX"))
    val rows = df.collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("NULL_TYPE", "BOOLEAN", "TINYINT", "SMALLINT",
      "INT", "BIGINT", "FLOAT", "DOUBLE", "TIMESTAMP", "STRING", "BINARY"))
    // JDBC type codes (java.sql.Types)
    val expectedJdbc = Map("NULL_TYPE" -> 0, "BOOLEAN" -> 16, "TINYINT" -> -6,
      "SMALLINT" -> 5, "INT" -> 4, "BIGINT" -> -5, "FLOAT" -> 6,
      "DOUBLE" -> 8, "TIMESTAMP" -> 93, "STRING" -> 12, "BINARY" -> -2)
    expectedJdbc.foreach { case (n, code) =>
      assert(rows(n).getInt(1) == code, s"$n DATA_TYPE") }
    // decimal-digit precision for numerics, NULL otherwise (Type.java:489-510)
    val expectedPrec = Map("TINYINT" -> 3, "SMALLINT" -> 5, "INT" -> 10,
      "BIGINT" -> 19, "FLOAT" -> 7, "DOUBLE" -> 15)
    rows.foreach { case (n, r) =>
      expectedPrec.get(n) match {
        case Some(p) =>
          assert(r.getInt(2) == p, s"$n PRECISION")
          assert(!r.getBoolean(9), s"$n UNSIGNED_ATTRIBUTE must be false")
          assert(r.getInt(17) == 10, s"$n NUM_PREC_RADIX")
        case None =>
          assert(r.isNullAt(2), s"$n PRECISION must be NULL")
          assert(r.getBoolean(9), s"$n UNSIGNED_ATTRIBUTE must be true")
          assert(r.isNullAt(17), s"$n NUM_PREC_RADIX must be NULL")
      }
      // constants: nullable (1), searchable (3), no fixed prec/autoincr
      assert(r.getInt(6) == 1 && r.getInt(8) == 3, s"$n NULLABLE/SEARCHABLE")
      assert(!r.getBoolean(10) && !r.getBoolean(11), s"$n FIXED/AUTO")
      assert(r.getInt(13) == 0 && r.getInt(14) == 0, s"$n MIN/MAX_SCALE")
      // only the string type is case-sensitive
      assert(r.getBoolean(7) == (n == "STRING"), s"$n CASE_SENSITIVE")
    }
  }
}
