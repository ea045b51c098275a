package graft

/** HiveServer2 wire protocol — the reference serves its entire client
  * surface over HS2 Thrift, including the hand-built catalog metadata
  * ops (service/MetadataOp.java:53-645: GetTypeInfo, GetTables,
  * GetColumns, GetSchemas, GetFunctions, GetCatalogs). Spark's
  * ThriftServer is this engine's
  * same-protocol surface; this suite starts it on the shared session's
  * context and exercises both halves over a REAL JDBC connection —
  * previously the metadata ops were only mirrored as catalog queries
  * (q75/q173) with nothing listening on a wire. */
class ThriftServerSpec extends EngineSuite {

  private def drain(rs: java.sql.ResultSet, col: String): Seq[String] = {
    val b = Seq.newBuilder[String]
    while (rs.next()) b += rs.getString(col)
    b.result()
  }

  test("HiveServer2 wire: SQL and metadata ops over a real JDBC connection") {
    val s = spark
    // probe a free port so concurrent test JVMs on one host can't collide
    val port = {
      val ss = new java.net.ServerSocket(0)
      try ss.getLocalPort.toString finally ss.close()
    }
    s.sqlContext.setConf("hive.server2.thrift.port", port)
    val server =
      org.apache.spark.sql.hive.thriftserver.HiveThriftServer2.startWithSparkSession(s, exitOnError = false)
    s.sql("DROP TABLE IF EXISTS graft_hs2_t")
    s.sql("CREATE TABLE graft_hs2_t USING parquet AS SELECT id, id * 2 AS dbl FROM RANGE(5)")
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      // the server binds asynchronously — poll until it accepts a session
      var conn: java.sql.Connection = null
      var lastErr: Throwable = null
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (conn == null && System.nanoTime() < deadline) {
        try conn = java.sql.DriverManager.getConnection(
          s"jdbc:hive2://localhost:$port/default", "graft", "")
        catch { case e: Throwable => lastErr = e; Thread.sleep(500) }
      }
      assert(conn != null, s"thrift server never accepted a connection: $lastErr")
      try {
        // SQL execution over the wire, against the shared catalog
        val rs = conn.createStatement().executeQuery(
          "SELECT COUNT(*) AS n, CAST(SUM(dbl) AS BIGINT) AS s FROM graft_hs2_t")
        assert(rs.next())
        assert(rs.getLong(1) == 5L && rs.getLong(2) == 20L, "wire query returned wrong rows")
        // GetTypeInfo (MetadataOp.getTypeInfo:557-645)
        val md = conn.getMetaData
        val types = drain(md.getTypeInfo, "TYPE_NAME").toSet
        Seq("BIGINT", "STRING", "DOUBLE", "BOOLEAN")
          .foreach(t => assert(types.contains(t), s"GetTypeInfo missing $t: $types"))
        // GetSchemas / GetTables / GetColumns (MetadataOp.getSchemas/getTables/getColumns)
        assert(drain(md.getSchemas, "TABLE_SCHEM").contains("default"))
        assert(drain(md.getTables(null, "default", "graft_hs2_t", null), "TABLE_NAME")
          == Seq("graft_hs2_t"))
        assert(drain(md.getColumns(null, "default", "graft_hs2_t", "%"), "COLUMN_NAME").toSet
          == Set("id", "dbl"))
        // GetFunctions (MetadataOp.getFunctions:530-560): built-ins
        // surface by name pattern, with the standard JDBC columns
        val fns = drain(md.getFunctions(null, null, "abs"), "FUNCTION_NAME")
        assert(fns.exists(_.equalsIgnoreCase("abs")),
          s"GetFunctions('abs') over the wire returned $fns")
        assert(drain(md.getFunctions(null, null, "xxhash64"), "FUNCTION_NAME")
          .exists(_.equalsIgnoreCase("xxhash64")))
        // GetCatalogs (MetadataOp.getCatalogs:301-303): the reference
        // returns a WELL-FORMED EMPTY result set (no catalog concept);
        // the op must succeed on the wire and expose the TABLE_CAT
        // column — contents are engine-specific, shape is the contract
        val cats = md.getCatalogs
        assert(cats.findColumn("TABLE_CAT") == 1)
        discard(drain(cats, "TABLE_CAT")) // drains without error
      } finally conn.close()
    } finally {
      s.sql("DROP TABLE IF EXISTS graft_hs2_t")
      server.stop()
    }
  }
}
