package graft.operators

import org.apache.spark.sql.functions._
import graft.QuerySpec

/** DDL/DML subset — CREATE TABLE AS SELECT (CreateTableAsSelectStmt.java:
  * 1-239), INSERT INTO/OVERWRITE with dynamic partitions
  * (InsertStmt.java:1-851, HdfsTableSink.java:1-163), UPDATE/DELETE
  * (Kudu-only in the reference, ModifyStmt.java:41-307 — rewritten
  * internally to a SELECT producing key cols + new values; we model the
  * same read-modify-overwrite on keyed Parquet), CREATE VIEW
  * (CreateViewStmt.java).
  *
  * Each query exercises the write path end-to-end (df.write → parquet /
  * partitionBy) then reads its own output back, so the driver's compare
  * validates the round-trip. Writes go to /tmp/graft_dml/<name>; at
  * cluster scale the same code writes partitioned HDFS/S3 directories.
  */
object Dml {

  private def outDir(name: String, sfDir: String): String =
    s"/tmp/graft_dml/${name}_${sfDir.replaceAll("[^a-zA-Z0-9.]", "_")}"

  /** CTAS: materialize an aggregate as a Parquet table, then query it. */
  val q70Ctas: QuerySpec = QuerySpec(
    "q70_dml_ctas",
    """SELECT o_custkey, n_orders, total
      |FROM (SELECT o_custkey, COUNT(*) AS n_orders,
      |             CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
      |      FROM orders GROUP BY o_custkey) t
      |WHERE n_orders >= 12
      |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    val path = outDir("ctas", dir)
    sp.table("orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(14,2)")).cast("double").as("total"))
      .write.mode("overwrite").parquet(path)
    sp.read.parquet(path)
      .filter(col("n_orders") >= 12)
      .orderBy(col("o_custkey"))
  }

  /** INSERT OVERWRITE with dynamic partitioning: write partitioned by
    * order priority, read back one partition — the read plan must prune
    * to that partition directory (HdfsScanNode partition pruning /
    * Spark PartitioningAwareFileIndex). */
  val q71InsertPartitioned: QuerySpec = QuerySpec(
    "q71_dml_insert_partitioned",
    """SELECT o_orderkey, o_totalprice, o_orderpriority
      |FROM orders
      |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 250000
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    val path = outDir("part", dir)
    sp.table("orders")
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
    sp.read.parquet(path)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 250000)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .orderBy("o_orderkey")
  }

  /** UPDATE emulation (ModifyStmt → read-modify-overwrite): +10% price on
    * urgent orders, via an updates-side MERGE shape (left join on the key,
    * coalesce new values) — the scalable pattern for keyed Parquet. */
  val q72UpdateMerge: QuerySpec = QuerySpec(
    "q72_dml_update_merge",
    """SELECT o_orderkey,
      |  CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice * 1.1
      |       ELSE o_totalprice END AS o_totalprice
      |FROM orders
      |WHERE o_orderkey <= 3000
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    val path = outDir("upd", dir)
    val base = sp.table("orders").select("o_orderkey", "o_totalprice", "o_orderpriority")
    val updates = base.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("u_key"), (col("o_totalprice") * 1.1).as("u_price"))
    base.join(updates, col("o_orderkey") === col("u_key"), "left_outer")
      .select(col("o_orderkey"),
        coalesce(col("u_price"), col("o_totalprice")).as("o_totalprice"))
      .write.mode("overwrite").parquet(path)
    sp.read.parquet(path)
      .filter(col("o_orderkey") <= 3000)
      .orderBy("o_orderkey")
  }

  /** DELETE emulation: anti-filter rewrite + overwrite, then a rollup on
    * the surviving rows. */
  val q73Delete: QuerySpec = QuerySpec(
    "q73_dml_delete",
    """SELECT o_orderstatus, COUNT(*) AS n
      |FROM orders
      |WHERE NOT (o_totalprice < 50000)
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    val path = outDir("del", dir)
    sp.table("orders")
      .filter(!(col("o_totalprice") < 50000))
      .write.mode("overwrite").parquet(path)
    sp.read.parquet(path)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
  }

  /** CREATE VIEW + view-on-view (CreateViewStmt / inline-view
    * substitution): queries compose through the catalog. */
  val q74Views: QuerySpec = QuerySpec(
    "q74_dml_views",
    """SELECT nation, n_rich
      |FROM (SELECT n_name AS nation, COUNT(*) AS n_rich
      |      FROM customer JOIN nation ON c_nationkey = n_nationkey
      |      WHERE c_acctbal > 5000
      |      GROUP BY n_name) v
      |WHERE n_rich >= 10
      |ORDER BY nation""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    sp.sql("""CREATE OR REPLACE TEMPORARY VIEW v_rich AS
             |SELECT n_name AS nation, COUNT(*) AS n_rich
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |WHERE c_acctbal > 5000
             |GROUP BY n_name""".stripMargin)
    sp.sql("""CREATE OR REPLACE TEMPORARY VIEW v_rich_top AS
             |SELECT * FROM v_rich WHERE n_rich >= 10""".stripMargin)
    sp.sql("SELECT nation, n_rich FROM v_rich_top ORDER BY nation")
  }

  /** Catalog/metadata surface (SHOW TABLES / DESCRIBE —
    * service/MetadataOp.java:53-645). The registered test-table set is a
    * static contract, so the oracle is its literal VALUES listing — a real
    * differential on the catalog surface (a missed or renamed registration
    * fails the compare). Layout/DML queries create `g_*` managed tables in
    * the same session; they are session-order-dependent noise here and are
    * filtered out. */
  val q75Catalog: QuerySpec = QuerySpec(
    "q75_dml_catalog",
    graft.sources.TestTables.names.sorted
      .map(n => s"('$n', true)")
      .mkString(
        "SELECT tableName, isTemporary FROM (VALUES ",
        ", ",
        ") t(tableName, isTemporary) ORDER BY tableName")) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    sp.sql("SHOW TABLES").select("tableName", "isTemporary")
      .filter(col("tableName").isin(graft.sources.TestTables.names: _*))
      .orderBy("tableName")
  }

  /** File-format surface (catalog/HdfsFileFormat.java:42-116: PARQUET,
    * TEXTFILE, …): the same relation round-trips through parquet, CSV
    * (the TEXTFILE analogue, explicit schema on read), ORC, and JSON,
    * and every copy must agree with the oracle. */
  val q77Formats: QuerySpec = QuerySpec(
    "q77_dml_formats",
    """SELECT fmt, COUNT(*) AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
      |FROM (SELECT 'csv' AS fmt, o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
      |      UNION ALL SELECT 'json', o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
      |      UNION ALL SELECT 'orc', o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
      |      UNION ALL SELECT 'parquet', o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F') t
      |GROUP BY fmt
      |ORDER BY fmt""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    val src = sp.table("orders").filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_totalprice")
    val schema = src.schema
    val copies = Seq("csv", "json", "orc", "parquet").map { fmt =>
      val path = outDir(s"fmt_$fmt", dir)
      src.write.mode("overwrite").format(fmt).save(path)
      sp.read.schema(schema).format(fmt).load(path)
        .select(lit(fmt).as("fmt"), col("o_orderkey"), col("o_totalprice"))
    }
    copies.reduce(_.unionAll(_))
      .groupBy(col("fmt"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(14,2)")).cast("double").as("total"))
      .orderBy(col("fmt"))
  }

  val all: Seq[QuerySpec] = Seq(
    q70Ctas, q71InsertPartitioned, q72UpdateMerge, q73Delete, q74Views,
    q75Catalog, q77Formats)
}
