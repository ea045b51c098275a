package graft.operators

import graft.QuerySpec

/** Nested/complex types — ArrayType/MapType/StructType
  * (impala/catalog/ArrayType.java, MapType.java, StructType.java),
  * accessed by path and flattened by joining
  * against the collection: SubplanNode + UnnestNode + SingularRowSrcNode
  * (planner/SubplanNode.java:27-109, UnnestNode.java:31-107). Spark's
  * `explode`/`posexplode` (Catalyst Generate) subsumes the whole subplan
  * machinery; path access is built-in column resolution
  * (vs Analyzer.resolvePath, impala/analysis/Analyzer.java:722-919).
  */
object Nested {

  /** explode(split(…)) — UnnestNode: one output row per element; word
    * frequency over the documents corpus. */
  val q60Explode: QuerySpec = QuerySpec.sql2(
    "q60_nested_explode",
    """SELECT word, COUNT(*) AS cnt
      |FROM (SELECT explode(split(text, ' ')) AS word FROM documents) t
      |GROUP BY word
      |ORDER BY cnt DESC, word
      |LIMIT 20""".stripMargin,
    """SELECT word, COUNT(*) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      |GROUP BY word
      |ORDER BY cnt DESC, word
      |LIMIT 20""".stripMargin)

  /** posexplode — UnnestNode with the `pos` pseudo-column
    * (CollectionStructType's item/pos fields). */
  val q61Posexplode: QuerySpec = QuerySpec.sql2(
    "q61_nested_posexplode",
    """SELECT doc_id, pos, word
      |FROM documents
      |LATERAL VIEW posexplode(split(text, ' ')) t AS pos, word
      |WHERE pos < 3
      |ORDER BY doc_id, pos""".stripMargin,
    """SELECT doc_id, pos, word FROM (
      |  SELECT doc_id,
      |         unnest(string_split(text, ' ')) AS word,
      |         unnest(range(len(string_split(text, ' ')))) AS pos
      |  FROM documents) t
      |WHERE pos < 3
      |ORDER BY doc_id, pos""".stripMargin)

  /** Array path ops: size / index / contains / distinct+sort+slice+join. */
  val q62ArrayOps: QuerySpec = QuerySpec.sql2(
    "q62_nested_array_ops",
    """SELECT doc_id,
      |  size(split(text, ' ')) AS n_words,
      |  split(text, ' ')[0] AS w0,
      |  array_contains(split(text, ' '), 'spark') AS has_spark,
      |  array_join(slice(sort_array(array_distinct(split(text, ' '))), 1, 5), ',') AS first5
      |FROM documents
      |ORDER BY doc_id""".stripMargin,
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_words,
      |  string_split(text, ' ')[1] AS w0,
      |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
      |  array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], ',') AS first5
      |FROM documents
      |ORDER BY doc_id""".stripMargin)

  /** Struct construction + field path access, and map access (DuckDB map
    * subscript yields a single-element list — take [1]). */
  val q63StructMap: QuerySpec = QuerySpec.sql2(
    "q63_nested_struct_map",
    """SELECT doc_id,
      |  named_struct('lang', lang, 'n', n_chars).lang AS s_lang,
      |  named_struct('lang', lang, 'n', n_chars).n AS s_n,
      |  map('lang', lang, 'source', source)['source'] AS m_source
      |FROM documents
      |ORDER BY doc_id""".stripMargin,
    """SELECT doc_id,
      |  struct_pack(lang := lang, n := n_chars).lang AS s_lang,
      |  struct_pack(lang := lang, n := n_chars).n AS s_n,
      |  map(['lang', 'source'], [lang, source])['source'][1] AS m_source
      |FROM documents
      |ORDER BY doc_id""".stripMargin)

  /** collect_list → sorted array aggregation (order pinned for
    * partitioning-independence) + IsNotEmptyPredicate analogue size()>0. */
  val q64CollectSort: QuerySpec = QuerySpec.sql2(
    "q64_nested_collect",
    """SELECT r_regionkey,
      |  array_join(sort_array(collect_list(n_name)), '|') AS nations,
      |  size(collect_list(n_name)) > 0 AS non_empty
      |FROM region JOIN nation ON n_regionkey = r_regionkey
      |GROUP BY r_regionkey
      |ORDER BY r_regionkey""".stripMargin,
    """SELECT r_regionkey,
      |  array_to_string(list_sort(list(n_name)), '|') AS nations,
      |  len(list(n_name)) > 0 AS non_empty
      |FROM region JOIN nation ON n_regionkey = r_regionkey
      |GROUP BY r_regionkey
      |ORDER BY r_regionkey""".stripMargin)

  /** TPC-H-nested shape (the reference's PlannerTest.testTpchNested runs
    * TPC-H over a nested schema where each customer embeds its orders as
    * ARRAY<STRUCT>): build the nested form with collect_list(struct(..)),
    * then flatten it back through explode (SubplanNode + UnnestNode +
    * struct-path access on the exploded element) and aggregate. The
    * oracle is the equivalent FLAT query — nesting and unnesting must be
    * a lossless round-trip, including struct field access after the
    * Generate. Scale: the nest groupBy shuffles on c_custkey once; the
    * explode is map-side; per-customer arrays are order-bounded (TPC-H
    * ~10 orders/customer), so no skew concern. */
  val q127NestedTpch: QuerySpec = QuerySpec(
    "q127_nested_tpch_shape",
    """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_urgent_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS urgent_revenue
      |FROM customer JOIN orders ON o_custkey = c_custkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.functions._
    val sp = QuerySpec.prepared(s, dir)
    val nested = sp.table("customer")
      .join(sp.table("orders"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(collect_list(struct(col("o_orderkey"), col("o_totalprice"),
        col("o_orderpriority"))).as("orders_arr"))
    nested
      .select(col("c_mktsegment"), explode(col("orders_arr")).as("o"))
      .filter(col("o.o_orderpriority") === "1-URGENT")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_urgent_orders"),
        sum(col("o.o_totalprice").cast("decimal(14,2)")).cast("double")
          .as("urgent_revenue"))
      .orderBy(col("c_mktsegment"))
  }

  val all: Seq[QuerySpec] = Seq(
    q60Explode, q61Posexplode, q62ArrayOps, q63StructMap, q64CollectSort,
    q127NestedTpch)
}
