package graft.operators

import graft.QuerySpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the hot-key mitigation for shuffle joins whose
  * probe side concentrates on a few join-key values (the power-law
  * user/document/entity keys every 100 TB event corpus has).
  *
  * Why AQE is not enough: `spark.sql.adaptive.skewJoin` re-splits skewed
  * partitions only for sort-merge joins between shuffle stages; a hot
  * KEY (one key = one partition-side row group) inside a shuffled hash
  * join, a stream-static join, or a stateful pipeline still lands on one
  * task. Salting re-keys the join itself: hot probe rows scatter across
  * `salts` sub-keys via a deterministic per-row hash, the matching build
  * rows replicate into all `salts` sub-keys (an explode of a
  * `sequence(0, salts-1)` literal — build-side amplification is bounded
  * by salts × |hot keys|), and cold keys keep salt 0 with NO
  * amplification. Result ≡ the plain inner equi-join, row for row.
  *
  * The hot-key list is found with one map-side-combined aggregate over
  * the probe keys and broadcast: with threshold T over n probe rows at
  * most n/T keys qualify — the caller picks T so n/T is broadcast-sized
  * (the same heavy-hitter cardinality bound [[graft.llmops.Dedup]]'s
  * boundedPairs uses for oversized blocks). Salt assignment hashes a
  * caller-named unique column (NOT rand()): deterministic replay under
  * task retries, bit-identical results at any parallelism.
  *
  * Reference: no direct analogue — the reference frontend plans joins
  * for a static BE; skew handling is a Spark-execution-model concern
  * (SURVEY §4.3). */
object Skew {

  /** Inner equi-join of `probe` ⋈ `build` on `key`, salted `salts` ways
    * for probe keys hotter than `hotThreshold` rows. `saltBy` must be a
    * probe column (or expression) unique per row — it only spreads hot
    * rows uniformly; uniqueness is not required for correctness, only
    * for balance. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 saltBy: Column, salts: Int, hotThreshold: Long): DataFrame = {
    val hot = probe.groupBy(col(key)).agg(count(lit(1)).as("__kc"))
      .filter(col("__kc") > hotThreshold)
      .select(col(key))
    saltedJoinWithHotKeys(probe, build, key, saltBy, salts, hot)
  }

  /** The salting algebra itself, parameterized by the hot-key relation
    * (a single `key` column, bounded by contract, broadcast here): hot
    * probe rows scatter by hash(saltBy) mod salts, hot build rows
    * replicate into all salts, cold keys keep salt 0 unamplified.
    * ONE implementation — [[saltedJoin]] derives the hot list from the
    * probe; the streaming twin ([[graft.streaming.EventStreams
    * .saltedEnrich]]) receives it as an input relation (a stream cannot
    * be scanned for counts) and delegates here, so the two
    * equivalence-critical copies cannot drift (ADVICE r15). */
  def saltedJoinWithHotKeys(probe: DataFrame, build: DataFrame, key: String,
                            saltBy: Column, salts: Int,
                            hotKeys: DataFrame): DataFrame = {
    require(salts > 1, "salts must be > 1")
    val hot = broadcast(hotKeys.select(col(key), lit(true).as("__hot")))
    val p = probe.join(hot, Seq(key), "left")
      .withColumn("__salt",
        when(col("__hot"), pmod(xxhash64(saltBy), lit(salts.toLong)))
          .otherwise(lit(0L)))
      .drop("__hot")
    val b = build.join(hot, Seq(key), "left")
      .withColumn("__salt", explode(
        when(col("__hot"), sequence(lit(0L), lit(salts.toLong - 1)))
          .otherwise(array(lit(0L)))))
      .drop("__hot")
    p.join(b, Seq(key, "__salt")).drop("__salt")
  }

  /** Purchase revenue per market segment through the salted join —
    * events (probe, hot on user_id) ⋈ customer (build) with 8 salts at
    * a 20-row hot threshold (both fixture scales have real hot keys
    * above it). The oracle is the PLAIN join: the query IS the
    * row-for-row equivalence proof, at every scale the driver runs.
    * countDistinct survives salting because the salt never reaches the
    * aggregate grain. */
  val q383SaltedJoin: QuerySpec = QuerySpec(
    "q383_skew_salted_join",
    """SELECT c_mktsegment,
      |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_buyers,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM events
      |JOIN customer ON user_id = c_custkey
      |WHERE event_type = 'purchase'
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    val ev = sp.table("events").filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        col("value").cast("decimal(12,2)").as("v"))
    val cust = sp.table("customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    saltedJoin(ev, cust, "user_id",
      saltBy = col("event_id"), salts = 8, hotThreshold = 20L)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id")).as("n_buyers"),
        sum(col("v")).cast("double").as("revenue"))
      .orderBy(col("c_mktsegment"))
  }

  val all: Seq[QuerySpec] = Seq(q383SaltedJoin)
}
