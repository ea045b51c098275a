package graft

import graft.engine.RequestPools
import graft.engine.RequestPools._

/** Pins the reference RequestPoolService behaviors
  * (util/RequestPoolService.java) on the Spark fair-scheduler mapping:
  * placement precedence, ACL inheritance, per-pool limit key
  * precedence, admission decisions, and the spark.scheduler.pool
  * binding. */
class RequestPoolsSpec extends EngineSuite {

  private val allocXml =
    """<?xml version="1.0"?>
      |<allocations>
      |  <queue name="root">
      |    <aclSubmitApps> </aclSubmitApps>
      |    <queue name="queueA">
      |      <aclSubmitApps>* </aclSubmitApps>
      |      <maxResources>1024 mb, 2 vcores</maxResources>
      |    </queue>
      |    <queue name="queueB">
      |      <aclSubmitApps>userB root</aclSubmitApps>
      |    </queue>
      |    <queue name="team">
      |      <aclSubmitApps>lead</aclSubmitApps>
      |      <queue name="child">
      |        <aclSubmitApps> </aclSubmitApps>
      |      </queue>
      |    </queue>
      |  </queue>
      |  <queuePlacementPolicy>
      |    <rule name="specified" create="false"/>
      |    <rule name="reject"/>
      |  </queuePlacementPolicy>
      |</allocations>""".stripMargin

  private val poolsStrict = RequestPools.fromXml(allocXml)

  test("kerberos principals resolve by short name") {
    assert(shortName("user1@DOMAIN.COM") == "user1")
    assert(shortName("svc/host01@REALM") == "svc")
    assert(shortName("plain") == "plain")
  }

  test("specified(create=false) + reject: declared pools resolve, everything else rejects") {
    // an empty request means the default queue, which `specified` skips —
    // with only `reject` behind it, resolution yields no pool (the
    // reference returns OK with no resolved_pool)
    assert(poolsStrict.resolve("", "userA").isEmpty)
    // declared pools resolve, with and without the root. prefix
    assert(poolsStrict.resolve("queueA", "userA").contains("root.queueA"))
    assert(poolsStrict.resolve("root.queueA", "userA").contains("root.queueA"))
    // an undeclared pool with create=false falls through to reject
    assert(poolsStrict.resolve("nope", "userA").isEmpty)
  }

  test("user and default placement rules") {
    val xml = allocXml.replace(
      """<rule name="specified" create="false"/>
        |    <rule name="reject"/>""".stripMargin,
      """<rule name="specified" create="false"/>
        |    <rule name="user" create="false"/>
        |    <rule name="default" queue="root.queueB"/>""".stripMargin)
    val p = RequestPools.fromXml(xml)
    // user rule matches a declared pool named after the (short) user…
    assert(p.resolve("", "queueA@REALM").contains("root.queueA"))
    assert(p.resolve("", "team").contains("root.team"))
    // …otherwise the default rule's queue wins
    assert(p.resolve("", "nobody").contains("root.queueB"))
    assert(p.resolve("undeclared", "nobody").contains("root.queueB"))
  }

  test("aclSubmitApps: wildcard, user list, and ancestor inheritance") {
    assert(poolsStrict.hasAccess("root.queueA", "anyone"))
    assert(poolsStrict.hasAccess("root.queueB", "userB@KDC"))
    assert(!poolsStrict.hasAccess("root.queueB", "userA"))
    // the parent team ACL admits into team.child (YARN hierarchy check)
    assert(poolsStrict.hasAccess("root.team.child", "lead"))
    assert(!poolsStrict.hasAccess("root.team.child", "other"))
  }

  test("per-pool limits: per-pool key > default key > built-in default; mem from maxResources") {
    val p = RequestPools.fromXml(allocXml, limits = Map(
      "max-requests" -> "10",
      "max-requests.root.queueB" -> "3",
      "max-queued.root.queueB" -> "1",
      "queue-timeout-ms.root.queueB" -> "60000"))
    assert(p.poolConfig("queueB").maxRequests == 3)
    assert(p.poolConfig("queueA").maxRequests == 10)
    assert(p.poolConfig("queueA").maxQueued == DefaultMaxQueued)
    assert(p.poolConfig("queueB").queueTimeoutMs.contains(60000))
    assert(p.poolConfig("queueA").queueTimeoutMs.isEmpty)
    assert(p.poolConfig("queueA").maxMemBytes == 1024L * 1024 * 1024)
    assert(p.poolConfig("queueB").maxMemBytes == -1L)
  }

  test("admission: disabled pool rejects, then admit under limit, queue, reject-full") {
    val p = RequestPools.fromXml(allocXml, limits = Map(
      "max-requests.root.queueB" -> "2",
      "max-queued.root.queueB" -> "1",
      "max-requests.root.team" -> "0"))
    assert(p.admit("team", running = 0, queued = 0)
      .isInstanceOf[Rejected]) // max_requests=0 disables the pool
    assert(p.admit("queueB", running = 1, queued = 0) == Admitted)
    assert(p.admit("queueB", running = 2, queued = 0) == Queued)
    assert(p.admit("queueB", running = 2, queued = 1).isInstanceOf[Rejected])
    // unlimited defaults admit
    assert(p.admit("queueA", running = 199, queued = 0) == Admitted)
  }

  test("memory-aware admission: an estimate past the pool's max_mem rejects outright") {
    // AdmissionController's other rejection axis, fed by the
    // Planner.computeResourceReqs analogue (ResourceEstimates): a query
    // that can NEVER fit is rejected, not queued to time out. queueA
    // caps at 1024 mb (maxResources).
    val p = RequestPools.fromXml(allocXml)
    val cap = p.poolConfig("queueA").maxMemBytes
    assert(cap == 1024L * 1024 * 1024)
    assert(p.admit("queueA", 0, 0, perHostMemBytes = cap + 1)
      .isInstanceOf[Rejected])
    assert(p.admit("queueA", 0, 0, perHostMemBytes = cap) == Admitted)
    // unlimited pool (-1) never memory-rejects
    assert(p.admit("queueB", 0, 0, perHostMemBytes = Long.MaxValue / 2) == Admitted)
    // the full plan→estimate→admit flow on a real query
    QuerySpec.prepared(spark, sfDir)
    val tiny = spark.table("nation").groupBy("n_regionkey").count()
    assert(p.admitQuery("queueA", 0, 0, tiny) == Admitted)
  }

  test("admitQuery verdicts match on a fresh plan and the SAME plan " +
    "after execution (AQE query stages) — the under-admit drill") {
    // The end-to-end admission form of the executed-AQE estimate pin:
    // post-collect, the plan's exchanges are QueryStageExec leaves; if
    // the estimator returned ~0 there, a pool whose cap sits below the
    // fresh estimate would Reject the fresh plan and silently ADMIT the
    // executed one — the exact under-admit hazard the recursion fixes.
    import org.apache.spark.sql.functions.col
    val s = spark
    QuerySpec.prepared(s, sfDir)
    val df = s.table("orders")
      .join(s.table("customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").count()
    val fresh = graft.engine.ResourceEstimates.of(df).perHostBytes
    assert(fresh > 0, "the drill needs a positive fresh estimate")
    def poolWithCap(mb: Long) =
      RequestPools.fromXml(allocXml.replace("1024 mb", s"$mb mb"))
    val belowMb = fresh / 2 / (1L << 20) // 0 if the fixture estimate < 2 MB
    val aboveMb = fresh / (1L << 20) + 1
    val freshBelow = Option.when(belowMb > 0)(
      poolWithCap(belowMb).admitQuery("queueA", 0, 0, df))
    freshBelow.foreach(v => assert(v.isInstanceOf[Rejected],
      s"a cap below the fresh estimate must reject: $v"))
    assert(poolWithCap(aboveMb).admitQuery("queueA", 0, 0, df) == Admitted)
    discard(df.collect()) // materialize: exchanges become query stages
    val executed = graft.engine.ResourceEstimates.of(df).perHostBytes
    freshBelow.foreach { v =>
      val after = poolWithCap(belowMb).admitQuery("queueA", 0, 0, df)
      assert(after.getClass == v.getClass,
        s"executed plan under-admits: fresh=$v executed=$after " +
          s"(estimates $fresh vs $executed)")
    }
    assert(poolWithCap(aboveMb).admitQuery("queueA", 0, 0, df) == Admitted)
    // the executed estimate itself must not collapse toward zero
    assert(executed >= fresh / 2,
      s"executed estimate collapsed: $executed vs fresh $fresh")
  }

  test("assign binds the resolved pool to the thread's fair-scheduler slot") {
    val sc = spark.sparkContext
    val before = sc.getLocalProperty("spark.scheduler.pool")
    try {
      assert(poolsStrict.assign(spark, "queueA", "userA@X") == Right("root.queueA"))
      assert(sc.getLocalProperty("spark.scheduler.pool") == "root.queueA")
      // access denied leaves an error, with the reference's message shape
      val denied = poolsStrict.assign(spark, "queueB", "userA")
      assert(denied.isLeft && denied.swap.exists(_.contains("not authorized")))
      // unresolved pool is an error too
      assert(poolsStrict.assign(spark, "nope", "userA").isLeft)
    } finally sc.setLocalProperty("spark.scheduler.pool", before)
  }
}
