package graft.engine

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.w3c.dom.Element

/** Request-pool service — the reference's admission-control front door
  * (util/RequestPoolService.java:78-455) re-expressed over Spark's fair
  * scheduler. The reference resolves each query to a YARN-style request
  * pool (allocation XML: queues, submit ACLs, placement rules), reads
  * the pool's limits, and admission-control admits/queues/rejects; on
  * Spark the same resolution decides the `spark.scheduler.pool` local
  * property (the fair-scheduler hook every job submitted from that
  * thread inherits), and the limits drive the same admit/queue/reject
  * decision.
  *
  * Faithful behaviors (each spec-pinned):
  *  - user short names: 'user@DOMAIN' and 'user/host' resolve as 'user'
  *    (RequestPoolService.assignToPool:420-432).
  *  - placement: an empty requested pool means "the default queue", and
  *    the rule chain (specified → user → default → reject) mirrors the
  *    YARN QueuePlacementPolicy the reference delegates to; a
  *    create=false rule falls through when its pool is undeclared; a
  *    resolution that reaches `reject` yields no pool, which the
  *    reference reports as OK-with-no-resolved-pool
  *    (resolveRequestPool:291-330).
  *  - ACLs: aclSubmitApps is a user list, '*' admits everyone, and an
  *    ancestor queue's ACL admits into its children (hasAccess:443-455
  *    via the YARN queue hierarchy).
  *  - per-pool limits: a per-pool key overrides a global default key
  *    overrides the built-in default (getLlamaPoolConfigValue:396-410);
  *    -1 means unlimited; max_mem reported in bytes from "N mb"
  *    maxResources (getPoolConfig:352-384).
  *  - admission: a pool with max_requests=0 or max_mem=0 is disabled
  *    (reject), running < max_requests admits, queued < max_queued
  *    queues, otherwise reject-queue-full — the reference's
  *    AdmissionController decision surface at the granularity this
  *    library owns (Spark's scheduler does the actual time-slicing).
  */
object RequestPools {

  /** `user@REALM` / `user/host@REALM` → `user` (Kerberos short name). */
  def shortName(user: String): String =
    user.takeWhile(c => c != '@' && c != '/')

  sealed trait PlacementRule
  /** Use the requested pool (skipped when the request is the default). */
  final case class Specified(create: Boolean) extends PlacementRule
  /** Pool named after the submitting user (root.<user>). */
  final case class UserRule(create: Boolean) extends PlacementRule
  /** A fixed fallback pool. */
  final case class DefaultRule(pool: String) extends PlacementRule
  /** Terminate resolution with no pool. */
  case object Reject extends PlacementRule

  final case class PoolSpec(
      name: String,
      /** aclSubmitApps user list; '*' admits everyone; empty admits no
        * one directly (ancestors may still admit). */
      acl: Set[String],
      /** bytes; -1 = unlimited. */
      maxMemBytes: Long)

  final case class PoolConfig(
      maxRequests: Int,
      maxQueued: Int,
      maxMemBytes: Long,
      queueTimeoutMs: Option[Int],
      defaultQueryOptions: String)

  sealed trait Admission
  case object Admitted extends Admission
  case object Queued extends Admission
  final case class Rejected(reason: String) extends Admission

  val DefaultQueueName = "root.default"
  val DefaultMaxRequests = 200 // reference LLAMA_MAX_PLACED_RESERVATIONS_DEFAULT
  val DefaultMaxQueued = 200   // reference LLAMA_MAX_QUEUED_RESERVATIONS_DEFAULT

  /** Parse a fair-scheduler allocation XML (the reference's config
    * format: nested <queue> with <aclSubmitApps>/<maxResources>, plus
    * <queuePlacementPolicy>). Only the elements the reference consumes
    * are read. */
  def fromXml(xml: String, limits: Map[String, String] = Map.empty): RequestPools = {
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new ByteArrayInputStream(xml.getBytes(StandardCharsets.UTF_8)))
    val root = doc.getDocumentElement

    def childElems(e: Element, tag: String): Seq[Element] = {
      val nl = e.getChildNodes
      (0 until nl.getLength).map(nl.item).collect {
        case c: Element if c.getTagName == tag => c
      }
    }
    def text(e: Element, tag: String): Option[String] =
      childElems(e, tag).headOption.map(_.getTextContent)

    def parseMem(s: String): Long = {
      // "1024 mb, 2 vcores" → bytes; absent/garbage → unlimited
      val m = "(?i)(\\d+)\\s*mb".r.findFirstMatchIn(s)
      m.map(_.group(1).toLong * 1024L * 1024L).getOrElse(-1L)
    }

    val pools = Seq.newBuilder[PoolSpec]
    def walk(e: Element, prefix: String): Unit = {
      val name =
        if (prefix.isEmpty) e.getAttribute("name")
        else prefix + "." + e.getAttribute("name")
      val acl = text(e, "aclSubmitApps")
        .map(_.trim.split("\\s+").filter(_.nonEmpty).toSet)
        .getOrElse(Set.empty[String])
      pools += PoolSpec(name, acl,
        text(e, "maxResources").map(parseMem).getOrElse(-1L))
      childElems(e, "queue").foreach(walk(_, name))
    }
    childElems(root, "queue").foreach(walk(_, ""))

    val rules: Seq[PlacementRule] =
      childElems(root, "queuePlacementPolicy").headOption.toSeq
        .flatMap(childElems(_, "rule"))
        .flatMap { r =>
          val create = r.getAttribute("create") != "false"
          r.getAttribute("name") match {
            case "specified" => Some(Specified(create))
            case "user"      => Some(UserRule(create))
            case "default"   =>
              val q = Option(r.getAttribute("queue")).filter(_.nonEmpty)
              Some(DefaultRule(q.getOrElse(DefaultQueueName)))
            case "reject"    => Some(Reject)
            case _           => None
          }
        }
    // YARN's implicit policy when none is declared: specified then
    // user-with-create — the reference inherits this default too.
    val effective =
      if (rules.nonEmpty) rules
      else Seq(Specified(create = true), UserRule(create = true))
    new RequestPools(pools.result().map(p => p.name -> p).toMap, effective, limits)
  }

  def fromXmlFile(path: String, limits: Map[String, String] = Map.empty): RequestPools =
    fromXml(new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8),
      limits)
}

final class RequestPools(
    val pools: Map[String, RequestPools.PoolSpec],
    val rules: Seq[RequestPools.PlacementRule],
    /** llama-site analogue: "<key>.<pool>" per-pool entries override
      * bare "<key>" defaults. Keys: max-requests, max-queued,
      * queue-timeout-ms, default-query-options. */
    val limits: Map[String, String]) {
  import RequestPools._

  private def normalize(pool: String): String =
    if (pool.isEmpty || pool.startsWith("root.") || pool == "root") pool
    else "root." + pool

  private def declared(pool: String): Boolean = pools.contains(normalize(pool))

  /** Resolve the pool for (requestedPool, user) through the placement
    * rules. None = the policy rejected (reference: OK status with no
    * resolved_pool). */
  def resolve(requestedPool: String, user: String): Option[String] = {
    val req = normalize(
      if (requestedPool.isEmpty) DefaultQueueName else requestedPool)
    val u = shortName(user)
    rules.view.flatMap {
      case Specified(create) =>
        if (req == DefaultQueueName) None // "specified" skips the default
        else if (declared(req) || create) Some(req)
        else None
      case UserRule(create) =>
        val p = "root." + u
        if (declared(p) || create) Some(p) else None
      case DefaultRule(pool) =>
        Some(normalize(pool))
      case Reject => Some("") // sentinel: terminate with no pool
    }.headOption.filter(_.nonEmpty)
  }

  /** aclSubmitApps check with YARN's ancestor inheritance. */
  def hasAccess(pool: String, user: String): Boolean = {
    val u = shortName(user)
    def allows(p: PoolSpec): Boolean = p.acl.contains("*") || p.acl.contains(u)
    // the pool itself, then each ancestor up to root
    Iterator.iterate(normalize(pool))(p => p.take(p.lastIndexOf('.').max(0)))
      .takeWhile(_.nonEmpty)
      .flatMap(pools.get)
      .exists(allows)
  }

  /** Per-pool limits with the reference's key-precedence:
    * "<key>.<pool>" then "<key>" then built-in default. */
  def poolConfig(pool: String): PoolConfig = {
    val p = normalize(pool)
    def intConf(key: String, default: Int): Int =
      limits.get(s"$key.$p").orElse(limits.get(key)).map(_.toInt)
        .getOrElse(default)
    PoolConfig(
      maxRequests = intConf("max-requests", DefaultMaxRequests),
      maxQueued = intConf("max-queued", DefaultMaxQueued),
      maxMemBytes = pools.get(p).map(_.maxMemBytes).getOrElse(-1L),
      queueTimeoutMs = Some(intConf("queue-timeout-ms", -1)).filter(_ > 0),
      defaultQueryOptions = limits.get(s"default-query-options.$p")
        .orElse(limits.get("default-query-options")).getOrElse(""))
  }

  /** The admit/queue/reject decision given the pool's current load. */
  def admit(pool: String, running: Int, queued: Int): Admission = {
    val cfg = poolConfig(pool)
    if (cfg.maxRequests == 0 || cfg.maxMemBytes == 0)
      Rejected(s"disabled pool ${normalize(pool)}")
    else if (cfg.maxRequests < 0 || running < cfg.maxRequests) Admitted
    else if (cfg.maxQueued < 0 || queued < cfg.maxQueued) Queued
    else Rejected(s"queue full in pool ${normalize(pool)} " +
      s"(max_queued=${cfg.maxQueued})")
  }

  /** Memory-aware admission — the reference's other rejection axis
    * (AdmissionController: "request memory needed ... exceeds pool
    * limit", fed by Planner.computeResourceReqs' per-host estimate): a
    * query whose estimated per-host memory exceeds the pool's max_mem
    * can NEVER run there, so it is rejected outright rather than
    * queued to time out. */
  def admit(pool: String, running: Int, queued: Int,
      perHostMemBytes: Long): Admission = {
    val cfg = poolConfig(pool)
    if (cfg.maxMemBytes > 0 && perHostMemBytes > cfg.maxMemBytes)
      Rejected(s"memory estimate ${perHostMemBytes}B exceeds pool " +
        s"${normalize(pool)} limit ${cfg.maxMemBytes}B")
    else admit(pool, running, queued)
  }

  /** Plan-and-admit: estimate the query's per-host memory from its
    * physical plan ([[ResourceEstimates]]) and run the memory-aware
    * decision — the full reference flow (plan → resource estimate →
    * admission) on Spark surfaces. */
  def admitQuery(pool: String, running: Int, queued: Int,
      df: org.apache.spark.sql.DataFrame): Admission =
    admit(pool, running, queued, ResourceEstimates.of(df).perHostBytes)

  /** Resolve + ACL-check + bind: on success the calling thread's jobs
    * run in the resolved fair-scheduler pool (Spark's
    * `spark.scheduler.pool` local property). Left = the reference's
    * error strings. */
  def assign(spark: SparkSession, requestedPool: String, user: String): Either[String, String] =
    resolve(requestedPool, user) match {
      case None =>
        Left(s"Request pool not resolved for user '$user' " +
          s"(requested '$requestedPool')")
      case Some(pool) if !hasAccess(pool, user) =>
        Left(s"User '${shortName(user)}' is not authorized to submit to pool '$pool'")
      case Some(pool) =>
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
        Right(pool)
    }
}
