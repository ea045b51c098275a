package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, EqualTo}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 implementation of the reference's external-data-source
  * API (catalog/DataSourceTable.java:1-260; executor contract
  * prepare/open/getNext/close in
  * extdatasource/ExternalDataSourceExecutor.java:171-207, planned by
  * DataSourceScanNode.java:1-375):
  *
  *  - prepare() "offers" the query's conjuncts to the source, which
  *    ACCEPTS the ones it can evaluate and leaves the rest to the engine
  *    → [[SupportsPushDownFilters]]: range/equality conjuncts on `id`
  *    are accepted (evaluated inside the source by narrowing the served
  *    id range); everything else is returned as residual for Spark.
  *  - slot materialization (only referenced columns are served)
  *    → [[SupportsPushDownRequiredColumns]].
  *  - scan-range generation (HdfsScanNode.computeScanRangeLocations
  *    analogue) → the id range is split into [[ExtInputPartition]]s.
  *
  * The table is a deterministic generated relation, so a SQL oracle can
  * re-derive it exactly:
  *   id BIGINT = 0..rows-1, val DOUBLE = id * 0.5,
  *   tag STRING = 'even' | 'odd'.
  * Usage: spark.read.format("graft.sources.ExtDataSource")
  *   .option("rows", n).option("partitions", p).load()
  * Streaming: spark.readStream with the same options serves the range
  * incrementally, `batchRows` ids per micro-batch ([[ExtMicroBatchStream]]).
  */
class ExtDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ExtDataSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ExtTable(
      rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      partitions = Option(properties.get("partitions")).map(_.toInt).getOrElse(4),
      batchRows = Option(properties.get("batchRows")).map(_.toLong).getOrElse(250L))
}

object ExtDataSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false)))
}

private[sources] class ExtTable(rows: Long, partitions: Int, batchRows: Long)
  extends Table with SupportsRead {
  override def name(): String = s"ext_source($rows rows)"
  override def schema(): StructType = ExtDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ExtScanBuilder(rows, partitions, batchRows)
}

private[graft] class ExtScanBuilder(rows: Long, partitions: Int, batchRows: Long = 250L)
  extends ScanBuilder
  with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns
  with SupportsPushDownAggregates
  with SupportsPushDownLimit
  with SupportsPushDownTopN {

  private var lo: Long = 0L            // inclusive
  private var hi: Long = rows          // exclusive
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = ExtDataSource.schema
  private var hadResidual = false
  private var pushedAgg: Option[Aggregation] = None

  // prepare(): accept range/equality conjuncts on id, reject the rest
  // (ExternalDataSourceExecutor offers each conjunct; rejected ones stay
  // with the engine — DataSourceScanNode keeps them as residuals).
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // saturating successor: v + 1 on Long.MaxValue must not wrap (an
    // accepted conjunct is never re-evaluated by Spark, so an overflow
    // here silently returns wrong rows)
    def succ(v: Long): Long = if (v == Long.MaxValue) v else v + 1
    val (ok, residual) = filters.partition {
      case GreaterThan("id", v: Long) => lo = math.max(lo, succ(v)); true
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case LessThan("id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, succ(v)); true
      case EqualTo("id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, succ(v)); true
      case _ => false
    }
    accepted = ok
    hadResidual = residual.nonEmpty
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // Aggregate pushdown — the "source evaluates the aggregate" half of
  // the external-source contract (a parquet footer count, an index-only
  // MIN/MAX, a remote system's own aggregation). COUNT(*) / MIN(id) /
  // MAX(id) with no GROUP BY are computable in O(1) from the
  // filter-narrowed [lo, hi) range, so the scan serves ONE row and no
  // row data ever moves. Only COMPLETE pushdown is claimed, and only
  // when every conjunct was accepted (a residual filter would make the
  // range-derived answer wrong — Spark also refuses to push aggregates
  // past post-scan filters, this guard keeps the source honest on its
  // own).
  private def isIdRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case nr: NamedReference => nr.fieldNames.sameElements(Array("id"))
      case _ => false
    }
  private def isTagRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case nr: NamedReference => nr.fieldNames.sameElements(Array("tag"))
      case _ => false
    }
  private def canPush(agg: Aggregation): Boolean =
    !hadResidual &&
      // no grouping, or grouping on exactly `tag` — per-parity answers
      // are still O(1) range arithmetic
      (agg.groupByExpressions.isEmpty ||
        (agg.groupByExpressions.length == 1 && isTagRef(agg.groupByExpressions.head))) &&
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => isIdRef(m.column)
        case m: Max => isIdRef(m.column)
        case _ => false
      }
  override def supportCompletePushDown(agg: Aggregation): Boolean = canPush(agg)
  override def pushAggregation(agg: Aggregation): Boolean =
    canPush(agg) && { pushedAgg = Some(agg); true }

  // LIMIT pushdown: ANY `limit` rows satisfy SQL LIMIT semantics, so the
  // served range narrows to its first `limit` ids. Reported as PARTIAL
  // (Spark keeps its own Limit above) — the point is the data reduction
  // at the source, the way a remote system honors a row cap.
  //
  // Both LIMIT and TopN refuse when a residual filter exists: Spark's
  // V2ScanRelationPushDown only pushes a limit when the scan has no
  // post-scan filter, but that precondition lives in Spark, not in this
  // API's contract — if it ever relaxed, serving only the first `limit`
  // ids of a residually-filtered range would under-produce rows. The
  // guard mirrors canPush and keeps the source correct on its own.
  override def pushLimit(limit: Int): Boolean =
    !hadResidual && {
      hi = math.min(hi, if (lo > Long.MaxValue - limit) Long.MaxValue else lo + limit)
      true
    }
  // TopN pushdown on the id ordering: the range is generated in id
  // order, so the top-N ids are a prefix (ASC) or suffix (DESC) of the
  // range. Also PARTIAL — Spark's sort+limit runs over N rows, not the
  // whole relation.
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      limit: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.SortDirection
    if (hadResidual || orders.length != 1 || !isIdRef(orders(0).expression())) false
    else {
      orders(0).direction() match {
        case SortDirection.ASCENDING =>
          hi = math.min(hi, if (lo > Long.MaxValue - limit) Long.MaxValue else lo + limit)
        case SortDirection.DESCENDING =>
          lo = math.max(lo, hi - limit) // hi - limit < 0 keeps lo (no wrap: hi >= 0)
      }
      true
    }
  }
  override def isPartiallyPushed(): Boolean = true

  override def build(): Scan = pushedAgg match {
    case Some(agg) if agg.groupByExpressions.isEmpty =>
      new ExtAggScan(lo, math.max(lo, hi), agg)
    case Some(agg) =>
      new ExtGroupedAggScan(lo, math.max(lo, hi), agg)
    case None => new ExtScan(lo, math.max(lo, hi), partitions, required, batchRows)
  }
}

/** One-row scan serving a completely-pushed aggregation over the
  * filter-narrowed id range: COUNT(*) = span, MIN(id) = lo, MAX(id) =
  * hi-1 (NULL min/max on an empty range, matching SQL semantics). */
private[sources] class ExtAggScan(lo: Long, hi: Long, agg: Aggregation)
  extends Scan with Batch with SupportsReportStatistics {
  private val span = math.max(0L, hi - lo)
  // a completely-pushed ungrouped aggregation serves exactly one row —
  // report it, or the planner costs this scan at the default (huge) size
  override def estimateStatistics(): Statistics = new Statistics {
    override def numRows(): util.OptionalLong = util.OptionalLong.of(1L)
    override def sizeInBytes(): util.OptionalLong =
      util.OptionalLong.of(8L * math.max(1, agg.aggregateExpressions.length))
  }
  override def readSchema(): StructType = StructType(
    agg.aggregateExpressions.zipWithIndex.map {
      case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
      case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"ext_source pushed aggregation ${agg.aggregateExpressions.mkString(",")} over [$lo, $hi)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(ExtRange(lo, hi))
  override def createReaderFactory(): PartitionReaderFactory = {
    val values: Array[Any] = agg.aggregateExpressions.map {
      case _: CountStar => span: Any
      case _: Min => if (span > 0) (lo: Any) else null
      case _: Max => if (span > 0) (hi - 1: Any) else null
      case other => throw new IllegalStateException(s"unexpected pushed agg $other")
    }
    new ExtRowsFactory(Seq(values.toIndexedSeq))
  }
}

/** Grouped complete pushdown — GROUP BY tag with COUNT(*)/MIN(id)/
  * MAX(id): tag is id parity, so every per-group answer is O(1) range
  * arithmetic over [lo, hi). Emits one row per NON-EMPTY group (SQL
  * GROUP BY semantics: an empty group produces no row), schema =
  * grouping column then aggregates positionally, per the DSv2 contract. */
private[sources] class ExtGroupedAggScan(lo: Long, hi: Long, agg: Aggregation)
  extends Scan with Batch with SupportsReportStatistics {
  // grouped on id parity: at most two groups, one row each
  override def estimateStatistics(): Statistics = new Statistics {
    override def numRows(): util.OptionalLong = util.OptionalLong.of(2L)
    override def sizeInBytes(): util.OptionalLong =
      util.OptionalLong.of(2L * (20L + 8L * math.max(1, agg.aggregateExpressions.length)))
  }
  override def readSchema(): StructType = StructType(
    StructField("tag", StringType, nullable = false) +:
      agg.aggregateExpressions.zipWithIndex.map {
        case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
        case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
      })
  override def toBatch: Batch = this
  override def description(): String =
    s"ext_source pushed aggregation GROUP BY tag ${agg.aggregateExpressions.mkString(",")} over [$lo, $hi)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(ExtRange(lo, hi))
  override def createReaderFactory(): PartitionReaderFactory = {
    def groupRow(tag: String): Option[Seq[Any]] = {
      val even = tag == "even"
      // first/last id of this parity inside [lo, hi), if any
      def first: Long = if ((lo % 2 == 0) == even) lo else lo + 1
      def last: Long = if (((hi - 1) % 2 == 0) == even) hi - 1 else hi - 2
      if (hi <= lo || first > last) None
      else {
        val n = (last - first) / 2 + 1
        Some(tag +: agg.aggregateExpressions.toSeq.map {
          case _: CountStar => n: Any
          case _: Min => first: Any
          case _: Max => last: Any
          case other => throw new IllegalStateException(s"unexpected pushed agg $other")
        })
      }
    }
    new ExtRowsFactory(Seq("even", "odd").flatMap(groupRow))
  }
}

/** Serves a fixed, driver-computed list of rows (UTF8String-converting
  * strings) — the reader behind both pushed-aggregation scans. */
private[sources] class ExtRowsFactory(rows: Seq[Seq[Any]])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val it = rows.iterator
      private var cur: Seq[Any] = _
      override def next(): Boolean = { val r = it.hasNext; if (r) cur = it.next(); r }
      override def get(): InternalRow = InternalRow.fromSeq(cur.map {
        case s: String => UTF8String.fromString(s)
        case v => v
      })
      override def close(): Unit = ()
    }
}

private[graft] case class ExtRange(from: Long, until: Long) extends InputPartition

private[sources] class ExtScan(
    lo: Long, hi: Long, partitions: Int, required: StructType,
    batchRows: Long = 250L)
  extends Scan with Batch with SupportsRuntimeV2Filtering
  with SupportsReportStatistics {
  // Runtime (join-derived) narrowing on top of the compile-time [lo, hi):
  // when this scan probes a broadcast join, Spark hands the build side's
  // key set here BEFORE partition planning (the DSv2 twin of the
  // reference's runtime filters, planner/RuntimeFilterGenerator.java) —
  // the served range shrinks to the keys' envelope. Serving a SUPERSET
  // of the matching ids is the contract (the join still discards
  // non-matches), so the envelope is correct — and equally, any
  // predicate shape this code does not positively recognize (including
  // one with no Long literals) must leave the range whole rather than
  // guess at a narrowing.
  private var rlo: Long = lo
  private var rhi: Long = hi
  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("id"))
  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit =
    predicates.foreach { p =>
      val longs = p.children().collect {
        case l: org.apache.spark.sql.connector.expressions.Literal[_]
          if l.dataType() == LongType => l.value().asInstanceOf[Long]
      }
      p.name() match {
        case "IN" | "=" if longs.nonEmpty =>
          rlo = math.max(rlo, longs.min)
          rhi = math.min(rhi, if (longs.max == Long.MaxValue) Long.MaxValue else longs.max + 1)
        case _ => () // unrecognized shape or value type: full range stays correct
      }
    }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // Post-pushdown statistics (the catalog-stats half of the reference's
  // join costing, SingleNodePlanner.createCheapestJoinPlan: scan
  // cardinality drives build-side choice): DSv2 asks the BUILT scan, so
  // the row count reflects the filter-narrowed range and the byte size
  // the pruned columns — a narrowed scan of a huge table correctly
  // becomes broadcast-eligible, an un-narrowed one correctly does not.
  override def estimateStatistics(): Statistics = new Statistics {
    private val span = math.max(0L, rhi - rlo)
    private val rowWidth = required.fields.map(_.dataType match {
      case LongType | DoubleType => 8L
      case _ => 20L // tag strings + per-field overhead, conservative
    }).sum.max(1L)
    override def numRows(): util.OptionalLong = util.OptionalLong.of(span)
    override def sizeInBytes(): util.OptionalLong =
      util.OptionalLong.of(span * rowWidth)
  }

  // rlo/rhi so a post-runtime-filter EXPLAIN shows the range actually
  // served, not the stale compile-time one (they start equal)
  override def description(): String =
    s"ext_source range [$rlo, $rhi) cols=${required.fieldNames.mkString(",")}"

  // scan-range generation: split the (filter- and runtime-narrowed) id range
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, partitions)
    val span = math.max(0L, rhi - rlo)
    val step = math.max(1L, (span + n - 1) / n)
    (rlo until rhi by step).map(s => ExtRange(s, math.min(s + step, rhi))).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ExtReaderFactory(required)

  // The streaming half of the external-source contract: the same
  // generated relation served incrementally, `batchRows` ids per
  // micro-batch. The reference's API is batch-only (its executor is
  // prepare/open/getNext/close per scan) — this is the §7 extension of
  // the same source to Structured Streaming, the way a remote system
  // with an append log would be consumed.
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ExtMicroBatchStream(lo, hi, batchRows, required)
}

/** Offset = how many ids from the range start have been made available.
  * JSON round-trip is the raw long, so restarts resume exactly. */
private[graft] case class ExtOffset(exclusiveEnd: Long)
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = exclusiveEnd.toString
}

/** Micro-batch view of the generated id range: `latestOffset` reveals up
  * to `batchRows` further ids per trigger (simulating an external system
  * whose log grows between polls, and giving processAllAvailable real
  * multi-batch behavior), until the whole [lo, hi) range is served
  * exactly once across batches. State is the offset alone — restart from
  * a checkpoint replans [start, end) deterministically. */
private[graft] class ExtMicroBatchStream(
    lo: Long, hi: Long, batchRows: Long, required: StructType)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private var revealed: Long = lo

  override def initialOffset(): Offset = ExtOffset(lo)
  override def latestOffset(): Offset = {
    revealed = math.min(hi, revealed + math.max(1L, batchRows))
    ExtOffset(revealed)
  }
  // On a checkpointed restart Spark rebuilds this object (revealed = lo)
  // and replays the logged offsets through deserializeOffset/commit —
  // ratcheting `revealed` up to them here is what keeps latestOffset
  // from REGRESSING behind the committed offset and re-serving ids that
  // already reached the sink.
  override def deserializeOffset(json: String): Offset = {
    val v = json.toLong
    revealed = math.max(revealed, v)
    ExtOffset(v)
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ExtOffset].exclusiveEnd
    val e = end.asInstanceOf[ExtOffset].exclusiveEnd
    if (e <= s) Array.empty else Array(ExtRange(s, e))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ExtReaderFactory(required)
  override def commit(end: Offset): Unit =
    revealed = math.max(revealed, end.asInstanceOf[ExtOffset].exclusiveEnd)
  override def stop(): Unit = ()
}

private[sources] class ExtReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val ExtRange(from, until) = partition.asInstanceOf[ExtRange]
    new PartitionReader[InternalRow] {
      private var id = from - 1
      override def next(): Boolean = { id += 1; id < until }
      override def get(): InternalRow = {
        val values = required.fieldNames.map {
          case "id" => id
          case "val" => id * 0.5
          case "tag" => UTF8String.fromString(if (id % 2 == 0) "even" else "odd")
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
