package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector for the reference's gridded data model: a
  * deterministic synthetic (time × y × x) wind field — the Spark-native
  * analogue of opening a GRIB/NetCDF block
  * (`/root/reference/ingest/ecmwf_opendata/__init__.py:283` iterates
  * `ds[var].isel(time=i)` slices).
  *
  * Scale features demonstrated:
  *   - one InputPartition per time slice → a 1000-step forecast fans
  *     out across 1000 tasks, like per-timestamp COG processing;
  *   - SupportsPushDownRequiredColumns → reading only `u` never
  *     materializes `v` (column pruning reaches the source);
  *   - values are generated, not stored, so readers are zero-copy
  *     per-partition iterators.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.GridSource")
  *     .option("times", 4).option("height", 100).option("width", 100)
  *     .load()   // → (time int, y int, x int, u double, v double)
  * }}}
  */
class GridSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GridSource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GridTable(
      properties.getOrDefault("times", "4").toInt,
      properties.getOrDefault("height", "32").toInt,
      properties.getOrDefault("width", "32").toInt)
}

object GridSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("time", IntegerType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("x", IntegerType, nullable = false),
    StructField("u", DoubleType, nullable = false),
    StructField("v", DoubleType, nullable = false)))

  /** Cells materialized by the row reader — an ops/test counter (shared
    * JVM in local mode) that lets specs PROVE aggregate pushdown never
    * generated data rather than infer it from the plan. */
  val cellsGenerated = new java.util.concurrent.atomic.AtomicLong

  /** splitmix64 — deterministic value field. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Wind components in [-5, 5) m/s, deterministic in (t, y, x). */
  def uAt(t: Int, y: Int, x: Int): Double =
    (Math.floorMod(mix(t.toLong << 40 | y.toLong << 20 | x.toLong), 1000L) / 100.0) - 5.0
  def vAt(t: Int, y: Int, x: Int): Double =
    (Math.floorMod(mix(1L << 62 | t.toLong << 40 | y.toLong << 20 | x.toLong), 1000L) / 100.0) - 5.0
}

final class GridTable(times: Int, height: Int, width: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_grid(${times}x${height}x$width)"
  override def schema(): StructType = GridSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GridScanBuilder(times, height, width)
}

final class GridScanBuilder(times: Int, height: Int, width: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates {
  import org.apache.spark.sql.sources._

  private var required: StructType = GridSource.fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var aggGroups: Seq[String] = Nil
  private var aggFuncs: Seq[org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc] = Nil
  private var aggPushed = false

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept time-dimension predicates for PARTITION PRUNING — the DSv2
    * analogue of date-partition pruning on the 100 TB layout: a
    * 10-year archive scan with `time = today` plans ONE InputPartition
    * instead of 3650. The accepted shapes are evaluated EXACTLY at the
    * partition level (time is constant within a slice), so they are
    * consumed rather than returned as residual — which is also what
    * lets aggregate pushdown compose with them (Spark only pushes an
    * aggregate when no post-scan filter remains). Anything else stays
    * residual for Spark to re-apply. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(isExactTimeFilter)
    filters.filterNot(isExactTimeFilter)
  }
  override def pushedFilters(): Array[Filter] = pushed

  private def isExactTimeFilter(f: Filter): Boolean = f match {
    case EqualTo("time", _: Number) | GreaterThan("time", _: Number) |
         GreaterThanOrEqual("time", _: Number) | LessThan("time", _: Number) |
         LessThanOrEqual("time", _: Number) => true
    case In("time", vs) => vs.nonEmpty && vs.forall(_.isInstanceOf[Number])
    case _ => false
  }

  private def timeOk(t: Int): Boolean = pushed.forall {
    case EqualTo("time", v: Number) => t == v.intValue()
    case GreaterThan("time", v: Number) => t > v.intValue()
    case GreaterThanOrEqual("time", v: Number) => t >= v.intValue()
    case LessThan("time", v: Number) => t < v.intValue()
    case LessThanOrEqual("time", v: Number) => t <= v.intValue()
    case In("time", vs) => vs.exists { case v: Number => v.intValue() == t; case _ => false }
    case _ => true
  }

  /** Aggregate pushdown answered from CHUNK METADATA — the pattern a
    * production grid store (COG/Zarr per-chunk statistics) enables: a
    * COUNT(*)/MIN/MAX over the dimension columns, optionally grouped by
    * the time partition, never generates a single cell. A 10-year-
    * archive inventory query (`GROUP BY time COUNT(*)`) returns one
    * metadata row per slice. Pushdown is COMPLETE (each time slice is
    * exactly one group, groups are partition-disjoint; global aggs plan
    * one synthetic partition over the pruned slice list), so Spark
    * plans no aggregation at all. Value-column aggregates (u/v) are
    * declined — they need the data — and Spark falls back to the scan. */
  import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}

  private def refName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case fr: org.apache.spark.sql.connector.expressions.NamedReference
          if fr.fieldNames.length == 1 => Some(fr.fieldNames.head)
      case _ => None
    }
  private val MetaCols = Set("time", "y", "x")
  private def answerable(f: AggregateFunc): Boolean = f match {
    case _: CountStar => true
    case m: Min => refName(m.column).exists(MetaCols)
    case m: Max => refName(m.column).exists(MetaCols)
    case _ => false
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean = {
    val groups = agg.groupByExpressions.toSeq.map(refName)
    agg.aggregateExpressions.forall(answerable) &&
      (groups.isEmpty || groups == Seq(Some("time")))
  }

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!supportCompletePushDown(agg)) false
    else {
      aggGroups = agg.groupByExpressions.toSeq.flatMap(refName)
      aggFuncs = agg.aggregateExpressions.toSeq
      aggPushed = true
      true
    }
  }

  private def aggSchema: StructType = StructType(
    aggGroups.map(g => StructField(g, IntegerType, nullable = false)) ++
      aggFuncs.zipWithIndex.map {
        case (_: CountStar, i) => StructField(s"count_star_$i", LongType, nullable = false)
        case (m: Min, i) => StructField(s"min_${refName(m.column).get}_$i", IntegerType)
        case (m: Max, i) => StructField(s"max_${refName(m.column).get}_$i", IntegerType)
        case (f, _) => throw new IllegalStateException(s"unanswerable pushed agg $f")
      })

  private def aggRows(live: Array[Int]): Array[InternalRow] = {
    val cells = height.toLong * width
    def row(timeOpt: Option[Int]): InternalRow = {
      val vals: Seq[Any] = timeOpt.toSeq ++ aggFuncs.map {
        case _: CountStar => timeOpt.map(_ => cells).getOrElse(cells * live.length)
        case m: Min => refName(m.column).get match {
          case "y" => if (live.isEmpty && timeOpt.isEmpty) null else 0
          case "x" => if (live.isEmpty && timeOpt.isEmpty) null else 0
          case "time" => timeOpt.getOrElse(if (live.isEmpty) null else live.min)
        }
        case m: Max => refName(m.column).get match {
          case "y" => if (live.isEmpty && timeOpt.isEmpty) null else height - 1
          case "x" => if (live.isEmpty && timeOpt.isEmpty) null else width - 1
          case "time" => timeOpt.getOrElse(if (live.isEmpty) null else live.max)
        }
        case f => throw new IllegalStateException(s"unanswerable pushed agg $f")
      }
      InternalRow.fromSeq(vals)
    }
    if (aggGroups.nonEmpty) live.map(t => row(Some(t)))
    else Array(row(None)) // global aggregate: one synthetic metadata row
  }

  override def build(): Scan = {
    val live = (0 until times).filter(timeOk).toArray
    if (aggPushed) {
      val rows = aggRows(live)
      val schema = aggSchema
      new Scan with Batch {
        override def readSchema(): StructType = schema
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] =
          Array(GridAggPartition(rows))
        override def createReaderFactory(): PartitionReaderFactory =
          GridAggReaderFactory
      }
    } else new Scan with Batch with SupportsReportPartitioning with SupportsRuntimeFiltering {
      /** Times surviving RUNTIME filtering — dynamic partition pruning:
        * starts at the statically pruned list; when the grid joins a
        * filtered dimension, Spark evaluates the dim side first and
        * pushes the resulting time set through [[filter]] BEFORE
        * execution, so a 10-year archive joined to "this week's
        * products" plans 7 InputPartitions instead of 3650. Partial
        * application is always safe — the join re-applies the
        * predicate; pruning is purely a scan-size optimization. */
      private var activeTimes: Array[Int] = live
      override def readSchema(): StructType = required
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        activeTimes.map(t => GridPartition(t, height, width): InputPartition)
      override def createReaderFactory(): PartitionReaderFactory =
        new GridReaderFactory(required.fieldNames)
      override def filterAttributes():
          Array[org.apache.spark.sql.connector.expressions.NamedReference] =
        Array(org.apache.spark.sql.connector.expressions.Expressions.column("time"))
      override def filter(filters: Array[Filter]): Unit = {
        activeTimes = activeTimes.filter(t => filters.forall {
          case EqualTo("time", v: Number) => t == v.intValue()
          case In("time", vs) =>
            vs.exists { case v: Number => v.intValue() == t; case _ => false }
          case _ => true // not time-prunable: leave to the join
        })
      }
      /** Report the physical layout: one partition per time slice,
        * keyed by `time` (each InputPartition exposes its key via
        * HasPartitionKey). With `spark.sql.sources.v2.bucketing.enabled`
        * Catalyst recognizes the KeyGroupedPartitioning and plans
        * per-time aggregations WITHOUT a shuffle — the DSv2 analogue of
        * "the store is already partitioned by date, don't re-shuffle
        * to group by date" (spec-asserted zero-exchange). Runtime
        * filtering only ever SHRINKS the partition-value set, which
        * BatchScanExec accepts as a subset of the original grouping. */
      override def outputPartitioning():
          org.apache.spark.sql.connector.read.partitioning.Partitioning =
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions.identity("time")),
          activeTimes.length)
    }
  }
}

final case class GridAggPartition(rows: Array[InternalRow]) extends InputPartition

object GridAggReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[GridAggPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = rows(i)
      override def close(): Unit = ()
    }
  }
}

final case class GridPartition(time: Int, height: Int, width: Int)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(time)
}

final class GridReaderFactory(columns: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GridPartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      private val n = p.height * p.width
      override def next(): Boolean = {
        i += 1
        if (i < n) { GridSource.cellsGenerated.incrementAndGet(); true } else false
      }
      override def get(): InternalRow = {
        val y = i / p.width
        val x = i % p.width
        InternalRow.fromSeq(columns.toSeq.map {
          case "time" => p.time
          case "y" => y
          case "x" => x
          case "u" => GridSource.uAt(p.time, y, x)
          case "v" => GridSource.vAt(p.time, y, x)
        })
      }
      override def close(): Unit = ()
    }
  }
}
