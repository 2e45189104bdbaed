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
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  import org.apache.spark.sql.sources._

  private var required: StructType = GridSource.fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept time-dimension predicates for PARTITION PRUNING — the DSv2
    * analogue of date-partition pruning on the 100 TB layout: a
    * 10-year archive scan with `time = today` plans ONE InputPartition
    * instead of 3650. All filters are also returned as residual, so
    * Spark re-applies them post-scan (pruning only has to be sound,
    * not exact). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(isTimeFilter)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  private def isTimeFilter(f: Filter): Boolean = f match {
    case EqualTo("time", _) | GreaterThan("time", _) | GreaterThanOrEqual("time", _) |
         LessThan("time", _) | LessThanOrEqual("time", _) | In("time", _) => true
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

  override def build(): Scan = {
    val live = (0 until times).filter(timeOk).toArray
    new Scan with Batch {
      override def readSchema(): StructType = required
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        live.map(t => GridPartition(t, height, width): InputPartition)
      override def createReaderFactory(): PartitionReaderFactory =
        new GridReaderFactory(required.fieldNames)
    }
  }
}

final case class GridPartition(time: Int, height: Int, width: Int) extends InputPartition

final class GridReaderFactory(columns: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GridPartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      private val n = p.height * p.width
      override def next(): Boolean = { i += 1; i < n }
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
