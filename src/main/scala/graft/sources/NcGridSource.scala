package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector over a DIRECTORY of NetCDF-3 files — the
  * [[TiffGridSource]] twin for the reference's dominant transport
  * format (`cams_forecast`/`tamsat_rainfall`/`dustforecast` all land
  * `.nc` and slice `ds[var].isel(time=i)` per date):
  *
  * {{{
  *   spark.read.format("graft.sources.NcGridSource")
  *     .option("path", "/data/landing/tamsat")  // dir, or a *.nc glob
  *     .option("var", "rfe")
  *     .load()  // → (path, var, t, time, x, y, lon, lat, value)
  * }}}
  *
  * Scale shape (same disciplines as TiffGridSource):
  *   - one InputPartition per (file × time step): a 120-lead-hour CAMS
  *     forecast file fans out across 121 tasks, matching the
  *     reference's per-time-slice processing — not one task stuck
  *     decoding a whole multi-day cube;
  *   - SupportsPushDownRequiredColumns: a `value`-only projection
  *     skips per-cell georeferencing and timestamp boxing;
  *   - fill cells are dropped at the source (`keepFill=true` keeps
  *     them as NULL value rows); decode is task-side, the driver only
  *     lists files and reads HEADERS to learn each file's time count.
  */
class NcGridSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NcGridSource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "NcGridSource requires option(\"path\", ...)")
    val varName = properties.get("var")
    require(varName != null, "NcGridSource requires option(\"var\", ...)")
    new NcGridTable(path, varName,
      "true".equalsIgnoreCase(properties.getOrDefault("keepFill", "false")))
  }
}

object NcGridSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("var", StringType, nullable = false),
    StructField("t", IntegerType, nullable = false),
    StructField("time", TimestampType, nullable = true),
    StructField("x", IntegerType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("value", DoubleType, nullable = true)))

  /** Expand a path/glob to concrete file paths (a bare directory lists
    * its *.nc leaves). */
  def listFiles(pathOrGlob: String): Seq[String] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val p = new org.apache.hadoop.fs.Path(pathOrGlob)
    val fs = p.getFileSystem(conf)
    val expanded =
      if (fs.isDirectory(p)) fs.globStatus(new org.apache.hadoop.fs.Path(p, "*.nc"))
      else fs.globStatus(p)
    Option(expanded).toSeq.flatten.filter(_.isFile)
      .map(_.getPath.toString).sorted
  }

  private[sources] def readBytes(file: String): Array[Byte] = {
    val hp = new org.apache.hadoop.fs.Path(file)
    val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(hp)
    try in.readAllBytes() finally in.close()
  }

  /** Time-step count of `varName` in a file — header-only work: the
    * variable's shape along its time axis (1 when it has none). */
  private[sources] def timeSteps(bytes: Array[Byte], varName: String): Int = {
    val f = NetCdf.decode(bytes)
    val v = f.variable(varName)
    val tAxis = v.dimIds.map(f.dims(_).name.toLowerCase)
      .indexWhere(Set("time", "t").contains)
    if (tAxis < 0) 1 else math.max(1, f.shapeOf(v)(tAxis))
  }
}

final class NcGridTable(path: String, varName: String, keepFill: Boolean)
    extends Table with SupportsRead {
  override def name(): String = s"graft_nc($path, $varName)"
  override def schema(): StructType = NcGridSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NcScanBuilder(path, varName, keepFill)
}

final class NcScanBuilder(path: String, varName: String, keepFill: Boolean)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = NcGridSource.fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new NcScan(path, varName, required, keepFill)
}

final class NcScan(path: String, varName: String, required: StructType,
    keepFill: Boolean) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    // per-(file, time-step) split: the header read here is bounded
    // driver work (bytes are fetched once per file to size the split;
    // payload decode still happens in the tasks)
    NcGridSource.listFiles(path).flatMap { f =>
      val steps =
        try NcGridSource.timeSteps(NcGridSource.readBytes(f), varName)
        catch { case _: Exception => 1 } // defer the loud error to the task
      (0 until steps).map(NcPartition(f, _): InputPartition)
    }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new NcReaderFactory(required.fieldNames, varName, keepFill)
}

final case class NcPartition(file: String, timeIndex: Int) extends InputPartition

final class NcReaderFactory(fields: Array[String], varName: String,
    keepFill: Boolean) extends PartitionReaderFactory {
  // field names resolved to int codes ONCE per reader (the r8 review
  // discipline: no string comparisons in the per-cell loop)
  private val FPath = 0; private val FVar = 1; private val FT = 2
  private val FTime = 3; private val FX = 4; private val FY = 5
  private val FLon = 6; private val FLat = 7; private val FValue = 8
  private val codes: Array[Int] = fields.map {
    case "path" => FPath
    case "var" => FVar
    case "t" => FT
    case "time" => FTime
    case "x" => FX
    case "y" => FY
    case "lon" => FLon
    case "lat" => FLat
    case "value" => FValue
    case other => throw new IllegalArgumentException(s"unknown column $other")
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[NcPartition]
    new PartitionReader[InternalRow] {
      // only this split's time slice is read — the decode cost per
      // task is one 2-D slab, not the whole cube
      private val cells = NetCdf
        .gridCells(NetCdf.decode(NcGridSource.readBytes(p.file)), varName,
          onlyT = Some(p.timeIndex))
        .filter(c => keepFill || !c.value.isNaN)
      private val pathUtf = UTF8String.fromString(p.file)
      private val varUtf = UTF8String.fromString(varName)
      private var current: InternalRow = _

      override def next(): Boolean = {
        if (!cells.hasNext) return false
        val c = cells.next()
        val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(codes.length)
        var i = 0
        while (i < codes.length) {
          codes(i) match {
            case FPath => row.update(i, pathUtf)
            case FVar => row.update(i, varUtf)
            case FT => row.setInt(i, c.t)
            case FTime => c.timeMicros match {
              case Some(m) => row.setLong(i, m)
              case None => row.setNullAt(i)
            }
            case FX => row.setInt(i, c.x)
            case FY => row.setInt(i, c.y)
            case FLon => row.setDouble(i, c.lon)
            case FLat => row.setDouble(i, c.lat)
            case FValue =>
              if (c.value.isNaN) row.setNullAt(i) else row.setDouble(i, c.value)
          }
          i += 1
        }
        current = row
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
