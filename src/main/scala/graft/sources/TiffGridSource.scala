package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector over a DIRECTORY of GeoTIFFs — the raster
  * archive as a first-class Spark table (the reference's per-date COG
  * layout `{namespace}/{namespace}_{date}.tif` read back as rows):
  *
  * {{{
  *   spark.read.format("graft.sources.TiffGridSource")
  *     .option("path", "/data/out/rainfall")  // dir, or a *.tif glob
  *     .load()   // → (path, x, y, lon, lat, value)
  * }}}
  *
  * Scale shape (GridSource's disciplines on a REAL codec,
  * [[GeoTiff]]):
  *   - one InputPartition per FILE — a 10-year daily archive fans out
  *     across ~3650 tasks, the per-timestamp parallelism the
  *     reference's per-COG processing implies;
  *   - SupportsPushDownRequiredColumns: a `value`-only projection
  *     never computes lon/lat per pixel, and `count(*)` decodes
  *     headers + pixel grid without building row objects' georef;
  *   - nodata pixels are dropped at the source (option
  *     `keepNodata=true` keeps them as NULL value rows) — the decode
  *     stays task-side, the driver only lists files. */
class TiffGridSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TiffGridSource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "TiffGridSource requires option(\"path\", ...)")
    new TiffGridTable(path,
      "true".equalsIgnoreCase(properties.getOrDefault("keepNodata", "false")))
  }
}

object TiffGridSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("x", IntegerType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("value", DoubleType, nullable = true)))

  /** Expand a path/glob to concrete file paths (Hadoop FS semantics;
    * a bare directory lists its *.tif AND *.tif.gz leaves — the
    * CHIRPS distribution ships gzip-wrapped TIFFs, which
    * [[GeoTiff.decode]] unwraps transparently task-side). */
  def listFiles(pathOrGlob: String): Seq[String] =
    GridFiles.list(pathOrGlob, "tif", "tif.gz")
}

final class TiffGridTable(path: String, keepNodata: Boolean)
    extends Table with SupportsRead {
  override def name(): String = s"graft_tiff($path)"
  override def schema(): StructType = TiffGridSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TiffScanBuilder(path, keepNodata)
}

final class TiffScanBuilder(path: String, keepNodata: Boolean)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = TiffGridSource.fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new TiffScan(path, required, keepNodata)
}

final class TiffScan(path: String, required: StructType, keepNodata: Boolean)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    TiffGridSource.listFiles(path).map(TiffPartition(_): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new TiffReaderFactory(required.fieldNames, keepNodata)
}

final case class TiffPartition(file: String) extends InputPartition

final class TiffReaderFactory(fields: Array[String], keepNodata: Boolean)
    extends PartitionReaderFactory {
  // field names resolved to int codes ONCE per reader — the per-pixel
  // loop must not do string comparisons (review finding r8)
  private val FPath = 0; private val FX = 1; private val FY = 2
  private val FLon = 3; private val FLat = 4; private val FValue = 5
  private val codes: Array[Int] = fields.map {
    case "path" => FPath
    case "x" => FX
    case "y" => FY
    case "lon" => FLon
    case "lat" => FLat
    case "value" => FValue
    case other => throw new IllegalArgumentException(s"unknown column $other")
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[TiffPartition].file
    new PartitionReader[InternalRow] {
      private val r = GeoTiff.decode(GridFiles.readBytes(file))
      private val pathUtf = UTF8String.fromString(file)
      private var x = -1
      private var y = 0
      private var current: InternalRow = _

      override def next(): Boolean = {
        while (true) {
          x += 1
          if (x == r.width) { x = 0; y += 1 }
          if (y >= r.height) return false
          val v = r.value(x, y)
          val isNd = r.isNodata(v)
          if (!isNd || keepNodata) {
            // build ONLY the pruned columns — a value-only projection
            // never computes per-pixel georeferencing
            val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(codes.length)
            var i = 0
            while (i < codes.length) {
              codes(i) match {
                case FPath => row.update(i, pathUtf)
                case FX => row.setInt(i, x)
                case FY => row.setInt(i, y)
                case FLon => row.setDouble(i, r.lonOf(x))
                case FLat => row.setDouble(i, r.latOf(y))
                case FValue =>
                  if (isNd) row.setNullAt(i) else row.setDouble(i, v)
              }
              i += 1
            }
            current = row
            return true
          }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
