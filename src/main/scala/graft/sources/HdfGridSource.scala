package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, StringContains, StringEndsWith, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector over a DIRECTORY of HDF4 tiles — the MODIS
  * acquisition archive as a first-class Spark table (the reference
  * downloads per-tile `.hdf` files and walks their SDS subdatasets,
  * `ingest/modis/convertmodis.py:292-303`):
  *
  * {{{
  *   spark.read.format("graft.sources.HdfGridSource")
  *     .option("path", "/data/modis")     // dir, or a *.hdf glob
  *     .option("sds", "ndvi")             // omit → every SDS
  *     .load()   // → (path, sds, x, y, value)
  * }}}
  *
  * Scale shape ([[NcGridSource]]'s disciplines on the [[Hdf]] codec):
  *   - one InputPartition per (file × SDS) — a date's tile set fans
  *     out across tiles AND subdatasets, the per-layer mosaic
  *     parallelism the reference's per-subset loop implies; WIDE
  *     products (many SDS) cap at `maxSplitsPerFile` splits per file
  *     (default 8, r11): each split decodes the file once for a GROUP
  *     of subdatasets, so a 40-layer product costs 8 file reads, not
  *     40 — per-layer parallelism is preserved up to the cap and
  *     payload decode stays per-SDS either way;
  *   - the PLANNER reads only a bounded header prefix per file (DD
  *     blocks + SDS metadata — never pixels) to learn the SDS list;
  *     a planning-side failure plans one unprunable whole-file split
  *     so corrupt tiles fail loudly task-side (the r10 NcGridSource
  *     contract from day one);
  *   - `path` and `sds` predicates prune SPLITS at planning (reported
  *     unpushed, so Spark re-checks them post-scan — results never
  *     change, whole tiles/layers just never plan);
  *   - fill cells drop at the source (`keepFill=true` keeps them as
  *     NULL value rows). */
class HdfGridSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HdfGridSource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "HdfGridSource requires option(\"path\", ...)")
    new HdfGridTable(path, Option(properties.get("sds")),
      "true".equalsIgnoreCase(properties.getOrDefault("keepFill", "false")),
      properties.getOrDefault("maxSplitsPerFile", "8").toInt)
  }
}

object HdfGridSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("sds", StringType, nullable = false),
    StructField("x", IntegerType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("value", DoubleType, nullable = true)))

  def listFiles(pathOrGlob: String): Seq[String] =
    GridFiles.list(pathOrGlob, "hdf")

  /** Planner prefix: DD blocks + SDS metadata records are header-side
    * KBs in practice; 1 MB covers thousand-layer products. */
  private[graft] val HeaderPrefixBytes = 1 << 20

  private[graft] def planningHeader(file: String): Hdf.HdfFile = {
    val (prefix, len) = GridFiles.readPrefix(file, HeaderPrefixBytes)
    try Hdf.decodeHeader(prefix, len)
    catch { case _: Exception if len > prefix.length =>
      Hdf.decode(GridFiles.readBytes(file))
    }
  }
}

final class HdfGridTable(path: String, sds: Option[String],
    keepFill: Boolean, maxSplitsPerFile: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_hdf($path)"
  override def schema(): StructType = HdfGridSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HdfScanBuilder(path, sds, keepFill, maxSplitsPerFile)
}

final class HdfScanBuilder(path: String, sdsOpt: Option[String],
    keepFill: Boolean, maxSplitsPerFile: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = HdfGridSource.fullSchema
  private var pathPreds: Seq[String => Boolean] = Nil
  private var sdsPreds: Seq[String => Boolean] = Nil

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // split-pruning only: every filter is reported unpushed (Spark
  // re-evaluates post-scan), the planner just skips non-matching
  // (file × sds) splits entirely
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    filters.foreach {
      case EqualTo("path", v: String) => pathPreds :+= ((p: String) => p == v)
      case StringContains("path", v: String) =>
        pathPreds :+= ((p: String) => p.contains(v))
      case StringEndsWith("path", v: String) =>
        pathPreds :+= ((p: String) => p.endsWith(v))
      case StringStartsWith("path", v: String) =>
        pathPreds :+= ((p: String) => p.startsWith(v))
      case EqualTo("sds", v: String) => sdsPreds :+= ((s: String) => s == v)
      case StringContains("sds", v: String) =>
        sdsPreds :+= ((s: String) => s.contains(v))
      case StringStartsWith("sds", v: String) =>
        sdsPreds :+= ((s: String) => s.startsWith(v))
      case StringEndsWith("sds", v: String) =>
        sdsPreds :+= ((s: String) => s.endsWith(v))
      case _ => ()
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = Array.empty

  override def build(): Scan =
    new HdfScan(path, sdsOpt, required, keepFill, pathPreds, sdsPreds,
      maxSplitsPerFile)
}

final class HdfScan(path: String, sdsOpt: Option[String],
    required: StructType, keepFill: Boolean,
    pathPreds: Seq[String => Boolean] = Nil,
    sdsPreds: Seq[String => Boolean] = Nil,
    maxSplitsPerFile: Int = 8) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    GridFiles.layerSplits(HdfGridSource.listFiles(path),
      f => pathPreds.forall(_(f)),
      f => HdfGridSource.planningHeader(f).sds.map(_.name),
      n => sdsOpt.forall(_ == n) && sdsPreds.forall(_(n)), maxSplitsPerFile)
      .map { case (f, group) => HdfPartition(f, group): InputPartition }
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new HdfReaderFactory(required.fieldNames, sdsOpt, keepFill)
}

final case class HdfPartition(file: String, sds: Option[Seq[String]])
    extends InputPartition

final class HdfReaderFactory(fields: Array[String], sdsOpt: Option[String],
    keepFill: Boolean) extends PartitionReaderFactory {
  // field names resolved to int codes ONCE per reader (r8 discipline:
  // no string comparisons in the per-cell loop)
  private val FPath = 0; private val FSds = 1; private val FX = 2
  private val FY = 3; private val FValue = 4
  private val codes: Array[Int] = fields.map {
    case "path" => FPath
    case "sds" => FSds
    case "x" => FX
    case "y" => FY
    case "value" => FValue
    case other => throw new IllegalArgumentException(s"unknown column $other")
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[HdfPartition]
    new PartitionReader[InternalRow] {
      private val f = Hdf.decode(GridFiles.readBytes(p.file))
      // the fallback whole-file split reads every (option-matching) SDS
      private val names = p.sds.getOrElse(
        f.sds.map(_.name).filter(n => sdsOpt.forall(_ == n)))
      private val pathUtf = UTF8String.fromString(p.file)
      // external elements resolve sibling-relative to THIS tile file
      // (the Hdf5 external-link discipline — r14); memoized so the
      // partition's K datasets pay one read per sibling
      private val siblings = Hdf.memoizedSiblings(p.file)
      private val cells = names.iterator.flatMap { n =>
        val nUtf = UTF8String.fromString(n)
        Hdf.gridCells(f, n, siblings)
          .filter(c => keepFill || !c.value.isNaN)
          .map(c => (nUtf, c))
      }
      private var current: InternalRow = _

      override def next(): Boolean = {
        if (!cells.hasNext) return false
        val (nUtf, c) = cells.next()
        val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(codes.length)
        var i = 0
        while (i < codes.length) {
          codes(i) match {
            case FPath => row.update(i, pathUtf)
            case FSds => row.update(i, nUtf)
            case FX => row.setInt(i, c.x)
            case FY => row.setInt(i, c.y)
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
