package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ext.Multimodal.MediaCodec

/** DataSource V2 reader for the GVID frame container (the multi-frame
  * media blob format of [[graft.ext.Multimodal]]): each `*.gvid` file
  * under `path` becomes one input partition; each frame becomes a row
  * with its decoded dimensions and Rec.601 luma.
  *
  * The point of going through DSv2 instead of `binaryFile` +
  * `mapPartitions` is that the SOURCE sees the required schema:
  * `SupportsPushDownRequiredColumns` hands the reader the pruned column
  * set, and when no pixel-derived column (width/height/mean_lum) is
  * required the reader walks the container structure only and never
  * pixel-decodes a frame — the scan cost tracks the projection, which
  * is the property that matters when the 100 TB corpus is media blobs
  * and the query is `SELECT file, count(*)`. Partition planning is one
  * partition per file (the natural split for per-file codecs);
  * `SourcesSpec` asserts row parity with the direct decoder, the pruned
  * ReadSchema in the plan, and decode-free metadata scans.
  *
  * Usage: `spark.read.format("graft.sources.GvidSource").load(dir)`.
  */
class GvidSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = GvidSource.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new GvidTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object GvidSource {
  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_lum", DoubleType, nullable = false)))

  /** True if any required column forces a pixel decode. */
  def needsDecode(required: StructType): Boolean =
    required.fieldNames.exists(f => f == "width" || f == "height" || f == "mean_lum")
}

class GvidTable(path: String) extends Table with SupportsRead {
  require(path != null, "gvid source requires a path")
  override def name(): String = s"gvid:$path"
  override def schema(): StructType = GvidSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GvidScanBuilder(path)
}

class GvidScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates {
  private var required: StructType = GvidSource.schema
  private var pushed: Array[Filter] = Array.empty
  private var countPushed: Boolean = false

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** COUNT(*) — optionally grouped by `file` — is answered from the
    * 8-byte container HEADER (magic + frame count): no frame walk, no
    * pixel decode, one row per file. Pushdown is PARTIAL
    * (supportCompletePushDown=false): the reader emits per-file counts
    * and Spark's final aggregate merges them, which also makes the
    * global COUNT(*) correct across many files. Composes with the file
    * filters (partition pruning is exact, so pruned-away files simply
    * contribute no partial row).
    */
  private var countGroupedByFile: Boolean = false

  override def supportCompletePushDown(aggregation: Aggregation): Boolean = false
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val groups = aggregation.groupByExpressions()
    val groupOk = groups.isEmpty ||
      (groups.length == 1 && groups(0).references().map(_.toString).toSeq == Seq("file"))
    val countOnly = aggregation.aggregateExpressions().toSeq match {
      case Seq(_: CountStar) => true
      case _                 => false
    }
    countPushed = groupOk && countOnly
    countGroupedByFile = countPushed && groups.nonEmpty
    countPushed
  }

  /** `file = x` / `file IN (...)` prune whole input partitions at
    * planning time (one partition per file, so the filter IS the
    * partition list). Pruning is exact, so the pushed filters need no
    * post-scan re-evaluation — only the remainder is returned.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case EqualTo("file", _: String) => true
      case In("file", vs)             => vs.forall(_.isInstanceOf[String])
      case _                          => false
    }
    pushed = accepted
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    // after an accepted aggregate pushdown Spark expects the scan to
    // output exactly (group cols ++ agg cols) — it does not re-prune
    val schema =
      if (countPushed && countGroupedByFile)
        StructType(Seq(
          StructField("file", StringType, nullable = false),
          StructField("count(*)", LongType, nullable = false)))
      else if (countPushed)
        StructType(Seq(StructField("count(*)", LongType, nullable = false)))
      else required
    new GvidScan(path, schema, pushed, countPushed)
  }
}

class GvidScan(
    path: String, required: StructType, pushed: Array[Filter],
    countPushed: Boolean = false) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  private lazy val partitions: Array[InputPartition] = {
    val dir = new java.io.File(path)
    val all =
      if (dir.isDirectory) dir.listFiles().filter(_.getName.endsWith(".gvid")).map(_.toString).sorted
      else Array(path)
    // the pushed array is a CONJUNCTION: each filter contributes an
    // allowed set and the partition list is their intersection
    val allowedSets: Seq[Set[String]] = pushed.toSeq.map {
      case EqualTo("file", v: String) => Set(v)
      case In("file", vs)             => vs.collect { case s: String => s }.toSet
      case _                          => Set.empty[String]
    }
    val kept =
      if (allowedSets.isEmpty) all
      else {
        val allowed = allowedSets.reduce(_ intersect _)
        all.filter(f => allowed.contains(new java.io.File(f).getName))
      }
    kept.map(f => GvidPartition(f): InputPartition)
  }

  override def description(): String =
    s"GvidScan(path=$path, decode=${GvidSource.needsDecode(required)}, " +
      s"files=${partitions.length}, countFromHeader=$countPushed)"

  override def planInputPartitions(): Array[InputPartition] = partitions

  override def createReaderFactory(): PartitionReaderFactory =
    new GvidReaderFactory(required, countPushed)
}

final case class GvidPartition(file: String) extends InputPartition

class GvidReaderFactory(required: StructType, countPushed: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[GvidPartition].file
    if (countPushed) new GvidCountReader(file, required)
    else new GvidReader(file, required)
  }
}

/** Count-pushdown reader: ONE row per file, frame count taken from the
  * 8-byte header — the file body is never read.
  */
class GvidCountReader(file: String, required: StructType) extends PartitionReader[InternalRow] {
  private var emitted = false
  private lazy val count: Long = {
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(new java.io.FileInputStream(file), 8))
    try {
      val magic = new Array[Byte](4)
      in.readFully(magic)
      if (!(magic(0) == 'G' && magic(1) == 'V' && magic(2) == 'I' && magic(3) == 'D'))
        throw new java.io.IOException(s"not a GVID container: $file")
      in.readInt().toLong
    } finally in.close()
  }

  override def next(): Boolean = { val first = !emitted; emitted = true; first }

  override def get(): InternalRow = {
    val fileName = UTF8String.fromString(new java.io.File(file).getName)
    InternalRow.fromSeq(required.fields.toIndexedSeq.map { f =>
      if (f.name == "file") (fileName: Any) else (count: Any)
    })
  }

  override def close(): Unit = ()
}

/** Per-file reader: container parsed once; frames decoded ONLY when a
  * pixel-derived column is in the pruned schema.
  */
class GvidReader(file: String, required: StructType) extends PartitionReader[InternalRow] {
  private val decode = GvidSource.needsDecode(required)
  private val fileName = UTF8String.fromString(new java.io.File(file).getName)
  private val frames: Seq[Array[Byte]] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file))
    MediaCodec.decodeVideoFrames(bytes) match {
      case Some((_, fs)) => fs
      case None          => throw new java.io.IOException(s"not a GVID container: $file")
    }
  }
  private var i = -1

  override def next(): Boolean = { i += 1; i < frames.length }

  override def get(): InternalRow = {
    val (w, h, lum) =
      if (decode) {
        val img = MediaCodec.decodeBmp(frames(i)).getOrElse(
          throw new java.io.IOException(s"undecodable frame $i in $file"))
        (img.width, img.height,
          0.299 * img.meanR + 0.587 * img.meanG + 0.114 * img.meanB)
      } else (0, 0, 0.0)
    val values = required.fieldNames.map {
      case "file"      => fileName
      case "frame_idx" => i
      case "n_frames"  => frames.length
      case "width"     => w
      case "height"    => h
      case "mean_lum"  => math.rint(lum * 10000) / 10000
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def close(): Unit = ()
}
