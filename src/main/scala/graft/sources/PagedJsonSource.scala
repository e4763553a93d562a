package graft.sources

import java.io.File
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for a page-per-file JSON landing zone — the
  * at-scale re-expression of the reference's paginated REST extraction
  * (SURVEY §2.1 S3/S4: `etls/openaq_etl.py:39-105` pages through
  * `/v3/locations?page=N`; the Lambda lands each page as a file).
  *
  * Where the reference fetches pages sequentially on one driver
  * thread, this source makes EACH PAGE ONE InputPartition, so a
  * thousand-page extract scans with full cluster parallelism. The
  * ScanBuilder implements column pruning (`SupportsPushDownRequiredColumns`),
  * so `select(two_cols)` parses only those fields per record.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.PagedJsonSource")
  *   .schema(pageSchema)            // explicit, never inferred (§1.3)
  *   .option("path", landingDir)
  *   .load()
  * }}}
  */
class PagedJsonSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft paged-json requires an explicit schema — inference at a source boundary is banned (SURVEY §1.3)")

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "option 'path' is required")
    new PagedJsonTable(schema, path)
  }
}

final class PagedJsonTable(tableSchema: StructType, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"paged-json `$path`"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedJsonScanBuilder(tableSchema, path)
}

final class PagedJsonScanBuilder(full: StructType, path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new PagedJsonScan(required, path)
}

final class PagedJsonScan(required: StructType, path: String)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"PagedJson(path=$path, cols=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    // listFiles() is null for a nonexistent/unlistable path (typo,
    // not-yet-created dir, non-local URI) — fail like every other file
    // source instead of silently planning an empty scan; an EXISTING
    // empty landing dir still yields zero partitions legitimately
    val files = Option(new File(path).listFiles()).getOrElse(
        throw new IllegalArgumentException(
          s"PagedJsonSource: path does not exist or is not a listable local directory: $path"))
      .filter(f => f.isFile && (f.getName.endsWith(".json") || f.getName.endsWith(".ndjson")))
      .sortBy(_.getName)
    files.map(f => PagePartition(f.getAbsolutePath): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedJsonReaderFactory(required)
}

final case class PagePartition(file: String) extends InputPartition

final class PagedJsonReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PagedJsonReader(partition.asInstanceOf[PagePartition].file, required)
}

/** One page file → rows. Parsing happens on the executor owning the
  * partition; only the pruned columns are materialized.
  */
final class PagedJsonReader(file: String, required: StructType)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  // keep the Source so close() can release the file descriptor — a
  // no-op close leaks one fd per page file until GC finalization
  private val source = scala.io.Source.fromFile(file, "UTF-8")
  private val lines = source.getLines().filter(_.trim.nonEmpty)
  private var current: InternalRow = _

  // STRICT per-value typing: Jackson's asLong/asDouble coerce a
  // mismatched value to 0/0.0/false, which would silently corrupt ids
  // when the API drifts — this source's whole stance is explicit
  // schemas with no silent inference, so a mismatch throws with the
  // field value in the message instead
  private def convert(node: JsonNode, dt: DataType): Any = {
    if (node == null || node.isNull) return null
    def fail(want: String): Nothing = throw new IllegalArgumentException(
      s"paged-json reader: expected $want, got ${node.getNodeType} value $node")
    dt match {
      case LongType => if (node.canConvertToLong) node.asLong() else fail("an integral number")
      case IntegerType => if (node.canConvertToInt) node.asInt() else fail("an int")
      case DoubleType => if (node.isNumber) node.asDouble() else fail("a number")
      case BooleanType => if (node.isBoolean) node.asBoolean() else fail("a boolean")
      case StringType => UTF8String.fromString(
        if (node.isTextual) node.asText() else node.toString)
      case other => throw new UnsupportedOperationException(
        s"paged-json reader supports flat long/int/double/boolean/string fields, got $other")
    }
  }

  override def next(): Boolean =
    if (!lines.hasNext) false
    else {
      val tree = mapper.readTree(lines.next())
      val values = required.fields.map(f => convert(tree.get(f.name), f.dataType))
      current = new GenericInternalRow(values.asInstanceOf[Array[Any]])
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = source.close()
}
