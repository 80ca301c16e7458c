package graft.sources

import java.util

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan,
  ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{
  EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan,
  LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Batch DataSourceV2 with REAL pushdown — the engine-side sibling of
  * the streaming [[EvtStreamSource]]: a deterministic generated table
  * (every column a pure function of `id`) whose ScanBuilder
  * implements `SupportsPushDownFilters` and
  * `SupportsPushDownRequiredColumns`, so range predicates on `id`
  * narrow the GENERATED key range (the work itself shrinks — the V2
  * contract a file source honors with row-group pruning, made
  * observable) and unreferenced columns are never materialized. The
  * point of the source is the spec battery (GraftGenSourceSpec): it
  * pins that Catalyst actually delivers filters and required columns
  * to a V2 scan, that accepted filters disappear from the
  * post-scan Filter while unsupported ones remain, and that the
  * partition count follows the `slices` option — the properties a
  * custom warehouse connector must get right before anything else
  * matters at 100 TB.
  *
  * Columns: id BIGINT (row key in [0, rows)), bucket = id % 97,
  * value = (id · 2654435761) % 1000000, tag = 'T' ++ id % 10.
  */
class GraftGenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftGenSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftGenTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "4").toInt)
}

object GraftGenSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("value", LongType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  /** Last scan's pushdown outcome, for spec introspection (the V2 API
    * has no public accessor on a planned scan).
    */
  @volatile var lastPushed: Seq[Filter] = Nil
  @volatile var lastSchema: StructType = Schema
  @volatile var lastRange: (Long, Long) = (0L, 0L)

  def valueOf(id: Long): Long = (id * 2654435761L) % 1000000L
  def tagOf(id: Long): String = "T" + (id % 10)
}

final class GraftGenTable(rows: Long, slices: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_gen($rows)"
  override def schema(): StructType = GraftGenSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftGenScanBuilder(rows, slices)
}

final class GraftGenScanBuilder(rows: Long, slices: Int)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = rows
  private var pushed = mutable.ArrayBuffer.empty[Filter]
  private var required: StructType = GraftGenSource.Schema

  /** Accept range/point predicates on `id` by narrowing [lo, hi);
    * everything else is the caller's residual.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = filters.filter {
      case GreaterThan("id", v: Long) =>
        lo = math.max(lo, v + 1); pushed += GreaterThan("id", v); false
      case GreaterThanOrEqual("id", v: Long) =>
        lo = math.max(lo, v); pushed += GreaterThanOrEqual("id", v); false
      case LessThan("id", v: Long) =>
        hi = math.min(hi, v); pushed += LessThan("id", v); false
      case LessThanOrEqual("id", v: Long) =>
        hi = math.min(hi, v + 1); pushed += LessThanOrEqual("id", v); false
      case EqualTo("id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1)
        pushed += EqualTo("id", v); false
      case _ => true
    }
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed.toArray

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    GraftGenSource.lastPushed = pushed.toList
    GraftGenSource.lastSchema = required
    GraftGenSource.lastRange = (lo, math.max(lo, hi))
    new GraftGenScan(lo, math.max(lo, hi), slices, required)
  }
}

final case class GenPartition(start: Long, end: Long) extends InputPartition

final class GraftGenScan(
    lo: Long, hi: Long, slices: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftGenScan[$lo,$hi) cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, slices)
    val span = math.max(0L, hi - lo)
    (0 until n).map { i =>
      GenPartition(lo + span * i / n, lo + span * (i + 1) / n)
    }.filter(p => p.end > p.start).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(required.fieldNames)
}

/** Generates ONLY the requested columns — the pruning is real, not
  * cosmetic (an unreferenced `tag` never allocates its UTF8String).
  */
final class GenReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GenPartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toSeq.map {
          case "id" => id
          case "bucket" => id % 97L
          case "value" => GraftGenSource.valueOf(id)
          case "tag" => UTF8String.fromString(GraftGenSource.tagOf(id))
        })
      override def close(): Unit = ()
    }
  }
}
