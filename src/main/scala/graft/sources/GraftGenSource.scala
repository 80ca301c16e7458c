package graft.sources

import java.util

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{
  AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan,
  ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters,
  SupportsPushDownRequiredColumns}
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
  @volatile var lastAggPushed: Option[String] = None

  def valueOf(id: Long): Long = (id * 2654435761L) % 1000000L
  def tagOf(id: Long): String = "T" + (id % 10)

  /** Columns aggregate pushdown accepts (the long-typed ones). */
  val LongCols: Set[String] = Set("id", "bucket", "value")
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
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var lo = 0L
  private var hi = rows
  private var pushed = mutable.ArrayBuffer.empty[Filter]
  private var required: StructType = GraftGenSource.Schema
  private var agg: Option[Aggregation] = None

  private def colName(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case r: NamedReference if r.fieldNames.length == 1 =>
      Some(r.fieldNames()(0))
    case _ => None
  }

  /** PARTIAL aggregate pushdown (`supportCompletePushDown` = false,
    * the default): the scan emits per-partition (group, partial)
    * rows — group-by `bucket` or global; COUNT(*) / COUNT(col) /
    * MIN / MAX / SUM over the generated long columns — and Spark
    * plans the final merge on top. This is the row-group-statistics
    * contract of a real warehouse connector made observable: a
    * 100 TB scan feeding `GROUP BY bucket, count(*)` ships ≤ 97 rows
    * per split instead of every row.
    */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val gbOk = aggregation.groupByExpressions().forall(e =>
      colName(e).contains("bucket"))
    val aggOk = aggregation.aggregateExpressions().forall {
      case _: CountStar => true
      case c: Count =>
        !c.isDistinct && colName(c.column).exists(GraftGenSource.LongCols)
      case m: Min => colName(m.column).exists(GraftGenSource.LongCols)
      case m: Max => colName(m.column).exists(GraftGenSource.LongCols)
      case s: Sum =>
        !s.isDistinct && colName(s.column).exists(GraftGenSource.LongCols)
      case _ => false
    }
    if (gbOk && aggOk && aggregation.aggregateExpressions().nonEmpty) {
      agg = Some(aggregation)
      true
    } else false
  }

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
    agg match {
      case Some(a) =>
        GraftGenSource.lastAggPushed = Some(a.toString)
        new GraftGenAggScan(lo, math.max(lo, hi), slices, a)
      case None =>
        GraftGenSource.lastAggPushed = None
        new GraftGenScan(lo, math.max(lo, hi), slices, required)
    }
  }
}

/** Aggregated scan: each partition folds its generated id range into
  * per-group partial rows (group keys first, then one column per
  * aggregate, all LongType — the partial-pushdown schema contract).
  */
final class GraftGenAggScan(
    lo: Long, hi: Long, slices: Int, agg: Aggregation)
    extends Scan with Batch {

  private val groupCols: Array[String] =
    agg.groupByExpressions().flatMap {
      case r: NamedReference => Some(r.fieldNames()(0))
      case _ => None
    }
  // (kind, col) per aggregate; kind ∈ count*, count, min, max, sum
  private val aggSpecs: Array[(String, String)] =
    agg.aggregateExpressions().map {
      case _: CountStar => ("count*", "")
      case c: Count =>
        ("count", c.column.asInstanceOf[NamedReference].fieldNames()(0))
      case m: Min =>
        ("min", m.column.asInstanceOf[NamedReference].fieldNames()(0))
      case m: Max =>
        ("max", m.column.asInstanceOf[NamedReference].fieldNames()(0))
      case s: Sum =>
        ("sum", s.column.asInstanceOf[NamedReference].fieldNames()(0))
      case other =>
        throw new IllegalStateException(s"unaccepted aggregate $other")
    }

  override def readSchema(): StructType = StructType(
    groupCols.map(c => StructField(c, LongType, nullable = false)) ++
      aggSpecs.zipWithIndex.map { case ((kind, c), i) =>
        StructField(s"${kind.stripSuffix("*")}_${if (c.isEmpty) "star" else c}_$i",
          LongType, nullable = false)
      })
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftGenAggScan[$lo,$hi) groups=${groupCols.mkString(",")} " +
      s"aggs=${aggSpecs.map(t => t._1 + "(" + t._2 + ")").mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, slices)
    val span = math.max(0L, hi - lo)
    (0 until n).map { i =>
      GenPartition(lo + span * i / n, lo + span * (i + 1) / n)
    }.filter(p => p.end > p.start).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GenAggReaderFactory(groupCols, aggSpecs)
}

final class GenAggReaderFactory(
    groupCols: Array[String], aggSpecs: Array[(String, String)])
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GenPartition]
    def colVal(c: String, id: Long): Long = c match {
      case "id" => id
      case "bucket" => id % 97L
      case "value" => GraftGenSource.valueOf(id)
    }
    // fold the range into per-group accumulators
    val accs = mutable.LinkedHashMap.empty[Seq[Long], Array[Long]]
    var id = p.start
    while (id < p.end) {
      val key = groupCols.toSeq.map(colVal(_, id))
      val acc = accs.getOrElseUpdate(
        key,
        aggSpecs.map {
          case ("min", _) => Long.MaxValue
          case ("max", _) => Long.MinValue
          case _ => 0L
        })
      var i = 0
      while (i < aggSpecs.length) {
        val (kind, c) = aggSpecs(i)
        kind match {
          case "count*" | "count" => acc(i) += 1L
          case "min" => acc(i) = math.min(acc(i), colVal(c, id))
          case "max" => acc(i) = math.max(acc(i), colVal(c, id))
          case "sum" => acc(i) += colVal(c, id)
        }
        i += 1
      }
      id += 1
    }
    val it = accs.iterator
    new PartitionReader[InternalRow] {
      private var cur: (Seq[Long], Array[Long]) = _
      override def next(): Boolean = {
        if (it.hasNext) { cur = it.next(); true } else false
      }
      override def get(): InternalRow =
        InternalRow.fromSeq(cur._1 ++ cur._2.toSeq)
      override def close(): Unit = ()
    }
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
