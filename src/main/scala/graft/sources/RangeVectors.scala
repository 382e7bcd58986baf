package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSourceV2 READ connector (`format("graft_range")`) — the
  * modern connector API the built-in formats use, demonstrated end to end:
  * TableProvider → Table → ScanBuilder (with REAL filter + column
  * pushdown) → Batch → PartitionReaderFactory.
  *
  * The table is a deterministic synthetic corpus: rows (id, sq = id²,
  * label = id % 10, name = 'row-<id>') over [0, n). What makes it a
  * faithful connector model rather than a toy:
  *  - id range predicates (`>= > <= < =`) are CONSUMED by the source —
  *    `planInputPartitions` only generates the surviving id range, so a
  *    point/range query reads exactly its slice (the DSv2 analog of
  *    partition pruning; SourcesSpec asserts the scan emits exactly the
  *    matching rows and the plan carries no residual id Filter);
  *  - column pruning reaches the reader — unprojected columns are never
  *    materialized (readSchema() drives row construction);
  *  - the scan is split into `slices` input partitions, each an
  *    independent reader — the distribution shape of every real source.
  *
  * Oracled (`dsv2_scan`): DuckDB recomputes the arithmetic over
  * generate_series — a hash match proves scan + pushdown semantics.
  */
class RangeVectorsProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft_range"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeVectors.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new RangeVectorsTable(
      Option(properties.get("n")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("slices")).map(_.toInt).getOrElse(4))
}

object RangeVectors {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sq", LongType, nullable = false),
    StructField("label", IntegerType, nullable = false),
    StructField("name", StringType, nullable = false)))
}

class RangeVectorsTable(n: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_range(n=$n)"
  override def schema(): StructType = RangeVectors.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeVectorsScanBuilder(n, slices)
}

class RangeVectorsScanBuilder(n: Long, slices: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo: Long = 0L
  private var hi: Long = n // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = RangeVectors.schema

  /** Consume id-range predicates into [lo, hi); everything else stays
    * with Spark (returned as not-pushed).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (consumed, rest) = filters.partition {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
           LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) |
           EqualTo("id", _: Long) => true
      case _ => false
    }
    consumed.foreach {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long)           => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, v + 1)
      case EqualTo("id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ => ()
    }
    pushed = consumed
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new RangeVectorsScan(math.max(lo, 0L), math.min(hi, n), slices, required)
}

class RangeVectorsScan(lo: Long, hi: Long, slices: Int,
                       required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_range slice [$lo, $hi) cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val total = math.max(0L, hi - lo)
    if (total == 0) return Array.empty
    val per = math.max(1L, (total + slices - 1) / slices)
    (lo until hi by per).map(s =>
      RangeSlice(s, math.min(s + per, hi)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(required.fieldNames)
}

case class RangeSlice(lo: Long, hi: Long) extends InputPartition

class RangeReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val slice = partition.asInstanceOf[RangeSlice]
    new PartitionReader[InternalRow] {
      private var cur = slice.lo - 1
      override def next(): Boolean = { cur += 1; cur < slice.hi }
      // only the PRUNED columns are materialized
      override def get(): InternalRow = new GenericInternalRow(
        fields.map {
          case "id"    => java.lang.Long.valueOf(cur)
          case "sq"    => java.lang.Long.valueOf(cur * cur)
          case "label" => java.lang.Integer.valueOf((cur % 10).toInt)
          case "name"  => UTF8String.fromString(s"row-$cur")
        }.asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}
