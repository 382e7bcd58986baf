package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsRuntimeV2Filtering}
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

  /** Partition count of the most recent planInputPartitions call —
    * observability hook for SourcesSpec's runtime-filtering assertion
    * (the re-planned count after a DPP IN-filter lands must shrink).
    */
  val lastPlannedPartitions = new java.util.concurrent.atomic.AtomicInteger(-1)
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
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var lo: Long = 0L
  private var hi: Long = n // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = RangeVectors.schema
  private var aggKinds: Option[Array[String]] = None

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
    // saturating v+1: a boundary literal (Long.MaxValue) must not wrap
    // negative and silently empty the scan — the filter was CONSUMED, so
    // Spark applies no residual
    def succ(v: Long): Long = if (v == Long.MaxValue) v else v + 1
    consumed.foreach {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, succ(v))
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long)           => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, succ(v))
      case EqualTo("id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, succ(v))
      case _ => ()
    }
    pushed = consumed
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** PARTIAL aggregate pushdown (the V2ScanRelationPushDown mechanism the
    * JDBC/parquet sources use): global count(*) / min(id) / max(id) are
    * computed at the SOURCE from the (already filter-narrowed) id range —
    * each input partition ships ONE digest row instead of its data rows,
    * and Spark's final aggregate merges the partials. Composes with the
    * consumed id-range filters: the pushed range IS the aggregated range.
    */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean = false

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (aggregation.groupByExpressions.nonEmpty) return false
    def idField(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case f: NamedReference => f.fieldNames.sameElements(Array("id"))
        case _ => false
      }
    val kinds = aggregation.aggregateExpressions.map {
      case _: CountStar => "count"
      case m: Min if idField(m.column) => "min_id"
      case m: Max if idField(m.column) => "max_id"
      case _ => return false
    }
    aggKinds = Some(kinds)
    true
  }

  override def build(): Scan =
    new RangeVectorsScan(math.max(lo, 0L), math.min(hi, n), slices, required,
      aggKinds)
}

class RangeVectorsScan(lo: Long, hi: Long, slices: Int, required: StructType,
                       aggKinds: Option[Array[String]] = None)
    extends Scan with Batch with SupportsRuntimeV2Filtering {

  // Runtime (DPP-style) narrowing: when this scan sits under a join whose
  // other side is selective, Spark broadcasts the join-key values and
  // calls filter() with an IN predicate BEFORE re-planning partitions —
  // the DSv2 analog of dynamic partition pruning (the Iceberg pattern).
  // [rlo, rhi) shrinks to the value envelope; idSet lets readers skip
  // non-matching rows inside surviving slices. Dropping rows outside the
  // IN set is safe: those rows cannot join (the join re-checks the key).
  private var rlo: Long = lo
  private var rhi: Long = hi
  private var idSet: Option[Set[Long]] = None

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("id"))

  override def filter(predicates: Array[Predicate]): Unit =
    predicates.foreach { p =>
      if (p.name() == "IN" && p.children().headOption.exists {
            case nr: NamedReference => nr.fieldNames.sameElements(Array("id"))
            case _ => false
          }) {
        // Literal is the public connector API face (LiteralValue, like
        // FieldReference, is private[sql] — only its Java interface is
        // third-party-visible)
        val vals = p.children().drop(1).collect {
          case l: Literal[_] if l.dataType == LongType =>
            l.value.asInstanceOf[Long]
        }
        if (vals.nonEmpty) {
          rlo = math.max(rlo, vals.min)
          rhi = math.min(rhi, vals.max + 1)
          idSet = Some(idSet.fold(vals.toSet)(_ intersect vals.toSet))
        }
      }
    }

  override def readSchema(): StructType = aggKinds match {
    case Some(kinds) => StructType(kinds.zipWithIndex.map { case (k, i) =>
      StructField(s"${k}_$i", LongType, nullable = false) })
    case None => required
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_range slice [$lo, $hi) cols=${required.fieldNames.mkString(",")}" +
      aggKinds.map(k => s" pushedAggs=${k.mkString(",")}").getOrElse("")

  override def planInputPartitions(): Array[InputPartition] = {
    val total = math.max(0L, rhi - rlo)
    // the runtime id set rides IN the partitions: Spark builds the reader
    // factory during planning (before filter() fires), but re-plans the
    // partitions AFTER — so per-partition state is the only channel that
    // reliably carries runtime-filter results to the readers
    val parts: Array[InputPartition] =
      if (total == 0) Array.empty
      else {
        val per = math.max(1L, (total + slices - 1) / slices)
        (rlo until rhi by per).map { s =>
          val sHi = math.min(s + per, rhi)
          RangeSlice(s, sHi, idSet.map(_.filter(v => v >= s && v < sHi))): InputPartition
        }.toArray
      }
    RangeVectors.lastPlannedPartitions.set(parts.length)
    parts
  }

  override def createReaderFactory(): PartitionReaderFactory = aggKinds match {
    case Some(kinds) =>
      // agg pushdown only plans for a global aggregate DIRECTLY over the
      // scan (no join above it), and runtime filters only arrive under a
      // join — the combination cannot be planned; guard the closed-form
      // digests against it regardless
      require(idSet.isEmpty, "runtime filter cannot combine with pushed aggregates")
      new RangeAggReaderFactory(kinds)
    case None => new RangeReaderFactory(required.fieldNames)
  }
}

case class RangeSlice(lo: Long, hi: Long,
                      ids: Option[Set[Long]] = None) extends InputPartition

/** Each partition emits ONE partial-aggregate digest row, closed-form from
  * its [lo, hi) slice — the rows-shipped count is the partition count, not
  * the data count (SourcesSpec asserts this via the scan metric).
  */
class RangeAggReaderFactory(kinds: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val slice = partition.asInstanceOf[RangeSlice]
    // closed-form digests are computed from the [lo, hi) envelope — they
    // cannot honor a runtime id subset (and no plan can produce one here)
    require(slice.ids.isEmpty, "pushed aggregates cannot combine with a runtime IN-filter")
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = !emitted && slice.hi > slice.lo && { emitted = true; true }
      override def get(): InternalRow = new GenericInternalRow(
        kinds.map {
          case "count"  => java.lang.Long.valueOf(slice.hi - slice.lo)
          case "min_id" => java.lang.Long.valueOf(slice.lo)
          case "max_id" => java.lang.Long.valueOf(slice.hi - 1)
        }.asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}

class RangeReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val slice = partition.asInstanceOf[RangeSlice]
    new PartitionReader[InternalRow] {
      private var cur = slice.lo - 1
      override def next(): Boolean = {
        cur += 1
        // runtime IN-filter: emit only surviving ids within the slice
        slice.ids.foreach { s => while (cur < slice.hi && !s.contains(cur)) cur += 1 }
        cur < slice.hi
      }
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
