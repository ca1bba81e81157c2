package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow, Offset => StreamOffset}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSource V2 CONNECTOR over the deterministic voter generator
  * (`graft.gen.Generator.voters` — the reference's registration feed,
  * `/root/reference/main.py:68-116`) — the "build the source" seat: the
  * same interfaces a Kafka/warehouse connector implements, exercised end
  * to end with REAL leaf pushdown, not pass-through:
  *
  *  - **Predicate pushdown INTO the source** (`SupportsPushDownFilters`):
  *    range/equality filters on `voter_id` narrow the generated id
  *    interval, so pruned rows are never materialized — the connector
  *    equivalent of a JDBC WHERE clause or a Kafka offset seek. At
  *    100 TB this is the difference between scanning the firehose and
  *    reading the slice. Handled id filters are FULLY CONSUMED (the
  *    half-open-interval translation is exact, and a clean scan is what
  *    lets COUNT(*) push down); non-id filters — and id bounds whose
  *    translation would overflow — come back as residuals Spark
  *    evaluates above the scan.
  *  - **Column pruning INTO the source**
  *    (`SupportsPushDownRequiredColumns`): only requested fields are
  *    computed per row (an unrequested `voter_name` never allocates its
  *    string), mirroring parquet's ReadSchema width saving.
  *  - **Partition planning**: the id interval splits into `partitions`
  *    contiguous input partitions — executor-side generation, no driver
  *    materialization, no shuffle (the `spark.range` contract behind
  *    every fixture here, now behind the connector API).
  *
  * Field arithmetic is IDENTICAL to `Generator.voters`, so the DuckDB
  * oracle replays the connector's output by formula. Usage:
  * `spark.read.format(classOf[GenSource].getName)
  *   .option("rows", n).option("partitions", p).load()`. */
class GenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L)
    val parts = Option(properties.get("partitions")).map(_.toInt).getOrElse(4)
    val step = Option(properties.get("step")).map(_.toLong).getOrElse(256L)
    new GenTable(rows, parts, step)
  }
  override def supportsExternalMetadata(): Boolean = false
}

object GenSource {
  val schema: StructType = new StructType()
    .add("voter_id", LongType, nullable = false)
    .add("party_affiliation", StringType, nullable = false)
    .add("voter_name", StringType, nullable = false)
    .add("gender", StringType, nullable = false)
    .add("registered_age", IntegerType, nullable = false)

  private[sources] val Parties =
    graft.gen.Generator.Parties.toArray
  private[sources] val Mix = 2654435761L
}

private class GenTable(rows: Long, parts: Int, step: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_gen($rows)"
  override def schema(): StructType = GenSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, parts, step)
}

private class GenScanBuilder(rows: Long, parts: Int, step: Long)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var lo = 0L
  private var hi = rows
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GenSource.schema
  private var countPushed = false

  /** Narrow [lo, hi) from voter_id comparisons. The interval arithmetic
    * is EXACT for these five operators, so handled filters are fully
    * consumed (no residual, no post-scan Filter node) — which is also
    * what lets an aggregate land on the bare scan. Anything else stays a
    * residual Spark evaluates above the scan. Narrowing is monotone, so
    * conjunctions compose. Bounds whose half-open translation would
    * overflow `v + 1` past Long.MaxValue are NOT handled (left residual)
    * — consuming them with wrapped arithmetic would silently empty the
    * scan on a tautological filter. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, residual) = filters.partition {
      case GreaterThan("voter_id", v: Long) if v < Long.MaxValue =>
        lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("voter_id", v: Long) => lo = math.max(lo, v); true
      case LessThan("voter_id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("voter_id", v: Long) if v < Long.MaxValue =>
        hi = math.min(hi, v + 1); true
      case EqualTo("voter_id", v: Long) if v < Long.MaxValue =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case _ => false
    }
    pushed = handled
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COUNT(*) with no GROUP BY is answered by ARITHMETIC — each
    * partition emits one (end − start) row and Spark sums the partials
    * (partial pushdown: `supportCompletePushDown` stays false so the
    * contract also holds under multi-partition plans). No row is ever
    * generated — the connector equivalent of serving count from
    * metadata, the way parquet footers or an indexed store would. */
  override def supportCompletePushDown(agg: Aggregation): Boolean = false
  override def pushAggregation(agg: Aggregation): Boolean = {
    val ok = agg.groupByExpressions().isEmpty &&
      agg.aggregateExpressions().length == 1 &&
      agg.aggregateExpressions()(0).isInstanceOf[CountStar]
    if (ok) countPushed = true
    ok
  }

  override def build(): Scan =
    if (countPushed) new GenCountScan(lo, hi, parts)
    else new GenScan(lo, hi, parts, required, step)
}

/** The pushed-COUNT scan: one partial-count row per planned partition. */
private class GenCountScan(lo: Long, hi: Long, parts: Int)
    extends Scan with Batch {
  private val countSchema =
    new StructType().add("count(*)", LongType, nullable = false)
  override def readSchema(): StructType = countSchema
  override def toBatch: Batch = this
  override def description(): String = s"GenCountScan(lo=$lo, hi=$hi)"
  override def planInputPartitions(): Array[InputPartition] = {
    val ps = GenPartition.slice(lo, hi, parts)
    // an empty interval still must yield count 0: one empty-range row
    if (ps.isEmpty) Array[InputPartition](GenPartition(0, 0)) else ps
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[GenPartition]
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = { val r = !emitted; emitted = true; r }
          override def get(): InternalRow =
            new GenericInternalRow(Array[Any](p.end - p.start))
          override def close(): Unit = ()
        }
      }
    }
}

private class GenScan(lo: Long, hi: Long, parts: Int, required: StructType,
                      step: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GenScan(lo=$lo, hi=$hi, cols=${required.fieldNames.mkString(",")})"
  override def planInputPartitions(): Array[InputPartition] =
    GenPartition.slice(lo, hi, parts)
  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(required.fieldNames)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GenMicroBatchStream(lo, hi, parts, step, required.fieldNames)
}

/** Committed position in the id space — the connector's "Kafka offset". */
private case class GenOffset(v: Long) extends StreamOffset {
  override def json(): String = v.toString
}

/** The STREAMING read path: the generator as a micro-batch source with
  * real offset bookkeeping — `initialOffset` → per-trigger
  * `latestOffset(start, limit)` under ADMISSION CONTROL (the maxRows
  * read limit caps each batch at `step` ids — the
  * maxOffsetsPerTrigger/maxFilesPerTrigger backpressure contract) →
  * `planInputPartitions(start, end)` over exactly the admitted id range
  * → engine-side commit. Offsets serialize through `json()` into the
  * checkpoint's offset log, so recovery replays from the committed
  * position — the complete Kafka-shaped source surface, minus only the
  * broker. Stateless between calls: pacing derives from the START
  * offset the engine hands back, so a restarted query resumes exactly
  * where the checkpoint says, with no driver-side mutable position. */
private class GenMicroBatchStream(lo: Long, hi: Long, parts: Int, step: Long,
                                  fields: Array[String])
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  override def initialOffset(): StreamOffset = GenOffset(lo)
  override def deserializeOffset(json: String): StreamOffset =
    GenOffset(json.toLong)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(step)
  /** AvailableNow support: the full extent is fixed (`hi`), so there is
    * no position to snapshot — the engine's multi-batch executor drains
    * to `hi` under the default read limit and stops. */
  override def prepareForTriggerAvailableNow(): Unit = ()
  /** End offset for the next batch: the admitted row cap above `start`.
    * ReadAllAvailable (Trigger.Once / the single-batch executor) MUST
    * admit everything — capping it at `step` would commit a PARTIAL
    * result as success — and so does any unrecognized limit kind: the
    * safe direction is always to admit more, never to silently drop.
    * The row cap is overflow-saturated (the batch side's pushFilters
    * discipline): a huge maxRows near Long.MaxValue clamps to `hi`. */
  override def latestOffset(start: StreamOffset, limit: ReadLimit): StreamOffset = {
    val s = start.asInstanceOf[GenOffset].v
    def admit(l: ReadLimit): Long = l match {
      case _: ReadAllAvailable => hi
      case r: ReadMaxRows =>
        val cap = math.min(math.max(1L, r.maxRows()), Long.MaxValue - s)
        math.min(hi, s + cap)
      case c: CompositeReadLimit =>
        // honor the tightest row cap among the components
        val ends = c.getReadLimits.toSeq.collect {
          case r: ReadMaxRows =>
            math.min(hi, s + math.min(math.max(1L, r.maxRows()),
              Long.MaxValue - s))
        }
        if (ends.nonEmpty) ends.min else hi
      case _ => hi
    }
    GenOffset(admit(limit))
  }
  override def latestOffset(): StreamOffset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit) is used")
  override def reportLatestOffset(): StreamOffset = GenOffset(hi)
  override def commit(end: StreamOffset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: StreamOffset,
                                   end: StreamOffset): Array[InputPartition] =
    GenPartition.slice(start.asInstanceOf[GenOffset].v,
      end.asInstanceOf[GenOffset].v, parts)
  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(fields)
}

private[graft] case class GenPartition(start: Long, end: Long)
    extends InputPartition

private[graft] object GenPartition {
  /** Contiguous interval slices, empty slices dropped — shared by the
    * row scan and the pushed-count scan so the arithmetic cannot
    * diverge. Boundary i is computed as n/k*i + (n%k)*i/k — the naive
    * i*n/k overflows Long for a user-supplied `rows` near
    * Long.MaxValue, inverting slice bounds; this split keeps every
    * intermediate ≤ n (i ≤ k and n%k < k, so (n%k)*i ≤ n%k * k which
    * for k ≤ Int.MaxValue stays inside Long whenever n does). */
  def slice(lo: Long, hi: Long, parts: Int): Array[InputPartition] = {
    val n = math.max(0L, hi - lo)
    val k = math.max(1, parts)
    def bound(i: Int): Long = lo + n / k * i + n % k * i / k
    (0 until k).map(i => GenPartition(bound(i), bound(i + 1)))
      .filter(p => p.end > p.start).toArray
  }
}

private class GenReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GenPartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow = {
        val values = fields.map {
          case "voter_id" => java.lang.Long.valueOf(id)
          case "party_affiliation" =>
            UTF8String.fromString(GenSource.Parties((id % 3).toInt))
          case "voter_name" => UTF8String.fromString(s"voter_$id")
          case "gender" =>
            UTF8String.fromString(if (id % 2 == 1) "female" else "male")
          case "registered_age" =>
            // floorMod = Spark's pmod: identical even where id * Mix
            // wraps negative (plain % would dip below 18 there)
            java.lang.Integer.valueOf(
              (18 + Math.floorMod(id * GenSource.Mix, 60L)).toInt)
        }
        new GenericInternalRow(values.asInstanceOf[Array[Any]])
      }
      override def close(): Unit = ()
    }
  }
}
