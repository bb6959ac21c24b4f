package graft.io

import java.util
import scala.collection.JavaConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 connector — the (d) extension tier for
  * sources (reference: the per-day Mongo collections of
  * src/data_processor.py:195-222, re-expressed as a first-class
  * TABLE over a directory of `day=<N>.csv` files instead of a
  * driver-side per-day loop).
  *
  * What it demonstrates, judged at the connector layer (before
  * Catalyst ever sees files):
  *  - PARTITION PRUNING: filters on the `day` column are pushed into
  *    the scan and prune whole files at planning time — an equality
  *    or range predicate plans exactly the matching day-partitions.
  *  - COLUMN PRUNING: `pruneColumns` narrows the read schema; pruned
  *    columns are never parsed.
  *  - One `InputPartition` per surviving file → parallelism tracks
  *    the day layout, the same contract a sharded Mongo/JDBC read
  *    would declare.
  *
  * Usage: `spark.read.format("graft.io.DayFileSource")
  *   .schema(...).load(dir)` — schema is caller-declared (S1
  * posture: no inference scan). The value columns are parsed by
  * declared type; `day` comes from the file name, exactly like a
  * hive-style partition column.
  */
class DayFileSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DayFileSource.defaultSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new DayFileTable(properties.get("path"), schema)

  override def supportsExternalMetadata(): Boolean = true
}

object DayFileSource {
  val defaultSchema: StructType = StructType(Seq(
    StructField("day", IntegerType), StructField("id", LongType),
    StructField("value", DoubleType)))

  /** day=<N>.csv files under `dir`, as (day, path) pairs. */
  def dayFiles(dir: String): Seq[(Int, String)] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).toSeq.flatten
      .flatMap { f =>
        val m = "day=(\\d+)\\.csv".r.findFirstMatchIn(f.getName)
        m.map(g => g.group(1).toInt -> f.getAbsolutePath)
      }.sortBy(_._1)
  }
}

class DayFileTable(path: String, schema: StructType) extends Table with SupportsRead {
  override def name(): String = s"dayfiles($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DayFileScanBuilder(path, schema)
}

class DayFileScanBuilder(path: String, fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var readSchema: StructType = fullSchema
  private var dayFilters: Array[Filter] = Array.empty

  /** Accept (and fully handle) filters on the partition column; every
    * other predicate stays with Spark for post-scan evaluation. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (onDay, rest) = filters.partition {
      case EqualTo("day", _) | In("day", _) | GreaterThan("day", _)
           | GreaterThanOrEqual("day", _) | LessThan("day", _)
           | LessThanOrEqual("day", _) => true
      case _ => false
    }
    dayFilters = onDay
    rest
  }
  override def pushedFilters(): Array[Filter] = dayFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    readSchema = requiredSchema

  override def build(): Scan = new DayFileScan(path, fullSchema, readSchema, dayFilters)
}

class DayFileScan(path: String, fullSchema: StructType, readSchema: StructType,
                  dayFilters: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = readSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"DayFileScan(prunedTo=${survivors.length} files)"

  /** Null/odd-typed filter values, handled the way the claim of
    * "fully pushed" requires (Spark will NOT re-check these rows):
    * a comparison with NULL is never true → prune everything; an
    * unexpected value type → conservatively keep the file (extra rows
    * are only possible for types Spark never pushes for an int
    * column, and keeping is the safe direction). */
  private def cmp(v: Any)(f: Int => Boolean): Boolean = v match {
    case null => false
    case n: Number => f(n.intValue())
    case _ => true
  }

  private def keep(day: Int): Boolean = dayFilters.forall {
    case EqualTo("day", v) => cmp(v)(day == _)
    // nulls inside an IN list can never equal a day — skip them
    case In("day", vs) => vs != null && vs.exists(v => v != null && cmp(v)(day == _))
    case GreaterThan("day", v) => cmp(v)(day > _)
    case GreaterThanOrEqual("day", v) => cmp(v)(day >= _)
    case LessThan("day", v) => cmp(v)(day < _)
    case LessThanOrEqual("day", v) => cmp(v)(day <= _)
    case _ => true
  }

  /** Computed once: the surviving-file list backs BOTH the planned
    * partitions and description(), so plan renders don't re-list the
    * directory and the displayed count can't drift from the partitions
    * actually planned. */
  private lazy val survivors: Array[InputPartition] =
    DayFileSource.dayFiles(path)
      .filter { case (day, _) => keep(day) }
      .map { case (day, p) => DayFilePartition(day, p): InputPartition }
      .toArray

  override def planInputPartitions(): Array[InputPartition] = survivors

  override def createReaderFactory(): PartitionReaderFactory =
    new DayFileReaderFactory(fullSchema, readSchema)
}

case class DayFilePartition(day: Int, path: String) extends InputPartition

class DayFileReaderFactory(fullSchema: StructType, readSchema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DayFilePartition]
    new PartitionReader[InternalRow] {
      // held in a field so close() can release the file descriptor —
      // a getLines()-only reference leaks the fd until GC, and a
      // long-lived executor runs one reader per task
      private val source = scala.io.Source.fromFile(p.path)
      private val lines = source.getLines()
      private var current: InternalRow = _

      // column order in the file = fullSchema minus `day`
      private val fileCols = fullSchema.fields.filter(_.name != "day").map(_.name)
      private val out = readSchema.fields.map(_.name)

      override def next(): Boolean = {
        if (!lines.hasNext) return false
        val parts = lines.next().split(",", -1)
        val byName = fileCols.zip(parts).toMap + ("day" -> p.day.toString)
        val row = new GenericInternalRow(out.length)
        out.indices.foreach { i =>
          val raw = byName(out(i))
          readSchema.fields(i).dataType match {
            case IntegerType => row.update(i, raw.toInt)
            case LongType => row.update(i, raw.toLong)
            case DoubleType => row.update(i, raw.toDouble)
            case StringType =>
              row.update(i, org.apache.spark.unsafe.types.UTF8String.fromString(raw))
            case t => throw new IllegalArgumentException(s"unsupported type $t")
          }
        }
        current = row
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = source.close()
    }
  }
}
