package graft.io.v2

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete in-memory DataSource V2 connector (`graft.io.v2.FixtureSource`)
  * behind the [[graft.io.DataSourceLoader]] seam — the missing half of the
  * Cassandra-connector story (`DataLoader.java:500-529`): the seam was only
  * ever exercised against parquet, because no Cassandra service exists in
  * this environment. This connector IS the connector contract — a real
  * `TableProvider` with `SupportsPushDownFilters` +
  * `SupportsPushDownRequiredColumns`, driven through the SAME
  * format+options-map path (`table` → option set) the Cassandra binding
  * uses — so the loader seam, option resolution, capability negotiation,
  * filter pushdown, and column pruning are all provable end-to-end without
  * a network service.
  *
  * Deliberately faithful to how a storage connector behaves at scale:
  *  - pushdown happens at `ScanBuilder` time; unsupported predicates are
  *    RETURNED as residual so Spark re-evaluates exactly those (never
  *    both, never neither) — the contract a Cassandra `WHERE`-clause
  *    pushdown follows;
  *  - column pruning narrows the schema the readers materialize — rows
  *    cross the boundary already projected, the `ReadSchema` the scan
  *    reports is what a wire protocol would fetch;
  *  - data is carried INSIDE each `InputPartition` (serializable, splits
  *    across several partitions), so executors never touch driver state —
  *    the same lifecycle a token-range split has.
  *
  * Registry values live on the driver only (`planInputPartitions` runs
  * driver-side); supported column types are the atomic set the fixture
  * tables need (int/long/double/boolean/string). Test-surface scope, but
  * nothing about it is a stub: every row read through it flows the full V2
  * read path.
  */
object FixtureCatalog {
  private val tables = new ConcurrentHashMap[String, (StructType, Seq[Seq[Any]])]()

  private val SupportedTypes: Set[DataType] =
    Set(IntegerType, LongType, DoubleType, BooleanType, StringType)

  /** Materializes `df` driver-side under `name` (fixtures are tiny). */
  def register(name: String, df: DataFrame): Unit = {
    df.schema.fields.foreach { f =>
      require(SupportedTypes.contains(f.dataType),
        s"FixtureCatalog supports atomic types only; $name.${f.name} is ${f.dataType}")
    }
    val rows = df.collect().map(r => (0 until r.length).map(r.get).toSeq).toSeq
    tables.put(name, (df.schema, rows))
  }

  def schemaOf(name: String): StructType = lookup(name)._1
  def rowsOf(name: String): Seq[Seq[Any]] = lookup(name)._2
  def clear(): Unit = tables.clear()

  private def lookup(name: String): (StructType, Seq[Seq[Any]]) = {
    val v = tables.get(name)
    require(v != null,
      s"no fixture table '$name' registered (FixtureCatalog.register first)")
    v
  }

  private[v2] def tableOption(options: CaseInsensitiveStringMap): String = {
    val t = options.get("table")
    require(t != null, "option 'table' is required for graft.io.v2.FixtureSource")
    t
  }
}

class FixtureSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FixtureCatalog.schemaOf(FixtureCatalog.tableOption(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new FixtureTable(
      FixtureCatalog.tableOption(new CaseInsensitiveStringMap(properties)), schema)
}

class FixtureTable(tableName: String, tableSchema: StructType)
  extends Table with SupportsRead {
  override def name(): String = s"fixture:$tableName"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FixtureScanBuilder(tableName, tableSchema)
}

class FixtureScanBuilder(table: String, full: StructType)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns {

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition(FixtureFilters.supported(full, _))
    pushed = sup
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new FixtureScan(table, full, required, pushed)
}

class FixtureScan(table: String, full: StructType,
                  required: StructType, val pushed: Array[Filter])
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"fixture:$table PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val idx = full.fieldNames.zipWithIndex.toMap
    val kept = FixtureCatalog.rowsOf(table)
      .filter(r => pushed.forall(FixtureFilters.eval(_, idx, r)))
    val proj = required.fieldNames.map(idx)
    val projected = kept.map(r => proj.map(r(_)).toSeq)
    if (projected.isEmpty) Array(FixturePartition(Seq.empty, required))
    else {
      val n = math.min(4, projected.size)
      val per = (projected.size + n - 1) / n
      projected.grouped(per).map(FixturePartition(_, required): InputPartition).toArray
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new FixtureReaderFactory
}

/** Rows ride in the partition (serializable atomics) — executors never read
  * driver state, like a real connector's per-split payload/coordinates.
  */
case class FixturePartition(rows: Seq[Seq[Any]], schema: StructType)
  extends InputPartition

class FixtureReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val fp = p.asInstanceOf[FixturePartition]
    new PartitionReader[InternalRow] {
      private val it = fp.rows.iterator
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { cur = FixtureFilters.toInternal(it.next(), fp.schema); true }
        else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

/** Predicate evaluation over external row values + internal-row conversion.
  * Exactly the filter classes a typical connector handles: comparisons,
  * IN, and null tests on atomic columns; everything else stays residual.
  */
object FixtureFilters {

  def supported(schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(a, _) => has(schema, a)
    case GreaterThan(a, _) => has(schema, a)
    case GreaterThanOrEqual(a, _) => has(schema, a)
    case LessThan(a, _) => has(schema, a)
    case LessThanOrEqual(a, _) => has(schema, a)
    case In(a, _) => has(schema, a)
    case IsNull(a) => has(schema, a)
    case IsNotNull(a) => has(schema, a)
    case _ => false
  }
  private def has(schema: StructType, attr: String): Boolean =
    schema.fieldNames.contains(attr)

  def eval(f: Filter, idx: Map[String, Int], row: Seq[Any]): Boolean = f match {
    case EqualTo(a, v) => cmp(row(idx(a)), v).contains(0)
    case GreaterThan(a, v) => cmp(row(idx(a)), v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(row(idx(a)), v).exists(_ >= 0)
    case LessThan(a, v) => cmp(row(idx(a)), v).exists(_ < 0)
    case LessThanOrEqual(a, v) => cmp(row(idx(a)), v).exists(_ <= 0)
    case In(a, vs) => vs.exists(v => cmp(row(idx(a)), v).contains(0))
    case IsNull(a) => row(idx(a)) == null
    case IsNotNull(a) => row(idx(a)) != null
    case other => sys.error(s"unpushable filter reached eval: $other")
  }

  /** Three-way compare; None when either side is null (SQL semantics:
    * comparisons with null never match). Integral pairs compare as longs —
    * a double round-trip would collapse distinct values above 2^53, and a
    * pushed filter that matched the wrong row is never re-checked by Spark.
    */
  private def cmp(x: Any, y: Any): Option[Int] = (x, y) match {
    case (null, _) | (_, null) => None
    case (a: Number, b: Number) if integral(a) && integral(b) =>
      Some(java.lang.Long.compare(a.longValue(), b.longValue()))
    case (a: Number, b: Number) =>
      Some(java.lang.Double.compare(a.doubleValue(), b.doubleValue()))
    case (a: String, b: String) => Some(a.compareTo(b))
    case (a: Boolean, b: Boolean) => Some(java.lang.Boolean.compare(a, b))
    case _ => None
  }

  private def integral(n: Number): Boolean = n match {
    case _: java.lang.Long | _: java.lang.Integer |
         _: java.lang.Short | _: java.lang.Byte => true
    case _ => false
  }

  def toInternal(row: Seq[Any], schema: StructType): InternalRow = {
    val vals = new Array[Any](row.length)
    var i = 0
    while (i < row.length) {
      vals(i) = schema.fields(i).dataType match {
        case StringType if row(i) != null => UTF8String.fromString(row(i).asInstanceOf[String])
        case _ => row(i)
      }
      i += 1
    }
    new GenericInternalRow(vals)
  }
}
