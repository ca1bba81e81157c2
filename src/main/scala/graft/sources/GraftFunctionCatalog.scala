package graft.sources

import org.apache.spark.sql.connector.catalog.{CatalogPlugin, FunctionCatalog, Identifier}
import org.apache.spark.sql.connector.catalog.functions.{AggregateFunction, BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 FUNCTION CATALOG — the connector-side function surface
  * (`spark.sql.catalog.<name>` + `FunctionCatalog`): functions resolved
  * by three-part name (`catalog.namespace.fn`) from a pluggable catalog
  * instead of the session registry. This is how a table format or
  * warehouse connector ships its own compute (e.g. a partition
  * transform or a storage-native aggregate) without touching user
  * session state — at 100 TB the catalog, not the notebook, owns the
  * function inventory.
  *
  * Two functions, covering both V2 function kinds:
  *  - `disc_rev(price, discount)` — a [[ScalarFunction]] exposing the
  *    MAGIC `invoke` method: Catalyst binds it via a static
  *    `Invoke` call in generated code (no row boxing, stays inside
  *    whole-stage codegen; `produceResult` is only the interpreted
  *    fallback).
  *  - `geo_mean(x)` — an [[AggregateFunction]] with the full
  *    distributed lifecycle: per-partition `update`, shuffle-side
  *    `merge`, final `produceResult` — state is (Σ ln x, n), so the
  *    merge is associative and the aggregate map-side combines like
  *    any built-in.
  *
  * The reference has no extension surface at all (a fixed Python
  * script, `/root/reference/spark-streaming.py`); this belongs to the
  * engine-extension tier next to [[GenSource]]/[[CommitSink]]. */
class GraftFunctionCatalog extends CatalogPlugin with FunctionCatalog {
  private var catalogName: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
  }
  override def name(): String = catalogName

  private val Ns = Array("ext")
  private val fns = Map(
    "disc_rev" -> new DiscRevUnbound,
    "geo_mean" -> new GeoMeanUnbound)

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Ns))
      fns.keys.map(Identifier.of(Ns, _)).toArray
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchNamespaceException(name() +: namespace.toSeq)

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace.sameElements(Ns) && fns.contains(ident.name))
      fns(ident.name)
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(
        s"${name()}.${ident.namespace.mkString(".")}", ident.name)
}

private[sources] class DiscRevUnbound extends UnboundFunction {
  override def name(): String = "disc_rev"
  override def description(): String =
    "disc_rev(price DOUBLE, discount DOUBLE) -> price * (1 - discount)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields.forall(_.dataType == DoubleType),
      s"disc_rev expects (DOUBLE, DOUBLE), got $inputType")
    new DiscRevFn
  }
}

private[sources] class DiscRevFn extends ScalarFunction[java.lang.Double] {
  override def inputTypes(): Array[DataType] = Array(DoubleType, DoubleType)
  override def resultType(): DataType = DoubleType
  override def name(): String = "disc_rev"
  override def canonicalName(): String = "graft.ext.disc_rev"
  // the MAGIC method: Catalyst emits a direct Invoke on this signature
  // in generated code — the codegen path a connector function should ship
  def invoke(price: Double, discount: Double): Double =
    price * (1.0 - discount)
  // interpreted fallback (also the null-handling path)
  override def produceResult(input: InternalRow): java.lang.Double =
    if (input.isNullAt(0) || input.isNullAt(1)) null
    else input.getDouble(0) * (1.0 - input.getDouble(1))
}

private[sources] class GeoMeanUnbound extends UnboundFunction {
  override def name(): String = "geo_mean"
  override def description(): String =
    "geo_mean(x DOUBLE) -> exp(avg(ln(x))) over positive x"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
      inputType.fields.head.dataType == DoubleType,
      s"geo_mean expects (DOUBLE), got $inputType")
    new GeoMeanFn
  }
}

/** State = (Σ ln x, n): associative merge, so partial aggregation
  * happens map-side exactly like a built-in aggregate. */
private[sources] class GeoMeanFn
    extends AggregateFunction[(Double, Long), java.lang.Double] {
  override def inputTypes(): Array[DataType] = Array(DoubleType)
  override def resultType(): DataType = DoubleType
  override def name(): String = "geo_mean"
  override def canonicalName(): String = "graft.ext.geo_mean"
  override def newAggregationState(): (Double, Long) = (0.0, 0L)
  override def update(state: (Double, Long),
                      input: InternalRow): (Double, Long) =
    if (input.isNullAt(0)) state
    else {
      val x = input.getDouble(0)
      if (x > 0.0) (state._1 + math.log(x), state._2 + 1L) else state
    }
  override def merge(s1: (Double, Long), s2: (Double, Long)): (Double, Long) =
    (s1._1 + s2._1, s1._2 + s2._2)
  override def produceResult(state: (Double, Long)): java.lang.Double =
    if (state._2 == 0L) null else math.exp(state._1 / state._2)
}
