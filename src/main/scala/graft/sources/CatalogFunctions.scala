package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{AggregateFunction, BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructType}

/** Catalog-PROVIDED functions ([[GraftCatalog]]'s `FunctionCatalog`
  * face) — the DSv2 contract that lets a connector ship its own
  * functions resolvable by name (`graft.fn.band(…)`) with ZERO session
  * registration, the way Iceberg ships `system.bucket` or a warehouse
  * connector ships its SQL dialect's functions. Two faces:
  *
  *  - [[BandFn]] is a `ScalarFunction` carrying the MAGIC METHOD
  *    (`def invoke(x: Double, w: Long): Long`): Spark's resolver finds
  *    it reflectively at plan time and compiles the call site into
  *    whole-stage codegen as a direct JVM method call on primitives —
  *    no row boxing, no UDF closure, the same hot-path shape as a
  *    builtin (`produceResult` stays as the contract's interpreted
  *    fallback). At 100 TB the difference between this and a Scala UDF
  *    is serialization + boxing on every row of every executor.
  *  - [[XorAggFn]] is a V2 `AggregateFunction`: update/merge/produce
  *    over a bigint XOR — commutative and associative, so Spark plans
  *    it as partial aggregates with map-side combine exactly like a
  *    builtin sum (what crosses the shuffle is one state row per
  *    partition per group). XOR ignores input order by construction —
  *    deterministic under any partitioning, hence oracle-safe.
  *
  * Both are integer-exact (the one IEEE division in `band` yields an
  * exact integral double, then an exact multiply < 2^53) so DuckDB
  * reproduces them bit-for-bit: `floor(x/w)*w` and `bit_xor`. */
object CatalogFunctions {

  /** `band(x DOUBLE, w BIGINT) → BIGINT`: floor(x/w)·w — the
    * histogram-bucket / price-band primitive. */
  object BandFn extends UnboundFunction {
    override def name(): String = "band"
    override def description(): String =
      "band(x, w): floor(x / w) * w — left edge of x's width-w band"
    override def bind(inputType: StructType): BoundFunction = {
      val types = inputType.fields.map(_.dataType).toSeq
      require(types == Seq(DoubleType, LongType),
        s"band(x DOUBLE, w BIGINT), got ${types.mkString(", ")}")
      BoundBand
    }
  }

  object BoundBand extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(DoubleType, LongType)
    override def resultType(): DataType = LongType
    override def name(): String = "band"
    override def canonicalName(): String = "graft.fn.band"
    // inputs are nullable DOUBLE/BIGINT columns: a NULL argument yields
    // NULL, so the declared result type must admit it (a false here
    // would let null-aware rewrites miscompile IS NULL over the result)
    override def isResultNullable: Boolean = true
    /** The magic method the resolver compiles into codegen. */
    def invoke(x: Double, w: Long): Long = (math.floor(x / w) * w).toLong
    override def produceResult(input: InternalRow): java.lang.Long =
      invoke(input.getDouble(0), input.getLong(1))
  }

  /** `xsum(v BIGINT) → BIGINT`: XOR-fold of the group — an
    * order-insensitive content fingerprint (DuckDB: `bit_xor`). */
  object XorAggFn extends UnboundFunction {
    override def name(): String = "xsum"
    override def description(): String =
      "xsum(v): XOR of all v in the group (order-insensitive fingerprint)"
    override def bind(inputType: StructType): BoundFunction = {
      val types = inputType.fields.map(_.dataType).toSeq
      require(types == Seq(LongType), s"xsum(v BIGINT), got ${types.mkString(", ")}")
      BoundXorAgg
    }
  }

  object BoundXorAgg extends AggregateFunction[java.lang.Long, java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(LongType)
    override def resultType(): DataType = LongType
    override def name(): String = "xsum"
    override def canonicalName(): String = "graft.fn.xsum"
    // SQL aggregate convention (like bit_xor/sum): empty group → NULL
    override def newAggregationState(): java.lang.Long = null
    override def update(state: java.lang.Long, input: InternalRow): java.lang.Long =
      if (input.isNullAt(0)) state // aggregates skip NULL inputs
      else {
        val v = input.getLong(0)
        if (state == null) java.lang.Long.valueOf(v)
        else java.lang.Long.valueOf(state.longValue ^ v)
      }
    override def merge(a: java.lang.Long, b: java.lang.Long): java.lang.Long =
      if (a == null) b
      else if (b == null) a
      else java.lang.Long.valueOf(a.longValue ^ b.longValue)
    override def produceResult(state: java.lang.Long): java.lang.Long = state
  }
}
