package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

/** The catalog's canonical `bucket(numBuckets, col)` function — the piece
  * that makes STORAGE-PARTITIONED JOINS resolvable: Spark turns a scan's
  * reported `bucket(N, src)` transform into a catalyst expression by
  * loading this function from the table's [[EdgeCatalog]] (exactly how
  * Iceberg ships `system.bucket`), and two scans whose transforms load
  * the same `canonicalName` are join-compatible without an exchange.
  *
  * Semantics are deliberately the simplest deterministic form that any
  * engine can replay — floor-mod: `bucket(n, v) = ((v % n) + n) % n` —
  * NOT a hash. Edge ids are already dictionary-encoded ints, so modulo
  * spreads them uniformly; an oracle replays it as a plain `%`. */
object EdgeBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets INT, value BIGINT) -> INT: floor-mod bucket id"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket wants (numBuckets INT, value BIGINT), got $inputType")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket's first argument is the INT bucket count, got ${inputType.fields(0).dataType}")
    require(inputType.fields(1).dataType == LongType ||
        inputType.fields(1).dataType == IntegerType,
      s"bucket's second argument is the integral value, got ${inputType.fields(1).dataType}")
    BoundBucket
  }

  object BoundBucket extends ScalarFunction[Integer] {
    override def inputTypes(): Array[org.apache.spark.sql.types.DataType] =
      Array(IntegerType, LongType)
    override def resultType(): org.apache.spark.sql.types.DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket.floormod"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer =
      EdgeBucketFunction.bucketOf(input.getInt(0), input.getLong(1))
    /** Spark's codegen "magic method" — same definition, unboxed. */
    def invoke(n: Int, v: Long): Int = EdgeBucketFunction.bucketOf(n, v)
  }

  /** The one shared definition — writer shard naming, the bound function,
    * and specs all call this. */
  def bucketOf(n: Int, v: Long): Int = {
    val m = (v % n).toInt
    if (m < 0) m + n else m
  }

}
