package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Registers the library's native Catalyst expressions as SQL functions:
  *
  *   graft_polyhash(str)            — portable polynomial string hash
  *   graft_minhash_sig(hashes, k)   — k MinHash minima in one pass
  *   graft_simhash_sig(hashes)      — 64-bit SimHash as 4×16-bit bands
  *   graft_hll_registers(h, m)      — HLL register AGGREGATE (m-byte
  *                                    buffer, map-side partial merge)
  *   graft_hll_estimate(regs, m)    — scalar cardinality finalizer
  *
  * Two entry points, same registrations: set
  * `spark.sql.extensions=graft.functions.GraftExtensions` at session build
  * (the standard extension point), or call
  * [[GraftExtensions.register]] on an already-running session (notebooks,
  * tests). The SQL functions are the exact UnaryExpression nodes the Column
  * API uses — whole-stage-codegen'd, with interpreted HOF twins kept as
  * bit-equality oracles (Dedup.minhashSignatureHof / simhashBandsHof). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intLiteral(name: String, e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$name: expected an integer literal, got $other")
  }

  /** (identifier, info, builder) triples shared by both registration paths. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_polyhash(str)")
        PolyHash(args.head)
      }),
    (new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_minhash_sig(array<bigint>, k)")
        MinHashSig(args.head, intLiteral("graft_minhash_sig", args(1)))
      }),
    (new FunctionIdentifier("graft_simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, "graft_simhash_sig"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_simhash_sig(array<bigint>)")
        SimHashSig(args.head)
      }),
    (new FunctionIdentifier("graft_hll_registers"),
      new ExpressionInfo(classOf[HllRegisters].getName, "graft_hll_registers"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_hll_registers(bigint, m)")
        HllRegisters(args.head, intLiteral("graft_hll_registers", args(1)))
          .toAggregateExpression()
      }),
    (new FunctionIdentifier("graft_hll_estimate"),
      new ExpressionInfo(classOf[HllEstimate].getName, "graft_hll_estimate"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_hll_estimate(array<bigint>, m)")
        HllEstimate(args.head, intLiteral("graft_hll_estimate", args(1)))
      }))

  /** Registers the functions on a LIVE session (the extensions config only
    * applies at session construction). Idempotent. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
