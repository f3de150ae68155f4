package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native k-component MinHash over an array of shingle hashes:
  * `sig(i) = min over h of ((2i+1)·h + 17i+3) mod P`, empty input → all P
  * (an impossible hash, so empty docs never collide with content) —
  * bit-identical to the higher-order-function formulation it replaces
  * (`transform(sequence(0,k-1), i => coalesce(array_min(transform(hs, ...)), P))`)
  * and to the DuckDB oracle lambda, but ONE pass over the hash array
  * updating k running minima instead of k interpreted passes. Measured on
  * the sf0.1 near-dup corpus: the k=16 signature step dominated the whole
  * pipeline (~40 s of interpreted lambda evaluation for a 0.8 s join);
  * this expression removes it. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig requires array<bigint>, got $other")
    }

  // NULL contract: a null INPUT array returns null (UnaryExpression's
  // null-safe shortcut) — the Column-level wrapper (Dedup.minhashSignature)
  // normalizes null shingle sets to empty arrays upstream so null-text docs
  // get the all-P signature, matching the HOF formulation. Null ELEMENTS
  // are skipped (a null shingle hash contributes no minimum), in both the
  // interpreted and the codegen path.
  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(MinHashSig.P)
    var j = 0
    while (j < hs.numElements()) {
      if (!hs.isNullAt(j)) {
        val h = hs.getLong(j)
        var i = 0
        while (i < k) {
          val v = (h * (2L * i + 1L) + (17L * i + 3L)) % MinHashSig.P
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, ${MinHashSig.P}L);
         |for (int $j = 0; $j < $c.numElements(); $j++) {
         |  if (!$c.isNullAt($j)) {
         |    long $h = $c.getLong($j);
         |    for (int $i = 0; $i < $k; $i++) {
         |      long $v = ($h * (2L * $i + 1L) + (17L * $i + 3L)) % ${MinHashSig.P}L;
         |      if ($v < $sig[$i]) $sig[$i] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val P = 1000003L

  def apply(hashes: Column, k: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(hashes), k))
}
