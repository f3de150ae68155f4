package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 64-bit SimHash over an array of token hashes, materialized as
  * 4×16-bit band values: bit b's vote for token hash h is
  * `((h·(2b+3) + 5b+1) mod P) mod 2` mapped to ±1; bit b is set iff its
  * vote sum is positive; band j folds bits 16j..16j+15 MSB-first —
  * bit-identical to the nested higher-order-function formulation it
  * replaces ([[graft.dedup.Dedup.simhashBandsHof]]) and to the DuckDB s4
  * oracle CTE, but ONE pass over the token array updating 64 vote counters
  * instead of 64 interpreted array traversals (the same interpreted-HOF
  * shape that cost MinHash ~40 s before [[MinHashSig]]).
  *
  * NULL contract mirrors MinHashSig: null INPUT returns null (callers
  * normalize null token sets to empty upstream → all-zero bands); null
  * ELEMENTS are skipped. */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_sig requires array<bigint>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val th = input.asInstanceOf[ArrayData]
    val votes = new Array[Long](64)
    var j = 0
    while (j < th.numElements()) {
      if (!th.isNullAt(j)) {
        val h = th.getLong(j)
        var b = 0
        while (b < 64) {
          if ((h * (2L * b + 3L) + (5L * b + 1L)) % SimHashSig.P % 2L == 1L)
            votes(b) += 1
          else votes(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    val bands = new Array[Long](4)
    var band = 0
    while (band < 4) {
      var acc = 0L
      var bit = 0
      while (bit < 16) {
        acc = acc * 2 + (if (votes(band * 16 + bit) > 0) 1L else 0L)
        bit += 1
      }
      bands(band) = acc
      band += 1
    }
    new GenericArrayData(bands)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val bands = ctx.freshName("bands")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val band = ctx.freshName("band")
      val bit = ctx.freshName("bit")
      val acc = ctx.freshName("acc")
      s"""
         |long[] $votes = new long[64];
         |for (int $j = 0; $j < $c.numElements(); $j++) {
         |  if (!$c.isNullAt($j)) {
         |    long $h = $c.getLong($j);
         |    for (int $b = 0; $b < 64; $b++) {
         |      if (($h * (2L * $b + 3L) + (5L * $b + 1L)) % ${SimHashSig.P}L % 2L == 1L) $votes[$b]++;
         |      else $votes[$b]--;
         |    }
         |  }
         |}
         |long[] $bands = new long[4];
         |for (int $band = 0; $band < 4; $band++) {
         |  long $acc = 0L;
         |  for (int $bit = 0; $bit < 16; $bit++) {
         |    $acc = $acc * 2 + ($votes[$band * 16 + $bit] > 0 ? 1L : 0L);
         |  }
         |  $bands[$band] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bands);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  val P = 1000003L

  def apply(tokenHashes: Column): Column =
    GraftBridge.column(SimHashSig(GraftBridge.expression(tokenHashes)))
}
