package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the portable polynomial string hash
  * `acc = (acc*131 + code) mod 1000003` over the string's characters —
  * bit-identical to the higher-order-function formulation in
  * [[graft.text.TextOps.polyHash]] (`aggregate(transform(split(s,""),...))`)
  * but one tight codegen'd loop per string instead of a per-character
  * array allocation + three nested HOF evaluations. Participates in
  * whole-stage codegen via `doGenCode`; the interpreted `nullSafeEval`
  * path computes the same fold.
  *
  * Portability note: matches DuckDB's `unicode()`-based oracle lambda for
  * ASCII input (see TextOps — all fixtures are ASCII); codepoints are
  * folded `pmod`-style so the result is always in [0, P).
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"polyhash requires a string argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val code = ctx.freshName("code")
      s"""
         |java.lang.String $s = $c.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  long $code = (long) $s.codePointAt($i);
         |  if (java.lang.Character.isHighSurrogate($s.charAt($i))) $i++;
         |  $code = (($code % ${PolyHash.P}L) + ${PolyHash.P}L) % ${PolyHash.P}L;
         |  $acc = ($acc * ${PolyHash.B}L + $code) % ${PolyHash.P}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  val P = 1000003L
  val B = 131L

  /** Interpreted fold, codepoint-at-a-time (mirrors Spark's `ascii` /
    * DuckDB's `unicode` per character for ASCII; identical to doGenCode). */
  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (Character.isHighSurrogate(s.charAt(i))) i += 1
      val code = ((cp.toLong % P) + P) % P
      acc = (acc * B + code) % P
      i += 1
    }
    acc
  }

  /** Column wrapper (the production entry point — see TextOps.polyHash). */
  def apply(col: Column): Column =
    GraftBridge.column(PolyHash(GraftBridge.expression(col)))
}
