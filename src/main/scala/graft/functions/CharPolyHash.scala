package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 31-polynomial rolling hash mod 1e9+7 over a string's characters —
  * the [[graft.ext.TextOps.fingerprints]] rolling hash as one codegen
  * pass, bit-identical to the SQL HOF it replaces
  * (`aggregate(filter(split(text, ''), c -> c <> ''), 0L,
  *   (acc, c) -> pmod(acc * 31 + ascii(c), 1000000007L))`),
  * which evaluated an interpreted lambda PER CHARACTER of every
  * document. `ascii` returns the leading code point of each
  * one-character split, so iterating code points reproduces the exact
  * sequence; the differential oracle replays the same polynomial in
  * SQL, and the spec pins equality with the HOF form. */
case class CharPolyHash(child: Expression) extends UnaryExpression {

  override val nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "char_poly_hash"

  override protected def nullSafeEval(v: Any): Any =
    CharPolyHash.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.CharPolyHash.hash($v);")

  override protected def withNewChildInternal(newChild: Expression): CharPolyHash =
    copy(child = newChild)
}

object CharPolyHash {
  private final val Mod = 1000000007L

  def hash(u: UTF8String): Long = {
    val s = u.toString
    var a = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      a = (a * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    a
  }
}
