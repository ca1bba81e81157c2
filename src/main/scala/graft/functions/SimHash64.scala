package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native 64-bit SimHash of an `array<string>` token column: every token
  * votes ±1 per bit of its xxhash64 (seed 42, the SQL `xxhash64` default),
  * the sign vector re-packs into a long. Bit-identical to the HOF
  * formulation retained in `DedupOps.simHashesHof` (spec-checked) — which
  * allocates two 64-element arrays per TOKEN through interpreted lambdas;
  * this is one fused loop with a 64-slot vote buffer per row. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override val nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Long](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) { votes(b) += ((h >>> b) & 1L) * 2L - 1L; b += 1 }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      val xxh64 = classOf[XXH64].getName
      s"""
         |long[] $votes = new long[64];
         |int $n = $v.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $xxh64.hashUTF8String($v.getUTF8String($i), 42L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $votes[$b] += (($h >>> $b) & 1L) * 2L - 1L;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
