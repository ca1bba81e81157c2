package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native packed hyperplane-sign signature of an `array<double>` vector:
  * bit `b` is set iff `dot(v, plane_b) > 0`, where
  * `plane_b[j] = ((b·64 + j) · 2654435761 mod 4096) / 4096 − 0.5` — the
  * same deterministic arithmetic planes as the HOF formulation in
  * `SimilarityOps.packedSignsHof` (results are bit-identical; a spec
  * asserts it). The HOF form materializes the 64×`nBits` plane matrix and
  * a zipped array per ROW through interpreted lambdas — at 64 bits that is
  * ~8k element allocations per row and dominated the LSH band gate; this
  * fused loop is plain double arithmetic, whole-stage-codegen friendly. */
case class HyperplaneSig(child: Expression, nBits: Int)
    extends UnaryExpression {

  require(nBits >= 1 && nBits <= 64, "signature must fit one long")

  override val nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), 64)
    var h = 0L
    var b = 0
    while (b < nBits) {
      var dot = 0.0
      var j = 0
      while (j < n) {
        dot += x.getDouble(j) *
          (((b * 64 + j) * 2654435761L % 4096L) / 4096.0 - 0.5)
        j += 1
      }
      if (dot > 0) h |= (1L << b)
      b += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = Math.min($v.numElements(), 64);
         |long $h = 0L;
         |for (int $b = 0; $b < $nBits; $b++) {
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $dot += $v.getDouble($j) *
         |      ((($b * 64 + $j) * 2654435761L % 4096L) / 4096.0 - 0.5);
         |  }
         |  if ($dot > 0) $h |= (1L << $b);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}
