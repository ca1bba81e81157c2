package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: argmax-dot cell assignment for the Lloyd
  * iteration ([[graft.ext.SimilarityOps.kmeansCells]]) — `left` is the
  * row's `array<double>` vector, `right` an
  * `array<struct<c: bigint, u: array<double>>>` of UNIT-normalized
  * centroids sorted by cell id. Returns the cell id whose centroid has
  * the largest dot product with the vector; comparison is strict `>`, so
  * ties resolve to the smaller (earlier) cell id — the same tie-break as
  * the windowed `ORDER BY d DESC, cell ASC` form the oracle replays.
  *
  * Why custom (SURVEY §7.3): the previous assignment embedded the k·d
  * centroid matrix as a `typedLit` INSIDE the expression tree, so every
  * Lloyd round produced a brand-new tree and re-ran Janino on a generated
  * class that inlines k·d doubles — at k in the thousands that serializes
  * the whole loop behind driver-side compilation. Here the centroids
  * arrive as a COLUMN (one broadcast row cross-joined in), the tree is
  * identical every round, and the generated class is cached after round
  * one; only the broadcast payload changes. The k×d loop itself is fused
  * — no per-cell array allocation, no higher-order-function frames. */
case class CentroidArgmax(left: Expression, right: Expression)
    extends BinaryExpression {

  override val nullIntolerant: Boolean = true

  override def dataType: DataType = LongType
  override def prettyName: String = "centroid_argmax"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val d = v.numElements()
    var best = -1L
    var bestDot = Double.NegativeInfinity
    var i = 0
    val k = cents.numElements()
    while (i < k) {
      val cent = cents.getStruct(i, 2)
      val u = cent.getArray(1)
      val n = math.min(d, u.numElements())
      var dot = 0.0
      var j = 0
      while (j < n) { dot += v.getDouble(j) * u.getDouble(j); j += 1 }
      if (dot > bestDot) { bestDot = dot; best = cent.getLong(0) }
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cents) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val u = ctx.freshName("u")
      val cent = ctx.freshName("cent")
      val dot = ctx.freshName("dot")
      val best = ctx.freshName("best")
      val bestDot = ctx.freshName("bestDot")
      s"""
         |int $d = $v.numElements();
         |int $k = $cents.numElements();
         |long $best = -1L;
         |double $bestDot = Double.NEGATIVE_INFINITY;
         |for (int $i = 0; $i < $k; $i++) {
         |  InternalRow $cent = $cents.getStruct($i, 2);
         |  ArrayData $u = $cent.getArray(1);
         |  int $n = Math.min($d, $u.numElements());
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $dot += $v.getDouble($j) * $u.getDouble($j);
         |  }
         |  if ($dot > $bestDot) { $bestDot = $dot; $best = $cent.getLong(0); }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidArgmax =
    copy(left = newLeft, right = newRight)
}
