package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit fingerprints of every `n`-token window of an `array<string>`
  * token column — the shared key-building kernel of the shingle/window
  * family (cross-source overlap, substring-span dedup, decontamination).
  *
  * The HOF formulation these operators previously used —
  * `transform(sequence(...), i -> concat_ws(' ', slice(words, i+1, n)))`
  * then `xxhash64(shingle)` — materializes every window as a STRING
  * through interpreted lambdas (n·|words| char copies per document)
  * before immediately hashing it away. This kernel hashes each word once
  * and mixes adjacent hashes (rotate-multiply chain) directly into the
  * window fingerprint: one O(n·|words|) arithmetic pass, zero string
  * allocation, full whole-stage codegen.
  *
  * Split by ' ' guarantees no token contains the separator, so the mixed
  * fingerprint keys the same window identity the joined-string hash
  * keyed (two windows agree iff their token sequences agree, modulo
  * 64-bit collisions at P ≈ N²·2⁻⁶⁵ over N distinct windows — the same
  * budget as the (xxhash64, length) string fingerprints used elsewhere,
  * deterministic for a given corpus). */
case class NgramFingerprints(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "n must be >= 1")

  override val nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_fingerprints"

  override protected def nullSafeEval(v: Any): Any =
    NgramFingerprints.fingerprints(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.NgramFingerprints.fingerprints($v, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramFingerprints =
    copy(child = newChild)
}

object NgramFingerprints {
  def fingerprints(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    val k = m - n + 1
    if (k <= 0) return new GenericArrayData(Array.emptyLongArray)
    val h = new Array[Long](m)
    var i = 0
    while (i < m) {
      val u = arr.getUTF8String(i)
      h(i) = if (u == null) -1L else XXH64.hashUTF8String(u, 42L)
      i += 1
    }
    val out = new Array[Long](k)
    i = 0
    while (i < k) {
      var f = -3750763034362895579L
      var j = i
      while (j < i + n) {
        f = java.lang.Long.rotateLeft(f, 13) * -7046029254386353131L + h(j)
        j += 1
      }
      out(i) = f
      i += 1
    }
    new GenericArrayData(out)
  }
}
