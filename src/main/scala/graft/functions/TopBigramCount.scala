package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Count of the most frequent ADJACENT word pair in an `array<string>`
  * token column — the Gopher repetition gate's top-bigram statistic as a
  * single narrow per-row kernel.
  *
  * The distributed alternative (explode bigrams → groupBy(doc, bigram) →
  * groupBy(doc) max) shuffles the corpus's entire bigram stream twice for
  * a statistic that only ever depends on ONE document's own tokens; this
  * expression computes it in one O(n) pass per row — zero exchanges, the
  * shape that survives 100 TB. Bigrams are identified by a 64-bit
  * fingerprint (xxhash64 of each word, adjacent hashes mixed), the same
  * intra-key fingerprint discipline as the substring-span dedup's
  * (xxhash64, len) window keys: collisions are possible only WITHIN one
  * document's ~n² bigram pairs at P ≈ n²·2⁻⁶⁵ — vanishing, and
  * deterministic for a given corpus. Words come from `split(text, ' ')`,
  * so no word contains the join character and the pair fingerprint is
  * faithful to the joined-string bigram identity the differential oracle
  * counts. */
case class TopBigramCount(child: Expression) extends UnaryExpression {

  override val nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "top_bigram_count"

  override protected def nullSafeEval(v: Any): Any =
    TopBigramCount.topCount(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TopBigramCount.topCount($v);")

  override protected def withNewChildInternal(newChild: Expression): TopBigramCount =
    copy(child = newChild)
}

object TopBigramCount {
  /** One pass: hash each word once, mix adjacent hashes into a pair
    * fingerprint, count in an open HashMap, track the max. Null array
    * elements (cannot arise from `split`, guarded anyway) hash to a
    * fixed sentinel. */
  def topCount(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n < 2) return 0L
    val counts = new java.util.HashMap[java.lang.Long, Array[Int]](n * 2)
    var best = 0
    var prev = hashAt(arr, 0)
    var i = 1
    while (i < n) {
      val h = hashAt(arr, i)
      // golden-ratio mix keeps (a,b) and (b,a) distinct
      val key = java.lang.Long.valueOf(
        java.lang.Long.rotateLeft(prev, 17) * -7046029254386353131L + h)
      var c = counts.get(key)
      if (c == null) { c = new Array[Int](1); counts.put(key, c) }
      c(0) += 1
      if (c(0) > best) best = c(0)
      prev = h
      i += 1
    }
    best.toLong
  }

  private def hashAt(arr: ArrayData, i: Int): Long = {
    val u = arr.getUTF8String(i)
    if (u == null) -1L else XXH64.hashUTF8String(u, 42L)
  }
}
