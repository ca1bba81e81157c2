package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** Content-defined chunk spans of a token array — the whole
  * [[graft.ext.TextOps.cdcChunks]] computation as ONE per-row kernel.
  *
  * Replaces a chain of: nested interpreted HOFs (per-word 31-polynomial
  * char hash inside a transform lambda), a posexplode of every word
  * position, a doc-partitioned WINDOW (shuffle + sort) for the
  * trailing-3 hash and the running boundary count, and a final
  * (doc, chunk) aggregate — with a single O(|words|) arithmetic pass
  * per document. Chunk boundaries and ids are BIT-IDENTICAL to the
  * window formulation (same 31-polynomial `pmod` char hash, same
  * h₂·961 + h₁·31 + h₀ trailing-window rule, same divisor test), which
  * the differential oracle replays in SQL; the spec pins equality with
  * the window form. Zero exchanges — the 100 TB shape for a statistic
  * that depends only on one document's own tokens.
  *
  * Input is the RAW `split(text, ' ')` array; empty tokens are skipped
  * inside the kernel (the previous SQL `filter(words, w -> w <> '')`),
  * and positions count non-empty words only, exactly as the posexplode
  * over the filtered array did. */
case class CdcChunkSpans(child: Expression, divisor: Int)
    extends UnaryExpression {
  require(divisor >= 1, "divisor must be >= 1")

  override val nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("chunk_id", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("start_pos", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "cdc_chunk_spans"

  override protected def nullSafeEval(v: Any): Any =
    CdcChunkSpans.spans(v.asInstanceOf[ArrayData], divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.CdcChunkSpans.spans($v, $divisor);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunkSpans =
    copy(child = newChild)
}

object CdcChunkSpans {
  private final val Mod = 1000000007L

  // Per-word hash is [[CharPolyHash.hash]] — the ONE implementation of
  // the spec-pinned 31-polynomial mod-1e9+7 code-point hash (a second
  // copy here could silently drift from the one the fingerprint
  // operators grade against).

  def spans(words: ArrayData, divisor: Int): ArrayData = {
    val m = words.numElements()
    // pass 1: hashes of non-empty words, positions counted post-filter
    val h = new Array[Long](m)
    var n = 0
    var i = 0
    while (i < m) {
      val u = words.getUTF8String(i)
      if (u != null && u.numBytes() > 0) { h(n) = CharPolyHash.hash(u); n += 1 }
      i += 1
    }
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // pass 2: boundary at position p (p >= 2) when the trailing-3 mixed
    // hash is 0 mod divisor; a boundary STARTS a new chunk at p
    val out = new java.util.ArrayList[Any]()
    var chunkId = 0L
    var start = 0
    var p = 1
    while (p < n) {
      if (p >= 2 &&
          (((h(p - 2) * 961 + h(p - 1) * 31 + h(p)) % Mod) % divisor) == 0) {
        out.add(new GenericInternalRow(
          Array[Any](chunkId, (p - start).toLong, start)))
        chunkId += 1
        start = p
      }
      p += 1
    }
    out.add(new GenericInternalRow(
      Array[Any](chunkId, (n - start).toLong, start)))
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }
}
