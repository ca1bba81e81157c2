package graft

import org.apache.spark.sql.functions._

/** The CDC-chunking and rolling-hash kernels must be bit-identical to
  * the SQL window/HOF formulations they replaced. */
class TextKernelsSpec extends SparkSpec {
  import spark.implicits._

  private def windowCdc(docs: org.apache.spark.sql.DataFrame, divisor: Int) = {
    import org.apache.spark.sql.expressions.Window
    val pos = docs
      .withColumn("wh",
        expr("""transform(filter(split(text, ' '), w -> w <> ''),
                w -> aggregate(filter(split(w, ''), c -> c <> ''), 0L,
                               (a, c) -> pmod(a * 31 + ascii(c), 1000000007L)))"""))
      .select(col("doc_id"), posexplode(col("wh")).as(Seq("pos", "h")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    pos
      .withColumn("h1", lag("h", 1).over(w))
      .withColumn("h2", lag("h", 2).over(w))
      .withColumn("boundary",
        when(col("h2").isNotNull &&
             pmod(col("h2") * 961 + col("h1") * 31 + col("h"),
               lit(1000000007L)) % divisor === 0, 1L).otherwise(0L))
      .withColumn("chunk_id", sum("boundary").over(w))
      .groupBy("doc_id", "chunk_id")
      .agg(count(lit(1)).as("n_tokens"), min("pos").as("start_pos"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), col("chunk_id"), col("n_tokens"),
        col("start_pos").cast("long"))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq

  test("cdc_chunk_spans equals the window formulation on the real corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    for (divisor <- Seq(4, 16)) {
      val want = rows(windowCdc(docs, divisor))
      val got = rows(graft.ext.TextOps.cdcChunks(docs, divisor))
      assert(got.size === want.size, s"divisor=$divisor row counts differ")
      assert(got === want, s"divisor=$divisor spans differ")
    }
  }

  test("cdc_chunk_spans edges: short docs, empty tokens, single word") {
    val docs = Seq(
      (1L, "one"), (2L, "two words"), (3L, "a  b   c"),
      (4L, (1 to 100).map(i => s"w${i % 7}").mkString(" "))
    ).toDF("doc_id", "text")
    assert(rows(graft.ext.TextOps.cdcChunks(docs, 4)) ===
           rows(windowCdc(docs, 4)))
  }

  test("char_poly_hash equals the per-char HOF on the real corpus") {
    graft.functions.GraftExtensions.register(spark)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val diff = docs.select(
        expr("char_poly_hash(text)").as("k"),
        expr("aggregate(filter(split(text, ''), c -> c <> ''), 0L, (acc, c) -> pmod(acc * 31 + ascii(c), 1000000007L))")
          .as("h"))
      .filter(col("k") =!= col("h")).count()
    assert(diff === 0L)
  }

  test("char_poly_hash edges: empty, spaces, punctuation") {
    graft.functions.GraftExtensions.register(spark)
    val docs = Seq("", " ", "a", "a b", "x!@# $%").toDF("text")
    val diff = docs.select(
        expr("char_poly_hash(text)").as("k"),
        expr("aggregate(filter(split(text, ''), c -> c <> ''), 0L, (acc, c) -> pmod(acc * 31 + ascii(c), 1000000007L))")
          .as("h"))
      .filter(col("k") =!= col("h")).count()
    assert(diff === 0L)
  }
}
