package graft

import org.apache.spark.sql.functions._

/** The native top-bigram kernel (`text_repetition`'s statistic): must be
  * value-identical to the reference explode + two-level groupBy
  * formulation it replaced, on real corpus text and on adversarial
  * edges. */
class TopBigramCountSpec extends SparkSpec {
  import spark.implicits._

  private def referenceTop(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 2)
      .select(col("doc_id"),
        explode(expr(
          "transform(sequence(0, size(words) - 2), i -> concat_ws(' ', words[i], words[i+1]))"))
          .as("bigram"))
      .groupBy("doc_id", "bigram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_n"))

  private def kernelTop(df: org.apache.spark.sql.DataFrame) = {
    graft.functions.GraftExtensions.register(spark)
    df.withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 2)
      .select(col("doc_id"), expr("top_bigram_count(words)").as("top_n"))
  }

  test("kernel equals the explode/groupBy reference on the real corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val want = referenceTop(docs).as[(Long, Long)].collect().toMap
    val got = kernelTop(docs).as[(Long, Long)].collect().toMap
    assert(got.size === want.size)
    assert(got === want)
  }

  test("edges: repeats, single bigram, overlapping runs, empty tokens") {
    val docs = Seq(
      (1L, "a b a b a b"),          // "a b" x3 overlapping with "b a" x2
      (2L, "x y"),                  // exactly one bigram
      (3L, "w w w w"),              // "w w" x3 — identical adjacent words
      (4L, "a  b a  b"),            // double spaces → empty tokens count
      (5L, "p q r s t u")           // all bigrams distinct → top 1
    ).toDF("doc_id", "text")
    val want = referenceTop(docs).as[(Long, Long)].collect().toMap
    val got = kernelTop(docs).as[(Long, Long)].collect().toMap
    assert(got === want)
    assert(got(1L) === 3L && got(2L) === 1L && got(3L) === 3L &&
           got(5L) === 1L)
  }

  test("interpreted eval path agrees with codegen") {
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array("a", "b", "a", "b").map(
        org.apache.spark.unsafe.types.UTF8String.fromString))
    assert(graft.functions.TopBigramCount.topCount(arr) === 2L)
  }
}
