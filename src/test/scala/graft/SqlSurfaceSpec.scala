package graft

import org.apache.spark.sql.functions._

/** Round-14 SQL-surface seats: SQL scalar/table UDFs (Spark 4
  * CREATE FUNCTION ... RETURN) and collation-aware analytics
  * (UTF8_LCASE). The graded properties beyond the oracle hash:
  * scalar-UDF bodies INLINE (no ScalaUDF node survives optimization),
  * table-UDF filters PUSH DOWN through the function boundary to the
  * parquet scan, and collated grouping/distinct/join genuinely
  * collapse case-classes without a materialized lower() column. */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("S6e SQL scalar UDF inlines: no ScalaUDF node, result = inline replay") {
    val res = SparkEntry.queries("s6e_sql_udf")(spark, sfDir)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      "SQL UDF must inline into native expressions, not a UDF call node")
    val got = res.as[(String, String, Double, Long)].collect().toSet
    val want = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"),
        when(col("l_quantity") < 10, "small")
          .when(col("l_quantity") < 30, "mid")
          .otherwise("bulk").as("qty_band"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
        2).as("revenue"), count(lit(1)).as("n"))
      .as[(String, String, Double, Long)].collect().toSet
    assert(got === want, "SQL-UDF result must equal the hand-inlined plan")
    assert(got.map(_._2).size === 3, "fixture must populate all 3 bands")
  }

  test("S6f SQL table UDF: filter pushes through the function boundary " +
       "to the parquet scan") {
    val res = SparkEntry.queries("s6f_sql_table_udf")(spark, sfDir)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(o_orderpriority,1-URGENT)") ||
           plan.contains("o_orderpriority = 1-URGENT"),
      s"priority filter must reach the scan as a pushed filter:\n$plan")
    val Array(row) = res.collect()
    val want = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .agg(count(lit(1)), round(sum("o_totalprice"), 2),
        countDistinct("o_custkey")).head
    assert(row.getLong(0) === want.getLong(0))
    assert(row.getDouble(1) === want.getDouble(1))
    assert(row.getLong(2) === want.getLong(2))
    assert(row.getLong(0) > 0, "urgent-order fixture vacuous")
  }

  test("S6g parameterized SQL: named params + IDENTIFIER() bind, and the " +
       "bound filter pushes to the scan as a literal") {
    val res = SparkEntry.queries("s6g_parameterized_sql")(spark, sfDir)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(value,25") ||
           plan.contains("value > 25"),
      s"bound :minVal must reach the scan as a pushed literal filter:\n$plan")
    val got = res.as[(String, Long, Double)].collect().toSet
    val want = Tables.events(spark, sfDir).filter(col("value") > 25)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .as[(String, Long, Double)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty, "fixture vacuous above the bound threshold")
  }

  test("S6h EXECUTE IMMEDIATE: the dynamic statement with USING binding " +
       "equals the statically-written query") {
    val got = SparkEntry.queries("s6h_execute_immediate")(spark, sfDir)
      .as[(String, Long, Double)].collect().toSet
    val want = Tables.events(spark, sfDir).filter(col("value") > 40)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(avg("value"), 2).as("avg_value"))
      .as[(String, Long, Double)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty, "fixture vacuous above the bound threshold")
  }

  test("A12 listagg: roster is the ascending id join; repartition leaves " +
       "the ordered aggregation unchanged") {
    // the baseline IS the registered seat (testing a private copy would
    // let the shipped lambda drift unchecked); only the repartitioned
    // variant is hand-built, since the seat fixes its own input
    val seat = SparkEntry.queries("a12_listagg")(spark, sfDir)
      .as[(String, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    def run(parts: Int): Map[String, (String, Long)] =
      Tables.events(spark, sfDir).repartition(parts)
        .filter(col("value") > 90)
        .groupBy("event_type")
        .agg(expr("listagg(cast(event_id AS string), ',') " +
          "WITHIN GROUP (ORDER BY event_id)").as("id_roster"),
          count(lit(1)).as("n"))
        .as[(String, String, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    val want = Tables.events(spark, sfDir).filter(col("value") > 90)
      .select("event_type", "event_id")
      .as[(String, Long)].collect().toSeq
      .groupBy(_._1).map { case (t, xs) =>
        t -> xs.map(_._2).sorted.mkString(",") }
    assert(seat.map { case (t, (r, _)) => t -> r } === want)
    assert(run(7) === seat,
      "ordered listagg must not depend on partitioning")
  }

  test("F13 try_* semantics: div-by-zero and long overflow yield NULL, " +
       "never an exception") {
    val rows = SparkEntry.queries("f13_try_arithmetic")(spark, sfDir)
      .as[(Long, Option[Double], Option[Long])].collect()
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "user_id").as[(Long, Long)].collect().toMap
    assert(rows.nonEmpty)
    rows.foreach { case (id, per, over) =>
      val uid = ev(id)
      assert(per.isDefined === (uid % 7 != 0),
        s"try_divide null-ness wrong for event $id (user $uid)")
      assert(over.isDefined === (uid <= 0L),
        s"try_add must overflow to NULL exactly for positive addends " +
          s"(event $id, user $uid)")
    }
    assert(rows.exists(_._2.isEmpty),
      "fixture must contain a div-by-zero bucket (user_id % 7 == 0)")
  }

  test("F11 collation: UTF8_LCASE grouping/distinct collapse case-classes " +
       "binary grouping keeps apart") {
    val df = Seq("Click", "CLICK", "click", "BUY").toDF("s")
    assert(df.groupBy(collate(col("s"), "UTF8_LCASE")).count().count() === 2L,
      "collated grouping must see 2 case-classes")
    assert(df.groupBy(col("s")).count().count() === 4L,
      "binary grouping control must see all 4 spellings")
    assert(df.agg(countDistinct(collate(col("s"), "UTF8_LCASE")))
      .head.getLong(0) === 2L,
      "collated count(DISTINCT) must count case-classes, not spellings")
  }

  test("F11 seat: collated join matches every mixed-case row; the fixture " +
       "genuinely mixes spellings") {
    val seat = SparkEntry.queries("f11_collation_group")(spark, sfDir)
      .as[(String, String, Long, Long)].collect()
    val ev = Tables.events(spark, sfDir)
    val total = ev.count()
    assert(seat.map(_._3).sum === total,
      "collated dim join must match EVERY event row (lost rows = " +
        "collation equality failed)")
    assert(seat.forall(_._4 === 1L),
      "within a collated group the collated DISTINCT must see one class")
    assert(seat.forall(r => r._2 === s"cat_${r._1}"),
      "dim label must ride the collated join")
    // non-vacuous: the derived column really has >1 spelling per type
    val spellings = ev.withColumn("etype_mixed",
        when(pmod(col("event_id"), lit(3)) === 0, upper(col("event_type")))
          .when(pmod(col("event_id"), lit(3)) === 1, initcap(col("event_type")))
          .otherwise(col("event_type")))
      .groupBy("event_type")
      .agg(countDistinct("etype_mixed").as("k"))
      .agg(min("k")).head.getLong(0)
    assert(spellings >= 2, "fixture must derive >=2 spellings per type")
  }
}
