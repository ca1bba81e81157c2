package graft

import org.apache.spark.sql.functions._

/** DSv2 FunctionCatalog ([[graft.sources.GraftFunctionCatalog]]): the
  * catalog resolution path, the scalar magic-invoke binding, the
  * aggregate's distributed merge lifecycle, and null handling. */
class V2FunctionCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def withCatalog[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.graft_fns",
      classOf[sources.GraftFunctionCatalog].getName)
    body
  }

  test("catalog resolution: SHOW FUNCTIONS lists both V2 functions") {
    withCatalog {
      val fns = spark.sql("SHOW FUNCTIONS IN graft_fns.ext")
        .as[String].collect().toSet
      assert(fns.exists(_.endsWith("disc_rev")) &&
             fns.exists(_.endsWith("geo_mean")),
        s"catalog must list its functions: $fns")
    }
  }

  test("scalar magic invoke + aggregate merge lifecycle match the " +
       "native replay; the aggregate partial-aggregates map-side") {
    withCatalog {
      val res = SparkEntry.queries("s7f_v2_function_catalog")(spark, sfDir)
      val plan = res.queryExecution.executedPlan.toString
      assert(plan.contains("GeoMeanFn"),
        "V2 aggregate must appear in the physical aggregate")
      assert(plan.contains("partial_v2aggregator"),
        s"V2 aggregate must have a map-side partial stage:\n$plan")
      assert("DiscRevFn@[0-9a-f]+\\.invoke\\(".r.findFirstIn(plan).isDefined,
        s"scalar must bind through the MAGIC invoke (codegen), not the " +
          s"row-based ApplyFunctionExpression fallback:\n$plan")
      val got = res.as[(String, Double, Double, Long)].collect().toSet
      val want = Tables.lineitem(spark, sfDir)
        .groupBy("l_returnflag")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
          2).as("revenue"),
          round(exp(avg(log(col("l_quantity")))), 6).as("geo_qty"),
          count(lit(1)).as("n"))
        .as[(String, Double, Double, Long)].collect().toSet
      assert(got === want)
    }
  }

  test("scalar null handling: a NULL operand yields NULL, not a crash") {
    withCatalog {
      val r = spark.sql(
        """SELECT graft_fns.ext.disc_rev(CAST(NULL AS DOUBLE), 0.1d) AS a,
                  graft_fns.ext.disc_rev(10.0d, 0.25d) AS b""").head()
      assert(r.isNullAt(0), "NULL price must produce NULL")
      assert(r.getDouble(1) === 7.5)
    }
  }

  test("aggregate empty/positive-domain guard: zero qualifying rows " +
       "produce NULL, non-positive inputs are skipped") {
    withCatalog {
      Seq(1.0, -3.0, 0.0, Math.E).toDF("x").createOrReplaceTempView("gm_v")
      val r = spark.sql(
        """SELECT graft_fns.ext.geo_mean(x) AS g,
                  graft_fns.ext.geo_mean(CASE WHEN x > 100 THEN x END) AS e
           FROM gm_v""").head()
      // positive domain {1, e}: geo mean = exp((0 + 1)/2) = e^0.5
      assert(math.abs(r.getDouble(0) - math.exp(0.5)) < 1e-9)
      assert(r.isNullAt(1), "no qualifying rows must produce NULL")
    }
  }
}
