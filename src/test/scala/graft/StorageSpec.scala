package graft

import org.apache.spark.sql.functions._
import graft.ops.Storage

/** Storage-layout semantics: bucketed co-located joins plan no shuffle;
  * compaction hits the file-count target. */
class StorageSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join with zero shuffle exchanges") {
    val events = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value")
    val customer = Tables.customer(spark, sfDir)
    Storage.writeBucketedPair(spark,
      events, "ev_bucketed", "user_id",
      customer, "cust_bucketed", "c_custkey", buckets = 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Storage.bucketedJoin(spark,
        "ev_bucketed", "user_id", "cust_bucketed", "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // and it still computes the right thing
      val viaBuckets = joined.count()
      val viaPlain = events.join(customer,
        col("user_id") === col("c_custkey")).count()
      assert(viaBuckets === viaPlain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    // The dim's selective predicate is on a NON-join column
    // (conv_flag), so no static filter can be inferred onto the
    // fact — the only way the fact scan avoids reading all 5 partition
    // directories is Catalyst's DynamicPruningExpression, fed by the
    // dim broadcast at runtime. That is the 100 TB star-join shape:
    // partitions are pruned by the dim FILTER's outcome, not a literal.
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value")
    val factDir = Storage.partitionedRoundTrip(ev, "event_type")
    val dim = ev.select(col("event_type").as("type_name")).distinct()
      .withColumn("conv_flag",
        col("type_name").isin("purchase", "signup").cast("int"))
    val dimDir = Storage.codecRoundTrip(dim, "snappy")
    val joined = spark.read.parquet(dimDir)
      .filter(col("conv_flag") === 1)
      .join(spark.read.parquet(factDir),
        col("type_name") === col("event_type"))
      .groupBy("event_type").agg(count(lit(1)).as("n_rows"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"fact scan must carry a DynamicPruningExpression partition filter:\n$plan")

    val viaLayout = joined.as[(String, Long)].collect().toMap
    val direct = ev.filter(col("event_type").isin("purchase", "signup"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(viaLayout === direct)
  }

  test("nested schema pruning: one-leaf read scans only that leaf") {
    // The layout stores struct<user_id,event_type,value>; reading one
    // leaf must shrink the parquet ReadSchema to that leaf alone —
    // scan WIDTH, the other half of the 100 TB scan bill next to
    // partition pruning.
    val ev = Tables.events(spark, sfDir).select(col("event_id"),
      struct(col("user_id"), col("event_type"), col("value")).as("meta"))
    val dir = Storage.codecRoundTrip(ev, "snappy")
    val q = spark.read.parquet(dir)
      .groupBy(col("meta.event_type").as("event_type"))
      .agg(count(lit(1)).as("n_rows"))
    val scan = q.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scan.contains("struct<meta:struct<event_type:string>>"),
      s"scan must read only the event_type leaf:\n$scan")
    assert(!scan.contains("user_id") && !scan.contains("value:"),
      s"unused struct leaves must not be scanned:\n$scan")
    val viaStruct = q.as[(String, Long)].collect().toMap
    val direct = Tables.events(spark, sfDir)
      .groupBy("event_type").count().as[(String, Long)].collect().toMap
    assert(viaStruct === direct)
  }

  test("compaction reduces many small files to the size target") {
    val small = java.nio.file.Files.createTempDirectory("graft_small_").toString
    val compacted = java.nio.file.Files.createTempDirectory("graft_compact_").toString
    // simulate a small-files write: 64 files for 6k rows
    Tables.events(spark, sfDir).repartition(64).write.mode("overwrite").parquet(small)
    def parquetFiles(dir: String) =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(small) === 64)

    Storage.compact(spark, small, compacted, targetRowsPerFile = 2000)
    val n = parquetFiles(compacted)
    assert(n >= 1 && n <= 4, s"expected ~3 compacted files, got $n")
    assert(spark.read.parquet(compacted).count() ===
           spark.read.parquet(small).count())
  }

  test("schema evolution: merged read unions batch schemas, null-fills old rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve_").toString
    // batch 1: the producer's original shape
    Seq((1L, 10.0), (2L, 20.0)).toDF("user_id", "value")
      .write.mode("append").parquet(dir)
    // batch 2: the producer gained a column
    Seq((3L, 30.0, "mobile"), (4L, 40.0, "web"))
      .toDF("user_id", "value", "channel")
      .write.mode("append").parquet(dir)

    val merged = Storage.evolvingRead(spark, dir)
    assert(merged.columns.sorted.toSeq == Seq("channel", "user_id", "value"))
    val rows = merged.select("user_id", "channel")
      .as[(Long, Option[String])].collect().toMap
    assert(rows == Map(1L -> None, 2L -> None,
      3L -> Some("mobile"), 4L -> Some("web")))
    // a plain read pins ONE batch's schema — the new column is invisible,
    // which is exactly the silent data loss mergeSchema exists to prevent
    val plain = spark.read.parquet(dir)
    assert(plain.columns.length <= 3)
  }

  test("partitioned layout: the type filter prunes at the directory level") {
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value")
    val dir = Storage.partitionedRoundTrip(ev, "event_type")
    // one subdirectory per event type on disk
    val partDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("event_type=")).map(_.getName).sorted
    assert(partDirs.length === 5, s"expected 5 partition dirs, got ${partDirs.toSeq}")

    val scan = Storage.prunedScan(spark, dir, "event_type", "click")
    val plan = scan.queryExecution.executedPlan.toString
    // the predicate must appear INSIDE the PartitionFilters bracket —
    // 'PartitionFilters: []' plus a post-scan Filter would be a full scan
    val pf = "PartitionFilters: \\[[^\\]]*event_type".r
    assert(pf.findFirstIn(plan).isDefined,
      s"filter must resolve against the partition listing:\n$plan")
    assert(scan.count() ===
      ev.filter(col("event_type") === "click").count())
  }

  test("dynamic overwrite replaces only the restated partition; static would truncate") {
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "part", "v")
    val restated = Seq((9L, "b", 20.0)).toDF("id", "part", "v")
    val dir = Storage.dynamicOverwriteRoundTrip(base, restated, "part")
    val back = spark.read.parquet(dir)
      .select("id", "part", "v").as[(Long, String, Double)].collect().toSet
    // partition b replaced wholesale, a and c byte-identical survivors
    assert(back === Set((1L, "a", 1.0), (9L, "b", 20.0), (3L, "c", 3.0)))
  }

  test("sorted export: file key ranges are non-overlapping in file order") {
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "value")
    val dir = Storage.sortedExportRoundTrip(ev, "event_id", 8)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(parts.length > 1, "range partitioning must emit multiple files")
    val ranges = parts.map { p =>
      val mm = spark.read.parquet(p)
        .agg(min("event_id"), max("event_id")).head
      (mm.getLong(0), mm.getLong(1))
    }
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi < lo, s"file ranges must be disjoint and ordered: ${ranges.toSeq}")
    }
    assert(spark.read.parquet(dir).count() === ev.count())
  }

  test("zstd round trip is bit-identical and the files carry the codec") {
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "value")
    val dir = Storage.codecRoundTrip(ev, "zstd")
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.endsWith(".parquet"))
    assert(files.nonEmpty && files.forall(_.contains(".zstd.")),
      s"parquet part files must be zstd-coded: ${files.toSeq}")
    val back = spark.read.parquet(dir)
    assert(back.count() === ev.count())
    assert(back.agg(sum("event_id")).head.getLong(0) ===
      ev.agg(sum("event_id")).head.getLong(0))
  }
}
