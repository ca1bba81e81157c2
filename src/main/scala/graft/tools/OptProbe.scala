package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 optimization scratch harness: ad-hoc in-JVM A/B experiments
  * (candidate plan shapes vs the graded implementations) under the
  * bench's exact timed session config. Scenarios come and go as the
  * round progresses; nothing here is part of the driver contract. */
object OptProbe {
  def time[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $tag%-36s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    r
  }
  def timeN(tag: String, n: Int)(f: => Any): Unit =
    (1 to n).foreach(_ => time(tag)(f))

  def main(args: Array[String]): Unit = {
    graft.TmpDirs.install()
    javax.imageio.ImageIO.setUseCache(false)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // the bench's exact timed session config, one shared definition
    val spark = graft.TmpDirs.timedSessionBuilder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // r17: the NativeVectorMathRule fusion must be installed in
    // EVERY driving session (it was previously spec-only - the graded
    // similarity paths ran interpreted HOF dot products)
    graft.functions.GraftExtensions.installOptimizations(spark)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.headOption.getOrElse("q21") match {
      case "q21" => q21(spark, sf)
      case "q2" => q2(spark, sf)
      case "t53" => t53(spark, sf)
      case "t53bloom" => t53bloom(spark, sf)
      case "t53parts" => t53parts(spark, sf)
      case "t53agg" => t53agg(spark, sf)
      case "scan" => scan(spark, sf)
      case "spread" => spread(spark, sf)
      case "j8" => j8(spark, sf)
      case "semantic" => semantic(spark, sf)
      case "cms" => cms(spark, sf)
      case "vote" => vote(spark, sf)
      case "vote2" => vote2(spark, sf)
      case "s10" => s10(spark, sf)
      case "bpe" => bpe(spark, sf)
      case "plans18" => plans18(spark, sf)
      case "paircount" => paircount(spark, sf)
      case "textex" => textex(spark, sf)
      case other => println(s"unknown scenario $other")
    }
    spark.stop()
  }

  private def noopW(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Per-operator metrics of an executed plan (the committed-code stand-in
    * for the Spark UI's SQL tab). */
  private def dumpMetrics(df: DataFrame): Unit = {
    def dump(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
      val m = p.metrics.map { case (k, v) => s"$k=${v.value}" }
        .filter(s => s.contains("numOutputRows") || s.contains("time") ||
          s.contains("Time") || s.contains("numPartitions")).take(5).mkString(" ")
      println(("  " * depth) + p.nodeName + " :: " + m)
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          dump(a.executedPlan, depth + 1)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          dump(q.plan, depth + 1)
        case other => other.children.foreach(dump(_, depth + 1))
      }
    }
    dump(df.queryExecution.executedPlan, 0)
  }

  /** dedup_semantic_verified decomposition at the session's core count:
    * band candidates → top-20 cosine pairs → jaccard verify → full seat.
    * The r17 driver board reproduced 5.28 s at 32 cores (vs 1.47 at 8) —
    * this separates the stages and dumps executed-plan metrics. */
  def semantic(spark: SparkSession, sf: String): Unit = {
    val S = graft.ext.SimilarityOps
    val emb = graft.Tables.embeddings(spark, sf)
    val docs = graft.Tables.documents(spark, sf)
    val full = graft.SparkEntry.queries("dedup_semantic_verified")
    // warm every stage's codegen first
    noopW(S.bandCandidatePairs(emb, 32, 2)); full(spark, sf).count()
    timeN("band candidates", 3)(noopW(S.bandCandidatePairs(emb, 32, 2)))
    timeN("nearDup top-20", 3)(S.nearDupPairsWithinLabel(emb, 20).count())
    val pairs = S.nearDupPairsWithinLabel(emb, 20)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"), col("cosine"))
    timeN("jaccard verify", 3)(
      graft.ext.DedupOps.jaccardForPairs(docs, pairs, 3).count())
    timeN("full seat", 5)(full(spark, sf).count())
    val df = full(spark, sf)
    time("full collect")(df.collect())
    dumpMetrics(df)
  }

  /** sketch_cms_heavy decomposition: the exact top-k leg, the distributed
    * count_min_sketch leg, and the full seat (reproduced 5.28→2.02 s in-run
    * at 32 cores in the r17 driver board; 0.41 s at 8 cores). */
  def cms(spark: SparkSession, sf: String): Unit = {
    val ev = graft.Tables.events(spark, sf)
    val keyed = ev.select(
      when(col("user_id") % 5 < 2, lit(7L))
        .when(col("user_id") % 5 === 2, lit(13L))
        .otherwise(col("user_id") % 1000).as("hot_key"))
    graft.ops.Sketches.cmsHeavyHitters(ev).count() // warm
    timeN("exact top-k leg", 4)(
      keyed.groupBy("hot_key").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("hot_key")).limit(5).collect())
    timeN("cms agg leg", 4)(
      keyed.agg(expr("count_min_sketch(hot_key, 0.005d, 0.99d, 42)"),
        count(lit(1))).head())
    timeN("full seat", 5)(graft.ops.Sketches.cmsHeavyHitters(ev).count())
  }

  /** vote_e2e family decomposition: staged-topic build, the two batch
    * seats, the three streaming seats. */
  def vote(spark: SparkSession, sf: String): Unit = {
    val V = graft.pipeline.VotePipeline
    val qs = graft.SparkEntry.queries
    Seq("vote_e2e_party_tally", "vote_e2e_turnout_by_state").foreach { n =>
      qs(n)(spark, sf).count() // warm
    }
    time("decoded batch noop")(noopW(V.decoded(spark, 1000)))
    timeN("party_tally (batch)", 3)(qs("vote_e2e_party_tally")(spark, sf).count())
    timeN("turnout_by_state (batch)", 3)(qs("vote_e2e_turnout_by_state")(spark, sf).count())
    timeN("stream_tally", 3)(qs("vote_e2e_stream_tally")(spark, sf).count())
    timeN("live_results", 3)(qs("vote_e2e_live_results")(spark, sf).count())
    timeN("reemit", 3)(qs("vote_e2e_reemit")(spark, sf).count())
  }

  /** vote streaming pacing A/B: the shipped 2-micro-batch live_results /
    * reemit vs single-batch variants (maxFilesPerTrigger absent → all 4
    * staged files in one batch) — same final rows by complete-mode
    * construction; measures what the second micro-batch costs. */
  def vote2(spark: SparkSession, sf: String): Unit = {
    import graft.ops.Decode
    import graft.model.Schemas
    val V = graft.pipeline.VotePipeline
    val qs = graft.SparkEntry.queries
    qs("vote_e2e_live_results")(spark, sf).count() // warm + stage topic
    // the staged topic dir is private; A/B through a local re-staging
    val dir = graft.TmpDirs.create("graft_voteab_").toString
    V.wire(spark, 1000).repartition(4).write.mode("overwrite").parquet(dir)
    val dim = graft.gen.Generator.candidatesFull(spark)
      .select(concat(lit("c"), col("candidate_id")).as("candidate_id"),
        col("candidate_name"), col("party_affiliation"))
    def live(maxFiles: Option[Int], tag: String): Unit =
      graft.streaming.StreamOps.perfScope(spark, Some(4)) {
        val rdr = spark.readStream.schema("key STRING, value BINARY")
        val src = maxFiles.map(n => rdr.option("maxFilesPerTrigger", n))
          .getOrElse(rdr).parquet(dir)
        val q = Decode.flatten(Decode.jsonDecode(
            Decode.castValueToString(src), Schemas.VoteSchema))
          .groupBy("candidate_id")
          .agg(sum("vote").as("total_votes"))
          .join(broadcast(dim), "candidate_id")
          .select("candidate_name", "party_affiliation", "total_votes")
          .writeStream.format("memory").queryName(tag)
          .outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
        spark.table(tag)
      }
    live(Some(2), "vab_warm2"); live(None, "vab_warm1")
    (1 to 4).foreach { i =>
      time("live 2-batch")(live(Some(2), s"vab2_$i"))
      time("live 1-batch")(live(None, s"vab1_$i"))
    }
    val a = spark.table("vab2_4").collect().map(_.toString).sorted
    val b = spark.table("vab1_4").collect().map(_.toString).sorted
    println(s"rows equal: ${a.sameElements(b)} (${a.length})")
  }

  /** s10_wire_emit_exactly_once: the full seat (2 micro-batches, each
    * appending its frames twice) and the consumer leg alone. */
  def s10(spark: SparkSession, sf: String): Unit = {
    val S = graft.streaming.StreamOps
    graft.SparkEntry.queries("s10_wire_emit_exactly_once")(spark, sf).count() // warm
    timeN("full seat", 5)(
      graft.SparkEntry.queries("s10_wire_emit_exactly_once")(spark, sf).count())
    val emitted = time("producer run")(S.wireEmitRun(spark, sf, Some(8)))
    timeN("consumer leg", 3)(S.consumeWireEmits(spark, emitted).count())
    println("emitted files: " + Option(new java.io.File(emitted).listFiles())
      .map(_.count(_.getName.endsWith(".parquet"))).getOrElse(-1))
  }

  /** text_bpe_encode: the memoized-train apply path as shipped (HOF fold
    * over the broadcast one-row merge list) vs a literal replace-chain
    * variant (fully codegen'd, compiles per corpus). */
  def bpe(spark: SparkSession, sf: String): Unit = {
    val T = graft.ext.TextOps
    val docs = graft.Tables.documents(spark, sf)
    T.bpeEncode(docs, 8).count() // warm + memoize training
    timeN("bpe encode (shipped)", 5)(T.bpeEncode(docs, 8).count())
    // literal-chain variant: merges known at plan time, so the fold can be
    // 8 codegen'd string replaces instead of an interpreted lambda fold
    val merges = T.bpeMerges(docs, 8).orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2)))
    def encodeLit(): DataFrame = {
      val docWords = docs.select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      val seg0 = regexp_replace(col("w"), "(.)", "($1)")
      val folded = merges.foldLeft(seg0) { case (acc, (l, r)) =>
        replace(acc, lit(s"($l)($r)"), lit(s"($l$r)")) }
      val segments = docWords.select("w").distinct()
        .select(col("w"),
          size(split(regexp_replace(folded, "^\\(|\\)$", ""), "\\)\\("))
            .cast("long").as("n_sym"))
      docWords.join(broadcast(segments), "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum("n_sym").as("n_bpe_tokens"))
        .orderBy("doc_id")
    }
    encodeLit().count() // compile
    (1 to 5).foreach { _ =>
      time("bpe encode shipped")(T.bpeEncode(docs, 8).count())
      time("bpe encode literal")(encodeLit().count())
    }
    val a = T.bpeEncode(docs, 8).collect().map(_.toString).sorted
    val b = encodeLit().collect().map(_.toString).sorted
    println(s"rows equal: ${a.sameElements(b)} (${a.length})")
  }

  /** Shared-exchange candidates in the heavy text seats (§2.4): tfidf
    * (partition once by word → tf completes AND the df window reuses the
    * partitioning) and source_overlap (partition once by shingle hash →
    * the distinct and the source-set fold both complete in place). */
  def textex(spark: SparkSession, sf: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val T = graft.ext.TextOps
    val docs = graft.Tables.documents(spark, sf)
    val parts = spark.sessionState.conf.numShufflePartitions
    def tfidfOneX(k: Int): DataFrame = {
      val words = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("word"))
        .repartition(parts, col("word"))
      val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val tfdf = tf.withColumn("df",
        count(lit(1)).over(Window.partitionBy("word")))
      val nDocs = docs.agg(countDistinct("doc_id").as("n_docs"))
      tfdf.crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("word"),
          round(col("tf") * (log((col("n_docs") + 1) / (col("df") + 1)) + 1), 6)
            .as("tfidf"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("doc_id").orderBy(desc("tfidf"), asc("word"))))
        .filter(col("rn") <= k)
    }
    noopW(T.tfIdfTopTerms(docs, 3)); noopW(tfidfOneX(3))
    (1 to 4).foreach { _ =>
      time("tfidf shipped")(noopW(T.tfIdfTopTerms(docs, 3)))
      time("tfidf one-exchange")(noopW(tfidfOneX(3)))
    }
    val ta = T.tfIdfTopTerms(docs, 3).collect().map(_.toString).sorted
    val tb = tfidfOneX(3).collect().map(_.toString).sorted
    println(s"tfidf rows equal: ${ta.sameElements(tb)} (${ta.length})")
    // source_overlap: repartition by sh_h once; the (source, sh_h)
    // distinct and the per-shingle source-set fold then complete in place
    graft.functions.GraftExtensions.register(spark)
    def overlapOneX(): DataFrame = {
      val sh = docs
        .withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) >= 3)
        .select(col("source"),
          explode(array_distinct(expr("ngram_fingerprints(words, 3)")))
            .as("sh_h"))
        .repartition(parts, col("sh_h"))
        .distinct()
      val sizes = sh.groupBy("source").agg(count(lit(1)).as("n_sh"))
      sh.groupBy("sh_h")
        .agg(sort_array(collect_set(col("source"))).as("srcs"))
        .filter(size(col("srcs")) >= 2 && size(col("srcs")) <= 1000000L)
        .select(explode(expr(
          """flatten(transform(srcs, (x, i) ->
               transform(slice(srcs, i + 2, size(srcs)),
                         y -> struct(x AS src_a, y AS src_b))))""")).as("p"))
        .select(col("p.src_a"), col("p.src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared"))
        .join(sizes.select(col("source").as("src_a"), col("n_sh").as("n_a")), "src_a")
        .join(sizes.select(col("source").as("src_b"), col("n_sh").as("n_b")), "src_b")
        .select(col("src_a"), col("src_b"), col("n_shared"),
          round(col("n_shared") /
                  (col("n_a") + col("n_b") - col("n_shared")).cast("double"), 6)
            .as("jaccard"))
        .orderBy("src_a", "src_b")
    }
    noopW(T.crossSourceOverlap(docs, 3)); noopW(overlapOneX())
    (1 to 4).foreach { _ =>
      time("overlap shipped")(noopW(T.crossSourceOverlap(docs, 3)))
      time("overlap one-exchange")(noopW(overlapOneX()))
    }
    val oa = T.crossSourceOverlap(docs, 3).collect().map(_.toString).sorted
    val ob = overlapOneX().collect().map(_.toString).sorted
    println(s"overlap rows equal: ${oa.sameElements(ob)} (${oa.length})")
  }

  /** Near-zero-reduction partial-aggregate hunt, applied to the other two
    * inverted-index pair counters: the commonCounts pair pass (shared by
    * ngram_jaccard/containment/jaccardPairsAbove) and substringDupSpans'
    * per-(window, doc) collapse. A/B shipped vs one-exchange complete
    * forms (the t53 fix) — interleaved, rows-equal checked. */
  def paircount(spark: SparkSession, sf: String): Unit = {
    val D = graft.ext.DedupOps
    val docs = graft.Tables.documents(spark, sf)
    val parts = spark.sessionState.conf.numShufflePartitions
    // --- commonCounts pair pass (bypassing the session memo) ---
    val (commonShipped, _) = D.commonCountsPlan(docs, 3, 1000000L)
    // the r17 shape (partial/final pair count), inlined for the A/B —
    // `shipped` is the r18 one-exchange form in commonCountsPlan
    def commonPartialAgg(): DataFrame = {
      val sh = D.shinglesCheckpointed(docs, 3) // the same memoized input
      val shKey = Seq("shingle_h", "shingle_l")
      val rare = sh.groupBy(shKey.map(col): _*).agg(count(lit(1)).as("df"))
        .filter(col("df") <= 1000000L).select(shKey.map(col): _*)
      val shCapped = sh.join(rare, shKey)
      val a = shCapped.select((col("doc_id").as("doc_a") +: shKey.map(col)): _*)
      val b = shCapped.select((col("doc_id").as("doc_b") +: shKey.map(col)): _*)
      a.join(b, shKey)
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
    }
    noopW(commonShipped); noopW(commonPartialAgg())
    (1 to 4).foreach { _ =>
      time("commonCounts shipped (one-exch)")(
        noopW(D.commonCountsPlan(docs, 3, 1000000L)._1))
      time("commonCounts r17 (partial agg)")(noopW(commonPartialAgg()))
    }
    val ca = commonShipped.collect().map(_.toString).sorted
    val cb = commonPartialAgg().collect().map(_.toString).sorted
    println(s"commonCounts rows equal: ${ca.sameElements(cb)} (${ca.length})")
    // --- substringDupSpans ---
    graft.functions.GraftExtensions.register(spark)
    def spansOneExchange(): DataFrame = {
      val wins = docs
        .withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) >= 13)
        .select(col("doc_id"),
          explode(expr("ngram_fingerprints(words, 13)")).as("win_h"))
        .repartition(parts, col("win_h"))
      val wg = wins.groupBy(col("win_h"), col("doc_id"))
        .agg(count(lit(1)).as("n_occ"))
      val dfd = wg.groupBy(col("win_h")).agg(count(lit(1)).as("n_docs"))
      wg.join(dfd, Seq("win_h"))
        .groupBy("doc_id")
        .agg(sum("n_occ").as("n_windows"),
             sum(when(col("n_docs") > 1, col("n_occ")).otherwise(0L))
               .as("n_dup_windows"))
        .select(col("doc_id"), col("n_windows"), col("n_dup_windows"),
          round(col("n_dup_windows") / col("n_windows").cast("double"), 6)
            .as("dup_frac"))
    }
    noopW(D.substringDupSpans(docs)); noopW(spansOneExchange())
    (1 to 4).foreach { _ =>
      time("spans shipped")(noopW(D.substringDupSpans(docs)))
      time("spans one-exchange")(noopW(spansOneExchange()))
    }
    val sa = D.substringDupSpans(docs).collect().map(_.toString).sorted
    val sb = spansOneExchange().collect().map(_.toString).sorted
    println(s"spans rows equal: ${sa.sameElements(sb)} (${sa.length})")
  }

  /** Round-18 plan-evidence dumps (run with SPARK_GRAFT_AQE=0 for static
    * plans, the PlanDump convention): the t53 per-batch triage before
    * (r17 shape — partial/final pair count) and after (one-exchange
    * complete aggregates), the vote batch tally before (per-seat decode
    * re-derivation) and after (shared checkpointed decode), and the j8
    * probe-memo split-count witness the r17 verdict asked to commit. */
  def plans18(spark: SparkSession, sf: String): Unit = {
    val out = java.nio.file.Paths.get("plans/r18")
    java.nio.file.Files.createDirectories(out)
    def write(name: String, df: DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(out.resolve(s"$name.txt"), plan)
      println(s"[plans18] wrote $name (${plan.length} chars)")
    }
    val D = graft.ext.DedupOps
    val docs = graft.Tables.documents(spark, sf)
    val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .select("doc_id", "text")
    val idx = D.corpusIndex(corpus, 3)
    val increment = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select("doc_id", "text")
      .union(corpus.filter(pmod(col("doc_id"), lit(7)) === 3)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val half0 = increment.filter(pmod(col("doc_id"), lit(2)) === 0)
    // r17 shape, inlined verbatim from the pre-r18 incrementalDedupIndexed
    def triageR17(inc: DataFrame): DataFrame = {
      val exactDup = inc.select(col("doc_id"), md5(col("text")).as("dig"))
        .join(idx.digests, "dig").select("doc_id").distinct()
      val shInc = D.shingles(inc, 3)
        .withColumn("shingle_h", xxhash64(col("shingle")))
        .withColumn("shingle_l", length(col("shingle")))
        .drop("shingle")
      val shKey = Seq("shingle_h", "shingle_l")
      val szInc = shInc.groupBy("doc_id").agg(count(lit(1)).as("n_a"))
      val nearDup = shInc.select((col("doc_id").as("inc_id") +: shKey.map(col)): _*)
        .join(idx.sh.select((col("doc_id").as("corp_id") +: shKey.map(col)): _*),
              shKey)
        .groupBy("inc_id", "corp_id").agg(count(lit(1)).as("n_common"))
        .join(broadcast(szInc.select(col("doc_id").as("inc_id"), col("n_a"))),
              "inc_id")
        .join(idx.sz.select(col("doc_id").as("corp_id"), col("n_b")), "corp_id")
        .filter(round(col("n_common")
          / (col("n_a") + col("n_b") - col("n_common")).cast("double"), 6) >= 0.5)
        .select(col("inc_id").as("doc_id")).distinct()
      inc.select("doc_id")
        .join(broadcast(exactDup.withColumn("is_exact", lit(true))),
              Seq("doc_id"), "left")
        .join(broadcast(nearDup.withColumn("is_near", lit(true))),
              Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("is_exact"), "exact_dup")
            .when(col("is_near"), "near_dup")
            .otherwise("kept").as("status"))
    }
    write("t53_triage_before", triageR17(half0))
    write("t53_triage_after", D.incrementalDedupIndexed(half0, idx, 3, tau = 0.5))
    // the shared inverted-index pair pass: r17 partial/final shape vs the
    // r18 one-exchange complete aggregate (commonCountsPlan)
    def commonR17(): DataFrame = {
      val sh = D.shinglesCheckpointed(docs, 3)
      val shKey = Seq("shingle_h", "shingle_l")
      val rare = sh.groupBy(shKey.map(col): _*).agg(count(lit(1)).as("df"))
        .filter(col("df") <= 1000000L).select(shKey.map(col): _*)
      val shCapped = sh.join(rare, shKey)
      val a = shCapped.select((col("doc_id").as("doc_a") +: shKey.map(col)): _*)
      val b = shCapped.select((col("doc_id").as("doc_b") +: shKey.map(col)): _*)
      a.join(b, shKey)
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
    }
    write("dedup_paircount_before", commonR17())
    write("dedup_paircount_after", D.commonCountsPlan(docs, 3, 1000000L)._1)
    // vote batch tally: per-seat decode re-derivation vs the shared memo
    val V = graft.pipeline.VotePipeline
    write("vote_party_tally_before",
      V.decoded(spark, 1000)
        .groupBy("party_affiliation")
        .agg(sum("vote").as("total_votes")))
    write("vote_party_tally_after", V.partyTally(spark, 1000))
    // j8 probe-memo split witness: the ExistingRDD leaf's partition count
    // (the r17 fix spread the sealed checkpoint across the session cores)
    val part = graft.Tables.part(spark, sf)
    val j8 = graft.ops.FuzzyJoin.fuzzyPartMatch(part)
    j8.count() // builds + seals the probe memo
    val probeParts = graft.ops.FuzzyJoin.fuzzyPartMatch(part)
    probeParts.count() // execute so AQE finalizes its stages
    def rddLeaves(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[String] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        rddLeaves(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        rddLeaves(q.plan)
      case r: org.apache.spark.sql.execution.RDDScanExec =>
        Seq(s"ExistingRDD(${r.rdd.name}): partitions=${r.rdd.getNumPartitions}")
      case other => other.children.flatMap(rddLeaves)
    }
    val witness = (s"defaultParallelism=${spark.sparkContext.defaultParallelism}\n" +
      rddLeaves(probeParts.queryExecution.executedPlan).mkString("\n") + "\n\n" +
      probeParts.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    java.nio.file.Files.writeString(out.resolve("j8_probe_splits_witness.txt"), witness)
    println("[plans18] wrote j8_probe_splits_witness")
  }

  /** t53 pair-count shape A/B: shipped (partial agg 330k→319k — near-zero
    * reduction — then a 32-wide exchange whose write time dwarfs every
    * other exchange) vs the q2/q21 single-exchange form (repartition the
    * join output by inc_id once; the (inc_id, corp_id) count, the szInc
    * attach, and the final distinct then all complete in place). */
  def t53agg(spark: SparkSession, sf: String): Unit = {
    val D = graft.ext.DedupOps
    val docs = graft.Tables.documents(spark, sf)
    val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .select("doc_id", "text")
    val idx = D.corpusIndex(corpus, 3)
    val increment = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select("doc_id", "text")
      .union(corpus.filter(pmod(col("doc_id"), lit(7)) === 3)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val half0 = increment.filter(pmod(col("doc_id"), lit(2)) === 0)
    def triageOneExchange(inc: DataFrame): DataFrame = {
      val parts = spark.sessionState.conf.numShufflePartitions
      val exactDup = inc.select(col("doc_id"), md5(col("text")).as("dig"))
        .join(idx.digests, "dig")
        .select("doc_id").distinct()
      val shInc = D.shingles(inc, 3)
        .withColumn("shingle_h", xxhash64(col("shingle")))
        .withColumn("shingle_l", length(col("shingle")))
        .drop("shingle")
      val shKey = Seq("shingle_h", "shingle_l")
      val szInc = shInc.groupBy("doc_id").agg(count(lit(1)).as("n_a"))
      val nearDup = broadcast(
          shInc.select((col("doc_id").as("inc_id") +: shKey.map(col)): _*))
        .join(idx.sh.select((col("doc_id").as("corp_id") +: shKey.map(col)): _*),
              shKey)
        .select("inc_id", "corp_id")
        .repartition(parts, col("inc_id"))
        .groupBy("inc_id", "corp_id").agg(count(lit(1)).as("n_common"))
        .join(broadcast(szInc.select(col("doc_id").as("inc_id"), col("n_a"))),
              "inc_id")
        .join(idx.sz.select(col("doc_id").as("corp_id"), col("n_b")), "corp_id")
        .filter(round(col("n_common")
          / (col("n_a") + col("n_b") - col("n_common")).cast("double"), 6) >= 0.5)
        .select(col("inc_id").as("doc_id")).distinct()
      inc.select("doc_id")
        .join(broadcast(exactDup.withColumn("is_exact", lit(true))),
              Seq("doc_id"), "left")
        .join(broadcast(nearDup.withColumn("is_near", lit(true))),
              Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("is_exact"), "exact_dup")
            .when(col("is_near"), "near_dup")
            .otherwise("kept").as("status"))
    }
    noopW(D.incrementalDedupIndexed(half0, idx, 3, tau = 0.5))
    noopW(triageOneExchange(half0))
    (1 to 5).foreach { _ =>
      time("triage shipped")(
        noopW(D.incrementalDedupIndexed(half0, idx, 3, tau = 0.5)))
      time("triage one-exchange")(noopW(triageOneExchange(half0)))
    }
    val a = D.incrementalDedupIndexed(half0, idx, 3, tau = 0.5)
      .collect().map(_.toString).sorted
    val b = triageOneExchange(half0).collect().map(_.toString).sorted
    println(s"rows equal: ${a.sameElements(b)} (${a.length})")
    dumpMetrics(triageOneExchange(half0))
  }

  /** t53 per-batch triage decomposition: which stage owns the ~1.3 s —
    * the increment shingle explode, the exact gate, the inverted-index
    * probe, or the status fold; plus the sealed-side scan alone. */
  def t53parts(spark: SparkSession, sf: String): Unit = {
    val D = graft.ext.DedupOps
    val docs = graft.Tables.documents(spark, sf)
    val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .select("doc_id", "text")
    val idx = D.corpusIndex(corpus, 3)
    val increment = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select("doc_id", "text")
      .union(corpus.filter(pmod(col("doc_id"), lit(7)) === 3)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val half0 = increment.filter(pmod(col("doc_id"), lit(2)) === 0)
    def shInc = D.shingles(half0, 3)
      .withColumn("shingle_h", xxhash64(col("shingle")))
      .withColumn("shingle_l", length(col("shingle")))
      .drop("shingle")
    val shKey = Seq("shingle_h", "shingle_l")
    noopW(D.incrementalDedupIndexed(half0, idx, 3, tau = 0.5)) // warm
    timeN("idx.sh scan (cached)", 3)(noopW(idx.sh))
    timeN("half0 scan", 3)(noopW(half0))
    timeN("shInc explode", 3)(noopW(shInc))
    timeN("exact gate", 3)(noopW(
      half0.select(col("doc_id"), md5(col("text")).as("dig"))
        .join(idx.digests, "dig").select("doc_id").distinct()))
    timeN("index probe join", 3)(noopW(
      shInc.select((col("doc_id").as("inc_id") +: shKey.map(col)): _*)
        .join(idx.sh.select((col("doc_id").as("corp_id") +: shKey.map(col)): _*),
              shKey)
        .groupBy("inc_id", "corp_id").agg(count(lit(1)).as("n_common"))))
    timeN("full triage", 3)(
      noopW(D.incrementalDedupIndexed(half0, idx, 3, tau = 0.5)))
    val df = D.incrementalDedupIndexed(half0, idx, 3, tau = 0.5)
    time("triage collect")(df.collect())
    dumpMetrics(df)
  }

  /** t53 probe-side alternatives: shipped co-located shuffle probe vs a
    * broadcast-probe form (trigger-bounded increment side broadcast into
    * the sealed index scan — no probe shuffle, no sort-merge machinery). */
  def t53bloom(spark: SparkSession, sf: String): Unit = {
    val D = graft.ext.DedupOps
    val docs = graft.Tables.documents(spark, sf)
    val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .select("doc_id", "text")
    val idx = D.corpusIndex(corpus, 3)
    val increment = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select("doc_id", "text")
      .union(corpus.filter(pmod(col("doc_id"), lit(7)) === 3)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val half0 = increment.filter(pmod(col("doc_id"), lit(2)) === 0)
    def triageBcastProbe(inc: DataFrame): DataFrame = {
      val exactDup = inc.select(col("doc_id"), md5(col("text")).as("dig"))
        .join(idx.digests, "dig")
        .select("doc_id").distinct()
      val shInc = D.shingles(inc, 3)
        .withColumn("shingle_h", xxhash64(col("shingle")))
        .withColumn("shingle_l", length(col("shingle")))
        .drop("shingle")
      val shKey = Seq("shingle_h", "shingle_l")
      val szInc = shInc.groupBy("doc_id").agg(count(lit(1)).as("n_a"))
      val nearDup = broadcast(
          shInc.select((col("doc_id").as("inc_id") +: shKey.map(col)): _*))
        .join(idx.sh.select((col("doc_id").as("corp_id") +: shKey.map(col)): _*),
              shKey)
        .groupBy("inc_id", "corp_id").agg(count(lit(1)).as("n_common"))
        .join(broadcast(szInc.select(col("doc_id").as("inc_id"), col("n_a"))),
              "inc_id")
        .join(idx.sz.select(col("doc_id").as("corp_id"), col("n_b")), "corp_id")
        .filter(round(col("n_common")
          / (col("n_a") + col("n_b") - col("n_common")).cast("double"), 6) >= 0.5)
        .select(col("inc_id").as("doc_id")).distinct()
      inc.select("doc_id")
        .join(broadcast(exactDup.withColumn("is_exact", lit(true))),
              Seq("doc_id"), "left")
        .join(broadcast(nearDup.withColumn("is_near", lit(true))),
              Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("is_exact"), "exact_dup")
            .when(col("is_near"), "near_dup")
            .otherwise("kept").as("status"))
    }
    noopW(D.incrementalDedupIndexed(half0, idx, 3, tau = 0.5))
    noopW(triageBcastProbe(half0))
    (1 to 4).foreach { _ =>
      time("triage shipped (co-located)")(
        noopW(D.incrementalDedupIndexed(half0, idx, 3, tau = 0.5)))
      time("triage broadcast-probe")(noopW(triageBcastProbe(half0)))
    }
    val a = D.incrementalDedupIndexed(half0, idx, 3, tau = 0.5)
      .collect().map(_.toString).sorted
    val b = triageBcastProbe(half0).collect().map(_.toString).sorted
    println(s"rows equal: ${a.sameElements(b)} (${a.length})")
    timeN("t53 full seat", 3)(
      graft.streaming.StreamOps.streamingIncrementalDedup(spark, sf).count())
  }

  /** j8 decomposition: where do ~1.8 s go — probe/index construction
    * (memoized), candidate-pair volume, the levenshtein verify, or the
    * distinct? */
  def j8(spark: SparkSession, sf: String): Unit = {
    import graft.ops.FuzzyJoin
    val part = graft.Tables.part(spark, sf)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    noop(FuzzyJoin.fuzzyPartMatch(part))
    timeN("j8 full", 3)(noop(FuzzyJoin.fuzzyPartMatch(part)))
    // per-operator metrics of one executed run (collect() so the
    // metrics land on THIS df's executedPlan instance)
    val df = FuzzyJoin.fuzzyPartMatch(part)
    time("j8 collect")(df.collect())
    def dump(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
      val m = p.metrics.map { case (k, v) => s"$k=${v.value}" }
        .filter(s => s.contains("numOutputRows") || s.contains("time") ||
          s.contains("Time")).take(4).mkString(" ")
      println(("  " * depth) + p.nodeName + " :: " + m)
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          dump(a.executedPlan, depth + 1)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          dump(q.plan, depth + 1)
        case other => other.children.foreach(dump(_, depth + 1))
      }
    }
    dump(df.queryExecution.executedPlan, 0)
  }

  /** Single-row-group scan-parallelism hypothesis: the docs table is one
    * row group, so explode/hash-heavy first stages run on ONE task; a
    * pre-spread repartition (KBs of shuffle) should unlock 32-way
    * parallelism for the whole expansion. A/B the heavy text consumers
    * with and without a spread docs frame. */
  def spread(spark: SparkSession, sf: String): Unit = {
    val T = graft.ext.TextOps
    val docs = graft.Tables.documents(spark, sf)
    val docsS = docs.repartition(32)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def ab(tag: String, f: DataFrame => DataFrame): Unit = {
      noop(f(docs)); noop(f(docsS))
      (1 to 3).foreach { _ =>
        time(s"$tag base")(noop(f(docs)))
        time(s"$tag spread")(noop(f(docsS)))
      }
      val a = f(docs).collect().map(_.toString).sorted
      val b = f(docsS).collect().map(_.toString).sorted
      println(s"$tag rows equal: ${a.sameElements(b)} (${a.length})")
    }
    ab("source_overlap", d => T.crossSourceOverlap(d, 3))
    ab("boilerplate", d => T.boilerplateRemove(T.withInjectedBoilerplate(d), 8, 3))
    ab("tfidf", d => T.tfIdfTopTerms(d, 3))
    ab("bigram_lm", d => T.bigramLmScore(d))
    ab("bm25", d => T.bm25TopK(d, Seq("spark", "join", "window"), 10))
  }

  /** q2: current (agg exchange + window exchange) vs single-exchange
    * (pre-partition by partkey; agg completes in place, window reuses
    * the partitioning and only sorts). */
  def q2(spark: SparkSession, sf: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val T = graft.Tables
    def eur() = T.supplier(spark, sf)
      .join(broadcast(T.nation(spark, sf)),
            col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(T.region(spark, sf)
              .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    def tail(cost: DataFrame): DataFrame =
      cost.join(broadcast(eur()), col("l_suppkey") === col("s_suppkey"))
        .withColumn("min_cost",
          min("supplycost").over(Window.partitionBy("l_partkey")))
        .filter(col("supplycost") === col("min_cost"))
        .join(broadcast(T.part(spark, sf)
                .filter(col("p_type") === "LARGE" && col("p_size") < 15)
                .select("p_partkey")),
              col("l_partkey") === col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "supplycost")
        .orderBy(desc("s_acctbal"), asc("n_name"), asc("s_name"),
                 asc("p_partkey"))
        .limit(100)
    def current(): DataFrame = tail(
      T.lineitem(spark, sf)
        .groupBy("l_partkey", "l_suppkey")
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("supplycost")))
    def onex(): DataFrame = tail(
      T.lineitem(spark, sf)
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .repartition(col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("supplycost")))
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    noop(current()); noop(onex())
    (1 to 4).foreach { _ =>
      time("q2 current")(noop(current()))
      time("q2 one-exchange")(noop(onex()))
    }
    val a = current().collect().map(_.toString).sorted
    val b = onex().collect().map(_.toString).sorted
    println(s"rows equal: ${a.sameElements(b)} (${a.length} rows)")
  }

  /** t53 decomposition: sealed-index build (memoized), one batch triage
    * as a plain batch job, and the full streaming seat. */
  def t53(spark: SparkSession, sf: String): Unit = {
    val D = graft.ext.DedupOps
    val docs = graft.Tables.documents(spark, sf)
    val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .select("doc_id", "text")
    time("corpusIndex build (cold)")(D.corpusIndex(corpus, 3))
    val idx = time("corpusIndex (memo hit)")(D.corpusIndex(corpus, 3))
    val increment = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select("doc_id", "text")
      .union(corpus.filter(pmod(col("doc_id"), lit(7)) === 3)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val half0 = increment.filter(pmod(col("doc_id"), lit(2)) === 0)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // the r16 shuffle-shaped triage, inlined for interleaved A/B
    def triageOld(increment: DataFrame): DataFrame = {
      val exactDup = increment.select(col("doc_id"), md5(col("text")).as("dig"))
        .join(idx.digests, "dig")
        .select("doc_id").distinct()
      val shInc = D.shingles(increment, 3)
        .withColumn("shingle_h", xxhash64(col("shingle")))
        .withColumn("shingle_l", length(col("shingle")))
        .drop("shingle")
      val shKey = Seq("shingle_h", "shingle_l")
      val szInc = shInc.groupBy("doc_id").agg(count(lit(1)).as("n_a"))
      val nearDup = shInc.select((col("doc_id").as("inc_id") +: shKey.map(col)): _*)
        .join(idx.sh.select((col("doc_id").as("corp_id") +: shKey.map(col)): _*), shKey)
        .groupBy("inc_id", "corp_id").agg(count(lit(1)).as("n_common"))
        .join(szInc.select(col("doc_id").as("inc_id"), col("n_a")), "inc_id")
        .join(idx.sz.select(col("doc_id").as("corp_id"), col("n_b")), "corp_id")
        .filter(round(col("n_common")
          / (col("n_a") + col("n_b") - col("n_common")).cast("double"), 6) >= 0.5)
        .select(col("inc_id").as("doc_id")).distinct()
      increment.select("doc_id")
        .join(exactDup.withColumn("is_exact", lit(true)), Seq("doc_id"), "left")
        .join(nearDup.withColumn("is_near", lit(true)), Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("is_exact"), "exact_dup")
            .when(col("is_near"), "near_dup")
            .otherwise("kept").as("status"))
    }
    noop(D.incrementalDedupIndexed(half0, idx, 3, tau = 0.5))
    noop(triageOld(half0))
    (1 to 4).foreach { _ =>
      time("triage old (shuffle)")(noop(triageOld(half0)))
      time("triage new (broadcast)")(
        noop(D.incrementalDedupIndexed(half0, idx, 3, tau = 0.5)))
    }
    val a = triageOld(half0).collect().map(_.toString).sorted
    val b = D.incrementalDedupIndexed(half0, idx, 3, tau = 0.5)
      .collect().map(_.toString).sorted
    println(s"rows equal: ${a.sameElements(b)} (${a.length} rows)")
    timeN("t53 full seat", 3)(
      graft.streaming.StreamOps.streamingIncrementalDedup(spark, sf).count())
  }

  /** Scan-floor decomposition: what a single-row-group parquet scan
    * costs alone, vs with a repartition, vs the q21 aggregates. */
  def scan(spark: SparkSession, sf: String): Unit = {
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val li = () => graft.Tables.lineitem(spark, sf)
    noop(li())
    (1 to 3).foreach { _ =>
      time("li all cols noop")(noop(li()))
      time("li 3 cols noop")(noop(li().select("l_orderkey", "l_suppkey", "l_returnflag")))
      time("li 3 cols count")(li().select("l_orderkey", "l_suppkey", "l_returnflag").count())
      time("li 3col+proj noop")(noop(li().select(col("l_orderkey"),
        col("l_suppkey"),
        when(col("l_returnflag") === "R", 1).otherwise(0).as("is_r"))))
      time("li 3col repart noop")(noop(li().select(col("l_orderkey"),
        col("l_suppkey"),
        when(col("l_returnflag") === "R", 1).otherwise(0).as("is_r"))
        .repartition(col("l_orderkey"))))
      time("li groupBy(ok,sk) noop")(noop(li()
        .groupBy("l_orderkey", "l_suppkey")
        .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("h"))))
    }
  }

  /** q21: current two-exchange orderStats vs single-exchange
    * (pre-partition by orderkey; both aggregates then plan complete,
    * exchange-free). */
  def q21(spark: SparkSession, sf: String): Unit = {
    val T = graft.Tables
    def current(): DataFrame = {
      val li = T.lineitem(spark, sf)
      val orderStats = li
        .groupBy(col("l_orderkey").as("so_okey"), col("l_suppkey").as("so_skey"))
        .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("has_r"),
             sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
               .as("n_r_rows"))
        .groupBy("so_okey")
        .agg(count(lit(1)).as("n_supp"), sum("has_r").as("n_rsupp"),
             max(when(col("has_r") === 1, col("so_skey"))).as("r_skey"),
             sum(when(col("has_r") === 1, col("n_r_rows")).otherwise(0L))
               .as("r_rows"))
      finish(spark, sf, orderStats)
    }
    def onex(): DataFrame = {
      val li = T.lineitem(spark, sf)
        .select(col("l_orderkey").as("so_okey"),
                col("l_suppkey").as("so_skey"),
                when(col("l_returnflag") === "R", 1).otherwise(0).as("is_r"))
        .repartition(col("so_okey"))
      val orderStats = li
        .groupBy("so_okey", "so_skey")
        .agg(max(col("is_r")).as("has_r"),
             sum(col("is_r").cast("long")).as("n_r_rows"))
        .groupBy("so_okey")
        .agg(count(lit(1)).as("n_supp"), sum("has_r").as("n_rsupp"),
             max(when(col("has_r") === 1, col("so_skey"))).as("r_skey"),
             sum(when(col("has_r") === 1, col("n_r_rows")).otherwise(0L))
               .as("r_rows"))
      finish(spark, sf, orderStats)
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm both shapes once, then interleave
    noop(current()); noop(onex())
    (1 to 4).foreach { _ =>
      time("q21 current")(noop(current()))
      time("q21 one-exchange")(noop(onex()))
    }
    // equivalence check
    val a = current().collect().map(_.toString).sorted
    val b = onex().collect().map(_.toString).sorted
    println(s"rows equal: ${a.sameElements(b)} (${a.length} rows)")
  }

  private def finish(spark: SparkSession, sf: String,
                     orderStats: DataFrame): DataFrame = {
    val T = graft.Tables
    val fOrders = T.orders(spark, sf)
      .filter(col("o_orderstatus") === "F").select("o_orderkey")
    orderStats
      .filter(col("n_supp") > 1 && col("n_rsupp") === 1)
      .join(broadcast(fOrders), col("so_okey") === col("o_orderkey"))
      .join(broadcast(T.supplier(spark, sf).select("s_suppkey", "s_name")),
            col("r_skey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(sum("r_rows").as("numwait"))
      .orderBy(desc("numwait"), asc("s_name"))
      .limit(10)
  }
}
