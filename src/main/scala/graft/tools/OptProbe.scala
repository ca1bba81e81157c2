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
      case "scan" => scan(spark, sf)
      case "spread" => spread(spark, sf)
      case "j8" => j8(spark, sf)
      case "semantic" => semantic(spark, sf)
      case "cms" => cms(spark, sf)
      case "vote" => vote(spark, sf)
      case "s10" => s10(spark, sf)
      case "bpe" => bpe(spark, sf)
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
