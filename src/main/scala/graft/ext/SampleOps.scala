package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment for training-data pipelines.
  *
  * All assignment is pure arithmetic on a key — never `rand()` — so
  * samples are reproducible across runs, partition layouts, and engines
  * (the reference pins `random.seed(21)` for the same reason,
  * `/root/reference/main.py:12`; we strengthen seeding into keyed hashing
  * so replays and late-arriving data keep stable assignments). Every op is
  * a narrow map+filter: no shuffle, scales linearly.
  */
object SampleOps {

  private val Mix = 2654435761L

  /** Keyed pseudo-random bucket in [0, buckets): multiplicative-hash the
    * key and take the residue. */
  def bucketOf(key: Column, buckets: Int): Column =
    pmod(key * Mix, lit(buckets.toLong))

  /** Systematic 1-in-k sample by key. */
  def systematic(df: DataFrame, key: String, k: Int): DataFrame =
    df.filter(bucketOf(col(key), k) === 0)

  /** Stratified sampling with per-stratum rates expressed as 1-in-k:
    * strata not listed fall back to `defaultK`. */
  def stratified(df: DataFrame, stratumCol: String, key: String,
                 rates: Map[String, Int], defaultK: Int): DataFrame = {
    val kCol = rates.foldLeft(lit(defaultK)) { case (acc, (stratum, k)) =>
      when(col(stratumCol) === stratum, lit(k)).otherwise(acc)
    }
    df.filter(pmod(col(key) * Mix, kCol.cast("long")) === 0)
  }

  /** Data-mix rebalancing: cap every over-represented group (language,
    * source domain, …) at the MEAN group size, keeping under-represented
    * groups whole — the deterministic form of the "don't let one crawl
    * domain dominate the mix" step in corpus assembly. Membership is the
    * `cap` smallest keyed hashes per group (tie-break on the key), so the
    * kept set is stable across runs and engines — re-running on appended
    * data keeps previously-kept rows kept until the cap binds.
    *
    * Scale shape: one groupBy for the per-group counts (tiny result — one
    * row per group), the cap broadcast, and a rank-per-group window. The
    * window is a sort within each group partition; group count bounds the
    * parallelism, group size bounds the sort. At extreme group sizes swap
    * the exact rank for a hash-threshold pass (keep `hash < cap/n · M`),
    * which is shuffle-free but only approximately hits the cap.
    */
  def rebalanceToMeanShare(df: DataFrame, groupCol: String,
                           key: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_before"))
    val cap = counts.agg(floor(avg("n_before")).cast("long").as("cap"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(pmod(col(key) * Mix, lit(1000000007L)), col(key))
    df.withColumn("rk", row_number().over(w))
      .crossJoin(broadcast(cap))
      .filter(col("rk") <= col("cap"))
      .select(col(key), col(groupCol))
  }

  /** Temperature mixing at α = 1/2: per-group keep targets proportional
    * to n_g^α — the multilingual-corpus recipe that upweights small
    * groups without flattening the mix entirely (α=1 keeps proportions,
    * α=0 is uniform). All arithmetic is INTEGER-exact across engines:
    * the group weight is floor(sqrt(n_g)) (exact for counts < 2^50 under
    * IEEE sqrt), the target is `keepTotal·w_g div Σw` capped at n_g, and
    * membership is the target-smallest keyed hashes per group — the same
    * deterministic selection as [[rebalanceToMeanShare]], so appends
    * never flip an old row's fate until the target binds.
    *
    * Scale shape: one tiny groupBy for counts, targets broadcast, one
    * rank-per-group window. `keepTotal` = half the corpus, derived from
    * the same counts — no data-dependent driver constant. */
  def temperatureMix(df: DataFrame, groupCol: String,
                     key: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_before"))
      .withColumn("w", floor(sqrt(col("n_before"))).cast("long"))
    val targets = counts.crossJoin(broadcast(
        counts.agg(sum("w").as("sw"), sum("n_before").as("n_total"))))
      .withColumn("target",
        least(col("n_before"), expr("((n_total div 2) * w) div sw")))
      .select(col(groupCol).as("__g"), col("target"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(pmod(col(key) * Mix, lit(1000000007L)), col(key))
    df.withColumn("rk", row_number().over(w))
      .join(broadcast(targets), col(groupCol) === col("__g"))
      .filter(col("rk") <= col("target"))
      .select(col(key), col(groupCol))
  }

  /** Train/val/test split assignment: hash-bucket into percent space,
    * 80/10/10. Stable per key forever — the property that keeps a document
    * out of the eval set no matter when it re-enters the pipeline. */
  def splitAssign(df: DataFrame, key: String): DataFrame =
    df.withColumn("split",
      when(bucketOf(col(key), 100) < 80, "train")
        .when(bucketOf(col(key), 100) < 90, "val")
        .otherwise("test"))

  /** Leakage-safe GROUP-AWARE split: near-duplicate documents must never
    * straddle train and eval — a test doc with a near-copy in train is
    * contamination the plain per-doc hash split ([[splitAssign]]) cannot
    * prevent. Assignment hashes the near-dup CLUSTER label
    * ([[graft.ext.DedupOps.duplicateClusters]] min-label, memoized —
    * singletons fall back to their own doc id), so every cluster moves as
    * one atom: by construction zero clusters straddle splits, and the
    * 80/10/10 proportions hold over GROUPS (the statistically honest
    * unit). Stable under appends like every split here — a new near-dup
    * joins its cluster's split, never re-rolls an old doc's fate.
    *
    * Scale shape: one broadcast-sized label join on top of the cluster
    * memo (the expensive part, shared with clusters/canonical/corpus
    * queries); the split itself is a pure codegen'd projection. */
  def groupAwareSplit(docs: DataFrame, n: Int, tau: Double): DataFrame = {
    val labels = graft.ext.DedupOps.duplicateClusters(docs, n, tau)
    docs.select("doc_id")
      .join(labels, Seq("doc_id"), "left")
      .withColumn("group_key", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split",
        when(bucketOf(col("group_key"), 100) < 80, "train")
          .when(bucketOf(col("group_key"), 100) < 90, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("group_key").cast("long").as("group_key"),
        col("split"))
  }

  /** Importance sampling: keep each row with probability proportional to
    * a per-row integer WEIGHT in [0, `scale`] — the quality-weighted
    * resampling step of corpus curation (upweight diverse/clean text,
    * downweight boilerplate) made DETERMINISTIC: keep iff
    * `hash(key) mod scale < weight`, so the kept set is a pure function
    * of (key, weight) — reproducible across runs, engines, and partition
    * layouts, and stable under appends (a new document never flips an old
    * one's fate). The expected kept fraction per stratum is
    * Σ weight / (N·scale) — exact in distribution, no RNG, no shuffle;
    * the whole op is one codegen'd map+filter. */
  def importanceSample(df: DataFrame, key: String, weight: Column,
                       scale: Int): DataFrame =
    df.withColumn("__w", weight.cast("long"))
      .filter(pmod(col(key) * Mix, lit(scale.toLong)) < col("__w"))
      .drop("__w")

  /** EXACT-k weighted sampling by priority sampling (Duffield, Lund &
    * Thorup, JACM 2007): each item gets priority `q = w / u` for a
    * uniform `u` and the k LARGEST priorities are kept — the published
    * estimator for "take exactly N items, weight-proportionally" that
    * Bernoulli/importance keeps ([[importanceSample]]) cannot promise.
    * Here `u` is the same arithmetic pseudo-uniform the rest of this
    * file uses (`pmod(key·Mix, P) + 1`, P = 2³¹−1) and the priority is
    * computed in INTEGER arithmetic (`(w·P) div u`) so the rank order
    * is bit-identical across engines — no `ln`, no float race, the
    * DuckDB oracle replays the exact ordering.
    *
    * Scale shape: priorities are a pure codegen'd projection; the
    * global top-k is TakeOrderedAndProject (per-partition heaps of k,
    * never a global sort) — the same plan a 100 TB "best N documents
    * by quality" selection wants. Ties (same priority) break on key.
    *
    * Precondition: weights must satisfy w < 2³² (w·P must fit in Long;
    * P = 2³¹−1). Quality-score weights (token counts, TTR scores) are
    * orders of magnitude below this; for heavier weights (raw byte
    * counts of TB-scale blobs) rescale the weight column first. The
    * real-valued priority order w/u is invariant under a constant
    * rescale; the INTEGER priority preserves it except where floor
    * rounding collapses near-equal priorities into a tie (then the key
    * tie-break decides) — a rescale can therefore swap members of the
    * selection boundary's tie class, never anything ranked strictly. */
  def weightedExactK(df: DataFrame, key: String, weight: Column,
                     k: Int): DataFrame = {
    val P = 2147483647L
    df.withColumn("w", weight.cast("long"))
      .withColumn("u", pmod(col(key) * Mix, lit(P)) + 1L)
      .withColumn("priority", expr(s"(w * ${P}L) div u"))
      .orderBy(col("priority").desc, col(key))
      .limit(k)
      .select(col(key), col("w"), col("priority"))
  }

  /** Deterministic negative sampling for contrastive training: each
    * anchor probes `nProbes` pseudo-random candidate ids
    * (`(anchor·37 + 11·j + 1) mod N`, pure index arithmetic — no RNG, so
    * the pairing is reproducible across runs, engines, and partition
    * layouts) and keeps the FIRST candidate whose label differs. With L
    * balanced labels the miss chance is ~(1/L)^nProbes, and anchors whose
    * probes all collide with their own label drop out (counted by spec).
    *
    * Precondition: ids are DENSE 0..N−1 (true for generated embedding
    * tables; a sparse id space makes probes miss their candidate and
    * silently drops anchors — remap by rank first if ids have holes).
    *
    * Scale shape: N arrives as a 1-row broadcast scalar (the q22
    * pattern); probing is a bounded explode (×nProbes) followed by one
    * hash join on candidate id against the id→label projection; first-hit
    * selection is `min(struct(j, …))` — one aggregate, no window. */
  def negativePairs(vectors: DataFrame, idCol: String, labelCol: String,
                    nProbes: Int = 3): DataFrame = {
    val nRow = vectors.agg(count(lit(1)).as("n_total"))
    val probes = vectors.select(col(idCol).as("anchor_id"),
        col(labelCol).as("anchor_label"))
      .crossJoin(broadcast(nRow))
      .select(col("anchor_id"), col("anchor_label"),
        // anchor_id is reduced mod N BEFORE the ·37: identical result
        // ((a·37) mod N ≡ ((a mod N)·37) mod N) but the intermediate
        // stays ≤ 37·N, so huge ids cannot overflow Long and flip the
        // remainder negative (which would probe a nonexistent id)
        posexplode(array((0 until nProbes).map(j =>
          ((col("anchor_id") % col("n_total")) * 37 + lit(11 * j + 1))
            % col("n_total")): _*))
          .as(Seq("j", "cand_id")))
    val labels = vectors.select(col(idCol).as("cand_id"),
      col(labelCol).as("neg_label"))
    probes.join(labels, "cand_id")
      .filter(col("neg_label") =!= col("anchor_label"))
      .groupBy("anchor_id", "anchor_label")
      .agg(min(struct(col("j"), col("cand_id"), col("neg_label")))
        .as("best"))
      .select(col("anchor_id"), col("anchor_label"),
        col("best.cand_id").as("neg_id"),
        col("best.neg_label").as("neg_label"))
  }
}
