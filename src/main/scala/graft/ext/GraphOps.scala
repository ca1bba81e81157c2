package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics in the Pregel/message-passing shape —
  * generalizing the min-label propagation loop
  * ([[DedupOps.duplicateClusters]]) to WEIGHTED iterative scoring.
  *
  * The reference has no graph tier; this is [X]-tier surface a corpus
  * pipeline uses on its derived graphs (the near-dup pair graph here):
  * centrality scores rank documents inside a duplicate neighborhood —
  * the "authority" signal behind canonical selection when length alone
  * ties — and the identical machinery serves link graphs at crawl scale.
  *
  * Scale shape: each iteration is ONE shuffle — contributions fold
  * map-side per destination (`sum` of longs, associative), state is one
  * (node, score) row per node, and the edge table streams through
  * unmaterialized. `localCheckpoint` truncates the per-iteration lineage
  * (the cluster-propagation discipline: an uncut lineage re-runs the
  * whole prefix each round). That is the GraphX/Pregel aggregate-
  * messages loop expressed on DataFrames.
  *
  * Determinism: classic PageRank sums doubles, whose value depends on
  * shuffle fetch order. Scores here are FIXED-POINT longs (scale 10^12):
  * contribution = score div out-degree, damping applied as
  * (num·Σ) div den — every operation is integer, so the fold is
  * order-insensitive, the result hash-stable under any partitioning,
  * and the whole recurrence replayable in SQL (both engines' integer
  * division truncates; every operand here is non-negative, so DuckDB's
  * flooring `//` coincides — the repo's standard integer-div discipline).
  */
object GraphOps {

  /** `iters` rounds of fixed-point PageRank over a directed edge list
    * (`src`, `dst` columns). Every node is assumed to have at least one
    * out-edge (true for symmetric graphs like the near-dup pair graph);
    * nodes are the distinct sources. Returns (doc_id, score_fp) with
    * score_fp in units of 1/`scale`. */
  def pageRankFixedPoint(edges0: DataFrame, iters: Int,
                         scale: Long = 1000000000000L,
                         num: Long = 85L, den: Long = 100L): DataFrame = {
    // No checkpoint of the bare edge list: the only edge-sized frame the
    // loop reads is edgesDeg below, and holding a second checkpointed
    // copy of the edges would double resident edge state for no use.
    val edges = edges0.toDF("src", "dst")
    val nodes = edges.select(col("src").as("node")).distinct()
      .localCheckpoint()
    // one bounded scalar to the driver (node count), same discipline as
    // the k-means centroid collects — independent of edge count
    val nNodes = nodes.count()
    // an edgeless graph has no scores (and `scale / 0` would throw) —
    // return the empty frame in the output schema, like triangleCounts
    if (nNodes == 0)
      return nodes.select(col("node").as("doc_id"),
        col("node").as("score_fp"))
    val init = scale / nNodes
    val base = ((scale / nNodes) * (den - num)) / den
    // out-degree is loop-invariant: attach it to the edge rows ONCE and
    // checkpoint, so each iteration is one join + one fold instead of
    // re-deriving deg and re-joining it every round
    val edgesDeg = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .localCheckpoint()
    var pr = nodes.select(col("node"), lit(init).as("score"))
    (1 to iters).foreach { _ =>
      val contrib = edgesDeg
        .join(pr, col("src") === col("node")).drop("node")
        .select(col("dst"), expr("score div deg").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      pr = nodes
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"($num * coalesce(s, CAST(0 AS BIGINT))) div $den"))
            .as("score"))
        .localCheckpoint()
    }
    pr.select(col("node").as("doc_id"), col("score").as("score_fp"))
      .orderBy(desc("score_fp"), asc("doc_id"))
  }

  /** Per-node TRIANGLE counts over an undirected edge list given as
    * ordered pairs (`a` < `b`, each undirected edge once). Triangles are
    * enumerated once each via the ordered wedge join (a < b < c): wedges
    * (a→b, b→c) probe the closing edge (a, c) with an equi-join — never
    * an all-pairs product; work is Σ wedge counts, the standard bound.
    * (The skew refinement at 100 TB orients edges by (degree, id) instead
    * of raw id, bounding per-node fan-out by arboricity — same join
    * shape, different orientation key; raw-id orientation keeps the
    * SQL replay one-to-one.) Triangle membership per node is the local
    * clustering signal — on a near-dup graph it separates true duplicate
    * CLIQUES (every pair matches every pair) from chain-shaped false
    * positives that transitive clustering alone cannot tell apart. */
  def triangleCounts(pairs0: DataFrame): DataFrame = {
    val p = pairs0.toDF("a", "b").localCheckpoint()
    val tri = p.as("e1")
      .join(p.as("e2"), col("e2.a") === col("e1.b"))
      .join(p.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("doc_id"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_triangles"))
      .orderBy("doc_id")
  }

  /** Triangle counts over the near-dup pair graph (same pairs the
    * clusters are built from — served by the shared truth memo). */
  def nearDupTriangles(docs: DataFrame, n: Int, tau: Double): DataFrame =
    triangleCounts(DedupOps.truthPairsAbove(docs, n, tau))

  /** PageRank over the near-dup pair graph (exact-Jaccard ≥ tau edges,
    * symmetric — served from the session-wide truth memo the recall
    * audits and cluster queries share): the centrality ranking of
    * documents inside their duplicate neighborhoods. */
  def nearDupPageRank(docs: DataFrame, n: Int, tau: Double,
                      iters: Int): DataFrame = {
    val pairs = DedupOps.truthPairsAbove(docs, n, tau)
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    pageRankFixedPoint(edges, iters)
  }

  /** Bounded multi-source BFS over a directed edge list: minimum hop
    * count from the nearest seed, out to `maxHops`. Frontier-style —
    * each round expands only the nodes DISCOVERED last round (classic
    * level-synchronous BFS), so per-round work is one equi-join of the
    * frontier against the edge table plus an anti-join against the
    * settled set; a node's first discovery is by construction at its
    * minimum hop, so no re-relaxation ever happens. One bounded boolean
    * per round (`isEmpty`) reaches the driver for early exit — the same
    * convergence discipline as [[DedupOps.duplicateClusters]]'s label
    * sum. `localCheckpoint` truncates the per-round lineage. Returns
    * (node, hop) for every node within `maxHops` of a seed. */
  def bfsHops(edges0: DataFrame, seeds0: DataFrame,
              maxHops: Int): DataFrame = {
    val edges = edges0.toDF("src", "dst").localCheckpoint()
    var dist = seeds0.toDF("node").distinct()
      .withColumn("hop", lit(0L)).localCheckpoint()
    var frontier = dist
    var h = 0L
    var done = frontier.isEmpty
    while (h < maxHops && !done) {
      val next = frontier
        .join(edges, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
        .join(dist.select("node"), Seq("node"), "left_anti")
        .withColumn("hop", lit(h + 1L))
        .localCheckpoint()
      done = next.isEmpty
      if (!done) {
        dist = dist.union(next).localCheckpoint()
        frontier = next
      }
      h += 1
    }
    dist
  }

  /** Hop distance from each near-dup-graph node to its component's
    * CANONICAL representative (the component min — exactly the
    * [[DedupOps.duplicateClusters]] label), bounded at `maxHops`. This is
    * the chain-depth signal behind transitive near-dup merging: hop 1
    * nodes matched the canonical directly; hop ≥ 2 nodes were merged only
    * through intermediaries — each extra hop compounds the tau-miss risk
    * (two docs at Jaccard ≥ 0.5 to a middle doc can sit far below 0.5
    * from each other), so the hop histogram is the audit that says how
    * much of the dedup drop rests on transitivity rather than direct
    * evidence. Seeds are the cluster fixpoint labels (shared memo), edges
    * the same symmetric truth pairs as clusters/PageRank/triangles. */
  def nearDupHopsToCanonical(docs: DataFrame, n: Int, tau: Double,
                             maxHops: Int): DataFrame = {
    val clusters = DedupOps.duplicateClusters(docs, n, tau)
    val seeds = clusters.filter(col("doc_id") === col("cluster_id"))
      .select(col("doc_id").as("node"))
    val pairs = DedupOps.truthPairsAbove(docs, n, tau)
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    bfsHops(edges, seeds, maxHops)
      .select(col("node").as("doc_id"),
              col("hop").as("hop_to_canonical"))
      .orderBy("doc_id")
  }
}
