package graft

import org.apache.spark.sql.functions._
import graft.ext.GraphOps

/** Fixed-point PageRank: exact parity with an independent driver-side
  * replay of the integer recurrence, structural sanity on a crafted
  * graph, and determinism across runs. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: the same integer recurrence in plain Scala. */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
                        scale: Long = 1000000000000L,
                        num: Long = 85L, den: Long = 100L): Map[Long, Long] = {
    val nodes = edges.map(_._1).distinct.sorted
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val init = scale / nodes.size
    val base = ((scale / nodes.size) * (den - num)) / den
    var score = nodes.map(_ -> init).toMap
    (1 to iters).foreach { _ =>
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => score(s) / deg(s) }.sum).toMap
      score = nodes.map(v => v -> (base + (num * in.getOrElse(v, 0L)) / den)).toMap
    }
    score
  }

  test("path graph: center outranks endpoints; engine equals the replay") {
    // 1 - 2 - 3 symmetric path: node 2 receives from both ends
    val sym = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val got = GraphOps.pageRankFixedPoint(sym.toDF("src", "dst"), 3)
      .as[(Long, Long)].collect().toMap
    val want = reference(sym, 3)
    assert(got === want)
    assert(got(2L) > got(1L) && got(2L) > got(3L),
      "the path center must outrank the endpoints")
    assert(got(1L) === got(3L), "symmetric endpoints must tie exactly")
  }

  test("triangles: K4 yields four triangles, three per node; paths yield none") {
    // K4 on {1,2,3,4}: C(4,3) = 4 triangles, each node on 3 of them
    val k4 = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L))
    val got = GraphOps.triangleCounts(k4.toDF("a","b"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // a path has wedges but no closing edge — zero triangles
    val path = Seq((1L,2L),(2L,3L),(3L,4L))
    assert(GraphOps.triangleCounts(path.toDF("a","b")).count() === 0L)
  }

  test("empty edge list: PageRank returns the empty frame, not a crash") {
    val none = Seq.empty[(Long, Long)].toDF("src", "dst")
    val out = GraphOps.pageRankFixedPoint(none, 3)
    assert(out.columns.toSeq === Seq("doc_id", "score_fp"))
    assert(out.count() === 0L)
  }

  test("near-dup graph: deterministic, integer-exact, clusters carry mass") {
    val docs = Tables.documents(spark, sfDir)
    val a = GraphOps.nearDupPageRank(docs, 3, tau = 0.5, iters = 3)
      .as[(Long, Long)].collect().toSeq
    val b = GraphOps.nearDupPageRank(docs, 3, tau = 0.5, iters = 3)
      .as[(Long, Long)].collect().toSeq
    assert(a === b, "fixed-point scores must be bit-stable across runs")
    assert(a.nonEmpty)
    // every scored node is a clustered doc (the pair graph's node set)
    val clustered = graft.ext.DedupOps
      .duplicateClusters(docs, 3, tau = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(a.map(_._1).toSet === clustered)
  }

  test("bfsHops: exact min-hop levels, multi-seed, bound respected") {
    // two components: path 1-2-3-4 seeded at 1, edge 10-11 seeded at 10
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(1L, 10L).toDF("node")
    val got = GraphOps.bfsHops(edges, seeds, 6)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
                       10L -> 0L, 11L -> 1L))
    // the hop bound caps discovery at that level — frontier never
    // expands past it (the exact contract the SQL replay mirrors)
    val capped = GraphOps.bfsHops(edges, seeds, 1)
      .as[(Long, Long)].collect().toMap
    assert(capped === Map(1L -> 0L, 2L -> 1L, 10L -> 0L, 11L -> 1L))
    // empty seed set: empty result, no crash
    assert(GraphOps.bfsHops(edges,
      Seq.empty[Long].toDF("node"), 3).count() === 0L)
  }

  test("hops to canonical: reps sit at hop 0, members at >= 1, full cover") {
    val docs = Tables.documents(spark, sfDir)
    val hops = GraphOps.nearDupHopsToCanonical(docs, 3, tau = 0.5, maxHops = 6)
      .as[(Long, Long)].collect().toMap
    val clusters = graft.ext.DedupOps.duplicateClusters(docs, 3, tau = 0.5)
      .as[(Long, Long)].collect()
    val reps = clusters.filter { case (d, c) => d == c }.map(_._1).toSet
    assert(hops.nonEmpty)
    assert(hops.filter(_._2 == 0L).keySet === reps,
      "hop-0 set must be exactly the cluster representatives")
    // near-dup components are cliques/short chains: 6 hops covers them,
    // so every clustered node gets a distance and non-reps sit at >= 1
    assert(hops.keySet === clusters.map(_._1).toSet)
    assert(hops.filter(_._2 > 0L).keySet === clusters.map(_._1).toSet -- reps)
  }
}
