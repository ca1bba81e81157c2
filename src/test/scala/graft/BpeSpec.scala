package graft

import graft.ext.TextOps

/** Pins [[graft.ext.TextOps.bpeMerges]] — the BPE merge-loop trainer —
  * against an independent in-memory reference implementation of the
  * canonical algorithm (Sennrich et al. 2016: overlap-counted pair
  * stats, greedy leftmost non-overlapping merge application), plus
  * determinism and the early-dry edge. The corpus-level replay is the
  * driver's DuckDB oracle; these tests pin the SEMANTICS on inputs
  * small enough to check by hand.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE trainer over (word, count) — ~20 lines, written
    * directly from the algorithm, sharing no code with the operator. */
  private def refMerges(vocab: Map[String, Long],
                        n: Int): Seq[(Int, String, String, String, Long)] = {
    var seqs: Map[Vector[String], Long] =
      vocab.map { case (w, c) => w.toVector.map(_.toString) -> c }
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var rank = 1
    var done = false
    while (rank <= n && !done) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      seqs.foreach { case (seq, c) =>
        seq.sliding(2).foreach {
          case Vector(a, b) => pairs((a, b)) = pairs.getOrElse((a, b), 0L) + c
          case _            => ()
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val ((l, r), c) = pairs.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((rank, l, r, l + r, c))
        seqs = seqs.groupMapReduce { case (seq, _) =>
          val m = Vector.newBuilder[String]
          var i = 0
          while (i < seq.length) {
            if (i + 1 < seq.length && seq(i) == l && seq(i + 1) == r) {
              m += (l + r); i += 2
            } else { m += seq(i); i += 1 }
          }
          m.result()
        }(_._2)(_ + _)
        rank += 1
      }
    }
    out.toSeq
  }

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  private def run(df: org.apache.spark.sql.DataFrame, n: Int) =
    TextOps.bpeMerges(df, n)
      .as[(Int, String, String, String, Long)].collect().toSeq

  test("matches the reference trainer on the classic corpus") {
    // the Sennrich paper's running example (word frequencies via
    // repetition); 'lo' then 'low' are the expected first merges
    val docs = docsOf(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    val expected = refMerges(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 6)
    val got = run(docs, 6)
    assert(got === expected)
    // first merge is (e, s) with count 9 (newest 6 + widest 3) — the
    // hand-checkable anchor (no end-of-word marker in this variant, so
    // 'es' outranks the paper's '</w>'-dependent sequence)
    assert(got.head === ((1, "e", "s", "es", 9L)))
  }

  test("greedy merge application: adjacent repeats merge leftmost " +
       "non-overlapping") {
    // 'aaaa' with pair (a,a): greedy gives [aa, aa] — two merges kept,
    // none overlapping; 'ababab' merges all three (ab) pairs
    val docs = docsOf("aaaa aaaa ababab")
    val expected = refMerges(Map("aaaa" -> 2L, "ababab" -> 1L), 3)
    assert(run(docs, 3) === expected)
  }

  test("overlap-counted pair stats: 'aaa' counts (a,a) twice") {
    val docs = docsOf("aaa")
    // pairs of 'aaa' = (a,a) ×2 → first merge has count 2
    assert(run(docs, 1) === Seq((1, "a", "a", "aa", 2L)))
  }

  test("tie-break is (count DESC, left ASC, right ASC)") {
    // 'ab' and 'ba' both occur once ('abba' has ab@0? no: pairs of
    // abba = (a,b),(b,b),(b,a)) — use two words making a clean tie
    val docs = docsOf("ab ba")
    // pairs: (a,b)=1, (b,a)=1 — tie on count, (a,b) wins on left
    assert(run(docs, 1) === Seq((1, "a", "b", "ab", 1L)))
  }

  test("runs dry early and returns the merges learned so far") {
    // single-char words only: zero pairs from round 1
    val docs = docsOf("a b a c")
    assert(run(docs, 4) === Seq.empty)
    // one two-char word: exactly one merge possible, then dry
    val docs2 = docsOf("ab ab c")
    assert(run(docs2, 5) === Seq((1, "a", "b", "ab", 2L)))
  }

  /** Reference merge application: greedy leftmost non-overlapping. */
  private def refSegment(word: String,
                         merges: Seq[(String, String)]): Vector[String] = {
    var seq = word.toVector.map(_.toString)
    merges.foreach { case (l, r) =>
      val m = Vector.newBuilder[String]
      var i = 0
      while (i < seq.length) {
        if (i + 1 < seq.length && seq(i) == l && seq(i + 1) == r) {
          m += (l + r); i += 2
        } else { m += seq(i); i += 1 }
      }
      seq = m.result()
    }
    seq
  }

  test("encode: per-doc counts match the reference trainer + application") {
    val texts = Seq("low lower low newest", "widest newest low est")
    val docs = docsOf(texts: _*)
    val vocab = texts.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, ws) => w -> ws.length.toLong }
    val merges = refMerges(vocab, 4).map(m => (m._2, m._3))
    val expected = texts.zipWithIndex.map { case (t, i) =>
      val ws = t.split(" ").toSeq
      (i.toLong, ws.length.toLong,
        ws.map(w => refSegment(w, merges).length.toLong).sum)
    }
    val got = TextOps.bpeEncode(docs, 4)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === expected)
  }

  test("encode is consistent with the trained merge table (shared memo)") {
    val d = Tables.documents(spark, sfDir)
    val merges = run(d, 3).map(m => (m._2, m._3))
    // total BPE tokens = total chars-as-symbols minus one per applied
    // merge occurrence; check via an independent recount on a sample doc
    val sample = d.orderBy("doc_id").limit(1)
      .select("text").as[String].head()
    val words = "[a-z]+".r.findAllIn(sample.toLowerCase).toSeq
    val expectedTokens = words.map(w => refSegment(w, merges).length.toLong).sum
    val got = TextOps.bpeEncode(d, 3)
      .orderBy("doc_id").limit(1)
      .as[(Long, Long, Long)].head()
    assert(got._2 === words.length.toLong)
    assert(got._3 === expectedTokens)
  }

  test("encode under an early-dry vocabulary uses the partial merge " +
       "table (the oracle's bestpad degradation)") {
    // one merge possible, then dry: encode must still count every doc's
    // tokens under the single learned merge — 'ab ab c' → 3 tokens
    val got = TextOps.bpeEncode(docsOf("ab ab c"), 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((0L, 3L, 3L)))
  }

  test("roundtrip: decode(encode(x)) = normalize(x) on every doc, " +
       "token counts match encode") {
    val docs = docsOf("the Quick brown fox! 42", "low lower lowest",
      "newer wider", "aaa aa a")
    val rt = TextOps.bpeRoundtrip(docs, 4)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(rt.map(_._1) === Seq(0L, 1L, 2L, 3L))
    assert(rt.forall(_._3), s"round-trip must hold per doc: $rt")
    val enc = TextOps.bpeEncode(docs, 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(rt.map(r => r._1 -> r._2).toMap === enc,
      "roundtrip token counts must equal the encode seat's")
  }

  test("roundtrip OOV: an apply corpus DISJOINT from training falls " +
       "back to characters and still decodes exactly") {
    val train = docsOf("low lower lowest low low", "newer newest")
    // apply words share no merged symbol pair and even introduce
    // letters absent from training ('z', 'q') — the id space must
    // close over them via the single-letter fallback
    val apply = docsOf("zq quiz fizz", "buzz")
    val rt = TextOps.bpeRoundtripApply(train, apply, 4)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(rt.nonEmpty && rt.forall(_._3),
      s"OOV apply corpus must still round-trip: $rt")
    // pure-fallback words tokenize to one id per character
    val byDoc = rt.map(r => r._1 -> r._2).toMap
    assert(byDoc(0L) === "zq quiz fizz".count(_.isLetter),
      "unseen words must decompose to single-letter ids")
  }

  test("deterministic across runs and partition widths") {
    val d = Tables.documents(spark, sfDir)
    val a = run(d, 4)
    val b = run(d.repartition(7), 4)
    assert(a === b)
    assert(a.map(_._1) === (1 to a.length))
  }
}
