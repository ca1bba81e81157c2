package graft

import org.apache.spark.sql.functions._
import graft.ops.FuzzyJoin

/** The pigeonhole-segment blocked edit-distance join: candidate
  * COMPLETENESS (parity with the brute-force cross join) is the whole
  * correctness story — a lost candidate silently drops a match. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(dirty: Seq[(Long, String)], clean: Seq[String], k: Int) = {
    val d = dirty.toDF("dirty_id", "dirty_name")
    val c = clean.toDF("entity")
    d.crossJoin(c)
      .withColumn("dist", levenshtein(col("dirty_name"), col("entity")).cast("long"))
      .filter(col("dist") <= k)
      .as[(Long, String, String, Long)].collect().toSet
  }

  private def blocked(dirty: Seq[(Long, String)], clean: Seq[String], k: Int) =
    FuzzyJoin.editDistanceJoin(
        dirty.toDF("dirty_id", "dirty_name"), "dirty_name", Seq("dirty_id"),
        clean.toDF("entity"), "entity", k)
      .as[(Long, String, String, Long)].collect().toSet

  test("blocked join equals brute force on crafted edge cases (k=2)") {
    // every edit kind at every position class: head, seam, tail;
    // plus a distance-3 near-miss that must NOT match, and an exact dup
    val clean = Seq("small ring", "red widget", "blue bolt", "hot gear")
    val dirty = Seq(
      1L -> "small ring",   // dist 0
      2L -> "mall ring",    // head delete
      3L -> "small rng",    // tail-side delete
      4L -> "smxll rinx",   // two substitutions
      5L -> "smal l ring",  // insert at seam
      6L -> "red widgetxy", // two tail inserts
      7L -> "xed widgex",   // head+tail substitution
      8L -> "rd wdget",     // two deletes
      9L -> "blu boltxxx",  // dist 4 from "blue bolt" -> no match
      10L -> "zzz zzz zzz", // matches nothing
      11L -> "hot gearhot") // tail insert x3 -> dist 3, no match
    val want = brute(dirty, clean, 2)
    val got = blocked(dirty, clean, 2)
    assert(got == want)
    // fixture is non-vacuous on both branches
    assert(want.map(_._1).intersect(Set(1L, 2L, 4L, 8L)).size == 4)
    assert(!want.map(_._1).contains(9L) && !want.map(_._1).contains(11L))
  }

  test("parity holds for k=1 and for length-boundary strings") {
    // shortest indexable clean string has length k+1
    val clean = Seq("ab", "abc", "abcd", "xy")
    val dirty = Seq(1L -> "ab", 2L -> "abx", 3L -> "bc", 4L -> "abcde",
                    5L -> "a", 6L -> "")
    assert(blocked(dirty, clean, 1) == brute(dirty, clean, 1))
  }

  test("exhaustive 1-and-2-edit neighborhood parity (k=2)") {
    // systematic surgery over one base string: all substitute/delete/
    // insert positions, singly and pairwise-sampled — the full boundary
    // of the k=2 ball, so any alignment-window bug in the probe grid
    // shows up as a parity diff
    val base = "quick brown"
    val subs = base.indices.map(i => base.updated(i, 'z'))
    val dels = base.indices.map(i => base.take(i) + base.drop(i + 1))
    val ins = (0 to base.length).map(i => base.take(i) + "q" + base.drop(i))
    val twoEdit = for {
      i <- base.indices; j <- base.indices if j > i
    } yield base.updated(i, 'z').updated(j, 'q')
    val dirty = (subs ++ dels ++ ins ++ twoEdit).distinct
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val clean = Seq(base, "quick crown", "slow brown", "other thing")
    assert(blocked(dirty, clean, 2) == brute(dirty, clean, 2))
  }

  test("randomized edit-script parity across k = 1, 2, 3") {
    // seeded random corpora hammer the PRUNED probe grid (the indel-
    // budget cells dropped in round 10) from angles no crafted fixture
    // anticipates: random clean strings of varied lengths, each dirtied
    // by a random script of 0..k+1 edits (sub/del/ins at random
    // positions), parity with brute force at every k — a pruned cell
    // that was actually reachable by some edit script loses a match
    // and flips the set compare
    val rnd = new scala.util.Random(20260814L)
    val alpha = "abcdefg "
    def word(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    for (k <- 1 to 3) {
      val clean = Seq.fill(6)(word(k + 2 + rnd.nextInt(10))).distinct
      val dirty = (0 until 40).map { i =>
        var s = clean(rnd.nextInt(clean.size))
        val edits = rnd.nextInt(k + 2)
        for (_ <- 0 until edits if s.nonEmpty) rnd.nextInt(3) match {
          case 0 => val p = rnd.nextInt(s.length)
                    s = s.updated(p, alpha(rnd.nextInt(alpha.length)))
          case 1 => val p = rnd.nextInt(s.length)
                    s = s.take(p) + s.drop(p + 1)
          case _ => val p = rnd.nextInt(s.length + 1)
                    s = s.take(p) + alpha(rnd.nextInt(alpha.length)) + s.drop(p)
        }
        (i.toLong, s)
      }
      assert(blocked(dirty, clean, k) == brute(dirty, clean, k),
        s"parity broke at k=$k")
    }
  }

  test("plan is an equi-join on segment keys, never a cross product") {
    val plan = FuzzyJoin.fuzzyPartMatch(Tables.part(spark, sfDir))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "blocked fuzzy join must not plan a cartesian product")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "blocked fuzzy join must not plan a nested-loop join")
  }

  test("probe fan-out per dirty row is constant-bounded") {
    // (k+1) segments x (2k+1) lengths x (2k+1) starts is the hard cap
    val k = 2
    val dirty = Seq(1L -> "small ring Brand#22").toDF("dirty_id", "dirty_name")
    val clean = Seq("small ring Brand#22").toDF("entity")
    val nResult = FuzzyJoin.editDistanceJoin(
        dirty, "dirty_name", Seq("dirty_id"), clean, "entity", k)
      .count() // sanity: result exists
    assert(nResult == 1)
    val cap = (k + 1) * (2 * k + 1) * (2 * k + 1)
    val exploded = FuzzyJoin.probeRows(dirty, "dirty_name", Seq("dirty_id"), k)
      .count()
    assert(exploded <= cap, s"probe fan-out $exploded exceeds cap $cap")
  }

  test("jaro-winkler: classic reference values, SQL registry, codegen path") {
    graft.functions.GraftExtensions.register(spark)
    // canonical literature pairs (also verified equal to DuckDB's
    // jaro_winkler_similarity, which grades j8b)
    val got = Seq(
      ("martha", "marhta"), ("dixon", "dicksonx"),
      ("jellyfish", "smellyfish"), ("same", "same"), ("ab", "ba"))
      .toDF("a", "b")
      .selectExpr("round(jaro_winkler(a, b), 6) AS jw")
      .as[Double].collect().toSeq
    assert(got === Seq(0.961111, 0.813333, 0.896296, 1.0, 0.0))
    // static routine agrees with the expression path bit-for-bit
    assert(graft.functions.JaroWinkler.similarity("martha", "marhta") ===
      0.9611111111111111)
  }

  test("nfc normalize: composed and decomposed spellings collapse to one key") {
    graft.functions.GraftExtensions.register(spark)
    val df = Seq(("caf\u00e9"), ("cafe\u0301"), ("plain")).toDF("w")
      .selectExpr("w", "nfc_normalize(w) AS n", "length(w) AS lw",
        "length(nfc_normalize(w)) AS ln")
    val rows = df.as[(String, String, Int, Int)].collect()
    val byW = rows.map(r => r._1 -> r).toMap
    assert(byW("caf\u00e9")._2 === byW("cafe\u0301")._2,
      "canonically-equal spellings must normalize to identical bytes")
    assert(byW("cafe\u0301")._3 === 5 && byW("cafe\u0301")._4 === 4,
      "decomposed 5 codepoints compose to 4")
    assert(byW("plain")._2 === "plain", "ASCII is a fixed point")
    // dedup payoff: grouping on the normalized key merges the spellings
    assert(df.groupBy("n").count().count() === 2L)
  }

  test("damerau-levenshtein: unrestricted definition, transposition = 1") {
    graft.functions.GraftExtensions.register(spark)
    import graft.functions.DamerauLevenshtein.distance
    // the OSA-discriminating case: unrestricted DL allows edits between
    // the transposed pair ("ca" -> "ac" -> "abc"), OSA would say 3
    assert(distance("ca", "abc") === 2)
    assert(distance("ab", "ba") === 1, "adjacent swap is ONE edit")
    assert(distance("kitten", "sitting") === 3)
    assert(distance("", "xyz") === 3 && distance("xyz", "") === 3)
    assert(distance("same", "same") === 0)
    // expression path through the registry agrees with the routine
    val viaSql = Seq(("ca", "abc")).toDF("a", "b")
      .selectExpr("damerau_levenshtein(a, b)").as[Int].head()
    assert(viaSql === 2)
  }

  test("damerau part match: swap counted once by DL, twice by levenshtein") {
    val out = FuzzyJoin.damerauPartMatch(Tables.part(spark, sfDir))
    assert(out.count() > 0)
    assert(out.filter(!col("transposition_detected")).count() === 0L)
    // non-degenerate: some swaps exchange unequal chars (dl=1, lev=2)
    assert(out.filter(col("dl_dist") === 1 && col("lev_dist") === 2)
      .count() > 0L)
  }

  test("string-metric natives: codegen and interpreted paths agree") {
    graft.functions.GraftExtensions.register(spark)
    val df = Seq(("dixon", "dicksonx"), ("ca", "abc"), ("caf\u00e9", "cafe\u0301"))
      .toDF("a", "b")
    def run(): Seq[(Double, Int, Boolean)] =
      df.selectExpr("jaro_winkler(a, b)", "damerau_levenshtein(a, b)",
          "nfc_normalize(a) = nfc_normalize(b)")
        .as[(Double, Int, Boolean)].collect().toSeq
    val viaCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val viaInterp =
      try run()
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    assert(viaCodegen === viaInterp)
    assert(viaCodegen(2)._3, "NFC collapses the unicode spellings")
  }

  test("jaro-winkler part match: self score beats the neighbor control everywhere") {
    val out = FuzzyJoin.jaroWinklerPartMatch(Tables.part(spark, sfDir))
    val n = out.count()
    assert(n > 0)
    assert(out.filter(!col("self_wins")).count() === 0L,
      "every dirty string must score its own source highest")
    assert(out.filter(col("jw_self") < 0.8).count() === 0L,
      "1-2 char edits keep JW high on these entity lengths " +
        "(two edits on a short string can dip below 0.9, never 0.8)")
  }
}
