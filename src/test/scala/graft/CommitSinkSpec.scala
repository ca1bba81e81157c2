package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** The DSv2 commit-protocol sink (`s7d_sink_commit`): committed output
  * is all-or-nothing, truncate replaces instead of doubling, and a
  * failed job leaves nothing visible. */
class CommitSinkSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() = graft.TmpDirs.create("graft_sinkspec_").toString

  private def write(df: org.apache.spark.sql.DataFrame, dir: String,
                    mode: String): Unit =
    df.write.format(classOf[graft.sources.CommitSink].getName)
      .option("path", dir).mode(mode).save()

  /** Directory entry names with the `Files.list` stream CLOSED — the
    * same fd discipline the production CommitSinkIO.listDir documents;
    * the crash-matrix test lists per iteration, so a leaked fd per call
    * would accumulate across the suite. */
  private def ls(p: java.nio.file.Path): Seq[String] = {
    if (!Files.isDirectory(p)) return Seq.empty
    val s = Files.list(p)
    try s.iterator().asScala.map(_.getFileName.toString).toList
    finally s.close()
  }

  private def parts(dir: String): Seq[String] =
    ls(Paths.get(dir)).filter(_.startsWith("part-"))

  test("round trip is value-lossless; manifest counts rows; temp swept") {
    val dir = freshDir()
    val df = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "v")
    write(df.repartition(2), dir, "append")
    // sorted-Seq compare, not a Set: a double-visible part (rename
    // collision class of bug) must fail, not collapse
    val back = spark.read.schema("k STRING, v BIGINT").csv(dir)
      .as[(String, Long)].collect().sorted.toSeq
    assert(back === Seq(("a", 1L), ("b", 2L), ("c", 3L)))
    assert(Files.readString(Paths.get(dir, "_SUCCESS")).trim == "rows=3")
    assert(!Files.exists(Paths.get(dir, "_temporary")),
      "temp dir must be swept at commit")
  }

  test("overwrite truncates at commit: a restated write replaces parts") {
    val dir = freshDir()
    write(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), dir, "append")
    write(Seq(("z", 9L)).toDF("k", "v").repartition(1), dir, "overwrite")
    val back = spark.read.schema("k STRING, v BIGINT").csv(dir)
      .as[(String, Long)].collect().sorted.toSeq
    assert(back === Seq(("z", 9L)), s"parts now: ${parts(dir)}")
    assert(Files.readString(Paths.get(dir, "_SUCCESS")).trim == "rows=1")
  }

  test("append from a second write cannot clobber the first's parts") {
    val dir = freshDir()
    write(Seq(("a", 1L)).toDF("k", "v").repartition(1), dir, "append")
    write(Seq(("b", 2L)).toDF("k", "v").repartition(1), dir, "append")
    // both single-task writes used partitionId 0 — the queryId in the
    // final part name is what keeps them distinct
    assert(parts(dir).size === 2, s"parts: ${parts(dir)}")
    val back = spark.read.schema("k STRING, v BIGINT").csv(dir)
      .as[(String, Long)].collect().sorted.toSeq
    assert(back === Seq(("a", 1L), ("b", 2L)))
  }

  test("nulls and delimiter/quote/newline strings survive the round trip") {
    val dir = freshDir()
    val df = Seq[(String, java.lang.Long)](
      ("plain", 1L), ("comma,inside", 2L), ("quote\"inside", 3L),
      ("line\nbreak", 4L), (null, 5L), ("x", null))
      .toDF("k", "v")
    write(df.repartition(1), dir, "append")
    val back = spark.read.schema("k STRING, v BIGINT")
      .option("multiLine", true).csv(dir)
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1))))
      .sortBy(p => (p._1 == null, p._1, p._2 == null)).toSeq
    val want = Seq[(String, java.lang.Long)](
      ("comma,inside", 2L), ("line\nbreak", 4L), ("plain", 1L),
      ("quote\"inside", 3L), ("x", null), (null, 5L))
    assert(back === want, s"got $back")
  }

  test("overwrite commit crashing at ANY step never destroys the prior generation") {
    // drives CommitSinkBatchWrite.commit DIRECTLY (no Spark job, no
    // abort) — the hard-crash simulation: after a throw at each
    // failpoint, every byte of generation A must still exist, in place
    // or staged under _temporary/<qid>.stale; abort() must then restore
    // generation A exactly.
    import graft.sources.{CommitMsg, CommitSinkBatchWrite, CommitSinkFailpoints}
    val schema = org.apache.spark.sql.types.StructType(Nil)
    for ((step, nth) <- Seq(("rename-in", 1), ("rename-in", 2),
                            ("stage-stale", 1), ("stage-stale", 2),
                            ("success", 1))) {
      val dir = freshDir()
      // generation A: two committed parts + manifest
      write(Seq(("a", 1L), ("b", 2L)).toDF("k", "v").repartition(2),
        dir, "append")
      val genAParts = parts(dir).toSet
      assert(genAParts.size === 2)
      // generation B: two staged task outputs for a fresh queryId
      val qid = s"crash_${step}_$nth"
      val tmp = Paths.get(dir, "_temporary", qid)
      Files.createDirectories(tmp)
      val msgs = (0 to 1).map { i =>
        val f = tmp.resolve(s"$i-$i.csv")
        Files.writeString(f, s"z$i,9\n")
        CommitMsg(f.toString, i, i.toLong, 1L)
      }.toArray[org.apache.spark.sql.connector.write.WriterCommitMessage]
      val bw = new CommitSinkBatchWrite(schema, dir, qid, true)
      var calls = 0
      CommitSinkFailpoints.set(dir, s => {
        if (s == step) { calls += 1; if (calls == nth) sys.error(s"boom at $s#$nth") }
      })
      try intercept[RuntimeException] { bw.commit(msgs) }
      finally CommitSinkFailpoints.clear(dir)
      // hard-crash invariant: generation A's bytes all survive somewhere
      val stale = Paths.get(dir, "_temporary", s"$qid.stale")
      val surviving = parts(dir).toSet ++ ls(stale).toSet
      assert(genAParts.subsetOf(surviving),
        s"[$step#$nth] prior parts lost: ${genAParts -- surviving}")
      assert(Files.readString(Paths.get(dir, "_SUCCESS")).trim == "rows=2",
        s"[$step#$nth] prior manifest must survive an uncommitted attempt")
      // and abort() restores generation A exactly
      bw.abort(msgs)
      assert(parts(dir).toSet === genAParts,
        s"[$step#$nth] abort must restore exactly the prior parts")
      val back = spark.read.schema("k STRING, v BIGINT").csv(dir)
        .as[(String, Long)].collect().sorted.toSeq
      assert(back === Seq(("a", 1L), ("b", 2L)), s"[$step#$nth] got $back")
      assert(!Files.exists(Paths.get(dir, "_temporary")),
        s"[$step#$nth] abort must sweep temp + staging")
    }
  }

  test("a mid-commit failure under Spark aborts AND restores the prior generation") {
    import graft.sources.CommitSinkFailpoints
    val dir = freshDir()
    write(Seq(("a", 1L), ("b", 2L)).toDF("k", "v").repartition(2),
      dir, "append")
    CommitSinkFailpoints.set(dir,
      s => if (s == "stage-stale") sys.error("boom mid-overwrite"))
    try intercept[Exception] {
      write(Seq(("z", 9L)).toDF("k", "v").repartition(1), dir, "overwrite")
    } finally CommitSinkFailpoints.clear(dir)
    val back = spark.read.schema("k STRING, v BIGINT").csv(dir)
      .as[(String, Long)].collect().sorted.toSeq
    assert(back === Seq(("a", 1L), ("b", 2L)),
      s"failed overwrite must leave generation A exactly; got $back")
    assert(Files.readString(Paths.get(dir, "_SUCCESS")).trim == "rows=2")
    // and the sink remains usable: the retried overwrite lands cleanly
    write(Seq(("z", 9L)).toDF("k", "v").repartition(1), dir, "overwrite")
    val retried = spark.read.schema("k STRING, v BIGINT").csv(dir)
      .as[(String, Long)].collect().sorted.toSeq
    assert(retried === Seq(("z", 9L)))
    assert(Files.readString(Paths.get(dir, "_SUCCESS")).trim == "rows=1")
  }

  test("a failed job aborts: no part files, no manifest, temp swept") {
    val dir = freshDir()
    val poison = spark.range(100).select(
      when(col("id") === 50, expr("raise_error('boom')"))
        .otherwise(col("id").cast("string")).as("s"))
    intercept[Exception] { write(poison.repartition(4), dir, "append") }
    val visible = ls(Paths.get(dir)).filterNot(_ == "_temporary")
    assert(visible.isEmpty, s"nothing may be visible after abort: $visible")
    assert(ls(Paths.get(dir, "_temporary")).isEmpty,
      "in-flight temp files must be swept on abort")
  }

  test("abort never reaps a staged part whose restore failed") {
    // the one corner where abort's best-effort restore can fail while
    // the staged file is the SOLE copy of a committed byte: the sweep
    // must leave it staged for operator recovery, never delete it.
    import graft.sources.{CommitMsg, CommitSinkBatchWrite, CommitSinkFailpoints}
    val dir = freshDir()
    write(Seq(("a", 1L)).toDF("k", "v").repartition(1), dir, "append")
    val genAName = parts(dir).head
    val genABytes = Files.readString(Paths.get(dir, genAName))
    val qid = "abort_restore_fail"
    val tmp = Paths.get(dir, "_temporary", qid)
    Files.createDirectories(tmp)
    val f = tmp.resolve("0-0.csv")
    Files.writeString(f, "z,9\n")
    val msgs = Array[org.apache.spark.sql.connector.write.WriterCommitMessage](
      CommitMsg(f.toString, 0, 0L, 1L))
    val bw = new CommitSinkBatchWrite(
      org.apache.spark.sql.types.StructType(Nil), dir, qid, true)
    // crash at the commit point: generation A is fully staged by then
    CommitSinkFailpoints.set(dir,
      s => if (s == "success") sys.error("boom at commit point"))
    try intercept[RuntimeException] { bw.commit(msgs) }
    finally CommitSinkFailpoints.clear(dir)
    val stale = Paths.get(dir, "_temporary", s"$qid.stale")
    assert(ls(stale) === Seq(genAName), "precondition: part staged")
    // block the restore: a non-empty directory squats on the part's
    // original path, so abort's ATOMIC_MOVE back must throw (swallowed)
    val squatter = Paths.get(dir, genAName)
    Files.createDirectories(squatter.resolve("occupied"))
    bw.abort(msgs)
    // the restore failed — the staged copy must still exist, bytes intact
    assert(Files.exists(stale.resolve(genAName)),
      "sweep must not reap a staged part that could not be restored")
    assert(Files.readString(stale.resolve(genAName)) === genABytes)
    // unblock and prove the staged copy is still restorable by hand
    Files.delete(squatter.resolve("occupied"))
    Files.delete(squatter)
    Files.move(stale.resolve(genAName), squatter)
    val back = spark.read.schema("k STRING, v BIGINT").csv(dir)
      .as[(String, Long)].collect().toSeq
    assert(back === Seq(("a", 1L)))
  }

  test("interleaved queries on one path: commit, abort, and truncate stay isolated") {
    // The scaladoc's concurrency claims, driven as a real interleaving
    // (the sequential two-append test can't show them): while one
    // query's task outputs sit staged, ANOTHER query commits, aborts,
    // or truncates on the same path — and neither the in-flight temp
    // files nor the other query's committed parts are ever touched.
    import graft.sources.{CommitMsg, CommitSinkBatchWrite}
    import org.apache.spark.sql.connector.write.WriterCommitMessage
    val schema = org.apache.spark.sql.types.StructType(Nil)
    def stage(dir: String, qid: String, row: String): (Array[WriterCommitMessage], java.nio.file.Path) = {
      val tmp = Paths.get(dir, "_temporary", qid)
      Files.createDirectories(tmp)
      val f = tmp.resolve("0-0.csv")
      Files.writeString(f, s"$row\n")
      (Array[WriterCommitMessage](CommitMsg(f.toString, 0, 0L, 1L)), f)
    }
    val dir = freshDir()
    // generation A committed through the normal Spark path
    write(Seq(("a", 1L)).toDF("k", "v").repartition(1), dir, "append")
    val genA = parts(dir).toSet
    // B and C both in flight (staged, uncommitted) with distinct queryIds
    val (bMsgs, _) = stage(dir, "qB", "b,2")
    val (cMsgs, cTmp) = stage(dir, "qC", "c,3")
    // B commits while C's temp files are live: C must be untouched
    new CommitSinkBatchWrite(schema, dir, "qB", false).commit(bMsgs)
    assert(Files.exists(cTmp), "a commit must not sweep another query's temp")
    assert(parts(dir).toSet.size === 2, s"A + B visible: ${parts(dir)}")
    // C aborts: only C's temp goes; A's and B's committed parts stay
    new CommitSinkBatchWrite(schema, dir, "qC", false).abort(cMsgs)
    assert(!Files.exists(cTmp), "abort must sweep its own temp")
    assert(genA.subsetOf(parts(dir).toSet) && parts(dir).size === 2,
      s"abort must not touch other queries' parts: ${parts(dir)}")
    // D (truncate) commits while E (append) is still staged: the
    // truncate replaces every COMMITTED part but must leave E's
    // in-flight temp alone; E then lands beside D
    val (dMsgs, _) = stage(dir, "qD", "d,4")
    val (eMsgs, eTmp) = stage(dir, "qE", "e,5")
    new CommitSinkBatchWrite(schema, dir, "qD", true).commit(dMsgs)
    assert(Files.exists(eTmp), "truncate must not sweep another query's temp")
    assert(parts(dir).forall(_.startsWith("part-qD-")),
      s"truncate replaces all committed parts: ${parts(dir)}")
    new CommitSinkBatchWrite(schema, dir, "qE", false).commit(eMsgs)
    val back = spark.read.schema("k STRING, v BIGINT").csv(dir)
      .as[(String, Long)].collect().sorted.toSeq
    assert(back === Seq(("d", 4L), ("e", 5L)), s"got $back")
    assert(!Files.exists(Paths.get(dir, "_temporary")),
      "all temp swept once every query has resolved")
  }
}
