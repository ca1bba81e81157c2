package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE half of the DataSource V2 connector story ([[GenSource]] is
  * the read half): a CSV sink implementing the real TWO-PHASE COMMIT
  * protocol every production connector needs —
  *
  *  1. each task writes to a file under `_temporary/<queryId>/`, named
  *     by (partitionId, taskId) so speculative or retried attempts —
  *     and concurrent queries on the same path — can never collide;
  *  2. task `commit()` returns a [[WriterCommitMessage]] carrying the
  *     temp path + row count — nothing is visible yet;
  *  3. the DRIVER's job `commit(messages)` renames exactly the committed
  *     attempts' files into place (final names carry the queryId too, so
  *     appends from different applications whose task ids restart at 0
  *     cannot overwrite each other) and writes a `_SUCCESS` manifest
  *     with the total row count — the all-or-nothing instant;
  *  4. job `abort()` (any task failed beyond retry) sweeps only THIS
  *     query's temp subdirectory — no partial output ever becomes
  *     visible, and a concurrent query's in-flight files are untouched.
  *
  * This is the FileCommitProtocol contract expressed through the
  * connector API: at 100 TB it is what makes a 10 000-task write either
  * fully land or fully vanish, with stragglers' duplicate attempts
  * discarded at rename time. `SupportsTruncate` maps `mode("overwrite")`
  * to a commit-time replacement of prior parts, so a restated write
  * replaces rather than doubles.
  *
  * Overwrite ordering is CRASH-SAFE: the new generation's parts are
  * renamed in FIRST (their names carry the queryId, so they cannot
  * collide with any prior generation), the prior generation's parts are
  * then STAGED out to a reversible holding dir (renamed, never deleted,
  * under `_temporary/<queryId>.stale/`), and `_SUCCESS` — the commit
  * point — is written last; only then is the staging dir reaped. A
  * crash, rename failure, or disk-full at ANY step therefore never
  * destroys previously committed bytes: before the commit point every
  * prior part still exists (in place or staged), and `abort()` restores
  * the prior generation exactly — it deletes this query's renamed-in
  * parts and moves the staged parts back. `CommitSinkSpec` drives a
  * failure at every step and proves both invariants.
  *
  * Encoding: CSV readable back by Spark's own reader under default
  * options (which ignores `_`-prefixed paths, so in-flight temp files
  * are invisible to readers by construction). NULL of any type is an
  * unquoted empty field (the reader's default `nullValue`); an empty
  * string is a quoted `""` (the reader's default `emptyValue`); strings
  * containing delimiter/quote/newline are RFC-quoted with
  * backslash-escaped quotes (the reader's default `escape`). */
class CommitSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new CommitSinkTable(schema,
      Option(properties.get("path")).getOrElse(
        throw new IllegalArgumentException("CommitSink requires a path option")))
}

/** Test-only crash injection: specs register a hook per sink path that
  * [[CommitSinkBatchWrite.commit]] invokes at each named step
  * (`rename-in`, `stage-stale`, `success`); throwing from the hook
  * simulates a failure at exactly that point. Keyed by path so
  * concurrently running suites cannot trip each other. Production cost:
  * one empty-map lookup per commit step. */
private[graft] object CommitSinkFailpoints {
  private val hooks =
    new java.util.concurrent.ConcurrentHashMap[String, String => Unit]()
  def set(path: String, hook: String => Unit): Unit = hooks.put(path, hook)
  def clear(path: String): Unit = hooks.remove(path)
  def fire(path: String, step: String): Unit = {
    val h = hooks.get(path)
    if (h != null) h(step)
  }
}

private object CommitSinkIO {
  /** List a directory's entries with the stream CLOSED afterwards —
    * `Files.list` holds a directory fd until closed, and commit/abort
    * run once per job for the JVM's lifetime. */
  def listDir(dir: Path): Seq[Path] = {
    if (!Files.isDirectory(dir)) return Seq.empty
    val s = Files.list(dir)
    try s.iterator().asScala.toList finally s.close()
  }
}

private class CommitSinkTable(writeSchema: StructType, path: String)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_commit_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new CommitSinkWriteBuilder(info.schema(), path, info.queryId())
}

private class CommitSinkWriteBuilder(schema: StructType, path: String,
                                     queryId: String)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new CommitSinkBatchWrite(schema, path, queryId, truncateFirst)
    override def description(): String =
      s"CommitSink(path=$path, truncate=$truncateFirst)"
  }
}

private[graft] case class CommitMsg(tempPath: String, partitionId: Int,
                                    taskId: Long, rows: Long)
    extends WriterCommitMessage

private[graft] class CommitSinkBatchWrite(
    schema: StructType, path: String,
    queryId: String, truncateFirst: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new CommitSinkWriterFactory(schema, path, queryId)

  private def staleDir: Path = Paths.get(path, "_temporary", s"$queryId.stale")

  /** The commit, ordered so that a failure at ANY step preserves every
    * byte of the previously committed generation (in place or staged —
    * never deleted before the commit point). Runs on the driver after
    * EVERY task has task-committed.
    *
    *  1. rename the new attempts' files in FIRST — their names carry
    *     the queryId, so they cannot collide with prior parts; a crash
    *     here leaves the prior generation (and its `_SUCCESS`) intact;
    *  2. truncate only: STAGE prior parts out to `_temporary/
    *     <queryId>.stale/` — a rename, reversible, never a delete; a
    *     crash here leaves every prior byte on disk and [[abort]] (or
    *     an operator, after a hard crash) can restore them;
    *  3. write `_SUCCESS` — the commit point — and only THEN reap the
    *     staging dir and this query's temp dir. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    var total = 0L
    messages.foreach { case CommitMsg(tmp, pid, tid, rows) =>
      CommitSinkFailpoints.fire(path, "rename-in")
      Files.move(Paths.get(tmp),
        dir.resolve(s"part-$queryId-$pid-$tid.csv"),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      total += rows
    }
    if (truncateFirst) {
      val stale = staleDir
      Files.createDirectories(stale)
      CommitSinkIO.listDir(dir)
        .filter { p =>
          val n = p.getFileName.toString
          n.startsWith("part-") && !n.startsWith(s"part-$queryId-")
        }
        .foreach { p =>
          CommitSinkFailpoints.fire(path, "stage-stale")
          Files.move(p, stale.resolve(p.getFileName),
            StandardCopyOption.ATOMIC_MOVE)
        }
    }
    CommitSinkFailpoints.fire(path, "success")
    Files.writeString(dir.resolve("_SUCCESS"), s"rows=$total\n")
    // past the commit point: the staged prior generation is garbage now
    sweepOwnTemp(reapStale = true)
  }

  /** Task failure beyond retry, or a throw from [[commit]] itself:
    * nothing of THIS query becomes (or stays) visible. Undoes a partial
    * commit — deletes this query's renamed-in parts, moves any staged
    * prior parts back into place — then sweeps only this query's temp
    * dirs; concurrent writers are untouched. The sweep NEVER deletes
    * staged contents here: if a restore move itself failed (disk-full,
    * transient IO), the part must stay staged on disk for operator
    * recovery — reaping it would destroy the committed byte the whole
    * staging design exists to preserve. The stale dir is removed only
    * via the empty-directory delete, which fails harmlessly while
    * anything is still staged. */
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    CommitSinkIO.listDir(dir)
      .filter(_.getFileName.toString.startsWith(s"part-$queryId-"))
      .foreach(p =>
        try Files.deleteIfExists(p) catch { case _: Throwable => () })
    CommitSinkIO.listDir(staleDir).foreach(p =>
      try Files.move(p, dir.resolve(p.getFileName),
        StandardCopyOption.ATOMIC_MOVE)
      catch { case _: Throwable => () })
    sweepOwnTemp(reapStale = false)
  }

  /** `reapStale = true` only PAST the commit point, where the staged
    * prior generation is superseded garbage; everywhere else staged
    * files are the sole copy of committed bytes and only the
    * empty-directory delete may touch the stale dir. */
  private def sweepOwnTemp(reapStale: Boolean): Unit = {
    val own = Paths.get(path, "_temporary", queryId)
    CommitSinkIO.listDir(own).foreach(p =>
      try Files.deleteIfExists(p) catch { case _: Throwable => () })
    try Files.deleteIfExists(own) catch { case _: Throwable => () }
    if (reapStale)
      CommitSinkIO.listDir(staleDir).foreach(p =>
        try Files.deleteIfExists(p) catch { case _: Throwable => () })
    try Files.deleteIfExists(staleDir) catch { case _: Throwable => () }
    // reap the shared parent only when empty (another query may be live)
    try Files.deleteIfExists(Paths.get(path, "_temporary"))
    catch { case _: Throwable => () }
  }
}

private class CommitSinkWriterFactory(schema: StructType, path: String,
                                      queryId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new CommitSinkWriter(schema, path, queryId, partitionId, taskId)
}

private class CommitSinkWriter(schema: StructType, path: String,
                               queryId: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val tempDir: Path = {
    val d = Paths.get(path, "_temporary", queryId)
    Files.createDirectories(d)
    d
  }
  private val tempFile: Path = tempDir.resolve(s"$partitionId-$taskId.csv")
  private val out = Files.newBufferedWriter(tempFile)
  private var rows = 0L

  /** Spark-reader-default-compatible field encoding: null → unquoted
    * empty; empty string → quoted empty; strings carrying , " \n \r →
    * RFC-quoted with backslash-escaped backslashes and quotes. */
  private def encode(record: InternalRow, i: Int): String = {
    if (record.isNullAt(i)) return ""
    schema.fields(i).dataType match {
      case StringType =>
        val s = record.getUTF8String(i).toString
        if (s.isEmpty) "\"\""
        else if (s.exists(c => c == ',' || c == '"' || c == '\n' ||
                               c == '\r' || c == '\\'))
          "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
        else s
      case LongType    => record.getLong(i).toString
      case IntegerType => record.getInt(i).toString
      case DoubleType  => record.getDouble(i).toString
      case dt => throw new IllegalArgumentException(
        s"CommitSink does not encode $dt")
    }
  }

  override def write(record: InternalRow): Unit = {
    out.write(schema.fields.indices.map(encode(record, _)).mkString(","))
    out.newLine()
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    CommitMsg(tempFile.toString, partitionId, taskId, rows)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(tempFile); ()
  }

  override def close(): Unit = ()
}
