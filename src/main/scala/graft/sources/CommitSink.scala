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
  * to a commit-time clear of prior parts, so a restated write replaces
  * rather than doubles.
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

private case class CommitMsg(tempPath: String, partitionId: Int,
                             taskId: Long, rows: Long)
    extends WriterCommitMessage

private class CommitSinkBatchWrite(schema: StructType, path: String,
                                   queryId: String, truncateFirst: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new CommitSinkWriterFactory(schema, path, queryId)

  /** The all-or-nothing instant: clear prior parts if truncating, then
    * rename exactly the committed attempts into place. Runs on the
    * driver after EVERY task has task-committed. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    if (truncateFirst) {
      CommitSinkIO.listDir(dir)
        .filter(_.getFileName.toString.startsWith("part-"))
        .foreach(Files.delete)
    }
    var total = 0L
    messages.foreach { case CommitMsg(tmp, pid, tid, rows) =>
      Files.move(Paths.get(tmp),
        dir.resolve(s"part-$queryId-$pid-$tid.csv"),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      total += rows
    }
    Files.writeString(dir.resolve("_SUCCESS"), s"rows=$total\n")
    sweepOwnTemp()
  }

  /** Any task failed beyond retry: nothing becomes visible. Only THIS
    * query's temp subdir is swept — concurrent writers are untouched. */
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    sweepOwnTemp()

  private def sweepOwnTemp(): Unit = {
    val own = Paths.get(path, "_temporary", queryId)
    CommitSinkIO.listDir(own).foreach(p =>
      try Files.deleteIfExists(p) catch { case _: Throwable => () })
    try Files.deleteIfExists(own) catch { case _: Throwable => () }
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
