package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar-function layer F1–F9 (SURVEY.md §2.7) — all Spark built-ins, all
  * whole-stage-codegen'd; no UDFs anywhere (the reference defines none
  * either, `/root/reference/spark-streaming.py:4`).
  */
object Scalars {

  /** F1: string concat — full name `first + " " + last`
    * (`/root/reference/main.py:79,97`), street `number + " " + name`
    * (`main.py:103`). */
  def tag(df: DataFrame, idCol: String, a: String, b: String): DataFrame =
    df.select(col(idCol), concat_ws("|", col(a), col(b)).as("tag"))

  /** F2: modulo list indexing — party assignment
    * `parties[candidate_number % total_parties]`
    * (`/root/reference/main.py:80`, list `main.py:8`). */
  def pickByMod(key: Column, choices: Seq[String]): Column =
    element_at(array(choices.map(lit): _*),
               (pmod(key, lit(choices.size)) + 1).cast("int"))

  /** F3: parity pick — `'female' if i % 2 == 1 else 'male'`
    * (`/root/reference/main.py:71`). */
  def parityPick(key: Column, odd: String, even: String): Column =
    when(pmod(key, lit(2)) === 1, odd).otherwise(even)

  /** F4: timestamp formatting `'%Y-%m-%d %H:%M:%S'`
    * (`/root/reference/voting.py:101`). The true timestamp is kept for
    * watermarking; formatting is presentation-only. */
  def formatTime(ts: Column, pattern: String = "yyyy-MM-dd HH:mm:ss"): Column =
    date_format(ts, pattern)

  /** F5: JSON serialize (`json.dumps`, `/root/reference/main.py:217`) —
    * decode side lives in [[Decode]]. */
  def toJsonCol(cols: Column*): Column = to_json(struct(cols: _*))

  /** F9: string interpolation for log parity
    * (`/root/reference/main.py:224`, `voting.py:110`). */
  def formatLog(fmt: String, cols: Column*): Column =
    format_string(fmt, cols: _*)
}
