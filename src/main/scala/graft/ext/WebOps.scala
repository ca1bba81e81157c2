package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Web-corpus preprocessing ([X] tier): the two steps every
  * crawl-derived training pipeline runs before the text ops in
  * [[TextOps]] see a document — HTML-to-text extraction and URL
  * canonicalization (the dedup key for crawl snapshots).
  *
  * Both are pure per-row scalar pipelines — zero shuffle, fully inside
  * whole-stage codegen — and both are written against the regex subset
  * Java and RE2 share (inline `(?is)` flags, non-greedy `.*?`, NO
  * backreferences — RE2 has none, and NO bare `\s`: Java's `\s`
  * includes vertical tab `\x0B` while RE2's does not, so whitespace is
  * always the explicit class `[ \t\n\x0B\f\r]`), so the DuckDB oracle
  * replays the exact same patterns rather than approximating them.
  *
  * Fixtures are deterministic injections over the documents table (the
  * [[PiiOps.withInjectedPii]] discipline): the oracle re-derives the
  * injected HTML/URLs from doc_id + text and must reproduce the
  * extraction byte-for-byte.
  */
object WebOps {

  /** Deterministic HTML wrapper: head noise (script + style blocks),
    * an entity-bearing heading, the document text in a paragraph, and
    * a trailing script — the shapes an extractor must drop (block
    * contents) vs unescape (entities) vs keep (text). */
  def withInjectedHtml(docs: DataFrame): DataFrame =
    docs.withColumn("html", concat(
      lit("<html><head><script type=\"text/javascript\">var x = 1 < 2;</script>"),
      lit("<style>.a { color: red; }</style></head><body><h1>Doc &amp; &lt;"),
      col("doc_id"), lit("&gt;</h1><p>"), col("text"),
      lit("</p><script>track("), col("doc_id"),
      lit(");</script></body></html>")))

  /** HTML → text: drop script/style WITH their contents (two passes —
    * RE2 has no backreferences, so no `</\1>` trick), strip remaining
    * tags, unescape the five core entities (amp LAST, so `&amp;lt;`
    * stays `&lt;` — the standard double-escape rule), collapse
    * whitespace. */
  def htmlExtract(docs: DataFrame): DataFrame =
    withInjectedHtml(docs)
      .withColumn("t", regexp_replace(col("html"),
        lit("(?is)<script[^>]*>.*?</script>"), lit(" ")))
      .withColumn("t", regexp_replace(col("t"),
        lit("(?is)<style[^>]*>.*?</style>"), lit(" ")))
      .withColumn("t", regexp_replace(col("t"), lit("<[^>]+>"), lit(" ")))
      .withColumn("t", regexp_replace(col("t"), lit("&lt;"), lit("<")))
      .withColumn("t", regexp_replace(col("t"), lit("&gt;"), lit(">")))
      .withColumn("t", regexp_replace(col("t"), lit("&quot;"), lit("\"")))
      .withColumn("t", regexp_replace(col("t"), lit("&#39;"), lit("'")))
      .withColumn("t", regexp_replace(col("t"), lit("&amp;"), lit("&")))
      .withColumn("t", trim(regexp_replace(col("t"),
        lit("[ \\t\\n\\x0B\\f\\r]+"), lit(" "))))
      .select(col("doc_id"), col("t").as("clean_text"))
      .orderBy("doc_id")

  /** Deterministic crawl-shaped URLs: mixed-case scheme/host, www
    * prefix, default and non-default ports CROSSED with both schemes
    * (doc_id mod 4: HTTP:80 and HTTPS:443 are defaults to strip;
    * HTTP:443 and HTTPS:80 are real non-defaults to keep — the cross is
    * what makes a scheme-blind port rule go red), optional trailing
    * slash, tracking params out of order, optional fragment. */
  def withInjectedUrls(docs: DataFrame): DataFrame =
    docs.withColumn("url", concat(
      when(pmod(col("doc_id"), lit(2)) === 0, lit("HTTP"))
        .otherwise(lit("HTTPS")),
      lit("://WWW.Site"), pmod(col("doc_id"), lit(7)), lit(".COM"),
      when(pmod(col("doc_id"), lit(4)).isin(0, 3), lit(":80"))
        .otherwise(lit(":443")),
      lit("/path/"), col("doc_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit("/")).otherwise(lit("")),
      lit("?utm_source=feed&b="), pmod(col("doc_id"), lit(5)), lit("&a=1"),
      when(pmod(col("doc_id"), lit(4)) === 0,
        concat(lit("#sec"), col("doc_id"))).otherwise(lit(""))))

  /** Per-domain document CAP — the crawl-diversity gate every
    * C4/RefinedWeb-style pipeline runs after canonicalization: a
    * handful of mega-domains otherwise dominate the corpus, so each
    * registered domain keeps only its `k` highest-quality documents
    * (quality proxy here: `n_chars`, ties to the smaller doc_id — a
    * deterministic, oracle-replayable key). The cap runs on the
    * bounded-heap [[graft.functions.TopKAggregator]], NOT a rank
    * window: per domain the state is O(k) and partials merge map-side,
    * so a mega-domain costs k-sized buffers per task — the rank-window
    * alternative sorts every one of its documents through a single
    * partition, the exact plan that dies on a 100 TB crawl where one
    * domain can be 1% of the corpus. Domains come from the injected
    * crawl URLs ([[withInjectedUrls]]): lowercase the authority, strip
    * `www.` and the port. */
  def domainCap(docs: DataFrame, k: Int = 50): DataFrame = {
    val topk = org.apache.spark.sql.functions.udaf(
      new graft.functions.TopKAggregator(k),
      org.apache.spark.sql.Encoders.product[graft.functions.TopKItem])
    withInjectedUrls(docs)
      .withColumn("domain", regexp_replace(
        lower(regexp_extract(col("url"), "^[A-Za-z]+://([^/:?#]+)", 1)),
        lit("^www\\."), lit("")))
      .groupBy("domain")
      .agg(topk(col("n_chars").cast("double"), col("doc_id")).as("kept_ids"))
      .orderBy("domain")
  }

  /** URL canonicalization — the crawl-dedup key: drop the fragment,
    * lowercase scheme and authority, strip the `www.` prefix and the
    * SCHEME'S OWN default port (`:80` only for http, `:443` only for
    * https — a non-default port is identity-bearing and must survive),
    * strip one trailing path slash, drop `utm_*` tracking params, sort
    * the surviving query params. Every step is a shared-subset regex or
    * an array op both engines replay. */
  def urlCanonicalize(docs: DataFrame): DataFrame =
    withInjectedUrls(docs)
      .withColumn("u", regexp_replace(col("url"), lit("#.*$"), lit("")))
      .withColumn("scheme", lower(regexp_extract(col("u"),
        "^([A-Za-z]+)://", 1)))
      .withColumn("auth", lower(regexp_extract(col("u"),
        "^[A-Za-z]+://([^/?#]+)", 1)))
      .withColumn("auth", regexp_replace(col("auth"), lit("^www\\."), lit("")))
      .withColumn("auth",
        when(col("scheme") === "http",
          regexp_replace(col("auth"), lit(":80$"), lit("")))
        .when(col("scheme") === "https",
          regexp_replace(col("auth"), lit(":443$"), lit("")))
        .otherwise(col("auth")))
      .withColumn("path", regexp_extract(col("u"),
        "^[A-Za-z]+://[^/?#]+([^?#]*)", 1))
      .withColumn("path", regexp_replace(col("path"), lit("/$"), lit("")))
      .withColumn("qs", regexp_extract(col("u"), "\\?([^#]*)", 1))
      .withColumn("qkeep", expr(
        """array_sort(filter(split(qs, '&'),
             p -> p <> '' AND NOT p RLIKE '^utm_'))"""))
      .select(col("doc_id"),
        concat(col("scheme"), lit("://"), col("auth"), col("path"),
          when(size(col("qkeep")) > 0,
            concat(lit("?"), concat_ws("&", col("qkeep"))))
          .otherwise(lit(""))).as("canonical_url"))
      .orderBy("doc_id")
}
