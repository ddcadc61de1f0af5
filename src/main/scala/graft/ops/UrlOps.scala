package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization and domain analytics — the curation pass a
  * web-crawl corpus runs BEFORE content dedup: a page fetched as
  * `HTTPS://WWW.Site.COM:443/a/?utm_source=feed#top` and again as
  * `https://site.com/a` is one document, and catching that at the
  * URL level costs a string pass instead of a content-dedup shuffle.
  * All pure codegen'd Column expressions (no UDFs), restricted to the
  * regex subset where Java (Spark) and RE2 (DuckDB) agree exactly —
  * same portability contract as [[TextOps]].
  *
  * Canonicalization rules (each a documented, oracle-checked step):
  * strip fragment; lowercase scheme and host (path stays
  * case-sensitive per RFC 3986); drop a leading `www.`; drop the
  * scheme's default port (443/https, 80/http — others kept); strip
  * trailing slashes from the path; drop tracking parameters
  * (`utm_*`, `ref`, `fbclid`, `gclid`) while preserving the order of
  * the rest. Domain is the registrable-domain approximation: the
  * last two host labels (a public-suffix list is a data dependency,
  * not an algorithm change).
  */
object UrlOps {

  /** Pattern constants — public so the oracle twin interpolates the
    * SAME strings (single source of truth).
    */
  val UrlSchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  val UrlHostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  val UrlPathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  val UrlQueryRe = "\\?([^#]*)"
  val TrackingParamRe = "^(utm_[a-z0-9]+|ref|fbclid|gclid)="
  val DomainRe = "([a-z0-9-]+\\.[a-z0-9-]+)$"

  /** Canonical form of a URL column (see object scaladoc for rules). */
  def normalizeUrl(url: Column): Column = urlParts(url)._1

  /** Registrable domain (last two labels of the canonical host). */
  def urlDomain(url: Column): Column = urlParts(url)._2

  private def urlParts(url: Column): (Column, Column) = {
    // trim FIRST: the scheme anchor must see the real start of the
    // URL, or a padded " https://…" would skip canonicalization and
    // never dedup against its clean form
    val wk = regexp_replace(trim(url), "#.*", "")
    val scheme = lower(regexp_extract(wk, UrlSchemeRe, 1))
    val noWww = regexp_replace(lower(regexp_extract(wk, UrlHostRe, 1)), "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .otherwise(noWww)
    val path = regexp_replace(regexp_extract(wk, UrlPathRe, 1), "/+$", "")
    val params = filter(
      split(regexp_extract(wk, UrlQueryRe, 1), "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe))
    val qn = array_join(params, "&")
    val canon = concat(
      scheme, lit("://"), host, path,
      when(qn === "", lit("")).otherwise(concat(lit("?"), qn)))
    // contract: canonicalization applies to absolute scheme://host
    // URLs; anything else (relative refs, mailto:, garbage) passes
    // through trimmed-as-is rather than collapsing to "://…" — a
    // crawler's frontier dedup must never merge distinct junk
    val norm = when(scheme === "", trim(url)).otherwise(canon)
    // domain comes from the HOSTNAME: a kept non-default port
    // (":8080") must not defeat the registrable-domain match
    val hostname = regexp_replace(host, ":[0-9]+$", "")
    (norm, when(scheme === "", lit("")).otherwise(regexp_extract(hostname, DomainRe, 1)))
  }

  /** (doc_id, url_norm, domain) — one narrow codegen'd pass. */
  def normalizeUrls(withUrls: DataFrame): DataFrame =
    withUrls.select(
      col("doc_id"),
      normalizeUrl(col("url")).as("url_norm"),
      urlDomain(col("url")).as("domain"))

  /** URL-level dedup: canonical (minimum) doc_id per normalized URL,
    * `is_dup` marks refetches. Same shuffle discipline as
    * [[Dedup.exactDedup]] — the groupBy carries the canonical string
    * + id, partial-aggregated, and the join back is AQE-splittable
    * when one URL was crawled a million times.
    */
  def urlDedup(withUrls: DataFrame): DataFrame = {
    val n = normalizeUrls(withUrls)
    val canon = n.groupBy("url_norm").agg(min("doc_id").as("canonical_id"))
    n.join(canon, "url_norm")
      .select(
        col("doc_id"), col("url_norm"), col("domain"), col("canonical_id"),
        (col("doc_id") =!= col("canonical_id")).as("is_dup"))
      .orderBy("doc_id")
  }

  /** Per-domain crawl stats — the spam-domain / coverage report:
    * document count vs unique canonical URLs (a big gap means heavy
    * refetching or URL-parameter churn). One partial-agg shuffle.
    */
  def domainStats(withUrls: DataFrame): DataFrame =
    normalizeUrls(withUrls)
      .groupBy("domain")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct("url_norm").as("n_unique_urls"))
      .orderBy("domain")

  /** PER-DOMAIN quality report + blocklist decision — the curation
    * verdict that operates at the granularity a crawler acts on:
    * documents carry page-level [[TextOps.qualityScores]], but
    * allow/deny lists are per DOMAIN. Mean quality is an exact
    * integer sum of the 4-dp-quantized page scores (order-free) with
    * one deferred division; `blocked` is the pure-integer comparison
    * sum < minQuality·n (no float threshold arithmetic), so the
    * decision bit is engine-exact. One doc-keyed join + one tiny
    * per-domain aggregate.
    */
  def domainQualityReport(documents: DataFrame, withUrls: DataFrame,
      minQuality: Double = 0.7): DataFrame = {
    val q = TextOps.qualityScores(documents)
      .select(col("doc_id"),
        floor(col("quality_score") * 10000.0 + 0.5).cast("long").as("q4i"))
    normalizeUrls(withUrls).select("doc_id", "domain")
      .join(q, "doc_id")
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum("q4i").as("sq"), min("q4i").as("minq"))
      .select(col("domain"), col("n_docs"),
        Exact.quant6(col("sq").cast("double") / lit(10000.0) / col("n_docs"))
          .as("mean_quality"),
        (col("minq").cast("double") / lit(10000.0)).as("min_quality"),
        (col("sq") < lit(math.round(minQuality * 10000)) * col("n_docs"))
          .as("blocked"))
      .orderBy("domain")
  }

  /** POLITENESS crawl schedule: distinct canonical URLs per domain,
    * each assigned a dense slot by a deterministic (url_norm) rank —
    * with one fetch per domain per time slot (the crawl-politeness
    * invariant), `slot` IS a URL's scheduled fetch position, and
    * max(slot) per domain is that domain's crawl duration. The
    * frontier planner a polite crawler feeds its fetchers from.
    *
    * Scale shape: canonicalization is a narrow pass; the distinct and
    * the rank window are both domain-partitioned — a domain's queue
    * ranks in its own task, and skewed mega-domains are exactly the
    * ones whose schedule MUST serialize anyway.
    */
  def crawlSchedule(withUrls: DataFrame): DataFrame = {
    val w = Window.partitionBy("domain").orderBy("url_norm")
    normalizeUrls(withUrls)
      .select("domain", "url_norm").distinct()
      .withColumn("slot", row_number().over(w).cast("long"))
      .orderBy("domain", "slot")
  }

  /** Planted-URL corpus for the gate: the fixture tables carry no URL
    * column, so a deterministic raw URL exercising every
    * canonicalization rule (mixed-case scheme/host, www, default
    * port, trailing slash, tracking params interleaved with real
    * ones, fragment) is derived from doc_id in-query — the s38/t67
    * precedent. The normalized key has period lcm(20,50,25) = 100,
    * so 500 fixture docs yield 5 crawls per canonical URL and the
    * dedup row is non-vacuous at every SF.
    */
  def plantUrls(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      concat(
        when(col("doc_id") % 2 === 0, lit("HTTPS://WWW.News.Site")).otherwise(lit("HTTP://WWW.News.Site")),
        (col("doc_id") % 20).cast("string"),
        when(col("doc_id") % 2 === 0, lit(".COM:443")).otherwise(lit(".NET:80")),
        lit("/Article/Item"), (col("doc_id") % 50).cast("string"),
        lit("/?utm_source=feed&id="), (col("doc_id") % 25).cast("string"),
        lit("&ref=abc&utm_campaign=x#sec"), (col("doc_id") % 5).cast("string")).as("url"))
}
