package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain-level curation — stage 0 of every published CommonCrawl
  * pipeline (CCNet runs its pipeline per-snapshot after a URL-level
  * pass; RefinedWeb §3.1 opens with "URL filtering" against a
  * 4.6M-domain blocklist + word-scored URLs; FineWeb gates on the
  * RefinedWeb-style blocklist before any text heuristic). The gates
  * run BEFORE tokenization because they are the cheapest predicates in
  * the whole funnel: pure scan-level string ops on the URL column —
  * no shuffle, no explode, fully codegen'd — so at 100 TB they prune
  * the corpus at parquet-scan cost while every later stage pays per
  * token.
  *
  * Same declare-rules-as-data discipline as the [[Quality]] ADT (the
  * reference's YAML rule catalog generalized by [[RuleYaml]]): a rule
  * list compiles to one boolean Column, so a production blocklist
  * swap is data, not code. Rules here are tiny literal lists compiled
  * INTO the predicate (a 4.6M-domain production blocklist would ride
  * as a broadcast semi-join on the domain key instead — same gate
  * semantics, one broadcast; [[domainStats]] is the table that DECIDES
  * those entries).
  */
object UrlFilter {

  /** Registered host of a URL: the authority without scheme/userinfo/
    * port/path, lowercased, leading "www." stripped — the key every
    * published blocklist and domain-reputation table uses. Pure
    * regexp projection (codegen'd); a string with no URL shape yields
    * the empty domain (never null), so downstream group keys stay
    * total. */
  def domainOf(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url, UrlFilter.HostPattern, 1)),
      "^www\\.", "")

  /** Shared host-extraction regex (group 1 = host). Mirrored verbatim
    * in the DuckDB oracles — Java and RE2 read this pattern
    * identically. */
  val HostPattern: String = "^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)"

  /** One URL-level curation rule; `violates` compiles to a boolean
    * Column over (url, domain) — true = the rule fires and the doc is
    * blocked. */
  sealed trait UrlRule {
    def name: String
    def violates(url: Column, domain: Column): Column
  }

  /** Exact-domain blocklist (the RefinedWeb/FineWeb curated list). */
  final case class DomainBlocklist(name: String, domains: Seq[String])
      extends UrlRule {
    require(domains.nonEmpty, "empty blocklist")
    def violates(url: Column, domain: Column): Column =
      domain.isInCollection(domains)
  }

  /** Domain-suffix blocklist (whole TLD-or-subtree bans, e.g. an ad
    * network's serving domains). */
  final case class DomainSuffix(name: String, suffixes: Seq[String])
      extends UrlRule {
    require(suffixes.nonEmpty, "empty suffix list")
    def violates(url: Column, domain: Column): Column =
      suffixes.map(s => domain.endsWith(s)).reduce(_ || _)
  }

  /** URL pattern rule (RefinedWeb's word-based URL scoring reduced to
    * its decision form: a path/query regex that marks spam shapes). */
  final case class UrlPattern(name: String, pattern: String)
      extends UrlRule {
    def violates(url: Column, domain: Column): Column = url.rlike(pattern)
  }

  /** Apply a rule set: adds `domain` ([[domainOf]]) and `keep_url`
    * (no rule fires). One projection — the scan-level stage-0 gate. */
  def gate(df: DataFrame, urlCol: String, rules: Seq[UrlRule]): DataFrame = {
    require(rules.nonEmpty, "empty rule set")
    val d = domainOf(col(urlCol))
    df.withColumn("domain", d)
      .withColumn("keep_url",
        !rules.map(_.violates(col(urlCol), col("domain"))).reduce(_ || _))
  }

  /** The per-domain reputation table that decides blocklist candidates
    * (the aggregate view RefinedWeb/FineWeb curators read): docs,
    * token mass, how many docs the URL gate already blocks, the
    * domain's exact-duplicate rate, and its quality-gate keep rate.
    * Caller supplies the per-doc verdict columns (from the REGISTERED
    * operators — exact-dup tags, Gopher keeps), this rolls them up:
    * ONE hash aggregate keyed on the domain, output bounded by
    * |domains| — metadata-sized next to any corpus. Rates present
    * 6-dp half-up (ExactRound, integer-space). */
  def domainStats(df: DataFrame, domainCol: String, nTokens: Column,
      isBlocked: Column, isDup: Column, passQuality: Column): DataFrame = {
    import graft.functions.ExactRound
    df.groupBy(col(domainCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(nTokens).as("n_tokens"),
        sum(when(isBlocked, 1L).otherwise(0L)).as("n_blocked"),
        sum(when(isDup, 1L).otherwise(0L)).as("n_dup"),
        sum(when(passQuality, 1L).otherwise(0L)).as("n_quality"))
      .select(col(domainCol), col("n_docs"), col("n_tokens"),
        col("n_blocked"), col("n_dup"),
        ExactRound.roundRatio(col("n_dup"), col("n_docs"), 6)
          .cast("double").as("dup_rate"),
        ExactRound.roundRatio(col("n_quality"), col("n_docs"), 6)
          .cast("double").as("quality_keep_rate"))
  }

  /** [[domainStats]] under continuous ingest (the q310/q312
    * maintenance discipline applied to the reputation table): when a
    * document batch arrives, nobody re-reads the standing corpus — the
    * fold consumes only the PERSISTED standing artifacts plus the
    * batch's own per-doc rows:
    *
    *   - `standingStats` (domain, n_docs, n_tokens, n_blocked,
    *     n_quality): the abelian sums — domain-count rows, they fold
    *     with the batch by plain addition;
    *   - `standingIndex` (domain, h, c): per-(domain, text-hash)
    *     standing doc counts — the hash-only value index (32-char md5,
    *     never text; the L291 index class) that makes the DUP column
    *     maintainable, because dup membership is NOT abelian: a
    *     standing doc BECOMES a duplicate the moment a batch delivers
    *     its twin, so per-domain dup counts must be re-derived from
    *     corpus-wide hash totals, never incremented;
    *   - `batch` (domainCol, hashCol + the verdict columns): the
    *     arriving per-doc rows.
    *
    * Fold: stats' = stats + batch sums (one union + hash aggregate);
    * index' = index + batch counts; n_dup(domain) = Σ over hashes with
    * corpus total ≥ 2 of that domain's count — one join keyed on the
    * hash. Row-for-row equal to [[domainStats]] rebuilt over
    * standing ∪ batch (the fold == rebuild contract the oracle pins).
    * Only hashes present in the batch can CHANGE dup membership, so a
    * delta implementation may restrict the tot-join to those hashes
    * and patch standing rows; this fold recomputes the (metadata-
    * sized) table wholesale — output is domain-count rows either way. */
  def domainStatsIncremental(standingStats: DataFrame,
      standingIndex: DataFrame, batch: DataFrame, domainCol: String,
      nTokens: Column, isBlocked: Column, passQuality: Column,
      hashCol: String): DataFrame = {
    import graft.functions.ExactRound
    val bStats = batch.groupBy(col(domainCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(nTokens).as("n_tokens"),
      sum(when(isBlocked, 1L).otherwise(0L)).as("n_blocked"),
      sum(when(passQuality, 1L).otherwise(0L)).as("n_quality"))
    val stats = standingStats.unionByName(bStats)
      .groupBy(col(domainCol)).agg(
        sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"),
        sum("n_blocked").as("n_blocked"), sum("n_quality").as("n_quality"))
    val bIdx = batch.groupBy(col(domainCol), col(hashCol))
      .agg(count(lit(1)).as("c"))
    val idx = standingIndex.unionByName(bIdx)
      .groupBy(col(domainCol), col(hashCol)).agg(sum("c").as("c"))
    val tot = idx.groupBy(col(hashCol)).agg(sum("c").as("tc"))
    val dup = idx.join(tot, hashCol).filter(col("tc") >= 2)
      .groupBy(col(domainCol)).agg(sum("c").as("n_dup"))
    stats.join(dup, Seq(domainCol), "left")
      .na.fill(0L, Seq("n_dup"))
      .select(col(domainCol), col("n_docs"), col("n_tokens"),
        col("n_blocked"), col("n_dup"),
        ExactRound.roundRatio(col("n_dup"), col("n_docs"), 6)
          .cast("double").as("dup_rate"),
        ExactRound.roundRatio(col("n_quality"), col("n_docs"), 6)
          .cast("double").as("quality_keep_rate"))
  }
}
