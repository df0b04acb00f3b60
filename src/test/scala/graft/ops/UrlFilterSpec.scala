package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Edge semantics of the L295 URL/domain gate the corpus fixture never
  * exercises: host extraction shapes, per-rule firing, and the
  * domain-reputation rollup identities. */
class UrlFilterSpec extends SparkSuite {
  import spark.implicits._

  test("domainOf: scheme/userinfo/port/path/query stripped, lowercased, " +
      "leading www. dropped; a non-URL string yields the empty domain") {
    val got = Seq(
      "https://www.Example.COM/path?q=1",
      "http://user:pw@Sub.Host.org:8080/x/y",
      "https://plain.net",
      "ftp://files.example.org/pub",
      "not a url at all")
      .toDF("url")
      .select(UrlFilter.domainOf(col("url")))
      .as[String].collect().toSeq
    assert(got == Seq("example.com", "sub.host.org", "plain.net",
      "files.example.org", ""))
  }

  test("gate: each rule fires on exactly its shape and keep_url is the " +
      "conjunction of all rules passing") {
    val rules = Seq(
      UrlFilter.DomainBlocklist("bl", Seq("bad.com")),
      UrlFilter.DomainSuffix("sfx", Seq(".ads.net")),
      UrlFilter.UrlPattern("trk", "/tracker/"))
    val df = Seq(
      (1L, "https://good.com/page/1"),
      (2L, "https://bad.com/page/2"),
      (3L, "https://x.ads.net/page/3"),
      (4L, "https://good.com/tracker/click"),
      (5L, "https://www.bad.com/page/5")) // www. strip reaches the blocklist
      .toDF("id", "url")
    val got = UrlFilter.gate(df, "url", rules)
      .select("id", "domain", "keep_url")
      .as[(Long, String, Boolean)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "good.com", true),
      (2L, "bad.com", false),
      (3L, "x.ads.net", false),
      (4L, "good.com", false),
      (5L, "bad.com", false)))
  }

  test("domainStats: hand-checked rollup — counts, token mass, and the " +
      "6-dp integer-space rates") {
    val perDoc = Seq(
      ("d1.com", 10L, false, false, true),
      ("d1.com", 20L, true, true, false),
      ("d2.com", 5L, false, false, false))
      .toDF("domain", "ntok", "blocked", "isdup", "q")
    val got = UrlFilter.domainStats(perDoc, "domain", col("ntok"),
        col("blocked"), col("isdup"), col("q"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(got("d1.com") == ((2L, 30L, 1L, 1L, 0.5, 0.5)))
    assert(got("d2.com") == ((1L, 5L, 0L, 0L, 0.0, 0.0)))
  }

  test("domainStatsIncremental: fold == rebuild — including a STANDING " +
      "doc that becomes a duplicate only when the batch delivers its " +
      "twin (dup is not abelian; the hash index catches it)") {
    def perDoc(rows: Seq[(String, Long, Boolean, Boolean, String)]) =
      rows.toDF("domain", "ntok", "blocked", "q", "h")
    // standing: hA unique so far (will become a dup), hB already a
    // standing-internal dup pair on d2
    val standing = perDoc(Seq(
      ("d1.com", 10L, false, true, "hA"),
      ("d2.com", 7L, true, false, "hB"),
      ("d2.com", 7L, false, false, "hB")))
    // batch: delivers hA's twin on ANOTHER domain + a fresh value
    val batch = perDoc(Seq(
      ("d3.com", 4L, false, true, "hA"),
      ("d1.com", 9L, false, false, "hC")))
    val standingStats = standing.groupBy("domain").agg(
      count(lit(1)).as("n_docs"), sum("ntok").as("n_tokens"),
      sum(when(col("blocked"), 1L).otherwise(0L)).as("n_blocked"),
      sum(when(col("q"), 1L).otherwise(0L)).as("n_quality"))
    val standingIndex = standing.groupBy("domain", "h")
      .agg(count(lit(1)).as("c"))
    val folded = UrlFilter.domainStatsIncremental(standingStats,
        standingIndex, batch, "domain", col("ntok"), col("blocked"),
        col("q"), "h")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))).toMap
    // rebuild: domainStats over standing ∪ batch with the corpus-wide
    // dup flag derived from hash counts
    val all = standing.unionByName(batch)
    val cnt = all.groupBy(col("h").as("h2")).agg(count(lit(1)).as("tc"))
    val rebuilt = UrlFilter.domainStats(
        all.join(cnt, col("h") === col("h2")), "domain", col("ntok"),
        col("blocked"), (col("tc") >= 2), col("q"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(folded == rebuilt, s"fold diverged:\n$folded\nvs\n$rebuilt")
    // the cross-boundary semantics, explicitly: d1's standing hA doc is
    // now a dup (its twin arrived on d3), so BOTH domains count one
    assert(folded("d1.com")._4 == 1L, "standing doc must BECOME a dup")
    assert(folded("d3.com")._4 == 1L, "the arriving twin is a dup too")
    assert(folded("d2.com")._4 == 2L, "standing-internal dups persist")
  }
}
