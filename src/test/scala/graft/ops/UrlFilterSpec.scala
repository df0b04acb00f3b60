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
}
