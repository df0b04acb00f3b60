package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-corpus governance: a
  * rule-driven regex scrubber in the same ADT-interpreter style as the
  * DQ rule engine (Quality/RuleYaml). The reference pipeline has no
  * privacy layer — this extends the engine toward the compliance pass a
  * 100 TB training-set build runs before anything ships to a trainer.
  *
  * Everything compiles to codegen'd `regexp_count` / `regexp_replace`
  * expressions — no UDFs, per-row work O(len · rules), no shuffle at
  * all: detection and rewrite are scan-level projections, so the pass
  * pipelines with whatever filter/write follows it. Patterns stick to
  * the regex subset Java (Spark) and RE2 (DuckDB oracle) agree on:
  * character classes, bounded counts, no backrefs/lookaround.
  */
object Privacy {

  /** One redaction rule: leftmost-non-overlapping matches of `pattern`
    * are counted and rewritten to `replacement`. `name` keys the count
    * column (`n_<name>s`). */
  final case class Rule(name: String, pattern: String, replacement: String)

  /** Email addresses (simplified RFC shape, lowercase input). */
  val Email: Rule =
    Rule("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>")

  /** Dashed phone numbers in the 2-3-3-4 digit-group shape. */
  val Phone: Rule =
    Rule("phone", "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>")

  /** Long digit runs (account / national-id lookalikes). Apply AFTER
    * Phone — rule order is part of the contract, later rules see
    * earlier rules' replacements. */
  val DigitRun: Rule = Rule("digit_run", "[0-9]{6,}", "<ID>")

  def matchCount(text: Column, rule: Rule): Column =
    regexp_count(text, lit(rule.pattern))

  /** Apply all rules in order; each rule rewrites the previous rule's
    * output, so overlapping patterns resolve by list position. */
  def redact(text: Column, rules: Seq[Rule]): Column =
    rules.foldLeft(text)((c, r) => regexp_replace(c, r.pattern, r.replacement))

  /** Scan `textCol` for every rule: appends one `n_<name>s` count per
    * rule (counted on the ORIGINAL text, so counts are independent of
    * rule order) and `redacted` with all rules applied in order. */
  def scan(df: DataFrame, textCol: String, rules: Seq[Rule]): DataFrame = {
    // withColumn silently replaces same-named columns — refuse rather
    // than destroy caller data (rule names drive the output names, so a
    // collision is a caller bug worth a loud message)
    (rules.map(r => s"n_${r.name}s") :+ "redacted").foreach(c =>
      require(!df.columns.contains(c),
        s"Privacy.scan writes column '$c' but the input already has one"))
    val counted = rules.foldLeft(df) { (acc, r) =>
      acc.withColumn(s"n_${r.name}s", matchCount(col(textCol), r).cast("long"))
    }
    counted.withColumn("redacted", redact(col(textCol), rules))
  }

  /** Dashed 4-4-4-4 payment-card CANDIDATE shape. A digit shape alone
    * over-redacts (order ids, timestamps); pair with [[luhnValid]] to
    * confirm — the ISO/IEC 7812 checksum every real PAN carries. */
  val CreditCardRe = "[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}"

  /** Luhn (mod-10) checksum over a dashed-or-plain 16-digit candidate:
    * from the right, every second digit doubles (minus 9 when > 9); the
    * total must divide by 10. For a 16-digit PAN the doubled positions
    * are the odd LEFT indices, so the whole check is one sequential
    * integer fold over the candidate — no UDF, engine-exact, and cheap
    * enough to run inside a scan projection. */
  def luhnValid(cand: Column): Column = {
    val d = translate(cand, "-", "")
    val total = aggregate(
      transform(sequence(lit(1), lit(16)), i => {
        val dig = (ascii(d.substr(i, lit(1))) - 48).cast("long")
        when(i % 2 === 1,
          when(dig * 2 > 9, dig * 2 - 9).otherwise(dig * 2)).otherwise(dig)
      }),
      lit(0L), _ + _)
    total % 10 === 0
  }

  /** Checksum-validated card scan: counts candidate PANs
    * ([[CreditCardRe]]), counts the Luhn-valid subset, and redacts ONLY
    * the valid ones (an invalid candidate is an order id, not PII —
    * redacting it destroys data for no privacy gain). Appends
    * `n_cc_candidates`, `n_cc_valid`, `redacted`. Scan-level
    * projection: extraction, validation, and the per-candidate rewrite
    * fold all run inside the row. */
  def ccScan(df: DataFrame, textCol: String): DataFrame = {
    Seq("n_cc_candidates", "n_cc_valid", "redacted").foreach(c =>
      require(!df.columns.contains(c),
        s"Privacy.ccScan writes column '$c' but the input already has one"))
    val cands = regexp_extract_all(col(textCol), lit(CreditCardRe), lit(0))
    val valid = filter(cands, c => luhnValid(c))
    df.withColumn("n_cc_candidates", size(cands).cast("long"))
      .withColumn("n_cc_valid", size(valid).cast("long"))
      .withColumn("redacted",
        aggregate(valid, col(textCol),
          (acc, c) => call_function("replace", acc, c, lit("<CC>"))))
  }

  /** k-anonymity / l-diversity audit: one row per quasi-identifier
    * combination with its population `n`, the distinct count of the
    * sensitive attribute `n_sensitive`, and the two release gates —
    * `k_anonymous` (every individual hides among ≥ k records) and
    * `l_diverse` (the group doesn't give the sensitive value away by
    * uniformity). One hash aggregate over the QID key; output is
    * O(|QID combinations|), not O(rows). */
  def kAnonymityAudit(df: DataFrame, qids: Seq[String], sensitive: Column,
      k: Int, l: Int): DataFrame =
    df.groupBy(qids.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(sensitive).as("n_sensitive"))
      .withColumn("k_anonymous", col("n") >= k)
      .withColumn("l_diverse", col("n_sensitive") >= l)

  /** Suppression pass: rows whose QID combination has fewer than `k`
    * members get every QID column masked (generalization to `mask`),
    * everything else passes through. Group size comes from a
    * whole-partition window over the QID key — ONE shuffle, no audit
    * join back, no second scan. QID columns come back as strings (the
    * mask sentinel must inhabit the type). */
  def suppress(df: DataFrame, qids: Seq[String], k: Int,
      mask: String = "*"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = count(lit(1)).over(Window.partitionBy(qids.map(col): _*))
    qids.foldLeft(df.withColumn("_qid_n", n)) { (acc, q) =>
      acc.withColumn(q,
        when(col("_qid_n") < k, lit(mask)).otherwise(col(q).cast("string")))
    }.drop("_qid_n")
  }

  /** Gazetteer (deny-list) redaction: terms live in a TABLE maintained
    * elsewhere (the realistic shape — legal's name list, a competitor
    * glossary — versioned independently of code), matched as whole
    * lowercase-alphanumeric words against the token stream via ONE
    * broadcast join, then each doc rewrites only its own matched terms
    * (a bounded per-row fold, sorted for determinism — not a
    * |gazetteer|-term regex applied to every doc). Unlike the L72
    * regex rules (shape-based, code-deployed), the deny list updates
    * without a release.
    *
    * Contract: gazetteer terms must be lowercase alphanumeric (they are
    * spliced into a word-boundary regex); occurrences count ALL hits,
    * redaction rewrites every occurrence of each matched term. Appends
    * (n_gazetteer_hits, n_gazetteer_terms, redacted). Scale shape: one
    * broadcast hash join on the exploded token stream + one per-doc
    * rollup — the corpus shuffles once on its own id. */
  def gazetteerRedact(df: DataFrame, idCol: String, textCol: String,
      gazetteer: DataFrame, termCol: String,
      replacement: String = "<NAME>"): DataFrame = {
    Seq("n_gazetteer_hits", "n_gazetteer_terms", "redacted").foreach(c =>
      require(!df.columns.contains(c),
        s"Privacy.gazetteerRedact writes column '$c' but the input already has one"))
    val hits = df
      .select(col(idCol), explode(Text.tokens(col(textCol))).as("_tok"))
      .join(broadcast(gazetteer.select(col(termCol).as("_tok"))), "_tok")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_gazetteer_hits"),
        array_sort(collect_set(col("_tok"))).as("_terms"))
    df.join(hits, Seq(idCol), "left")
      .withColumn("n_gazetteer_hits",
        coalesce(col("n_gazetteer_hits"), lit(0L)))
      .withColumn("_terms",
        coalesce(col("_terms"), array().cast("array<string>")))
      .withColumn("n_gazetteer_terms", size(col("_terms")).cast("long"))
      .withColumn("redacted",
        aggregate(col("_terms"), col(textCol), (acc, t) =>
          regexp_replace(acc, concat(lit("\\b"), t, lit("\\b")),
            lit(replacement))))
      .drop("_terms")
  }
}
