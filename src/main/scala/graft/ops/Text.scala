package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline surface: tokenizing,
  * shingling, deterministic string hashing, token counting, language-ID
  * heuristics and quality ratios. The reference pipeline has no text
  * layer — this extends the engine toward large-scale training-data
  * curation (builder brief), so every formula is chosen to be exactly
  * reproducible in ANSI-ish SQL (the DuckDB oracle): md5-prefix hashes,
  * sequential left-fold rolling hashes, integer ratios.
  *
  * Everything is a Catalyst higher-order-function expression — no UDFs —
  * so the operators stay distributed, null-safe, and spill-free: per-row
  * work is O(doc length) with no driver involvement.
  */
object Text {

  /** Shared modulus (2^31 - 1, prime) for all derived hashes. */
  val P = 2147483647L

  /** Knuth multiplicative constant shared with Facts.det. */
  val Mult = 2654435761L

  /** Lowercased alphanumeric tokens; empty tokens dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Word n-gram shingles joined by a single space; empty if < n tokens.
    * (The `when` guard matters: Spark's sequence(1, 0) would yield a
    * DESCENDING [1, 0], not an empty array.) */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** 32-bit string hash both engines share bit-for-bit: the first 8 hex
    * chars of md5, parsed as an integer (Spark: conv; DuckDB: 0x-cast). */
  def strHash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Rolling polynomial hash over characters (base 31, mod 1e9+7) — a
    * sequential left fold, so any engine reproduces it exactly. Used as
    * the document fingerprint. */
  def rollingHash(s: Column): Column =
    when(length(s) === 0, lit(0L)).otherwise(
      aggregate(
        transform(sequence(lit(1), length(s)), i => ascii(s.substr(i, lit(1))).cast("long")),
        lit(0L),
        (acc, c) => (acc * 31 + c) % 1000000007L))

  /** Whitespace-ish token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token estimate: greedy runs of ≤4 letters, single digits,
    * and single non-space symbols — the shape of a byte-pair vocabulary
    * without shipping one. */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(lower(text), lit("[a-z]{1,4}|[0-9]|[^a-z0-9\\s]"))

  /** Fraction of characters matching `charClass` (integer char counts
    * divided as double — exact same division in any engine). */
  def charRatio(text: Column, charClass: String): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, charClass, "")))
        .cast("double") / length(text))

  /** Tiny per-language stopword lists for the n-gram language heuristic.
    * Order = deterministic tie-break priority. */
  val StopWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"))

  /** Count of tokens present in `words`. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Language-ID heuristic: argmax of stopword hits with deterministic
    * tie-break (StopWords order); "und" (undetermined) when no list hits.
    *
    * Shape matters: the obvious foldLeft of `when(s > best, ...)` pairs
    * embeds every earlier score subtree TWICE per step — an O(2^L)
    * expression tree whose leaves are interpreted higher-order filters,
    * re-evaluated at every occurrence (Catalyst shares no common
    * subtrees). That cost hid behind column pruning until a rollup
    * actually grouped on the result (q154: 2.4 s for a 5 000-row
    * aggregate). One struct array scores each language ONCE;
    * `array_max`'s lexicographic struct order implements
    * strictly-greater-wins with the (-index) field keeping earlier
    * languages on ties. */
  def langId(toks: Column): Column = {
    val entries = StopWords.zipWithIndex.map { case ((lang, words), i) =>
      struct(stopwordHits(toks, words).as("s"), lit(-i).as("ni"), lit(lang).as("lang"))
    }
    val best = array_max(array(entries: _*))
    // null toks → null per-language scores; under sizeOfNull=false the
    // `s <= 0` test is then NULL and the otherwise-branch would leak
    // best.lang ('en') where the pre-round-10 foldLeft said 'und'. Gate
    // on a strictly-positive hit instead so null scores fall to 'und'
    // regardless of the legacy-config setting.
    when(best.getField("s") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** 1-based start offsets of sliding context-window chunks over a
    * token array: 1, 1+stride, 1+2·stride, … while ≤ the token count
    * (the final chunk may be short; with stride < chunkLen consecutive
    * chunks overlap by chunkLen − stride tokens). Empty input → no
    * chunks (guarded: Spark's sequence(1, 0, s) would throw, not return
    * empty). Pure per-row array math — chunking a corpus is a
    * shuffle-free narrow explode. */
  def chunkStarts(toks: Column, stride: Int): Column =
    when(size(toks) === 0, array().cast("array<int>"))
      .otherwise(sequence(lit(1), size(toks), lit(stride)))

  /** Stopword ratio across all lists (any-language hit rate). */
  def stopwordRatio(toks: Column): Column = {
    val all = StopWords.flatMap(_._2).distinct
    when(size(toks) === 0, lit(0.0))
      .otherwise(stopwordHits(toks, all).cast("double") / size(toks))
  }

  /** Gopher-style document-quality signals (Rae et al. 2021 §A1.1, the
    * rule set RedPajama/Dolma reimplement): word count, mean word
    * length, symbol-to-word ratio ('#' / '…'-as-'...'), fraction of
    * words containing an alphabetic character, and English stopword
    * hits — each with its published gate, plus the composite keep.
    *
    * Every GATE compares integers via cross-multiplication (`sum_len >=
    * 3·n` rather than `mean >= 3.0`), so a boundary document cannot
    * flip between engines on a float rounding; the reported ratio
    * columns are single integer÷integer IEEE divisions (exact same
    * result in any engine). Pure per-row projection — the corpus gate
    * is a shuffle-free scan at any scale. Line-shape rules
    * (bullet-start / ellipsis-end fractions) need line structure the
    * fixture lacks and are deliberately out of scope here.
    *
    * Returns the named signal/gate columns to splat after the id. */
  def gopherSignals(text: Column): Seq[Column] = {
    val toks = tokens(text)
    val n = size(toks).cast("long")
    val sumLen = aggregate(transform(toks, t => length(t).cast("long")), lit(0L), _ + _)
    val alpha = size(filter(toks, t => t.rlike("[a-z]"))).cast("long")
    val symbols = regexp_count(text, lit("#|\\.\\.\\.")).cast("long")
    val stopHits = stopwordHits(toks, StopWords.head._2).cast("long")
    val nonEmpty = n > 0
    Seq(
      n.as("n_words"),
      when(nonEmpty, sumLen.cast("double") / n).as("mean_word_len"),
      when(nonEmpty, symbols.cast("double") / n).as("symbol_word_ratio"),
      when(nonEmpty, alpha.cast("double") / n).as("alpha_word_frac"),
      stopHits.as("stopword_hits"),
      (n >= 20L && n <= 100000L).as("g_word_count"),
      (nonEmpty && sumLen >= n * 3 && sumLen <= n * 10).as("g_mean_len"),
      (nonEmpty && symbols * 10 <= n).as("g_symbol"),
      (nonEmpty && alpha * 10 >= n * 8).as("g_alpha"),
      (stopHits >= 2L).as("g_stopword"),
      (n >= 20L && n <= 100000L && nonEmpty &&
        sumLen >= n * 3 && sumLen <= n * 10 &&
        symbols * 10 <= n && alpha * 10 >= n * 8 &&
        stopHits >= 2L).as("keep"))
  }

  /** Within-document REPETITIOUS-TEXT battery (Rae et al. 2021 Gopher
    * §A1.1 Table A1 — the "repetition" half of the quality rules
    * [[gopherSignals]] deliberately left out; Dolma/RedPajama
    * reimplement these same signals): duplicate-line fraction and
    * duplicate-line CHARACTER fraction over caller-supplied lines, the
    * character share of the MOST FREQUENT word 2-gram (count × gram
    * chars ∕ doc chars — the Dolma count-based formula), and the
    * character fraction covered by word 5-grams occurring ≥ 2 times
    * within the doc (position-coverage UNION, so overlapping repeats
    * never double-count — the coverage-based formula). The paper runs
    * the same two shapes at n = 2..4 (top n-gram) and n = 5..10
    * (dup n-gram); one representative n each keeps the battery
    * demonstrative without seven near-identical columns. Character
    * mass = token characters (separators excluded).
    *
    * Gates at the paper's thresholds, PASS-polarity like
    * [[gopherSignals]] (g_* true = doc passes), compared via integer
    * cross-multiplication so a boundary doc cannot flip on float
    * rounding: dup_line_frac ≤ 0.30, dup_line_char_frac ≤ 0.20,
    * top_2gram_char_frac ≤ 0.20, dup_5gram_char_frac ≤ 0.15; keep =
    * all four. Ratios present 6-dp half-up (ExactRound).
    *
    * The top-2-gram argmax is the pure integer key
    * max(c·2⁴⁰ + c·gmass) — frequency first, covered chars as the
    * deterministic tie-break, no engine argmax policy (c·gmass < 2⁴⁰
    * under the corpus-wide ≤ 4M-token-doc chunking contract the
    * winnowing key already relies on).
    *
    * EVERYTHING is per-doc local, and NO GRAM STRING EVER SHUFFLES
    * (the q277/q297 discipline): n-gram identity is the 32-bit
    * md5-prefix key mod P both engines share, built from lead()
    * windows over the position stream, so the shuffled rows are
    * (doc, position, integers) — at 60M positions the string form
    * measured 6× the winnowing band (145 s at sf10) and the position
    * join it needed is gone entirely: duplicated-5-gram coverage is a
    * per-doc 4-PRECEDING running max over the dup flag. A within-doc
    * hash collision (~len²∕2³¹ per doc) merges two grams IDENTICALLY
    * in both engines — a documented approximation of the same kind
    * the chunk-hash (q191) and window-hash (q277 prefilter) keys
    * carry. All windows are doc-partitioned.
    *
    * `lines` must be an (idCol, pos, line) split of the SAME docs (the
    * L289 splitter contract: production splits on newlines; the
    * fixture chunks tokens). */
  def repetitionStats(docs: DataFrame, lines: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import graft.functions.ExactRound
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol), tokens(col(textCol)).as("t"))
      .filter(size(col("t")) > 0)
    // duplicate-line stats: all occurrences beyond each value's first
    // (line rows are token-count/10 — the one place a string key is
    // fine). lchars uses the SAME character-mass alphabet as totchars
    // — the [a-z0-9] token chars of the lowered line — so the
    // dup_line_char_frac numerator and denominator count identical
    // masses for ANY line content (a real newline split carries
    // punctuation/uppercase the tokenizer strips; stripping only
    // spaces here would let the fraction exceed 1).
    val lg = lines.groupBy(col(idCol), col("line"))
      .agg(count(lit(1)).as("c"))
      .withColumn("lchars",
        length(regexp_replace(lower(col("line")), "[^a-z0-9]", ""))
          .cast("long"))
    val ld = lg.groupBy(idCol).agg(
      sum("c").as("n_lines"),
      sum(col("c") - 1).as("n_dup"),
      sum((col("c") - 1) * col("lchars")).as("dupchars"))
    // one position stream; gram keys from lead() windows — integers only
    val byPos = Window.partitionBy(col(idCol)).orderBy("p")
    val tl = toks.select(col(idCol), posexplode(col("t")))
      .select(col(idCol), (col("pos") + 1).as("p"), col("col").as("tok"))
      .withColumn("t2", lead(col("tok"), 1).over(byPos))
      .withColumn("t5a", lead(col("tok"), 2).over(byPos))
      .withColumn("t5b", lead(col("tok"), 3).over(byPos))
      .withColumn("t5c", lead(col("tok"), 4).over(byPos))
      .select(col(idCol), col("p"),
        length(col("tok")).cast("long").as("plen"),
        when(col("t2").isNotNull,
          strHash32(concat_ws(" ", col("tok"), col("t2"))) % P).as("h2"),
        when(col("t2").isNotNull,
          (length(col("tok")) + length(col("t2"))).cast("long")).as("gmass"),
        when(col("t5c").isNotNull,
          strHash32(concat_ws(" ", col("tok"), col("t2"), col("t5a"),
            col("t5b"), col("t5c"))) % P).as("h5"))
    val c2 = count(lit(1)).over(Window.partitionBy(col(idCol), col("h2")))
    val c5 = count(lit(1)).over(Window.partitionBy(col(idCol), col("h5")))
    val K = 1099511627776L // 2^40
    val flagged = tl
      .withColumn("k2", when(col("h2").isNotNull,
        c2 * K + c2 * col("gmass")))
      .withColumn("d5", when(col("h5").isNotNull && c5 >= 2, 1L)
        .otherwise(0L))
      // position p is covered iff ANY duplicated 5-gram starts in
      // [p−4, p] — a per-doc running max, no position join
      .withColumn("cvr", max(col("d5")).over(
        byPos.rowsBetween(-4, Window.currentRow)))
    val pc = flagged.groupBy(idCol).agg(
      sum("plen").as("totchars"),
      sum(when(col("cvr") === 1L, col("plen")).otherwise(0L))
        .as("dup5chars"),
      max("k2").as("k2"))
    val top2 = coalesce(col("k2") % K, lit(0L))
    val dup5 = col("dup5chars")
    val gLine = col("n_dup") * 10 <= col("n_lines") * 3
    val gLineCh = col("dupchars") * 5 <= col("totchars")
    val gTop2 = top2 * 5 <= col("totchars")
    val gDup5 = dup5 * 20 <= col("totchars") * 3
    pc.join(ld, Seq(idCol))
      .select(col(idCol), col("n_lines"),
        ExactRound.roundRatio(col("n_dup"), col("n_lines"), 6)
          .cast("double").as("dup_line_frac"),
        ExactRound.roundRatio(col("dupchars"), col("totchars"), 6)
          .cast("double").as("dup_line_char_frac"),
        ExactRound.roundRatio(top2, col("totchars"), 6)
          .cast("double").as("top_2gram_char_frac"),
        ExactRound.roundRatio(dup5, col("totchars"), 6)
          .cast("double").as("dup_5gram_char_frac"),
        gLine.as("g_dup_line"),
        gLineCh.as("g_dup_line_chars"),
        gTop2.as("g_top_2gram"),
        gDup5.as("g_dup_5gram"),
        (gLine && gLineCh && gTop2 && gDup5).as("keep"))
  }

  /** Content-defined chunk table: one row per variable-size chunk of
    * `textCol`, split where the w-char rolling window hash divides by
    * `divisor` ([[graft.functions.CdcBoundaries]] — compiled O(len)
    * kernel; expected chunk ≈ `divisor` chars). Emits (idCol, chunk_idx
    * 1-based, start 1-based, chunk_len, chunk_hash = strHash32 of the
    * chunk text — the key chunk-level storage dedup buckets on). Docs
    * shorter than w come back as one whole-doc chunk; empty docs emit
    * no rows. Pure per-row array math + a narrow explode — chunking a
    * corpus is shuffle-free at any scale, and the chunk table carries
    * 8-byte hashes, never a second copy of the text. */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      w: Int = 16, divisor: Int = 64): DataFrame = {
    val bounds = call_function("graft_cdc_boundaries", col(textCol), lit(w), lit(divisor))
    val n = length(col(textCol))
    val starts = concat(array(lit(1)), transform(col("_b"), b => b + 1))
    val ends = concat(col("_b"), array(n))
    df.filter(length(col(textCol)) > 0)
      .withColumn("_b", bounds)
      .select(col(idCol), col(textCol).as("_t"),
        posexplode(zip_with(starts, ends, (s, e) => struct(s.as("s"), e.as("e")))))
      .select(
        col(idCol),
        (col("pos") + 1).cast("long").as("chunk_idx"),
        col("col.s").cast("long").as("start"),
        (col("col.e") - col("col.s") + 1).cast("long").as("chunk_len"),
        (strHash32(col("_t").substr(col("col.s"),
          col("col.e") - col("col.s") + 1)) % P).as("chunk_hash"))
  }
}
