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
