package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSuite {
  import spark.implicits._

  test("tokens: lowercase, alnum, empties dropped") {
    val got = Seq("Hello,  World-42! ").toDF("text")
      .select(Text.tokens(col("text"))).as[Seq[String]].head()
    assert(got == Seq("hello", "world", "42"))
  }

  test("shingles: n-grams; short docs yield empty array (not [1,0] sequence)") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(Text.shingles(Text.tokens(col("text")), 3).as("s"))
    assert(df.as[Seq[String]].collect().toSeq ==
      Seq(Seq("a b c", "b c d"), Seq.empty))
  }

  test("strHash32 and rollingHash: deterministic, in range") {
    val (h, r) = Seq("abc").toDF("t")
      .select(Text.strHash32(col("t")), Text.rollingHash(col("t")))
      .as[(Long, Long)].head()
    assert(h >= 0 && h < (1L << 32))
    // base-31 fold over 'a','b','c' = ((97*31)+98)*31+99
    assert(r == ((97L * 31 + 98) * 31 + 99) % 1000000007L)
  }

  test("bpeish token count: letter runs capped at 4, digits/symbols single") {
    val n = Seq("hello world, 42!").toDF("t")
      .select(Text.bpeishTokenCount(col("t"))).as[Int].head()
    // hell+o + worl+d + "," + "4" + "2" + "!" = 8
    assert(n == 8)
  }

  test("langId + stopwordRatio: stopword argmax with und fallback") {
    val df = Seq(
      "the cat and the dog is in a house",
      "der hund und die katze ist nicht hier",
      "xyzzy qwerty asdf").toDF("text")
    val got = df.select(Text.langId(Text.tokens(col("text")))).as[String].collect()
    assert(got.toSeq == Seq("en", "de", "und"))
    val ratio = df.limit(1)
      .select(Text.stopwordRatio(Text.tokens(col("text")))).as[Double].head()
    assert(ratio > 0.4) // the/and/the/is/in/a of 9 tokens
  }

  test("gopherSignals: gates fire on the documented rule boundaries") {
    val good = (("the quick brown fox jumps over the lazy dog and " * 3) +
      "runs far away home again tonight").trim // 36 words, alpha, stopwords
    val short = "the cat and dog" // 4 words < 20
    val digits = (1 to 25).map(i => (100 + i).toString).mkString(" ") // no alpha, no stopwords
    val df = Seq((1L, good), (2L, short), (3L, digits), (4L, "")).toDF("doc_id", "text")
    val out = df.select(col("doc_id") +: Text.gopherSignals(col("text")): _*)
      .orderBy("doc_id")
      .select("doc_id", "n_words", "g_word_count", "g_alpha", "g_stopword", "keep")
      .as[(Long, Long, Boolean, Boolean, Boolean, Boolean)].collect().toSeq
    assert(out(0) == ((1L, 36L, true, true, true, true)))
    assert(out(1) == ((2L, 4L, false, true, true, false)))
    assert(out(2) == ((3L, 25L, true, false, false, false)))
    assert(out(3) == ((4L, 0L, false, false, false, false)))
    // ratio columns are NULL (not 0/NaN) on the empty doc
    val emptyRatios = df.filter(col("doc_id") === 4)
      .select(col("doc_id") +: Text.gopherSignals(col("text")): _*)
      .select("mean_word_len", "symbol_word_ratio", "alpha_word_frac")
      .collect()(0)
    assert((0 until 3).forall(emptyRatios.isNullAt))
    // symbol gate: >10% '#'/'...' occurrences per word rejects
    val symbolHeavy = ("w " * 20).trim + " # # #" // 20 real words + 3 symbols over 23 tokens
    val sym = Seq((9L, symbolHeavy)).toDF("doc_id", "text")
      .select(col("doc_id") +: Text.gopherSignals(col("text")): _*)
      .select("g_symbol").as[Boolean].head()
    assert(!sym)
  }

  test("cdcChunks: boundaries match the per-window defining fold; chunks " +
      "tile the doc; an insertion only re-chunks its own region") {
    val rnd = new scala.util.Random(178L)
    val text = (1 to 60).map(_ => ('a' + rnd.nextInt(26)).toChar.toString +
      ('a' + rnd.nextInt(26)).toChar + " ").mkString.trim // ~180 chars
    val (w, d) = (16, 8) // small divisor so the test doc has boundaries
    // brute-force reference: hash every w-window with the defining fold
    def windowHash(s: String, endIdx1: Int): Long = {
      var h = 0L
      for (j <- endIdx1 - w + 1 to endIdx1) h = (h * 31 + s.charAt(j - 1)) % 1000000007L
      h
    }
    def refBounds(s: String): Seq[Int] =
      (w until s.length).filter(i => windowHash(s, i) % d == 0)
    val df = Seq((1L, text), (2L, "tiny doc"), (3L, "")).toDF("doc_id", "text")
    val got = Text.cdcChunks(df, "doc_id", "text", w, d)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "start", "chunk_len")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val rb = refBounds(text)
    assert(rb.nonEmpty, "test doc must have at least one boundary")
    val expStarts = 1L +: rb.map(_ + 1L)
    val expEnds = rb.map(_.toLong) :+ text.length.toLong
    val doc1 = got.filter(_._1 == 1L)
    assert(doc1.map(_._3) == expStarts, "starts must match the defining fold")
    assert(doc1.map(t => t._3 + t._4 - 1) == expEnds)
    // chunks tile the doc exactly: starts chain and lengths sum to len
    assert(doc1.map(_._4).sum == text.length.toLong)
    // short doc (< w): one whole-doc chunk; empty doc: no rows
    assert(got.filter(_._1 == 2L) == Seq((2L, 1L, 1L, 8L)))
    assert(!got.exists(_._1 == 3L))
    // CDC robustness: prepend a char — boundaries BEYOND the edit window
    // shift by exactly 1 (same content, same local windows), so every
    // chunk after the first boundary survives an insertion
    val shifted = refBounds("Z" + text)
    assert(rb.toSet.subsetOf(shifted.map(_ - 1).toSet),
      "every boundary must survive an insertion, shifted by its length")
  }

  test("exactDupTag: lowest id is the keeper") {
    val df = Seq((3L, "same"), (1L, "same"), (2L, "other")).toDF("id", "text")
    val out = Dedup.exactDupTag(df, "text", "id")
    assert(out.filter(col("is_dup")).select("id").as[Long].collect().toSeq == Seq(3L))
  }

  test("minhash LSH: near-identical docs collide, disjoint docs don't") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"tok$i").mkString(" ") + " tokX tokY"
    val other = (100 to 140).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairs(df, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L)))
  }

  test("minhash signature approximates Jaccard") {
    // identical docs → identical signatures
    val df = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h")).toDF("doc_id", "text")
    val sigs = Dedup.withShingleHashes(df, "text", 3)
      .select(Dedup.minhashSignature(col("hv"), 12)).as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
  }

  test("simhashPairs: hamming bound respected, near-dups found") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = (1 to 59).map(i => s"tok$i").mkString(" ") + " tokZ"
    val far = (200 to 260).map(i => s"q$i").mkString(" ")
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(df, "doc_id", "text")
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSeq
    assert(pairs.forall(_._3 <= 3))
    assert(pairs.map(p => (p._1, p._2)).contains((1L, 2L)))
  }

  test("simhashPairs: adaptive bucket refinement emits the identical " +
      "pair set once per pair on every path split") {
    // a template-heavy corpus: clusters of near-identical docs (hot
    // buckets) plus unique docs (cold buckets), so intermediate
    // thresholds genuinely split pairs across the two paths
    val docs = (1 to 120).map { i =>
      val cluster = i % 10
      val toks =
        if (cluster < 4) (1 to 50).map(j => s"t${cluster}_$j") :+ s"salt$i"
        else (1 to 50).map(j => s"u${i}_$j")
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    def pairSet(refineOver: Int): Seq[(Long, Long, Int)] =
      Dedup.simhashPairs(docs, "doc_id", "text", refineBucketOver = refineOver)
        .select("id_a", "id_b", "hamming").as[(Long, Long, Int)]
        .collect().toSeq.sorted
    val allRefined = pairSet(0)        // every bucket takes level 2
    val allDirect = pairSet(1000000)   // every bucket stays level 1
    val mixed4 = pairSet(4)            // hot clusters refined, rest direct
    val mixed12 = pairSet(12)
    assert(allRefined.nonEmpty, "fixture must produce near-dup pairs")
    assert(allDirect == allRefined, "one-level vs two-level pair sets differ")
    assert(mixed4 == allRefined, "mixed path (4) pair set differs")
    assert(mixed12 == allRefined, "mixed path (12) pair set differs")
    // exactly-once: no pair may be emitted by both paths
    assert(allRefined.map(p => (p._1, p._2)).distinct.size == allRefined.size)
  }

  test("simhashPairsCapped: subset of the exact pair set, equal at a " +
      "saturating cap, and capped components refine exact components") {
    // template clusters make hot buckets so the cap genuinely prunes
    val docs = (1 to 120).map { i =>
      val cluster = i % 6
      val toks =
        if (cluster < 4) (1 to 50).map(j => s"t${cluster}_$j") :+ s"salt$i"
        else (1 to 50).map(j => s"u${i}_$j")
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "hamming").as[(Long, Long, Int)]
        .collect().toSet
    val exact = asSet(Dedup.simhashPairs(docs, "doc_id", "text"))
    val capped = asSet(Dedup.simhashPairsCapped(docs, "doc_id", "text", cap = 3))
    val saturated = asSet(
      Dedup.simhashPairsCapped(docs, "doc_id", "text", cap = 1000))
    assert(exact.nonEmpty, "fixture must produce near-dup pairs")
    assert(capped.subsetOf(exact), "capped pairs must be a subset of exact")
    assert(saturated == exact, "cap beyond every bucket size must equal exact")
    assert(capped.size < exact.size,
      "cap=3 on hot template buckets must genuinely prune")
    // connectivity refinement: every capped component sits inside ONE
    // exact component (the capped graph never invents a link)
    def comps(pairs: Set[(Long, Long, Int)]): Map[Long, Long] = {
      val ps = pairs.toSeq.map(p => (p._1, p._2)).toDF("id_a", "id_b")
      Components.connectedComponents(ps, "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
    }
    val ce = comps(exact)
    val cc = comps(capped)
    val capToExact = cc.groupBy(_._2).map { case (ccomp, members) =>
      ccomp -> members.keys.map(ce).toSet
    }
    assert(capToExact.values.forall(_.size == 1),
      "a capped component spans two exact components")
  }

  test("nearDupPairsCapped: subset of the uncapped MinHash pair set, " +
      "equal at a saturating cap, genuinely pruning on hot buckets") {
    // template clusters concentrate band buckets, so the rank prune
    // genuinely cuts candidates (the q293 production-path contract)
    val docs = (1 to 120).map { i =>
      val cluster = i % 6
      val toks =
        if (cluster < 4) (1 to 50).map(j => s"t${cluster}_$j") :+ s"salt$i"
        else (1 to 50).map(j => s"u${i}_$j")
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
        .collect().toSet
    val exact = asSet(Dedup.nearDupPairs(docs, "doc_id", "text",
      threshold = 0.3))
    val capped = asSet(Dedup.nearDupPairsCapped(docs, "doc_id", "text",
      threshold = 0.3, cap = 2))
    val saturated = asSet(Dedup.nearDupPairsCapped(docs, "doc_id", "text",
      threshold = 0.3, cap = 1000))
    assert(exact.nonEmpty, "fixture must produce near-dup pairs")
    assert(capped.subsetOf(exact), "capped pairs must be a subset of exact")
    assert(saturated == exact, "cap beyond every bucket size must equal exact")
    assert(capped.size < exact.size,
      "cap=2 on hot template buckets must genuinely prune")
  }

  test("exactSubstrDedup: a forced graft_window_hashes collision " +
      "(Thue–Morse anti-hash words) dies at the exact string decide — " +
      "no mis-ownership, nothing stripped") {
    // The window hash is the polynomial Σ th(tok_i)·M^(n−1−i) mod 2^64
    // with odd M. For the length-2^10 Thue–Morse sign word,
    // Σ_{i<2^10} (−1)^{t_i} M^i = Π_{j<10} (1 − M^(2^j)), whose 2-adic
    // valuation is v2(M−1) + Σ_{j=1..9} (j+2) = 2 + 63 = 65 ≥ 64 — so
    // the two COMPLEMENTARY 1024-token words built from ANY two
    // distinct tokens hash identically mod 2^64 while their window
    // strings differ: a real prefilter collision by construction (the
    // adversarial case the scaladoc's "hash narrows, string decides"
    // claim must survive).
    val n = 1024
    def tm(i: Int) = Integer.bitCount(i) & 1
    val wordX = (0 until n).map(i => if (tm(i) == 0) "aa" else "bb")
    val wordY = (0 until n).map(i => if (tm(i) == 0) "bb" else "aa")
    val docs = Seq((1L, wordX.mkString(" ")), (2L, wordY.mkString(" ")))
      .toDF("doc_id", "text")
    // the collision is real: both single-window docs hash the same
    val hs = docs.orderBy("doc_id")
      .select(element_at(
        call_function("graft_window_hashes", col("text"), lit(n)), 1))
      .as[Long].collect().toSeq
    assert(hs(0) == hs(1), "Thue–Morse words must collide mod 2^64")
    // …and the exact decide path discards it: the two window STRINGS
    // differ, each occurs once, occ ≥ 2 fails — nothing owned/stripped
    val out = Dedup.exactSubstrDedup(docs, "doc_id", "text", minLen = n)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out(0) == ((1L, wordX.mkString(" "), n.toLong, 0L)))
    assert(out(1) == ((2L, wordY.mkString(" "), n.toLong, 0L)))
    // positive control: a GENUINE 1024-token repeat in the same corpus
    // is still stripped whole from the non-owner at the same minLen —
    // the collision pair stays untouched beside it
    val docs2 = docs.unionByName(
      Seq((3L, wordX.mkString(" "))).toDF("doc_id", "text"))
    val out2 = Dedup.exactSubstrDedup(docs2, "doc_id", "text", minLen = n)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out2(0)._4 == 0L && out2(1)._4 == 0L)
    assert(out2(2) == ((3L, "", n.toLong, n.toLong)))
  }

  test("capped folds + periodic full recompute converge to the exact " +
      "components (the reconciliation simhashPairsCapped's contract " +
      "promises)") {
    // Production shape under test (q151/q152 doc comments): per-batch
    // incremental folds ingest the CAPPED candidate stream (linear),
    // and a periodic full recompute (the q49 exact pass) is folded in
    // to absorb capped-away links. The contract: after reconciliation
    // the standing labels ARE the exact components — because capped ⊆
    // exact, CC(capped ∪ exact) = CC(exact), and the fold is exact on
    // whatever edges it consumes (q119's fold == full-recompute pin).
    val docs = (1 to 120).map { i =>
      val cluster = i % 6
      val toks =
        if (cluster < 4) (1 to 50).map(j => s"t${cluster}_$j") :+ s"salt$i"
        else (1 to 50).map(j => s"u${i}_$j")
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val capped = Dedup.simhashPairsCapped(docs, "doc_id", "text", cap = 3)
      .select("id_a", "id_b").localCheckpoint()
    val exact = Dedup.simhashPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").localCheckpoint()
    assert(capped.count() < exact.count(),
      "cap must genuinely prune links, or the reconcile absorbs nothing")
    // continuous ingest: the capped stream lands as three batches, each
    // folded into the standing labeling (the q119 idiom, from empty)
    val standing = (0 until 3).foldLeft(
      Seq.empty[(Long, Long)].toDF("id", "comp")) { (labels, b) =>
      val batch = capped.filter((col("id_a") + col("id_b")) % 3 === b)
      Components.incrementalComponents(labels, batch, "id_a", "id_b")
        .localCheckpoint()
    }
    // sequential capped folds == the one-shot capped closure
    val oneShot = Components.connectedComponents(capped, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(standing.as[(Long, Long)].collect().toMap == oneShot,
      "batch-sequence folds must equal the one-shot capped closure")
    // the periodic reconciliation: fold the exact recompute's pairs in
    val reconciled = Components
      .incrementalComponents(standing, exact, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val exactCC = Components.connectedComponents(exact, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(reconciled.keySet == exactCC.keySet,
      "reconciled labeling must cover exactly the exact graph's vertices")
    exactCC.foreach { case (id, c) =>
      assert(reconciled(id) == c,
        s"doc $id: reconciled label ${reconciled(id)} != exact component $c")
    }
  }

  test("blockedJaccardPairs: pairs only within a block") {
    val df = Seq(
      (1L, "a b c d e", "s1"), (2L, "a b c d e", "s1"),
      (3L, "a b c d e", "s2")).toDF("doc_id", "text", "source")
    val pairs = Dedup.blockedJaccardPairs(df, "doc_id", "text", "source", 3, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L))) // doc 3 identical but in another block
  }

  test("prefixJaccardPairs: exactly the brute-force pair set — no false " +
      "negatives, no extras — at any partitioning") {
    // 80 mostly-random docs + planted near-dup pairs at varied overlap
    val docs = (1 to 80).map { i =>
      val base = (1 to 30).map(j => s"w${i}_$j")
      val text = i % 4 match {
        case 0 => base.mkString(" ") // unique
        case 1 => (1 to 30).map(j => s"w${i - 1}_$j").mkString(" ") // dup of i-1
        case 2 => ((1 to 27).map(j => s"w${i}_$j") ++ Seq("x", "y", "z")).mkString(" ")
        case _ => base.mkString(" ")
      }
      (i.toLong, text)
    }.toDF("doc_id", "text")
    def bruteForce(tNum: Int, tDen: Int): Set[(Long, Long)] = {
      val sets = Dedup.withShingleHashes(docs, "text", 3)
        .select(col("doc_id"), col("hv")).as[(Long, Seq[Long])]
        .collect().toMap
      (for {
        (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a < b
        inter = sa.toSet.intersect(sb.toSet).size
        if inter.toDouble / (sa.size + sb.size - inter) >= tNum.toDouble / tDen
      } yield (a, b)).toSet
    }
    for ((tn, td) <- Seq((4, 5), (3, 5), (1, 2))) {
      val got = Dedup.prefixJaccardPairs(docs, "doc_id", "text", 3, tn, td)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == bruteForce(tn, td), s"threshold $tn/$td")
    }
    val repart = Dedup
      .prefixJaccardPairs(docs.repartition(7), "doc_id", "text", 3, 4, 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(repart == bruteForce(4, 5))
  }

  test("stripDupSpans: covered tokens removed, order kept, short and " +
      "clean docs untouched") {
    val boiler = "subscribe to our newsletter"
    val df = Seq(
      (1L, s"alpha beta $boiler gamma delta"),
      (2L, s"$boiler epsilon zeta eta theta"),
      (3L, s"iota kappa lambda $boiler"),
      (4L, "mu nu xi omicron pi rho"), // clean
      (5L, "ab cd")) // shorter than the shingle width
      .toDF("doc_id", "text")
    val out = Dedup.stripDupSpans(df, "doc_id", "text", 3, lit(3))
      .select("doc_id", "clean_text", "n_tokens", "n_removed")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "alpha beta gamma delta", 8L, 4L)))
    assert(out(1) == ((2L, "epsilon zeta eta theta", 8L, 4L)))
    assert(out(2) == ((3L, "iota kappa lambda", 7L, 4L)))
    assert(out(3) == ((4L, "mu nu xi omicron pi rho", 6L, 0L)))
    assert(out(4) == ((5L, "ab cd", 2L, 0L)))
    // below the df gate nothing is boilerplate
    val none = Dedup.stripDupSpans(df, "doc_id", "text", 3, lit(4))
    assert(none.filter(col("n_removed") > 0).isEmpty)
  }

  test("exactSubstrDedup: all-but-one at span granularity — the owner " +
      "keeps a shared run whole, every other site loses its full extent") {
    val docs = Seq(
      (1L, "a b c d e x"),     // min (doc, spos) site of the 5-token run
      (2L, "p q a b c d e r"), // same run mid-doc: window UNION strips it whole
      (3L, "f g h z f g h"),   // within-doc repeat: 2nd occurrence stripped
      (4L, "u v"),             // < minLen tokens: no windows, untouched
      (5L, "m n o"),           // exactly-minLen run shared with doc 6
      (6L, "q m n o w")
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstrDedup(docs, "doc_id", "text", minLen = 3)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out(0) == ((1L, "a b c d e x", 6L, 0L))) // owner: intact
    // a 5-token run ≥ minLen=3 yields 3 aligned duplicated windows whose
    // union covers it completely — the non-owner loses all 5 tokens
    assert(out(1) == ((2L, "p q r", 8L, 5L)))
    assert(out(2) == ((3L, "f g h z", 7L, 3L))) // first occurrence kept
    assert(out(3) == ((4L, "u v", 2L, 0L)))
    assert(out(4) == ((5L, "m n o", 3L, 0L)))   // owner of the exact-L run
    assert(out(5) == ((6L, "q w", 5L, 3L)))     // single-window strip
  }

  test("exactSubstrDedup: two distinct overlapping repeats merge and can " +
      "tile a doc to empty; sub-threshold repeats never strip") {
    val docs = Seq(
      (7L, "r s t u"),         // source of run 1
      (8L, "t u v w"),         // source of run 2
      (9L, "r s t u v w")      // contains both, overlapping at "t u"
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstrDedup(docs, "doc_id", "text", minLen = 3)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out(0) == ((7L, "r s t u", 4L, 0L)))
    assert(out(1) == ((8L, "t u v w", 4L, 0L)))
    // covered sets {1..4} (run 1) and {3..6} (run 2) union to the whole
    // doc — tiling leaves the empty rewrite, not a crash or a remnant
    assert(out(2) == ((9L, "", 6L, 6L)))
    // the same corpus at minLen=5 has NO 5-token repeats: exactness means
    // sub-threshold sharing (unlike a df-thresholded n-gram gate) never
    // strips anything
    val none = Dedup.exactSubstrDedup(docs, "doc_id", "text", minLen = 5)
    assert(none.filter(col("n_removed") > 0).isEmpty)
  }

  test("spanProvenance: window-unit directional flow — each non-owner " +
      "occurrence attributes to exactly ONE owning source") {
    val docs = Seq(
      (1L, "a b c d e x", "wiki"),   // owns the 5-run: windows @1,@2,@3
      (2L, "p q a b c d e r", "web"), // loses 3 windows to wiki
      (3L, "a b c z", "web"),         // loses 1 window ("a b c") to wiki
      (4L, "f g h z f g h", "news")   // intra-source (within-doc) repeat
    ).toDF("doc_id", "text", "source")
    val out = Dedup.spanProvenance(docs, "doc_id", "text", "source", minLen = 3)
      .orderBy("src_from", "src_to")
      .as[(String, String, Long, Long)].collect().toSeq
    // doc1 owns "a b c"(also in 2,3), "b c d", "c d e" (also in 2);
    // doc4's second "f g h" flows news→news (within-doc = intra-source)
    assert(out == Seq(
      ("news", "news", 1L, 1L),
      ("wiki", "web", 4L, 2L)))
  }

  test("exactSubstrBatch: ascending-id two-batch fold equals the one-shot " +
      "rewrite, and re-applying the last batch is an algebraic no-op") {
    val docs = Seq(
      (1L, "a b c d e x"),      // batch 1 — owner of the 5-run
      (2L, "f g h z f g h"),    // batch 1 — within-doc repeat
      (3L, "p q a b c d e r"),  // batch 2 — loses the 5-run to doc 1
      (4L, "q f g h w")         // batch 2 — loses "f g h" to doc 2
    ).toDF("doc_id", "text")
    val oneShot = Dedup.exactSubstrDedup(docs, "doc_id", "text", minLen = 3)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    // fold: batch 1 (ids 1-2) against empty state, then batch 2 (3-4)
    val emptyState = Seq.empty[(Long, Long, Int)]
      .toDF("h", "own_id", "own_spos")
    val b1 = docs.filter(col("doc_id") <= 2)
    val b2 = docs.filter(col("doc_id") > 2)
    val (r1, o1) = Dedup.exactSubstrBatch(emptyState, b1, docs,
      "doc_id", "text", minLen = 3)
    val state1 = emptyState.unionByName(o1)
    val (r2, o2) = Dedup.exactSubstrBatch(state1, b2, docs,
      "doc_id", "text", minLen = 3)
    val folded = r1.unionByName(r2).orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(folded == oneShot,
      s"fold must equal the one-shot rewrite:\n$folded\nvs\n$oneShot")
    // replay shield: re-folding batch 2 against the post-fold state
    // reproduces its own rewrite and mints NO new owners
    val state2 = state1.unionByName(o2)
    val (r2b, o2b) = Dedup.exactSubstrBatch(state2, b2, docs,
      "doc_id", "text", minLen = 3)
    assert(o2b.isEmpty, "replay must append no owners")
    assert(r2b.orderBy("doc_id").as[(Long, String, Long, Long)]
        .collect().toSeq ==
      r2.orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq,
      "replay must reproduce the batch rewrite bit-for-bit")
  }

  test("dupSpanLengths: overlapping windows merge into maximal spans " +
      "before the histogram counts them") {
    val docs = Seq(
      (1L, "a b c d e x"),      // owner — contributes no spans
      (2L, "p q a b c d e r"),  // one merged 5-token span
      (3L, "m n o"),            // owner of the exact-L run
      (4L, "q m n o w")         // one 3-token span
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpanLengths(docs, "doc_id", "text", minLen = 3)
      .orderBy("span_len")
      .as[(Long, Long)].collect().toSeq
    // the 5-run is ONE span of 5 (not three windows of 3), the exact-L
    // run ONE span of 3 — window overlap never inflates the histogram
    assert(out == Seq((3L, 1L), (5L, 1L)))
  }

  // ---- paragraph/line-level exact dedup (L289/L291) ----

  private def lineFrame(rows: (Long, Long, String)*) =
    rows.toDF("doc_id", "pos", "line")

  test("dedupLines: first occurrence by (doc_id, pos) owns; stats and " +
      "rewritten text from a hand-checked fixture") {
    val lines = lineFrame(
      (1L, 1L, "alpha beta"), (1L, 2L, "gamma"),
      (2L, 1L, "alpha beta"), (2L, 2L, "delta"),   // line 1 duped from doc 1
      (3L, 1L, "gamma"), (3L, 2L, "alpha beta"))   // fully duplicated doc
    val out = Dedup.dedupLines(lines, "doc_id", "pos", "line")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 2L, 0L, 1.0, "alpha beta gamma"),
      (2L, 2L, 1L, 1L, 0.5, "delta"),
      (3L, 2L, 0L, 2L, 0.0, "")))
  }

  test("dedupLines: a value duplicated WITHIN one doc keeps exactly its " +
      "first position, and every value keeps exactly one site corpus-wide") {
    val lines = lineFrame(
      (1L, 1L, "x"), (1L, 2L, "x"), (1L, 3L, "y"),
      (2L, 1L, "y"), (2L, 2L, "x"))
    val tagged = Dedup.lineOwnershipTag(lines, "doc_id", "pos", "line")
    val kept = tagged.filter(col("kept"))
      .as[(Long, Long, String, Boolean)].collect().toSeq.sorted
    assert(kept.map(r => (r._1, r._2, r._3)) ==
      Seq((1L, 1L, "x"), (1L, 3L, "y")))
    // invariant: one owner per distinct value
    val owners = tagged.filter(col("kept")).groupBy("line").count()
      .as[(String, Long)].collect().toMap
    assert(owners.values.forall(_ == 1L))
  }

  test("dedupLinesIncremental == one-shot rebuild under arrival priority " +
      "(fold == rebuild), on the documents fixture chunked to lines") {
    val docs = graft.Tables.documents(spark, sfDir())
    val lines = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), expr("(size(t) + 9) div 10") - 1),
          k => array_join(slice(col("t"), k * 10 + 1, lit(10)), " "))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("line"))
    val folded = Dedup.dedupLinesIncremental(
      lines.filter(col("doc_id") % 10 =!= 3),
      lines.filter(col("doc_id") % 10 === 3),
      "doc_id", "pos", "line")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double, String)].collect().toSeq
    val rebuild = Dedup.dedupLines(lines, "doc_id", "pos", "line",
      prio = when(col("doc_id") % 10 === 3, 1L).otherwise(0L))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double, String)].collect().toSeq
    assert(folded == rebuild,
      "the incremental fold must reproduce the arrival-priority rebuild")
    // and the batch can never steal ownership from the standing corpus:
    // standing docs' stats are identical to a standing-only dedup
    val standingOnly = Dedup.dedupLines(
      lines.filter(col("doc_id") % 10 =!= 3), "doc_id", "pos", "line")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double, String)].collect().toSeq
    assert(folded.filter(_._1 % 10 != 3) == standingOnly)
  }

  test("repetitionStats: the Gopher within-doc battery from a hand-checked " +
      "fixture — duplicate lines, top-2-gram share, duplicated-5-gram " +
      "coverage union, pass-polarity gates") {
    // doc 1 = the same 10 tokens twice: its two 10-token lines are
    // identical, every 2-gram inside the half repeats, and the
    // duplicated 5-grams tile ALL 20 positions (coverage union = 1.0)
    val docs = Seq(
      (1L, "a b c d e f g h i j a b c d e f g h i j"),
      (2L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12 t13 t14 t15 t16 t17 t18 t19 t20")
    ).toDF("doc_id", "text")
    val lines = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), expr("(size(t) + 9) div 10") - 1),
          k => array_join(slice(col("t"), k * 10 + 1, lit(10)), " "))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("line"))
    val out = Text.repetitionStats(docs, lines, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double, Double, Double,
        Boolean, Boolean, Boolean, Boolean, Boolean)].collect().toSeq
    assert(out == Seq(
      // dup_line 1/2; dup chars 10/20; top 2-gram "a b" 2×2 chars / 20
      // = 0.2 EXACTLY (≤ gate boundary → passes); dup-5-gram cover 20/20
      (1L, 2L, 0.5, 0.5, 0.2, 1.0, false, false, true, false, false),
      // all distinct: zero repetition, top 2-gram is a count-1 6-char
      // gram over 51 token chars = 0.117647 half-up
      (2L, 2L, 0.0, 0.0, 0.117647, 0.0, true, true, true, true, true)))
  }
}
