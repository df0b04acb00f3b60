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

  test("blockedJaccardPairs: pairs only within a block") {
    val df = Seq(
      (1L, "a b c d e", "s1"), (2L, "a b c d e", "s1"),
      (3L, "a b c d e", "s2")).toDF("doc_id", "text", "source")
    val pairs = Dedup.blockedJaccardPairs(df, "doc_id", "text", "source", 3, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L))) // doc 3 identical but in another block
  }
}
