package graft

import org.apache.spark.sql.functions._
import graft.functions.{BpeAlgos, BpeEncodeExpr}

/** BPE tokenizer ([[graft.functions.BpeAlgos]]): hand-derived training
  * goldens, greedy-encode semantics (rank order, leftmost ties, unseen
  * symbols), and the distributed train→encode round trip. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("train: hand-derived merge sequence with weighted counts and lex ties") {
    // vocab "aaab"x2: round 1 (a,a)=4 beats (a,b)=2 -> merge (a,a), words
    // become [aa,a,b]; round 2 (aa,a)=2 ties (a,b)=2 -> lex picks (a,b) ->
    // [aa,ab]; round 3 merges (aa,ab)
    val merges = BpeAlgos.train(Seq("aaab" -> 2L), numMerges = 3)
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("train stops early when no pairs remain") {
    assert(BpeAlgos.train(Seq("ab" -> 1L), numMerges = 10) == Seq(("a", "b")))
    assert(BpeAlgos.train(Seq("x" -> 5L), numMerges = 10).isEmpty)
  }

  test("encode: rank order wins over position, leftmost on rank ties, unseen untouched") {
    val ranks = Map(("a", "a") -> 0, ("a", "b") -> 1, ("aa", "ab") -> 2)
    assert(BpeAlgos.encodeWord("aaab", ranks).toSeq == Seq("aaab"))
    assert(BpeAlgos.encodeWord("aab", ranks).toSeq == Seq("aa", "b"))
    // (a,b) exists at idx 1 but (a,a) at idx 0 has lower rank — merging it
    // first consumes the 'a' that (a,b) wanted, stranding b and the tail a
    assert(BpeAlgos.encodeWord("aaba", ranks).toSeq == Seq("aa", "b", "a"))
    assert(BpeAlgos.encodeWord("ba", ranks).toSeq == Seq("b", "a"))
    assert(BpeAlgos.encodeWord("", ranks).isEmpty)
  }

  test("trained-to-convergence merges collapse every seen word to one token") {
    val vocab = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = BpeAlgos.train(vocab, numMerges = 100)
    val ranks = merges.zipWithIndex.toMap
    vocab.foreach { case (w, _) =>
      assert(BpeAlgos.encodeWord(w, ranks).toSeq == Seq(w), s"word $w")
    }
    // unseen word with seen subwords tokenizes into learned subunits, not chars
    val toks = BpeAlgos.encodeWord("lowest", ranks)
    assert(toks.length < "lowest".length && toks.length > 1)
  }

  test("distributed round trip: expression encodes with the trained merges") {
    val docs = Seq((1L, "low low lower"), (2L, "newest widest"), (3L, ""))
      .toDF("doc_id", "text")
    val out = graft.operators.Text
      .bpeTokenize(docs, col("doc_id"), col("text"), numMerges = 100)
      .as[(Long, Int, Int)].collect().map { case (k, a, b) => k -> ((a, b)) }.toMap
    // converged training: every seen word is one token
    assert(out(1L) == ((3, 2))) // low, low, lower -> 2 unique
    assert(out(2L) == ((2, 2)))
    assert(out(3L) == ((0, 0))) // empty doc -> zero tokens
  }

  test("bounded train: non-binding minFreq/maxVocab change nothing; a " +
      "binding cap trains on the deterministic top-V words only") {
    val docs = Seq((1L, "low low lower"), (2L, "newest widest"), (3L, ""))
      .toDF("doc_id", "text")
    def run(minFreq: Long, maxVocab: Int) = graft.operators.Text
      .bpeTokenize(docs, col("doc_id"), col("text"), numMerges = 100,
        minFreq = minFreq, maxVocab = maxVocab)
      .as[(Long, Int, Int)].collect().map { case (k, a, b) => k -> ((a, b)) }.toMap
    // defaults are non-binding on a small vocab — identical to uncapped
    assert(run(1L, 1000000) ==
      Map(1L -> ((3, 2)), 2L -> ((2, 2)), 3L -> ((0, 0))))
    // minFreq=2 floors out every hapax: only "low" (c=2) trains, so
    // "low" collapses to one token while lower/newest/widest stay
    // character-level (l,o,w merged inside them where applicable)
    val floored = run(2L, 1000000)
    assert(floored(1L)._1 < 3 + 5 + 5 && floored(2L)._1 > 2,
      s"hapax words must not fully collapse: $floored")
    // maxVocab=1 keeps only the (c desc, w asc) top word — "low" —
    // deterministically; same training set as the minFreq=2 floor here
    assert(run(1L, 1) == floored)
  }

  test("token-count bounds: words <= bpe tokens <= chars on real text") {
    val docs = Seq((1L, "some words repeat some words here"))
      .toDF("doc_id", "text")
    val r = graft.operators.Text
      .bpeTokenize(docs, col("doc_id"), col("text"), numMerges = 3)
      .collect()(0)
    val nTok = r.getInt(1)
    assert(nTok >= 6) // at least one token per word
    assert(nTok <= "somewordsrepeatsomewordshere".length)
  }
}
