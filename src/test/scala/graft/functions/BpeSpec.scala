package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The byte-level BPE kernel, pinned three ways: hand-worked merges on
  * corpora small enough to BPE by hand, structural properties (roundtrip,
  * byte tiling, determinism) on adversarial inputs, and a committed
  * fixture (the m3 hash-gate pattern: a deterministic synthetic corpus
  * whose trained merges + encodings are recorded as literals, so any
  * algorithmic drift — tie-break, merge order, greedy application —
  * fails loudly rather than silently re-training into a different
  * tokenizer).
  */
class BpeSpec extends AnyFunSuite {

  test("hand-worked training: 'ababab' merges (a,b) then (ab,ab)") {
    val merges = Bpe.train(Seq("ababab"), 10)
    // pairs: (a,b)×3 beats (b,a)×2 → merge0 = (97,98) = id 256;
    // then (256,256)×2 → merge1; then nothing repeats → early stop
    assert(merges.toSeq == Seq((97, 98), (256, 256)))
    val e = new Bpe.Encoder(merges)
    assert(e.encode("ababab").toSeq == Seq(257, 256))
    assert(e.encode("abab").toSeq == Seq(257))
    assert(e.encode("ab").toSeq == Seq(256))
    assert(e.encode("ba").toSeq == Seq(98, 97))
    assert(e.decode(e.encode("ababab")) == "ababab")
  }

  test("pair-count ties break on the smallest (left, right) ids — deterministic") {
    // "abcd abcd": (a,b), (b,c), (c,d) all count 2 → smallest pair wins
    val merges = Bpe.train(Seq("abcd abcd"), 1)
    assert(merges.toSeq == Seq((97, 98)))
    // and training is a pure function of the sample
    val again = Bpe.train(Seq("abcd abcd"), 1)
    assert(again.toSeq == merges.toSeq)
  }

  test("pre-tokenizer pieces tile the text exactly (GPT-2 pattern)") {
    val texts = Seq(
      "Hello, world!  It's 2026 — naïve café #42.",
      "  leading spaces", "trailing spaces  ", "", "a",
      "tabs\tand\nnewlines\r\nmixed", "12345 67890", "émojis 😀🎉 done",
      "can't won't it's we're I'll he'd you've I'm")
    texts.foreach { t =>
      assert(Bpe.pieces(t).mkString == t, s"pieces do not tile: '$t'")
    }
  }

  test("roundtrip + byte tiling on adversarial unicode, with and without merges") {
    val sample = Seq(
      "Hello, world! It's a test.", "héllo — ünïcode 😀 çæ", "\u0000\u0001 control",
      "ひらがな and 漢字 mixed", "  ", "a b  c   d")
    val trained = new Bpe.Encoder(Bpe.train(sample, 50))
    val empty = new Bpe.Encoder(Array.empty)
    for (e <- Seq(trained, empty); t <- sample) {
      val ids = e.encode(t)
      assert(e.decode(ids) == t, s"roundtrip failed: '$t'")
      val byteSum = ids.map(e.byteLen).sum
      assert(byteSum == t.getBytes("UTF-8").length,
        s"tokens do not tile the byte stream: '$t' ($byteSum)")
      assert(ids.forall(id => id >= 0 && id < e.vocabSize))
    }
  }

  test("merges actually compress: trained common word becomes one token") {
    val corpus = (1 to 50).map(_ => "the quick brown fox jumps over the lazy dog")
    val e = new Bpe.Encoder(Bpe.train(corpus, 200))
    // " the" (mid-sentence form, space-prefixed) is the most frequent
    // piece — with 200 merges it must compress to a single token
    assert(e.encodePiece(" the".getBytes("UTF-8")).length == 1)
    val n = e.encode(corpus.head).length
    val words = corpus.head.count(_ == ' ') + 1
    assert(n <= words + 2, s"$n tokens for $words words — merges not applying")
  }

  test("committed fixture: deterministic corpus trains a recorded tokenizer") {
    // the m3 hash-gate pattern: the corpus is generated, the expected
    // merges/ids were computed ONCE by this implementation and committed;
    // any algorithmic drift re-trains into a different table and fails
    val corpus = (0 until 64).map(i =>
      s"doc $i: the rate of unit u$i rose ${i % 7} points in window w${i % 5}")
    val merges = Bpe.train(corpus, 96)
    // early stop: after 36 merges no pair repeats in the template corpus
    assert(merges.length == 36, s"merge count drifted: ${merges.length}")
    assert(merges.take(8).toSeq == FixtureFirst8, s"merge head drifted: ${merges.take(8).toSeq}")
    val e = new Bpe.Encoder(merges)
    val ids = e.encode("doc 7: the rate of unit u7 rose 0 points in window w2")
    assert(ids.toSeq == FixtureIds, s"fixture encoding drifted: ${ids.toSeq}")
    assert(e.decode(ids) == "doc 7: the rate of unit u7 rose 0 points in window w2")
  }

  test("incremental pair-count trainer == naive recount trainer (property)") {
    // the incremental form (r19: per-merge updates of affected pieces
    // only) must be bit-equal to the r18 full recount on ANY sample —
    // same counts at every step means same argmax and same tie-breaks
    val rnd = new scala.util.Random(20260816L)
    val alphabet = "ab cd\n漢é1!"
    for (trial <- 1 to 30) {
      val texts = (0 until 1 + rnd.nextInt(25)).map { _ =>
        (0 until rnd.nextInt(60))
          .map(_ => alphabet.charAt(rnd.nextInt(alphabet.length))).mkString
      }
      val m = 1 + rnd.nextInt(64)
      assert(Bpe.train(texts, m).toSeq == Bpe.trainNaive(texts, m).toSeq,
        s"trial $trial diverged (sample: ${texts.take(3)}... merges $m)")
    }
    // and on the suite's own adversarial fixtures
    val fixtures = Seq(
      Seq("ababab"), Seq("abcd abcd"),
      Seq("Hello, world!  It's 2026 — naïve café #42.",
        "tabs\tand\nnewlines\r\nmixed", "émojis 😀🎉 done"))
    fixtures.foreach(f =>
      assert(Bpe.train(f, 100).toSeq == Bpe.trainNaive(f, 100).toSeq))
  }

  // committed fixture values (computed once from this implementation;
  // see the fixture test above for why they are literals)
  private val FixtureFirst8: Seq[(Int, Int)] = Seq(
    (105, 110), (32, 114), (32, 117), (32, 119), (100, 111), (32, 111),
    (32, 112), (32, 116))
  private val FixtureIds: Seq[Int] = Seq(
    277, 32, 55, 58, 280, 281, 278, 275, 258, 55, 282, 291, 284, 264, 283,
    259, 50)
}
