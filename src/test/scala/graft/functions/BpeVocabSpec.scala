package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Published-vocabulary interchange (VERDICT r18 missing #4): the
  * GPT-2-format merges.txt/vocab.json reader, pinned against COMMITTED
  * artifacts (src/test/resources/bpe/, generated once by
  * tools.BpeTool export and reviewed into git) — so the loader is gated
  * against bytes that outlive any in-process roundtrip. Plus the
  * in-process save→load roundtrip, the byte-unicode table's published
  * structure, and the model-id mapping.
  */
class BpeVocabSpec extends AnyFunSuite {

  private def resource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/bpe/$name")
    assert(in != null, s"missing test resource /bpe/$name")
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  test("the byte-unicode table is the published GPT-2 mapping") {
    // 188 printable latin-1 bytes map to themselves; the other 68 shift
    // into U+0100.. in byte order — the structure of bytes_to_unicode()
    assert(Bpe.byteToChar('A'.toInt) == 'A')
    assert(Bpe.byteToChar(' '.toInt) == 'Ġ') // the famous Ġ
    assert(Bpe.byteToChar(0) == 'Ā')
    assert(Bpe.byteToChar('\n'.toInt) == 'Ċ') // Ċ
    assert(Bpe.byteToChar(0xad) == 'Ń') // soft hyphen, the latin-1 gap
    assert(Bpe.byteToChar.distinct.length == 256, "table must be a bijection")
    (0 until 256).foreach(b =>
      assert(Bpe.charToByte(Bpe.byteToChar(b)) == b, s"inverse broke at $b"))
  }

  test("committed fixture: loaded artifact reproduces the pinned token ids") {
    val enc = Bpe.load(resource("mini_merges.txt"),
      Some(resource("mini_vocab.json")))
    val rows = resource("fixture.tsv").linesIterator.filter(_.nonEmpty).toSeq
    assert(rows.size == 5)
    rows.foreach { row =>
      val Array(rawText, idsStr) = row.split("\t", 2)
      val text = rawText.replace("\\t", "\t")
      val want = idsStr.trim.split(" ").map(_.toInt).toSeq
      val got = enc.encode(text).toSeq
      assert(got == want, s"imported tokenization drifted for '$text'")
      assert(enc.decode(got.toArray) == text)
      // the committed vocab.json is a self-export: published == internal
      assert(got.map(enc.publishedId) == want)
    }
  }

  test("save -> load roundtrips the merges table and the encodings exactly") {
    val sample = Seq(
      "roundtrip of the published format", "it's the format, isn't it?",
      "naïve café 123", "  spaces   and\ttabs\nand newlines",
      "the the the and and of of to to")
    val merges = Bpe.train(sample, 64)
    val loaded = Bpe.load(Bpe.saveMerges(merges),
      Some(Bpe.saveVocabJson(merges)))
    assert(loaded.merges.toSeq == merges.toSeq, "merges table drifted")
    val direct = new Bpe.Encoder(merges)
    sample.foreach { t =>
      assert(loaded.encode(t).toSeq == direct.encode(t).toSeq,
        s"loaded encoder diverged on '$t'")
    }
    // self-export publishes the internal id space
    (0 until loaded.vocabSize).foreach(id =>
      assert(loaded.publishedId(id) == id))
  }

  test("a non-identity vocab.json maps internal ids to the model's") {
    val merges = Bpe.train(Seq("remap remap remap tokens"), 16)
    // model ids shifted by 1000: every emitted id must map through
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(Bpe.saveVocabJson(merges))
    val m = new java.util.LinkedHashMap[String, Integer]()
    node.fields().forEachRemaining(e => m.put(e.getKey, e.getValue.asInt + 1000))
    val enc = Bpe.load(Bpe.saveMerges(merges), Some(om.writeValueAsString(m)))
    val ids = enc.encode("remap tokens")
    assert(ids.nonEmpty)
    ids.foreach(id => assert(enc.publishedId(id) == id + 1000))
  }

  test("inconsistent artifacts fail loud") {
    val merges = Bpe.train(Seq("aaa bbb aaa bbb"), 8)
    // vocab missing a merged token
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(Bpe.saveVocabJson(merges))
    val m = new java.util.LinkedHashMap[String, Integer]()
    node.fields().forEachRemaining(e => m.put(e.getKey, e.getValue.asInt))
    m.remove(m.keySet().iterator().next())
    val e = intercept[IllegalArgumentException] {
      Bpe.load(Bpe.saveMerges(merges), Some(om.writeValueAsString(m)))
    }
    assert(e.getMessage.contains("missing token"))
    // merges referencing an unknown (out-of-order) token
    val bad = "#version: 0.2\nĠt he\nĠ t\n"
    val e2 = intercept[IllegalArgumentException] { Bpe.load(bad) }
    assert(e2.getMessage.contains("unknown token"))
  }
}
