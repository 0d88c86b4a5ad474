package graft

import graft.ops.BpeOps
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSuite {

  private def docsOf(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("first merges are the hand-computed classic-BPE sequence") {
    // corpus: "aaab" x2, "aab" x1 (all symbols single chars initially)
    //   pairs: (a,a) = 2·2 + 1 = 5, (a,b) = 2 + 1 = 3  -> merge 1 = (a,a)
    //   then "aa|a|b" x2, "aa|b" x1:
    //   pairs: (aa,a) = 2, (a,b) = 2, (aa,b) = 1 — count tie broken
    //   lexicographically: ("a","b") < ("aa","a")      -> merge 2 = (a,b)
    val words = BpeOps.wordCounts(docsOf("aaab aaab aab"), maxWords = 100)
    assert(words == Seq(("aaab", 2L), ("aab", 1L)))
    val model = BpeOps.train(words, numMerges = 2)
    assert(model.merges == Seq(("a", "a"), ("a", "b")))
    // encoding replays training order: lowest-rank pair first
    assert(BpeOps.encodeWord("aaab", model.ranks) == Vector("aa", "ab"))
    assert(BpeOps.encodeWord("aab", model.ranks) == Vector("aa", "b"))
    // unseen word still encodes greedily from the learned table
    assert(BpeOps.encodeWord("aaa", model.ranks) == Vector("aa", "a"))
    assert(BpeOps.encodeWord("ba", model.ranks) == Vector("b", "a"))
  }

  test("round-trip: tokens concatenate back to every corpus word, all langs") {
    val docs = Tables.documents(spark, sf)
    val model = BpeOps.train(BpeOps.wordCounts(docs, 20000), numMerges = 200)
    val bad = BpeOps.encode(spark, docs, model)
      .select(col("doc_id"), concat_ws("", col("tokens")).as("joined"))
      .join(docs.select(col("doc_id"),
        regexp_replace(lower(col("text")), "\\s+", "").as("expect")), "doc_id")
      .where(col("joined") =!= col("expect"))
      .count()
    assert(bad == 0L, s"$bad documents did not round-trip through BPE tokens")
  }

  test("training is deterministic and merge count respects the budget") {
    val docs = Tables.documents(spark, sf)
    val words = BpeOps.wordCounts(docs, 20000)
    val m1 = BpeOps.train(words, numMerges = 120)
    val m2 = BpeOps.train(words, numMerges = 120)
    assert(m1.merges == m2.merges)
    assert(m1.merges.length <= 120 && m1.merges.nonEmpty)
    assert(m1.merges.distinct.length == m1.merges.length, "duplicate merge")
    // more merges strictly shorten (or preserve) every encoding
    val small = BpeOps.train(words, numMerges = 20)
    val w = words.head._1
    assert(BpeOps.encodeWord(w, m1.ranks).length
      <= BpeOps.encodeWord(w, small.ranks).length)
  }

  test("unicode: code-point symbols never split surrogate pairs") {
    val emoji = new String(Character.toChars(0x1F600)) // outside the BMP
    val word = s"a${emoji}b"
    val syms = BpeOps.codePointSymbols(word)
    assert(syms == Vector("a", emoji, "b"))
    assert(syms.mkString == word)
    // zh text (BMP multi-byte) round-trips through an empty model
    assert(BpeOps.encodeWord("中文", Map.empty).mkString == "中文")
  }

  test("learned vocab compresses the corpus vs the character baseline") {
    val docs = Tables.documents(spark, sf)
    val model = BpeOps.train(BpeOps.wordCounts(docs, 20000), numMerges = 200)
    val Array(r) = BpeOps.encode(spark, docs, model)
      .select(sum(size(col("tokens"))).as("tok"),
        sum(aggregate(transform(col("tokens"), t => length(t)),
          lit(0), (a, x) => a + x)).as("chars"))
      .collect()
    val (tok, chars) = (r.getLong(0), r.getLong(1))
    assert(tok < chars, s"BPE did not compress: $tok tokens vs $chars chars")
    // every emitted multi-char token is a trained vocab entry
    val vocab = model.vocab
    val alien = BpeOps.encode(spark, docs, model)
      .select(explode(col("tokens")).as("t"))
      .where(length(col("t")) > 1)
      .distinct().collect().map(_.getString(0))
      .filterNot(vocab.contains)
    assert(alien.isEmpty, s"tokens outside the trained vocab: ${alien.take(5).mkString(",")}")
  }

  test("vocabIds: colliding merge concatenations keep ids contiguous and UNK unused") {
    // (a,bc) and (ab,c) both concatenate to "abc" — the duplicate must be
    // deduped BEFORE id assignment, else toMap drops a slot, ids go
    // non-contiguous, and unkId = vocab.size collides with a real token.
    val words = Seq(("abc", 5L))
    val model = BpeOps.BpeModel(Seq(("b", "c"), ("a", "bc"), ("a", "b"), ("ab", "c")))
    val vocab = BpeOps.vocabIds(words, model)
    assert(vocab.values.toSeq.sorted == (0 until vocab.size), vocab)
    assert(!vocab.values.toSet.contains(vocab.size), vocab)
    assert(vocab.contains("abc") && vocab.contains("ab") && vocab.contains("bc"))
  }

  test("integer-id encode: ids invert to the same tokens, unknowns map to the UNK slot") {
    val docs = Tables.documents(spark, sf)
    val words = BpeOps.wordCounts(docs, 20000)
    val model = BpeOps.train(words, numMerges = 120)
    val vocab = BpeOps.vocabIds(words, model)
    // contiguous ids, merged symbols present, stable across calls
    assert(vocab.values.toSeq.sorted == (0 until vocab.size))
    assert(model.vocab.forall(vocab.contains))
    assert(BpeOps.vocabIds(words, model) == vocab)
    // ids ↔ tokens bijection on the corpus: decoding ids through the
    // inverted vocab reproduces the string tokens exactly
    val inv = vocab.map(_.swap)
    val strTokens = BpeOps.encode(spark, docs, model)
      .select(col("doc_id"), col("tokens")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val idTokens = BpeOps.encodeIds(spark, docs, model, vocab)
      .select(col("doc_id"), col("token_ids")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(idTokens.keySet == strTokens.keySet)
    val unkId = vocab.size
    idTokens.foreach { case (id, ids2) =>
      assert(!ids2.contains(unkId), s"doc $id produced UNK for in-corpus text")
      assert(ids2.map(inv) == strTokens(id), s"doc $id ids do not invert")
    }
    // an out-of-corpus symbol becomes UNK, not a crash
    import spark.implicits._
    val alien = Seq((999L, "☃")).toDF("doc_id", "text") // snowman
    val got = BpeOps.encodeIds(spark, alien, model, vocab)
      .collect()(0).getSeq[Int](1)
    assert(got == Seq(unkId))
  }

  test("encodeStats: deterministic, rows for every document, exact char accounting") {
    val out1 = ops.BpeOps.encodeStats(spark, sf).collect()
    val out2 = ops.BpeOps.encodeStats(spark, sf).collect()
    assert(out1.map(_.toSeq).toSeq == out2.map(_.toSeq).toSeq)
    assert(out1.length == Tables.documents(spark, sf).count())
    // n_chars equals the document's non-whitespace length (lossless tokens)
    val expect = Tables.documents(spark, sf)
      .select(col("doc_id"),
        length(regexp_replace(lower(col("text")), "\\s+", "")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out1.foreach(r => assert(r.getInt(2) == expect(r.getLong(0)), s"doc ${r.getLong(0)}"))
  }

  test("compressionStats: ratio rises with merge budget, bounds hold, basis points exact") {
    val docs = Tables.documents(spark, sf)
    val words = ops.BpeOps.wordCounts(docs, maxWords = 20000)
    def statsFor(merges: Int) =
      ops.BpeOps.compressionStats(spark, docs, ops.BpeOps.train(words, merges))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val base = statsFor(0)     // character tokenizer: one token per char
    val fit = statsFor(200)
    assert(base.keySet == fit.keySet)
    // 0 merges = character baseline: tokens == chars, ratio exactly 10000
    base.values.filter(_._1 > 0).foreach { case (chars, toks, bp) =>
      assert(toks == chars && bp == 10000L)
    }
    // more merges never add tokens; corpus-wide they strictly compress
    fit.foreach { case (id, (chars, toks, bp)) =>
      assert(toks <= base(id)._2, s"doc $id grew under merges")
      assert(chars == base(id)._1)
      // per-word lower bound: a token is at least one char, a word >= 1 token
      if (toks > 0) assert(bp == chars * 10000L / toks, s"doc $id basis points")
    }
    assert(fit.values.map(_._2).sum < base.values.map(_._2).sum,
      "200 merges failed to compress the corpus")
  }
}
