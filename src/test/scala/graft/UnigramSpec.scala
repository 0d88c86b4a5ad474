package graft

import graft.ops.{BpeOps, UnigramOps}
import org.apache.spark.sql.functions._

/** Semantic pins for the unigram-LM tokenizer (UnigramOps): Viterbi
  * segmentation against hand-computed optima, deterministic training,
  * coverage (single chars never pruned), and the lossless
  * decode∘encode roundtrip the j48 gate hashes.
  */
class UnigramSpec extends SparkSuite {

  test("viterbi picks the max-probability segmentation (hand-computed)") {
    // p(ab)=0.4, p(a)=p(b)=0.1, p(abc)=0.05, p(c)=0.3
    // "abc": ab+c = log(.4)+log(.3) = log(.12) beats abc = log(.05)
    //        and a+b+c = log(.003)
    val logp = Map("ab" -> math.log(0.4), "a" -> math.log(0.1),
      "b" -> math.log(0.1), "abc" -> math.log(0.05), "c" -> math.log(0.3))
    assert(UnigramOps.viterbi("abc", logp, 6) == Vector("ab", "c"))
    // raise p(abc) above the product: single piece wins
    val logp2 = logp + ("abc" -> math.log(0.2))
    assert(UnigramOps.viterbi("abc", logp2, 6) == Vector("abc"))
  }

  test("viterbi tie prefers the longer last piece") {
    // p(ab) = p(a)·p(b): scores tie exactly; convention keeps "ab"
    val logp = Map("a" -> math.log(0.5), "b" -> math.log(0.5),
      "ab" -> math.log(0.25))
    assert(UnigramOps.viterbi("ab", logp, 6) == Vector("ab"))
  }

  test("viterbi returns null only when a character is unknown") {
    val logp = Map("a" -> math.log(0.5))
    assert(UnigramOps.viterbi("ax", logp, 6) == null)
    assert(UnigramOps.viterbi("aa", logp, 6) == Vector("a", "a"))
  }

  test("training is deterministic and never prunes single characters") {
    val words = Seq(("the", 50L), ("then", 20L), ("there", 10L),
      ("cat", 30L), ("cats", 25L), ("concatenate", 2L), ("dog", 7L))
    val m1 = UnigramOps.train(words, vocabSize = 20)
    val m2 = UnigramOps.train(words, vocabSize = 20)
    assert(m1.pieces == m2.pieces, "same corpus must train identically")
    val pieceSet = m1.pieces.map(_._1).toSet
    val chars = words.flatMap(_._1.toSeq).map(_.toString).distinct
    chars.foreach(c => assert(pieceSet.contains(c), s"char '$c' pruned"))
    // a frequent substring must survive as a multi-char piece
    assert(m1.pieces.exists(p => p._1.length > 1), "no multi-char piece learned")
  }

  test("every training word segments with pieces only (no fallback)") {
    val words = Seq(("alpha", 5L), ("beta", 4L), ("alphabet", 3L), ("ab", 2L))
    val m = UnigramOps.train(words, vocabSize = 30)
    words.foreach { case (w, _) =>
      val segs = UnigramOps.viterbi(w, m.logp, m.maxLen)
      assert(segs != null && segs.mkString("") == w, s"$w -> $segs")
    }
  }

  test("surrogate pairs never split across piece boundaries") {
    val emoji = new String(Character.toChars(0x1F600)) // astral plane
    val words = Seq((s"hi$emoji", 5L), (emoji * 2, 3L), ("hi", 9L))
    val m = UnigramOps.train(words, vocabSize = 20)
    words.foreach { case (w, _) =>
      val segs = UnigramOps.viterbi(w, m.logp, m.maxLen)
      assert(segs != null, s"$w uncovered")
      segs.foreach { p =>
        assert(!Character.isLowSurrogate(p.charAt(0)), s"piece '$p' starts mid-pair")
        assert(!Character.isHighSurrogate(p.charAt(p.length - 1)), s"piece '$p' ends mid-pair")
      }
      assert(segs.mkString("") == w)
    }
  }

  test("distributed encode/decode roundtrip reproduces the normalized text") {
    val docs = Tables.documents(spark, sf).limit(50)
    val model = UnigramOps.train(BpeOps.wordCounts(docs, maxWords = 20000))
    val decoded = BpeOps.decodeIds(spark,
      UnigramOps.encodeIds(spark, docs, model), model.ids)
    val got = decoded.orderBy("doc_id").collect().map(_.getString(1))
    val want = docs.select(col("doc_id"),
        array_join(filter(split(lower(col("text")), "\\s+"),
          x => length(x) > 0), "").as("t"))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(got.sameElements(want))
  }

  test("unigram compresses: fewer tokens than characters on real text") {
    val docs = Tables.documents(spark, sf).limit(100)
    val model = UnigramOps.train(BpeOps.wordCounts(docs, maxWords = 20000))
    val stats = UnigramOps.encodeIds(spark, docs, model)
      .select(sum(size(col("token_ids"))).cast("long").as("toks"))
      .head().getLong(0)
    val chars = docs.select(sum(length(
        regexp_replace(lower(col("text")), "\\s+", ""))).cast("long"))
      .head().getLong(0)
    assert(stats < chars, s"$stats tokens vs $chars chars — nothing learned")
  }
}
