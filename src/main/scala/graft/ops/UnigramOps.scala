package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trainable unigram-LM tokenizer (the SentencePiece unigram model,
  * Kudo 2018 arXiv:1804.10959) — the second tokenizer family every
  * modern pipeline offers beside BPE (graft.ops.BpeOps): instead of a
  * greedy merge table, a piece VOCABULARY with probabilities, and
  * encoding = the Viterbi segmentation maximizing Σ log p(piece).
  *
  * Scale shape — identical to BpeOps by design: the ONLY corpus-scale
  * work is the one distributed word-count (map-side combined groupBy,
  * one shuffle); seeding, EM, and pruning run on the bounded
  * word→count dictionary driver-side; encoding broadcasts the (≤ vocab
  * target) piece table back out as a narrow per-partition map with a
  * per-word memo. Nothing but the word-count grows with the corpus.
  *
  * Fidelity vs the paper, documented honestly: E-step is hard-EM
  * (Viterbi counts) rather than forward-backward expected counts, and
  * pruning is by estimated piece count rather than per-piece likelihood
  * loss — both standard simplifications; the structure (seed → EM →
  * prune → final re-estimate, single-char pieces never pruned so any
  * word of known characters segments) is the paper's. Determinism:
  * every ordering ties on the piece string; Viterbi ties prefer the
  * LONGER last piece (then fewer pieces overall), so two trainings of
  * the same corpus produce identical vocabularies and segmentations
  * (UnigramSpec pins this, plus hand-computed segmentations).
  */
object UnigramOps {

  /** Pieces in their deterministic training order with log
    * probabilities; single-code-point pieces are a subset (coverage).
    */
  final case class UnigramModel(pieces: Vector[(String, Double)], maxLen: Int) {
    lazy val logp: Map[String, Double] = pieces.toMap
    lazy val ids: Map[String, Int] = pieces.map(_._1).zipWithIndex.toMap
  }

  /** Viterbi segmentation of `word` under `logp`: maximize the summed
    * piece log-probability over all segmentations into known pieces
    * (≤ maxLen chars each). Ties prefer the longer last piece, then
    * propagate — the deterministic convention UnigramSpec pins. Returns
    * null when some character has no piece (impossible for corpus
    * words: single chars are never pruned).
    */
  private[graft] def viterbi(word: String, logp: Map[String, Double],
                             maxLen: Int): Vector[String] = {
    val n = word.length
    if (n == 0) return Vector.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1) // start index of the piece ending at i
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      // longest candidate first; strict improvement keeps the longer
      // last piece on ties
      var j = math.max(0, i - maxLen)
      // never split a surrogate pair: a piece boundary inside one would
      // manufacture unpaired halves that can't round-trip through UTF-8
      while (j < i) {
        val boundaryOk =
          (j == 0 || !Character.isHighSurrogate(word.charAt(j - 1)) ||
            !Character.isLowSurrogate(word.charAt(j))) &&
          (i == n || !Character.isHighSurrogate(word.charAt(i - 1)) ||
            !Character.isLowSurrogate(word.charAt(i)))
        if (boundaryOk && best(j) != Double.NegativeInfinity) {
          logp.get(word.substring(j, i)) match {
            case Some(lp) =>
              val s = best(j) + lp
              if (s > best(i)) { best(i) = s; back(i) = j }
            case None =>
          }
        }
        j += 1
      }
      i += 1
    }
    if (best(n) == Double.NegativeInfinity) return null
    var out = List.empty[String]
    var k = n
    while (k > 0) {
      val j = back(k)
      out = word.substring(j, k) :: out
      k = j
    }
    out.toVector
  }

  /** Seed vocabulary: every substring (length 2..maxLen, surrogate-safe
    * boundaries) of the dictionary words, weighted by word count; top
    * `seedSize` by (count desc, piece asc), PLUS every single code
    * point (coverage floor, never pruned). Mirrors the paper's
    * "reasonably big seed from the frequent substrings".
    */
  private[graft] def seedPieces(words: Seq[(String, Long)], maxLen: Int,
                                seedSize: Int): (Vector[String], Vector[String]) = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    val chars = scala.collection.mutable.TreeSet.empty[String]
    words.foreach { case (w, n) =>
      val bounds = codePointBounds(w)
      var a = 0
      while (a < bounds.length - 1) {
        chars += w.substring(bounds(a), bounds(a + 1))
        var b = a + 1
        while (b < bounds.length && bounds(b) - bounds(a) <= maxLen) {
          if (b > a + 1) { // multi-code-point substrings only
            val p = w.substring(bounds(a), bounds(b))
            counts.update(p, counts.getOrElse(p, 0L) + n)
          }
          b += 1
        }
        a += 1
      }
    }
    val multi = counts.iterator.filter(_._2 >= 2).toVector
      .sortBy { case (p, n) => (-n, p) }
      .take(seedSize).map(_._1)
    (chars.toVector, multi)
  }

  /** Code-point boundary offsets of `w` (0 and w.length included). */
  private def codePointBounds(w: String): Array[Int] = {
    val out = Array.newBuilder[Int]
    var i = 0
    out += 0
    while (i < w.length) {
      i += Character.charCount(w.codePointAt(i))
      out += i
    }
    out.result()
  }

  /** Train on the bounded dictionary: seed → `emIters` rounds of
    * hard-EM (Viterbi counts, add-nothing MLE with the single-char
    * floor) → prune to `vocabSize` by estimated count (chars exempt) →
    * one final re-estimate over the pruned vocabulary.
    */
  def train(words: Seq[(String, Long)], vocabSize: Int = 1200,
            maxLen: Int = 6, seedSize: Int = 4000,
            emIters: Int = 3): UnigramModel = {
    val (chars, multi) = seedPieces(words, maxLen, seedSize)
    val charSet = chars.toSet

    // floor probability for zero-count chars: below any real piece but
    // finite, so coverage never dies while EM reallocates mass
    def estimate(pieceSet: Vector[String], prior: Map[String, Double]):
        Vector[(String, Double)] = {
      val counts = scala.collection.mutable.HashMap.empty[String, Double]
      words.foreach { case (w, n) =>
        val segs = viterbi(w, prior, maxLen)
        if (segs != null) segs.foreach(p =>
          counts.update(p, counts.getOrElse(p, 0.0) + n.toDouble))
      }
      val total = math.max(1.0, counts.valuesIterator.sum)
      val floor = math.log(0.1 / total)
      pieceSet.map { p =>
        val c = counts.getOrElse(p, 0.0)
        p -> (if (c > 0) math.log(c / total) else floor)
      }
    }

    // init: substring-count prior (chars get their own counts too)
    val all0 = chars ++ multi
    val seedSet = all0.toSet
    val rawCounts = scala.collection.mutable.HashMap.empty[String, Double]
    words.foreach { case (w, n) =>
      val bounds = codePointBounds(w)
      var a = 0
      while (a < bounds.length - 1) {
        var b = a + 1
        while (b < bounds.length && bounds(b) - bounds(a) <= maxLen) {
          val p = w.substring(bounds(a), bounds(b))
          if (seedSet.contains(p))
            rawCounts.update(p, rawCounts.getOrElse(p, 0.0) + n.toDouble)
          b += 1
        }
        a += 1
      }
    }
    val t0 = math.max(1.0, rawCounts.valuesIterator.sum)
    var model: Vector[(String, Double)] =
      all0.map(p => p -> math.log(
        math.max(rawCounts.getOrElse(p, 0.0), 0.1) / t0))

    var it = 0
    while (it < emIters) {
      model = estimate(model.map(_._1), model.toMap)
      it += 1
    }
    // prune: keep all chars + the top (vocabSize - chars) multi-char
    // pieces by final estimated count order ≈ logp desc, piece asc
    val keepMulti = model.iterator
      .filter { case (p, _) => !charSet.contains(p) }
      .toVector
      .sortBy { case (p, lp) => (-lp, p) }
      .take(math.max(0, vocabSize - chars.length))
      .map(_._1).toSet
    val pruned = model.filter { case (p, _) =>
      charSet.contains(p) || keepMulti.contains(p) }
    // final re-estimate over the pruned vocabulary; deterministic
    // layout: chars sorted first, then multi pieces by (logp desc, piece)
    val fin = estimate(pruned.map(_._1), pruned.toMap).toMap
    val ordered =
      chars.map(c => c -> fin(c)) ++
        pruned.map(_._1).filterNot(charSet.contains)
          .map(p => p -> fin(p)).sortBy { case (p, lp) => (-lp, p) }
    UnigramModel(ordered, maxLen)
  }

  /** Distributed encode to integer ids: broadcast the piece table,
    * Viterbi per word with a per-partition memo (Zipf ⇒ high hit rate,
    * per-task ⇒ bounded executor memory). Unknown characters (absent
    * from the training dictionary) map to `unkId` = vocab size.
    */
  def encodeIds(spark: SparkSession, docs: DataFrame,
                model: UnigramModel): DataFrame = {
    import spark.implicits._
    val bPieces = spark.sparkContext.broadcast((model.logp, model.ids, model.maxLen))
    val unkId = model.pieces.length
    docs.select(col("doc_id"), lower(col("text")).as("text"))
      .as[(Long, String)]
      .mapPartitions { itr =>
        val (logp, ids, maxLen) = bPieces.value
        val memo = scala.collection.mutable.HashMap.empty[String, Array[Int]]
        itr.map { case (id, text) =>
          val tokens = text.split("\\s+").iterator.filter(_.nonEmpty).flatMap { w =>
            memo.getOrElseUpdate(w, {
              val segs = viterbi(w, logp, maxLen)
              if (segs == null)
                // unknown character somewhere: per-char fallback, UNK
                // where even the char is unknown — corruption stays
                // VISIBLE in the roundtrip hash, never silent
                codePointPieces(w).map(c => ids.getOrElse(c, unkId)).toArray
              else segs.map(ids(_)).toArray
            })
          }.toSeq
          (id, tokens)
        }
      }
      .toDF("doc_id", "token_ids")
  }

  private def codePointPieces(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val c = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + c)
      i += c
    }
    out.result()
  }

  /** j48 — the unigram tokenizer end to end under the j27 HASH gate:
    * md5 of decode(encodeIds(text)) per document. Distributed
    * word-count → driver EM training on the bounded dictionary →
    * broadcast Viterbi encode → broadcast decode (shared with BPE —
    * [[BpeOps.decodeIds]] is tokenizer-agnostic); the oracle recomputes
    * the same bytes from first principles, so a dropped vocab slot, a
    * non-covering prune, an id collision, or a spurious UNK all flip
    * the hash. Word boundaries are not recoverable from a flat id
    * stream, so the reconstruction target is the concatenation of the
    * normalized words, exactly as in j27.
    */
  val j48_unigram_roundtrip: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val model = train(BpeOps.wordCounts(docs, maxWords = 20000))
    BpeOps.decodeIds(s, encodeIds(s, docs, model),
      model.ids)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("rt_md5"))
      .orderBy(col("doc_id").asc_nulls_last)
  }

  val queries: Map[String, Q] = Map("j48_unigram_roundtrip" -> j48_unigram_roundtrip)
}
