package graft

import graft.ops.LangIdOps
import org.apache.spark.sql.functions._

/** Language-ID semantics (ops/LangIdOps.scala): planted-language
  * recovery — languages synthesized with DISJOINT character statistics
  * must be recovered exactly on held-out documents (the discrimination
  * proof the j60 oracle gate, which runs on signal-free fixture text,
  * cannot give) — plus vocabulary-cap equivalence and determinism.
  */
class LangIdSpec extends SparkSuite {

  /** Three pseudo-languages with disjoint letter inventories; doc i of a
    * language is a deterministic word soup over its alphabet.
    */
  private def planted(perLang: Int) = {
    import spark.implicits._
    val alphabets = Map("aa" -> "abc", "bb" -> "mnp", "cc" -> "xyz")
    val rows = for {
      (lang, ab) <- alphabets.toSeq
      i <- 0 until perLang
    } yield {
      val words = (0 until 40).map { w =>
        val h = (i * 131 + w * 17) % 27
        s"${ab(h % 3)}${ab((h / 3) % 3)}${ab((h / 9) % 3)}"
      }
      (lang.hashCode.toLong * 1000 + i, lang, words.mkString(" "))
    }
    rows.toDF("doc_id", "lang", "text")
  }

  test("planted languages are recovered exactly on held-out docs") {
    val docs = planted(20)
    // train on doc index < 12 per language, score the held-out rest
    val trainSlice = docs.where(col("doc_id") % 1000 < 12)
    val heldOut = docs.where(col("doc_id") % 1000 >= 12)
    val m = LangIdOps.train(trainSlice)
    val confusion = LangIdOps.predict(heldOut, m)
      .join(heldOut.select("doc_id", "lang"), "doc_id")
      .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // exact integers: a perfectly diagonal 3x3 matrix, 8 held-out each
    assert(confusion == Map(("aa", "aa") -> 8L, ("bb", "bb") -> 8L,
      ("cc", "cc") -> 8L), s"confusion not diagonal: $confusion")
  }

  test("trigram profiles recover the planted languages too") {
    val docs = planted(10)
    val m = LangIdOps.train(docs, n = 3)
    val wrong = LangIdOps.predict(docs, m)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .where(col("pred") =!= col("lang")).count()
    assert(wrong == 0L, s"$wrong trigram misclassifications on training data")
  }

  test("a generous vocab cap does not change predictions") {
    val docs = planted(10)
    val full = LangIdOps.predict(docs, LangIdOps.train(docs))
    val capped = LangIdOps.predict(docs, LangIdOps.trainCapped(docs, cap = 1000))
    assert(full.exceptAll(capped).isEmpty && capped.exceptAll(full).isEmpty,
      "cap larger than the vocabulary changed predictions")
  }

  test("a tight vocab cap keeps only the top grams but still predicts every doc") {
    val docs = planted(10)
    val m = LangIdOps.trainCapped(docs, cap = 5)
    assert(m.profiles.select("g").distinct().count() == 5L)
    val preds = LangIdOps.predict(docs, m)
    assert(preds.count() == docs.count(), "a doc lost its prediction under the cap")
  }

  test("curation langIdStage recovers lang for docs with junk labels") {
    val docs = planted(10)
    // crawl reality: half the labels are junk; the trusted slice trains
    val crawl = docs.withColumn("lang",
      when(col("doc_id") % 2 === 0, lit("und")).otherwise(col("lang")))
    val trusted = crawl.where(col("lang") =!= "und")
    val relabeled = graft.ops.CurateOps.langIdStage(crawl, trusted)
    val truth = docs.select(col("doc_id"), col("lang").as("want"))
    val wrong = relabeled.join(truth, "doc_id")
      .where(col("lang") =!= col("want")).count()
    assert(wrong == 0L, s"$wrong docs keep a wrong language after the stage")
    assert(relabeled.count() == docs.count())
  }

  test("langIdStage keeps docs too short to predict, labeled 'und'") {
    import spark.implicits._
    // a doc whose text is shorter than one bigram emits NO prediction row
    // (explodeGrams keeps length >= n); the stage must keep it with the
    // undetermined label instead of silently dropping it (ADVICE r14)
    val docs = planted(5).unionByName(
      Seq((999999L, "zz", "a"), (999998L, "zz", "")).toDF("doc_id", "lang", "text"))
    val trusted = planted(5)
    val out = graft.ops.CurateOps.langIdStage(docs, trusted)
    assert(out.count() == docs.count(), "short docs were dropped by the stage")
    val shorts = out.where(col("doc_id").isin(999998L, 999999L))
      .select("doc_id", "lang").collect()
    assert(shorts.length == 2)
    assert(shorts.forall(_.getString(1) == "und"),
      s"short docs should read 'und', got ${shorts.mkString(",")}")
  }

  test("row-local (literal-model) prediction bit-equals the relational predict") {
    val docs = planted(15)
    val m = LangIdOps.train(docs)
    val rel = LangIdOps.predict(docs, m).orderBy("doc_id").collect().toSeq
    val local = LangIdOps.predictRowLocal(docs, LangIdOps.literalModel(m))
      .orderBy("doc_id").collect().toSeq
    assert(rel == local, "serving path diverges from the relational path")
    // and on the signal-free fixture corpus too (near-ties everywhere —
    // the argmax tie-break must agree exactly)
    val fx = Tables.documents(spark, sf)
    val mfx = LangIdOps.train(fx)
    val a = LangIdOps.predict(fx, mfx).orderBy("doc_id").collect().toSeq
    val b = LangIdOps.predictRowLocal(fx, LangIdOps.literalModel(mfx))
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "fixture-corpus predictions diverge between paths")
  }

  test("literalModel refuses an uncapped model past its entry bound") {
    val docs = planted(5)
    val m = LangIdOps.train(docs)
    intercept[IllegalArgumentException] {
      LangIdOps.literalModel(m, maxEntries = 3)
    }
  }

  test("prediction is deterministic across repartitionings") {
    val docs = planted(10)
    val m = LangIdOps.train(docs)
    val a = LangIdOps.predict(docs, m).orderBy("doc_id").collect().toSeq
    val b = LangIdOps.predict(docs.repartition(13), m)
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "prediction depends on partitioning")
  }
}
