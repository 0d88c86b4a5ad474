package graft

import graft.ops.TextAnalysisOps
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  test("langId picks the right profile on crafted texts") {
    val crafted = Seq(
      (1L, "the cat is in the house and it is warm for the winter"),
      (2L, "der hund ist nicht in das haus und die katze ist mit ein ball"),
      (3L, "el perro y la casa de los gatos en una calle por la noche con pan"),
      (4L, "le chien est dans la maison et les chats pour une nuit dans le jardin que"),
      (5L, "中文文本处理测试数据")
    ).toDF("doc_id", "text")
    val pred = TextAnalysisOps.withLang(crafted)
      .select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred(1L) == "en"); assert(pred(2L) == "de"); assert(pred(3L) == "es")
    assert(pred(4L) == "fr"); assert(pred(5L) == "zh")
  }

  test("quality features are bounded and quality score in [0,1]") {
    val docs = Tables.documents(spark, sf)
    val feats = TextAnalysisOps.qualityFeatures(docs)
    assert(feats.where(col("alpha_ratio") < 0 || col("alpha_ratio") > 1).count() == 0)
    assert(feats.where(col("punct_ratio") < 0 || col("punct_ratio") > 1).count() == 0)
    val q = TextAnalysisOps.qualityScore(docs)
    assert(q.where(col("quality") < 0 || col("quality") > 1).count() == 0)
  }

  test("token counts: ws <= bpeish, both positive on fixture docs") {
    val tc = TextAnalysisOps.tokenCounts(Tables.documents(spark, sf))
    assert(tc.where(col("ws_tokens") <= 0).count() == 0)
    assert(tc.where(col("bpe_tokens") < col("ws_tokens")).count() == 0,
      "bpe-ish tokenization must split at least as finely as whitespace")
  }

  test("fingerprints: identical text same prints; mutation changes few") {
    val docs = Tables.documents(spark, sf).limit(30).cache()
    val fp1 = TextAnalysisOps.fingerprints(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val fp2 = TextAnalysisOps.fingerprints(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fp1.forall { case (k, v) => fp2(k) == v })
    // appending a token preserves most prints (winnowing locality)
    val mutated = docs.select(col("doc_id"), concat(col("text"), lit(" zz")).as("text"))
    val fpm = TextAnalysisOps.fingerprints(mutated).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    fp1.foreach { case (k, v) =>
      val keep = v.toSet.intersect(fpm(k).toSet).size.toDouble / v.size
      assert(keep > 0.7, s"doc $k kept only ${keep * 100}%% of prints after 1-token append")
    }
  }

  test("PII scrub: removes every match, idempotent, leaves clean text alone") {
    import ops.TextOps.{piiEmail, piiIp, piiPhone, piiScrub}
    val rows = Seq(
      "mail bob.smith+x@corp.example.co.uk and 10.0.255.3 then +1-555-0042",
      "no pii here at all",
      "edge a@b.io end 1.2.3.4",           // minimal-length email, bare IP
      "999.999.999.999 still an ip shape", // \d{1,3} accepts any 3 digits
      "already <EMAIL> <IP> <PHONE> done")
    val df = rows.toDF("t").select(col("t"), piiScrub(col("t")).as("s"))
    // no residual matches of any class in the scrubbed text
    val residual = df.select(
      sum(regexp_count(col("s"), lit(piiEmail))) +
        sum(regexp_count(col("s"), lit(piiIp))) +
        sum(regexp_count(col("s"), lit(piiPhone)))).first().getLong(0)
    assert(residual == 0, s"scrubbed text still matches PII patterns: $residual")
    // idempotence: scrubbing a second time is a no-op
    assert(df.where(piiScrub(col("s")) =!= col("s")).count() == 0)
    // PII-free text passes through byte-identical
    val clean = df.where(col("t") === "no pii here at all").first()
    assert(clean.getString(1) == "no pii here at all")
  }

  test("chunker: stride-slices reassemble every document exactly; interior overlap is k-stride") {
    val k = 20; val stride = 15
    val docs = Tables.documents(spark, sf).where(col("doc_id") < 50)
    val chunks = graft.ops.TextOps.chunkDocs(docs, k, stride)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val orig = docs.select(col("doc_id"), lower(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.keySet == orig.keySet, "a document produced no chunks")
    chunks.foreach { case (id, rows) =>
      val sorted = rows.sortBy(_._2)
      // contiguous chunk ids from 0
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong))
      // every chunk's text re-splits to its declared token count; the
      // first stride tokens of each chunk plus ALL of the last chunk
      // reassemble the original token stream — proves full coverage
      // with exactly k-stride tokens of interior overlap
      val rebuilt = sorted.zipWithIndex.flatMap { case ((_, _, n, text), i) =>
        val ts = text.split(" ", -1)
        assert(ts.length == n, s"doc $id chunk $i: ${ts.length} != $n")
        if (i == sorted.length - 1) ts else ts.take(stride)
      }.mkString(" ")
      assert(rebuilt == orig(id), s"doc $id reassembly diverged")
    }
  }

  test("chunker with k == stride partitions exactly: zero overlap, concatenation is the document") {
    val docs = Tables.documents(spark, sf).where(col("doc_id") < 30)
    val chunks = graft.ops.TextOps.chunkDocs(docs, k = 16, stride = 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val orig = docs.select(col("doc_id"), lower(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    chunks.foreach { case (id, rows) =>
      val sorted = rows.sortBy(_._2)
      // no-overlap partition: token counts sum to the doc's token count
      // and plain concatenation reproduces it (no slice is taken twice)
      val all = sorted.flatMap(r => r._4.split(" ", -1))
      assert(all.mkString(" ") == orig(id), s"doc $id not partitioned")
      assert(sorted.init.forall(_._3 == 16L), s"doc $id interior chunk not full")
    }
  }
}
