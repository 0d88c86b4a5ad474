package graft

import graft.functions.{MediaCodec, MediaGen}
import graft.ops.MultimodalOps
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {

  private lazy val media = MultimodalOps.mediaTable(Tables.documents(spark, sf)).cache()

  test("aHash64 128-bit comparator agrees with BigInteger on hostile products") {
    // the >190 MP slow path: pin cmp128 against BigInteger over values
    // spanning the Long range (incl. products that wrap a 64-bit low word)
    val rnd = new scala.util.Random(42)
    def big(x: Long) = java.math.BigInteger.valueOf(x)
    val interesting = Seq(0L, 1L, 255L, Int.MaxValue.toLong,
      1L << 31, (1L << 32) - 1, 1L << 40, Long.MaxValue / 255, Long.MaxValue)
    val cases = (for (a <- interesting; b <- interesting) yield (a, b, b, a)) ++
      (0 until 2000).map { _ =>
        (rnd.nextLong() >>> 1, rnd.nextLong() >>> 20,
          rnd.nextLong() >>> 1, rnd.nextLong() >>> 20)
      }
    cases.foreach { case (a1, a2, b1, b2) =>
      val want = big(a1).multiply(big(a2)).compareTo(big(b1).multiply(big(b2))) > 0
      assert(graft.functions.MediaCodec.cmp128(a1, a2, b1, b2) == want,
        s"cmp128($a1,$a2,$b1,$b2) disagrees with BigInteger")
    }
  }

  test("media schema: binary payload + typed metadata struct") {
    val sch = media.schema
    assert(sch("payload").dataType.typeName == "binary")
    assert(sch("meta").dataType.typeName == "struct")
  }

  test("feature extraction: deterministic 8-dim features, checksum stable") {
    val f1 = MultimodalOps.extractFeatures(spark, media).collect()
      .map(f => f.media_id -> (f.checksum, f.feature.toSeq)).toMap
    val f2 = MultimodalOps.extractFeatures(spark, media).collect()
      .map(f => f.media_id -> (f.checksum, f.feature.toSeq)).toMap
    assert(f1 == f2)
    assert(f1.values.forall(_._2.length == 8))
  }

  test("byte-moment fallback matches a hand-computed value") {
    val payload = "abcdefgh".getBytes("UTF-8")
    val feat = MultimodalOps.byteMomentFeatures(payload)
    assert(feat(0) == 'a'.toDouble / 8)
    assert(feat(7) == 'h'.toDouble / 8)
  }

  test("media stats: every kind counted, payload bytes match text length") {
    val stats = MultimodalOps.mediaStats(media).collect()
    assert(stats.map(_.getString(0)).toSet == Set("image", "audio", "video"))
    val total = stats.map(_.getAs[Long]("n")).sum
    assert(total == media.count())
  }

  // ------------------------------------------------ real codec (J12)

  test("PNG parser: dims/channels from ImageIO-encoded bytes, cross-checked vs ImageIO.read") {
    for ((w, h) <- Seq((16, 16), (641, 17), (640 + 15, 480 + 15))) {
      val bytes = MediaGen.png(w, h)
      val d = MediaCodec.decode(bytes).get
      assert(d.format == "png" && d.width == w && d.height == h && d.channels == 3)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img.getWidth == w && img.getHeight == h)
    }
  }

  test("JPEG parser: marker walk finds SOF dims, cross-checked vs ImageIO.read") {
    for ((w, h) <- Seq((16, 16), (655, 495), (100, 1))) {
      val bytes = MediaGen.jpeg(w, h)
      val d = MediaCodec.decode(bytes).get
      assert(d.format == "jpeg" && d.width == w && d.height == h && d.channels == 3)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img.getWidth == w && img.getHeight == h)
    }
  }

  test("WAV parser: channels/rate/duration from RIFF chunks") {
    val d = MediaCodec.decode(MediaGen.wav(channels = 2, sampleRate = 8000,
      nSamples = 8 * 250)).get
    assert(d.format == "wav" && d.channels == 2 && d.sampleRate == 8000)
    assert(d.durationMs == 250L)
  }

  test("malformed and truncated payloads decode to None, never throw") {
    assert(MediaCodec.decode(Array.emptyByteArray).isEmpty)
    assert(MediaCodec.decode("not media at all".getBytes).isEmpty)
    val png = MediaGen.png(32, 32)
    assert(MediaCodec.decode(png.take(20)).isEmpty)   // cut inside IHDR
    val jpg = MediaGen.jpeg(32, 32)
    assert(MediaCodec.decode(jpg.take(4)).isEmpty)    // SOI + marker only
    val wav = MediaGen.wav(1, 8000, 80)
    assert(MediaCodec.decode(wav.take(12)).isEmpty)   // RIFF/WAVE, no chunks
    // declared-size-wins: truncated data chunk still reports header duration
    assert(MediaCodec.decode(wav.take(44)).get.durationMs == 10L)
  }

  test("WAV chunk walk survives hostile u32 chunk sizes (ADVICE r4)") {
    // Chunk sizes are unsigned u32: 0xFFFFFFF8 once made the Int-truncated
    // advance exactly 0 (infinite loop); 0x80000000 made it negative
    // (StringIndexOutOfBounds). The walk must now terminate with None.
    def riffWith(chunkId: String, size: Long): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(24)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes); buf.putInt(16); buf.put("WAVE".getBytes)
      buf.put(chunkId.getBytes); buf.putInt(size.toInt) // bit pattern of the u32
      buf.putInt(0)
      buf.array()
    }
    for (evil <- Seq(0xFFFFFFF8L, 0xFFFFFFF7L, 0x80000000L, 0xFFFFFFFFL)) {
      assert(MediaCodec.decode(riffWith("junk", evil)).isEmpty,
        s"size 0x${evil.toHexString} must end the walk with None")
    }
    // a hostile chunk BEFORE fmt/data must not mask facts already gathered:
    // garbage after a complete fmt+data still yields the decoded header
    val good = MediaGen.wav(1, 8000, 80)
    val tail = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tail.put("junk".getBytes); tail.putInt(0xFFFFFFF8L.toInt)
    val hostileTail = good ++ tail.array()
    assert(MediaCodec.decode(hostileTail).get.durationMs == 10L)
  }

  test("extractFeatures routes real formats through the codec") {
    import spark.implicits._
    val rows = Seq(
      MultimodalOps.MediaRow(1L, MediaGen.png(20, 30),
        MultimodalOps.MediaMeta("image", 20, 30, 0L)),
      MultimodalOps.MediaRow(2L, MediaGen.wav(1, 8000, 800),
        MultimodalOps.MediaMeta("audio", 0, 0, 100L)))
    val feats = MultimodalOps.extractFeatures(spark, rows.toDF())
      .collect().map(f => f.media_id -> f.feature).toMap
    assert(feats(1L)(0) == 20.0 && feats(1L)(1) == 30.0 && feats(1L)(2) == 3.0)
    assert(feats(2L)(4) == 100.0 && feats(2L)(3) == 8000.0)
  }

  test("j19 fixture decodes to exactly the planted dims at every row") {
    val dir = Tables.appTmpDir(spark, "graft_media_spec", sf)
    MultimodalOps.mediaFilesTable(spark, Tables.documents(spark, sf))
      .write.mode("overwrite").parquet(dir)
    val decoded = MultimodalOps.decodeDims(spark, spark.read.parquet(dir)).collect()
    assert(decoded.length == 300)
    decoded.foreach { r =>
      val id = r.media_id
      (id % 5) match {
        case 0 =>
          assert(r.format == "png" && r.width == (id % 640 + 16) &&
            r.height == (id % 480 + 16) && r.channels == 3)
        case 1 =>
          assert(r.format == "jpeg" && r.width == (id % 640 + 16) &&
            r.height == (id % 480 + 16) && r.channels == 3)
        case 2 =>
          assert(r.format == "wav" && r.channels == (1 + id % 2) &&
            r.sample_rate == 8000 && r.duration_ms == (id % 100 + 1))
        case 3 =>
          assert(r.format == "gif" && r.width == (id % 160 + 16) &&
            r.height == (id % 120 + 16) && r.channels == 1)
        case _ =>
          assert(r.format == "mp3" && r.channels == 1 &&
            r.sample_rate == 48000 && r.duration_ms == 24 * (id % 50 + 1))
      }
    }
  }

  test("GIF parser: logical screen dims from ImageIO-encoded bytes") {
    val d = MediaCodec.decode(MediaGen.gif(321, 97)).get
    assert(d.format == "gif" && d.width == 321 && d.height == 97 && d.channels == 1)
    assert(MediaCodec.decode(MediaGen.gif(16, 16).take(10)).isEmpty) // cut in LSD
  }

  test("MP3 parser: frame walk counts frames, exact 24ms/frame duration") {
    val d = MediaCodec.decode(MediaGen.mp3(41)).get
    assert(d.format == "mp3" && d.channels == 1 && d.sampleRate == 48000)
    assert(d.durationMs == 24L * 41)
    // ID3v2 tag in front is skipped (syncsafe size), frames still counted
    val tag = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 12) ++ new Array[Byte](12)
    val tagged = tag ++ MediaGen.mp3(5)
    assert(MediaCodec.decode(tagged).get.durationMs == 24L * 5)
    // truncated mid-header: the complete frames still count
    assert(MediaCodec.decode(MediaGen.mp3(3).take(288 * 2 + 2)).get.durationMs == 48L)
    // garbage after sync byte yields None, not a crash
    assert(MediaCodec.decode(Array[Byte](0xff.toByte, 0xe0.toByte, 0x00, 0x00)).isEmpty)
    // sync-looking junk AFTER valid frames ends the walk but keeps the
    // gathered facts (code-review finding: used to discard the whole file)
    val junkTail = MediaGen.mp3(2) ++
      Array[Byte](0xff.toByte, 0xfb.toByte, 0xf4.toByte, 0x00) // bitrate idx 15
    assert(MediaCodec.decode(junkTail).get.durationMs == 48L)
  }

  // --- full decode (r9): pixels, resize, GIF frames, WAV PCM ---

  test("pixel decode: gray PNG round-trips the closed-form raster exactly") {
    val (id, w, h) = (42L, 23, 17)
    val img = MediaCodec.decodeImage(MediaGen.grayPng(id, w, h)).get
    val st = MediaCodec.pixelStats(img)
    assert(st.width == w && st.height == h && st.bands == 1)
    var expSum = 0L; var expSq = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val g = ((3 * x + 5 * y + 7 * id) % 256).toInt
      expSum += g; expSq += g.toLong * g
    }
    assert(st.graySum == expSum && st.graySumSq == expSq)
    // constant image: zero entropy; the gradient: strictly positive
    val flat = MediaCodec.pixelStats(MediaCodec.decodeImage(MediaGen.grayPng(0, 1, 1)).get)
    assert(flat.entropyMillibits == 0L && st.entropyMillibits > 0L)
    // RGB path: luma of an ImageIO-decoded 3-band fixture is bounded
    val rgb = MediaCodec.pixelStats(MediaCodec.decodeImage(MediaGen.png(12, 9)).get)
    assert(rgb.bands == 3 && rgb.width == 12 &&
      rgb.graySum <= 255L * 12 * 9 && rgb.graySum > 0)
    // non-image payloads decode to None, never throw
    assert(MediaCodec.decodeImage(MediaGen.wav(1, 8000, 8)).isEmpty)
    assert(MediaCodec.decodeImage(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("bilinear resize + gray thumbnail: dims, determinism, constant preservation") {
    val img = MediaCodec.decodeImage(MediaGen.grayPng(7, 32, 24)).get
    val small = MediaCodec.resizeBilinear(img, 8, 8)
    assert(small.getWidth == 8 && small.getHeight == 8 &&
      small.getRaster.getNumBands == 1) // gray stays gray
    val t1 = MediaCodec.thumbnailGray(img, 8)
    val t2 = MediaCodec.thumbnailGray(
      MediaCodec.decodeImage(MediaGen.grayPng(7, 32, 24)).get, 8)
    assert(t1.length == 64 && java.util.Arrays.equals(t1, t2)) // deterministic
    // a constant image thumbnails to the same constant (interpolation of
    // equal values is exact regardless of kernel placement)
    val flat = new java.awt.image.BufferedImage(
      20, 20, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val g2 = flat.createGraphics()
    try { g2.setColor(new java.awt.Color(130, 130, 130)); g2.fillRect(0, 0, 20, 20) }
    finally g2.dispose()
    assert(MediaCodec.thumbnailGray(flat, 8).forall(b => (b & 0xff) == 130))
    // color sources thumbnail through the luma path
    assert(MediaCodec.thumbnailGray(
      MediaCodec.decodeImage(MediaGen.png(30, 20)).get, 8).length == 64)
  }

  test("GIF frame sampling: every k-th frame of an animated GIF, solid levels verified") {
    val b = MediaGen.gifAnimated(11, 7, frames = 10)
    val all = MediaCodec.sampleGifFrames(b, 1)
    assert(all.length == 10)
    val sampled = MediaCodec.sampleGifFrames(b, 3)
    assert(sampled.length == 4) // frames 0, 3, 6, 9
    sampled.zip(Seq(0, 3, 6, 9)).foreach { case (frame, f) =>
      assert(frame.getWidth == 11 && frame.getHeight == 7)
      val lvl = MediaCodec.luma(frame.getRGB(5, 3))
      assert(lvl == (f * 40) % 256, s"frame $f level $lvl")
    }
    // single-frame fixture still works; non-GIF yields empty, not a throw
    assert(MediaCodec.sampleGifFrames(MediaGen.gif(9, 9), 2).length == 1)
    assert(MediaCodec.sampleGifFrames(Array[Byte](9, 9, 9), 2).isEmpty)
  }

  test("WAV PCM decode: square-wave peak and energy are integer-exact") {
    val (ch, sr, n, amp) = (2, 8000, 480, 12000)
    val st = MediaCodec.wavPcmStats(
      MediaGen.wavSquare(ch, sr, n, amp, halfPeriod = 16)).get
    assert(st.channels == ch && st.sampleRate == sr && st.frames == n)
    assert(st.peak == amp)
    assert(st.sumSq == n.toLong * ch * amp.toLong * amp) // ±amp everywhere
    // rms of a square wave == amp exactly
    assert(StrictMath.round(StrictMath.sqrt(
      st.sumSq.toDouble / (st.frames * st.channels))) == amp)
    // silence: zero peak and energy; truncated/alien bytes: None
    val silent = MediaCodec.wavPcmStats(MediaGen.wav(1, 8000, 64)).get
    assert(silent.peak == 0 && silent.sumSq == 0L && silent.frames == 64)
    assert(MediaCodec.wavPcmStats(MediaGen.png(4, 4)).isEmpty)
    assert(MediaCodec.wavPcmStats(MediaGen.wav(1, 8000, 64).take(30)).isEmpty)
    // crafted chunk size 0xFFFFFFF8: as a signed Int the advance is
    // 8 + (-8) = 0 — the unguarded walk loops forever. Must terminate
    // with None, like decodeWav does.
    val crafted = MediaGen.wav(1, 8000, 64).clone()
    crafted(16) = 0xf8.toByte; crafted(17) = 0xff.toByte
    crafted(18) = 0xff.toByte; crafted(19) = 0xff.toByte
    assert(MediaCodec.wavPcmStats(crafted).isEmpty)
  }

  test("MP3 frame stats: exact duration/bitrate facts over synthesized CBR and VBR sequences") {
    // CBR: 40 frames x 96 kbps @48 kHz mono = 40 x 24 ms, mean == min == max
    val cbr = MediaCodec.mp3FrameStats(MediaGen.mp3(40)).get
    assert(cbr.frames == 40 && cbr.durMs == 40 * 24)
    assert(cbr.channels == 1 && cbr.sampleRate == 48000)
    assert(cbr.minKbps == 96 && cbr.maxKbps == 96 && cbr.meanKbps == 96)
    assert(!cbr.vbr)
    // VBR: alternating 96k (idx 7) and 320k (idx 14) frames — exact mean
    // by integer arithmetic: bytes = 10*(288+960), samples = 20*1152
    val pattern = Seq.fill(10)(Seq(7, 14)).flatten
    val vbr = MediaCodec.mp3FrameStats(MediaGen.mp3Vbr(pattern)).get
    assert(vbr.frames == 20 && vbr.vbr)
    assert(vbr.minKbps == 96 && vbr.maxKbps == 320)
    val bytes = 10L * (288 + 960); val samples = 20L * 1152
    assert(vbr.meanKbps == bytes * 8 * 48000 / (samples * 1000))
    assert(vbr.durMs == samples * 1000 / 48000)
    // facts agree with the dims walk on the same bytes
    val dims = MediaCodec.decodeMp3(MediaGen.mp3Vbr(pattern)).get
    assert(dims.durationMs == vbr.durMs && dims.sampleRate == vbr.sampleRate)
    // truncated mid-frame: gathered facts stand (keep-gathered posture);
    // the third frame's HEADER parsed before the cut, so it counts —
    // headers are the unit of this walk, payloads are never touched
    val cut = MediaGen.mp3Vbr(pattern).take(288 + 960 + 100)
    assert(MediaCodec.mp3FrameStats(cut).get.frames == 3)
    // alien bytes: None, not a throw
    assert(MediaCodec.mp3FrameStats(MediaGen.png(4, 4)).isEmpty)
  }

  test("Ogg/Vorbis: id-header facts and granule-exact duration from the page walk") {
    // 3 s @ 48 kHz stereo over 6 pages; last granule = total samples
    val ogg = MediaGen.oggVorbis(2, 48000, 144000L, 6)
    assert(MediaCodec.sniff(ogg) == "ogg")
    val d = MediaCodec.decode(ogg).get
    assert(d.format == "ogg" && d.channels == 2 && d.sampleRate == 48000)
    assert(d.durationMs == 3000L)
    // mono, odd rate, non-round duration: exact integer arithmetic
    val d2 = MediaCodec.decodeOgg(MediaGen.oggVorbis(1, 44100, 99999L, 3)).get
    assert(d2.channels == 1 && d2.sampleRate == 44100)
    assert(d2.durationMs == 99999L * 1000 / 44100)
    // truncated mid-stream: facts gathered from complete pages stand
    val pageLen = 28 + 30 // BOS page
    val cut = MediaCodec.decodeOgg(ogg.take(pageLen + 48 + 10)).get
    assert(cut.sampleRate == 48000 && cut.durationMs == (144000L / 6) * 1000 / 48000)
    // an Ogg page whose BOS payload is not a Vorbis id header: None
    val alien = ogg.clone(); alien(29) = 'x' // corrupt "vorbis"
    assert(MediaCodec.decodeOgg(alien).isEmpty)
    assert(MediaCodec.decodeOgg(MediaGen.png(4, 4)).isEmpty)
  }

  test("Ogg/Vorbis comment header: tags round-trip, lacing-spanning packets, malformed -> None") {
    val tags = Seq("ARTIST" -> "graft", "TITLE" -> "scale smoke",
      "LANGUAGE" -> "en", "note" -> "k=v with = inside")
    val ogg = MediaGen.oggVorbis(2, 48000, 144000L, 3, tags, vendor = "graft codec r11")
    // the comment page must not disturb the id-header facts
    val d = MediaCodec.decodeOgg(ogg).get
    assert(d.channels == 2 && d.sampleRate == 48000 && d.durationMs == 3000L)
    val vc = MediaCodec.oggVorbisComments(ogg).get
    assert(vc.vendor == "graft codec r11")
    // field names uppercase (Vorbis I §5 case-insensitive rule), values verbatim
    assert(vc.comments == Seq("ARTIST" -> "graft", "TITLE" -> "scale smoke",
      "LANGUAGE" -> "en", "NOTE" -> "k=v with = inside"))
    // a comment packet past 255 bytes spans lacing segments — reassembly,
    // not single-segment luck; exact value equality proves byte-true joins
    val big = "x" * 700
    val vcBig = MediaCodec.oggVorbisComments(
      MediaGen.oggVorbis(1, 44100, 1000L, 1, Seq("BIG" -> big))).get
    assert(vcBig.comments == Seq("BIG" -> big))
    // no comment header at all (the plain generator): None, no throw
    assert(MediaCodec.oggVorbisComments(
      MediaGen.oggVorbis(1, 44100, 1000L, 1)).isEmpty)
    // truncated mid-comment-packet: None, no throw
    val cut = ogg.take(28 + 30 + 40)
    assert(MediaCodec.oggVorbisComments(cut).isEmpty)
    // a tag with no '=' separator is malformed per spec: None
    val bad = MediaGen.oggVorbis(1, 44100, 1000L, 1, Seq("NOEQUALS" -> ""))
    // NOEQUALS= is legal (empty value); corrupt the '=' byte instead
    val eqIdx = {
      val pat = "NOEQUALS=".getBytes("UTF-8")
      (0 until bad.length - pat.length).find(i =>
        pat.indices.forall(j => bad(i + j) == pat(j))).get + pat.length - 1
    }
    bad(eqIdx) = '_'
    assert(MediaCodec.oggVorbisComments(bad).isEmpty)
  }

  test("j25 fixture: decodePixels over a parquet round-trip matches per-row closed form") {
    import org.apache.spark.sql.functions.col
    val out = graft.ops.MultimodalOps.j25_media_pixels(spark, sf).collect()
    assert(out.length == Tables.documents(spark, sf).count())
    out.take(20).foreach { r =>
      val id = r.getLong(0)
      val (w, h) = ((16 + id % 17).toInt, (16 + (id * 3) % 13).toInt)
      assert(r.getInt(1) == w && r.getInt(2) == h)
      var exp = 0L
      for (y <- 0 until h; x <- 0 until w) exp += ((3 * x + 5 * y + 7 * id) % 256)
      assert(r.getLong(3) == exp, s"doc $id")
    }
  }

  test("j62: planted duplicate runs group exactly; aHash matches the closed form") {
    val docs = Tables.documents(spark, sf)
    val nDocs = docs.count()
    val out = graft.ops.MultimodalOps.j62_image_dedup(spark, sf).collect()
    // every doc lands in exactly one group; planted runs of 5 (the last
    // group may be a partial run if the doc count isn't a multiple of 5)
    assert(out.map(_.getLong(3)).sum == nDocs)
    assert(out.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= 5))
    assert(out.count(_.getLong(3) == 5) >= out.length - 1,
      "at most the final partial run may have n < 5")
    // representatives are the run heads
    assert(out.forall(_.getLong(4) % 5 == 0))
    // hash bit semantics against a hand-computed reference on one image
    val g = 10L
    val (w, h) = ((16 + g % 17).toInt, (16 + (g * 3) % 13).toInt)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(MediaGen.grayPng(g, w, h)))
    val sums = Array.fill(64)(0L); val counts = Array.fill(64)(0L)
    var total = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val b = (y * 8 / h) * 8 + (x * 8 / w)
      val v = ((3 * x + 5 * y + 7 * g) % 256)
      sums(b) += v; counts(b) += 1; total += v
    }
    var want = 0L
    for (b <- 0 until 64)
      if (sums(b) * w * h > total * counts(b)) want |= (1L << b)
    assert(MediaCodec.aHash64(img) == want)
    // determinism across invocations (QueriesSpec runs the gated query
    // twice; this pins the hash function itself)
    assert(MediaCodec.aHash64(img) == want)
  }
}
