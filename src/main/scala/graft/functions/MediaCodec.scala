package graft.functions

/** Pure-JVM media header codec — the real J12 decoder (SURVEY.md §2.11),
  * replacing round 3's histogram stub for the formats it understands.
  *
  * Read path (the deliverable): hand-written parsers over the three public
  * container formats whose headers are fixed-layout and dependency-free —
  *   - PNG: 8-byte signature then the IHDR chunk (width/height as
  *     big-endian u32 at offsets 16/20, bit depth at 24, color type at 25);
  *     the ISO/W3C PNG spec fixes IHDR as the first chunk.
  *   - JPEG/JFIF: SOI (FFD8) then a marker walk — each segment is
  *     FF <marker> <u16 length incl. itself>; the frame header (SOF0/1/2,
  *     plus the rarer SOF3/5..7/9..11/13..15) carries precision, height,
  *     width, component count. Standalone markers (RST, TEM) have no
  *     length field and are skipped; fill bytes (FF FF …) are legal.
  *   - WAV/RIFF: "RIFF" <size> "WAVE" then chunk walk; "fmt " carries
  *     channels (LE u16 @ +2), sample rate (LE u32 @ +4), bits/sample
  *     (LE u16 @ +14); "data"'s declared size + fmt gives the duration.
  *
  * Everything is bounds-checked: truncated or alien bytes yield None,
  * never an exception — a curation pipeline meets malformed media
  * constantly and must not fail the task over one bad row.
  *
  * Write path (test/fixture only): [[MediaGen]] encodes REAL files — PNG
  * and JPEG through the JDK's built-in ImageIO codecs, WAV by direct RIFF
  * layout — so the parser is exercised against bytes produced by an
  * independent, widely-deployed encoder rather than by its own inverse.
  */
object MediaCodec {

  /** Decoded header facts. Image formats fill width/height/channels;
    * audio fills channels/sampleRate/durationMs. Absent facts are -1
    * (fixed layout keeps the case class encoder-friendly for typed maps).
    */
  final case class MediaDims(format: String, width: Int, height: Int,
                             channels: Int, sampleRate: Int, durationMs: Long)

  private def beU32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def beU16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  private def leU32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def leU16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Cheap format sniff from magic bytes alone. */
  def sniff(b: Array[Byte]): String =
    if (b.length >= 8 && PngSig.indices.forall(i => b(i) == PngSig(i))) "png"
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff) "jpeg"
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "wav"
    else "unknown"

  def decode(b: Array[Byte]): Option[MediaDims] = sniff(b) match {
    case "png"  => decodePng(b)
    case "jpeg" => decodeJpeg(b)
    case "wav"  => decodeWav(b)
    case _      => None
  }

  /** PNG IHDR: the spec requires IHDR immediately after the signature —
    * 4-byte length (always 13), "IHDR", then the fixed 13-byte body.
    */
  def decodePng(b: Array[Byte]): Option[MediaDims] = {
    if (b.length < 33 || beU32(b, 8) != 13L ||
      b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') return None
    val w = beU32(b, 16)
    val h = beU32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
    // channels per color type: 0 gray, 2 truecolor, 3 palette, 4 gray+a, 6 rgba
    val channels = (b(25) & 0xff) match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    Some(MediaDims("png", w.toInt, h.toInt, channels, -1, -1L))
  }

  private def isSof(m: Int): Boolean =
    (m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc

  /** JPEG marker walk to the first frame header (SOFn). */
  def decodeJpeg(b: Array[Byte]): Option[MediaDims] = {
    var i = 2 // past SOI
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // desynced — not a marker
      var m = b(i + 1) & 0xff
      var j = i + 1
      while (m == 0xff && j + 1 < b.length) { j += 1; m = b(j) & 0xff } // fill bytes
      i = j - 1
      if (m == 0xd9 || m == 0xda) return None // EOI / entropy data before any SOF
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i += 2 } // standalone marker
      else {
        if (i + 3 >= b.length) return None
        val len = beU16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        if (isSof(m)) {
          if (len < 8) return None
          val h = beU16(b, i + 5)
          val w = beU16(b, i + 7)
          val comps = b(i + 9) & 0xff
          if (w <= 0 || h <= 0 || comps <= 0) return None
          return Some(MediaDims("jpeg", w, h, comps, -1, -1L))
        }
        i += 2 + len
      }
    }
    None
  }

  /** WAV: RIFF chunk walk — fmt for shape, data size for duration. */
  def decodeWav(b: Array[Byte]): Option[MediaDims] = {
    var i = 12
    var channels = -1
    var rate = -1
    var bits = -1
    var dataBytes = -1L
    while (i + 8 <= b.length && (channels < 0 || dataBytes < 0)) {
      val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = leU32(b, i + 4)
      if (id == "fmt " && size >= 16 && i + 8 + 16 <= b.length) {
        channels = leU16(b, i + 10)
        rate = leU32(b, i + 12).toInt
        bits = leU16(b, i + 22)
      } else if (id == "data") {
        // declared size is authoritative even if payload is truncated —
        // streaming writers fix it up last, readers trust the header
        dataBytes = size
      }
      // size is an unsigned u32: keep the advance in Long so a garbage
      // size can neither wrap negative (index exception) nor advance by 0
      // (infinite loop) — any non-strictly-increasing or out-of-buffer
      // step ends the walk with whatever facts were already gathered
      val next = i.toLong + 8L + size + (size & 1L) // chunks are word-aligned
      if (next <= i || next > b.length) i = b.length else i = next.toInt
    }
    if (channels <= 0 || rate <= 0 || bits <= 0 || dataBytes < 0) None
    else {
      val bytesPerSec = rate.toLong * channels * (bits / 8)
      val durMs = if (bytesPerSec == 0) -1L else dataBytes * 1000L / bytesPerSec
      Some(MediaDims("wav", -1, -1, channels, rate, durMs))
    }
  }
}

/** Fixture-side encoders: REAL bytes from independent codecs, so
  * [[MediaCodec]]'s parsers are tested against files a browser or player
  * would accept, not against a home-made inverse.
  */
object MediaGen {

  /** Deterministic pixel fill so repeated generation is byte-identical. */
  private def image(w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((x * 31 + y * 17) & 0xffffff))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Real PNG via the JDK's ImageIO PNG encoder. */
  def png(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(image(w, h), "png", out)
    out.toByteArray
  }

  /** Real baseline JPEG via the JDK's ImageIO JPEG encoder. */
  def jpeg(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(image(w, h), "jpeg", out)
    out.toByteArray
  }

  /** PCM16 WAV, zero samples, direct RIFF layout. */
  def wav(channels: Int, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val dataBytes = nSamples * channels * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(36 + dataBytes); buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort)  // block align
    buf.putShort(16)                      // bits per sample
    buf.put("data".getBytes); buf.putInt(dataBytes)
    buf.array()
  }
}
