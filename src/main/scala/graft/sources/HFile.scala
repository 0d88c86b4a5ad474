package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable.ArrayBuffer

/** HFile v3 codec — the HBase bulk-load file format, from the public format
  * specification (Apache HBase book, "Appendix E: HFile format"; class layout
  * mirrors the public o.a.h.hbase.io.hfile.HFileBlock / KeyValue javadoc).
  * Closes SURVEY.md §7.4's deferred item: no HBase jars exist offline
  * (build.sbt is Spark + scalatest only), so the codec is implemented from
  * the spec rather than wrapped.
  *
  * Bit-compatible with real HFiles:
  *   - KeyValue cell serialization (`keyLen:4 | valLen:4 | key | value`,
  *     key = `rowLen:2 | row | famLen:1 | family | qualifier | ts:8 | type:1`),
  *     type codes Put=4 / Delete=8 / DeleteColumn=12 / DeleteFamily=14.
  *   - 33-byte block header (`magic:8 | onDiskSizeWithoutHeader:4 |
  *     uncompressedSizeWithoutHeader:4 | prevBlockOffset:8 | checksumType:1 |
  *     bytesPerChecksum:4 | onDiskDataSizeWithHeader:4`), block magics
  *     (`DATABLK*`, `IDXROOT2`, `FILEINF2`, `TRABLK"$`), checksumType NULL.
  *   - Root index entries (`offset:8 | onDiskSize:4 | firstKey` with the
  *     Hadoop-vint length prefix), and the trailing 4-byte version word
  *     (major=3, minor=0, minor in the high byte).
  *
  * Documented deviations (a faithful subset, not a drop-in): the trailer
  * body is fixed-layout big-endian rather than protobuf (no protobuf
  * dependency resolvable offline), compression is always NONE, and no
  * Bloom blocks are written. The data-block index is two-level: a root
  * `IDXROOT2` block whose entries point either directly at data blocks
  * (small files) or at `IDXINTE2` intermediate index blocks once the
  * block count passes `indexChunkEntries` — the same escalation real
  * HBase performs when the root chunk outgrows
  * `hfile.index.block.max.size`. Two levels cover 16k² ≈ 268M blocks
  * (≈ 17 TB of 64 KB blocks) per region file; the writer raises loudly
  * past that rather than silently corrupting the index.
  */
object HFileCodec {

  val DataMagic: Array[Byte] = "DATABLK*".getBytes(UTF_8)
  val RootIndexMagic: Array[Byte] = "IDXROOT2".getBytes(UTF_8)
  val IntermediateIndexMagic: Array[Byte] = "IDXINTE2".getBytes(UTF_8)
  val FileInfoMagic: Array[Byte] = "FILEINF2".getBytes(UTF_8)
  val BloomChunkMagic: Array[Byte] = "BLMFBLK2".getBytes(UTF_8)
  val BloomMetaMagic: Array[Byte] = "BLMFMET2".getBytes(UTF_8)
  val TrailerMagic: Array[Byte] = "TRABLK\"$".getBytes(UTF_8)

  /** Row-bloom parameters, HBase's defaults: ~10 bits/key ≈ 1% FPR with
    * k = 7 ≈ ln2·10 probes [public: o.a.h.hbase.util.BloomFilterUtil].
    * Chunked like HBase's CompoundBloomFilter: one bloom per
    * `DefaultBloomChunkKeys` distinct rows, located by a first-row meta
    * index — so neither writer nor reader ever holds one giant filter.
    */
  val BloomBitsPerKey = 10
  val BloomHashCount = 7
  val DefaultBloomChunkKeys: Int = 16 * 1024

  /** Root/intermediate index entries per chunk before escalating to the
    * next index level (HBase's equivalent knob is size-based:
    * hfile.index.block.max.size, 128 KB ≈ this many short-key entries).
    */
  val DefaultIndexChunkEntries: Int = 16 * 1024

  val HeaderSize = 33

  /** Upper bound accepted for a block's declared on-disk payload length.
    * Far above anything the write path produces (blocks flush at
    * ~blockSize + one cell), but small enough that a damaged/hostile
    * length field costs at most one bounded allocation instead of a 2 GB
    * one before any magic/length check can reject the block.
    */
  val MaxBlockBytes: Int = 1 << 28
  val MajorVersion = 3

  /** KeyValue type codes [public: o.a.h.hbase.KeyValue.Type]. */
  val TypePut: Byte = 4
  val TypeDelete: Byte = 8

  final case class HCell(row: Array[Byte], family: Array[Byte],
                         qualifier: Array[Byte], ts: Long, typ: Byte,
                         value: Array[Byte]) {
    /** The serialized key part (what block-index firstKey entries hold). */
    def keyBytes: Array[Byte] = {
      val buf = ByteBuffer.allocate(2 + row.length + 1 + family.length +
        qualifier.length + 8 + 1)
      buf.putShort(row.length.toShort).put(row)
        .put(family.length.toByte).put(family).put(qualifier)
        .putLong(ts).put(typ)
      buf.array()
    }
  }

  def encodeKeyValue(c: HCell): Array[Byte] = {
    val key = c.keyBytes
    val buf = ByteBuffer.allocate(4 + 4 + key.length + c.value.length)
    buf.putInt(key.length).putInt(c.value.length).put(key).put(c.value)
    buf.array()
  }

  /** Decode one KeyValue at `off`; returns (cell, offsetAfter).
    *
    * Every length is validated against the remaining bytes BEFORE any
    * allocation: a damaged/hostile buffer may only ever throw, never
    * allocate beyond the buffer it came from (OOM) or return a
    * non-advancing offset (`keyLen >= 12` forces `offsetAfter > off`,
    * so the block-decode loops cannot spin forever on e.g. keyLen = -8).
    */
  def decodeKeyValue(b: Array[Byte], off: Int): (HCell, Int) = {
    val buf = ByteBuffer.wrap(b, off, b.length - off)
    val keyLen = buf.getInt; val valLen = buf.getInt
    // minimum key: rowLen:2 + famLen:1 + ts:8 + type:1 with empty row/fam/qual
    require(keyLen >= 12 && valLen >= 0 &&
      keyLen.toLong + valLen <= b.length - off - 8L,
      s"bad KeyValue lengths keyLen=$keyLen valLen=$valLen at $off")
    val rowLen = buf.getShort
    require(rowLen >= 0, s"negative rowLen $rowLen at $off")
    val row = new Array[Byte](rowLen); buf.get(row)
    val famLen = buf.get
    require(famLen >= 0, s"negative famLen $famLen at $off")
    val fam = new Array[Byte](famLen); buf.get(fam)
    val qualLen = keyLen - 2 - rowLen - 1 - famLen - 8 - 1
    require(qualLen >= 0, s"row/family lengths exceed keyLen at $off")
    val qual = new Array[Byte](qualLen); buf.get(qual)
    val ts = buf.getLong; val typ = buf.get
    val value = new Array[Byte](valLen); buf.get(value)
    (HCell(row, fam, qual, ts, typ, value), off + 4 + 4 + keyLen + valLen)
  }

  /** Hadoop WritableUtils vint (positive case — lengths are never negative). */
  def writeVInt(out: ByteArrayOutputStream, i: Int): Unit = {
    if (i <= 127) out.write(i)
    else {
      var len = -112
      var tmp = i.toLong
      while (tmp != 0) { tmp >>= 8; len -= 1 }
      out.write(len)
      val n = -(len + 112)
      var idx = n
      while (idx != 0) {
        val shift = (idx - 1) * 8
        out.write(((i.toLong & (0xffL << shift)) >> shift).toInt)
        idx -= 1
      }
    }
  }

  def readVInt(b: Array[Byte], off: Int): (Int, Int) = {
    val first = b(off)
    if (first >= -112) (first.toInt, off + 1)
    else {
      val n = -(first + 112)
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | (b(off + 1 + i) & 0xff); i += 1 }
      (v.toInt, off + 1 + n)
    }
  }

  private def blockHeader(magic: Array[Byte], payloadLen: Int): Array[Byte] = {
    val buf = ByteBuffer.allocate(HeaderSize)
    buf.put(magic)
      .putInt(payloadLen)                     // onDiskSizeWithoutHeader (no compression)
      .putInt(payloadLen)                     // uncompressedSizeWithoutHeader
      .putLong(-1L)                           // prevBlockOffset (unused by our reader)
      .put(0: Byte)                           // checksumType NULL
      .putInt(16384)                          // bytesPerChecksum
      .putInt(HeaderSize + payloadLen)        // onDiskDataSizeWithHeader
    buf.array()
  }

  /** Index entry serialization, shared by the root and intermediate
    * levels (the on-disk layout is identical: `offset:8 | onDiskSize:4 |
    * vint keyLen | firstKey`).
    */
  private def serializeIndexEntries(
      entries: Iterable[(Long, Int, Array[Byte])]): Array[Byte] = {
    val idx = new ByteArrayOutputStream()
    entries.foreach { case (off, size, key) =>
      val e = ByteBuffer.allocate(12).putLong(off).putInt(size).array()
      idx.write(e, 0, 12)
      writeVInt(idx, key.length)
      idx.write(key, 0, key.length)
    }
    idx.toByteArray
  }

  /** Double hash of a row key for the bloom's k probe positions
    * (g_i = h1 + i·h2, the standard Kirsch–Mitzenmacher composition).
    */
  private[sources] def bloomHashes(row: Array[Byte]): (Long, Long) = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.Platform
    (XXH64.hashUnsafeBytes(row, Platform.BYTE_ARRAY_OFFSET, row.length, 0x9747b28cL),
      XXH64.hashUnsafeBytes(row, Platform.BYTE_ARRAY_OFFSET, row.length, 0x41c64e6dL))
  }

  /** Kept as Long end-to-end: mBits exceeds Int.MaxValue once a chunk
    * holds > ~214M keys, and an Int truncation there yields negative /
    * aliased bit indices (AIOOBE on write, silent false negatives on
    * read).
    */
  private def bloomBitFor(h1: Long, h2: Long, i: Int, mBits: Long): Long =
    ((h1 + i * h2) & Long.MaxValue) % mBits

  /** One serialized bloom chunk: `k:4 | mBits:8 | bits` (longs, BE). */
  private def bloomChunkPayload(hashes: ArrayBuffer[(Long, Long)]): Array[Byte] = {
    val mBits = math.max(64L, hashes.size.toLong * BloomBitsPerKey)
    val words = new Array[Long](((mBits + 63) / 64).toInt)
    hashes.foreach { case (h1, h2) =>
      var i = 0
      while (i < BloomHashCount) {
        val bit = bloomBitFor(h1, h2, i, mBits)
        words((bit >>> 6).toInt) |= 1L << (bit & 63)
        i += 1
      }
    }
    val buf = ByteBuffer.allocate(4 + 8 + words.length * 8)
    buf.putInt(BloomHashCount).putLong(mBits)
    words.foreach(buf.putLong)
    buf.array()
  }

  /** Test one serialized chunk (payload at `off`, after the header). */
  private[sources] def bloomChunkContains(chunk: Array[Byte], off: Int,
                                          row: Array[Byte]): Boolean = {
    val buf = ByteBuffer.wrap(chunk, off, chunk.length - off)
    val k = buf.getInt
    val mBits = buf.getLong
    // Damaged header sanity: a bloom may only ever PRUNE. If k/mBits are
    // implausible or the declared bit array doesn't fit in the chunk,
    // fail open (claim containment) rather than throw or false-negative.
    if (k <= 0 || k > 64 || mBits <= 0 ||
        off.toLong + 12 + ((mBits + 63) >>> 6) * 8 > chunk.length) return true
    val (h1, h2) = bloomHashes(row)
    var i = 0
    while (i < k) {
      val bit = bloomBitFor(h1, h2, i, mBits)
      if ((buf.getLong(off + 12 + ((bit >>> 6) * 8).toInt) & (1L << (bit & 63))) == 0L)
        return false
      i += 1
    }
    true
  }

  /** Serialize sorted cells as a full HFile onto `sink`, streaming: one
    * pass, O(blockSize) heap beyond the block-index entries and the row
    * bloom (10 bits per distinct row, chunked) — a region file larger
    * than the heap writes fine. Returns bytes written.
    */
  def write(cells: Iterator[HCell], sink: java.io.OutputStream,
            blockSize: Int): Long =
    write(cells, sink, blockSize, DefaultIndexChunkEntries)

  def write(cells: Iterator[HCell], sink: java.io.OutputStream,
            blockSize: Int, indexChunkEntries: Int): Long =
    write(cells, sink, blockSize, indexChunkEntries, DefaultBloomChunkKeys)

  def write(cells: Iterator[HCell], sink: java.io.OutputStream,
            blockSize: Int, indexChunkEntries: Int, bloomChunkKeys: Int): Long = {
    require(indexChunkEntries > 0, "indexChunkEntries must be positive")
    require(bloomChunkKeys > 0, "bloomChunkKeys must be positive")
    // read/write symmetry: the readers reject payloads above MaxBlockBytes,
    // so the writer must never produce one (a block holds ~blockSize bytes
    // plus the one cell that overflowed it — bound both)
    require(blockSize > 0 && blockSize <= MaxBlockBytes / 2,
      s"blockSize must be in (0, ${MaxBlockBytes / 2}]")
    var written = 0L
    def emit(b: Array[Byte]): Unit = { sink.write(b); written += b.length }
    val index = ArrayBuffer.empty[(Long, Int, Array[Byte])] // offset, onDiskSize, firstKey
    val block = new ByteArrayOutputStream(blockSize + 1024)
    var firstKey: Array[Byte] = null
    var entryCount = 0L
    var totalUncompressed = 0L

    // row bloom, chunked: rows arrive sorted, so consecutive duplicates
    // collapse to one bloom key and each chunk covers a contiguous row
    // range keyed by its first row. Closed chunks are buffered until the
    // data section ends (they live in the load-on-open section) — ~1.25 MB
    // per 10^6 distinct rows, bounded by regionCountFor's region sizing.
    val bloomChunks = ArrayBuffer.empty[(Array[Byte], Array[Byte])] // firstRow, payload
    var chunkHashes = ArrayBuffer.empty[(Long, Long)]
    var chunkFirstRow: Array[Byte] = null
    var lastRow: Array[Byte] = null

    def closeBloomChunk(): Unit = if (chunkHashes.nonEmpty) {
      // meta keys carry the same `rowLen:2 | row` prefix as block-index
      // keys, so rowOfKey/candidateEntries work unchanged on both
      val prefixed = ByteBuffer.allocate(2 + chunkFirstRow.length)
        .putShort(chunkFirstRow.length.toShort).put(chunkFirstRow).array()
      bloomChunks += ((prefixed, bloomChunkPayload(chunkHashes)))
      chunkHashes = ArrayBuffer.empty
      chunkFirstRow = null
    }

    def flushBlock(): Unit = if (block.size() > 0) {
      val payload = block.toByteArray
      require(payload.length <= MaxBlockBytes,
        s"data block ${payload.length} B exceeds MaxBlockBytes — a single " +
          "cell larger than the reader's cap would make the file unreadable")
      val offset = written
      emit(blockHeader(DataMagic, payload.length))
      emit(payload)
      index += ((offset, HeaderSize + payload.length, firstKey))
      totalUncompressed += HeaderSize + payload.length
      block.reset(); firstKey = null
    }

    cells.foreach { c =>
      if (firstKey == null) firstKey = c.keyBytes
      block.write(encodeKeyValue(c))
      entryCount += 1
      if (lastRow == null || !java.util.Arrays.equals(lastRow, c.row)) {
        if (chunkFirstRow == null) chunkFirstRow = c.row
        chunkHashes += bloomHashes(c.row)
        lastRow = c.row
        if (chunkHashes.size >= bloomChunkKeys) closeBloomChunk()
      }
      if (block.size() >= blockSize) flushBlock()
    }
    flushBlock()
    closeBloomChunk()

    // file-info block (entry kept minimal: count as 8 bytes)
    val fileInfoOffset = written
    val fi = ByteBuffer.allocate(8).putLong(entryCount).array()
    emit(blockHeader(FileInfoMagic, fi.length)); emit(fi)

    // bloom section: chunks, then a meta block indexing them by first row
    // (same entry layout as the block index, so the reader shares a parser)
    val bloomMetaEntries = bloomChunks.map { case (firstRow, payload) =>
      val off = written
      emit(blockHeader(BloomChunkMagic, payload.length)); emit(payload)
      (off, HeaderSize + payload.length, firstRow)
    }
    val bloomMetaOffset = if (bloomMetaEntries.isEmpty) -1L else {
      val off = written
      val payload = serializeIndexEntries(bloomMetaEntries)
      emit(blockHeader(BloomMetaMagic, payload.length)); emit(payload)
      off
    }

    // index section. Small files: root entries point straight at data
    // blocks. Past indexChunkEntries data blocks, escalate to two levels —
    // intermediate IDXINTE2 chunks of up to indexChunkEntries entries each,
    // with the root pointing at the chunks. A third level is never needed
    // below ~268M blocks per file; raise loudly instead of corrupting.
    require(index.size.toLong <= indexChunkEntries.toLong * indexChunkEntries,
      s"HFile data-block count ${index.size} exceeds the two-level index " +
        s"capacity ($indexChunkEntries² entries); split the region or " +
        "raise blockSize/indexChunkEntries")
    val rootEntries: Seq[(Long, Int, Array[Byte])] =
      if (index.size <= indexChunkEntries) index.toSeq
      else index.grouped(indexChunkEntries).map { chunk =>
        val off = written
        val payload = serializeIndexEntries(chunk)
        emit(blockHeader(IntermediateIndexMagic, payload.length)); emit(payload)
        // an index level keys each child by its subtree's first key
        (off, HeaderSize + payload.length, chunk.head._3)
      }.toSeq

    // root index block
    val rootIndexOffset = written
    val idxPayload = serializeIndexEntries(rootEntries)
    emit(blockHeader(RootIndexMagic, idxPayload.length)); emit(idxPayload)

    // trailer: magic + fixed-layout fields (deviation: protobuf in real HBase)
    emit(TrailerMagic)
    val tr = ByteBuffer.allocate(8 + 8 + 4 + 8 + 8 + 8 + 4)
    tr.putLong(fileInfoOffset)
      .putLong(rootIndexOffset)   // loadOnOpenDataOffset
      .putInt(rootEntries.size)   // dataIndexCount = ROOT chunk entries, as in HBase
      .putLong(totalUncompressed)
      .putLong(entryCount)
      .putLong(bloomMetaOffset)   // -1 = no bloom (empty file)
      .putInt(2)                  // compression codec NONE [public: o.a.h.hbase.io.compress.Compression.Algorithm]
    emit(tr.array())
    // version word, minor in the high byte [public: o.a.h.hbase.io.hfile.FixedFileTrailer]
    emit(ByteBuffer.allocate(4).putInt(MajorVersion & 0x00ffffff).array())
    written
  }

  /** In-memory convenience form (specs, small files). */
  def write(cells: Iterator[HCell], blockSize: Int = 64 * 1024): Array[Byte] = {
    val out = new ByteArrayOutputStream(1 << 20)
    write(cells, out, blockSize)
    out.toByteArray
  }

  final case class Trailer(fileInfoOffset: Long, rootIndexOffset: Long,
                           dataIndexCount: Int, totalUncompressed: Long,
                           entryCount: Long, bloomMetaOffset: Long,
                           majorVersion: Int)

  /** Serialized trailer length (magic + fields + version word) — the
    * fixed byte count a random-access reader fetches from the file tail.
    */
  val TrailerLen: Int = 8 + (8 + 8 + 4 + 8 + 8 + 8 + 4) + 4

  def readTrailer(file: Array[Byte]): Trailer = {
    val buf = ByteBuffer.wrap(file, file.length - TrailerLen, TrailerLen)
    val magic = new Array[Byte](8); buf.get(magic)
    require(java.util.Arrays.equals(magic, TrailerMagic), "bad trailer magic")
    val t = Trailer(buf.getLong, buf.getLong, buf.getInt, buf.getLong,
      buf.getLong, buf.getLong, 0)
    t.copy(majorVersion = ByteBuffer.wrap(file, file.length - 4, 4).getInt & 0x00ffffff)
  }

  /** Stream-decode cells block-by-block from `in` — O(blockSize) heap,
    * independent of file size: the region-server read shape. Relies on the
    * v3 layout invariant that the file-info block follows the last data
    * block, so the data section ends at the first non-`DATABLK*` magic.
    */
  def readStreaming(in: java.io.InputStream): Iterator[HCell] = new Iterator[HCell] {
    private var blockIter: Iterator[HCell] = Iterator.empty
    private var done = false

    private def readFully(n: Int): Array[Byte] = {
      val b = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(b, off, n - off)
        require(r >= 0, "unexpected EOF inside an HFile block")
        off += r
      }
      b
    }

    private def advance(): Unit =
      while (!done && !blockIter.hasNext) {
        val hdr = readFully(HeaderSize)
        val payloadLen = ByteBuffer.wrap(hdr, 8, 4).getInt
        require(payloadLen >= 0 && payloadLen <= MaxBlockBytes,
          s"implausible block payload length $payloadLen")
        if (java.util.Arrays.equals(java.util.Arrays.copyOfRange(hdr, 0, 8), DataMagic)) {
          val payload = readFully(payloadLen)
          blockIter = new Iterator[HCell] {
            private var q = 0
            def hasNext: Boolean = q < payload.length
            def next(): HCell = { val (c, nq) = decodeKeyValue(payload, q); q = nq; c }
          }
        } else done = true // file-info block: past the data section
      }

    def hasNext: Boolean = { advance(); blockIter.hasNext }
    def next(): HCell = { advance(); blockIter.next() }
  }

  private def hasMagic(file: Array[Byte], off: Int, magic: Array[Byte]): Boolean =
    java.util.Arrays.equals(java.util.Arrays.copyOfRange(file, off, off + 8), magic)

  /** Parse one index block's (offset, onDiskSize) child entries — the
    * keyless view of [[parseIndexEntriesWithKeys]] (one wire-format
    * parser; a layout change lands in exactly one place).
    */
  private def parseIndexEntries(file: Array[Byte], hdrOff: Int,
                                magic: Array[Byte]): Seq[(Long, Int)] =
    parseIndexEntriesWithKeys(file, hdrOff, magic).map { case (o, s, _) => (o, s) }

  /** Parse one index block's (offset, onDiskSize, firstKey) entries —
    * the key-aware form the point-get path needs to binary-search blocks.
    */
  private[sources] def parseIndexEntriesWithKeys(block: Array[Byte], hdrOff: Int,
      magic: Array[Byte]): Seq[(Long, Int, Array[Byte])] = {
    require(hasMagic(block, hdrOff, magic),
      s"bad index block magic at $hdrOff (want ${new String(magic, UTF_8)})")
    val idxLen = ByteBuffer.wrap(block, hdrOff + 8, 4).getInt
    var p = hdrOff + HeaderSize
    val end = hdrOff + HeaderSize + idxLen
    val entries = ArrayBuffer.empty[(Long, Int, Array[Byte])]
    while (p < end) {
      val bb = ByteBuffer.wrap(block, p, 12)
      val off = bb.getLong; val size = bb.getInt
      val (keyLen, p2) = readVInt(block, p + 12)
      // a negative length would walk p backwards (infinite loop) and an
      // oversized one would make copyOfRange allocate past the block (OOM)
      require(keyLen >= 0 && keyLen <= block.length - p2,
        s"bad index entry key length $keyLen at $p")
      entries += ((off, size, java.util.Arrays.copyOfRange(block, p2, p2 + keyLen)))
      p = p2 + keyLen
    }
    entries.toSeq
  }

  /** Row portion of a serialized key (`rowLen:2 | row | …`). */
  private[sources] def rowOfKey(key: Array[Byte]): Array[Byte] = {
    val rowLen = ((key(0) & 0xff) << 8) | (key(1) & 0xff)
    java.util.Arrays.copyOfRange(key, 2, 2 + rowLen)
  }

  /** First-row projection of an index block's entries — compute ONCE per
    * parsed index and share across a key batch (multiGet was re-copying
    * every entry's row per key).
    */
  private[sources] def indexRows(
      entries: Seq[(Long, Int, Array[Byte])]): Array[Array[Byte]] =
    entries.iterator.map { case (_, _, k) => rowOfKey(k) }.toArray

  /** Greatest index with rows(i) ≤ row under `strict = false`, or
    * rows(i) < row under `strict = true`; -1 if none. Entries are sorted,
    * so this is a real binary search, not a scan.
    */
  private def lastBefore(rows: Array[Array[Byte]], row: Array[Byte],
                         strict: Boolean): Int = {
    var lo = 0; var hi = rows.length - 1; var res = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = java.util.Arrays.compareUnsigned(rows(mid), row)
      if (if (strict) c < 0 else c <= 0) { res = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    res
  }

  /** The sub-range of sorted index entries whose blocks can contain
    * `row`: the last entry whose first row sorts ≤ `row`, plus the
    * walk-back over every preceding entry whose first row EQUALS `row`
    * (a row can span block boundaries). Works identically at the root
    * (chunk entries), the intermediate level, and the bloom meta.
    */
  private[sources] def candidateEntries(entries: Seq[(Long, Int, Array[Byte])],
      row: Array[Byte]): Seq[(Long, Int, Array[Byte])] =
    candidateEntries(entries, indexRows(entries), row)

  private[sources] def candidateEntries(entries: Seq[(Long, Int, Array[Byte])],
      rows: Array[Array[Byte]], row: Array[Byte]): Seq[(Long, Int, Array[Byte])] = {
    val last = lastBefore(rows, row, strict = false)
    if (last < 0) Seq.empty
    else {
      var from = last
      while (from > 0 && java.util.Arrays.compareUnsigned(rows(from), row) == 0)
        from -= 1
      entries.slice(from, last + 1)
    }
  }

  /** The sub-range of sorted index entries whose blocks can intersect
    * `[start, stop)`: from the last entry whose first row sorts ≤ start —
    * walked back over equal-firstRow predecessors, since the start row's
    * earlier cells can sit in the previous block when a row spans a block
    * boundary (same rule as [[candidateEntries]]) — through the last
    * entry whose first row sorts < stop. Empty when every block starts
    * at/after stop.
    */
  private[sources] def entriesInRange(entries: Seq[(Long, Int, Array[Byte])],
      start: Array[Byte], stop: Array[Byte]): Seq[(Long, Int, Array[Byte])] = {
    val rows = indexRows(entries)
    val hi = lastBefore(rows, stop, strict = true)
    if (hi < 0) Seq.empty
    else {
      var lo = math.max(0, lastBefore(rows, start, strict = false))
      while (lo > 0 && java.util.Arrays.compareUnsigned(rows(lo), start) == 0)
        lo -= 1
      entries.slice(lo, hi + 1)
    }
  }

  /** Row-bloom membership test over a whole in-memory file: false means
    * the row is DEFINITELY absent (the point-get prune); true means
    * "read the data block". Files without a bloom answer true.
    */
  def mayContainRow(file: Array[Byte], row: Array[Byte]): Boolean = {
    val trailer = readTrailer(file)
    if (trailer.bloomMetaOffset < 0) return true
    val meta = parseIndexEntriesWithKeys(file, trailer.bloomMetaOffset.toInt,
      BloomMetaMagic)
    val cands = candidateEntries(meta, row)
    cands.exists { case (off, _, _) =>
      require(hasMagic(file, off.toInt, BloomChunkMagic), "bad bloom chunk magic")
      bloomChunkContains(file, off.toInt + HeaderSize, row)
    }
  }

  /** Decode every cell by walking the index: root entries point at data
    * blocks directly (single-level files) or at IDXINTE2 intermediate
    * chunks (large files) — dispatch is by the target block's own magic,
    * exactly how HBase's reader resolves non-leaf index entries.
    */
  def read(file: Array[Byte]): Iterator[HCell] = {
    val trailer = readTrailer(file)
    val rootEntries = parseIndexEntries(
      file, trailer.rootIndexOffset.toInt, RootIndexMagic)
    require(rootEntries.size == trailer.dataIndexCount, "index count mismatch")
    val blocks = rootEntries.flatMap { case (off, size) =>
      if (hasMagic(file, off.toInt, IntermediateIndexMagic))
        parseIndexEntries(file, off.toInt, IntermediateIndexMagic)
      else Seq((off, size))
    }
    blocks.iterator.flatMap { case (off, size) =>
      val hdr = off.toInt
      require(hasMagic(file, hdr, DataMagic), "bad data block magic")
      val payloadLen = ByteBuffer.wrap(file, hdr + 8, 4).getInt
      require(HeaderSize + payloadLen == size, "block size mismatch")
      new Iterator[HCell] {
        private var q = hdr + HeaderSize
        private val stop = hdr + HeaderSize + payloadLen
        def hasNext: Boolean = q < stop
        def next(): HCell = {
          val (c, nq) = decodeKeyValue(file, q); q = nq; c
        }
      }
    }
  }
}
