package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** A family — scans, sources, sinks (SURVEY.md §2.2).
  *
  * HBase heritage: A4 is the bulk-read path (TableSnapshotInputFormat
  * semantics — scan every cell), A5 is the bulk-load planner
  * (HFileOutputFormat2 semantics — global sort by rowkey + region split
  * points), A6 is a time-range snapshot read (Scan#setTimeRange).
  */
object ScanOps {

  /** a1 — full parquet scan + count/checksum. Only l_quantity survives
    * column pruning: the scan reads one column of ten.
    */
  val a1_scan_parquet: Q = (s, d) =>
    Tables.lineitem(s, d).agg(
      count(lit(1)).as("n"),
      dsum(col("l_quantity")).as("qsum"))

  /** a2 — CSV sink + scan round-trip, oracle-anchored the same way a9
    * anchors the HFile codec: write a lossless (integer/string) projection
    * out as CSV, read it back with an explicit schema, and aggregate —
    * the oracle computes the identical aggregate from the original
    * parquet, so any write/read corruption breaks the hash. JSON
    * round-trip is covered in MiscSpec (no deterministic float text).
    */
  val a2_csv_roundtrip: Q = (s, d) => {
    // per-application dir with shutdown cleanup: concurrent runs never
    // collide, and repeated runs don't leak CSV copies (ADVICE r2)
    val dir = Tables.appTmpDir(s, "graft_csv", d)
    Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_orderpriority")
      .write.mode("overwrite").option("header", "true").csv(dir)
    s.read
      .schema("o_orderkey BIGINT, o_orderstatus STRING, o_orderpriority STRING")
      .option("header", "true").csv(dir)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_orderkey").cast("decimal(18,0)")).cast("long").as("keysum"))
      .orderBy(col("o_orderstatus").asc_nulls_last,
        col("o_orderpriority").asc_nulls_last)
  }

  /** a4 — cells scan: per (cf, qualifier) cardinality over the KeyValue view. */
  val a4_cells_scan: Q = (s, d) =>
    Tables.cells(s, d)
      .groupBy(col("cf"), col("qualifier"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("cf").asc_nulls_last, col("qualifier").asc_nulls_last)

  /** a5 — bulk-load split planning: exact 16-way split points of the
    * sorted rowkey space, via the distributed exact ntile
    * ([[ScaleOps.distributedNtile]] — range partition + local rank +
    * offsets) instead of a single-partition global window, so the same
    * code computes split points for a 100 TB keyspace. The approximate
    * production alternative (`repartitionByRange`'s reservoir-sampled
    * boundaries) is exercised by ScaleOps.saltTable.
    */
  val a5_bulkload_splits: Q = (s, d) => {
    val cells = Tables.cells(s, d).select(col("rowkey"))
    ScaleOps.distributedNtile(cells, Seq(col("rowkey")), 16,
      partitions = s.sparkContext.defaultParallelism)
      .withColumn("bucket", col("tile").cast("long"))
      .groupBy(col("bucket"))
      .agg(max(col("rowkey")).as("split_point"))
      .orderBy(col("bucket").asc_nulls_last)
  }

  /** a6 — snapshot/as-of-T read: latest version of every cell as of T0
    * (mid of the measured ts range), delete-agnostic per Scan#setTimeRange.
    */
  val a6_cells_asof: Q = (s, d) => {
    val t0 = 1705362487499628L // epoch µs, mid of the measured ts range
    val w = Window.partitionBy(col("rowkey"), col("cf"), col("qualifier"))
      .orderBy(col("ts").desc, col("value").asc)
    Tables.cells(s, d)
      .filter(col("ts") <= t0)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("rowkey"), col("qualifier"), col("value"))
      .orderBy(col("rowkey").asc_nulls_last, col("qualifier").asc_nulls_last)
      .limit(500)
  }

  /** a8 — qualifier pivot: the schemaless cells layout widened back to
    * fixed columns (SURVEY §1.1 "pivoting to fixed columns"). Explicit
    * value list keeps the plan one pass (no distinct-collect job) and the
    * output schema static — the form that scales.
    */
  val a8_cells_pivot: Q = (s, d) =>
    Tables.cells(s, d)
      .groupBy("rowkey")
      .pivot("qualifier", Seq("click", "error", "purchase", "signup", "view"))
      .agg(dsum(col("value")))
      .na.fill(0.0)
      .orderBy(col("rowkey").asc_nulls_last).limit(300)

  /** a9 — HBase bulk write + bulk read, end to end: cells →
    * range-partitioned sorted HFile v3 region files ([[graft.sources
    * .HFileOps.bulkWrite]], our from-spec codec) → distributed read-back →
    * per-(cf,qualifier) count / value-checksum / ts-checksum / tombstone
    * count. The oracle (which reads the ORIGINAL cells view) checks these
    * aggregate checksums across every column; the cell-exact losslessness
    * proof is HFileSpec's multiset round-trip test. The write lands under
    * java.io.tmpdir, one region file per executor partition.
    *
    * Regions are written FAST_DIFF-encoded and GZ-compressed (HBase's
    * usual production setting, `DATA_BLOCK_ENCODING => 'FAST_DIFF',
    * COMPRESSION => 'GZ'`) so the driver gate exercises the delta-decode
    * AND deflate/inflate paths end to end, composed; the NONE paths keep
    * their own round-trip coverage in HFileSpec.
    */
  val a9_hfile_roundtrip: Q = (s, d) => {
    val dir = Tables.appTmpDir(s, "graft_hfile", d)
    // region count sized from the source's on-disk bytes (~16 MiB of
    // parquet ≈ 1M cells ≈ one region, min 4) — the result is
    // region-count-invariant, but task memory is not. Pure filesystem
    // metadata: no scan runs before the write (VERDICT r11).
    graft.sources.HFileOps.bulkWrite(Tables.cells(s, d), dir,
      regions = graft.sources.HFileOps.regionCountForBytes(
        Tables.bytesOnDisk(s, d, "events")),
      compression = graft.sources.HFileCodec.CompressionGz,
      encoding = graft.sources.HFileCodec.EncodingFastDiff)
    graft.sources.HFileOps.read(s, dir)
      .groupBy(col("cf"), col("qualifier"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("vsum"),
        // cells.ts is epoch-µs BIGINT (Tables.cells)
        sum((col("ts") % 1000003L).cast("decimal(18,0)")).cast("long").as("tsum"),
        count(when(col("op") === "delete", 1)).as("dels"))
      .orderBy(col("cf").asc_nulls_last, col("qualifier").asc_nulls_last)
  }

  /** a10 — point get (the HBase client `Get`): bulk-write the cells as
    * region files, then fetch ONE rowkey through the bloom-pruned seek
    * path ([[graft.sources.HFileOps.pointGet]]) — trailer, bloom meta +
    * chunk, index, one data block; never a region scan. The target key is
    * computed (the rowkey of event_id = 0), not frozen, so it exists at
    * every SF; the single-key driver lookup is the Get's client-supplied
    * argument, not data materialization.
    */
  val a10_hfile_get: Q = (s, d) => {
    // deliberately does NOT share a9's output dir: every declared query is
    // self-contained (the driver may run any subset in any order), so the
    // second bulk write is the price of independence — ~1 s at sf0.1,
    // ~3 s at sf1, bounded by the same region sizing as a9
    val dir = Tables.appTmpDir(s, "graft_hfile_get", d)
    // ROW_INDEX_V1+GZ regions (the encoding HBase recommends for
    // point-read-heavy tables): the bloom-pruned positioned-read path
    // must inflate the bloom chunk and index blocks, then BINARY-SEARCH
    // the one data block's row offset array instead of decoding its
    // prefix — the in-block seek is driver-gated here; a9 keeps the
    // FAST_DIFF full-decode coverage
    graft.sources.HFileOps.bulkWrite(Tables.cells(s, d), dir,
      regions = graft.sources.HFileOps.regionCountForBytes(
        Tables.bytesOnDisk(s, d, "events")),
      compression = graft.sources.HFileCodec.CompressionGz,
      encoding = graft.sources.HFileCodec.EncodingRowIndexV1)
    // single-row client-key lookup, built with the SAME Tables.pad spelling
    // the cells view uses (a hand-rolled format string here would be a third
    // independent copy of the rowkey layout — code-review finding)
    val rowkey = Tables.events(s, d).where(col("event_id") === 0)
      .select(concat(Tables.pad(col("user_id")), lit(":"),
        Tables.pad(col("event_id"))))
      .head().getString(0)
    graft.sources.HFileOps.pointGet(s, dir, rowkey)
      // cells.ts is already epoch-µs; keep the ts_us output name the
      // oracle text aliases
      .select(col("rowkey"), col("cf"), col("qualifier"),
        col("ts").as("ts_us"), col("value"), col("op"))
      .orderBy(col("qualifier").asc_nulls_last, col("ts_us").asc_nulls_last)
  }

  /** a12 — the r9 codec surface under the driver gate: the a9 round-trip
    * aggregate over regions written ZSTD-compressed + PREFIX-encoded.
    * ZSTD/SNAPPY/LZ4 ride the codec jars Spark itself ships (zstd-jni
    * etc. — no new dependency); a9 keeps GZ+FAST_DIFF and a10 keeps
    * GZ+ROW_INDEX_V1, so the three driver-gated HFile queries cover
    * three codec × encoding combinations end to end; SNAPPY/LZ4 carry
    * their own spec + fuzz coverage in HFileSpec/HFileFuzzProps.
    */
  val a12_hfile_zstd: Q = (s, d) => {
    val dir = Tables.appTmpDir(s, "graft_hfile_zstd", d)
    graft.sources.HFileOps.bulkWrite(Tables.cells(s, d), dir,
      regions = graft.sources.HFileOps.regionCountForBytes(
        Tables.bytesOnDisk(s, d, "events")),
      compression = graft.sources.HFileCodec.CompressionZstd,
      encoding = graft.sources.HFileCodec.EncodingPrefix)
    graft.sources.HFileOps.read(s, dir)
      .groupBy(col("cf"), col("qualifier"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("vsum"),
        sum((col("ts") % 1000003L).cast("decimal(18,0)")).cast("long").as("tsum"),
        count(when(col("op") === "delete", 1)).as("dels"))
      .orderBy(col("cf").asc_nulls_last, col("qualifier").asc_nulls_last)
  }

  /** a13 — LSM merge-on-read across store-file generations (r9): the
    * read path a region server runs over accumulated store files, end to
    * end under the driver gate. Generation 0 holds the base cells;
    * generation 1 adds newer versions (ts+1s, value+1) for every 5th
    * event and delete tombstones (ts+2s) for every 7th — events divisible
    * by 35 get both, and the later delete must win. [[graft.sources
    * .HFileOps.mergedRead]] resolves (ts, gen) — newest wins, winning
    * tombstone hides the coordinate — and the oracle recomputes the same
    * view relationally from the events table. The generations are
    * deliberately written with DIFFERENT codecs (GZ+FAST_DIFF base,
    * SNAPPY+PREFIX delta): HBase never requires store files of one
    * column family to agree on compression, and the reader must not
    * either.
    */
  val a13_hfile_merge_read: Q = (s, d) => {
    val dir = Tables.appTmpDir(s, "graft_hfile_lsm", d)
    val cells = Tables.cells(s, d)
    // event_id = the rowkey's second 12-char component (1-based pos 14)
    val eid = expr("cast(substring(rowkey, 14, 12) as bigint)")
    val updates = cells.where(eid % 5 === 0)
      .withColumn("ts", col("ts") + 1000000L)
      .withColumn("value", col("value") + 1.0)
      .withColumn("op", lit("put"))
    val deletes = cells.where(eid % 7 === 0)
      .withColumn("ts", col("ts") + 2000000L)
      .withColumn("op", lit("delete"))
    val regions = graft.sources.HFileOps.regionCountForBytes(
      Tables.bytesOnDisk(s, d, "events"))
    graft.sources.HFileOps.bulkWrite(cells, dir, regions,
      compression = graft.sources.HFileCodec.CompressionGz,
      encoding = graft.sources.HFileCodec.EncodingFastDiff, generation = 0)
    graft.sources.HFileOps.bulkWrite(updates.unionByName(deletes), dir, regions,
      compression = graft.sources.HFileCodec.CompressionSnappy,
      encoding = graft.sources.HFileCodec.EncodingPrefix, generation = 1)
    graft.sources.HFileOps.mergedRead(s, dir)
      .groupBy(col("cf"), col("qualifier"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("vsum"),
        sum((col("ts") % 1000003L).cast("decimal(18,0)")).cast("long").as("tsum"))
      .orderBy(col("cf").asc_nulls_last, col("qualifier").asc_nulls_last)
  }

  /** Write the full delete-scope lattice store into `dir`: cells keyed
    * by USER (one rowkey per user, every event_type a qualifier,
    * multiple versions per coordinate) as generation 0, then a delta
    * generation carrying all three tombstone scopes — `delete_version`
    * (event_id % 11, at the put's EXACT ts), `delete` = DeleteColumn
    * (event_id % 7, at ts+2s, masks at-or-before), and `delete_family`
    * (user_id % 5, empty qualifier at the user's min ts + 1.5s, masks
    * every column of the family at-or-before) — the generations under
    * deliberately DIFFERENT codecs. Shared by the cooked a14 read and
    * the raw b34 scan; idempotent per generation (a rewrite replaces
    * exactly its own files).
    */
  private[graft] def deleteLatticeWrite(s: org.apache.spark.sql.SparkSession, d: String,
                                        dir: String): Unit = {
    import graft.sources.{HFileCodec, HFileOps}
    val u = Tables.events(s, d).select(
      Tables.pad(col("user_id")).as("rowkey"), lit("e").as("cf"),
      col("event_type").as("qualifier"), Tables.tsMicros(col("ts")).as("ts"),
      col("value"), col("event_id"), col("user_id"))
    val cellCols = Seq("rowkey", "cf", "qualifier", "ts", "value", "op")
    val base = u.withColumn("op", lit("put"))
      .select(cellCols.map(col): _*)
    val delv = u.where(col("event_id") % 11 === 0)
      .withColumn("op", lit("delete_version")).select(cellCols.map(col): _*)
    val delc = u.where(col("event_id") % 7 === 0)
      .withColumn("ts", col("ts") + 2000000L)
      .withColumn("op", lit("delete")).select(cellCols.map(col): _*)
    val delf = u.where(col("user_id") % 5 === 0)
      .groupBy("rowkey", "cf").agg((min(col("ts")) + 1500000L).as("ts"))
      .select(col("rowkey"), col("cf"), lit("").as("qualifier"), col("ts"),
        lit(0.0).as("value"), lit("delete_family").as("op"))
    val regions = HFileOps.regionCountForBytes(
      Tables.bytesOnDisk(s, d, "events"))
    HFileOps.bulkWrite(base, dir, regions,
      compression = HFileCodec.CompressionGz,
      encoding = HFileCodec.EncodingFastDiff, generation = 0)
    HFileOps.bulkWrite(delv.unionByName(delc).unionByName(delf), dir, regions,
      compression = HFileCodec.CompressionZstd,
      encoding = HFileCodec.EncodingRowIndexV1, generation = 1)
    ()
  }

  /** a14 — the full HBase delete-scope lattice under the driver gate
    * (r10): the [[deleteLatticeWrite]] store resolved by
    * [[graft.sources.HFileOps.mergedRead]]'s exchange-free heap merge at
    * maxVersions = 2; the oracle recomputes the visible set relationally
    * from events.
    */
  val a14_hfile_delete_types: Q = (s, d) => {
    val dir = Tables.appTmpDir(s, "graft_hfile_deltypes", d)
    deleteLatticeWrite(s, d, dir)
    graft.sources.HFileOps.mergedRead(s, dir, maxVersions = 2)
      .groupBy(col("qualifier"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("vsum"),
        sum((col("ts") % 1000003L).cast("decimal(18,0)")).cast("long").as("tsum"))
      .orderBy(col("qualifier").asc_nulls_last)
  }

  /** a16 — per-column-family store layout + family-level I/O pruning
    * (the `Scan#addFamily` fast path): the cells view re-familied the
    * way real schemas split hot access paths from cold metadata
    * (`hot` = the click/view columns, `meta` = the rest), bulk-written
    * through [[graft.sources.HFileOps.bulkWriteFamilies]] — ONE pass,
    * each range partition writing one store file per family it holds,
    * exactly HBase's one-store-per-family-per-region layout — then read
    * back family-selectively: [[graft.sources.HFileOps.readFamilies]]
    * opens ONLY the `cf=hot` store directory, so the meta family's
    * bytes are never touched (MultiCfSpec pins the layout, the
    * round-trip, and structurally that pruning selects no meta path).
    * Oracle: the derived-family filter over the cells view.
    */
  val a16_multi_cf_prune: Q = (s, d) => {
    import graft.sources.{HFileCodec, HFileOps}
    val dir = Tables.appTmpDir(s, "graft_hfile_mcf", d)
    val recf = Tables.cells(s, d).withColumn("cf",
      when(col("qualifier").isin("click", "view"), "hot").otherwise("meta"))
    HFileOps.bulkWriteFamilies(recf, dir,
      regions = HFileOps.regionCountForBytes(Tables.bytesOnDisk(s, d, "events")),
      compression = HFileCodec.CompressionGz,
      encoding = HFileCodec.EncodingFastDiff)
    HFileOps.readFamilies(s, dir, Seq("hot"))
      .groupBy(col("cf"), col("qualifier"))
      .agg(count(lit(1)).as("n"),
        dsum(col("value")).as("vsum"),
        sum((col("ts") % 1000003L).cast("decimal(18,0)")).cast("long").as("tsum"),
        count_if(col("op") === "delete").as("dels"))
      .orderBy(col("cf").asc_nulls_last, col("qualifier").asc_nulls_last)
  }

  /** a17 — MOB storage (HBase Medium Object feature, `MOB_THRESHOLD`):
    * values above a size threshold are not stored inline — the main
    * store's cell carries a REFERENCE and the payload lands in a
    * separate content-addressed MOB store, which is what keeps huge
    * values out of every compaction rewrite (the feature's whole point
    * at 100 TB: a major compaction re-sorts references, never the
    * payload bytes). Here the documents table is the value corpus:
    * texts over 300 chars go to the MOB store keyed by content hash
    * (identical payloads dedup by construction, like MOB file refcounts),
    * the rest inline; both stores are REAL text-valued HFile region sets
    * ([[graft.sources.HFileOps.bulkWrite]] `textValue` mode), and the
    * read path re-joins ONLY the mob-flagged sliver against the MOB
    * store on the reference key. The gate hashes the RECONSTRUCTED
    * corpus per storage class (counts, exact char sums, a modular sum of
    * each text's portable md5) against the original documents table —
    * any corruption anywhere in either binary roundtrip or the re-join
    * moves the sum.
    */
  /** a17's write half over any (doc_id, text) frame — shared by the
    * batch gate and the I26 streaming ingest sink (which passes each
    * micro-batch with its own store-file `generation`, the I17
    * replay-overwrite discipline). Payloads are content-hash-keyed and
    * deduped within the frame; across generations the hash key makes a
    * re-delivered payload collapse at read time ([[mobReconstruct]]).
    */
  private[graft] def mobWrite(docs0: org.apache.spark.sql.DataFrame,
                              dir: String, regions: Int,
                              generation: Int = -1): Unit = {
    import graft.sources.{HFileCodec, HFileOps}
    val docs = docs0.where(col("text").isNotNull)
      .withColumn("is_mob", length(col("text")) > 300)
    // the MOB-ness of a cell is carried in its QUALIFIER ('ref' vs
    // 'text'), never inferred from value bytes: real HBase flags the
    // reference in a cell tag, and a value-prefix test would misclassify
    // an inline document that happens to start with the marker
    // (ADVICE r12). A ref cell's value is the content hash alone.
    val main = docs.select(
      Tables.pad(col("doc_id")).as("rowkey"), lit("d").as("cf"),
      when(col("is_mob"), "ref").otherwise("text").as("qualifier"),
      lit(1L).as("ts"),
      when(col("is_mob"), md5(col("text")))
        .otherwise(col("text")).as("value"),
      lit("put").as("op"))
    val mob = docs.where(col("is_mob")).select(
        md5(col("text")).as("rowkey"), lit("m").as("cf"),
        lit("v").as("qualifier"), lit(1L).as("ts"),
        col("text").as("value"), lit("put").as("op"))
      .dropDuplicates("rowkey")
    HFileOps.bulkWrite(main, s"$dir/main", regions,
      compression = HFileCodec.CompressionGz,
      encoding = HFileCodec.EncodingFastDiff, generation = generation,
      textValue = true)
    HFileOps.bulkWrite(mob, s"$dir/mob", regions,
      compression = HFileCodec.CompressionGz, generation = generation,
      textValue = true)
  }

  /** a17's read half: reconstruct `(is_mob, text)` from the two stores.
    * The MOB side dedups on its content-hash key first: the same
    * over-threshold value delivered in two ingest generations is one
    * logical payload (identical bytes by construction — the hash IS the
    * key), so replayed/repeated deliveries are read-time no-ops.
    */
  private[graft] def mobReconstruct(s: org.apache.spark.sql.SparkSession,
                                    dir: String)
      : org.apache.spark.sql.DataFrame = {
    import graft.sources.HFileOps
    // classification reads the explicit 'ref' qualifier — never the
    // value bytes (ADVICE r12); only the ref sliver joins the MOB store
    val mainRead = HFileOps.readText(s, s"$dir/main")
      .withColumn("is_mob", col("qualifier") === "ref")
    val mobRead = HFileOps.readText(s, s"$dir/mob")
      .dropDuplicates("rowkey")
      .select(col("rowkey").as("ref"), col("value").as("payload"))
    mainRead
      .join(mobRead, col("is_mob") && col("value") === col("ref"), "left")
      .select(col("is_mob"),
        when(col("is_mob"), col("payload")).otherwise(col("value")).as("text"))
  }

  val a17_mob_storage: Q = (s, d) => {
    import graft.sources.HFileOps
    val dir = Tables.appTmpDir(s, "graft_hfile_mob", d)
    val regions = HFileOps.regionCountForBytes(Tables.bytesOnDisk(s, d, "documents"))
    mobWrite(Tables.documents(s, d), dir, regions)
    mobReconstruct(s, dir)
      .groupBy("is_mob")
      .agg(count(lit(1)).as("n"),
        sum(length(col("text"))).cast("long").as("csum"),
        pmod(sum(conv(substring(md5(col("text")), 1, 15), 16, 10)
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))), lit(1000000007))
          .cast("long").as("hmod"))
      .orderBy(col("is_mob").asc_nulls_last)
  }

  /** a18 — table snapshot + clone (HBase `HBaseAdmin#snapshot` /
    * `cloneSnapshot`): a snapshot is a MANIFEST referencing the
    * immutable store files live at snapshot time — O(files) metadata,
    * zero data copy, the only snapshot model that works at 100 TB — and
    * a clone READS THROUGH the manifest, so store files flushed
    * afterwards are invisible to it while the live table merges them.
    * Here: gen0 bulk-load → snapshot pinned to exactly the files that
    * write returned (re-pinning gen0 on a re-run in the same app —
    * idempotent) → a post-snapshot delta generation (updates for
    * event_id % 4 at ts+1s, DeleteColumn tombstones for % 6 at ts+2s) →
    * both views resolve through the SAME merge-on-read lattice
    * ([[graft.sources.HFileOps.readSnapshot]] vs
    * [[graft.sources.HFileOps.mergedRead]]). The gate digests the two
    * views side by side, so clone isolation (no delta bleed-through)
    * AND live delta resolution sit inside one hash.
    */
  val a18_hfile_snapshot: Q = (s, d) => {
    import graft.sources.{HFileCodec, HFileOps}
    val dir = Tables.appTmpDir(s, "graft_hfile_snap", d)
    val cells = Tables.cells(s, d)
    val eid = expr("cast(substring(rowkey, 14, 12) as bigint)")
    val regions = HFileOps.regionCountForBytes(
      Tables.bytesOnDisk(s, d, "events"))
    val gen0 = HFileOps.bulkWrite(cells, dir, regions,
      compression = HFileCodec.CompressionGz,
      encoding = HFileCodec.EncodingFastDiff, generation = 0)
    HFileOps.snapshot(s, gen0.map(n => s"$dir/$n"), s"$dir/snap0.manifest")
    val updates = cells.where(eid % 4 === 0)
      .withColumn("ts", col("ts") + 1000000L)
      .withColumn("value", col("value") + 2.0)
      .withColumn("op", lit("put"))
    val deletes = cells.where(eid % 6 === 0)
      .withColumn("ts", col("ts") + 2000000L)
      .withColumn("op", lit("delete"))
    HFileOps.bulkWrite(updates.unionByName(deletes), dir, regions,
      compression = HFileCodec.CompressionSnappy,
      encoding = HFileCodec.EncodingPrefix, generation = 1)
    val clone = HFileOps.readSnapshot(s, s"$dir/snap0.manifest")
      .withColumn("vw", lit("clone"))
    val live = HFileOps.mergedRead(s, dir).withColumn("vw", lit("live"))
    clone.unionByName(live)
      .groupBy(col("vw"), col("qualifier"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("vsum"),
        sum((col("ts") % 999983L).cast("decimal(18,0)")).cast("long").as("tsum"))
      .orderBy(col("vw").asc_nulls_last, col("qualifier").asc_nulls_last)
  }

  /** The planted live drift of the a33 restore gate — REAL file
    * operations on real store files, the three ways a live table walks
    * away from its snapshot:
    *   - regions 2 and 7 get a post-snapshot FLUSH (a gen-001 store
    *     file appears next to the pinned gen-000 one) → `replace`
    *   - regions 1 and 6 are ARCHIVED (their gen-000 file moves to
    *     `<dir>/archive/` — HBase archives snapshot-referenced files,
    *     never deletes them) → `add`
    *   - region 8 appears live-only (a region created after the
    *     snapshot) → `delete`
    *   - regions 0/3/4/5 untouched → `keep`
    * Shared by the a33 gate and HFileSpec's restore-apply test;
    * idempotent on a re-run in the same app (the gen-000 bulk rewrite
    * recreates the pre-drift layout first, copies overwrite, renames
    * re-fire).
    */
  private[graft] def plantRestoreDrift(s: org.apache.spark.sql.SparkSession,
                                       dir: String): Unit = {
    import org.apache.hadoop.fs.{FileUtil, Path => HP}
    val conf = s.sparkContext.hadoopConfiguration
    val fs = new HP(dir).getFileSystem(conf)
    def p(n: String) = new HP(s"$dir/$n")
    def gen0(r: Int) = f"gen-000-region-$r%05d.hfile"
    for (r <- Seq(2, 7)) { // post-snapshot flush → replace
      val dst = p(f"gen-001-region-$r%05d.hfile")
      fs.delete(dst, false)
      FileUtil.copy(fs, p(gen0(r)), fs, dst, false, conf)
      ()
    }
    val extra = p(gen0(8)) // live-only region → delete
    fs.delete(extra, false)
    FileUtil.copy(fs, p(gen0(0)), fs, extra, false, conf)
    val archDir = new HP(s"$dir/archive")
    fs.mkdirs(archDir)
    for (r <- Seq(1, 6)) { // archived since the snapshot → add
      val src = p(gen0(r))
      val dst = new HP(archDir, gen0(r))
      fs.delete(dst, false)
      if (fs.exists(src)) fs.rename(src, dst)
      ()
    }
  }

  /** a33 — restore/clone diff (`RestoreSnapshotHelper` semantics): the
    * a18-style snapshot manifest compared against a live table that has
    * drifted all three ways ([[plantRestoreDrift]] — real flushes,
    * archive moves, and a post-snapshot region, like a31's planted
    * damage pattern), reported per region as keep / replace / add /
    * delete with both sides' file counts. The diff itself is O(files)
    * MASTER METADATA — manifest lines vs one directory listing, zero
    * data I/O at any scale; the data movement is [[graft.sources
    * .HFileOps.restoreApply]]'s job, whose bit-for-bit equivalence to
    * the pre-drift snapshot read is HFileSpec's pin. Fixed 8-region
    * grid so the planted drift (and therefore the report) is identical
    * at every SF.
    */
  val a33_snapshot_restore: Q = (s, d) => {
    import graft.sources.{HFileCodec, HFileOps}
    val dir = Tables.appTmpDir(s, "graft_hfile_restore", d)
    val gen0 = HFileOps.bulkWrite(Tables.cells(s, d), dir, 8,
      compression = HFileCodec.CompressionGz,
      encoding = HFileCodec.EncodingFastDiff, generation = 0)
    require(gen0.size == 8,
      s"restore gate expects the full 8-region grid, got ${gen0.size}")
    HFileOps.snapshot(s, gen0.map(n => s"$dir/$n"), s"$dir/restore.manifest")
    plantRestoreDrift(s, dir)
    HFileOps.restoreDiff(s, s"$dir/restore.manifest", dir)
      .orderBy(col("region_id").asc_nulls_last)
  }

  /** a19 — region split via REFERENCE daughters (HBase's split mechanic:
    * a splitting region does NOT rewrite data — each daughter holds a
    * reference to the parent store file restricted to its half-range
    * [start, mid) / [mid, end), and serves reads through it until its own
    * major compaction; at 100 TB this is why a split is a metadata
    * operation, not an I/O storm). The split point comes from
    * [[graft.sources.HFileOps.regionKeyRanges]] — the middle root-index
    * entry, a data-block boundary, read from trailer + load-on-open
    * metadata only (the master's split decision input). Each daughter is
    * one (parent file, half-range) reference served by
    * [[graft.sources.HFileOps.referenceScan]] — ONE task per daughter,
    * bytes read scale with the half (running rangeScan once per daughter
    * instead spawns daughters × regions tasks, nearly all
    * index-rejecting — measured 14× slower at 10M cells); the gate
    * digests the
    * UNION of all daughters against the original table, so any
    * boundary-straddling loss or duplication anywhere in the split moves
    * the hash. HFileSpec pins the per-daughter invariants (disjoint,
    * cover the parent, near-even block split) that the relational oracle
    * cannot see. Small blockSize forces multi-block regions at fixture
    * scale; production regions are always block-rich.
    */
  val a19_region_split: Q = (s, d) => {
    import graft.sources.{HFileCodec, HFileOps}
    val dir = Tables.appTmpDir(s, "graft_hfile_split", d)
    val cells = Tables.cells(s, d)
    val regions = HFileOps.regionCountForBytes(
      Tables.bytesOnDisk(s, d, "events"))
    HFileOps.bulkWrite(cells, dir, regions, blockSize = 16384,
      compression = HFileCodec.CompressionGz,
      encoding = HFileCodec.EncodingFastDiff)
    val ranges = HFileOps.regionKeyRanges(s, dir).sortBy(_._2)
    val refs = ranges.zipWithIndex.flatMap {
      case ((path, first, mid, last), i) =>
        val stop = if (i + 1 < ranges.size) ranges(i + 1)._2 else last + " "
        Seq((path, first, mid), (path, mid, stop))
    }
    HFileOps.referenceScan(s, refs)
      .groupBy(col("qualifier"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("vsum"),
        sum((col("ts") % 999979L).cast("decimal(18,0)")).cast("long").as("tsum"))
      .orderBy(col("qualifier").asc_nulls_last)
  }

  /** a20 — region MERGE via served parents + post-merge compaction (the
    * inverse of a19's split [public: o.a.h.hbase.client
    * .Admin#mergeRegionsAsync]): adjacent regions are paired and each
    * pair is served as ONE merged region over BOTH parents' store files
    * ([[graft.sources.HFileOps.mergedRegionScan]] — one task per merged
    * region in one RDD, no data rewrite: at 100 TB a merge must be a
    * metadata operation exactly like the split), then the post-merge
    * compaction rewrites each merged region as ONE store file
    * ([[graft.sources.HFileOps.compactRegions]] — streaming, zero
    * shuffle, deliberately a DIFFERENT codec/encoding than the parents:
    * a compaction may change the family's compression settings). The
    * gate digests BOTH views side by side against the original table,
    * so any boundary loss/duplication in the merge AND any corruption
    * in the compaction rewrite move the hash; HFileSpec pins the
    * structural invariants (parent adjacency, one file per merged
    * region, merged key ranges spanning exactly the parents) the
    * relational oracle cannot see.
    */
  val a20_region_merge: Q = (s, d) => {
    import graft.sources.{HFileCodec, HFileOps}
    val dir = Tables.appTmpDir(s, "graft_hfile_rmerge", d)
    val cells = Tables.cells(s, d)
    val regions = HFileOps.regionCountForBytes(
      Tables.bytesOnDisk(s, d, "events"))
    HFileOps.bulkWrite(cells, dir, regions, blockSize = 16384,
      compression = HFileCodec.CompressionGz,
      encoding = HFileCodec.EncodingFastDiff)
    // adjacent pairing off the master's metadata view (trailer +
    // load-on-open reads only); an odd region count leaves the last
    // region a singleton group — served and compacted as itself
    val ranges = HFileOps.regionKeyRanges(s, dir).sortBy(_._2)
    val groups = ranges.map(_._1).grouped(2).map(_.toSeq).toSeq
    val merged = HFileOps.mergedRegionScan(s, groups)
      .withColumn("vw", lit("merged"))
    val cdir = Tables.appTmpDir(s, "graft_hfile_rmerge_c", d)
    HFileOps.compactRegions(s, groups, cdir,
      compression = HFileCodec.CompressionZstd,
      encoding = HFileCodec.EncodingPrefix)
    val compacted = HFileOps.read(s, cdir).withColumn("vw", lit("compacted"))
    merged.unionByName(compacted)
      .groupBy(col("vw"), col("qualifier"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("vsum"),
        sum((col("ts") % 999961L).cast("decimal(18,0)")).cast("long").as("tsum"))
      .orderBy(col("vw").asc_nulls_last, col("qualifier").asc_nulls_last)
  }

  val queries: Map[String, Q] = Map(
    "a20_region_merge" -> a20_region_merge,
    "a19_region_split" -> a19_region_split,
    "a18_hfile_snapshot" -> a18_hfile_snapshot,
    "a33_snapshot_restore" -> a33_snapshot_restore,
    "a17_mob_storage" -> a17_mob_storage,
    "a16_multi_cf_prune" -> a16_multi_cf_prune,
    "a1_scan_parquet" -> a1_scan_parquet,
    "a12_hfile_zstd" -> a12_hfile_zstd,
    "a13_hfile_merge_read" -> a13_hfile_merge_read,
    "a14_hfile_delete_types" -> a14_hfile_delete_types,
    "a2_csv_roundtrip" -> a2_csv_roundtrip,
    "a4_cells_scan" -> a4_cells_scan,
    "a5_bulkload_splits" -> a5_bulkload_splits,
    "a6_cells_asof" -> a6_cells_asof,
    "a8_cells_pivot" -> a8_cells_pivot,
    "a9_hfile_roundtrip" -> a9_hfile_roundtrip,
    "a10_hfile_get" -> a10_hfile_get)
}
