package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** B family — projection, filters, HBase read predicates (SURVEY.md §2.3).
  *
  * All plain-column predicates (B2–B6, B9–B11) stay as raw Catalyst
  * comparisons so they reach the parquet reader as PushedFilters — at
  * 100 TB that's the difference between scanning a row-group and skipping
  * it. The HBase-semantics ops (B7/B8/B15) are window compositions over the
  * cells view, partitioned by the cell coordinate so they shuffle once on
  * the natural key.
  */
object FilterOps {

  /** b1 — projection with expression select. */
  val b1_project: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("disc_price"))
      // (orderkey, linenumber) is NOT unique in the synthetic fixture —
      // disc_price tiebreak makes the order total (R1).
      .orderBy(col("l_orderkey").asc_nulls_last, col("l_linenumber").asc_nulls_last,
        col("disc_price").asc_nulls_last)
      .limit(200)

  /** b2 — comparison + boolean predicates; all push to parquet. */
  val b2_filter_pred: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_quantity").between(10, 20)
        && col("l_discount") > 0.05
        && !(col("l_returnflag") === "A"))
      .agg(count(lit(1)).as("n"))

  /** b3 — IN-list predicate. */
  val b3_filter_in: Q = (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderstatus").isin("F", "P"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority").asc_nulls_last)

  /** b4 — HBase PrefixFilter: startsWith on the sortable rowkey. On a
    * rowkey-sorted layout this prunes to the matching key range.
    */
  val b4_rowkey_prefix: Q = (s, d) =>
    Tables.cells(s, d)
      .filter(col("rowkey").startsWith("000000000042:"))
      .agg(count(lit(1)).as("n"))

  /** b5 — HBase RegexStringComparator ⇒ rlike. */
  val b5_filter_regex: Q = (s, d) =>
    Tables.nation(s, d)
      .filter(col("n_name").rlike("^NATION_1[0-9]$"))
      .select(col("n_name"))
      .orderBy(col("n_name").asc_nulls_last)

  /** b6 — NULL semantics. */
  val b6_filter_null: Q = (s, d) =>
    Tables.customer(s, d).agg(
      count(lit(1)).as("nn"),
      count_if(col("c_acctbal").isNull).as("nulls"))

  /** b7 — latest-version read (HBase Get default, VERSIONS=>1): newest put
    * per cell coordinate.
    */
  val b7_latest_cells: Q = (s, d) => {
    val w = Window.partitionBy(col("rowkey"), col("cf"), col("qualifier"))
      .orderBy(col("ts").desc, col("value").asc)
    Tables.cells(s, d)
      .filter(col("op") === "put")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("rowkey"), col("qualifier"), col("value"))
      .orderBy(col("rowkey").asc_nulls_last, col("qualifier").asc_nulls_last)
      .limit(500)
  }

  /** b8 — maxVersions N read (Scan#readVersions): same window, rn <= 3. */
  val b8_max_versions: Q = (s, d) => {
    val w = Window.partitionBy(col("rowkey"), col("cf"), col("qualifier"))
      .orderBy(col("ts").desc, col("value").asc)
    Tables.cells(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .agg(count(lit(1)).as("n"))
  }

  /** b9 — rowkey range scan (Scan#withStartRow/#withStopRow): BETWEEN on the
    * zero-padded composite key ⇒ parquet min/max pruning.
    */
  val b9_rowkey_range: Q = (s, d) =>
    Tables.cells(s, d)
      .filter(col("rowkey").between(
        "000000000010:000000000000", "000000000020:000000999999999999"))
      .agg(count(lit(1)).as("n"))

  /** b10 — time-range scan (Scan#setTimeRange). NTZ literals (not
    * `unix_micros(ts) BETWEEN …`) keep the predicate pushable to the
    * parquet scan — PlanSpec pins the PushedFilters line. The bounds are
    * the old frozen epoch constants (1704500000000000 / 1705500000000000
    * µs) rendered as UTC wall-clock.
    */
  val b10_ts_range: Q = (s, d) =>
    Tables.events(s, d)
      .filter(col("ts").between(
        expr("timestamp_ntz'2024-01-06 00:13:20'"),
        expr("timestamp_ntz'2024-01-17 14:00:00'")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type").asc_nulls_last)

  /** b11 — qualifier/column-prefix filter. */
  val b11_qualifier_filter: Q = (s, d) =>
    Tables.cells(s, d)
      .filter(col("qualifier").startsWith("c"))
      .agg(count(lit(1)).as("n"))

  /** b12 — SingleColumnValueFilter: keep whole rows (users) where some cell
    * matches, expressed as a left-semi join (EXISTS). The matching side is
    * tiny after the filter, so AQE broadcasts it.
    */
  val b12_scvf_exists: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val matching = ev
      .filter(col("event_type") === "purchase" && col("value") > 100)
      .select(col("user_id").as("m_user"))
    ev.join(matching, col("user_id") === col("m_user"), "left_semi")
      .agg(countDistinct(col("user_id")).as("n"))
  }

  /** b13 — PageFilter: first k rows per region, regions modeled as 8-way
    * salt buckets. Per-bucket windows shuffle on the bucket key only.
    */
  val b13_page_per_bucket: Q = (s, d) => {
    val ev = Tables.events(s, d).select(
      (col("user_id") % 8).as("bucket"),
      concat(Tables.pad(col("user_id")), lit(":"), Tables.pad(col("event_id"))).as("rowkey"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("rowkey").asc)
    ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("bucket"), col("rowkey"))
      .orderBy(col("bucket").asc_nulls_last, col("rowkey").asc_nulls_last)
  }

  /** b14 — FirstKeyOnly/KeyOnly fast path: keys + first qualifier only. */
  val b14_first_key: Q = (s, d) =>
    Tables.cells(s, d)
      .groupBy(col("rowkey"))
      .agg(min(col("qualifier")).as("first_qual"))
      .orderBy(col("rowkey").asc_nulls_last)
      .limit(300)

  /** b15 — delete-tombstone masking: the newest delete per cell coordinate
    * masks all older puts (HBase KeyValue.Type.Delete read semantics).
    */
  val b15_tombstone_mask: Q = (s, d) => {
    val w = Window.partitionBy(col("rowkey"), col("cf"), col("qualifier"))
    Tables.cells(s, d)
      .withColumn("del_ts", max(when(col("op") === "delete", col("ts"))).over(w))
      .filter(col("op") === "put" && (col("del_ts").isNull || col("ts") > col("del_ts")))
      .agg(count(lit(1)).as("survivors"))
  }

  /** b16 — canary-style table verification: row count + decimal checksum. */
  val b16_table_checksum: Q = (s, d) =>
    Tables.orders(s, d).agg(
      count(lit(1)).as("n"),
      dsum(col("o_totalprice")).as("checksum"))

  /** b17 — major compaction (HBase heritage): TTL expiry, delete-tombstone
    * masking, version cap, and tombstone discard composed into the
    * rewritten-table view — the read-side semantics of an HBase major
    * compaction. One shuffle on the cell coordinate; at 100 TB this is the
    * periodic rewrite job, range-partitioned by rowkey on write (A5).
    */
  val b17_compaction: Q = (s, d) => {
    val ttlFloor = 1704800000000000L // epoch µs (cells.ts domain)
    val coord = Window.partitionBy("rowkey", "cf", "qualifier")
    val live = Tables.cells(s, d).where(col("ts") >= ttlFloor)
      .withColumn("del_ts", max(when(col("op") === "delete", col("ts"))).over(coord))
    val survivors = live.where(col("op") === "put"
      && (col("del_ts").isNull || col("ts") > col("del_ts")))
    val versioned = survivors.withColumn("rn",
      row_number().over(coord.orderBy(col("ts").desc, col("value"))))
      .where(col("rn") <= 2)
    versioned.groupBy("qualifier")
      .agg(count(lit(1)).as("n"), countDistinct("rowkey").as("nrows"))
      .orderBy(col("qualifier").asc_nulls_last)
  }

  /** b18 — HBase MultiRowRangeFilter [public: o.a.h.hbase.filter
    * .MultiRowRangeFilter]: a scan over several disjoint rowkey ranges in
    * one pass. The OR-of-BETWEENs stays a raw parquet predicate, so each
    * range prunes to its row groups on a rowkey-sorted layout — at scale
    * this is k range-reads, not a full scan.
    */
  val b18_multi_range: Q = (s, d) => {
    def k(u: String, e: String) = s"$u:$e"
    val lo1 = k("000000000010", "000000000000"); val hi1 = k("000000000019", "999999999999")
    val lo2 = k("000000000200", "000000000000"); val hi2 = k("000000000219", "999999999999")
    val lo3 = k("000000000400", "000000000000"); val hi3 = k("000000000449", "999999999999")
    Tables.cells(s, d)
      .filter(col("rowkey").between(lo1, hi1)
        || col("rowkey").between(lo2, hi2)
        || col("rowkey").between(lo3, hi3))
      .agg(count(lit(1)).as("n"))
  }

  /** b19 — HBase FuzzyRowFilter [public: o.a.h.hbase.filter
    * .FuzzyRowFilter]: rowkey match with fixed bytes at some positions and
    * wildcards at others — here "user id's last digit is 7" on the
    * zero-padded composite key, spelled as a SQL LIKE with `_` wildcards
    * (same per-row byte test the HBase filter runs server-side).
    */
  val b19_fuzzy_rowkey: Q = (s, d) =>
    Tables.cells(s, d)
      .filter(col("rowkey").like("0000000000_7:%"))
      .groupBy(col("qualifier"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("qualifier").asc_nulls_last)

  /** b20 — HBase ColumnPaginationFilter(limit=2, offset=1) [public:
    * o.a.h.hbase.filter.ColumnPaginationFilter]: per logical row, after the
    * standard latest-version read, return the 2nd and 3rd columns in
    * qualifier order. The logical row here is the user entity — the 12-char
    * rowkey prefix — because the cells fixture keys every cell by
    * user:event, so pagination at the full-rowkey grain would always see a
    * single column (a vacuous page). Two window shuffles — the version
    * window hashes the full cell coordinate, the pagination window the
    * 12-char user prefix (hash-clustering on the fine key does not
    * satisfy the coarse one) — both on bounded per-user partitions at any
    * scale; rowkey tie-breaks the qualifier order for determinism.
    */
  val b20_column_pagination: Q = (s, d) => {
    val latest = Window.partitionBy("rowkey", "cf", "qualifier")
      .orderBy(col("ts").desc, col("value"))
    val page = Window.partitionBy(substring(col("rowkey"), 1, 12))
      .orderBy(col("qualifier"), col("rowkey"))
    Tables.cells(s, d)
      .withColumn("rnv", row_number().over(latest)).where(col("rnv") === 1)
      .withColumn("cpos", row_number().over(page))
      .where(col("cpos").between(2, 3))
      .groupBy(col("qualifier"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("qualifier").asc_nulls_last)
  }

  /** b21 — reversed scan (HBase `Scan#setReversed`, the "closest row
    * at-or-before" / last-N-rows idiom): the last 50 cells at-or-before a
    * mid-keyspace rowkey, descending, served off bulk-written region
    * files through [[graft.sources.HFileOps.rangeScan]]'s reversed mode.
    * The per-region block walk runs back to front and stops at the limit,
    * so bytes read scale with K (and regions whose whole range sorts
    * above the bound are rejected from the index alone); the global K
    * across regions is the final orderBy+limit — TakeOrderedAndProject
    * over ≤ 50 candidates per region. The from-key's user prefix (7)
    * exists at every SF. Oracle: ORDER BY rowkey DESC LIMIT 50 over the
    * cells view — rowkeys are unique (user:event), so the order is total.
    */
  val b21_reverse_scan: Q = (s, d) => {
    import graft.sources.{HFileCodec, HFileOps}
    val dir = Tables.appTmpDir(s, "graft_hfile_rev", d)
    HFileOps.bulkWrite(Tables.cells(s, d), dir,
      regions = HFileOps.regionCountForBytes(Tables.bytesOnDisk(s, d, "events")),
      compression = HFileCodec.CompressionGz,
      encoding = HFileCodec.EncodingFastDiff)
    HFileOps.rangeScan(s, dir,
      startRow = "000000000007:999999999999", stopRow = "",
      reversed = true, limit = 50)
      .select(col("rowkey"), col("qualifier"), col("ts").as("ts_us"),
        col("value"), col("op"))
      .orderBy(col("rowkey").desc_nulls_last)
      .limit(50)
  }

  /** b22 — FilterList composition (HBase `FilterList` with
    * MUST_PASS_ONE/MUST_PASS_ALL operators, arbitrarily nested): an
    * AND(OR(prefix, qualifier-regex), value-threshold, NOT(tombstone))
    * tree over the cells view — each leaf is a filter family already
    * gated on its own (b4 prefix, b5 regex, b11 qualifier, b15
    * tombstone); this query gates the COMBINATOR. Spelled as one
    * Catalyst boolean expression, the whole tree stays a single
    * codegen'd predicate evaluated in the scan stage — at 100 TB the OR
    * branch keeps the simple conjuncts (value, op) pushable while the
    * disjunction evaluates post-scan, exactly how a RegionServer runs a
    * FilterList.
    */
  val b22_filter_list: Q = (s, d) =>
    Tables.cells(s, d)
      .filter(
        (col("rowkey").startsWith("00000000004")
          || col("qualifier").rlike("^(click|view)$"))
          && col("value") > 50.0
          && !(col("op") === "delete"))
      .groupBy(col("qualifier"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("vsum"))
      .orderBy(col("qualifier").asc_nulls_last)

  /** b23 — TimestampsFilter (`Scan#setTimestamps`): keep only cells
    * written at EXACTLY the requested version timestamps — the
    * version-dimension point selection beside b10's range. The requested
    * list is carved deterministically from the fixture (the distinct ts
    * of user 1's row) — the "correlate one row's write batch across the
    * whole table" forensics idiom. Scale shape: the wanted-ts list is
    * one row's versions (bounded), broadcast into a left-semi join, so
    * the table side streams map-side with no shuffle.
    */
  val b23_timestamps_filter: Q = (s, d) => {
    val cells = Tables.cells(s, d)
    val wanted = cells.where(col("rowkey").startsWith("000000000001:"))
      .select(col("ts")).distinct()
    cells.join(broadcast(wanted), Seq("ts"), "left_semi")
      .groupBy(col("qualifier"))
      .agg(count(lit(1)).as("n"), countDistinct(col("rowkey")).as("nrows"))
      .orderBy(col("qualifier").asc_nulls_last)
  }

  /** b24 — WhileMatchFilter + InclusiveStopFilter (HBase scan
    * early-termination): forward scan from user 2's first key, bounded
    * inclusively at user 8's last key, emitting cells WHILE
    * `value > 1.0` holds and stopping the whole scan at the first cell
    * that fails (a NULL value fails too — `SingleColumnValueFilter`
    * would not match it). Served off bulk-written region files through
    * [[graft.sources.HFileOps.whileMatchScan]]: each region's block walk
    * terminates at its local first failure (bytes read stop with the
    * match run — HFileSpec pins the block-read count), and the global
    * HBase semantics — the CLIENT scan stops at the first failing row in
    * key order — resolve declaratively: stop key = min failing rowkey
    * across regions (a 1-row aggregate over the bounded tagged output,
    * broadcast back over it). Oracle: rows below the first failing
    * rowkey in the selected range.
    */
  val b24_while_match: Q = (s, d) => {
    import graft.sources.{HFileCodec, HFileOps}
    val dir = Tables.appTmpDir(s, "graft_hfile_wm", d)
    HFileOps.bulkWrite(Tables.cells(s, d), dir,
      regions = HFileOps.regionCountForBytes(Tables.bytesOnDisk(s, d, "events")),
      compression = HFileCodec.CompressionGz,
      encoding = HFileCodec.EncodingFastDiff)
    val tagged = HFileOps.whileMatchScan(s, dir,
        startRow = "000000000002:000000000000",
        stopRowInclusive = "000000000008:999999999999")(
        r => !r.isNullAt(4) && r.getDouble(4) > 1.0)
      .graftCkpt() // two consumers: stop-key aggregate + row filter;
                         // bounded by the per-region match runs, not the table
    val stop = tagged.where(!col("matched")).agg(min(col("rowkey")).as("stopkey"))
    tagged.where(col("matched")).crossJoin(broadcast(stop))
      .where(col("stopkey").isNull || col("rowkey") < col("stopkey"))
      .select(col("rowkey"), col("qualifier"), col("ts").as("ts_us"),
        col("value"), col("op"))
      .orderBy(col("rowkey").asc_nulls_last)
  }

  /** b25 — DependentColumnFilter [public: o.a.h.hbase.filter
    * .DependentColumnFilter]: keep the cells of a row whose timestamp
    * equals the timestamp of that row's REFERENCE column cell (here
    * qualifier `purchase` passing `value > 100`), i.e. "give me
    * everything written in the same batch as a qualifying purchase".
    * The logical row is the user entity (12-char rowkey prefix, the b20
    * convention) and the write timestamp is the DAY-truncated cell ts —
    * the daily bulk-ingest model where each day's load stamps its cells
    * with the batch timestamp, which is exactly the write-batch
    * correlation this filter exists for (at µs grain the fixture's
    * timestamps are all distinct and the filter would only ever
    * self-match). dropDependentColumn=false: reference cells stay.
    * Scale shape: ONE shuffle on the natural (row, batch-ts) key — a
    * boolean max over the coordinate window, no join, mirroring the
    * RegionServer's row-local evaluation; the per-partition state is one
    * user-day.
    */
  val b25_dependent_column: Q = (s, d) => {
    val batch = Window.partitionBy(substring(col("rowkey"), 1, 12), col("bts"))
    Tables.cells(s, d)
      .withColumn("bts", (col("ts") - pmod(col("ts"), lit(86400000000L))).cast("long"))
      .withColumn("ref", max(
        when(col("qualifier") === "purchase" && col("value") > 100, 1)
          .otherwise(0)).over(batch))
      .where(col("ref") === 1)
      .groupBy(col("qualifier"))
      .agg(count(lit(1)).as("n"),
        countDistinct(substring(col("rowkey"), 1, 12)).as("nusers"),
        dsum(col("value")).as("vsum"))
      .orderBy(col("qualifier").asc_nulls_last)
  }

  /** b26 — ColumnCountGetFilter(2) [public: o.a.h.hbase.filter
    * .ColumnCountGetFilter]: a Get that returns at most N columns per
    * row — the RegionServer stops the row after the Nth column. Per
    * logical row (the 12-char user prefix, b20's grain) after the
    * standard latest-version read: the first 2 columns in qualifier
    * order, rowkey tie-breaking for determinism. Same two-window shape
    * as b20 (version window on the full cell coordinate, count window on
    * the user prefix) with the page anchored at the row start — offset 0
    * limit 2 vs b20's offset 1 limit 2.
    */
  val b26_column_count: Q = (s, d) => {
    val latest = Window.partitionBy("rowkey", "cf", "qualifier")
      .orderBy(col("ts").desc, col("value"))
    val page = Window.partitionBy(substring(col("rowkey"), 1, 12))
      .orderBy(col("qualifier"), col("rowkey"))
    Tables.cells(s, d)
      .withColumn("rnv", row_number().over(latest)).where(col("rnv") === 1)
      .withColumn("cpos", row_number().over(page))
      .where(col("cpos") <= 2)
      .select(substring(col("rowkey"), 1, 12).as("row_prefix"),
        col("cpos"), col("rowkey"), col("qualifier"), col("value"))
      .orderBy(col("rowkey").asc_nulls_last)
      .limit(400)
  }

  /** b27 — SkipFilter [public: o.a.h.hbase.filter.SkipFilter]: the
    * row-scope INVERSION combinator — if ANY cell of a row fails the
    * wrapped filter, the WHOLE row is skipped (vs the per-cell filters,
    * which drop only the failing cells). Wrapped filter here: value is
    * non-NULL and ≥ 1.0 (a ValueFilter). The logical row is the user
    * entity (b20's grain). Spelled as a row-scope boolean min over the
    * user window — ONE shuffle on the row key, no join; the oracle is
    * the NOT EXISTS spelling.
    */
  val b27_skip_filter: Q = (s, d) => {
    val row = Window.partitionBy(substring(col("rowkey"), 1, 12))
    Tables.cells(s, d)
      .withColumn("ok", min(
        when(col("value").isNotNull && col("value") >= 1.0, 1).otherwise(0))
        .over(row))
      .where(col("ok") === 1)
      .groupBy(col("qualifier"))
      .agg(count(lit(1)).as("n"),
        countDistinct(substring(col("rowkey"), 1, 12)).as("nusers"),
        dsum(col("value")).as("vsum"))
      .orderBy(col("qualifier").asc_nulls_last)
  }

  /** b28 — ColumnRangeFilter [public: o.a.h.hbase.filter
    * .ColumnRangeFilter]: cells whose qualifier falls in a range —
    * min inclusive, max EXCLUSIVE, the filter's default contract — the
    * column-dimension analog of b9's rowkey range. A raw string
    * predicate, so it pushes to the scan like b2's conjuncts.
    */
  val b28_column_range: Q = (s, d) =>
    Tables.cells(s, d)
      .filter(col("qualifier") >= "click" && col("qualifier") < "signup")
      .groupBy(col("qualifier"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("vsum"))
      .orderBy(col("qualifier").asc_nulls_last)

  /** b29 — MultipleColumnPrefixFilter [public: o.a.h.hbase.filter
    * .MultipleColumnPrefixFilter]: cells whose qualifier starts with ANY
    * of a prefix list — the column-dimension analog of b18's
    * multi-range row scan. The OR of startsWith stays one codegen'd
    * scan predicate.
    */
  val b29_multi_col_prefix: Q = (s, d) =>
    Tables.cells(s, d)
      .filter(col("qualifier").startsWith("cl")
        || col("qualifier").startsWith("si")
        || col("qualifier").startsWith("e"))
      .groupBy(col("qualifier"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("vsum"))
      .orderBy(col("qualifier").asc_nulls_last)

  /** b30 — SingleColumnValueExcludeFilter [public: o.a.h.hbase.filter
    * .SingleColumnValueExcludeFilter]: b12's whole-row value gate, but
    * the TESTED column itself is excluded from the emitted row — "give
    * me the rest of the rows that had a qualifying purchase". Same
    * left-semi shape as b12 (the matching side is small → broadcast),
    * plus the exclusion predicate on the probe side.
    */
  val b30_scv_exclude: Q = (s, d) => {
    val cells = Tables.cells(s, d)
    val matching = cells
      .filter(col("qualifier") === "purchase" && col("value") > 200)
      .select(substring(col("rowkey"), 1, 12).as("m_user"))
    cells
      .join(broadcast(matching.distinct()),
        substring(col("rowkey"), 1, 12) === col("m_user"), "left_semi")
      .filter(!(col("qualifier") === "purchase"))
      .groupBy(col("qualifier"))
      .agg(count(lit(1)).as("n"),
        countDistinct(substring(col("rowkey"), 1, 12)).as("nusers"))
      .orderBy(col("qualifier").asc_nulls_last)
  }

  /** Generic HBase visibility-expression evaluator [public:
    * o.a.h.hbase.security.visibility]: a cell's label expression is an
    * OR (`|`) of AND-clauses (`&`) over labels; the cell is visible to a
    * scan iff SOME OR-alternative has ALL its labels in the scanner's
    * authorizations. Evaluated row-local with codegen'd array HOFs
    * (split → exists/forall) — no UDF, no shuffle.
    */
  def visibleUnder(labelExpr: org.apache.spark.sql.Column,
                   auths: Seq[String]): org.apache.spark.sql.Column = {
    val authArr = array(auths.map(lit): _*)
    // empty expression = unlabeled cell = visible to every scan (the
    // HBase contract); otherwise some OR-alternative must be fully held
    (labelExpr === "") || exists(split(labelExpr, "\\|"),
      clause => forall(split(clause, "&"), l => array_contains(authArr, l)))
  }

  /** b31 — cell visibility labels (the HBase visibility-labels
    * coprocessor surface: `Mutation#setCellVisibility` +
    * `Scan#setAuthorizations`): every cell carries a label expression —
    * here assigned by a deterministic policy over the fixture (purchase
    * cells are finance-grade, with high-value purchases escalated to
    * exec-only; signups are PII; errors ops-or-admin; the rest public) —
    * and a scan authorized as {internal, finance, ops} sees only the
    * cells whose expression it satisfies. The gate reports, per
    * qualifier, total vs visible cells and the visible value sum, so
    * the evaluator's row-dependent decisions (the value>200 escalation
    * splits the purchase column) are all inside the hash. Row-local
    * predicate ⇒ scan-parallel at any scale, exactly like the
    * RegionServer's per-cell evaluation.
    */
  /** The fixture's deterministic label-assignment policy — shared by the
    * batch gate (b31) and the streaming twin (I25) so one spelling pins
    * both. */
  def fixtureVisibility(qualifier: org.apache.spark.sql.Column,
                        value: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(qualifier === "purchase" && value > 200, "finance&exec")
      .when(qualifier === "purchase", "finance&internal")
      .when(qualifier === "signup", "pii&internal")
      .when(qualifier === "error", "ops|admin")
      .otherwise("") // unlabeled: click/view are world-readable

  val b31_visibility_labels: Q = (s, d) => {
    val labeled = Tables.cells(s, d).withColumn("vis",
      fixtureVisibility(col("qualifier"), col("value")))
    labeled
      .withColumn("ok", visibleUnder(col("vis"), Seq("internal", "finance", "ops")))
      .groupBy(col("qualifier"))
      .agg(count(lit(1)).as("n_total"),
        count_if(col("ok")).as("n_visible"),
        coalesce(dsum(when(col("ok"), col("value"))), lit(0.0)).as("vsum_visible"))
      .orderBy(col("qualifier").asc_nulls_last)
  }

  /** b32 — CELL-LEVEL TTL with the tag carried through real storage
    * [public: o.a.h.hbase.client.Mutation#setTTL /
    * TagType.TTL_TAG_TYPE]: each cell gets a deterministic per-cell TTL
    * (1–5 days, derived from its own ts), is bulk-written to an HFile
    * store WITH the v3 TTL tag encoded per cell, read back through the
    * tag-decoding path, and the visibility rule — a cell exists iff
    * `ts + ttl ≥ now`, `now` a query literal — is composed into the
    * compaction view (expiry BEFORE tombstone masking, so an expired
    * delete stops masking and an expired put needs no tombstone: the
    * HBase major-compaction lattice with per-cell, not per-family,
    * expiry). The oracle is the storage-free spelling, so the tag
    * encode → store → decode → visibility cycle must be semantically
    * invisible. Scale shape: one range-partitioned write, one streamed
    * read, one coordinate-window shuffle — the b17 class.
    */
  val b32_cell_ttl: Q = (s, d) => {
    val nowUs = 1705363800000000L // mid ts-span: live and expired mix
    val dir = Tables.appTmpDir(s, "graft_ttl", d)
    val cells = Tables.cells(s, d)
      .withColumn("ttl_ms", ((col("ts") % 5) + 1) * 86400000L)
    graft.sources.HFileOps.bulkWrite(cells, dir,
      regions = graft.sources.HFileOps.regionCountForBytes(
        Tables.bytesOnDisk(s, d, "events")),
      ttlMsCol = Some("ttl_ms"))
    val live = graft.sources.HFileOps.readWithTtl(s, dir)
      .where(col("ttl_ms").isNull
        || col("ts") + col("ttl_ms") * 1000L >= lit(nowUs))
    val coord = Window.partitionBy("rowkey", "cf", "qualifier")
    live
      .withColumn("del_ts", max(when(col("op") === "delete", col("ts"))).over(coord))
      .where(col("op") === "put"
        && (col("del_ts").isNull || col("ts") > col("del_ts")))
      .groupBy("qualifier")
      .agg(count(lit(1)).as("n"), countDistinct("rowkey").as("nrows"),
        dsum(col("value")).as("vsum"),
        lsum(col("ts") % 999983L).as("tsum"))
      .orderBy(col("qualifier").asc_nulls_last)
  }

  /** b33 — the full CELL-METADATA LATTICE through real storage: every
    * cell carries BOTH v3 tags — a per-cell TTL (b32's tag type 8) and
    * its visibility label expression (HBase `Mutation#setCellVisibility`
    * / `TagType.VISIBILITY_TAG_TYPE` = 2; unlabeled cells carry NO tag,
    * the world-readable-by-absence contract) — written into one HFile
    * store, decoded independently by the structural tag walk, and
    * composed in the RegionServer's read order: TTL expiry first, then
    * the authorization filter (an INVISIBLE delete cannot mask — the
    * visibility coprocessor hides it from the scan entirely), then
    * tombstone masking over what the scan is allowed to see. The oracle
    * is the storage-free spelling, so both tag codecs AND their
    * multi-tag coexistence in one blob must be semantically invisible;
    * CellTtlSpec pins the blob-level facts (two tags round-trip per
    * cell, unlabeled cells read vis as null).
    */
  /** b32's mid-span "now" literal — the lattice evaluation instant shared
    * by b33 and its I29 streaming twin.
    */
  private[graft] val TagLatticeNowUs = 1705363800000000L

  /** The b33 tag columns over a cells view: per-cell TTL (deterministic
    * 1–5 days off the timestamp) and the fixture visibility label.
    * Shared by the batch b33 write and the I29 per-micro-batch write —
    * both stores must carry byte-identical tags for the twin to pin
    * anything.
    */
  private[graft] def withTagColumns(
      cells: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    cells
      .withColumn("ttl_ms", ((col("ts") % 5) + 1) * 86400000L)
      .withColumn("vis", fixtureVisibility(col("qualifier"), col("value")))

  /** The RegionServer read-order composition over a tagged-cells
    * reconstruction ([[graft.sources.HFileOps.readWithCellTags]] output):
    * TTL expiry first, then the authorization filter (an INVISIBLE
    * delete cannot mask — the visibility coprocessor hides it from the
    * scan entirely), then tombstone masking over what the scan is
    * allowed to see. Shared by b33 and StreamingSpec I29.
    */
  private[graft] def tagLattice(tagged: org.apache.spark.sql.DataFrame,
                                nowUs: Long = TagLatticeNowUs,
                                auths: Seq[String] =
                                  Seq("internal", "finance", "ops"))
      : org.apache.spark.sql.DataFrame = {
    val live = tagged.where(col("ttl_ms").isNull
      || col("ts") + col("ttl_ms") * 1000L >= lit(nowUs))
    val authed = live.where(visibleUnder(coalesce(col("vis"), lit("")), auths))
    val coord = Window.partitionBy("rowkey", "cf", "qualifier")
    authed
      .withColumn("del_ts", max(when(col("op") === "delete", col("ts"))).over(coord))
      .where(col("op") === "put"
        && (col("del_ts").isNull || col("ts") > col("del_ts")))
  }

  val b33_cell_tags_lattice: Q = (s, d) => {
    val dir = Tables.appTmpDir(s, "graft_tags2", d)
    val cells = withTagColumns(Tables.cells(s, d))
    graft.sources.HFileOps.bulkWrite(cells, dir,
      regions = graft.sources.HFileOps.regionCountForBytes(
        Tables.bytesOnDisk(s, d, "events")),
      ttlMsCol = Some("ttl_ms"), visCol = Some("vis"))
    tagLattice(graft.sources.HFileOps.readWithCellTags(s, dir))
      .groupBy("qualifier")
      .agg(count(lit(1)).as("n"),
        dsum(col("value")).as("vsum"),
        lsum(col("ts") % 999931L).as("tsum"))
      .orderBy(col("qualifier").asc_nulls_last)
  }

  /** b34 — RAW scan (HBase `Scan#setRaw(true)` [public:
    * o.a.h.hbase.client.Scan#setRaw]): the debugging/replication read
    * mode that surfaces EVERYTHING the store files still hold — delete
    * markers of all three scopes AND the put versions they mask — with
    * NO delete resolution applied. Served by
    * [[graft.sources.HFileOps.readWithGen]] over the a14 delete-scope
    * lattice store ([[ScanOps.deleteLatticeWrite]]); the gate digests
    * per (qualifier, op, gen), so a raw read that accidentally resolved
    * tombstones (dropping markers or masked puts) or misattributed file
    * provenance moves the hash. HFileSpec pins the raw ∪ mask algebra:
    * applying the relational delete lattice + version cap to THIS raw
    * view reproduces [[graft.sources.HFileOps.mergedRead]]'s cooked
    * view exactly.
    */
  val b34_raw_scan: Q = (s, d) => {
    val dir = Tables.appTmpDir(s, "graft_raw_scan", d)
    ScanOps.deleteLatticeWrite(s, d, dir)
    graft.sources.HFileOps.readWithGen(s, dir)
      .groupBy(col("qualifier"), col("op"), col("gen"))
      .agg(count(lit(1)).as("n"),
        dsum(col("value")).as("vsum"),
        lsum(col("ts") % 1000003L).as("tsum"))
      .orderBy(col("qualifier").asc_nulls_last, col("op").asc_nulls_last,
        col("gen").asc_nulls_last)
  }

  val queries: Map[String, Q] = Map(
    "b34_raw_scan" -> b34_raw_scan,
    "b33_cell_tags_lattice" -> b33_cell_tags_lattice,
    "b32_cell_ttl" -> b32_cell_ttl,
    "b31_visibility_labels" -> b31_visibility_labels,
    "b30_scv_exclude" -> b30_scv_exclude,
    "b29_multi_col_prefix" -> b29_multi_col_prefix,
    "b28_column_range" -> b28_column_range,
    "b27_skip_filter" -> b27_skip_filter,
    "b26_column_count" -> b26_column_count,
    "b25_dependent_column" -> b25_dependent_column,
    "b24_while_match" -> b24_while_match,
    "b23_timestamps_filter" -> b23_timestamps_filter,
    "b22_filter_list" -> b22_filter_list,
    "b21_reverse_scan" -> b21_reverse_scan,
    "b18_multi_range" -> b18_multi_range,
    "b20_column_pagination" -> b20_column_pagination,
    "b19_fuzzy_rowkey" -> b19_fuzzy_rowkey,
    "b1_project" -> b1_project,
    "b2_filter_pred" -> b2_filter_pred,
    "b3_filter_in" -> b3_filter_in,
    "b4_rowkey_prefix" -> b4_rowkey_prefix,
    "b5_filter_regex" -> b5_filter_regex,
    "b6_filter_null" -> b6_filter_null,
    "b7_latest_cells" -> b7_latest_cells,
    "b8_max_versions" -> b8_max_versions,
    "b9_rowkey_range" -> b9_rowkey_range,
    "b10_ts_range" -> b10_ts_range,
    "b11_qualifier_filter" -> b11_qualifier_filter,
    "b12_scvf_exists" -> b12_scvf_exists,
    "b13_page_per_bucket" -> b13_page_per_bucket,
    "b14_first_key" -> b14_first_key,
    "b15_tombstone_mask" -> b15_tombstone_mask,
    "b16_table_checksum" -> b16_table_checksum,
    "b17_compaction" -> b17_compaction)
}
