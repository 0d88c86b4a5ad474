package graft.oracle

/** DuckDB-dialect oracle SQL, one entry per SparkEntry.queries key
  * (SURVEY.md Appendix A). Authored separately from the Spark twins per
  * rule R8; determinism rules R1–R8 apply to both sides.
  */
object OracleSql {

  /** DuckDB spelling of the canonical cells view (SURVEY.md §1.1). */
  val cellsCte: String =
    """WITH cells AS (
      |  SELECT concat(lpad(CAST(user_id AS VARCHAR), 12, '0'), ':',
      |                lpad(CAST(event_id AS VARCHAR), 12, '0')) AS rowkey,
      |         'e' AS cf, event_type AS qualifier,
      |         CAST(epoch_us(ts) AS BIGINT) AS ts,
      |         value AS value,
      |         CASE WHEN event_id % 97 = 0 THEN 'delete' ELSE 'put' END AS op
      |  FROM events)
      |""".stripMargin

  private def dsum(e: String): String =
    s"CAST(sum(CAST($e AS DECIMAL(18,2))) AS DOUBLE)"

  // a23/a24/b35 region bucketing: exponentially widening user-key ranges
  // (integer CASE arms — no libm, both engines compare exact integers)
  private val regionBucketCase: String =
    """CASE WHEN user_id < 2 THEN 0 WHEN user_id < 4 THEN 1
      | WHEN user_id < 8 THEN 2 WHEN user_id < 16 THEN 3
      | WHEN user_id < 32 THEN 4 WHEN user_id < 64 THEN 5
      | WHEN user_id < 128 THEN 6 WHEN user_id < 256 THEN 7
      | WHEN user_id < 512 THEN 8 ELSE 9 END""".stripMargin

  val scans: Map[String, String] = Map(
    // a23: the normalizer plan — target = floor-div of exact integers
    // (DuckDB `//` ≡ Spark DIV on non-negative longs); split/merge arms
    // are pure integer comparisons over the region-stats CTE
    "a23_region_normalize" ->
      s"""WITH c AS (SELECT concat(lpad(CAST(user_id AS VARCHAR), 12, '0'), ':',
         |                  lpad(CAST(event_id AS VARCHAR), 12, '0')) AS rowkey,
         |                  user_id FROM events),
         |r AS (SELECT $regionBucketCase AS region_id,
         |             min(rowkey) AS start_key, count(*) AS n_cells
         |      FROM c GROUP BY 1),
         |t AS (SELECT CAST(sum(n_cells) // count(*) AS BIGINT) AS tgt FROM r),
         |w AS (SELECT region_id, start_key, n_cells, tgt,
         |        row_number() OVER (ORDER BY start_key) AS idx,
         |        lead(n_cells) OVER (ORDER BY start_key) AS nxt,
         |        lag(n_cells)  OVER (ORDER BY start_key) AS prv
         |      FROM r, t)
         |SELECT region_id, start_key, n_cells, tgt,
         |  CASE WHEN n_cells > 2*tgt THEN 'split'
         |       WHEN idx % 2 = 1 AND nxt IS NOT NULL AND n_cells + nxt < tgt
         |         THEN 'merge_right'
         |       WHEN idx % 2 = 0 AND prv IS NOT NULL AND n_cells + prv < tgt
         |         THEN 'merge_left'
         |       ELSE 'none' END AS action
         |FROM w ORDER BY region_id NULLS LAST""".stripMargin,
    // a24: serpentine placement — rank = row_number over (size desc,
    // region asc), server dealt boustrophedon across 5 servers
    "a24_region_placement" ->
      s"""WITH r AS (SELECT $regionBucketCase AS region_id, count(*) AS n_cells
         |           FROM events GROUP BY 1),
         |w AS (SELECT region_id, n_cells,
         |        row_number() OVER (ORDER BY n_cells DESC, region_id ASC) - 1 AS rk
         |      FROM r)
         |SELECT region_id, n_cells,
         |  CAST(CASE WHEN (rk // 5) % 2 = 0 THEN rk % 5
         |            ELSE 4 - (rk % 5) END AS INT) AS server
         |FROM w ORDER BY region_id NULLS LAST""".stripMargin,
    // a29: RSGroup-constrained placement — the a24 serpentine deal run
    // independently inside each server group (partitioned window);
    // group-qualified server names make cross-group assignment
    // structurally impossible
    "a29_rsgroup_placement" ->
      s"""WITH r AS (SELECT $regionBucketCase AS region_id, count(*) AS n_cells
         |           FROM events GROUP BY 1),
         |g AS (SELECT region_id, n_cells,
         |             CASE WHEN region_id <= 4 THEN 'g0' ELSE 'g1' END AS grp
         |      FROM r),
         |s AS (SELECT 'g0' AS grp, 2 AS n_srv UNION ALL SELECT 'g1', 3),
         |w AS (SELECT g.region_id, g.n_cells, g.grp, s.n_srv,
         |        row_number() OVER (PARTITION BY g.grp
         |                           ORDER BY g.n_cells DESC, g.region_id ASC) - 1 AS rk
         |      FROM g JOIN s ON g.grp = s.grp)
         |SELECT region_id, n_cells, grp,
         |  concat(grp, '-', CAST(CAST(CASE WHEN (rk // n_srv) % 2 = 0
         |                                  THEN rk % n_srv
         |                                  ELSE n_srv - 1 - (rk % n_srv)
         |                             END AS INT) AS VARCHAR)) AS server
         |FROM w ORDER BY region_id NULLS LAST""".stripMargin,
    // a32: server drain — a parity-grouped rsgroup plan (both groups
    // populated at every SF) with g1-1 decommissioned; its regions
    // re-deal serpentine across the group's survivors ordered
    // least-loaded-first (load = staying n_cells), minimality by
    // construction (only drained rows selected)
    "a32_server_drain" ->
      s"""WITH r AS (SELECT $regionBucketCase AS region_id, count(*) AS n_cells
         |           FROM events GROUP BY 1),
         |g AS (SELECT region_id, n_cells,
         |             CASE WHEN region_id % 2 = 0 THEN 'g0' ELSE 'g1' END AS grp
         |      FROM r),
         |s AS (SELECT 'g0' AS grp, 2 AS n_srv UNION ALL SELECT 'g1', 3),
         |w AS (SELECT g.region_id, g.n_cells, g.grp, s.n_srv,
         |        row_number() OVER (PARTITION BY g.grp
         |                           ORDER BY g.n_cells DESC, g.region_id ASC) - 1 AS rk
         |      FROM g JOIN s ON g.grp = s.grp),
         |plan AS (SELECT region_id, n_cells, grp,
         |           concat(grp, '-', CAST(CAST(CASE WHEN (rk // n_srv) % 2 = 0
         |                                           THEN rk % n_srv
         |                                           ELSE n_srv - 1 - (rk % n_srv)
         |                                      END AS INT) AS VARCHAR)) AS server
         |         FROM w),
         |drained AS (SELECT * FROM plan WHERE server = 'g1-1'),
         |surv AS (SELECT p.grp, p.server, sum(p.n_cells) AS load
         |         FROM plan p
         |         WHERE p.server <> 'g1-1'
         |           AND p.grp IN (SELECT DISTINCT grp FROM drained)
         |         GROUP BY 1, 2),
         |di AS (SELECT grp, server,
         |         row_number() OVER (PARTITION BY grp
         |                            ORDER BY load ASC, server ASC) - 1 AS dest_idx
         |       FROM surv),
         |nd AS (SELECT grp, count(*) AS n_dest FROM surv GROUP BY 1),
         |mv AS (SELECT d.region_id, d.n_cells, d.grp, d.server AS from_server,
         |         CAST(CASE WHEN (rk2 // n_dest) % 2 = 0 THEN rk2 % n_dest
         |                   ELSE n_dest - 1 - (rk2 % n_dest) END AS INT) AS dest_idx
         |       FROM (SELECT d.*, nd.n_dest,
         |               row_number() OVER (PARTITION BY d.grp
         |                                  ORDER BY d.n_cells DESC, d.region_id ASC) - 1 AS rk2
         |             FROM drained d JOIN nd ON d.grp = nd.grp) d)
         |SELECT m.region_id, m.n_cells, m.from_server, di.server AS to_server
         |FROM mv m JOIN di ON m.grp = di.grp AND m.dest_idx = di.dest_idx
         |ORDER BY m.region_id NULLS LAST""".stripMargin,
    // a35: WAL-split crash recovery — the WAL-free spelling: recompute
    // the a32 drain assignment (which survivor hosts each dead region),
    // join the dead server's cells (the drained regions' cells) to it,
    // and digest per (survivor, qualifier) — any record the split lost,
    // duplicated, or misrouted moves the hash
    "a35_wal_split_recovery" ->
      s"""WITH r AS (SELECT $regionBucketCase AS region_id, count(*) AS n_cells
         |           FROM events GROUP BY 1),
         |g AS (SELECT region_id, n_cells,
         |             CASE WHEN region_id % 2 = 0 THEN 'g0' ELSE 'g1' END AS grp
         |      FROM r),
         |s AS (SELECT 'g0' AS grp, 2 AS n_srv UNION ALL SELECT 'g1', 3),
         |w AS (SELECT g.region_id, g.n_cells, g.grp, s.n_srv,
         |        row_number() OVER (PARTITION BY g.grp
         |                           ORDER BY g.n_cells DESC, g.region_id ASC) - 1 AS rk
         |      FROM g JOIN s ON g.grp = s.grp),
         |plan AS (SELECT region_id, n_cells, grp,
         |           concat(grp, '-', CAST(CAST(CASE WHEN (rk // n_srv) % 2 = 0
         |                                           THEN rk % n_srv
         |                                           ELSE n_srv - 1 - (rk % n_srv)
         |                                      END AS INT) AS VARCHAR)) AS server
         |         FROM w),
         |drained AS (SELECT * FROM plan WHERE server = 'g1-1'),
         |surv AS (SELECT p.grp, p.server, sum(p.n_cells) AS load
         |         FROM plan p
         |         WHERE p.server <> 'g1-1'
         |           AND p.grp IN (SELECT DISTINCT grp FROM drained)
         |         GROUP BY 1, 2),
         |di AS (SELECT grp, server,
         |         row_number() OVER (PARTITION BY grp
         |                            ORDER BY load ASC, server ASC) - 1 AS dest_idx
         |       FROM surv),
         |nd AS (SELECT grp, count(*) AS n_dest FROM surv GROUP BY 1),
         |mv AS (SELECT d.region_id, d.grp,
         |         CAST(CASE WHEN (rk2 // n_dest) % 2 = 0 THEN rk2 % n_dest
         |                   ELSE n_dest - 1 - (rk2 % n_dest) END AS INT) AS dest_idx
         |       FROM (SELECT d.*, nd.n_dest,
         |               row_number() OVER (PARTITION BY d.grp
         |                                  ORDER BY d.n_cells DESC, d.region_id ASC) - 1 AS rk2
         |             FROM drained d JOIN nd ON d.grp = nd.grp) d),
         |moved AS (SELECT m.region_id, di.server AS srv
         |          FROM mv m JOIN di ON m.grp = di.grp AND m.dest_idx = di.dest_idx),
         |c AS (SELECT $regionBucketCase AS region_id,
         |             event_type AS qualifier,
         |             CAST(epoch_us(ts) AS BIGINT) AS ts, value,
         |             CASE WHEN event_id % 97 = 0 THEN 'delete'
         |                  ELSE 'put' END AS op
         |      FROM events)
         |SELECT mo.srv, c.qualifier, count(*) AS n,
         |       CAST(sum(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS vsum,
         |       CAST(sum(CAST(c.ts % 999979 AS DECIMAL(18,0))) AS BIGINT) AS ssum,
         |       count(*) FILTER (WHERE c.op = 'delete') AS dels
         |FROM c JOIN moved mo ON c.region_id = mo.region_id
         |GROUP BY 1, 2
         |ORDER BY 1 NULLS LAST, 2 NULLS LAST""".stripMargin,
    // a34: request-weighted placement — two-factor serpentine, exact
    // integer cost 1*cells + 3*reqs (the read-request proxy = click/view
    // rows), the deterministic StochasticLoadBalancer analogue
    "a34_weighted_placement" ->
      s"""WITH r AS (SELECT $regionBucketCase AS region_id, count(*) AS n_cells,
         |                  CAST(sum(CASE WHEN event_type IN ('click', 'view')
         |                                THEN 1 ELSE 0 END) AS BIGINT) AS n_req
         |           FROM events GROUP BY 1),
         |w AS (SELECT region_id, n_cells, n_req,
         |        CAST(1 * n_cells + 3 * n_req AS BIGINT) AS cost,
         |        row_number() OVER (ORDER BY 1 * n_cells + 3 * n_req DESC,
         |                           region_id ASC) - 1 AS rk
         |      FROM r)
         |SELECT region_id, n_cells, n_req, cost,
         |  CAST(CASE WHEN (rk // 5) % 2 = 0 THEN rk % 5
         |            ELSE 4 - (rk % 5) END AS INT) AS server
         |FROM w ORDER BY region_id NULLS LAST""".stripMargin,
    // a36: locality-weighted placement — a34's two-factor serpentine
    // with an exact-integer locality credit (local_blocks = the planted
    // event_id % 3 = 0 count per region), cost = cells + 3*reqs - 2*local
    "a36_locality_placement" ->
      s"""WITH r AS (SELECT $regionBucketCase AS region_id, count(*) AS n_cells,
         |                  CAST(sum(CASE WHEN event_type IN ('click', 'view')
         |                                THEN 1 ELSE 0 END) AS BIGINT) AS n_req,
         |                  CAST(sum(CASE WHEN event_id % 3 = 0
         |                                THEN 1 ELSE 0 END) AS BIGINT) AS local_blocks
         |           FROM events GROUP BY 1),
         |w AS (SELECT region_id, n_cells, n_req, local_blocks,
         |        CAST(1 * n_cells + 3 * n_req - 2 * local_blocks AS BIGINT) AS cost,
         |        row_number() OVER (
         |          ORDER BY 1 * n_cells + 3 * n_req - 2 * local_blocks DESC,
         |                   region_id ASC) - 1 AS rk
         |      FROM r)
         |SELECT region_id, n_cells, n_req, local_blocks, cost,
         |  CAST(CASE WHEN (rk // 5) % 2 = 0 THEN rk % 5
         |            ELSE 4 - (rk % 5) END AS INT) AS server
         |FROM w ORDER BY region_id NULLS LAST""".stripMargin,
    // a31: hbck region-chain check — end vs next start in byte order;
    // planted damage (mod-4 extend/truncate) makes all three verdicts
    // non-vacuous at every SF
    "a31_hbck_regions" ->
      s"""WITH c AS (SELECT concat(lpad(CAST(user_id AS VARCHAR), 12, '0'), ':',
         |                  lpad(CAST(event_id AS VARCHAR), 12, '0')) AS rowkey,
         |                  user_id FROM events),
         |r AS (SELECT $regionBucketCase AS region_id, min(rowkey) AS start_key
         |      FROM c GROUP BY 1),
         |rng AS (SELECT region_id, start_key,
         |          COALESCE(lead(start_key) OVER (ORDER BY start_key), '~') AS end0
         |        FROM r),
         |drift AS (SELECT region_id, start_key,
         |            CASE WHEN region_id % 4 = 1 THEN concat(end0, '~')
         |                 WHEN region_id % 4 = 2 THEN substr(end0, 1, 20)
         |                 ELSE end0 END AS end_key
         |          FROM rng),
         |chk AS (SELECT region_id, start_key, end_key,
         |          lead(start_key) OVER (ORDER BY start_key, region_id) AS next_start,
         |          lag(start_key)  OVER (ORDER BY start_key, region_id) AS prev_start
         |        FROM drift)
         |SELECT region_id, start_key, end_key,
         |  CASE WHEN next_start = start_key OR prev_start = start_key
         |         THEN 'duplicate_start'
         |       WHEN next_start IS NULL THEN 'ok'
         |       WHEN end_key = next_start THEN 'ok'
         |       WHEN end_key < next_start THEN 'hole'
         |       ELSE 'overlap' END AS issue
         |FROM chk ORDER BY region_id NULLS LAST""".stripMargin,
    // a30: minor-compaction file selection — ratio test cross-multiplied
    // (5*size <= 6*newer_sum), suffix sums over per-region file metadata,
    // min-3 drop and newest-10 cap; all-integer
    "a30_compaction_select" ->
      s"""WITH f AS (SELECT $regionBucketCase AS region_id,
         |                  event_id % 7 AS seq, count(*) AS size
         |           FROM events GROUP BY 1, 2),
         |w AS (SELECT region_id, seq, size,
         |        COALESCE(sum(size) OVER (PARTITION BY region_id ORDER BY seq ASC
         |                                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING),
         |                 0) AS newer_sum
         |      FROM f),
         |sel AS (SELECT *, CASE WHEN 5 * size <= 6 * newer_sum THEN 1 ELSE 0 END AS s0
         |        FROM w),
         |cnt AS (SELECT region_id, sum(s0) AS n_sel FROM sel GROUP BY 1),
         |rk AS (SELECT sel.region_id, sel.seq, sel.size, sel.s0, cnt.n_sel,
         |         row_number() OVER (PARTITION BY sel.region_id, sel.s0
         |                            ORDER BY sel.seq DESC) AS rn_new
         |       FROM sel JOIN cnt ON sel.region_id = cnt.region_id)
         |SELECT region_id, seq, size,
         |  CASE WHEN s0 = 1 AND n_sel >= 3 AND rn_new <= 10
         |       THEN 'compact' ELSE 'keep' END AS action
         |FROM rk
         |ORDER BY region_id NULLS LAST, seq NULLS LAST""".stripMargin,
    // a39: the pressure ladder over a30's selection — per-region file
    // counts 3 + (region*3) % 7, exact-integer ramp
    // lower + ((upper-lower)*clamp(n-3,0,5)) // 5 (DuckDB `//` ≡ Spark
    // DIV on non-negative longs), blocking at n >= 8 → unlimited, and
    // the 250 MiB/s request clamped (idempotently — the Spark side
    // applies the ladder twice; clamp∘clamp = clamp makes the spellings
    // equal)
    "a39_compaction_throttle" ->
      s"""WITH e0 AS (SELECT $regionBucketCase AS region_id, event_id FROM events),
         |f AS (SELECT region_id,
         |             event_id % (3 + (region_id * 3) % 7) AS seq,
         |             count(*) AS size
         |      FROM e0 GROUP BY 1, 2),
         |w AS (SELECT region_id, seq, size,
         |        COALESCE(sum(size) OVER (PARTITION BY region_id ORDER BY seq ASC
         |                                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING),
         |                 0) AS newer_sum
         |      FROM f),
         |sel AS (SELECT *, CASE WHEN 5 * size <= 6 * newer_sum THEN 1 ELSE 0 END AS s0
         |        FROM w),
         |cnt AS (SELECT region_id, sum(s0) AS n_sel FROM sel GROUP BY 1),
         |rk AS (SELECT sel.region_id, sel.seq, sel.size, sel.s0, cnt.n_sel,
         |         row_number() OVER (PARTITION BY sel.region_id, sel.s0
         |                            ORDER BY sel.seq DESC) AS rn_new
         |       FROM sel JOIN cnt ON sel.region_id = cnt.region_id),
         |act AS (SELECT region_id, size,
         |          CASE WHEN s0 = 1 AND n_sel >= 3 AND rn_new <= 10
         |               THEN 'compact' ELSE 'keep' END AS action
         |        FROM rk),
         |lad AS (SELECT region_id, count(*) AS n_files,
         |          CAST(sum(CASE WHEN action = 'compact' THEN size ELSE 0 END)
         |               AS BIGINT) AS sel_bytes
         |        FROM act GROUP BY 1)
         |SELECT region_id, n_files, sel_bytes,
         |  CASE WHEN n_files >= 8 THEN 'unlimited' ELSE 'throttled' END AS mode,
         |  CAST(52428800 + (52428800 * least(greatest(n_files - 3, 0), 5)) // 5
         |       AS BIGINT) AS allowed_bps,
         |  CAST(CASE WHEN n_files >= 8 THEN 262144000
         |       ELSE least(262144000,
         |                  52428800 + (52428800 * least(greatest(n_files - 3, 0), 5)) // 5)
         |       END AS BIGINT) AS rate_bps
         |FROM lad
         |ORDER BY region_id NULLS LAST""".stripMargin,
    // a27: canary probe — one deterministic probe row per region (the
    // region's min rowkey), read through the b7 latest-version rule
    // (puts only, newest per coordinate), per-region found/cell counts
    // plus a region_id=-1 rollup row; all-integer apart from the rowkey
    "a27_canary_probe" ->
      s"""WITH c AS (SELECT concat(lpad(CAST(user_id AS VARCHAR), 12, '0'), ':',
         |                  lpad(CAST(event_id AS VARCHAR), 12, '0')) AS rowkey,
         |                  user_id, 'e' AS cf, event_type AS qualifier,
         |                  CAST(epoch_us(ts) AS BIGINT) AS ts, value,
         |                  CASE WHEN event_id % 97 = 0 THEN 'delete'
         |                       ELSE 'put' END AS op
         |           FROM events),
         |p AS (SELECT $regionBucketCase AS region_id, min(rowkey) AS probe_row
         |      FROM c GROUP BY 1),
         |lv AS (SELECT rowkey FROM (
         |         SELECT c.rowkey,
         |                row_number() OVER (PARTITION BY c.rowkey, c.cf, c.qualifier
         |                                   ORDER BY c.ts DESC, c.value ASC) AS rn
         |         FROM c JOIN p ON c.rowkey = p.probe_row
         |         WHERE c.op = 'put')
         |       WHERE rn = 1),
         |lc AS (SELECT rowkey AS probe_row, count(*) AS live_cells
         |       FROM lv GROUP BY 1),
         |per AS (SELECT p.region_id, p.probe_row,
         |               CASE WHEN lc.live_cells IS NOT NULL THEN 1 ELSE 0 END AS found,
         |               COALESCE(lc.live_cells, 0) AS n_cells
         |        FROM p LEFT JOIN lc USING (probe_row))
         |SELECT region_id, probe_row, found, n_cells FROM per
         |UNION ALL
         |SELECT -1 AS region_id, NULL AS probe_row,
         |       CAST(sum(found) AS INTEGER) AS found,
         |       CAST(sum(n_cells) AS BIGINT) AS n_cells FROM per
         |ORDER BY region_id NULLS LAST""".stripMargin,
    // b35: hot-bucket detector — skew vs the MEDIAN bucket; quantile_cont
    // ≡ Spark percentile (the proven d9 pairing), one final IEEE division
    // round(,6)-capped (R4); full (n_req, bucket) tiebreak makes the
    // top-10 cut deterministic
    "b35_hot_buckets" ->
      """WITH c AS (SELECT lpad(CAST(user_id AS VARCHAR), 12, '0') AS bucket
        |           FROM events),
        |b AS (SELECT bucket, count(*) AS n_req FROM c GROUP BY 1),
        |m AS (SELECT quantile_cont(n_req, 0.5) AS med FROM b)
        |SELECT bucket, n_req, round(n_req / med, 6) AS skew FROM b, m
        |ORDER BY n_req DESC, bucket ASC LIMIT 10""".stripMargin,
    // b36: salted-scan report — salt = portable md5-60 of the rowkey
    // mod 8 (the j33 hash convention), per-bucket exact stats over the
    // b9 logical range; proves the salt assignment is engine-portable
    // and the range's rows partition exactly across buckets
    "b36_salted_scan" ->
      (cellsCte +
        """SELECT CAST(('0x' || substr(md5(rowkey), 1, 15))::BIGINT % 8 AS INT) AS salt,
          |       count(*) AS n,
          |       count(DISTINCT substr(rowkey, 1, 12)) AS n_users,
          |       min(rowkey) AS min_rk, max(rowkey) AS max_rk
          |FROM cells
          |WHERE rowkey BETWEEN '000000000010:000000000000'
          |                 AND '000000000020:000000999999999999'
          |GROUP BY 1 ORDER BY salt NULLS LAST""".stripMargin),
    // a19: the daughter union must reconstruct the table exactly —
    // the oracle digests the cells view straight (all ops: a reference
    // read serves raw cells; resolution is the reader's job)
    "a19_region_split" ->
      (cellsCte +
        """SELECT qualifier, count(*) AS n,
          |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum,
          |       CAST(sum(CAST(ts % 999979 AS DECIMAL(18,0))) AS BIGINT) AS tsum
          |FROM cells GROUP BY qualifier ORDER BY qualifier NULLS LAST""".stripMargin),
    // a20: neither serving a merged region over its parents' files nor
    // the post-merge compaction rewrite may change a single cell — both
    // views digest as the cells view straight (raw cells, all ops;
    // resolution is the reader's job, as in a19)
    "a20_region_merge" ->
      (cellsCte.stripSuffix("\n") +
        """, uv AS (SELECT 'compacted' AS vw, qualifier, value, ts FROM cells
          |         UNION ALL
          |         SELECT 'merged' AS vw, qualifier, value, ts FROM cells)
          |SELECT vw, qualifier, count(*) AS n,
          |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum,
          |       CAST(sum(CAST(ts % 999961 AS DECIMAL(18,0))) AS BIGINT) AS tsum
          |FROM uv GROUP BY vw, qualifier
          |ORDER BY vw NULLS LAST, qualifier NULLS LAST""".stripMargin),
    // a18: clone view = gen0 puts verbatim (a snapshot pins the pre-delta
    // file set); live view = the a13 merge spelling over gen0 + the
    // post-snapshot delta
    // a22: storage-free spelling of the namespace split + clone digest;
    // meta_n counts ALL cells (the trailer entryCount includes
    // tombstones), the digest rows are the clone's resolved puts
    "a22_namespace_admin" ->
      (cellsCte.stripSuffix("\n") +
        """, t AS (SELECT CASE WHEN qualifier IN ('click','view') THEN 't_click'
          |                    ELSE 't_txn' END AS tbl, * FROM cells),
          |meta AS (SELECT tbl, count(*) AS meta_n FROM t GROUP BY 1)
          |SELECT c.tbl, c.qualifier, count(*) AS n,
          |       CAST(sum(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS vsum,
          |       CAST(sum(CAST(c.ts % 999959 AS DECIMAL(18,0))) AS BIGINT) AS tsum,
          |       m.meta_n
          |FROM t c JOIN meta m ON c.tbl = m.tbl
          |WHERE c.op = 'put'
          |GROUP BY 1, 2, m.meta_n
          |ORDER BY 1 NULLS LAST, 2 NULLS LAST""".stripMargin),
    // a28: namespace quota report — usage = exact per-table cell counts
    // (the Spark side reads them from hfile trailer metadata; the twin
    // recounts the source rows), limits/thresholds all integer (the WARN
    // arm is cross-multiplied, never an IEEE ratio)
    "a28_quota_report" ->
      (cellsCte.stripSuffix("\n") +
        """, t AS (SELECT CASE WHEN qualifier IN ('click','view') THEN 't_click'
          |                    ELSE 't_txn' END AS tbl FROM cells),
          |m AS (SELECT tbl, count(*) AS used FROM t GROUP BY 1),
          |tot AS (SELECT CAST(sum(used) AS BIGINT) AS tot FROM m),
          |rows0 AS (
          |  SELECT concat('table:', tbl) AS scope, used,
          |         CAST(tot // 2 AS BIGINT) AS lim
          |  FROM m, tot
          |  UNION ALL
          |  SELECT 'ns:graft_ns' AS scope, tot AS used,
          |         CAST((tot // 10) * 11 AS BIGINT) AS lim FROM tot)
          |SELECT scope, used, lim,
          |       CAST(CASE WHEN lim > 0 THEN (used * 10000) // lim END
          |            AS BIGINT) AS pct_bp,
          |       CASE WHEN used > lim THEN 'VIOLATION'
          |            WHEN lim > 0 AND used * 10 >= lim * 8 THEN 'WARN'
          |            ELSE 'OK' END AS status
          |FROM rows0 ORDER BY scope NULLS LAST""".stripMargin),
    // a37: quota throttle plan — the enforcement ladder over the a28
    // report recomputed with the tighter quarter limit: VIOLATION at
    // >= 2x limit -> DISABLE/0, VIOLATION -> NO_WRITES/limit, WARN ->
    // headroom throttle; OK scopes emit nothing. All-integer; the
    // Spark side's double-apply idempotence collapses to the same rows
    "a37_quota_throttle" ->
      (cellsCte.stripSuffix("\n") +
        """, t AS (SELECT CASE WHEN qualifier IN ('click','view') THEN 't_click'
          |                    ELSE 't_txn' END AS tbl FROM cells),
          |m AS (SELECT tbl, count(*) AS used FROM t GROUP BY 1),
          |tot AS (SELECT CAST(sum(used) AS BIGINT) AS tot FROM m),
          |rows0 AS (
          |  SELECT concat('table:', tbl) AS scope, used,
          |         CAST(tot // 4 AS BIGINT) AS lim
          |  FROM m, tot
          |  UNION ALL
          |  SELECT 'ns:graft_ns' AS scope, tot AS used,
          |         CAST((tot // 10) * 11 AS BIGINT) AS lim FROM tot),
          |st AS (SELECT scope, used, lim,
          |         CASE WHEN used > lim THEN 'VIOLATION'
          |              WHEN lim > 0 AND used * 10 >= lim * 8 THEN 'WARN'
          |              ELSE 'OK' END AS status
          |       FROM rows0)
          |SELECT scope, used, lim,
          |       CASE WHEN status = 'VIOLATION' AND used >= 2 * lim
          |              THEN 'DISABLE'
          |            WHEN status = 'VIOLATION' THEN 'NO_WRITES'
          |            ELSE 'THROTTLE_REQUEST_NUMBER' END AS policy,
          |       CAST(CASE WHEN status = 'VIOLATION' AND used >= 2 * lim
          |                   THEN 0
          |                 WHEN status = 'VIOLATION' THEN lim
          |                 ELSE lim - used END AS BIGINT) AS clamp
          |FROM st WHERE status <> 'OK'
          |ORDER BY scope NULLS LAST""".stripMargin),
    // a33: restore/clone diff — the gate's 8-region grid with planted
    // drift (a31's pattern: the oracle recomputes the deterministic
    // plant; the DERIVATION — manifest parse, dir listing, archive
    // moves — is what the Spark side must get right, and HFileSpec's
    // restore-apply bit-for-bit test plus the clean-layout all-keep
    // check pin it). regions 2/7 flushed → replace(1 snap, 2 live);
    // 1/6 archived → add(1,0); live-only region 8 → delete(0,1);
    // 0/3/4/5 untouched → keep(1,1)
    "a33_snapshot_restore" ->
      """SELECT * FROM (VALUES
        |  (0, 1, 1, 'keep'), (1, 1, 0, 'add'), (2, 1, 2, 'replace'),
        |  (3, 1, 1, 'keep'), (4, 1, 1, 'keep'), (5, 1, 1, 'keep'),
        |  (6, 1, 0, 'add'), (7, 1, 2, 'replace'), (8, 0, 1, 'delete'))
        |AS t(region_id, n_snap, n_live, action)
        |ORDER BY region_id NULLS LAST""".stripMargin,
    "a18_hfile_snapshot" ->
      (cellsCte.stripSuffix("\n") +
        """, clone AS (SELECT qualifier, value, ts FROM cells WHERE op = 'put'),
          |upd AS (SELECT rowkey, cf, qualifier, ts + 1000000 AS ts,
          |               value + 2 AS value, 'put' AS op, 1 AS gen
          |        FROM cells WHERE CAST(substring(rowkey, 14, 12) AS BIGINT) % 4 = 0),
          |del AS (SELECT rowkey, cf, qualifier, ts + 2000000 AS ts, value,
          |               'delete' AS op, 1 AS gen
          |        FROM cells WHERE CAST(substring(rowkey, 14, 12) AS BIGINT) % 6 = 0),
          |merged AS (SELECT *, row_number() OVER (PARTITION BY rowkey, cf, qualifier
          |                                        ORDER BY ts DESC, gen DESC, value ASC) AS rn
          |           FROM (SELECT rowkey, cf, qualifier, ts, value, op, 0 AS gen FROM cells
          |                 UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM del)),
          |live AS (SELECT qualifier, value, ts FROM merged WHERE rn = 1 AND op = 'put'),
          |uv AS (SELECT 'clone' AS vw, * FROM clone UNION ALL SELECT 'live', * FROM live)
          |SELECT vw, qualifier, count(*) AS n,
          |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum,
          |       CAST(sum(CAST(ts % 999983 AS DECIMAL(18,0))) AS BIGINT) AS tsum
          |FROM uv GROUP BY vw, qualifier
          |ORDER BY vw NULLS LAST, qualifier NULLS LAST""".stripMargin),
    // a17: the oracle recomputes the per-storage-class digests straight
    // from documents — the Spark side must reconstruct the identical
    // corpus through two binary HFile roundtrips + the reference join
    "a17_mob_storage" ->
      """WITH d AS (SELECT text, len(text) > 300 AS is_mob
        |           FROM documents WHERE text IS NOT NULL)
        |SELECT is_mob, count(*) AS n,
        |       CAST(sum(len(text)) AS BIGINT) AS csum,
        |       CAST(sum(CAST(('0x' || substr(md5(text),1,15))::BIGINT AS HUGEINT))
        |            % 1000000007 AS BIGINT) AS hmod
        |FROM d GROUP BY is_mob ORDER BY is_mob NULLS LAST""".stripMargin,
    "a1_scan_parquet" ->
      s"SELECT count(*) AS n, ${dsum("l_quantity")} AS qsum FROM lineitem",
    "a2_csv_roundtrip" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |       CAST(sum(CAST(o_orderkey AS DECIMAL(18,0))) AS BIGINT) AS keysum
        |FROM orders GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST""".stripMargin,
    "a4_cells_scan" ->
      (cellsCte +
        """SELECT cf, qualifier, count(*) AS n FROM cells GROUP BY cf, qualifier
          |ORDER BY cf NULLS LAST, qualifier NULLS LAST""".stripMargin),
    "a5_bulkload_splits" ->
      (cellsCte +
        """SELECT bucket, max(rowkey) AS split_point FROM
          |  (SELECT rowkey, ntile(16) OVER (ORDER BY rowkey NULLS LAST) AS bucket FROM cells)
          |GROUP BY bucket ORDER BY bucket NULLS LAST""".stripMargin),
    "a6_cells_asof" ->
      (cellsCte +
        """SELECT rowkey, qualifier, value FROM
          |  (SELECT rowkey, qualifier, value,
          |          row_number() OVER (PARTITION BY rowkey, cf, qualifier
          |                             ORDER BY ts DESC, value) AS rn
          |   FROM cells WHERE ts <= 1705362487499628)
          |WHERE rn = 1 ORDER BY rowkey NULLS LAST, qualifier NULLS LAST LIMIT 500""".stripMargin),
    "a9_hfile_roundtrip" ->
      (cellsCte +
        """SELECT cf, qualifier, count(*) AS n,
          |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum,
          |  CAST(sum(CAST(ts % 1000003 AS DECIMAL(18,0))) AS BIGINT) AS tsum,
          |  count(*) FILTER (WHERE op = 'delete') AS dels
          |FROM cells GROUP BY cf, qualifier
          |ORDER BY cf NULLS LAST, qualifier NULLS LAST""".stripMargin),
    // a15: the WAL-free spelling of the durability cycle — recovery
    // (flushed HFile generation ∪ replayed log suffix) must equal the
    // plain cells view no matter where the flush point fell, so the
    // oracle is a9's roundtrip aggregate verbatim
    "a15_wal_replay" ->
      (cellsCte +
        """SELECT cf, qualifier, count(*) AS n,
          |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum,
          |  CAST(sum(CAST(ts % 1000003 AS DECIMAL(18,0))) AS BIGINT) AS tsum,
          |  count(*) FILTER (WHERE op = 'delete') AS dels
          |FROM cells GROUP BY cf, qualifier
          |ORDER BY cf NULLS LAST, qualifier NULLS LAST""".stripMargin),
    // a21: the replication-free spelling — a double-shipped replica log
    // must read as the plain cells view (seq = ts), so the transport and
    // its idempotence both sit inside one hash
    "a21_wal_replicate" ->
      (cellsCte +
        """SELECT cf, qualifier, count(*) AS n,
          |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum,
          |  CAST(sum(CAST(ts % 999953 AS DECIMAL(18,0))) AS BIGINT) AS ssum,
          |  count(*) FILTER (WHERE op = 'delete') AS dels
          |FROM cells GROUP BY cf, qualifier
          |ORDER BY cf NULLS LAST, qualifier NULLS LAST""".stripMargin),
    // a38: the backup-free spelling — snapshot(T0) restored twice + the
    // (T0, T1] WAL delta replayed must read as the plain ts <= T1 view,
    // so the manifest pin, the ExportSnapshot-style copy job, the site
    // sweep, and the delta bounds all sit inside one hash (T0/T1 are the
    // frozen a6-family constants: mid and ~p80 of the measured ts range)
    "a38_incremental_backup" ->
      (cellsCte +
        """SELECT cf, qualifier, count(*) AS n,
          |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum,
          |  CAST(sum(CAST(ts % 999917 AS DECIMAL(18,0))) AS BIGINT) AS tsum,
          |  count(*) FILTER (WHERE op = 'delete') AS dels
          |FROM cells WHERE ts <= 1706141821535472
          |GROUP BY cf, qualifier
          |ORDER BY cf NULLS LAST, qualifier NULLS LAST""".stripMargin),
    // a16: the family-pruned read of the re-familied cells view —
    // family selection must behave exactly like the cf filter the
    // oracle spells, even though the Spark side prunes whole store
    // directories and never opens the meta family's bytes
    "a16_multi_cf_prune" ->
      (cellsCte +
        """SELECT 'hot' AS cf, qualifier, count(*) AS n,
          |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum,
          |  CAST(sum(CAST(ts % 1000003 AS DECIMAL(18,0))) AS BIGINT) AS tsum,
          |  count(*) FILTER (WHERE op = 'delete') AS dels
          |FROM cells WHERE qualifier IN ('click', 'view')
          |GROUP BY qualifier
          |ORDER BY cf NULLS LAST, qualifier NULLS LAST""".stripMargin),
    // a12: same oracle as a9 — the round-trip aggregate is
    // codec-independent; only the Spark side's write options differ
    // (ZSTD + PREFIX vs a9's GZ + FAST_DIFF)
    "a12_hfile_zstd" ->
      (cellsCte +
        """SELECT cf, qualifier, count(*) AS n,
          |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum,
          |  CAST(sum(CAST(ts % 1000003 AS DECIMAL(18,0))) AS BIGINT) AS tsum,
          |  count(*) FILTER (WHERE op = 'delete') AS dels
          |FROM cells GROUP BY cf, qualifier
          |ORDER BY cf NULLS LAST, qualifier NULLS LAST""".stripMargin),
    // a13: relational twin of the LSM merge-on-read — same three cell
    // generations built from the cells view, same (ts desc, gen desc,
    // value asc) version resolution, winning tombstones excluded
    "a13_hfile_merge_read" ->
      (cellsCte.stripSuffix("\n") +
        """, upd AS (SELECT rowkey, cf, qualifier, ts + 1000000 AS ts,
          |                 value + 1 AS value, 'put' AS op, 1 AS gen
          |          FROM cells WHERE CAST(substring(rowkey, 14, 12) AS BIGINT) % 5 = 0),
          |del AS (SELECT rowkey, cf, qualifier, ts + 2000000 AS ts,
          |               value, 'delete' AS op, 1 AS gen
          |        FROM cells WHERE CAST(substring(rowkey, 14, 12) AS BIGINT) % 7 = 0),
          |merged AS (
          |  SELECT *, row_number() OVER (PARTITION BY rowkey, cf, qualifier
          |                               ORDER BY ts DESC, gen DESC, value ASC) AS rn
          |  FROM (SELECT rowkey, cf, qualifier, ts, value, op, 0 AS gen FROM cells
          |        UNION ALL SELECT * FROM upd
          |        UNION ALL SELECT * FROM del))
          |SELECT cf, qualifier, count(*) AS n,
          |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum,
          |  CAST(sum(CAST(ts % 1000003 AS DECIMAL(18,0))) AS BIGINT) AS tsum
          |FROM merged WHERE rn = 1 AND op = 'put'
          |GROUP BY cf, qualifier
          |ORDER BY cf NULLS LAST, qualifier NULLS LAST""".stripMargin),
    // a14: the full delete-scope lattice recomputed relationally — family
    // (at-or-before, whole cf), column (at-or-before, one coordinate),
    // version (exact ts); then newest-2 per coordinate by (ts, gen, value)
    "a14_hfile_delete_types" ->
      """WITH u AS (
        |  SELECT lpad(CAST(user_id AS VARCHAR), 12, '0') AS rowkey, 'e' AS cf,
        |         event_type AS qualifier, CAST(epoch_us(ts) AS BIGINT) AS ts,
        |         value, event_id, user_id
        |  FROM events),
        |allc AS (
        |  SELECT rowkey, cf, qualifier, ts, value, 'put' AS op, 0 AS gen FROM u
        |  UNION ALL
        |  SELECT rowkey, cf, qualifier, ts, value, 'delete_version', 1 FROM u
        |  WHERE event_id % 11 = 0
        |  UNION ALL
        |  SELECT rowkey, cf, qualifier, ts + 2000000, value, 'delete', 1 FROM u
        |  WHERE event_id % 7 = 0
        |  UNION ALL
        |  SELECT rowkey, cf, '' AS qualifier, min(ts) + 1500000 AS ts,
        |         0.0 AS value, 'delete_family', 1
        |  FROM u WHERE user_id % 5 = 0 GROUP BY rowkey, cf),
        |famdel AS (SELECT rowkey, cf, max(ts) AS fts FROM allc
        |           WHERE op = 'delete_family' GROUP BY rowkey, cf),
        |coldel AS (SELECT rowkey, cf, qualifier, max(ts) AS cts FROM allc
        |           WHERE op = 'delete' GROUP BY rowkey, cf, qualifier),
        |vis AS (
        |  SELECT a.* FROM allc a
        |  LEFT JOIN famdel f USING (rowkey, cf)
        |  LEFT JOIN coldel c USING (rowkey, cf, qualifier)
        |  WHERE a.op = 'put'
        |    AND (f.fts IS NULL OR a.ts > f.fts)
        |    AND (c.cts IS NULL OR a.ts > c.cts)
        |    AND NOT EXISTS (SELECT 1 FROM allc d
        |                    WHERE d.op = 'delete_version' AND d.rowkey = a.rowkey
        |                      AND d.cf = a.cf AND d.qualifier = a.qualifier
        |                      AND d.ts = a.ts)),
        |rn AS (
        |  SELECT *, row_number() OVER (PARTITION BY rowkey, cf, qualifier
        |             ORDER BY ts DESC, gen DESC, value ASC) AS rn
        |  FROM vis)
        |SELECT qualifier, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum,
        |  CAST(sum(CAST(ts % 1000003 AS DECIMAL(18,0))) AS BIGINT) AS tsum
        |FROM rn WHERE rn <= 2
        |GROUP BY qualifier ORDER BY qualifier NULLS LAST""".stripMargin,
    // b34: the RAW-scan twin — the same delete-lattice store as a14, but
    // with NO resolution applied (Scan.setRaw(true)): every put AND every
    // delete marker of all three scopes, digested per (qualifier, op,
    // generation). Storage-free spelling: the union that built the store.
    "b34_raw_scan" ->
      """WITH u AS (
        |  SELECT lpad(CAST(user_id AS VARCHAR), 12, '0') AS rowkey, 'e' AS cf,
        |         event_type AS qualifier, CAST(epoch_us(ts) AS BIGINT) AS ts,
        |         value, event_id, user_id
        |  FROM events),
        |allc AS (
        |  SELECT rowkey, cf, qualifier, ts, value, 'put' AS op, 0 AS gen FROM u
        |  UNION ALL
        |  SELECT rowkey, cf, qualifier, ts, value, 'delete_version', 1 FROM u
        |  WHERE event_id % 11 = 0
        |  UNION ALL
        |  SELECT rowkey, cf, qualifier, ts + 2000000, value, 'delete', 1 FROM u
        |  WHERE event_id % 7 = 0
        |  UNION ALL
        |  SELECT rowkey, cf, '' AS qualifier, min(ts) + 1500000 AS ts,
        |         0.0 AS value, 'delete_family', 1
        |  FROM u WHERE user_id % 5 = 0 GROUP BY rowkey, cf)
        |SELECT qualifier, op, CAST(gen AS INTEGER) AS gen, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum,
        |  CAST(sum(CAST(ts % 1000003 AS DECIMAL(18,0))) AS BIGINT) AS tsum
        |FROM allc
        |GROUP BY qualifier, op, gen
        |ORDER BY qualifier NULLS LAST, op NULLS LAST, gen NULLS LAST""".stripMargin,
    // a10: the DuckDB twin of the point get — same single rowkey, computed
    // the same way (the rowkey of event_id = 0, which exists at every SF)
    "a10_hfile_get" ->
      (cellsCte +
        """SELECT rowkey, cf, qualifier, ts AS ts_us, value, op
          |FROM cells
          |WHERE rowkey = (SELECT concat(lpad(CAST(user_id AS VARCHAR), 12, '0'),
          |                              ':', lpad('0', 12, '0'))
          |                FROM events WHERE event_id = 0)
          |ORDER BY qualifier NULLS LAST, ts_us NULLS LAST""".stripMargin),
    "a8_cells_pivot" ->
      (cellsCte +
        """SELECT rowkey,
          |  coalesce(CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE qualifier='click') AS DOUBLE), 0) AS click,
          |  coalesce(CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE qualifier='error') AS DOUBLE), 0) AS error,
          |  coalesce(CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE qualifier='purchase') AS DOUBLE), 0) AS purchase,
          |  coalesce(CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE qualifier='signup') AS DOUBLE), 0) AS signup,
          |  coalesce(CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE qualifier='view') AS DOUBLE), 0) AS view
          |FROM cells GROUP BY rowkey ORDER BY rowkey NULLS LAST LIMIT 300""".stripMargin))

  val filters: Map[String, String] = Map(
    // b32: storage-free spelling of the cell-TTL compaction view — the
    // Spark side carries each ttl through a real HFile TTL tag; expiry
    // (ts + ttl >= now, now a literal) applies BEFORE tombstone masking
    "b32_cell_ttl" ->
      (cellsCte.stripSuffix("\n") +
        """, ttl AS (SELECT rowkey, cf, qualifier, ts, value, op,
          |            ((ts % 5) + 1) * 86400000 AS ttl_ms FROM cells),
          |live AS (SELECT * FROM ttl WHERE ts + ttl_ms * 1000 >= 1705363800000000),
          |m AS (SELECT *, max(CASE WHEN op = 'delete' THEN ts END)
          |        OVER (PARTITION BY rowkey, cf, qualifier) del_ts FROM live)
          |SELECT qualifier, count(*) AS n, count(DISTINCT rowkey) AS nrows,
          |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum,
          |       CAST(sum(CAST(ts % 999983 AS DECIMAL(18,0))) AS BIGINT) AS tsum
          |FROM m WHERE op = 'put' AND (del_ts IS NULL OR ts > del_ts)
          |GROUP BY 1 ORDER BY 1 NULLS LAST""".stripMargin),
    // b33: storage-free spelling of the full cell-metadata lattice —
    // TTL expiry (b32's derivation) then the b31 authorization filter
    // (which also hides deletes: an invisible delete cannot mask) then
    // tombstone masking over the authorized view
    "b33_cell_tags_lattice" ->
      (cellsCte.stripSuffix("\n") +
        """, lab AS (SELECT *, ((ts % 5) + 1) * 86400000 AS ttl_ms,
          |            CASE WHEN qualifier = 'purchase' AND value > 200 THEN 'finance&exec'
          |                 WHEN qualifier = 'purchase' THEN 'finance&internal'
          |                 WHEN qualifier = 'signup' THEN 'pii&internal'
          |                 WHEN qualifier = 'error' THEN 'ops|admin'
          |                 ELSE '' END AS vis
          |          FROM cells),
          |live AS (SELECT * FROM lab WHERE ts + ttl_ms * 1000 >= 1705363800000000),
          |auth AS (SELECT * FROM live
          |         WHERE vis = '' OR len(list_filter(string_split(vis, '|'),
          |             clause -> len(list_filter(string_split(clause, '&'),
          |                 l -> NOT list_contains(['internal','finance','ops'], l))) = 0)) > 0),
          |m AS (SELECT *, max(CASE WHEN op = 'delete' THEN ts END)
          |        OVER (PARTITION BY rowkey, cf, qualifier) del_ts FROM auth)
          |SELECT qualifier, count(*) AS n,
          |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum,
          |       CAST(sum(CAST(ts % 999931 AS DECIMAL(18,0))) AS BIGINT) AS tsum
          |FROM m WHERE op = 'put' AND (del_ts IS NULL OR ts > del_ts)
          |GROUP BY 1 ORDER BY 1 NULLS LAST""".stripMargin),
    // b31: the oracle re-evaluates the OR-of-AND label expressions with
    // list HOFs — empty expression = unlabeled = world-readable
    "b31_visibility_labels" ->
      (cellsCte +
        """, lab AS (
          |  SELECT qualifier, value,
          |         CASE WHEN qualifier = 'purchase' AND value > 200 THEN 'finance&exec'
          |              WHEN qualifier = 'purchase' THEN 'finance&internal'
          |              WHEN qualifier = 'signup' THEN 'pii&internal'
          |              WHEN qualifier = 'error' THEN 'ops|admin'
          |              ELSE '' END AS vis
          |  FROM cells),
          |ev AS (
          |  SELECT qualifier, value,
          |         vis = '' OR len(list_filter(string_split(vis, '|'),
          |             clause -> len(list_filter(string_split(clause, '&'),
          |                 l -> NOT list_contains(['internal','finance','ops'], l))) = 0)) > 0 AS ok
          |  FROM lab)
          |SELECT qualifier, count(*) AS n_total,
          |       CAST(count(*) FILTER (WHERE ok) AS BIGINT) AS n_visible,
          |       CAST(coalesce(sum(CAST(CASE WHEN ok THEN value END AS DECIMAL(18,2))), 0) AS DOUBLE) AS vsum_visible
          |FROM ev GROUP BY qualifier ORDER BY qualifier NULLS LAST""".stripMargin),
    "b18_multi_range" ->
      (cellsCte +
        """SELECT count(*) AS n FROM cells
          |WHERE rowkey BETWEEN '000000000010:000000000000' AND '000000000019:999999999999'
          |   OR rowkey BETWEEN '000000000200:000000000000' AND '000000000219:999999999999'
          |   OR rowkey BETWEEN '000000000400:000000000000' AND '000000000449:999999999999'""".stripMargin),
    "b19_fuzzy_rowkey" ->
      (cellsCte +
        """SELECT qualifier, count(*) AS n FROM cells
          |WHERE rowkey LIKE '0000000000_7:%'
          |GROUP BY qualifier ORDER BY qualifier NULLS LAST""".stripMargin),
    "b22_filter_list" ->
      (cellsCte +
        """SELECT qualifier, count(*) AS n,
          |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum
          |FROM cells
          |WHERE (starts_with(rowkey, '00000000004')
          |       OR regexp_matches(qualifier, '^(click|view)$'))
          |  AND value > 50.0 AND NOT (op = 'delete')
          |GROUP BY qualifier ORDER BY qualifier NULLS LAST""".stripMargin),
    // b24: early-termination scan — rows of the inclusive range strictly
    // below the FIRST failing rowkey (value NULL or <= 1.0); the Spark
    // side resolves the same stop key from per-region terminators
    "b24_while_match" ->
      (cellsCte +
        """SELECT rowkey, qualifier, ts AS ts_us, value, op FROM cells
          |WHERE rowkey >= '000000000002:000000000000'
          |  AND rowkey <= '000000000008:999999999999'
          |  AND rowkey < coalesce((SELECT min(rowkey) FROM cells
          |       WHERE rowkey >= '000000000002:000000000000'
          |         AND rowkey <= '000000000008:999999999999'
          |         AND (value IS NULL OR value <= 1.0)), 'zzz')
          |ORDER BY rowkey NULLS LAST""".stripMargin),
    // b25: DependentColumnFilter — cells sharing the day-batch write ts
    // of a qualifying purchase cell in the same logical row (12-char
    // user prefix); EXISTS spelling vs the Spark side's window flag
    "b25_dependent_column" ->
      (cellsCte +
        """SELECT qualifier, count(*) AS n,
          |       count(DISTINCT substr(rowkey, 1, 12)) AS nusers,
          |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum
          |FROM cells c
          |WHERE EXISTS (SELECT 1 FROM cells r
          |  WHERE substr(r.rowkey, 1, 12) = substr(c.rowkey, 1, 12)
          |    AND r.qualifier = 'purchase' AND r.value > 100
          |    AND r.ts - r.ts % 86400000000 = c.ts - c.ts % 86400000000)
          |GROUP BY qualifier ORDER BY qualifier NULLS LAST""".stripMargin),
    // b27: SkipFilter — drop the WHOLE logical row when any of its
    // cells fails the wrapped value filter; NOT EXISTS spelling vs the
    // Spark side's row-scope boolean min window
    "b27_skip_filter" ->
      (cellsCte +
        """SELECT qualifier, count(*) AS n,
          |       count(DISTINCT substr(rowkey, 1, 12)) AS nusers,
          |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum
          |FROM cells c
          |WHERE NOT EXISTS (SELECT 1 FROM cells f
          |  WHERE substr(f.rowkey, 1, 12) = substr(c.rowkey, 1, 12)
          |    AND (f.value IS NULL OR f.value < 1.0))
          |GROUP BY qualifier ORDER BY qualifier NULLS LAST""".stripMargin),
    // b28: ColumnRangeFilter — qualifier in [min, max), the
    // column-dimension range scan
    "b28_column_range" ->
      (cellsCte +
        """SELECT qualifier, count(*) AS n,
          |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum
          |FROM cells
          |WHERE qualifier >= 'click' AND qualifier < 'signup'
          |GROUP BY qualifier ORDER BY qualifier NULLS LAST""".stripMargin),
    // b29: MultipleColumnPrefixFilter — OR of qualifier prefixes
    "b29_multi_col_prefix" ->
      (cellsCte +
        """SELECT qualifier, count(*) AS n,
          |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum
          |FROM cells
          |WHERE qualifier LIKE 'cl%' OR qualifier LIKE 'si%'
          |   OR qualifier LIKE 'e%'
          |GROUP BY qualifier ORDER BY qualifier NULLS LAST""".stripMargin),
    // b30: SingleColumnValueExcludeFilter — b12's row gate with the
    // tested column excluded from the output
    "b30_scv_exclude" ->
      (cellsCte +
        """SELECT qualifier, count(*) AS n,
          |       count(DISTINCT substr(rowkey, 1, 12)) AS nusers
          |FROM cells c
          |WHERE EXISTS (SELECT 1 FROM cells m
          |  WHERE substr(m.rowkey, 1, 12) = substr(c.rowkey, 1, 12)
          |    AND m.qualifier = 'purchase' AND m.value > 200)
          |  AND NOT (qualifier = 'purchase')
          |GROUP BY qualifier ORDER BY qualifier NULLS LAST""".stripMargin),
    // b26: ColumnCountGetFilter(2) — first 2 columns per logical row
    // after the latest-version read (b20's machinery, page anchored at
    // the row start)
    "b26_column_count" ->
      (cellsCte +
        """SELECT substr(rowkey, 1, 12) AS row_prefix, cpos, rowkey,
          |       qualifier, value FROM
          |  (SELECT rowkey, qualifier, value,
          |          row_number() OVER (PARTITION BY substr(rowkey, 1, 12)
          |                             ORDER BY qualifier, rowkey) AS cpos
          |   FROM (SELECT rowkey, cf, qualifier, value,
          |                row_number() OVER (PARTITION BY rowkey, cf, qualifier
          |                                   ORDER BY ts DESC, value) AS rnv
          |         FROM cells)
          |   WHERE rnv = 1)
          |WHERE cpos <= 2
          |ORDER BY rowkey NULLS LAST LIMIT 400""".stripMargin),
    "b21_reverse_scan" ->
      (cellsCte +
        """SELECT rowkey, qualifier, ts AS ts_us, value, op FROM cells
          |WHERE rowkey <= '000000000007:999999999999'
          |ORDER BY rowkey DESC LIMIT 50""".stripMargin),
    "b20_column_pagination" ->
      (cellsCte +
        """SELECT qualifier, count(*) AS n FROM
          |  (SELECT rowkey, qualifier,
          |          row_number() OVER (PARTITION BY substr(rowkey, 1, 12)
          |                             ORDER BY qualifier, rowkey) AS cpos
          |   FROM (SELECT rowkey, cf, qualifier,
          |                row_number() OVER (PARTITION BY rowkey, cf, qualifier
          |                                   ORDER BY ts DESC, value) AS rnv
          |         FROM cells)
          |   WHERE rnv = 1)
          |WHERE cpos BETWEEN 2 AND 3
          |GROUP BY qualifier ORDER BY qualifier NULLS LAST""".stripMargin),
    "b1_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice * (1 - l_discount) AS disc_price
        |FROM lineitem ORDER BY l_orderkey NULLS LAST, l_linenumber NULLS LAST,
        |                       disc_price NULLS LAST LIMIT 200""".stripMargin,
    "b2_filter_pred" ->
      """SELECT count(*) AS n FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20 AND l_discount > 0.05 AND NOT (l_returnflag = 'A')""".stripMargin,
    "b3_filter_in" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |WHERE o_orderstatus IN ('F','P') GROUP BY o_orderpriority
        |ORDER BY o_orderpriority NULLS LAST""".stripMargin,
    "b4_rowkey_prefix" ->
      (cellsCte + "SELECT count(*) AS n FROM cells WHERE rowkey LIKE '000000000042:%'"),
    "b5_filter_regex" ->
      """SELECT n_name FROM nation WHERE regexp_matches(n_name, '^NATION_1[0-9]$')
        |ORDER BY n_name NULLS LAST""".stripMargin,
    "b6_filter_null" ->
      """SELECT count(*) AS nn, count(*) FILTER (WHERE c_acctbal IS NULL) AS nulls
        |FROM customer""".stripMargin,
    "b7_latest_cells" ->
      (cellsCte +
        """SELECT rowkey, qualifier, value FROM
          |  (SELECT rowkey, qualifier, value,
          |          row_number() OVER (PARTITION BY rowkey, cf, qualifier
          |                             ORDER BY ts DESC, value) rn
          |   FROM cells WHERE op = 'put')
          |WHERE rn = 1 ORDER BY rowkey NULLS LAST, qualifier NULLS LAST LIMIT 500""".stripMargin),
    "b8_max_versions" ->
      (cellsCte +
        """SELECT count(*) AS n FROM
          |  (SELECT row_number() OVER (PARTITION BY rowkey, cf, qualifier
          |                             ORDER BY ts DESC, value) rn FROM cells)
          |WHERE rn <= 3""".stripMargin),
    "b9_rowkey_range" ->
      (cellsCte +
        """SELECT count(*) AS n FROM cells
          |WHERE rowkey BETWEEN '000000000010:000000000000' AND '000000000020:000000999999999999'""".stripMargin),
    "b10_ts_range" ->
      """SELECT event_type, count(*) AS n FROM events
        |WHERE CAST(epoch_us(ts) AS BIGINT) BETWEEN 1704500000000000 AND 1705500000000000
        |GROUP BY event_type ORDER BY event_type NULLS LAST""".stripMargin,
    "b11_qualifier_filter" ->
      (cellsCte + "SELECT count(*) AS n FROM cells WHERE qualifier LIKE 'c%'"),
    "b23_timestamps_filter" ->
      (cellsCte +
        """SELECT qualifier, count(*) AS n, count(DISTINCT rowkey) AS nrows
          |FROM cells
          |WHERE ts IN (SELECT DISTINCT ts FROM cells
          |             WHERE rowkey LIKE '000000000001:%')
          |GROUP BY qualifier ORDER BY qualifier NULLS LAST""".stripMargin),
    "b12_scvf_exists" ->
      """SELECT count(DISTINCT user_id) AS n FROM events e
        |WHERE EXISTS (SELECT 1 FROM events e2 WHERE e2.user_id = e.user_id
        |              AND e2.event_type = 'purchase' AND e2.value > 100)""".stripMargin,
    "b13_page_per_bucket" ->
      """SELECT bucket, rowkey FROM
        |  (SELECT user_id % 8 AS bucket,
        |          concat(lpad(CAST(user_id AS VARCHAR),12,'0'),':',
        |                 lpad(CAST(event_id AS VARCHAR),12,'0')) AS rowkey,
        |          row_number() OVER (PARTITION BY user_id % 8
        |            ORDER BY concat(lpad(CAST(user_id AS VARCHAR),12,'0'),':',
        |                            lpad(CAST(event_id AS VARCHAR),12,'0'))) rn
        |   FROM events)
        |WHERE rn <= 5 ORDER BY bucket NULLS LAST, rowkey NULLS LAST""".stripMargin,
    "b14_first_key" ->
      (cellsCte +
        """SELECT rowkey, min(qualifier) AS first_qual FROM cells GROUP BY rowkey
          |ORDER BY rowkey NULLS LAST LIMIT 300""".stripMargin),
    "b15_tombstone_mask" ->
      (cellsCte +
        """SELECT count(*) AS survivors FROM
          |  (SELECT ts, op, max(CASE WHEN op='delete' THEN ts END)
          |            OVER (PARTITION BY rowkey, cf, qualifier) AS del_ts
          |   FROM cells)
          |WHERE op = 'put' AND (del_ts IS NULL OR ts > del_ts)""".stripMargin),
    "b16_table_checksum" ->
      s"SELECT count(*) AS n, ${dsum("o_totalprice")} AS checksum FROM orders",
    "b17_compaction" ->
      (cellsCte +
        """SELECT qualifier, count(*) AS n, count(DISTINCT rowkey) AS nrows FROM
          |  (SELECT qualifier, rowkey,
          |          row_number() OVER (PARTITION BY rowkey, cf, qualifier
          |                             ORDER BY ts DESC, value) AS rn
          |   FROM (SELECT rowkey, cf, qualifier, ts, value, op,
          |                max(CASE WHEN op='delete' THEN ts END)
          |                  OVER (PARTITION BY rowkey, cf, qualifier) AS del_ts
          |         FROM cells WHERE ts >= 1704800000000000)
          |   WHERE op = 'put' AND (del_ts IS NULL OR ts > del_ts))
          |WHERE rn <= 2
          |GROUP BY qualifier ORDER BY qualifier NULLS LAST""".stripMargin))

  val aggs: Map[String, String] = Map(
    "d16_agg_bool" ->
      """SELECT o_orderpriority, bool_and(o_totalprice > 1000) AS all_over_1k,
        |       bool_or(o_orderstatus = 'F') AS any_f, count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority NULLS LAST""".stripMargin,
    "d1_agg_basic" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
         |       min(l_quantity) AS mn, max(l_quantity) AS mx,
         |       ${dsum("l_quantity")} AS s
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin,
    "d2_agg_avg" ->
      """SELECT o_orderpriority,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority NULLS LAST""".stripMargin,
    "d3_agg_distinct" ->
      "SELECT count(DISTINCT l_partkey) AS dp, count(DISTINCT l_suppkey) AS ds FROM lineitem",
    "d5_agg_gsets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "d6_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "d7_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "d8_agg_collect" ->
      """SELECT c_mktsegment,
        |       array_to_string(list_sort(list(DISTINCT c_nationkey)), ',') AS nations
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS LAST""".stripMargin,
    "d9_agg_median" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag NULLS LAST""".stripMargin,
    "d10_agg_stddev" ->
      """SELECT o_orderstatus,
        |  round(sqrt((CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |        - CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |          * CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*))
        |       / (count(*) - 1)), 4) AS sd
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus NULLS LAST""".stripMargin,
    "d11_agg_argmax" ->
      // arg_max with a composite tiebreak isn't available in this DuckDB
      // build; the window form expresses the same argmax-with-tiebreak (R8).
      """SELECT o_custkey, o_orderkey AS best_order FROM
        |  (SELECT o_custkey, o_orderkey,
        |          row_number() OVER (PARTITION BY o_custkey
        |                             ORDER BY o_totalprice DESC, o_orderkey DESC) rn
        |   FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey NULLS LAST LIMIT 300""".stripMargin,
    "d12_agg_condagg" ->
      """SELECT user_id,
        |       CAST(sum(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(18,2))
        |                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS spend,
        |       count(*) FILTER (WHERE event_type='error') AS errors
        |FROM events GROUP BY user_id ORDER BY user_id NULLS LAST LIMIT 200""".stripMargin,
    "d17_check_and_put" ->
      """WITH uc AS (
        |  SELECT lpad(CAST(user_id AS VARCHAR), 12, '0') AS rowkey, 'e' AS cf,
        |         event_type AS qualifier, CAST(epoch_us(ts) AS BIGINT) AS ts, value
        |  FROM events),
        |l1 AS (SELECT rowkey, cf, qualifier, ts, value FROM (
        |  SELECT rowkey, cf, qualifier, ts, value,
        |         row_number() OVER (PARTITION BY rowkey, cf, qualifier
        |                            ORDER BY ts DESC, value) AS rn FROM uc) WHERE rn = 1),
        |muts AS (SELECT rowkey, cf, qualifier, ts + 1000000 AS ts, value + 1.0 AS value
        |         FROM l1 WHERE qualifier = 'click' AND value > 30.0),
        |allc AS (SELECT * FROM uc UNION ALL SELECT * FROM muts),
        |l2 AS (SELECT rowkey, cf, qualifier, ts, value FROM (
        |  SELECT rowkey, cf, qualifier, ts, value,
        |         row_number() OVER (PARTITION BY rowkey, cf, qualifier
        |                            ORDER BY ts DESC, value) AS rn FROM allc) WHERE rn = 1)
        |SELECT qualifier, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum
        |FROM l2 GROUP BY qualifier ORDER BY qualifier NULLS LAST""".stripMargin,
    "d18_check_and_delete" ->
      """WITH uc AS (
        |  SELECT lpad(CAST(user_id AS VARCHAR), 12, '0') AS rowkey, 'e' AS cf,
        |         event_type AS qualifier, CAST(epoch_us(ts) AS BIGINT) AS ts, value,
        |         0 AS del
        |  FROM events),
        |l1 AS (SELECT rowkey, cf, qualifier, ts, value FROM (
        |  SELECT rowkey, cf, qualifier, ts, value,
        |         row_number() OVER (PARTITION BY rowkey, cf, qualifier
        |                            ORDER BY ts DESC, del DESC, value) AS rn FROM uc) WHERE rn = 1),
        |tombs AS (SELECT rowkey, cf, qualifier, ts, value, 1 AS del
        |          FROM l1 WHERE qualifier = 'error' AND value < 200.0),
        |allc AS (SELECT * FROM uc UNION ALL SELECT * FROM tombs),
        |l2 AS (SELECT rowkey, cf, qualifier, ts, value, del FROM (
        |  SELECT rowkey, cf, qualifier, ts, value, del,
        |         row_number() OVER (PARTITION BY rowkey, cf, qualifier
        |                            ORDER BY ts DESC, del DESC, value) AS rn FROM allc) WHERE rn = 1)
        |SELECT qualifier, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum
        |FROM l2 WHERE del = 0 GROUP BY qualifier ORDER BY qualifier NULLS LAST""".stripMargin,
    "d19_row_mutations" ->
      """WITH uc AS (
        |  SELECT lpad(CAST(user_id AS VARCHAR), 12, '0') AS rowkey, 'e' AS cf,
        |         event_type AS qualifier, CAST(epoch_us(ts) AS BIGINT) AS ts, value,
        |         0 AS del
        |  FROM events),
        |m AS (SELECT *, max(ts) OVER (PARTITION BY rowkey) + 1000000 AS bts FROM uc),
        |l1 AS (SELECT rowkey, cf, bts, value FROM (
        |  SELECT rowkey, cf, qualifier, bts, value,
        |         row_number() OVER (PARTITION BY rowkey, cf, qualifier
        |                            ORDER BY ts DESC, del DESC, value) AS rn FROM m)
        |  WHERE rn = 1 AND qualifier = 'purchase' AND value > 100.0),
        |muts AS (
        |  SELECT rowkey, cf, 'audit' AS qualifier, bts AS ts, value, 0 AS del FROM l1
        |  UNION ALL
        |  SELECT rowkey, cf, 'click' AS qualifier, bts AS ts,
        |         CAST(NULL AS DOUBLE) AS value, 1 AS del FROM l1),
        |allc AS (SELECT rowkey, cf, qualifier, ts, value, del FROM uc
        |         UNION ALL SELECT * FROM muts),
        |l2 AS (SELECT qualifier, value, del FROM (
        |  SELECT qualifier, value, del,
        |         row_number() OVER (PARTITION BY rowkey, cf, qualifier
        |                            ORDER BY ts DESC, del DESC, value) AS rn FROM allc)
        |  WHERE rn = 1)
        |SELECT qualifier, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum
        |FROM l2 WHERE del = 0 GROUP BY qualifier ORDER BY qualifier NULLS LAST""".stripMargin,
    "d13_hbase_increment" ->
      (cellsCte +
        s"""SELECT rowkey, ${dsum("value")} AS counter
           |FROM cells WHERE op='put' GROUP BY rowkey ORDER BY rowkey NULLS LAST LIMIT 300""".stripMargin),
    "d14_hbase_append" ->
      (cellsCte +
        """SELECT rowkey, array_to_string(list_sort(list(qualifier)), ',') AS appended
          |FROM cells GROUP BY rowkey ORDER BY rowkey NULLS LAST LIMIT 300""".stripMargin))

  val sortSets: Map[String, String] = Map(
    "f5_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey NULLS LAST
        |LIMIT 25 OFFSET 25""".stripMargin,
    "f1_sort_global" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |ORDER BY l_extendedprice DESC NULLS LAST, l_orderkey NULLS LAST,
        |         l_linenumber NULLS LAST LIMIT 100""".stripMargin,
    "f2_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey NULLS LAST LIMIT 25""".stripMargin,
    "f4_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment NULLS LAST",
    "g1_union_all" ->
      """SELECT count(*) AS n FROM
        |  (SELECT c_nationkey k FROM customer UNION ALL SELECT s_nationkey FROM supplier)""".stripMargin,
    "g2_union" ->
      """SELECT count(*) AS n FROM
        |  (SELECT c_nationkey k FROM customer UNION SELECT s_nationkey FROM supplier)""".stripMargin,
    "g3_intersect" ->
      """SELECT k FROM (SELECT c_nationkey k FROM customer INTERSECT SELECT s_nationkey FROM supplier)
        |ORDER BY k NULLS LAST""".stripMargin,
    "g4_except" ->
      """SELECT k FROM (SELECT p_partkey k FROM part
        |               EXCEPT SELECT l_partkey FROM lineitem WHERE l_quantity <= 1)
        |ORDER BY k NULLS LAST LIMIT 100""".stripMargin,
    "g5_intersect_all" ->
      """SELECT count(*) AS n FROM
        |  (SELECT o_orderstatus FROM orders WHERE o_orderkey % 2 = 0
        |   INTERSECT ALL SELECT o_orderstatus FROM orders WHERE o_orderkey % 3 = 0)""".stripMargin,
    "g6_except_all" ->
      """SELECT count(*) AS n FROM
        |  (SELECT o_orderstatus FROM orders WHERE o_orderkey % 2 = 0
        |   EXCEPT ALL SELECT o_orderstatus FROM orders WHERE o_orderkey % 3 = 0)""".stripMargin)

  val joins: Map[String, String] = Map(
    "c13_join_scalar_subq" ->
      """SELECT count(*) AS n FROM orders
        |WHERE o_totalprice >
        |  (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |   FROM orders)""".stripMargin,
    "c1_join_inner" ->
      """SELECT c_mktsegment, count(*) AS n,
         |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
         |                 * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS rev
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |              JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS LAST""".stripMargin,
    "c2_join_broadcast" ->
      """SELECT n_name, count(*) AS n FROM nation JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY n_name ORDER BY n_name NULLS LAST""".stripMargin,
    "c3_join_left" ->
      """SELECT count(*) AS total, count(*) FILTER (WHERE o_orderkey IS NULL) AS unmatched
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey""".stripMargin,
    "c4_join_right" ->
      """SELECT count(*) AS total, count(*) FILTER (WHERE c_custkey IS NULL) AS unmatched
        |FROM orders RIGHT JOIN customer ON c_custkey = o_custkey""".stripMargin,
    "c5_join_full" ->
      """SELECT count(*) AS n FROM
        |  (SELECT p_partkey FROM part) p FULL JOIN
        |  (SELECT DISTINCT l_partkey FROM lineitem) l ON p.p_partkey = l.l_partkey""".stripMargin,
    "c6_join_semi" ->
      """SELECT count(*) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "c7_join_anti" ->
      """SELECT count(*) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "c8_join_cross" ->
      "SELECT count(*) AS n FROM region CROSS JOIN nation",
    "c9_join_theta" ->
      """SELECT count(*) AS n FROM
        |  (SELECT DISTINCT p_size AS a_size FROM part) a JOIN
        |  (SELECT DISTINCT p_size AS b_size FROM part) b ON a.a_size < b.b_size""".stripMargin,
    "c10_join_asof" ->
      """SELECT count(*) AS with_prior_click FROM
        |  (SELECT event_type,
        |          max(CASE WHEN event_type = 'click' THEN CAST(epoch_us(ts) AS BIGINT) END)
        |            OVER (PARTITION BY user_id ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_click
        |   FROM events)
        |WHERE event_type = 'error' AND prior_click IS NOT NULL""".stripMargin,
    "c11_join_interval" ->
      """SELECT count(*) AS pairs FROM
        |  (SELECT user_id, event_id AS a_id, CAST(epoch_us(ts) AS BIGINT) AS a_ts FROM events) a
        |JOIN
        |  (SELECT user_id AS b_user, event_id AS b_id, CAST(epoch_us(ts) AS BIGINT) AS b_ts FROM events) b
        |ON a.user_id = b.b_user AND a.a_id < b.b_id
        |   AND b.b_ts BETWEEN a.a_ts AND a.a_ts + 3600000000""".stripMargin)

  val windows: Map[String, String] = Map(
    "i3_window_sliding_batch" ->
      """SELECT win_start, event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v FROM
        |  (SELECT event_type, value,
        |          (CAST(epoch_us(ts) AS BIGINT) // 900000000 - offs.i) * 900000000 AS win_start
        |   FROM events CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) offs)
        |GROUP BY win_start, event_type
        |ORDER BY win_start NULLS LAST, event_type NULLS LAST""".stripMargin,
    "e1_win_rownum" ->
      """SELECT o_custkey, o_orderkey FROM
        |  (SELECT o_custkey, o_orderkey,
        |          row_number() OVER (PARTITION BY o_custkey
        |                             ORDER BY o_totalprice DESC, o_orderkey) rn
        |   FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey NULLS LAST LIMIT 300""".stripMargin,
    "e2_win_rank" ->
      """SELECT p_brand, p_size, rnk, drnk FROM
        |  (SELECT p_brand, p_size,
        |          rank()       OVER (PARTITION BY p_brand ORDER BY p_size, p_partkey) rnk,
        |          dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size) drnk
        |   FROM part)
        |WHERE rnk <= 3 ORDER BY p_brand NULLS LAST, rnk NULLS LAST, p_size NULLS LAST""".stripMargin,
    "e3_win_ntile" ->
      """SELECT tile, count(*) AS n, min(o_orderkey) AS mn FROM
        |  (SELECT o_orderkey, ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS tile FROM orders)
        |GROUP BY tile ORDER BY tile NULLS LAST""".stripMargin,
    "e4_win_pctrank" ->
      """SELECT n_name, pr, cd FROM
        |  (SELECT n_name, percent_rank() OVER (ORDER BY n_nationkey) pr,
        |                  cume_dist()    OVER (ORDER BY n_nationkey) cd FROM nation)
        |ORDER BY n_name NULLS LAST""".stripMargin,
    "e5_win_lag" ->
      """SELECT count(*) AS gaps,
        |       CAST(sum(CAST(gap // 1000 AS DECIMAL(18,0))) AS BIGINT) AS total_ms FROM
        |  (SELECT epoch_us(ts) - lag(epoch_us(ts))
        |            OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
        |   FROM events)
        |WHERE gap IS NOT NULL""".stripMargin,
    "e6_win_nth" ->
      """SELECT user_id, first_val, last_val FROM
        |  (SELECT user_id,
        |     first_value(event_type) OVER w AS first_val,
        |     last_value(event_type)  OVER (PARTITION BY user_id
        |       ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_val,
        |     row_number() OVER w AS rn
        |   FROM events
        |   WINDOW w AS (PARTITION BY user_id ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id))
        |WHERE rn = 1 ORDER BY user_id NULLS LAST""".stripMargin,
    "e7_win_running" ->
      """SELECT o_custkey, o_orderkey, CAST(run AS DOUBLE) AS run FROM
        |  (SELECT o_custkey, o_orderkey,
        |          sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |   FROM orders)
        |ORDER BY o_custkey NULLS LAST, o_orderkey NULLS LAST LIMIT 500""".stripMargin,
    "e8_win_range" ->
      """SELECT p_partkey, cnt FROM
        |  (SELECT p_partkey,
        |          count(*) OVER (ORDER BY p_size RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) cnt
        |   FROM part)
        |ORDER BY p_partkey NULLS LAST LIMIT 300""".stripMargin,
    "e9_win_topk_group" ->
      """SELECT event_type, user_id, spend FROM
        |  (SELECT event_type, user_id, spend,
        |          row_number() OVER (PARTITION BY event_type ORDER BY spend DESC, user_id) rn
        |   FROM (SELECT event_type, user_id,
        |                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |         FROM events GROUP BY event_type, user_id))
        |WHERE rn <= 3 ORDER BY event_type NULLS LAST, spend DESC, user_id NULLS LAST""".stripMargin,
    "i2_window_tumbling_batch" ->
      """SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS hour_bucket,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |FROM events GROUP BY 1, 2 ORDER BY hour_bucket NULLS LAST, event_type NULLS LAST""".stripMargin,
    "i4_window_session_batch" ->
      """SELECT user_id, session_id, count(*) AS n FROM
        |  (SELECT user_id, event_id,
        |          CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts2, event_id
        |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |   FROM (SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts2,
        |                CASE WHEN CAST(epoch_us(ts) AS BIGINT)
        |                          - lag(CAST(epoch_us(ts) AS BIGINT))
        |                            OVER (PARTITION BY user_id
        |                                  ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id)
        |                          > 1800000000
        |                       OR lag(CAST(epoch_us(ts) AS BIGINT))
        |                            OVER (PARTITION BY user_id
        |                                  ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id) IS NULL
        |                     THEN 1 ELSE 0 END AS new_s
        |         FROM events))
        |GROUP BY user_id, session_id
        |ORDER BY user_id NULLS LAST, session_id NULLS LAST""".stripMargin)

  val fns: Map[String, String] = Map(
    "h13_fn_bitwise" ->
      """SELECT o_orderkey, o_orderkey & 255 AS band, o_orderkey | 4096 AS bor,
        |       xor(o_orderkey, 1234) AS bxor, o_orderkey << 2 AS shl,
        |       o_orderkey >> 1 AS shr, CAST(bit_count(o_orderkey) AS INT) AS bits
        |FROM orders ORDER BY o_orderkey NULLS LAST LIMIT 100""".stripMargin,
    "h1_fn_string" ->
      """SELECT p_partkey, upper(substr(p_name,1,5)) u, length(p_name) l,
        |       lpad(CAST(p_size AS VARCHAR), 4, '0') pad, reverse(p_brand) rev,
        |       levenshtein(p_brand, 'Brand#11') lev
        |FROM part ORDER BY p_partkey NULLS LAST LIMIT 200""".stripMargin,
    "h2_fn_regex" ->
      """SELECT p_partkey, regexp_extract(p_type, '([A-Z]+)', 1) g,
        |       regexp_replace(p_name, '[aeiou]', '_', 'g') r
        |FROM part ORDER BY p_partkey NULLS LAST LIMIT 200""".stripMargin,
    "h3_fn_datetime" ->
      """SELECT o_orderkey, year(o_orderdate) y, month(o_orderdate) m,
        |       CAST(date_trunc('month', o_orderdate) AS DATE) mstart,
        |       date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) dd,
        |       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) plus3
        |FROM orders ORDER BY o_orderkey NULLS LAST LIMIT 200""".stripMargin,
    "h4_fn_math" ->
      """SELECT p_partkey, abs(p_size - 25) a, pow(p_size, 2) p2, sqrt(CAST(p_size AS DOUBLE)) sq,
        |       p_size % 7 md, CAST(sign(p_size - 25) AS INT) sg,
        |       greatest(p_size, 10) g, least(p_size, 40) l
        |FROM part ORDER BY p_partkey NULLS LAST LIMIT 200""".stripMargin,
    "h5_fn_cond" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice > 200000 THEN 'hi'
        |            WHEN o_totalprice > 100000 THEN 'mid' ELSE 'lo' END b,
        |       coalesce(nullif(o_orderstatus, 'P'), 'PENDING') s
        |FROM orders ORDER BY o_orderkey NULLS LAST LIMIT 200""".stripMargin,
    "h6_fn_array" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS ntok,
        |       array_to_string(list_sort((string_split(text, ' '))[1:3]), ',') AS head3
        |FROM documents ORDER BY doc_id NULLS LAST LIMIT 100""".stripMargin,
    "h7_fn_lambda" ->
      """SELECT vec_id,
        |       list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)*2),
        |                   (a,x) -> a+x) AS s
        |FROM embeddings ORDER BY vec_id NULLS LAST LIMIT 100""".stripMargin,
    // h8: the map lives only on the Spark side (map_from_entries /
    // element_at / map_filter / map_values); the oracle recomputes the
    // same facts relationally — DuckDB MAP parquet round-trips are fragile
    "h8_fn_map" ->
      """WITH per AS (
        |  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2)
        |SELECT user_id,
        |       CAST(count(*) AS INT) AS n_types,
        |       CAST(coalesce(sum(n) FILTER (WHERE event_type = 'click'), 0) AS BIGINT) AS clicks,
        |       CAST(coalesce(sum(n) FILTER (WHERE event_type <> 'error'), 0) AS BIGINT) AS non_error_events,
        |       string_agg(event_type, ',' ORDER BY event_type) AS types
        |FROM per GROUP BY user_id ORDER BY user_id NULLS LAST LIMIT 200""".stripMargin,
    "h9_fn_json" ->
      """SELECT event_type,
        |       CAST(sum(CAST(CAST(props->>'$.k' AS INT) AS DECIMAL(18,0))) AS BIGINT) AS ksum
        |FROM events GROUP BY event_type ORDER BY event_type NULLS LAST""".stripMargin,
    "h10_fn_hash" ->
      """SELECT p_partkey, sha256(p_name) h, md5(p_name) m
        |FROM part ORDER BY p_partkey NULLS LAST LIMIT 100""".stripMargin,
    "h11_fn_struct" ->
      """SELECT o_orderkey,
        |       struct_pack(status := o_orderstatus, priority := o_orderpriority).status AS st
        |FROM orders ORDER BY o_orderkey NULLS LAST LIMIT 100""".stripMargin,
    "h12_fn_cast" ->
      """SELECT o_orderkey, CAST(floor(o_totalprice) AS BIGINT) ip,
        |       CAST(o_orderkey AS VARCHAR) s,
        |       try_cast(o_orderpriority AS INT) bad
        |FROM orders ORDER BY o_orderkey NULLS LAST LIMIT 100""".stripMargin)

  val texts: Map[String, String] = Map(
    // j51: bucket hash is the portable top-60-bits-of-md5; the log-ratio
    // rounds at 6dp into DECIMAL (libm ln ulp); doc score is the exact
    // decimal dot product sum(k*lr), one final DOUBLE cast
    "j51_dsir_select" ->
      """WITH ws AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS ws FROM documents),
        |g AS (SELECT doc_id, lang, ws[i] || ' ' || ws[i+1] AS g
        |      FROM ws, unnest(generate_series(1, len(ws)-1)) AS u(i)
        |      WHERE len(ws) >= 2),
        |db AS (SELECT doc_id, lang, ('0x' || substr(md5(g),1,15))::BIGINT % 1024 AS b, count(*) AS k
        |       FROM g GROUP BY doc_id, lang, b),
        |bc AS (SELECT b, CAST(sum(k) AS BIGINT) AS cr,
        |              CAST(sum(CASE WHEN lang='en' THEN k ELSE 0 END) AS BIGINT) AS ct
        |       FROM db GROUP BY b),
        |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr, CAST(sum(ct) AS BIGINT) AS nt FROM bc),
        |lr AS (SELECT b,
        |        CAST(round(ln(CAST(ct+1 AS DOUBLE)/CAST((SELECT nt FROM tot)+1024 AS DOUBLE))
        |                 - ln(CAST(cr+1 AS DOUBLE)/CAST((SELECT nr FROM tot)+1024 AS DOUBLE)), 6)
        |             AS DECIMAL(18,6)) AS lr
        |       FROM bc)
        |SELECT db.doc_id, CAST(sum(db.k) AS BIGINT) AS ngram,
        |       CAST(sum(db.k * lr.lr) AS DOUBLE) AS w
        |FROM db JOIN lr USING (b)
        |GROUP BY db.doc_id
        |ORDER BY w DESC, doc_id NULLS LAST LIMIT 100""".stripMargin,
    // j52: cut points and the apply coin are independently-salted mixSql
    // hashes; the per-mode gate hashes EVERY rendered doc through an
    // order-independent modular sum of portable md5s
    "j52_fim_transform" ->
      s"""WITH t AS (
        |  SELECT doc_id, text, len(text) AS L,
        |         1 + ${mixSql("(doc_id + 40501)")} % greatest(len(text), 1) AS c1,
        |         1 + ${mixSql("(doc_id + 81001)")} % greatest(len(text), 1) AS c2,
        |         (${mixSql("(doc_id + 120011)")} % 100 < 50) AND (len(text) >= 2) AS fim
        |  FROM documents WHERE text IS NOT NULL),
        |r AS (
        |  SELECT doc_id, fim, L,
        |         least(c1, c2) AS lo, greatest(c1, c2) AS hi,
        |         CASE WHEN fim THEN
        |           '<PRE>' || substr(text, 1, least(c1,c2) - 1) ||
        |           '<SUF>' || substr(text, greatest(c1,c2)) ||
        |           '<MID>' || substr(text, least(c1,c2), greatest(c1,c2) - least(c1,c2))
        |         ELSE text END AS out
        |  FROM t)
        |SELECT CASE WHEN fim THEN 'psm' ELSE 'raw' END AS mode,
        |       count(*) AS n,
        |       CAST(sum(CASE WHEN fim THEN lo - 1 ELSE 0 END) AS BIGINT) AS psum,
        |       CAST(sum(CASE WHEN fim THEN hi - lo ELSE 0 END) AS BIGINT) AS msum,
        |       CAST(sum(CASE WHEN fim THEN L - hi + 1 ELSE 0 END) AS BIGINT) AS ssum,
        |       CAST(sum(CAST(('0x' || substr(md5(out),1,15))::BIGINT AS HUGEINT))
        |            % 1000000007 AS BIGINT) AS hmod
        |FROM r GROUP BY mode ORDER BY mode NULLS LAST""".stripMargin,
    // j53: per-doc nll is the j32 recipe (rounded-term decimal sum, one
    // division); terciles via ntile over (nll, doc_id) per lang — both
    // engines follow the SQL-standard larger-buckets-first contract
    "j53_ppl_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
        |cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt),
        |nll AS (
        |  SELECT doc_id, lang,
        |         sum(CAST(round(-ln(CAST(c AS DOUBLE) / CAST((SELECT n FROM tot) AS DOUBLE)), 6)
        |              AS DECIMAL(18,6))) AS ts,
        |         count(*) AS ntok,
        |         CAST(sum(CAST(round(-ln(CAST(c AS DOUBLE) / CAST((SELECT n FROM tot) AS DOUBLE)), 6)
        |              AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS nll
        |  FROM toks t JOIN cnt c USING (tok)
        |  GROUP BY doc_id, lang),
        |bk AS (SELECT lang, ts, ntok, nll,
        |              ntile(3) OVER (PARTITION BY lang ORDER BY nll ASC, doc_id ASC) AS bucket
        |       FROM nll)
        |SELECT lang, bucket, count(*) AS n,
        |       CAST(sum(ts) AS DOUBLE) / CAST(sum(ntok) AS DOUBLE) AS tw_nll
        |FROM bk GROUP BY lang, bucket
        |ORDER BY lang NULLS LAST, bucket NULLS LAST""".stripMargin,
    // j55: -p·ln(p) rounds at 6dp into DECIMAL per term; doc sum exact
    "j55_token_entropy" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
        |cnt AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
        |tot AS (SELECT doc_id, tok, c, CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n FROM cnt),
        |terms AS (
        |  SELECT doc_id, n,
        |         CAST(round(-(CAST(c AS DOUBLE)/CAST(n AS DOUBLE))
        |                    * ln(CAST(c AS DOUBLE)/CAST(n AS DOUBLE)), 6) AS DECIMAL(18,6)) AS term
        |  FROM tot)
        |SELECT doc_id, CAST(max(n) AS BIGINT) AS ntok, count(*) AS nuniq,
        |       CAST(sum(term) AS DOUBLE) AS entropy
        |FROM terms GROUP BY doc_id
        |ORDER BY entropy DESC, doc_id NULLS LAST LIMIT 100""".stripMargin,
    // j33 recomputes the winnowing fingerprint relationally: every 7-char
    // gram hashed to the top 60 bits of md5 (15 hex chars → BIGINT — the
    // portable spelling of the Spark side's conv(substr(md5,1,15),16,10)),
    // the per-position window min over the UNFILTERED gram sequence (the
    // frame must see the tail grams even though only positions
    // p <= max(n-w+1, 1) select a fingerprint), then distinct + ordered
    // digest. n < w degenerates to one window over all n grams — exactly
    // graft_winnow's contract.
    "j41_ngram_lm" ->
      """WITH ws AS (SELECT string_split(lower(text), ' ') AS ws FROM documents),
        |pairs AS (
        |  SELECT ws[i] AS w1, ws[i + 1] AS w2
        |  FROM ws, unnest(generate_series(1, len(ws) - 1)) AS t(i)
        |  WHERE len(ws) >= 2),
        |cnt AS (SELECT w1, w2, count(*) AS c FROM pairs GROUP BY w1, w2)
        |SELECT w1, w2, c,
        |       round(CAST(c AS DOUBLE) / CAST(sum(c) OVER (PARTITION BY w1) AS DOUBLE), 6) AS p
        |FROM cnt
        |ORDER BY c DESC, w1 NULLS LAST, w2 NULLS LAST LIMIT 100""".stripMargin,
    // j43 recomputes the j41 bigram model, then scores every document's
    // bigram stream against it: per distinct (doc, w1, w2) ONE rounded
    // -ln(c/ctx) term weighted by its exact multiplicity, exact decimal
    // sum, one final division (the j32 recipe over bigrams)
    "j43_lm_perplexity" ->
      """WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |pairs AS (
        |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
        |  FROM ws, unnest(generate_series(1, len(ws) - 1)) AS t(i)
        |  WHERE len(ws) >= 2),
        |cnt AS (SELECT w1, w2, count(*) AS c FROM pairs GROUP BY w1, w2),
        |model AS (SELECT w1, w2, c, sum(c) OVER (PARTITION BY w1) AS ctx FROM cnt),
        |dtf AS (SELECT doc_id, w1, w2, count(*) AS k FROM pairs GROUP BY doc_id, w1, w2),
        |sc AS (
        |  SELECT doc_id, k,
        |         CAST(round(-ln(CAST(c AS DOUBLE) / CAST(ctx AS DOUBLE)), 6)
        |              AS DECIMAL(18,6)) AS t
        |  FROM dtf JOIN model USING (w1, w2))
        |SELECT doc_id, CAST(sum(k) AS BIGINT) AS nbi,
        |       CAST(CAST(sum(t * k) AS DECIMAL(38,6)) AS DOUBLE)
        |         / CAST(sum(k) AS DOUBLE) AS nll
        |FROM sc GROUP BY doc_id
        |ORDER BY nll DESC, doc_id NULLS LAST LIMIT 100""".stripMargin,
    // j49: stupid-backoff trigram scoring of the held-out doc_id%5=0
    // slice against models trained on the rest; per-level hit counts
    // are exact longs so the branch decisions themselves are gated
    "j49_lm_backoff" ->
      """WITH tr AS (SELECT string_split(lower(text), ' ') AS ws
        |            FROM documents WHERE doc_id % 5 <> 0),
        |he AS (SELECT doc_id,
        |              string_split(lower(text || ' zzq'
        |                || CAST(doc_id % 50 AS VARCHAR) || ' scan'), ' ') AS ws
        |       FROM documents WHERE doc_id % 5 = 0),
        |t1 AS (SELECT unnest(ws) AS w FROM tr),
        |c1 AS (SELECT w, count(*) AS cu FROM t1 GROUP BY w),
        |ntok AS (SELECT count(*) AS n FROM t1),
        |c2 AS (SELECT ws[i] AS w1, ws[i+1] AS w2, count(*) AS cb
        |       FROM tr, unnest(generate_series(1, len(ws)-1)) AS u(i)
        |       WHERE len(ws) >= 2 GROUP BY 1, 2),
        |c3 AS (SELECT ws[i] AS w1, ws[i+1] AS w2, ws[i+2] AS w3, count(*) AS ct
        |       FROM tr, unnest(generate_series(1, len(ws)-2)) AS u(i)
        |       WHERE len(ws) >= 3 GROUP BY 1, 2, 3),
        |dtf AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2, ws[i+2] AS w3,
        |               count(*) AS k
        |        FROM he, unnest(generate_series(1, len(ws)-2)) AS u(i)
        |        WHERE len(ws) >= 3 GROUP BY 1, 2, 3, 4),
        |sc AS (
        |  SELECT d.doc_id, d.k,
        |    CASE WHEN t.ct IS NOT NULL THEN 1
        |         WHEN b.cb IS NOT NULL THEN 2
        |         WHEN u3.cu IS NOT NULL THEN 3 ELSE 4 END AS lvl,
        |    CAST(round(-ln(
        |      CASE WHEN t.ct IS NOT NULL
        |             THEN CAST(t.ct AS DOUBLE) / CAST(p.cb AS DOUBLE)
        |           WHEN b.cb IS NOT NULL
        |             THEN CAST(0.4 AS DOUBLE) * CAST(b.cb AS DOUBLE)
        |                    / CAST(u2.cu AS DOUBLE)
        |           WHEN u3.cu IS NOT NULL
        |             THEN CAST(0.16 AS DOUBLE) * CAST(u3.cu AS DOUBLE)
        |                    / CAST(ntok.n AS DOUBLE)
        |           ELSE CAST(0.16 AS DOUBLE) / CAST(ntok.n AS DOUBLE)
        |      END), 6) AS DECIMAL(18,6)) AS t
        |  FROM dtf d
        |  LEFT JOIN c3 t ON d.w1 = t.w1 AND d.w2 = t.w2 AND d.w3 = t.w3
        |  LEFT JOIN c2 p ON d.w1 = p.w1 AND d.w2 = p.w2
        |  LEFT JOIN c2 b ON d.w2 = b.w1 AND d.w3 = b.w2
        |  LEFT JOIN c1 u2 ON d.w2 = u2.w
        |  LEFT JOIN c1 u3 ON d.w3 = u3.w
        |  CROSS JOIN ntok)
        |SELECT doc_id, CAST(sum(k) AS BIGINT) AS ntri,
        |  CAST(sum(CASE WHEN lvl = 1 THEN k ELSE 0 END) AS BIGINT) AS n_hit,
        |  CAST(sum(CASE WHEN lvl = 2 THEN k ELSE 0 END) AS BIGINT) AS n_bo2,
        |  CAST(sum(CASE WHEN lvl = 3 THEN k ELSE 0 END) AS BIGINT) AS n_bo1,
        |  CAST(sum(CASE WHEN lvl = 4 THEN k ELSE 0 END) AS BIGINT) AS n_oov,
        |  CAST(CAST(sum(t * k) AS DECIMAL(38,6)) AS DOUBLE)
        |    / CAST(sum(k) AS DOUBLE) AS nll
        |FROM sc GROUP BY doc_id
        |ORDER BY nll DESC, doc_id NULLS LAST LIMIT 100""".stripMargin,
    "j33_winnow_fingerprint" ->
      """WITH d AS (SELECT doc_id, lower(text) AS t FROM documents
        |           WHERE length(text) >= 7),
        |g AS (
        |  SELECT doc_id, i AS p, length(t) - 6 AS n,
        |         CAST(('0x' || substr(md5(substr(t, i, 7)), 1, 15)) AS BIGINT) AS h
        |  FROM d, unnest(generate_series(1, length(t)-6)) AS u(i)),
        |m AS (
        |  SELECT doc_id, p, n,
        |         min(h) OVER (PARTITION BY doc_id ORDER BY p
        |             ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh
        |  FROM g),
        |fp AS (SELECT DISTINCT doc_id, mh FROM m WHERE p <= greatest(n-3, 1))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
        |       md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY mh)) AS fp_md5
        |FROM fp GROUP BY doc_id ORDER BY doc_id NULLS LAST""".stripMargin,
    // j34: same deterministic PII augmentation from doc_id, then RE2's
    // count (regexp_extract_all length) and global regexp_replace — the
    // alternation-free patterns make Java regex and RE2 agree exactly;
    // the md5 pins the fully scrubbed bytes
    // j65: token chunking with overlap — whitespace tokens (the j4
    // convention), chunk ci covers [ci*15, ci*15+20); DuckDB list slice
    // is 1-based inclusive and length-clamped, matching Spark's slice
    "j65_chunk_overlap" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
        |           FROM documents WHERE doc_id < 5000),
        |n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_toks FROM t),
        |c AS (SELECT doc_id, toks, n_toks,
        |        unnest(generate_series(0, (n_toks - 1) // 15)) AS chunk_id
        |      FROM n)
        |SELECT doc_id, chunk_id,
        |  LEAST(20, n_toks - chunk_id * 15) AS n_chunk_toks,
        |  array_to_string(toks[chunk_id * 15 + 1 : chunk_id * 15 + 20], ' ')
        |    AS chunk_text
        |FROM c ORDER BY doc_id NULLS LAST, chunk_id NULLS LAST""".stripMargin,
    "j34_pii_scrub" ->
      """WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
        |a AS (SELECT doc_id,
        |  t || ' contact user' || CAST(doc_id AS VARCHAR)
        |    || '@mail.example.com or admin@test.org from '
        |    || CAST(doc_id % 256 AS VARCHAR) || '.10.'
        |    || CAST(doc_id % 100 AS VARCHAR) || '.7 call +1-555-'
        |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS a
        |  FROM d)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(a, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(a, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(a, '\+1-555-\d{4}')) AS BIGINT) AS n_phones,
        |  md5(regexp_replace(regexp_replace(regexp_replace(a,
        |      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |      '\+1-555-\d{4}', '<PHONE>', 'g')) AS scrub_md5
        |FROM a ORDER BY doc_id NULLS LAST""".stripMargin,
    // j18 recomputes the media payload (utf8 bytes ++ raw sha256 bytes)
    // independently from documents — hashing lower(hex(payload)) because
    // DuckDB's sha256 is VARCHAR-only and hex casing differs per engine
    "j18_media_stats" ->
      """SELECT kind, count(*) AS n,
        |       CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
        |       count(DISTINCT sha256(lower(hex(payload)))) AS distinct_payloads,
        |       min(sha256(lower(hex(payload)))) AS min_hash,
        |       max(sha256(lower(hex(payload)))) AS max_hash
        |FROM (SELECT (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
        |             encode(text) || unhex(sha256(text)) AS payload
        |      FROM documents)
        |GROUP BY kind ORDER BY kind NULLS LAST""".stripMargin,
    // j19 dims are pure doc_id arithmetic (mediaFilesTable encodes exactly
    // these into real PNG/JPEG/WAV/GIF/MP3 bytes; the Spark side re-derives
    // them from the bytes alone) — the oracle recomputes them symbolically.
    // Channels: 3 for truecolor PNG/JPEG, 1 for palette GIF, 1+id%2 for
    // WAV, 1 for mono MP3. Durations: WAV id%100+1 ms, MP3 24·(id%50+1) ms
    // (48 kHz Layer III = exactly 24 ms/frame).
    "j19_media_dims" ->
      """SELECT format, count(*) AS n,
        |       CAST(sum(w) AS BIGINT) AS sum_w, min(w) AS min_w, max(w) AS max_w,
        |       CAST(sum(h) AS BIGINT) AS sum_h,
        |       CAST(sum(ch) AS BIGINT) AS sum_ch,
        |       CAST(sum(dur) AS BIGINT) AS sum_dur_ms
        |FROM (SELECT CASE doc_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |                             WHEN 2 THEN 'wav' WHEN 3 THEN 'gif' ELSE 'mp3' END AS format,
        |             CASE WHEN doc_id % 5 IN (0, 1) THEN CAST(doc_id % 640 + 16 AS INT)
        |                  WHEN doc_id % 5 = 3 THEN CAST(doc_id % 160 + 16 AS INT) END AS w,
        |             CASE WHEN doc_id % 5 IN (0, 1) THEN CAST(doc_id % 480 + 16 AS INT)
        |                  WHEN doc_id % 5 = 3 THEN CAST(doc_id % 120 + 16 AS INT) END AS h,
        |             CASE WHEN doc_id % 5 IN (0, 1) THEN 3
        |                  WHEN doc_id % 5 = 2 THEN CAST(1 + doc_id % 2 AS INT)
        |                  ELSE 1 END AS ch,
        |             CASE WHEN doc_id % 5 = 2 THEN doc_id % 100 + 1
        |                  WHEN doc_id % 5 = 4 THEN 24 * (doc_id % 50 + 1) END AS dur
        |      FROM documents WHERE doc_id < 300)
        |GROUP BY format ORDER BY format NULLS LAST""".stripMargin,
    // j25: the pixel-decode gate — pure integer arithmetic over the same
    // grid the Spark side encodes into gray PNGs and decodes back via
    // ImageIO; PNG losslessness makes the comparison exact. The fixed
    // 0..32 / 0..28 series bounds cover every (w, h) the id arithmetic
    // can produce (w ≤ 32, h ≤ 28); the lateral filter trims per id.
    "j25_media_pixels" ->
      """SELECT id AS media_id, w, h,
        |       CAST(sum((xs.x * 3 + ys.y * 5 + id * 7) % 256) AS BIGINT) AS gray_sum
        |FROM (SELECT doc_id AS id, CAST(16 + doc_id % 17 AS INT) AS w,
        |             CAST(16 + (doc_id * 3) % 13 AS INT) AS h
        |      FROM documents) ids,
        |     generate_series(0, 32) xs(x), generate_series(0, 28) ys(y)
        |WHERE xs.x < w AND ys.y < h
        |GROUP BY id, w, h ORDER BY media_id NULLS LAST""".stripMargin,
    // j62: perceptual image dedup — every hash BIT recomputed from the
    // closed-form pixel grid: per-block integer sums, global-mean test by
    // integer cross-multiplication (s·w·h > S·n_b), bit packing with the
    // signed two's-complement spelling for bit 63 (1::BIGINT << 63
    // overflows DuckDB's shift; Spark's 1L << 63 wraps to the same
    // negative value the literal spells). Groups keyed (ahash, w, h)
    // exactly like the Spark side, so a hash collision merges identically.
    "j62_image_dedup" ->
      """WITH ids AS (SELECT doc_id AS id, doc_id - doc_id % 5 AS g FROM documents),
        |dims AS (SELECT id, g, CAST(16 + g % 17 AS INT) AS w,
        |                CAST(16 + (g * 3) % 13 AS INT) AS h FROM ids),
        |dg AS (SELECT DISTINCT g, w, h FROM dims),
        |px AS (SELECT dg.g, dg.w, dg.h,
        |              (ys.y * 8) // dg.h * 8 + (xs.x * 8) // dg.w AS b,
        |              (xs.x * 3 + ys.y * 5 + dg.g * 7) % 256 AS v
        |       FROM dg, generate_series(0, 32) xs(x), generate_series(0, 28) ys(y)
        |       WHERE xs.x < dg.w AND ys.y < dg.h),
        |blocks AS (SELECT g, w, h, b, sum(v) AS s, count(*) AS nb
        |           FROM px GROUP BY g, w, h, b),
        |tot AS (SELECT g, sum(v) AS tv FROM px GROUP BY g),
        |hashes AS (SELECT bl.g, bl.w, bl.h,
        |             CAST(sum(CASE WHEN bl.s * bl.w * bl.h <= t.tv * bl.nb THEN 0
        |                           WHEN bl.b = 63 THEN -9223372036854775808
        |                           ELSE (1::BIGINT << bl.b) END) AS BIGINT) AS ahash
        |           FROM blocks bl JOIN tot t USING (g) GROUP BY bl.g, bl.w, bl.h)
        |SELECT hs.ahash, hs.w, hs.h, count(*) AS n, min(dm.id) AS rep
        |FROM dims dm JOIN hashes hs USING (g)
        |GROUP BY hs.ahash, hs.w, hs.h
        |ORDER BY rep NULLS LAST""".stripMargin,
    "j16_token_stats" ->
      """SELECT lang, count(*) AS n,
        |       CAST(sum(CAST(len(string_split_regex(trim(text), '[ \t\n\r\f]+')) AS DECIMAL(18,0))) AS BIGINT) AS tokens
        |FROM documents GROUP BY lang ORDER BY lang NULLS LAST""".stripMargin,
    "j17_quality_features" ->
      """SELECT doc_id, length(text) AS n_chars2,
        |       CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |         / greatest(length(text), 1) AS alpha_ratio,
        |       CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
        |         / greatest(length(text), 1) AS punct_ratio,
        |       CAST(len(string_split_regex(trim(text), '[ \t\n\r\f]+')) AS INT) AS n_tokens
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id NULLS LAST""".stripMargin,
    "j1_dedup_exact" ->
      """SELECT count(*) AS kept FROM
        |  (SELECT min(doc_id) AS keep FROM documents GROUP BY sha256(lower(trim(text))))""".stripMargin,
    "j3_text_shingles" ->
      """SELECT doc_id, count(DISTINCT sh) AS shingles FROM
        |  (SELECT doc_id, substr(text, i, 5) AS sh
        |   FROM documents, unnest(generate_series(1, greatest(length(text)-4, 0))) AS t(i)
        |   WHERE doc_id < 50)
        |GROUP BY doc_id ORDER BY doc_id NULLS LAST""".stripMargin,
    "j4_text_tokens" ->
      """SELECT tok, count(*) AS n FROM
        |  (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
        |WHERE length(tok) > 2 GROUP BY tok ORDER BY n DESC, tok NULLS LAST LIMIT 20""".stripMargin,
    "j5_text_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
        |toks2 AS (SELECT doc_id, tok FROM toks WHERE length(tok) > 2),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks2 GROUP BY doc_id, tok),
        |df AS (SELECT tok, count(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM toks2) GROUP BY tok),
        |nd AS (SELECT count(DISTINCT doc_id) AS ndocs FROM documents)
        |SELECT doc_id, tok,
        |       round(CAST(tf AS DOUBLE) * ln(CAST(ndocs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS tfidf
        |FROM tf JOIN df USING (tok) CROSS JOIN nd
        |WHERE doc_id < 10
        |ORDER BY doc_id NULLS LAST, tfidf DESC, tok NULLS LAST LIMIT 50""".stripMargin,
    "j6_text_langstats" ->
      """SELECT lang, count(*) AS n,
        |       CAST(sum(CAST(n_chars AS DECIMAL(18,0))) AS BIGINT) AS chars
        |FROM documents GROUP BY lang ORDER BY lang NULLS LAST""".stripMargin,
    "j7_text_quality" ->
      """SELECT source, count(*) AS n,
        |       count(*) FILTER (WHERE n_chars BETWEEN 100 AND 400) AS mid,
        |       min(n_chars) mn, max(n_chars) mx
        |FROM documents GROUP BY source ORDER BY source NULLS LAST""".stripMargin,
    "j8_sim_topk" ->
      """WITH sims AS (
        |  SELECT p.vec_id AS pid, e.vec_id,
        |         list_reduce(list_transform(generate_series(1, len(p.embedding)),
        |             i -> CAST(p.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
        |             (a,x) -> a+x)
        |         / (sqrt(list_reduce(list_transform(p.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (a,x) -> a+x))
        |            * sqrt(list_reduce(list_transform(e.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (a,x) -> a+x))) AS sim
        |  FROM (SELECT * FROM embeddings WHERE vec_id < 10) p
        |  CROSS JOIN embeddings e WHERE e.vec_id <> p.vec_id)
        |SELECT pid, vec_id, rn FROM
        |  (SELECT pid, vec_id, row_number() OVER (PARTITION BY pid ORDER BY sim DESC, vec_id) rn
        |   FROM sims)
        |WHERE rn <= 5 ORDER BY pid NULLS LAST, rn NULLS LAST""".stripMargin,
    "j10_vec_norms" ->
      """SELECT vec_id,
        |       sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)),
        |                        (a,x) -> a+x)) AS l2
        |FROM embeddings ORDER BY vec_id NULLS LAST LIMIT 100""".stripMargin,
    "j13_embed_join" ->
      """SELECT label, lang, count(*) AS n FROM embeddings JOIN documents ON vec_id = doc_id
        |GROUP BY label, lang ORDER BY label NULLS LAST, lang NULLS LAST""".stripMargin,
    "j14_dedup_ngram" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(generate_series(1, greatest(length(t)-4, 1)),
        |             i -> substr(t, i, 5))) AS sh
        |  FROM (SELECT doc_id, lower(text) AS t FROM documents)),
        |pairs AS (
        |  SELECT p.doc_id AS pid, c.doc_id AS doc_id,
        |         len(list_intersect(p.sh, c.sh)) AS cc, len(p.sh) AS na, len(c.sh) AS nb
        |  FROM (SELECT * FROM sh WHERE doc_id < 10) p
        |  CROSS JOIN sh c WHERE c.doc_id <> p.doc_id)
        |SELECT pid, doc_id, rn, jaccard FROM
        |  (SELECT pid, doc_id, CAST(cc AS DOUBLE)/(na+nb-cc) AS jaccard,
        |          row_number() OVER (PARTITION BY pid
        |              ORDER BY CAST(cc AS DOUBLE)/(na+nb-cc) DESC, doc_id) rn
        |   FROM pairs)
        |WHERE rn <= 5 ORDER BY pid NULLS LAST, rn NULLS LAST""".stripMargin,
    // j32: per-distinct-token -ln rounded to 6 dp (j5's libm-ulp cap),
    // exact DECIMAL sum per doc (R2), one final IEEE division
    "j32_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
        |cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt),
        |terms AS (
        |  SELECT t.doc_id,
        |         CAST(round(-ln(CAST(c.c AS DOUBLE) / CAST((SELECT n FROM tot) AS DOUBLE)), 6)
        |              AS DECIMAL(18,6)) AS term
        |  FROM toks t JOIN cnt c USING (tok))
        |SELECT doc_id, count(*) AS ntok,
        |       CAST(sum(term) AS DOUBLE) / count(*) AS nll
        |FROM terms GROUP BY doc_id
        |ORDER BY nll DESC, doc_id NULLS LAST LIMIT 100""".stripMargin,
    "j15_dedup_cosine" ->
      """WITH n AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000)
        |SELECT a.vec_id AS va, b.vec_id AS vb,
        |       list_reduce(list_transform(generate_series(1, len(a.embedding)),
        |           i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x,y) -> x+y)
        |       / (sqrt(list_reduce(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (x,y) -> x+y))
        |          * sqrt(list_reduce(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (x,y) -> x+y))) AS sim
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |ORDER BY sim DESC, va NULLS LAST, vb NULLS LAST LIMIT 50""".stripMargin)

  /** j20–j23 sampling/sharding/mixing (graft.ops.SampleOps): the hash is
    * plain 64-bit arithmetic (SampleOps.mixBucket — three congruential
    * terms summed mod 2^32; every intermediate below 2^63), so both
    * engines compute the identical sampling decision — no engine hash
    * builtins.
    */
  private def mixSql(x: String): String =
    s"(((($x % 2147483647 + 2147483647) % 2147483647) * 2654435761) % 4294967296" +
      s" + ((($x % 2147483629 + 2147483629) % 2147483629) * 2246822519) % 4294967296" +
      s" + ((($x % 2147483587 + 2147483587) % 2147483587) * 3266489917) % 4294967296) % 4294967296"

  val samples: Map[String, String] = Map(
    // j59: integer ceil ((b+t-1) // t) capped at 4; digest Σ(doc_id²·epoch)
    "j59_epoch_budget" ->
      """WITH t AS (SELECT doc_id, source,
        |              CAST(len(string_split_regex(trim(text), '[ \t\n\r\f]+')) AS BIGINT) AS tok
        |       FROM documents WHERE text IS NOT NULL),
        |s AS (SELECT source, sum(tok) AS stoks FROM t GROUP BY source),
        |b AS (SELECT max(stoks) AS budget FROM s),
        |e AS (SELECT source, CAST(least(4, (budget + stoks - 1) // stoks) AS BIGINT) AS ep FROM s, b),
        |r AS (SELECT t.source, doc_id, tok, epoch
        |      FROM t JOIN e USING (source), unnest(generate_series(1, e.ep)) AS u(epoch))
        |SELECT source, CAST(max(epoch) AS BIGINT) AS epochs, count(*) AS n_rows,
        |       CAST(sum(tok) AS BIGINT) AS toks_replicated,
        |       CAST(sum(CAST(doc_id*doc_id*epoch AS HUGEINT)) % 1000000007 AS BIGINT) AS dmod
        |FROM r GROUP BY source ORDER BY source NULLS LAST""".stripMargin,
    // j57: u = (mix+1)/2^32 is exact in binary double (bit-identical
    // cross-engine); ln rounds at 7dp per the j51 libm convention
    "j57_weighted_sample" ->
      s"""WITH t AS (
        |  SELECT doc_id, lang, greatest(n_chars, 1) AS w,
        |         (${mixSql("(doc_id + 577001)")} + 1) / CAST(4294967296 AS DOUBLE) AS u
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id, lang, CAST(w AS BIGINT) AS w,
        |       CAST(round(ln(u) / w, 7) AS DOUBLE) AS k
        |FROM t ORDER BY round(ln(u) / w, 7) DESC, doc_id ASC LIMIT 200""".stripMargin,
    "j56_seeded_shuffle" ->
      s"""WITH t AS (
        |  SELECT doc_id, ${mixSql("(doc_id + 271829)")} AS h FROM documents),
        |s AS (SELECT doc_id, h, CAST(h % 8 AS INT) AS shard FROM t),
        |r AS (SELECT shard, row_number() OVER (PARTITION BY shard ORDER BY h ASC, doc_id ASC) AS pos,
        |             doc_id, h
        |      FROM s)
        |SELECT shard, pos, doc_id, h FROM r WHERE pos <= 25
        |ORDER BY shard NULLS LAST, pos NULLS LAST""".stripMargin,
    "j20_sample_hash" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents
        |WHERE ${mixSql("doc_id")} % 100 < 20
        |GROUP BY lang ORDER BY lang NULLS LAST""".stripMargin,
    "j21_pack_shards" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(string_split_regex(trim(text), '[ \t\n\r\f]+')) AS BIGINT) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, tok,
        |         CAST(sum(tok) OVER (ORDER BY doc_id
        |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |              AS BIGINT) AS cum
        |  FROM t)
        |SELECT (cum - tok) // 4096 AS shard,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(tok) AS BIGINT) AS toks
        |FROM c GROUP BY shard ORDER BY shard NULLS LAST""".stripMargin,
    "j24_pack_payload" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |         CAST(len(string_split_regex(trim(text), '[ \t\n\r\f]+')) AS BIGINT) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, text, tok,
        |         CAST(sum(tok) OVER (ORDER BY doc_id
        |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |              AS BIGINT) AS cum
        |  FROM t)
        |SELECT (cum - tok) // 4096 AS shard,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       md5(string_agg(text, '<DOC>' ORDER BY doc_id)) AS payload_md5
        |FROM c GROUP BY shard ORDER BY shard NULLS LAST""".stripMargin,
    "j22_mix_domains" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents
        |WHERE ${mixSql("(doc_id + 9176)")} % 1000 <
        |      CASE WHEN lang = 'en' THEN 500 WHEN lang = 'zh' THEN 300 ELSE 1000 END
        |GROUP BY lang ORDER BY lang NULLS LAST""".stripMargin,
    // j44: n and N exact longs; p one IEEE division; w rounded-at-6dp pow
    // frozen into DECIMAL so the 5-row normalizer sum is exact and
    // order-independent; q one final division of exactly-agreed values
    "j44_temperature_mix" ->
      """WITH byl AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |t AS (SELECT lang, n,
        |             CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS p
        |      FROM byl),
        |w AS (SELECT lang, n, p,
        |             CAST(round(pow(p, 0.3), 6) AS DECIMAL(18,6)) AS w FROM t)
        |SELECT lang, CAST(n AS BIGINT) AS n, p,
        |       CAST(w AS DOUBLE)
        |         / CAST(CAST(sum(w) OVER () AS DECIMAL(38,6)) AS DOUBLE) AS q
        |FROM w ORDER BY lang NULLS LAST""".stripMargin,
    // j50: fixed 2048-token sequence packing with document splitting —
    // pure integer arithmetic over the exclusive token prefix sum
    "j50_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(string_split_regex(trim(text), '[ \t\n\r\f]+')) AS BIGINT) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, tok,
        |         CAST(sum(tok) OVER (ORDER BY doc_id
        |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |              AS BIGINT) - tok AS start
        |  FROM t),
        |e AS (
        |  SELECT doc_id, tok, start,
        |         unnest(generate_series(start // 2048, (start + tok - 1) // 2048)) AS seq_id
        |  FROM c WHERE tok > 0)
        |SELECT seq_id, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(least(start + tok, (seq_id + 1) * 2048)
        |           - greatest(start, seq_id * 2048)) AS BIGINT) AS n_tokens,
        |  CAST(count(*) FILTER (WHERE start < seq_id * 2048) AS BIGINT) AS n_carried,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM e GROUP BY seq_id ORDER BY seq_id NULLS LAST""".stripMargin,
    "j23_sample_stratified" ->
      s"""SELECT lang, doc_id, rn FROM
        |  (SELECT lang, doc_id,
        |          row_number() OVER (PARTITION BY lang
        |                             ORDER BY ${mixSql("doc_id")}, doc_id) AS rn
        |   FROM documents)
        |WHERE rn <= 10 ORDER BY lang NULLS LAST, rn NULLS LAST""".stripMargin)

  val udx: Map[String, String] = Map(
    "k1_udf_scalar" ->
      """SELECT l_orderkey, l_linenumber, l_quantity * 2 + 1 AS v FROM lineitem
        |ORDER BY l_orderkey NULLS LAST, l_linenumber NULLS LAST, v NULLS LAST LIMIT 200""".stripMargin,
    "k2_udaf_sum" ->
      """SELECT o_orderstatus, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus NULLS LAST""".stripMargin,
    "k3_udtf_explode" ->
      """SELECT doc_id, count(*) AS n FROM
        |  (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |GROUP BY doc_id ORDER BY doc_id NULLS LAST LIMIT 100""".stripMargin)

  /** k5 runs the same DuckDB text as j8 — the custom Catalyst expression
    * must be bit-identical to the HOF cosine.
    */
  def k5: Map[String, String] = Map("k5_expr_cosine" -> texts("j8_sim_topk"))

  /** j27: the BPE round-trip invariant. The Spark side runs the whole
    * tokenizer (train → integer-id encode → decode → md5); DuckDB
    * recomputes the expected bytes from first principles — the encoder's
    * normalization is lowercase + whitespace-split, and a flat token
    * stream decodes to the words concatenated (no end-of-word marker) —
    * so the hashes agree iff decode∘encode is lossless over the corpus.
    */
  val bpe: Map[String, String] = Map(
    "j27_bpe_roundtrip" ->
      """SELECT doc_id,
        |  md5(array_to_string(
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0),
        |    '')) AS rt_md5
        |FROM documents ORDER BY doc_id NULLS LAST""".stripMargin,
    // j48: same reconstruction target as j27 — the unigram tokenizer's
    // decode∘encode must reproduce the concatenated normalized words;
    // the tokenizer itself has no SQL spelling, the hash gate proves it
    // lossless and covering
    "j48_unigram_roundtrip" ->
      """SELECT doc_id,
        |  md5(array_to_string(
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0),
        |    '')) AS rt_md5
        |FROM documents ORDER BY doc_id NULLS LAST""".stripMargin)

  /** j28–j30 (graft.ops.RepetitionOps): substring-level dedup coverage,
    * eval-set decontamination, Gopher-style repetition signals. All counts
    * are exact integers; fractions are single int/int→double divisions
    * (R7). Every `sum` over BIGINT is CAST back to BIGINT (R9 — DuckDB
    * widens to HUGEINT).
    */
  val repetition: Map[String, String] = Map(
    "j28_dup_substrings" ->
      """WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
        |w AS (
        |  SELECT doc_id, i AS p, substr(t, i, 30) AS w
        |  FROM d, unnest(generate_series(1, length(t)-29)) AS u(i)
        |  WHERE length(t) >= 30),
        |dup AS (SELECT w FROM w GROUP BY w HAVING count(*) >= 2),
        |dp AS (SELECT doc_id, p FROM w JOIN dup USING (w)),
        |isl AS (
        |  SELECT doc_id, p,
        |    CASE WHEN p > coalesce(max(p+30) OVER (PARTITION BY doc_id ORDER BY p
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS st
        |  FROM dp),
        |g AS (SELECT doc_id, p, sum(st) OVER (PARTITION BY doc_id ORDER BY p) AS gid FROM isl),
        |cov AS (SELECT doc_id, gid, max(p)+30-min(p) AS covered, count(*) AS nw
        |        FROM g GROUP BY doc_id, gid)
        |SELECT doc_id, CAST(sum(covered) AS BIGINT) AS dup_chars,
        |       CAST(sum(nw) AS BIGINT) AS dup_windows
        |FROM cov GROUP BY doc_id
        |ORDER BY dup_chars DESC, doc_id NULLS LAST LIMIT 100""".stripMargin,
    "j29_decontaminate" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id, array_to_string(list_slice(ws, i, i+2), ' ') AS g
        |  FROM d, unnest(generate_series(1, len(ws)-2)) AS u(i)
        |  WHERE len(ws) >= 3),
        |eg AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0)
        |SELECT doc_id, count(DISTINCT g) AS hits
        |FROM g JOIN eg USING (g)
        |WHERE doc_id % 97 <> 0
        |GROUP BY doc_id ORDER BY hits DESC, doc_id NULLS LAST LIMIT 100""".stripMargin,
    // j58: ratio-threshold contamination classes decided in exact integer
    // arithmetic; digest = Σ(doc_id²+17) mod p per class
    "j58_decontaminate_fuzzy" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id, array_to_string(list_slice(ws, i, i+2), ' ') AS g
        |  FROM d, unnest(generate_series(1, len(ws)-2)) AS u(i)
        |  WHERE len(ws) >= 3),
        |eg AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0),
        |per AS (
        |  SELECT doc_id, count(DISTINCT g.g) AS total,
        |         count(DISTINCT CASE WHEN eg.g IS NOT NULL THEN g.g END) AS hits
        |  FROM g LEFT JOIN eg ON g.g = eg.g
        |  WHERE doc_id % 97 <> 0 GROUP BY doc_id),
        |c AS (SELECT *, CASE WHEN hits * 2 > total THEN 'contaminated'
        |                     WHEN hits * 20 > total THEN 'partial'
        |                     ELSE 'clean' END AS cls FROM per)
        |SELECT cls, count(*) AS n,
        |       CAST(sum(total) AS BIGINT) AS grams,
        |       CAST(sum(hits) AS BIGINT) AS ghits,
        |       CAST(sum(CAST(doc_id * doc_id + 17 AS HUGEINT)) % 1000000007 AS BIGINT) AS dmod
        |FROM c GROUP BY cls ORDER BY cls NULLS LAST""".stripMargin,
    "j30_rep_quality" ->
      """WITH d AS (SELECT doc_id, lower(text) AS t, string_split(lower(text), ' ') AS ws
        |           FROM documents WHERE doc_id < 100),
        |g2 AS (SELECT doc_id, array_to_string(list_slice(ws, i, i+1), ' ') AS g
        |       FROM d, unnest(generate_series(1, len(ws)-1)) u(i) WHERE len(ws) >= 2),
        |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
        |t2 AS (SELECT doc_id, g, c,
        |              row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) rn FROM c2),
        |top2 AS (SELECT doc_id, g AS top_gram, c*length(g) AS chars2 FROM t2 WHERE rn = 1),
        |g5 AS (SELECT doc_id, array_to_string(list_slice(ws, i, i+4), ' ') AS g
        |       FROM d, unnest(generate_series(1, len(ws)-4)) u(i) WHERE len(ws) >= 5),
        |c5 AS (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY doc_id, g),
        |dup5 AS (SELECT doc_id,
        |                CAST(coalesce(sum(CASE WHEN c >= 2 THEN c*length(g) END), 0) AS BIGINT)
        |                  AS dup5_chars
        |         FROM c5 GROUP BY doc_id)
        |SELECT d.doc_id, top_gram, CAST(chars2 AS DOUBLE)/length(t) AS top2_frac,
        |       dup5_chars, CAST(dup5_chars AS DOUBLE)/length(t) AS dup5_frac
        |FROM d LEFT JOIN top2 USING (doc_id) LEFT JOIN dup5 USING (doc_id)
        |ORDER BY doc_id NULLS LAST""".stripMargin,
    // j45: fixed-width 8-word chunks tile each document; keep the global
    // first occurrence of each chunk text ((doc_id, seg) order); the md5
    // pins the reassembled text, NULL when nothing survives
    "j45_dedup_paragraphs" ->
      """WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |seg AS (
        |  SELECT doc_id, CAST((i-1)//8 AS BIGINT) AS seg,
        |         array_to_string(list_slice(ws, ((i-1)//8)*8+1, ((i-1)//8)*8+8), ' ') AS chunk
        |  FROM ws, unnest(generate_series(1, len(ws))) AS u(i)
        |  WHERE (i-1) % 8 = 0),
        |r AS (SELECT doc_id, seg, chunk,
        |             row_number() OVER (PARTITION BY chunk
        |                 ORDER BY doc_id NULLS LAST, seg NULLS LAST) AS rn
        |      FROM seg)
        |SELECT doc_id, count(*) AS n_chunks,
        |       CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
        |       md5(string_agg(chunk, ' ' ORDER BY seg) FILTER (WHERE rn = 1)) AS clean_md5
        |FROM r GROUP BY doc_id ORDER BY doc_id NULLS LAST""".stripMargin,
    "j31_dedup_cut" ->
      """WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
        |w AS (
        |  SELECT doc_id, i AS p, substr(t, i, 30) AS w
        |  FROM d, unnest(generate_series(1, length(t)-29)) AS u(i)
        |  WHERE length(t) >= 30),
        |r AS (
        |  SELECT doc_id, p,
        |         count(*) OVER (PARTITION BY w) AS c,
        |         row_number() OVER (PARTITION BY w ORDER BY doc_id, p) AS rk
        |  FROM w),
        |dp AS (SELECT doc_id, p FROM r WHERE c >= 2 AND rk > 1),
        |isl AS (
        |  SELECT doc_id, p,
        |    CASE WHEN p > coalesce(max(p+30) OVER (PARTITION BY doc_id ORDER BY p
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS st
        |  FROM dp),
        |g AS (SELECT doc_id, p, sum(st) OVER (PARTITION BY doc_id ORDER BY p) AS gid FROM isl),
        |cov AS (SELECT doc_id, gid, min(p) AS s, max(p)+30 AS e FROM g GROUP BY doc_id, gid),
        |seg AS (
        |  SELECT doc_id,
        |         coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 1) AS ks,
        |         s AS ke
        |  FROM cov
        |  UNION ALL
        |  SELECT doc_id, max(e) AS ks, NULL AS ke FROM cov GROUP BY doc_id),
        |pieces AS (
        |  SELECT seg.doc_id, ks,
        |         CASE WHEN ke IS NULL THEN substr(t, ks)
        |              ELSE substr(t, ks, ke-ks) END AS piece
        |  FROM seg JOIN d ON seg.doc_id = d.doc_id),
        |cleaned AS (
        |  SELECT doc_id, string_agg(piece, '' ORDER BY ks) AS ct
        |  FROM pieces GROUP BY doc_id)
        |SELECT d.doc_id,
        |       CAST(coalesce(length(ct), length(t)) AS BIGINT) AS clean_len,
        |       md5(coalesce(ct, t)) AS clean_md5
        |FROM d LEFT JOIN cleaned USING (doc_id)
        |ORDER BY doc_id NULLS LAST""".stripMargin)

  /** Ranked retrieval + sketch-path queries (j35–j37). The j36/j37
    * oracles are deliberately SKETCH-FREE: the Spark twins reach the
    * same exact answer through a bloom / count-min prefilter, and the
    * hash gate proves the sketch layer is semantically transparent.
    */
  val rankSketch: Map[String, String] = Map(
    "j35_bm25_topk" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS toktot FROM dl),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |q AS (SELECT doc_id AS qid, tok FROM tf WHERE doc_id % 125 = 0 AND doc_id < 50000 AND length(tok) >= 6),
        |terms AS (
        |  SELECT q.qid, tf.doc_id,
        |         CAST(round(
        |           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
        |                    / (CAST(df.df AS DOUBLE) + 0.5))
        |           * ((CAST(tf.tf AS DOUBLE) * 2.2)
        |              / (CAST(tf.tf AS DOUBLE)
        |                 + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
        |                          / (CAST(s.toktot AS DOUBLE) / CAST(s.n_docs AS DOUBLE)))))),
        |           6) AS DECIMAL(18,6)) AS contrib
        |  FROM tf JOIN q USING (tok) JOIN dl ON tf.doc_id = dl.doc_id
        |       JOIN df USING (tok) CROSS JOIN stats s),
        |scored AS (
        |  SELECT qid, doc_id, CAST(CAST(sum(contrib) AS DECIMAL(38,6)) AS DOUBLE) AS score
        |  FROM terms GROUP BY qid, doc_id),
        |r AS (SELECT qid, doc_id, score,
        |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rnk
        |      FROM scored)
        |SELECT qid, rnk, doc_id, score FROM r WHERE rnk <= 10
        |ORDER BY qid NULLS LAST, rnk NULLS LAST""".stripMargin,
    // j42 recomputes both legs independently: the j35 BM25 chain (self-
    // excluded, top-20) and the j8 cosine fold over embeddings (probes
    // ≡ 0 mod 125, self-excluded, top-20), fused by 1/(60+rank) with a
    // FULL JOIN carrying single-list rows (USING coalesces the keys)
    "j42_rrf_fusion" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS toktot FROM dl),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |q AS (SELECT doc_id AS qid, tok FROM tf WHERE doc_id % 125 = 0 AND doc_id < 50000 AND length(tok) >= 6),
        |terms AS (
        |  SELECT q.qid, tf.doc_id,
        |         CAST(round(
        |           ln(1.0 + (CAST(s.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
        |                    / (CAST(df.df AS DOUBLE) + 0.5))
        |           * ((CAST(tf.tf AS DOUBLE) * 2.2)
        |              / (CAST(tf.tf AS DOUBLE)
        |                 + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
        |                          / (CAST(s.toktot AS DOUBLE) / CAST(s.n_docs AS DOUBLE)))))),
        |           6) AS DECIMAL(18,6)) AS contrib
        |  FROM tf JOIN q USING (tok) JOIN dl ON tf.doc_id = dl.doc_id
        |       JOIN df USING (tok) CROSS JOIN stats s),
        |scored AS (
        |  SELECT qid, doc_id, CAST(CAST(sum(contrib) AS DECIMAL(38,6)) AS DOUBLE) AS score
        |  FROM terms WHERE doc_id <> qid GROUP BY qid, doc_id),
        |lex AS (
        |  SELECT qid, doc_id, lrnk FROM (
        |    SELECT qid, doc_id,
        |           row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS lrnk
        |    FROM scored) WHERE lrnk <= 20),
        |sims AS (
        |  SELECT p.vec_id AS qid, e.vec_id AS doc_id,
        |         list_reduce(list_transform(generate_series(1, len(p.embedding)),
        |             i -> CAST(p.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
        |             (a,x) -> a+x)
        |         / (sqrt(list_reduce(list_transform(p.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (a,x) -> a+x))
        |            * sqrt(list_reduce(list_transform(e.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (a,x) -> a+x))) AS sim
        |  FROM (SELECT * FROM embeddings WHERE vec_id % 125 = 0 AND vec_id < 50000) p
        |  CROSS JOIN embeddings e WHERE e.vec_id <> p.vec_id),
        |sem AS (
        |  SELECT qid, doc_id, srnk FROM (
        |    SELECT qid, doc_id,
        |           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, doc_id) AS srnk
        |    FROM sims) WHERE srnk <= 20),
        |fused AS (
        |  SELECT qid, doc_id,
        |         coalesce(CAST(1.0 AS DOUBLE) / (60 + lrnk), CAST(0.0 AS DOUBLE))
        |           + coalesce(CAST(1.0 AS DOUBLE) / (60 + srnk), CAST(0.0 AS DOUBLE)) AS rrf
        |  FROM lex FULL JOIN sem USING (qid, doc_id)),
        |r AS (SELECT qid, doc_id, rrf,
        |             row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS frnk
        |      FROM fused)
        |SELECT qid, frnk, doc_id, rrf FROM r WHERE frnk <= 10
        |ORDER BY qid NULLS LAST, frnk NULLS LAST""".stripMargin,
    "j36_decontaminate_bloom" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id, array_to_string(list_slice(ws, i, i+3), ' ') AS g
        |  FROM d, unnest(generate_series(1, len(ws)-3)) AS u(i)
        |  WHERE len(ws) >= 4),
        |eg AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0)
        |SELECT doc_id, count(DISTINCT g) AS hits
        |FROM g JOIN eg USING (g)
        |WHERE doc_id % 97 <> 0
        |GROUP BY doc_id ORDER BY hits DESC, doc_id NULLS LAST LIMIT 100""".stripMargin,
    // j46: the sketch-free spelling of the incremental dedup — the bloom
    // layer must be semantically transparent (no false negatives; the
    // anti-join kills false positives), so the oracle never mentions it
    "j46_dedup_incremental" ->
      """WITH d AS (SELECT doc_id, text FROM documents),
        |inc AS (
        |  SELECT doc_id + 1000000 AS doc_id, text FROM d WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, text || ' fresh ' || CAST(doc_id AS VARCHAR)
        |  FROM d WHERE doc_id % 7 = 3
        |  UNION ALL
        |  SELECT doc_id + 3000000, text || ' fresh ' || CAST(doc_id AS VARCHAR)
        |  FROM d WHERE doc_id % 14 = 3),
        |ex AS (SELECT DISTINCT md5(lower(trim(text))) AS h FROM d),
        |ih AS (SELECT doc_id, md5(lower(trim(text))) AS h FROM inc),
        |surv AS (SELECT doc_id, h FROM ih
        |         WHERE h NOT IN (SELECT h FROM ex)),
        |f AS (SELECT doc_id, h,
        |             row_number() OVER (PARTITION BY h
        |                 ORDER BY doc_id NULLS LAST) AS rn
        |      FROM surv)
        |SELECT doc_id, h FROM f WHERE rn = 1 ORDER BY doc_id NULLS LAST""".stripMargin,
    "j38_connected_components" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, lower(text) AS t FROM documents WHERE doc_id < 2000),
        |w AS (
        |  SELECT doc_id, substr(t, i, 30) AS w
        |  FROM d, unnest(generate_series(1, length(t)-29)) AS u(i)
        |  WHERE length(t) >= 30),
        |dw AS (SELECT DISTINCT doc_id, w FROM w),
        |wc AS (SELECT w, count(*) AS c FROM dw GROUP BY w),
        |sel AS (SELECT w FROM wc WHERE c BETWEEN 2 AND 4),
        |e0 AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
        |       FROM dw a JOIN dw b USING (w) JOIN sel USING (w)
        |       WHERE a.doc_id < b.doc_id),
        |edges AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
        |verts AS (SELECT DISTINCT a AS v FROM edges),
        |reach AS (
        |  SELECT v AS a, v AS b FROM verts
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
        |SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a
        |ORDER BY doc_id NULLS LAST""".stripMargin,
    // j63: the dedup savings report — the j38 closure extended with doc
    // lengths; canonical = component min, so can_len needs no argmin.
    // All-integer output (sums CAST to BIGINT per R9)
    "j63_dedup_report" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, lower(text) AS t FROM documents WHERE doc_id < 2000),
        |w AS (
        |  SELECT doc_id, substr(t, i, 30) AS w
        |  FROM d, unnest(generate_series(1, length(t)-29)) AS u(i)
        |  WHERE length(t) >= 30),
        |dw AS (SELECT DISTINCT doc_id, w FROM w),
        |wc AS (SELECT w, count(*) AS c FROM dw GROUP BY w),
        |sel AS (SELECT w FROM wc WHERE c BETWEEN 2 AND 4),
        |e0 AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
        |       FROM dw a JOIN dw b USING (w) JOIN sel USING (w)
        |       WHERE a.doc_id < b.doc_id),
        |edges AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
        |verts AS (SELECT DISTINCT a AS v FROM edges),
        |reach AS (
        |  SELECT v AS a, v AS b FROM verts
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |comp AS (SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a),
        |sized AS (SELECT comp.doc_id, comp.component, length(d2.text) AS len
        |          FROM comp JOIN documents d2 USING (doc_id)),
        |pc AS (SELECT component, count(*) AS sz, sum(len) AS chars
        |       FROM sized GROUP BY 1),
        |can AS (SELECT component, len AS can_len FROM sized WHERE doc_id = component)
        |SELECT sz AS cluster_size, count(*) AS n_clusters,
        |  CAST(sum(sz - 1) AS BIGINT) AS docs_removable,
        |  CAST(sum(chars - can_len) AS BIGINT) AS chars_removable
        |FROM pc JOIN can USING (component)
        |GROUP BY 1 ORDER BY 1 NULLS LAST""".stripMargin,
    // j66: dedup-aware leakage-safe split — the j38 closure's labels
    // (singletons = own doc_id), split = portable md5-60 of the cluster
    // id string mod 10 (0-7 train, 8 val, 9 test); per-split exact
    // doc/char/cluster counts. The leakage property (edge endpoints
    // share a split) is DedupSpec's structural pin.
    "j66_split_leakage_safe" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, lower(text) AS t FROM documents WHERE doc_id < 2000),
        |w AS (
        |  SELECT doc_id, substr(t, i, 30) AS w
        |  FROM d, unnest(generate_series(1, length(t)-29)) AS u(i)
        |  WHERE length(t) >= 30),
        |dw AS (SELECT DISTINCT doc_id, w FROM w),
        |wc AS (SELECT w, count(*) AS c FROM dw GROUP BY w),
        |sel AS (SELECT w FROM wc WHERE c BETWEEN 2 AND 4),
        |e0 AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
        |       FROM dw a JOIN dw b USING (w) JOIN sel USING (w)
        |       WHERE a.doc_id < b.doc_id),
        |edges AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
        |verts AS (SELECT DISTINCT a AS v FROM edges),
        |reach AS (
        |  SELECT v AS a, v AS b FROM verts
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |comp AS (SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a),
        |asg AS (
        |  SELECT dd.doc_id, length(dd.text) AS len,
        |         COALESCE(comp.component, dd.doc_id) AS cluster_id
        |  FROM documents dd LEFT JOIN comp USING (doc_id)
        |  WHERE dd.doc_id < 2000),
        |spl AS (
        |  SELECT *,
        |    CASE WHEN bkt <= 7 THEN 'train' WHEN bkt = 8 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM (SELECT *,
        |          ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15))::BIGINT % 10 AS bkt
        |        FROM asg))
        |SELECT split, count(*) AS n_docs,
        |  CAST(sum(len) AS BIGINT) AS n_chars,
        |  CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters
        |FROM spl GROUP BY 1 ORDER BY 1 NULLS LAST""".stripMargin,
    // j64: quality-ranked canonical per duplicate cluster — the j38
    // closure + argmax by (len DESC, doc_id ASC) over clusters of size
    // >= 2; all-integer, fully tiebroken
    "j64_dedup_canonical" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, lower(text) AS t FROM documents WHERE doc_id < 2000),
        |w AS (
        |  SELECT doc_id, substr(t, i, 30) AS w
        |  FROM d, unnest(generate_series(1, length(t)-29)) AS u(i)
        |  WHERE length(t) >= 30),
        |dw AS (SELECT DISTINCT doc_id, w FROM w),
        |wc AS (SELECT w, count(*) AS c FROM dw GROUP BY w),
        |sel AS (SELECT w FROM wc WHERE c BETWEEN 2 AND 4),
        |e0 AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
        |       FROM dw a JOIN dw b USING (w) JOIN sel USING (w)
        |       WHERE a.doc_id < b.doc_id),
        |edges AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
        |verts AS (SELECT DISTINCT a AS v FROM edges),
        |reach AS (
        |  SELECT v AS a, v AS b FROM verts
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |comp AS (SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a),
        |sized AS (SELECT comp.doc_id, comp.component,
        |                 CAST(length(d2.text) AS BIGINT) AS len
        |          FROM comp JOIN documents d2 USING (doc_id)),
        |rk AS (SELECT component, doc_id, len,
        |         row_number() OVER (PARTITION BY component
        |                            ORDER BY len DESC, doc_id ASC) AS rn,
        |         count(*) OVER (PARTITION BY component) AS sz
        |       FROM sized)
        |SELECT component AS cluster_id, doc_id AS canonical_doc,
        |       len AS can_len, sz AS n_docs
        |FROM rk WHERE rn = 1 AND sz >= 2
        |ORDER BY cluster_id NULLS LAST""".stripMargin,
    "j39_simhash_portable" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        |  FROM documents WHERE doc_id < 2000),
        |th AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
        |hl AS (SELECT doc_id, list(h) AS hs FROM th GROUP BY doc_id)
        |SELECT doc_id,
        |  CAST(list_sum(list_transform(generate_series(0, 59),
        |    b -> CASE WHEN 2 * len(list_filter(hs, h -> ((h >> b) & 1) = 1)) >= len(hs)
        |              THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS simhash
        |FROM hl ORDER BY doc_id NULLS LAST""".stripMargin,
    "j40_minhash_portable" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, tok FROM (
        |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        |    FROM documents WHERE doc_id < 2000)),
        |th AS (
        |  SELECT doc_id, i,
        |         ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || tok), 1, 15))::BIGINT AS h
        |  FROM toks, unnest(generate_series(0, 15)) AS u(i)),
        |mh AS (SELECT doc_id, i, min(h) AS m FROM th GROUP BY doc_id, i)
        |SELECT doc_id,
        |       md5(string_agg(CAST(m AS VARCHAR), ',' ORDER BY i)) AS sig_md5
        |FROM mh GROUP BY doc_id ORDER BY doc_id NULLS LAST""".stripMargin,
    // j61: exact n-gram Jaccard verify — |A∩B| / (|A|+|B|−|A∩B|) over
    // distinct 5-char shingles, recomputed from first principles (substr
    // explosion); one final IEEE division of exact integer counts (R4)
    "j61_jaccard_verify" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        |           WHERE doc_id <= 200 AND length(text) >= 5),
        |sh AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS sh
        |       FROM d, unnest(generate_series(1, greatest(length(text)-4, 0))) AS t(i)),
        |pairs AS (SELECT a.doc_id AS a, b.doc_id AS b
        |          FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
        |          WHERE a.doc_id < 200),
        |inter AS (SELECT p.a, p.b, count(*) AS i
        |          FROM pairs p
        |          JOIN sh x ON x.doc_id = p.a
        |          JOIN sh y ON y.doc_id = p.b AND y.sh = x.sh
        |          GROUP BY p.a, p.b),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
        |SELECT p.a AS a, p.b AS b,
        |       round(CAST(coalesce(i.i, 0) AS DOUBLE)
        |             / (na.n + nb.n - coalesce(i.i, 0)), 6) AS jaccard
        |FROM pairs p
        |JOIN sizes na ON na.doc_id = p.a
        |JOIN sizes nb ON nb.doc_id = p.b
        |LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
        |ORDER BY p.a NULLS LAST""".stripMargin,
    "j37_heavy_hitters" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |g AS (
        |  SELECT array_to_string(list_slice(ws, i, i+1), ' ') AS g
        |  FROM d, unnest(generate_series(1, len(ws)-1)) AS u(i)
        |  WHERE len(ws) >= 2),
        |tot AS (SELECT count(*) AS total FROM g)
        |SELECT g, count(*) AS c FROM g GROUP BY g
        |HAVING count(*) >= greatest(2, (SELECT total FROM tot) // 2000)
        |ORDER BY c DESC, g NULLS LAST LIMIT 100""".stripMargin)

  /** j47: the WHOLE curation DAG recomputed sketch-free — admit (j46's
    * NOT IN + keep-first), paragraph dedup (j45's chunk keep-first +
    * reassembly), PII scrub (j34's redaction chain over the planted
    * dirty tails), LM filter (j43's nll recipe + ANSI ntile decile
    * drop), temperature mix (j44's q over the survivor distribution,
    * applied at rate (q/p)/max(q/p) through the shared hash coin), pack
    * (j21/j24's cumsum shards + payload digests). Every stage boundary
    * the Spark side crosses with a sketch/distributed form (banded
    * bloom, distributedNtile, distributedCumsum) must be invisible
    * here.
    */
  val curate: Map[String, String] = Map(
    "j47_curate_e2e" ->
      s"""WITH d AS (SELECT doc_id, lang, text FROM documents),
        |inc AS (
        |  SELECT doc_id + 1000000 AS doc_id, lang, text FROM d WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, lang, text || ' fresh ' || CAST(doc_id AS VARCHAR)
        |  FROM d WHERE doc_id % 7 = 3
        |  UNION ALL
        |  SELECT doc_id + 3000000, lang, text || ' fresh ' || CAST(doc_id AS VARCHAR)
        |  FROM d WHERE doc_id % 14 = 3),
        |ex AS (SELECT DISTINCT md5(lower(trim(text))) AS h FROM d),
        |ih AS (SELECT doc_id, lang, text, md5(lower(trim(text))) AS h FROM inc),
        |sv AS (SELECT doc_id, lang, text, h,
        |              row_number() OVER (PARTITION BY h
        |                  ORDER BY doc_id NULLS LAST) AS rn
        |       FROM ih WHERE h NOT IN (SELECT h FROM ex)),
        |adm AS (SELECT doc_id, lang,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR)
        |    || '@mail.example.com or admin@test.org from '
        |    || CAST(doc_id % 256 AS VARCHAR) || '.10.'
        |    || CAST(doc_id % 100 AS VARCHAR) || '.7 call +1-555-'
        |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
        |  FROM sv WHERE rn = 1),
        |u AS (SELECT * FROM d UNION ALL SELECT * FROM adm),
        |ws AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM u),
        |seg AS (
        |  SELECT doc_id, CAST((i-1)//8 AS BIGINT) AS seg,
        |         array_to_string(list_slice(ws, ((i-1)//8)*8+1, ((i-1)//8)*8+8), ' ') AS chunk
        |  FROM ws, unnest(generate_series(1, len(ws))) AS t1(i)
        |  WHERE (i-1) % 8 = 0),
        |r AS (SELECT doc_id, seg, chunk,
        |             row_number() OVER (PARTITION BY chunk
        |                 ORDER BY doc_id NULLS LAST, seg NULLS LAST) AS rn
        |      FROM seg),
        |scr AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(
        |        string_agg(chunk, ' ' ORDER BY seg),
        |        '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
        |        '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
        |        '\\+1-555-\\d{4}', '<PHONE>', 'g') AS text
        |  FROM r WHERE rn = 1 GROUP BY doc_id),
        |ws2 AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM scr),
        |pairs AS (
        |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
        |  FROM ws2, unnest(generate_series(1, len(ws) - 1)) AS t2(i)
        |  WHERE len(ws) >= 2),
        |cnt AS (SELECT w1, w2, count(*) AS c FROM pairs GROUP BY w1, w2),
        |model AS (SELECT w1, w2, c, sum(c) OVER (PARTITION BY w1) AS ctx FROM cnt),
        |dtf AS (SELECT doc_id, w1, w2, count(*) AS k FROM pairs GROUP BY doc_id, w1, w2),
        |sc AS (
        |  SELECT doc_id, k,
        |         CAST(round(-ln(CAST(c AS DOUBLE) / CAST(ctx AS DOUBLE)), 6)
        |              AS DECIMAL(18,6)) AS t
        |  FROM dtf JOIN model USING (w1, w2)),
        |nl AS (
        |  SELECT doc_id,
        |         CAST(CAST(sum(t * k) AS DECIMAL(38,6)) AS DOUBLE)
        |           / CAST(sum(k) AS DOUBLE) AS nll
        |  FROM sc GROUP BY doc_id),
        |bk AS (SELECT doc_id,
        |              ntile(10) OVER (ORDER BY nll NULLS LAST, doc_id NULLS LAST) AS tile
        |       FROM nl),
        |kept AS (
        |  SELECT s.doc_id, s.text, u.lang
        |  FROM bk JOIN scr s USING (doc_id) JOIN u USING (doc_id)
        |  WHERE tile <= 9),
        |byl AS (SELECT lang, count(*) AS n FROM kept GROUP BY lang),
        |pt AS (SELECT lang, CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS p FROM byl),
        |wt AS (SELECT lang, p, CAST(round(pow(p, 0.3), 6) AS DECIMAL(18,6)) AS w FROM pt),
        |qt AS (SELECT lang, p,
        |              CAST(w AS DOUBLE)
        |                / CAST(CAST(sum(w) OVER () AS DECIMAL(38,6)) AS DOUBLE) AS q
        |       FROM wt),
        |rt AS (SELECT lang, q / p AS rate FROM qt),
        |cutt AS (SELECT lang,
        |                CAST(floor(rate / max(rate) OVER () * 1000000) AS BIGINT) AS cut
        |         FROM rt),
        |mixed AS (
        |  SELECT k.doc_id, k.text FROM kept k JOIN cutt USING (lang)
        |  WHERE ${mixSql("(k.doc_id + 4242)")} % 1000000 < cut),
        |tok AS (
        |  SELECT doc_id, text,
        |         CAST(len(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+')) AS BIGINT) AS tok
        |  FROM mixed),
        |cm AS (
        |  SELECT doc_id, text, tok,
        |         CAST(sum(tok) OVER (ORDER BY doc_id
        |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |              AS BIGINT) AS cum
        |  FROM tok)
        |SELECT (cum - tok) // 4096 AS shard,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(tok) AS BIGINT) AS toks,
        |       md5(string_agg(text, '<DOC>' ORDER BY doc_id)) AS payload_md5
        |FROM cm GROUP BY shard ORDER BY shard NULLS LAST""".stripMargin)

  // j60: char-bigram Naive Bayes langid, gated as an exact confusion
  // matrix. Every profile log-prob is one IEEE division + one ln,
  // round(,6)'d into DECIMAL(18,6) (the j32 recipe), so per-doc scores
  // are EXACT decimal sums — order- and engine-independent — and the
  // argmax (score DESC, candidate ASC) is bit-stable.
  val langid: Map[String, String] = Map(
    "j60_langid" ->
      """WITH d AS (SELECT doc_id, lang, lower(text) t FROM documents
        |           WHERE length(lower(text)) >= 2),
        |bg AS (SELECT doc_id, lang, substr(t, CAST(i AS INTEGER), 2) g
        |       FROM d, unnest(range(1, length(t))) AS u(i)),
        |cnt AS (SELECT lang, g, count(*) c FROM bg GROUP BY 1, 2),
        |tot AS (SELECT lang, count(*) nl FROM bg GROUP BY 1),
        |voc AS (SELECT count(DISTINCT g) v FROM bg),
        |prof AS (SELECT c.lang, c.g,
        |           CAST(round(ln((c.c + 1) / CAST(t.nl + v.v AS DOUBLE)), 6)
        |                AS DECIMAL(18,6)) logp
        |         FROM cnt c JOIN tot t ON c.lang = t.lang CROSS JOIN voc v),
        |dflt AS (SELECT t.lang,
        |           CAST(round(ln(1 / CAST(t.nl + v.v AS DOUBLE)), 6)
        |                AS DECIMAL(18,6)) logp0
        |         FROM tot t CROSS JOIN voc v),
        |langs AS (SELECT DISTINCT lang cand FROM d),
        |dgc AS (SELECT doc_id, g, count(*) k FROM bg GROUP BY 1, 2),
        |sc AS (SELECT dg.doc_id, l.cand,
        |         sum(CAST(dg.k AS DECIMAL(10,0)) * coalesce(p.logp, df.logp0)) score
        |       FROM dgc dg CROSS JOIN langs l
        |       LEFT JOIN prof p ON p.lang = l.cand AND p.g = dg.g
        |       JOIN dflt df ON df.lang = l.cand
        |       GROUP BY 1, 2),
        |pred AS (SELECT doc_id, cand,
        |           row_number() OVER (PARTITION BY doc_id
        |                              ORDER BY score DESC, cand) rn
        |         FROM sc)
        |SELECT d2.lang, p.cand AS pred, count(*) AS n
        |FROM (SELECT doc_id, cand FROM pred WHERE rn = 1) p
        |JOIN (SELECT doc_id, lang FROM d) d2 USING (doc_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  /** a25/a26 shared replica CTEs: `c` is the cells view carrying the
    * value as exact integer cents (no floating rendering anywhere) plus
    * the key arithmetic; `t` is the deterministic replica drift (drops /
    * +7-cent corruptions / extra x_repl cells, odd region buckets only —
    * SF-relative, so the drift is non-vacuous and even ranges stay clean
    * at every fixture SF) — ReplicaOps.tgtCells's exact arithmetic.
    */
  private val replicaCtes: String =
    s"""WITH c AS (
       |  SELECT concat(lpad(CAST(user_id AS VARCHAR), 12, '0'), ':',
       |                lpad(CAST(event_id AS VARCHAR), 12, '0')) AS rowkey,
       |         'e' AS cf, event_type AS qualifier,
       |         CAST(epoch_us(ts) AS BIGINT) AS ts,
       |         CASE WHEN event_id % 97 = 0 THEN 'delete' ELSE 'put' END AS op,
       |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
       |         user_id, event_id,
       |         ($regionBucketCase) % 2 = 1 AS drift
       |  FROM events),
       |t AS (
       |  SELECT rowkey, cf, qualifier, ts, op,
       |         CASE WHEN drift AND event_id % 103 = 0
       |              THEN cents + 7 ELSE cents END AS cents, user_id
       |  FROM c WHERE NOT (drift AND event_id % 101 = 0)
       |  UNION ALL
       |  SELECT rowkey, cf, 'x_repl', ts + 1, op, cents + 1, user_id
       |  FROM c WHERE drift AND event_id % 107 = 0)
       |""".stripMargin

  private val replica: Map[String, String] = Map(
    // a25: VerifyReplication counters — full outer on the complete cell
    // coordinate (unique per cell), null-safe content compare
    "a25_verify_replication" ->
      (replicaCtes +
        """SELECT category, count(*) AS n FROM (
          |  SELECT CASE WHEN s.op IS NULL THEN 'ONLY_IN_TARGET'
          |              WHEN t.op IS NULL THEN 'ONLY_IN_SOURCE'
          |              WHEN s.cents IS NOT DISTINCT FROM t.cents
          |               AND s.op IS NOT DISTINCT FROM t.op THEN 'GOODROWS'
          |              ELSE 'CONTENT_DIFFERENT' END AS category
          |  FROM c s FULL OUTER JOIN t
          |    ON s.rowkey = t.rowkey AND s.cf = t.cf
          |   AND s.qualifier = t.qualifier AND s.ts = t.ts)
          |GROUP BY category ORDER BY category NULLS LAST""".stripMargin),
    // a26: SyncTable range plan — per-range commutative hash = sum of
    // per-cell md5-60 fingerprints (exact HUGEINT) mod 1e9+7, the a17
    // digest recipe; integer-cents rendering keeps the strings portable
    "a26_sync_ranges" ->
      (replicaCtes.stripSuffix("\n") +
        s""",
           |sm AS (SELECT $regionBucketCase AS range_id, count(*) AS n,
           |         CAST(sum(CAST(('0x' || substr(md5(rowkey || '#' || cf || '#' ||
           |             qualifier || '#' || CAST(ts AS VARCHAR) || '#' ||
           |             CAST(cents AS VARCHAR) || '#' || op), 1, 15))::BIGINT
           |           AS HUGEINT)) % 1000000007 AS BIGINT) AS h
           |       FROM c GROUP BY 1),
           |tm AS (SELECT $regionBucketCase AS range_id, count(*) AS n,
           |         CAST(sum(CAST(('0x' || substr(md5(rowkey || '#' || cf || '#' ||
           |             qualifier || '#' || CAST(ts AS VARCHAR) || '#' ||
           |             CAST(cents AS VARCHAR) || '#' || op), 1, 15))::BIGINT
           |           AS HUGEINT)) % 1000000007 AS BIGINT) AS h
           |       FROM t GROUP BY 1)
           |SELECT COALESCE(sm.range_id, tm.range_id) AS range_id,
           |       COALESCE(sm.n, 0) AS n_src, COALESCE(tm.n, 0) AS n_tgt,
           |       sm.h AS h_src, tm.h AS h_tgt,
           |       CASE WHEN sm.n IS NOT DISTINCT FROM tm.n
           |             AND sm.h IS NOT DISTINCT FROM tm.h
           |            THEN 'ok' ELSE 'sync' END AS action
           |FROM sm FULL OUTER JOIN tm ON sm.range_id = tm.range_id
           |ORDER BY range_id NULLS LAST""".stripMargin))

  def all: Map[String, String] =
    scans ++ filters ++ joins ++ aggs ++ sortSets ++ windows ++ fns ++ texts ++
      samples ++ udx ++ k5 ++ bpe ++ repetition ++ rankSketch ++ curate ++
      langid ++ replica
}
