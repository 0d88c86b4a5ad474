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
      |         CAST(epoch_ns(ts) AS BIGINT) AS ts,
      |         value AS value,
      |         CASE WHEN event_id % 97 = 0 THEN 'delete' ELSE 'put' END AS op
      |  FROM events)
      |""".stripMargin

  private def dsum(e: String): String =
    s"CAST(sum(CAST($e AS DECIMAL(18,2))) AS DECIMAL(38,2))"

  val scans: Map[String, String] = Map(
    "a1_scan_parquet" ->
      s"SELECT count(*) AS n, ${dsum("l_quantity")} AS qsum FROM lineitem",
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
          |   FROM cells WHERE ts <= 1705362487499628968)
          |WHERE rn = 1 ORDER BY rowkey NULLS LAST, qualifier NULLS LAST LIMIT 500""".stripMargin))

  val filters: Map[String, String] = Map(
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
        |WHERE CAST(epoch_ns(ts) AS BIGINT) BETWEEN 1704500000000000000 AND 1705500000000000000
        |GROUP BY event_type ORDER BY event_type NULLS LAST""".stripMargin,
    "b11_qualifier_filter" ->
      (cellsCte + "SELECT count(*) AS n FROM cells WHERE qualifier LIKE 'c%'"),
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
      s"SELECT count(*) AS n, ${dsum("o_totalprice")} AS checksum FROM orders")

  val aggs: Map[String, String] = Map(
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
        |  sqrt((CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |        - CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |          * CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*))
        |       / (count(*) - 1)) AS sd
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
        |                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(38,2)) AS spend,
        |       count(*) FILTER (WHERE event_type='error') AS errors
        |FROM events GROUP BY user_id ORDER BY user_id NULLS LAST LIMIT 200""".stripMargin,
    "d13_hbase_increment" ->
      (cellsCte +
        s"""SELECT rowkey, ${dsum("value")} AS counter
           |FROM cells WHERE op='put' GROUP BY rowkey ORDER BY rowkey NULLS LAST LIMIT 300""".stripMargin),
    "d14_hbase_append" ->
      (cellsCte +
        """SELECT rowkey, array_to_string(list_sort(list(qualifier)), ',') AS appended
          |FROM cells GROUP BY rowkey ORDER BY rowkey NULLS LAST LIMIT 300""".stripMargin))

  val sortSets: Map[String, String] = Map(
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
      """SELECT k FROM (SELECT n_nationkey k FROM nation EXCEPT SELECT c_nationkey FROM customer)
        |ORDER BY k NULLS LAST""".stripMargin,
    "g5_intersect_all" ->
      """SELECT count(*) AS n FROM
        |  (SELECT o_orderstatus FROM orders WHERE o_orderkey % 2 = 0
        |   INTERSECT ALL SELECT o_orderstatus FROM orders WHERE o_orderkey % 3 = 0)""".stripMargin,
    "g6_except_all" ->
      """SELECT count(*) AS n FROM
        |  (SELECT o_orderstatus FROM orders WHERE o_orderkey % 2 = 0
        |   EXCEPT ALL SELECT o_orderstatus FROM orders WHERE o_orderkey % 3 = 0)""".stripMargin)

  val joins: Map[String, String] = Map(
    "c1_join_inner" ->
      """SELECT c_mktsegment, count(*) AS n,
         |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
         |                 * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(38,4)) AS rev
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
        |          max(CASE WHEN event_type = 'click' THEN CAST(epoch_ns(ts) AS BIGINT) END)
        |            OVER (PARTITION BY user_id ORDER BY CAST(epoch_ns(ts) AS BIGINT), event_id
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_click
        |   FROM events)
        |WHERE event_type = 'error' AND prior_click IS NOT NULL""".stripMargin,
    "c11_join_interval" ->
      """SELECT count(*) AS pairs FROM
        |  (SELECT user_id, event_id AS a_id, CAST(epoch_ns(ts) AS BIGINT) AS a_ts FROM events) a
        |JOIN
        |  (SELECT user_id AS b_user, event_id AS b_id, CAST(epoch_ns(ts) AS BIGINT) AS b_ts FROM events) b
        |ON a.user_id = b.b_user AND a.a_id < b.b_id
        |   AND b.b_ts BETWEEN a.a_ts AND a.a_ts + 3600000000000""".stripMargin)

  def all: Map[String, String] =
    scans ++ filters ++ joins ++ aggs ++ sortSets
}
