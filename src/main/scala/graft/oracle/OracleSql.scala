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

  def all: Map[String, String] = joins
}
