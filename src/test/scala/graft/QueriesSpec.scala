package graft

/** Contract-level checks over the full declared query set (SURVEY §5.1):
  * every query runs on sf0.001, every query has an oracle, column names
  * are stable, and a few hand-checked golden values pin semantics
  * independently of the driver's DuckDB gate.
  */
class QueriesSpec extends SparkSuite {

  /** Queries the driver checks rows-only, per the contract's sanctioned
    * escape hatch for non-SQL-expressible operators ("Omit for non-SQL-
    * expressible ops"). Empty since r10: the BPE gate entry became
    * j27_bpe_roundtrip, whose decode∘encode invariant IS
    * oracle-expressible (md5 of the round-tripped text vs DuckDB md5 of
    * the independently normalized text) — every declared query is now
    * hash-matched cross-engine.
    */
  private val rowsOnlyQueries = Set.empty[String]

  test("every declared query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o -- rowsOnlyQueries).isEmpty,
      s"queries missing oracle: ${q -- o -- rowsOnlyQueries}")
    assert((o -- q).isEmpty, s"oracles missing query: ${o -- q}")
    assert((rowsOnlyQueries -- q).isEmpty && (rowsOnlyQueries & o.toSet).isEmpty,
      "rows-only allowlist out of sync with the declared maps")
  }

  test("all queries execute on sf0.001, return rows, and are deterministic across runs") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val r1 = fn(spark, sf).collect()
      val r2 = fn(spark, sf).collect()
      // non-empty guard: a 0-row result hash-matching a 0-row oracle proves
      // nothing (the r2 b20 / r3 g4 vacuous-pass class) — every declared
      // query must produce rows at even the smallest SF
      assert(r1.nonEmpty, s"$name returned 0 rows at sf0.001 — vacuous oracle entry")
      assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq,
        s"$name not deterministic")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("golden: a1 row count matches raw parquet count") {
    val n = Tables.lineitem(spark, sf).count()
    val row = SparkEntry.queries("a1_scan_parquet")(spark, sf).collect().head
    assert(row.getAs[Long]("n") == n)
  }

  test("golden: g1 union_all = |customer| + |supplier|") {
    val expect = Tables.customer(spark, sf).count() + Tables.supplier(spark, sf).count()
    val row = SparkEntry.queries("g1_union_all")(spark, sf).collect().head
    assert(row.getAs[Long]("n") == expect)
  }

  test("golden: c3/c4 left and right join mirror each other") {
    val l = SparkEntry.queries("c3_join_left")(spark, sf).collect().head
    val r = SparkEntry.queries("c4_join_right")(spark, sf).collect().head
    assert(l.getAs[Long]("total") == r.getAs[Long]("total"))
    assert(l.getAs[Long]("unmatched") == r.getAs[Long]("unmatched"))
  }

  test("law: e7 running total final row equals group sum (window vs groupBy)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val orders = Tables.orders(spark, sf)
    val ck = orders.select("o_custkey").first().getLong(0)
    val mine = orders.where(col("o_custkey") === ck)
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lastRun = mine
      .select(sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).as("run"),
        col("o_orderdate"), col("o_orderkey"))
      .orderBy(desc("o_orderdate"), desc("o_orderkey"))
      .select("run").first().getDecimal(0)
    val grp = mine.agg(sum(col("o_totalprice").cast(DecimalType(18, 2))))
      .first().getDecimal(0)
    assert(lastRun.compareTo(grp) == 0)
  }

  test("law: version-cap monotonicity (b8: rows(N) grows with N)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("rowkey", "cf", "qualifier").orderBy(desc("ts"), col("value"))
    val cells = Tables.cells(spark, sf).withColumn("rn", row_number().over(w))
    val n1 = cells.where(col("rn") <= 1).count()
    val n3 = cells.where(col("rn") <= 3).count()
    val all = cells.count()
    assert(n1 <= n3 && n3 <= all)
  }

  test("law: set-op algebra (A∪A distinct = A, A∖A = empty)") {
    val a = Tables.customer(spark, sf).select("c_nationkey")
    assert(a.union(a).distinct().count() == a.distinct().count())
    assert(a.except(a).count() == 0)
  }

  test("law: j44 temperature weights form a distribution that up-samples low-resource languages") {
    val rows = SparkEntry.queries("j44_temperature_mix")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length >= 2)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9, "q must normalize to 1")
    assert(rows.forall(r => r._4 > 0), "every language keeps positive mass")
    // α < 1 ⟹ the up-sampling factor q/p strictly decreases in p: the
    // rarer language always gains relative to its natural share
    for (a <- rows; b <- rows if a._3 < b._3)
      assert(a._4 / a._3 > b._4 / b._3,
        s"${a._1} (p=${a._3}) must be up-sampled more than ${b._1} (p=${b._3})")
  }

  test("law: d18 deletes exactly the condition-matched error columns, touches nothing else") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // d18 builds its cells straight from events (no op column); recompute
    // the pre-mutation latest view from the same projection (all del=0,
    // so the tie-order reduces to d18's ts desc, value asc)
    val base = Tables.events(spark, sf).select(
      Tables.pad(col("user_id")).as("rowkey"), col("event_type").as("qualifier"),
      Tables.tsMicros(col("ts")).as("ts"), col("value"))
    val w = Window.partitionBy("rowkey", "qualifier")
      .orderBy(col("ts").desc, col("value").asc)
    val latest = base.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")
    val plain = latest.groupBy("qualifier")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val d18 = SparkEntry.queries("d18_check_and_delete")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val survivors = latest.where(col("qualifier") === "error" && col("value") >= 200.0).count()
    // non-error qualifiers are untouched; error keeps exactly the
    // latest cells whose value fails the delete condition
    plain.foreach { case (q, n) =>
      if (q != "error") assert(d18.get(q).contains(n), s"$q changed: ${d18.get(q)} vs $n")
    }
    assert(d18.getOrElse("error", 0L) == survivors,
      s"error survivors ${d18.get("error")} != condition-computed $survivors")
  }

  test("law: j42 fused ranking is contiguous, ordered, and never self-matching") {
    val rows = SparkEntry.queries("j42_rrf_fusion")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq,
        s"qid=$qid ranks not contiguous")
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4; case _ => true
      }, s"qid=$qid rrf not non-increasing in rank")
      assert(rs.forall(_._3 != qid), s"qid=$qid fused its own document")
    }
  }
}
