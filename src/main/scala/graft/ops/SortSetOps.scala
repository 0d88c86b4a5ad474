package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._

/** F family — sort/limit/distinct; G family — set operations
  * (SURVEY.md §2.7–2.8).
  *
  * F2 matters at scale: orderBy().limit(k) is planned as
  * TakeOrderedAndProject — per-partition top-k heaps merged on the driver,
  * no global sort exchange.
  */
object SortSetOps {

  /** f1 — global sort: range-partitioned exchange. */
  val f1_sort_global: Q = (s, d) =>
    Tables.lineitem(s, d)
      .orderBy(
        col("l_extendedprice").desc_nulls_last,
        col("l_orderkey").asc_nulls_last,
        col("l_linenumber").asc_nulls_last)
      .select(col("l_orderkey"), col("l_linenumber"))
      .limit(100)

  /** f2 — top-k: TakeOrderedAndProject physical op, no full sort. */
  val f2_topk: Q = (s, d) =>
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_last)
      .select(col("o_orderkey"), col("o_totalprice"))
      .limit(25)

  /** f5 — offset + limit pagination below a total order (R1). Spark plans
    * the offset into GlobalLimit (skip k, take n) above the same top-(k+n)
    * TakeOrdered path — no full materialization of the skipped prefix.
    */
  val f5_offset: Q = (s, d) =>
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_last)
      .select(col("o_orderkey"), col("o_totalprice"))
      .offset(25)
      .limit(25)

  val f4_distinct: Q = (s, d) =>
    Tables.customer(s, d)
      .select(col("c_mktsegment"))
      .distinct()
      .orderBy(col("c_mktsegment").asc_nulls_last)

  private def custKeys(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.customer(s, d).select(col("c_nationkey").as("k"))
  private def suppKeys(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.supplier(s, d).select(col("s_nationkey").as("k"))

  val g1_union_all: Q = (s, d) =>
    custKeys(s, d).unionAll(suppKeys(s, d)).agg(count(lit(1)).as("n"))

  val g2_union: Q = (s, d) =>
    custKeys(s, d).union(suppKeys(s, d)).distinct().agg(count(lit(1)).as("n"))

  val g3_intersect: Q = (s, d) =>
    custKeys(s, d).intersect(suppKeys(s, d)).orderBy(col("k").asc_nulls_last)

  /** g4 — EXCEPT in the sparse direction: parts never shipped in a
    * quantity-1 lineitem. ~55% of `part` survives at every shipped SF
    * (92 / 1143 / 11031 rows at sf0.001/0.01/0.1), so the row-producing
    * EXCEPT path is genuinely exercised — the earlier nation-minus-customer
    * form was empty at every SF and passed vacuously (VERDICT r3 #1).
    * R1 total order + LIMIT keeps the output bounded and deterministic.
    */
  val g4_except: Q = (s, d) =>
    Tables.part(s, d).select(col("p_partkey").as("k"))
      .except(Tables.lineitem(s, d)
        .filter(col("l_quantity") <= 1)
        .select(col("l_partkey").as("k")))
      .orderBy(col("k").asc_nulls_last)
      .limit(100)

  private def evenOdd(s: org.apache.spark.sql.SparkSession, d: String, m: Int) =
    Tables.orders(s, d).filter(col("o_orderkey") % m === 0).select(col("o_orderstatus"))

  /** g5/g6 — bag-semantics set ops (INTERSECT ALL / EXCEPT ALL). */
  val g5_intersect_all: Q = (s, d) =>
    evenOdd(s, d, 2).intersectAll(evenOdd(s, d, 3)).agg(count(lit(1)).as("n"))

  val g6_except_all: Q = (s, d) =>
    evenOdd(s, d, 2).exceptAll(evenOdd(s, d, 3)).agg(count(lit(1)).as("n"))

  val queries: Map[String, Q] = Map(
    "f1_sort_global" -> f1_sort_global,
    "f2_topk" -> f2_topk,
    "f4_distinct" -> f4_distinct,
    "f5_offset" -> f5_offset,
    "g1_union_all" -> g1_union_all,
    "g2_union" -> g2_union,
    "g3_intersect" -> g3_intersect,
    "g4_except" -> g4_except,
    "g5_intersect_all" -> g5_intersect_all,
    "g6_except_all" -> g6_except_all)
}
