package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2.9 H — scalar function families. One oracle query per family,
  * exercising every listed function; all stock codegen'd
  * `org.apache.spark.sql.functions`, so each stays inside whole-stage
  * codegen and never blocks parquet pushdown/pruning.
  */
object FnOps {

  /** h1: string family — substr/upper/lower-adjacent/trim via lpad, length,
    * reverse, levenshtein.
    */
  def h1_fn_string: Q = (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        upper(substring(col("p_name"), 1, 5)).as("u"),
        length(col("p_name")).as("l"),
        lpad(col("p_size").cast("string"), 4, "0").as("pad"),
        reverse(col("p_brand")).as("rev"),
        levenshtein(col("p_brand"), lit("Brand#11")).as("lev"))
      .orderBy(asc_nulls_last("p_partkey")).limit(200)

  /** h2: regexp_extract / regexp_replace. */
  def h2_fn_regex: Q = (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        regexp_extract(col("p_type"), "([A-Z]+)", 1).as("g"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("r"))
      .orderBy(asc_nulls_last("p_partkey")).limit(200)

  /** h3: date/time family. `o_orderdate` is TIMESTAMP_NTZ in the fixture;
    * add_months/datediff operate on its date part (R8 dialect pair on the
    * DuckDB side: date_diff + INTERVAL arithmetic).
    */
  def h3_fn_datetime: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        date_trunc("month", col("o_orderdate")).cast("date").as("mstart"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("dd"),
        add_months(col("o_orderdate"), 3).cast("date").as("plus3"))
      .orderBy(asc_nulls_last("o_orderkey")).limit(200)

  /** h4: math family over int-derived values only (R6). */
  def h4_fn_math: Q = (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        abs(col("p_size") - 25).as("a"),
        pow(col("p_size"), 2).as("p2"),
        sqrt(col("p_size").cast("double")).as("sq"),
        (col("p_size") % 7).as("md"),
        signum(col("p_size") - 25).cast("int").as("sg"),
        greatest(col("p_size"), lit(10)).as("g"),
        least(col("p_size"), lit(40)).as("l"))
      .orderBy(asc_nulls_last("p_partkey")).limit(200)

  /** h5: CASE WHEN / coalesce / nullif. */
  def h5_fn_cond: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        when(col("o_totalprice") > 200000, "hi")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("lo").as("b"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("PENDING")).as("s"))
      .orderBy(asc_nulls_last("o_orderkey")).limit(200)

  /** h6: array family — split/size/slice/sort_array/array_join. */
  def h6_fn_array: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("ntok"),
        array_join(sort_array(slice(split(col("text"), " "), 1, 3)), ",").as("head3"))
      .orderBy(asc_nulls_last("doc_id")).limit(100)

  /** h7: higher-order lambdas — transform + aggregate left fold (R7: the
    * 0.0-init left fold is bit-identical to DuckDB's list_reduce).
    */
  def h7_fn_lambda: Q = (s, d) =>
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        aggregate(
          transform(col("embedding"), x => x.cast("double") * 2),
          lit(0.0), (acc, x) => acc + x).as("s"))
      .orderBy(asc_nulls_last("vec_id")).limit(100)

  /** h8: map functions under the oracle gate. The map lives entirely on
    * the Spark side — built per user with `map_from_entries` (sorted
    * entries, so key order is deterministic), then interrogated with
    * `size` / `element_at` / `map_filter` / `map_values` / `map_keys` —
    * while the DuckDB twin recomputes the same relational result with
    * plain grouped aggregation (DuckDB MAP parquet round-trips are
    * fragile, so the map type itself never crosses the engine boundary;
    * this closes SURVEY §2.9's "no map fixture" n/a with a genuine gate).
    */
  def h8_fn_map: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("event_type"), col("n"))))).as("m"))
      .select(
        col("user_id"),
        size(col("m")).as("n_types"),
        coalesce(element_at(col("m"), "click"), lit(0L)).as("clicks"),
        aggregate(
          map_values(map_filter(col("m"), (k, _) => k =!= "error")),
          lit(0L), (acc, x) => acc + x).as("non_error_events"),
        array_join(map_keys(col("m")), ",").as("types"))
      .orderBy(asc_nulls_last("user_id")).limit(200)

  /** h9: JSON extraction over events.props (`{"k": <int>}` shape). */
  def h9_fn_json: Q = (s, d) =>
    // fanOut: the fixture's single-row-group scan runs 100k JSON parses
    // on one core without it (measured: exec ~0.8 s single-task; the
    // same-JVM identical-work SQL twin reads the same, so the cost is
    // the parse, not the graft path); identity at production split counts
    ScaleOps.fanOut(Tables.events(s, d))
      .groupBy("event_type")
      .agg(sum(get_json_object(col("props"), "$.k").cast("int").cast(DecimalType(18, 0)))
        .cast("long").as("ksum"))
      .orderBy(asc_nulls_last("event_type"))

  /** h10: hash family — sha256 + md5 (the rowkey-salting substrate; xxhash64
    * and crc32 exist Spark-side but have no DuckDB twin — unit-tested
    * instead, SURVEY §2.9).
    */
  def h10_fn_hash: Q = (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        sha2(col("p_name"), 256).as("h"),
        md5(col("p_name")).as("m"))
      .orderBy(asc_nulls_last("p_partkey")).limit(100)

  /** h11: struct build + field access. */
  def h11_fn_struct: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        struct(col("o_orderstatus").as("status"), col("o_orderpriority").as("priority"))
          .getField("status").as("st"))
      .orderBy(asc_nulls_last("o_orderkey")).limit(100)

  /** h12: casts incl. try_cast. floor-then-cast keeps double→int portable
    * (Spark casts truncate, DuckDB casts round — floor first makes both
    * exact).
    */
  def h12_fn_cast: Q = (s, d) =>
    // fanOut: try_cast of a never-parseable priority string pays Spark's
    // exception-path cost (~13 µs/row); on the fixture's single-split
    // scan that ran serial — identity at production split counts
    ScaleOps.fanOut(Tables.orders(s, d))
      .select(col("o_orderkey"),
        floor(col("o_totalprice")).cast("long").as("ip"),
        col("o_orderkey").cast("string").as("s"),
        expr("try_cast(o_orderpriority AS INT)").as("bad"))
      .orderBy(asc_nulls_last("o_orderkey")).limit(100)

  /** h13: bitwise family — AND/OR/XOR, shifts, popcount (rowkey salting
    * and fingerprint substrate; DuckDB spells XOR as `xor()`, R8).
    */
  def h13_fn_bitwise: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        col("o_orderkey").bitwiseAND(255).as("band"),
        col("o_orderkey").bitwiseOR(4096).as("bor"),
        col("o_orderkey").bitwiseXOR(1234).as("bxor"),
        shiftleft(col("o_orderkey"), 2).as("shl"),
        shiftright(col("o_orderkey"), 1).as("shr"),
        bit_count(col("o_orderkey")).as("bits"))
      .orderBy(asc_nulls_last("o_orderkey")).limit(100)

  def queries: Map[String, Q] = Map(
    "h13_fn_bitwise" -> h13_fn_bitwise,
    "h1_fn_string" -> h1_fn_string,
    "h2_fn_regex" -> h2_fn_regex,
    "h3_fn_datetime" -> h3_fn_datetime,
    "h4_fn_math" -> h4_fn_math,
    "h5_fn_cond" -> h5_fn_cond,
    "h6_fn_array" -> h6_fn_array,
    "h7_fn_lambda" -> h7_fn_lambda,
    "h8_fn_map" -> h8_fn_map,
    "h9_fn_json" -> h9_fn_json,
    "h10_fn_hash" -> h10_fn_hash,
    "h11_fn_struct" -> h11_fn_struct,
    "h12_fn_cast" -> h12_fn_cast)
}
