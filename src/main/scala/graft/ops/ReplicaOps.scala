package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Replication-verification tooling — the two canonical HBase support
  * jobs for "is my replica the same table?" [public:
  * o.a.h.hbase.mapreduce.VerifyReplication — cell-level full compare
  * emitting GOODROWS / ONLY_IN_SOURCE / ONLY_IN_TARGET /
  * CONTENT_DIFFERENT counters; o.a.h.hbase.mapreduce.HashTable +
  * SyncTable — per-key-range hash manifest compare, then cell-level
  * repair ONLY inside diverging ranges].
  *
  * Scale story (the reason both exist): a cell-level full-outer join of
  * two 100 TB tables (a25) shuffles 200 TB — correct but the most
  * expensive query you can run. The production sequence is
  * a26 → scoped a25: per-range hashes are ONE map-side-combining
  * groupBy per side (the hash is a commutative decimal SUM of per-cell
  * fingerprints, so partial aggregation works at any parallelism and no
  * per-range string concatenation ever materializes), the manifest join
  * is bounded metadata, and only the ranges whose hashes disagree pay
  * the cell-level join ([[verifyReplicationScoped]] — the SyncTable
  * read pattern). ReplicaSpec pins scoped ≡ full on every non-GOODROWS
  * counter and that applying the sync plan re-hashes to all-'ok'.
  */
object ReplicaOps {

  /** The cell fingerprint both jobs share: top 60 bits of md5 over a
    * '#'-joined rendering of the full cell coordinate + content. Every
    * field renders as an exact integer or verbatim string (value is
    * carried as DECIMAL(18,2) cents — a BIGINT — so no floating-point
    * formatting can diverge across engines or locales).
    */
  private def cellFp(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private def cellStr(df: DataFrame): Column =
    concat_ws("#", df("rowkey"), df("cf"), df("qualifier"), df("ts"),
      df("cents"), df("op"))

  /** Enrich a cells-shaped frame with the value as exact integer cents
    * plus the key-arithmetic columns the replica drift and the range
    * bucketing need. Row-local, so it applies to a streaming cells feed
    * unchanged (the I33 monitor).
    */
  private[graft] def enrich(cells: DataFrame): DataFrame =
    cells
      .withColumn("event_id", substring(col("rowkey"), 14, 12).cast("long"))
      .withColumn("user_id", substring(col("rowkey"), 1, 12).cast("long"))
      .withColumn("cents",
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long"))
      .drop("value")

  /** Source side: the canonical cells view, enriched. */
  private[graft] def srcCells(s: SparkSession, d: String): DataFrame =
    enrich(Tables.cells(s, d))

  /** [[srcCells]] with a fanned-out scan — the a26 manifest path pays one
    * md5 per cell on a single-row-group fixture scan, so parallelizing
    * the map work wins there (2.02 s -> 1.71 s at sf0.1); a25's
    * full-outer join measured SLOWER with the extra exchange (2.07 s ->
    * 2.63 s) and stays on the plain scan. Identity at production split
    * counts either way.
    */
  private[graft] def srcCellsFanned(s: SparkSession, d: String): DataFrame =
    enrich(ScaleOps.fanOut(Tables.cells(s, d)))

  /** Deterministic replica drift (the j18/j29 fixture pattern: the
    * fixture has no second cluster, so the gate synthesizes one by
    * arithmetic both engines can replay). Drift touches only the
    * ODD-numbered key ranges of [[regionOf]] — SF-relative by
    * construction (the user keyspace grows with SF, so an absolute
    * threshold goes vacuous at small fixtures) — so even ranges verify
    * clean and the sync plan has real 'ok' AND 'sync' rows at every SF:
    *   - event_id % 101 == 0 → the cell never replicated (ONLY_IN_SOURCE)
    *   - event_id % 103 == 0 → replica holds a corrupt value (+7 cents)
    *   - event_id % 107 == 0 → replica grew an extra cell under a
    *     qualifier the source never wrote (ONLY_IN_TARGET)
    */
  private[graft] def tgtCells(s: SparkSession, d: String): DataFrame =
    driftOf(srcCells(s, d))

  /** The drift as a pure cells→cells transform (two row-local filtered
    * branches + union — streamable, so I33 can replay the replica as a
    * live feed).
    */
  private[graft] def driftOf(src: DataFrame): DataFrame = {
    val drift = regionOf(col("user_id")) % 2 === 1
    val replicated = src
      .where(!(drift && col("event_id") % 101 === 0))
      .withColumn("cents",
        when(drift && col("event_id") % 103 === 0, col("cents") + 7)
          .otherwise(col("cents")))
    val extra = src.where(drift && col("event_id") % 107 === 0)
      .withColumn("qualifier", lit("x_repl"))
      .withColumn("ts", col("ts") + 1)
      .withColumn("cents", col("cents") + 1)
    replicated.unionByName(extra)
  }

  /** VerifyReplication: full cell-level compare of two cells-shaped
    * frames. One full-outer join on the complete cell coordinate
    * (rowkey, cf, qualifier, ts) — unique per cell by the data model —
    * then exact counters. Content equality is null-safe over
    * (cents, op). Output: (category, n), the four VerifyReplication
    * counters (absent categories simply have no row).
    */
  def verifyReplication(src: DataFrame, tgt: DataFrame): DataFrame = {
    val key = Seq("rowkey", "cf", "qualifier", "ts")
    val l = src.select(key.map(col) :+ col("cents").as("s_cents")
      :+ col("op").as("s_op"): _*)
    val r = tgt.select(key.map(col) :+ col("cents").as("t_cents")
      :+ col("op").as("t_op"): _*)
    l.join(r, key, "full_outer")
      .select(
        when(col("s_op").isNull, "ONLY_IN_TARGET")
          .when(col("t_op").isNull, "ONLY_IN_SOURCE")
          .when(col("s_cents") <=> col("t_cents") &&
            col("s_op") <=> col("t_op"), "GOODROWS")
          .otherwise("CONTENT_DIFFERENT").as("category"))
      .groupBy("category").agg(count(lit(1)).as("n"))
  }

  /** HashTable manifest for one side, UNFOLDED: per key-range cell count
    * + the raw commutative hash sum (per-cell fingerprints summed as
    * exact DECIMAL(38,0) — headroom for ~10²⁰ cells per range before
    * precision loss). The sum is a plain streaming-compatible aggregate,
    * so the I33 monitor accumulates it across micro-batches in the state
    * store; the mod fold happens at report time ([[foldManifest]]).
    */
  def rawManifest(cells: DataFrame, rangeId: Column): DataFrame =
    cells.groupBy(rangeId.as("range_id"))
      .agg(count(lit(1)).as("n"),
        sum(cellFp(cellStr(cells)).cast(DecimalType(38, 0))).as("hsum"))

  /** Fold a raw manifest's hash sum mod 1e9+7 (the a17 digest recipe) —
    * kept out of the aggregate so the raw sum stays commutative across
    * micro-batches.
    */
  def foldManifest(raw: DataFrame): DataFrame =
    raw.select(col("range_id"), col("n"),
      pmod(col("hsum"), lit(1000000007)).cast("long").as("h"))

  /** HashTable manifest for one side: per key-range cell count + the
    * folded commutative range hash. ONE map-side-combining groupBy;
    * nothing per-range ever concatenates.
    */
  def rangeManifest(cells: DataFrame, rangeId: Column): DataFrame =
    foldManifest(rawManifest(cells, rangeId))

  /** SyncTable plan: compare the two manifests range by range. The join
    * input is bounded metadata (one row per key range — ~10⁴–10⁵ rows
    * for a 100 TB table), so the full-outer here is broadcast-sized.
    * Output: (range_id, n_src, n_tgt, h_src, h_tgt, action) with
    * action = 'sync' exactly where count or hash disagrees (an absent
    * side reads as 0-count, hash NULL — never 'ok').
    */
  def syncRanges(src: DataFrame, tgt: DataFrame, rangeId: Column): DataFrame =
    syncPlan(rangeManifest(src, rangeId), rangeManifest(tgt, rangeId))

  /** The manifest-vs-manifest compare over two already-folded manifests
    * `(range_id, n, h)` — split out so the I33 monitor can re-plan per
    * trigger against a cached static source manifest.
    */
  def syncPlan(srcManifest: DataFrame, tgtManifest: DataFrame): DataFrame = {
    val sm = srcManifest
      .select(col("range_id"), col("n").as("n_src"), col("h").as("h_src"))
    val tm = tgtManifest
      .select(col("range_id"), col("n").as("n_tgt"), col("h").as("h_tgt"))
    sm.join(tm, Seq("range_id"), "full_outer")
      .select(col("range_id"),
        coalesce(col("n_src"), lit(0L)).as("n_src"),
        coalesce(col("n_tgt"), lit(0L)).as("n_tgt"),
        col("h_src"), col("h_tgt"),
        when(col("n_src") <=> col("n_tgt") && col("h_src") <=> col("h_tgt"),
          "ok").otherwise("sync").as("action"))
  }

  /** The SyncTable read pattern: cell-level verification restricted to
    * the ranges a [[syncRanges]] plan flagged. `diverged` is the plan's
    * 'sync' sliver — bounded metadata — so the semi-joins broadcast and
    * the expensive cell-coordinate shuffle only ever sees diverging
    * ranges' cells. Clean ranges contribute only GOODROWS by
    * construction (equal count + equal content hash over the full cell
    * rendering), so every mismatch counter is EXACTLY the full run's.
    */
  def verifyReplicationScoped(src: DataFrame, tgt: DataFrame,
                              rangeId: Column, diverged: DataFrame): DataFrame = {
    val ids = broadcast(diverged.select(col("range_id")))
    def scoped(side: DataFrame): DataFrame =
      side.withColumn("range_id", rangeId)
        .join(ids, Seq("range_id"), "left_semi").drop("range_id")
    verifyReplication(scoped(src), scoped(tgt))
  }

  /** Apply a sync plan: replace the target's cells in diverging ranges
    * with the source's (SyncTable's dry-run=false). Clean ranges never
    * move.
    */
  def applySync(src: DataFrame, tgt: DataFrame, rangeId: Column,
                diverged: DataFrame): DataFrame = {
    val ids = broadcast(diverged.select(col("range_id")))
    def tag(side: DataFrame): DataFrame = side.withColumn("range_id", rangeId)
    tag(tgt).join(ids, Seq("range_id"), "left_anti")
      .unionByName(tag(src).join(ids, Seq("range_id"), "left_semi"))
      .drop("range_id")
  }

  /** The gate's key-range scheme: the a23/a24 exponentially-widening
    * user-key regions — delegates to [[BalancerOps.regionOf]] so exactly
    * ONE Scala spelling twins the oracle's `regionBucketCase`.
    */
  private[graft] def regionOf(c: Column): Column = BalancerOps.regionOf(c)

  /** a25 — VerifyReplication counters under the driver gate. */
  val a25_verify_replication: Q = (s, d) =>
    verifyReplication(srcCells(s, d), tgtCells(s, d))
      .orderBy(col("category").asc_nulls_last)

  /** a26 — the SyncTable range plan under the driver gate. */
  val a26_sync_ranges: Q = (s, d) =>
    syncRanges(srcCellsFanned(s, d), driftOf(srcCellsFanned(s, d)),
      regionOf(col("user_id")))
      .orderBy(col("range_id").asc_nulls_last)

  val queries: Map[String, Q] = Map(
    "a25_verify_replication" -> a25_verify_replication,
    "a26_sync_ranges" -> a26_sync_ranges)
}
