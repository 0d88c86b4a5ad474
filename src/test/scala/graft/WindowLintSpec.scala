package graft

import org.apache.spark.sql.catalyst.plans.logical.Window

/** Physical-plan lint (VERDICT r17 #5): a GLOBAL window — empty
  * partitionSpec, so every row moves to ONE partition — is the single
  * easiest way to ship a query that works at sf0.01 and dies at 100 TB.
  * This sweep builds every declared query's optimized plan and asserts
  * that unpartitioned windows appear ONLY in the whitelisted queries,
  * each of which runs its global window over a bounded METADATA table
  * (the region list / store-file manifest — the master's ~10⁴–10⁵-row
  * view at 100 TB, reduced from data by one map-side-combining
  * aggregate first), never over data-sized input. The whitelist is
  * exact in both directions: a NEW global window anywhere else fails
  * the sweep, and a whitelisted query that stops using one fails the
  * rot check, so the list can neither grow silently nor go stale.
  */
class WindowLintSpec extends SparkSuite {

  /** Queries whose global window is over a bounded table by
    * construction (see each gate's scale note):
    *   - a23/a24/a31/a34 — the region-METADATA table, reduced from
    *     cells by one map-side-combining groupBy before the window
    *     (the normalizer/placement/hbck plans are sequential decisions
    *     over an ordered region list by definition)
    *   - e4 — percent_rank/cume_dist over `nation`, a 25-row reference
    *     table (the declared semantics are a global rank)
    */
  private val allowed: Set[String] = Set(
    "a23_region_normalize", "a24_region_placement", "a31_hbck_regions",
    "a34_weighted_placement", "a36_locality_placement", "e4_win_pctrank")

  test("no declared query runs an unpartitioned window outside the metadata whitelist") {
    // ISOLATED scratch namespace (ADVICE r18 #2): some query constructors
    // have real filesystem side effects (a33 plants drift, a9/a15/a22/...
    // bulk-write) and Tables.appTmpDir keys scratch dirs on the sfDir
    // STRING — aliasing the fixture path ("/." reads the same parquet)
    // gives this sweep its own scratch dirs, so building a33's plan here
    // can never race another spec's gate run on the shared dir.
    val isolatedSf = sf + "/."
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val df = fn(spark, isolatedSf)
        val n = df.queryExecution.optimizedPlan.collectWithSubqueries {
          case w: Window if w.partitionSpec.isEmpty => w
        }.size
        if (n > 0) Some(name) else None
    }
    val unexpected = offenders.filterNot(allowed)
    assert(unexpected.isEmpty,
      s"unpartitioned window in non-whitelisted queries: $unexpected — " +
        "either partition the window or justify the bounded input and whitelist")
    val stale = allowed -- offenders.toSet
    assert(stale.isEmpty,
      s"whitelist rot — these no longer carry a global window: $stale")
  }
}
