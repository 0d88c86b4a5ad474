package graft

import graft.ops.ReplicaOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Invariants of the a25/a26 replication-verification surface beyond the
  * relational oracle: the SyncTable composition (plan → scoped verify →
  * repair → re-verify clean), hash-manifest soundness on clean ranges,
  * and partition invariance of the commutative range hash.
  */
class ReplicaSpec extends SparkSuite {

  private lazy val src = ReplicaOps.srcCells(spark, sf)
  private lazy val tgt = ReplicaOps.tgtCells(spark, sf)
  private val range = ReplicaOps.regionOf(col("user_id"))

  private def counters(df: DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("sync plan: undrifted ranges verify 'ok', drifted ranges 'sync', and the plan is non-vacuous") {
    val plan = ReplicaOps.syncRanges(src, tgt, range)
      .collect().map(r => r.getInt(0) -> r.getString(5)).toMap
    // drift touches only the ODD region buckets — the even ranges must
    // hash identical or the manifest has false positives
    plan.filter(_._1 % 2 == 0).foreach { case (rid, action) =>
      assert(action == "ok", s"clean range $rid flagged $action")
    }
    assert(plan.exists { case (rid, a) => rid % 2 == 1 && a == "sync" },
      s"engineered drift produced a vacuous plan: $plan")
  }

  test("scoped verify over the plan's sync ranges reproduces every mismatch counter of the full run") {
    val diverged = ReplicaOps.syncRanges(src, tgt, range)
      .where(col("action") === "sync")
    val full = counters(ReplicaOps.verifyReplication(src, tgt))
    val scoped = counters(
      ReplicaOps.verifyReplicationScoped(src, tgt, range, diverged))
    for (k <- Seq("ONLY_IN_SOURCE", "ONLY_IN_TARGET", "CONTENT_DIFFERENT")) {
      assert(scoped.getOrElse(k, 0L) == full.getOrElse(k, 0L),
        s"$k: scoped ${scoped.get(k)} != full ${full.get(k)}")
      assert(full.getOrElse(k, 0L) > 0L, s"drift produced no $k rows — vacuous")
    }
    // clean ranges contribute only GOODROWS, so scoping can only shrink it
    assert(scoped.getOrElse("GOODROWS", 0L) <= full.getOrElse("GOODROWS", 0L))
  }

  test("applying the sync plan re-hashes to all-'ok' and cell-verifies to pure GOODROWS") {
    val diverged = ReplicaOps.syncRanges(src, tgt, range)
      .where(col("action") === "sync")
    val repaired = ReplicaOps.applySync(src, tgt, range, diverged)
    val replan = ReplicaOps.syncRanges(src, repaired, range)
      .collect().map(r => r.getString(5))
    assert(replan.forall(_ == "ok"), s"post-repair plan: ${replan.mkString(",")}")
    val after = counters(ReplicaOps.verifyReplication(src, repaired))
    assert(after.keySet == Set("GOODROWS"), s"post-repair counters: $after")
    assert(after("GOODROWS") == src.count())
  }

  test("counter conservation: the four categories partition both sides exactly") {
    // every source cell is GOODROWS, CONTENT_DIFFERENT or ONLY_IN_SOURCE;
    // every target cell is GOODROWS, CONTENT_DIFFERENT or ONLY_IN_TARGET —
    // the full-outer join can neither drop nor duplicate a coordinate
    val c = counters(ReplicaOps.verifyReplication(src, tgt))
    def n(k: String) = c.getOrElse(k, 0L)
    assert(n("GOODROWS") + n("CONTENT_DIFFERENT") + n("ONLY_IN_SOURCE")
      == src.count(), s"source side not partitioned: $c")
    assert(n("GOODROWS") + n("CONTENT_DIFFERENT") + n("ONLY_IN_TARGET")
      == tgt.count(), s"target side not partitioned: $c")
  }

  test("range manifest is invariant under input partitioning") {
    def manifest(df: DataFrame): Seq[String] =
      ReplicaOps.rangeManifest(df, ReplicaOps.regionOf(col("user_id")))
        .collect().map(_.toString).sorted.toSeq
    assert(manifest(tgt) == manifest(tgt.repartition(13)))
  }
}
