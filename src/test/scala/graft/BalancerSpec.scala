package graft

import graft.ops.BalancerOps
import graft.ops.GraftCkpt
import org.apache.spark.sql.functions._

/** Invariants of the a23/a24 planning surface the relational oracle
  * cannot see: plan safety (split and merge never claim the same
  * region, merges pair disjointly), serpentine balance quality, and
  * determinism under repartitioning.
  */
class BalancerSpec extends SparkSuite {
  import spark.implicits._

  private def statsOf(ns: Seq[Long]) =
    ns.zipWithIndex.map { case (n, i) =>
      (i, f"k$i%05d", n)
    }.toDF("region_id", "start_key", "n_cells")

  test("normalize plan: merge pairs are disjoint and adjacent; split and merge never overlap") {
    // sizes engineered so several merge candidates chain: without parity
    // pairing, regions 1..4 (all tiny) would each try to merge with both
    // neighbors — the plan must pair them (1,2) and (3,4), never reuse one
    val plan = BalancerOps.normalizePlan(
        statsOf(Seq(100, 10, 10, 10, 10, 900, 100)))
      .orderBy("region_id").collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getString(4)))
    val actions = plan.map(_._3)
    // every merge_right is immediately followed by its merge_left partner
    actions.zipWithIndex.foreach { case (a, i) =>
      if (a == "merge_right")
        assert(actions(i + 1) == "merge_left",
          s"merge_right at $i lacks its partner: ${actions.mkString(",")}")
      if (a == "merge_left")
        assert(i > 0 && actions(i - 1) == "merge_right",
          s"merge_left at $i lacks its partner: ${actions.mkString(",")}")
    }
    // a region is claimed by at most one action by construction of the
    // single action column; split regions must actually be oversized
    val tgt = BalancerOps.normalizePlan(statsOf(Seq(100, 10, 10, 10, 10, 900, 100)))
      .select("tgt").head().getLong(0)
    plan.filter(_._3 == "split").foreach { case (_, n, _) =>
      assert(n > 2 * tgt)
    }
    plan.filter(_._3.startsWith("merge")).foreach { case (_, n, _) =>
      assert(n < tgt)
    }
    assert(actions.count(_ == "split") >= 1 && actions.count(_ == "merge_right") >= 1,
      s"engineered skew produced a vacuous plan: ${actions.mkString(",")}")
  }

  test("placement: serpentine max-min load gap is bounded by the largest region") {
    val rnd = new scala.util.Random(7)
    val sizes = Seq.fill(40)(1L + rnd.nextInt(1000).toLong)
    val placed = BalancerOps.placementPlan(
        sizes.zipWithIndex.map { case (n, i) => (i, n) }.toDF("region_id", "n_cells"),
        nServers = 7)
      .groupBy("server").agg(sum("n_cells").as("load"))
      .collect().map(_.getLong(1))
    assert(placed.length == 7, s"server(s) left empty: ${placed.length}/7")
    // serpentine quality: each deal round adds one region per server in
    // opposing order, so imbalance accumulates at most one max-sized
    // region overall — loose-bound it by the largest region size
    assert(placed.max - placed.min <= sizes.max,
      s"load gap ${placed.max - placed.min} exceeds the largest region ${sizes.max}")
  }

  test("rsgroup placement: no region leaves its group; per-group serpentine gap bound holds") {
    val rnd = new scala.util.Random(11)
    val regions = (0 until 60).map(i => (i, 1L + rnd.nextInt(1000).toLong))
      .toDF("region_id", "n_cells")
    val groupOf = when(col("region_id") % 3 === 0, "gA")
      .when(col("region_id") % 3 === 1, "gB").otherwise("gC")
    val fleet = Map("gA" -> 2, "gB" -> 3, "gC" -> 4)
    val placed = BalancerOps.rsgroupPlacementPlan(regions, groupOf, fleet)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(placed.length == 60)
    // group affinity respected: every region sits in its mapped group,
    // and its server is that group's (structural no-cross-group)
    placed.foreach { case (id, _, grp, server) =>
      val expected = Seq("gA", "gB", "gC")(id % 3)
      assert(grp == expected, s"region $id left its group: $grp")
      assert(server.startsWith(grp + "-"), s"cross-group server $server for $grp")
    }
    // every configured server is used and none is out of range
    fleet.foreach { case (g, n) =>
      val servers = placed.filter(_._3 == g).map(_._4).distinct.sorted
      assert(servers.toSeq == (0 until n).map(i => s"$g-$i"),
        s"group $g fleet mismatch: ${servers.mkString(",")}")
    }
    // serpentine balance WITHIN each group: max-min server load bounded
    // by the group's largest region (same bound the a24 test pins
    // globally)
    fleet.keys.foreach { g =>
      val inG = placed.filter(_._3 == g)
      val loads = inG.groupBy(_._4).map(_._2.map(_._2).sum)
      assert(loads.max - loads.min <= inG.map(_._2).max,
        s"group $g unbalanced: ${loads.mkString(",")}")
    }
  }

  test("rsgroup placement is invariant under input partitioning") {
    val regions = (0 until 40).map(i => (i, (i * 37 % 500 + 1).toLong))
      .toDF("region_id", "n_cells")
    val groupOf = when(col("region_id") % 2 === 0, "ga").otherwise("gb")
    def planOf(df: org.apache.spark.sql.DataFrame) =
      BalancerOps.rsgroupPlacementPlan(df, groupOf, Map("ga" -> 3, "gb" -> 2))
        .orderBy("region_id").collect().map(_.toString).toSeq
    assert(planOf(regions.repartition(13)) == planOf(regions.coalesce(1)))
  }

  test("compaction selection: big-old-file exclusion, min-files drop, newest-max cap") {
    def filesOf(region: Int, sizes: Seq[Long]) =
      sizes.zipWithIndex.map { case (sz, i) => (region, i.toLong, sz) }
    // region 0: a 10000-cell old file dwarfing its 4×100 newer files —
    // the ratio test must keep it OUT of the minor compaction (the
    // policy's reason to exist) while the similar-sized newer files
    // compact; region 1: only 2 files qualify → below min=3, all keep;
    // region 2: 15 equal files all qualify → only the NEWEST 10 compact
    val rows = filesOf(0, Seq(10000L, 100L, 100L, 100L, 100L)) ++
      filesOf(1, Seq(50L, 50L, 40L)) ++
      filesOf(2, Seq.fill(15)(10L))
    val got = BalancerOps.compactionSelect(
        rows.toDF("region_id", "seq", "size"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getString(3)).toMap
    assert(got((0, 0L)) == "keep", "big old file joined a minor compaction")
    // newer similar files: suffix sums qualify all but the newest two
    assert(got((0, 1L)) == "compact" && got((0, 2L)) == "compact")
    assert(got((0, 4L)) == "keep", "newest file has nothing newer to pay for it")
    // region 1: 50 <= 1.2*90 and 50 <= 1.2*40 → only 2 qualify → under min 3
    assert((0 until 3).forall(i => got((1, i.toLong)) == "keep"),
      "sub-min selection must be dropped whole")
    // region 2: 14 qualify (newest never does) → cap keeps the newest 10
    val compacted2 = (0 until 15).filter(i => got((2, i.toLong)) == "compact")
    assert(compacted2 == (4 until 14), s"cap slice wrong: $compacted2")
  }

  test("compaction throttle ladder: pressure floor, exact ramp steps, " +
      "blocking => unlimited; double-apply == single-apply") {
    import spark.implicits._
    def filesOf(region: Int, n: Int) = (0 until n).map(i => (region, i.toLong, 10L))
    // region r holds r+2 equal files, r = 0..8 → counts 2..10 span the
    // whole ladder: below-min (2), the pressure floor (3), every ramp
    // step (4..7), the blocking boundary (8) and beyond (10)
    val rows = (0 to 8).flatMap(r => filesOf(r, r + 2))
    val ladder = BalancerOps.compactionThrottle(
      rows.toDF("region_id", "seq", "size"))
    val got = ladder.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getString(3), r.getLong(4))))
      .toMap
    val MiB = 1024L * 1024
    // n=2 (below min): pressure numerator clamps at 0 → lower bound
    assert(got(0) == ((2L, "throttled", 50 * MiB)))
    // n=3 (exactly minFiles): pressure 0 → lower bound
    assert(got(1) == ((3L, "throttled", 50 * MiB)))
    // ramp: each file over minFiles adds exactly (upper−lower)/5 = 10 MiB
    assert(got(2) == ((4L, "throttled", 60 * MiB)))
    assert(got(5) == ((7L, "throttled", 90 * MiB)))
    // blocking boundary and beyond: unlimited, ladder value pegged at upper
    assert(got(6) == ((8L, "unlimited", 100 * MiB)))
    assert(got(8) == ((10L, "unlimited", 100 * MiB)))
    // a compactor asking 250 MiB/s clamps where throttled, keeps its rate
    // at blocking pressure; re-applying the ladder changes nothing
    val queue = ladder.select(col("region_id"), lit(250 * MiB).as("rate_bps"))
    val once = BalancerOps.applyCompactionThrottle(queue, ladder)
    val o = once.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(o(1) == 50 * MiB && o(2) == 60 * MiB && o(6) == 250 * MiB)
    val twice = BalancerOps.applyCompactionThrottle(once, ladder)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(twice == o, "double-apply must equal single-apply")
    intercept[IllegalArgumentException](
      BalancerOps.compactionThrottle(ladder, minFiles = 8, blockingFiles = 8))
  }

  test("compaction selection invariants hold on randomized manifests") {
    // independent recomputation of the policy in plain Scala against the
    // DataFrame result, over randomized file manifests: every compacted
    // file passes the cross-multiplied ratio test, a region's compacted
    // count is 0 or in [minFiles, maxFiles], and the capped choice is
    // the newest-qualifying slice
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 3) {
      val rows = (0 until 8).flatMap { region =>
        val nFiles = 1 + rnd.nextInt(14)
        (0 until nFiles).map(seq =>
          (region, seq.toLong, 1L + rnd.nextInt(5000).toLong))
      }
      val got = BalancerOps.compactionSelect(
          rows.toDF("region_id", "seq", "size"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getString(3)).toMap
      rows.groupBy(_._1).foreach { case (region, files) =>
        val bySeq = files.sortBy(_._2)
        val qualifies = bySeq.map { case (_, seq, size) =>
          val newerSum = bySeq.filter(_._2 > seq).map(_._3).sum
          seq -> (5 * size <= 6 * newerSum)
        }.toMap
        val compacted = bySeq.map(_._2).filter(s => got((region, s)) == "compact")
        // every compacted file qualifies on the independent arithmetic
        compacted.foreach(s => assert(qualifies(s), s"region $region seq $s"))
        val qualifying = bySeq.map(_._2).filter(qualifies)
        val expected =
          if (qualifying.size < 3) Seq.empty else qualifying.takeRight(10)
        assert(compacted == expected,
          s"region $region: got $compacted expected $expected")
      }
    }
  }

  test("hbck chain check: clean chain is all-ok; each damage type gets its verdict") {
    def chainOf(rows: Seq[(Int, String, String)]) =
      rows.toDF("region_id", "start_key", "end_key")
    // clean contiguous chain → every region ok (incl. the open-ended last)
    val clean = BalancerOps.hbckRegionChain(chainOf(Seq(
        (0, "a", "f"), (1, "f", "m"), (2, "m", "s"), (3, "s", "~"))))
      .collect().map(_.getString(3))
    assert(clean.forall(_ == "ok"), clean.mkString(","))
    // one hole (end short of next start), one overlap (end past it)
    val damaged = BalancerOps.hbckRegionChain(chainOf(Seq(
        (0, "a", "d"),   // d < f → hole before region 1
        (1, "f", "p"),   // p > m → overlaps region 2
        (2, "m", "s"),
        (3, "s", "~"))))
      .collect().map(r => r.getInt(0) -> r.getString(3)).toMap
    assert(damaged(0) == "hole" && damaged(1) == "overlap" &&
      damaged(2) == "ok" && damaged(3) == "ok", damaged.toString)
    // duplicate region starts (two regions claiming the same start key —
    // a real hbck damage mode) pair deterministically on the region_id
    // tiebreak and BOTH members carry the verdict (ADVICE r18 #3: the
    // two same-start regions overlap each other by definition, so
    // flagging only the first understated the damage on the second row)
    val dup = BalancerOps.hbckRegionChain(chainOf(Seq(
        (0, "a", "f"),
        (1, "f", "m"),   // shares start "f" with region 2 → duplicate_start
        (2, "f", "x"),   // second of the pair → ALSO duplicate_start
        (3, "x", "~"))))
      .collect().map(r => r.getInt(0) -> r.getString(3)).toMap
    assert(dup(0) == "ok" && dup(1) == "duplicate_start" &&
      dup(2) == "duplicate_start" && dup(3) == "ok", dup.toString)
    // the fixture chain WITHOUT planted damage is clean end to end —
    // the a31 gate's verdicts come from the drift, not the derivation
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("start_key"))
    val derived = BalancerOps.hbckRegionChain(
        graft.ops.BalancerOps.regionStats(spark, sf)
          .select(col("region_id"), col("start_key"))
          .withColumn("end_key",
            coalesce(lead(col("start_key"), 1).over(w), lit("~"))))
      .collect().map(_.getString(3))
    assert(derived.forall(_ == "ok"), derived.mkString(","))
  }

  test("rsgroup placement with one group degenerates to the flat serpentine deal") {
    // cross-validates the two implementations: a single all-regions
    // group must reproduce placementPlan's assignment exactly (server
    // index parsed back from the group-qualified name)
    val regions = (0 until 23).map(i => (i, (i * 53 % 400 + 1).toLong))
      .toDF("region_id", "n_cells")
    val flat = BalancerOps.placementPlan(regions, nServers = 4)
      .collect().map(r => r.getInt(0) -> r.getInt(2)).toMap
    val grouped = BalancerOps.rsgroupPlacementPlan(regions, lit("g"),
        Map("g" -> 4))
      .collect()
      .map(r => r.getInt(0) -> r.getString(3).stripPrefix("g-").toInt).toMap
    assert(grouped == flat,
      s"single-group rsgroup diverged from flat placement: " +
        s"${(grouped.toSet diff flat.toSet).take(5)}")
  }

  test("rsgroup placement fails fast on a region whose group has no fleet") {
    // an unplaced region is an outage, not a no-op: a groupOf value
    // outside serversPerGroup must raise, never silently drop the region
    val regions = (0 until 6).map(i => (i, (i + 1).toLong))
      .toDF("region_id", "n_cells")
    val plan = BalancerOps.rsgroupPlacementPlan(regions,
      when(col("region_id") < 4, "g0").otherwise("ghost"),
      Map("g0" -> 2))
    val e = intercept[Exception](plan.collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("no configured server fleet")),
      s"expected the fail-fast coverage error, got: $e")
  }

  test("server drain: minimal moves, group affinity, empty server drained, re-drain is a no-op") {
    val regions = (0 until 17).map(i => (i, (i * 37 % 300 + 1).toLong))
      .toDF("region_id", "n_cells")
    val plan = BalancerOps.rsgroupPlacementPlan(regions,
      when(col("region_id") % 3 === 0, "g0").otherwise("g1"),
      Map("g0" -> 2, "g1" -> 3)).graftCkpt()
    val before = plan.collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getString(2), r.getString(3)))
      .toMap
    val drainSrv = "g1-1"
    val moves = BalancerOps.serverDrainPlan(plan, drainSrv).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(moves.nonEmpty, "drained server hosted nothing — test is vacuous")
    // minimality: exactly the drained server's regions move, nothing else
    val hosted = before.collect { case (id, (_, _, s)) if s == drainSrv => id }
    assert(moves.map(_._1).toSet == hosted.toSet,
      s"moves ${moves.map(_._1).toSet} != hosted $hosted")
    moves.foreach { case (id, _, from, to) =>
      assert(from == drainSrv && to != drainSrv, s"region $id: $from -> $to")
      // rsgroup constraint: the destination stays inside the region's group
      assert(to.startsWith(before(id)._2 + "-"), s"region $id left its group: $to")
    }
    // apply the moves: the drained server is empty, and draining it
    // again is a no-op plan (drain then re-add changes nothing)
    val applied = plan.as("p")
      .join(moves.toSeq.toDF("region_id", "mc", "from_server", "to_server")
        .select("region_id", "to_server"), Seq("region_id"), "left")
      .select(col("region_id"), col("n_cells"), col("grp"),
        coalesce(col("to_server"), col("server")).as("server"))
    assert(applied.where(col("server") === drainSrv).count() == 0L)
    assert(BalancerOps.serverDrainPlan(applied, drainSrv).count() == 0L,
      "re-draining an emptied server must be a no-op plan")
  }

  test("server drain with a configured fleet: an empty survivor receives moves; " +
      "a fully-hosted fleet matches the placement-only plan") {
    val regions = (0 until 17).map(i => (i, (i * 37 % 300 + 1).toLong))
      .toDF("region_id", "n_cells")
    val groupOf = when(col("region_id") % 3 === 0, "g0").otherwise("g1")
    // place over 2 servers in g1, but the CONFIGURED fleet owns 3: g1-2
    // was just added and hosts nothing — invisible to the placement-only
    // plan, a first-class destination for the fleet-aware overload
    val plan = BalancerOps.rsgroupPlacementPlan(regions, groupOf,
      Map("g0" -> 2, "g1" -> 2)).graftCkpt()
    val fleetMoves = BalancerOps.serverDrainPlan(plan, "g1-1",
        Map("g0" -> 2, "g1" -> 3)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(3)))
    assert(fleetMoves.nonEmpty, "drained server hosted nothing — vacuous")
    assert(fleetMoves.exists(_._3 == "g1-2"),
      s"the empty configured survivor never received a move: ${fleetMoves.toSeq}")
    // load-0 survivor is least-loaded → the biggest evacuated region
    // lands on it first (the serpentine deal's first pick)
    val biggest = fleetMoves.maxBy(m => (m._2, -m._1))
    assert(biggest._3 == "g1-2",
      s"biggest evacuated region went to ${biggest._3}, not the empty server")
    // with every configured server hosting regions, the overload reduces
    // to the placement-only plan (default behavior unchanged)
    val plan3 = BalancerOps.rsgroupPlacementPlan(regions, groupOf,
      Map("g0" -> 2, "g1" -> 3)).graftCkpt()
    val a = BalancerOps.serverDrainPlan(plan3, "g1-1").collect()
      .map(_.toString).sorted.toSeq
    val b = BalancerOps.serverDrainPlan(plan3, "g1-1",
        Map("g0" -> 2, "g1" -> 3)).collect()
      .map(_.toString).sorted.toSeq
    assert(a == b, "fleet-aware overload diverged from the placement-only plan")
  }

  test("server drain fails fast when the drained server is the group's only one") {
    val regions = (0 until 5).map(i => (i, (i + 1).toLong))
      .toDF("region_id", "n_cells")
    val plan = BalancerOps.rsgroupPlacementPlan(regions, lit("solo"),
      Map("solo" -> 1))
    val e = intercept[Exception](
      BalancerOps.serverDrainPlan(plan, "solo-0").collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("no surviving server")),
      s"expected the fail-fast unplaced error, got: $e")
  }

  test("weighted placement: serpentine spread bound holds in cost units and weights matter") {
    // region 0: small but hot (high n_req); region 1: big but cold —
    // under cost = cells + 3*req region 0 MUST outrank region 1
    val regions = Seq(
      (0, 10L, 100L), (1, 200L, 1L), (2, 50L, 20L), (3, 80L, 5L),
      (4, 30L, 40L), (5, 120L, 2L), (6, 5L, 60L), (7, 90L, 10L),
      (8, 40L, 25L), (9, 70L, 15L))
      .toDF("region_id", "n_cells", "n_req")
    val plan = BalancerOps.weightedPlacementPlan(regions, nServers = 3)
      .collect().map(r => (r.getInt(0), r.getLong(3), r.getInt(4)))
    // rank check: cost(0)=310 > cost(1)=203 → region 0 dealt first
    val cost = plan.map(p => p._1 -> p._2).toMap
    assert(cost(0) == 310L && cost(1) == 203L, cost.toString)
    // all servers used, spread bounded by the largest single cost
    val byServer = plan.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    assert(byServer.keySet == Set(0, 1, 2), byServer.toString)
    val spread = byServer.values.max - byServer.values.min
    assert(spread <= plan.map(_._2).max,
      s"serpentine cost spread $spread exceeds the largest region cost")
  }

  test("weighted placement with wReq=0 degenerates to the size-only serpentine deal") {
    val regions = (0 until 23).map(i => (i, (i * 53 % 400 + 1).toLong, (i * 7 % 90).toLong))
      .toDF("region_id", "n_cells", "n_req")
    val flat = BalancerOps.placementPlan(regions.drop("n_req"), nServers = 4)
      .collect().map(r => r.getInt(0) -> r.getInt(2)).toMap
    val weighted = BalancerOps.weightedPlacementPlan(regions, nServers = 4,
        wCells = 1L, wReq = 0L)
      .collect().map(r => r.getInt(0) -> r.getInt(4)).toMap
    assert(weighted == flat,
      s"wReq=0 weighted deal diverged from flat placement: " +
        s"${(weighted.toSet diff flat.toSet).take(5)}")
  }

  test("locality placement: wLoc=0 degenerates to a34; locality genuinely reorders") {
    val regions = (0 until 23)
      .map(i => (i, (i * 53 % 400 + 1).toLong, (i * 7 % 90).toLong,
        (i * 31 % 120).toLong))
      .toDF("region_id", "n_cells", "n_req", "local_blocks")
    // wLoc=0: the locality column is inert — the deal must be exactly
    // a34's two-factor plan (cross-validates the two implementations)
    val flat = BalancerOps.weightedPlacementPlan(
        regions.drop("local_blocks"), nServers = 4)
      .collect().map(r => r.getInt(0) -> r.getInt(4)).toMap
    val loc0 = BalancerOps.localityWeightedPlacementPlan(regions, nServers = 4,
        wLoc = 0L)
      .collect().map(r => r.getInt(0) -> r.getInt(5)).toMap
    assert(loc0 == flat,
      s"wLoc=0 locality deal diverged from the two-factor plan: " +
        s"${(loc0.toSet diff flat.toSet).take(5)}")
    // locality reorders: two regions with IDENTICAL load cost — the
    // well-localized one must rank lower (dealt later) under wLoc>0
    val crafted = Seq(
      (0, 100L, 10L, 40L),  // cost 130 - 2*40 = 50
      (1, 100L, 10L, 0L),   // cost 130 - 0    = 130 → outranks region 0
      (2, 10L, 1L, 0L))
      .toDF("region_id", "n_cells", "n_req", "local_blocks")
    val got = BalancerOps.localityWeightedPlacementPlan(crafted, nServers = 2)
      .collect().map(r => r.getInt(0) -> (r.getLong(4), r.getInt(5))).toMap
    assert(got(1)._1 == 130L && got(0)._1 == 50L, got.toString)
    // rank order: region 1 (cost 130) → server 0; region 0 (cost 50)
    // next → server 1 — without the locality credit both cost 130 and
    // region 0 would win the tiebreak instead
    assert(got(1)._2 == 0 && got(0)._2 == 1,
      s"locality credit failed to reorder the deal: $got")
  }

  test("hbck chain check is invariant under input partitioning") {
    val rows = Seq((0, "a", "d"), (1, "f", "p"), (2, "m", "s"), (3, "s", "~"))
      .toDF("region_id", "start_key", "end_key")
    def verdicts(df: org.apache.spark.sql.DataFrame) =
      BalancerOps.hbckRegionChain(df).orderBy("region_id")
        .collect().map(_.toString).toSeq
    assert(verdicts(rows.repartition(7)) == verdicts(rows.coalesce(1)))
  }

  test("salted read: union of per-bucket sub-scans equals the straight range scan") {
    // the salted layout's read path — one sub-range scan per salt
    // bucket, merged — must reconstruct the logical range exactly
    val cells = Tables.cells(spark, sf)
    val (lo, hi) = ("000000000002:000000000000", "000000000012:000000999999999999")
    val straight = cells.where(col("rowkey") >= lo && col("rowkey") <= hi)
      .collect().map(_.toString).sorted
    val salted = BalancerOps.saltedRangeScan(cells, lo, hi, nBuckets = 8)
    val merged = (0 until 8).map(b => salted.where(col("salt") === b))
      .reduce(_ unionByName _)
      .drop("salt").collect().map(_.toString).sorted
    assert(merged.length > 0 && merged.sameElements(straight),
      s"salted merge lost/duplicated rows: ${merged.length} vs ${straight.length}")
  }

  test("salting spreads sequential keys across buckets and stays balanced") {
    val cells = Tables.cells(spark, sf)
    val salts = cells.select(BalancerOps.saltOf(col("rowkey"), 8).as("salt"))
    // anti-hotspot: a CONTIGUOUS key run (one user's sequential writes —
    // the monotone load salting exists for) must hit many buckets, not one
    val seqRun = cells.orderBy("rowkey").limit(50)
      .select(BalancerOps.saltOf(col("rowkey"), 8).as("salt"))
      .distinct().count()
    assert(seqRun >= 6, s"50 sequential keys hit only $seqRun/8 salt buckets")
    // balance: no bucket dominates (md5 spreads the fixture evenly)
    val counts = salts.groupBy("salt").count().collect().map(_.getLong(1))
    assert(counts.length == 8, s"empty salt bucket: ${counts.length}/8")
    assert(counts.max <= 2 * (counts.sum / counts.length),
      s"salt skew: max ${counts.max} vs avg ${counts.sum / counts.length}")
  }

  test("plans are invariant under input partitioning") {
    val stats = statsOf(Seq(500, 20, 20, 800, 30, 30, 60))
    def norm(df: org.apache.spark.sql.DataFrame) =
      BalancerOps.normalizePlan(df).collect().map(_.toString).sorted.toSeq
    def place(df: org.apache.spark.sql.DataFrame) =
      BalancerOps.placementPlan(df.drop("start_key"), 3)
        .collect().map(_.toString).sorted.toSeq
    assert(norm(stats) == norm(stats.repartition(13)))
    assert(place(stats) == place(stats.repartition(13)))
    // the r18 planners hold the same determinism contract
    def drain(df: org.apache.spark.sql.DataFrame) =
      BalancerOps.serverDrainPlan(
          BalancerOps.rsgroupPlacementPlan(df.drop("start_key"),
            when(col("region_id") % 2 === 0, "g0").otherwise("g1"),
            Map("g0" -> 2, "g1" -> 2)), "g1-0")
        .collect().map(_.toString).sorted.toSeq
    def weighted(df: org.apache.spark.sql.DataFrame) =
      BalancerOps.weightedPlacementPlan(
          df.select(col("region_id"), col("n_cells"),
            (col("n_cells") % 7).as("n_req")), 3)
        .collect().map(_.toString).sorted.toSeq
    assert(drain(stats) == drain(stats.repartition(13)))
    assert(weighted(stats) == weighted(stats.repartition(13)))
    def locality(df: org.apache.spark.sql.DataFrame) =
      BalancerOps.localityWeightedPlacementPlan(
          df.select(col("region_id"), col("n_cells"),
            (col("n_cells") % 7).as("n_req"),
            (col("n_cells") % 11).as("local_blocks")), 3)
        .collect().map(_.toString).sorted.toSeq
    assert(locality(stats) == locality(stats.repartition(13)))
  }
}
