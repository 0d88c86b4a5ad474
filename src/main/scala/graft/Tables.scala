package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loaders + the canonical HBase-style cells layout.
  *
  * Data model rationale (SURVEY.md §1): the reference is an HBase support
  * library; HBase's Bigtable model is `(rowkey, cf, qualifier, ts) -> value`
  * with multi-versioning and delete tombstones. We re-express that model
  * columnar-first: parquet entity tables for analytics, plus a derived
  * "cells" view that restores row-at-a-time KeyValue semantics where the
  * HBase-flavored operators (versions, tombstones, prefix scans, bulk-load
  * split planning) need them.
  *
  * Scale note: every loader returns a plain parquet-backed DataFrame so
  * Catalyst keeps predicate pushdown / column pruning; nothing here forces
  * materialization. At 100 TB the same code reads a partitioned directory
  * tree instead of a single file — the operators downstream are agnostic.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts is parquet `timestamp[us]` (no timezone) as of the 2026-08-13
    * fixture regeneration — Spark reads it as TIMESTAMP_NTZ natively; the
    * pre-regeneration fixtures were TIMESTAMP(NANOS) and needed
    * `spark.sql.legacy.parquet.nanosAsLong`, which is gone with them. The
    * values are bit-identical in the µs domain (old nanos ÷ 1000 exactly),
    * so every µs-domain output is unchanged.
    */
  /** Fixture relations are resolved ONCE per (session, path) and the
    * analyzed DataFrame reused — the same lifecycle a catalog/temp-view
    * table has in any real deployment (and in the stock baseline battery,
    * which registers views once up front). Without this, every query
    * invocation re-ran file listing + parquet footer schema inference
    * inside the timed region: a flat ~0.1–0.2 s per table reference that
    * dominated sub-second shapes (c2_join_broadcast read 3.9× stock at
    * sf1 with an identical pinned plan). The fixtures are immutable for
    * the life of a run, so the cached plan can never go stale; queries
    * that write-then-read scratch data use their own direct reads.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // bounded: a long-lived JVM cycling per-job sessions must not pin
    // every dead session through its cached plans (r11 review). The cache
    // is an epoch cache, not an LRU — blowing it away wholesale is fine
    // because entries cost one footer read to rebuild. (The clear can
    // race a concurrent computeIfAbsent and momentarily exceed the
    // bound — benign: the next load re-clears.)
    if (relCache.size > 256) relCache.clear()
    relCache.computeIfAbsent((spark, s"$sfDir/$name.parquet"),
      kv => kv._1.read.parquet(kv._2))
  }

  /** Drop every cached relation rooted under `path` (all sessions). The
    * memoized DataFrame captures the analyzed relation INCLUDING its file
    * listing, so any writer that regenerates a previously-loaded fixture
    * path in-session MUST call this or queries silently read the stale
    * listing (ADVICE r11). The shipped fixtures are immutable for the
    * life of a run — today's only writers target [[appTmpDir]] scratch
    * dirs, which never flow through [[load]] — so this is the safety
    * hook for future flows, exercised by MiscSpec.
    */
  def invalidate(path: String): Unit = {
    val root = path.stripSuffix("/")
    def covers(key: String): Boolean =
      // Path-component boundary, not plain string prefix: invalidating
      // "/data/sf1" must not drop entries under a sibling "/data/sf10".
      key == root || key.startsWith(root + "/")
    val it = relCache.keySet.iterator()
    while (it.hasNext) if (covers(it.next()._2)) it.remove()
    // countCache is a synchronizedMap — iteration must hold its monitor.
    // Bump the epoch FIRST (inside the monitor) so an in-flight footer
    // computation that started before this invalidate skips its put():
    // compute happens outside the lock (deliberately — footer I/O must
    // not block other paths), so without the epoch a stale count could
    // be re-inserted right after the remove (ADVICE r15).
    countCache.synchronized {
      countEpoch += 1
      val cit = countCache.keySet.iterator()
      while (cit.hasNext) if (covers(cit.next())) cit.remove()
    }
  }

  // guarded by countCache's monitor; see invalidate()
  private var countEpoch: Long = 0L

  private val relCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Epoch-microseconds BIGINT view of a TIMESTAMP_NTZ column. The session
    * timezone is pinned to UTC (build.sbt javaOptions + Bench/Verify conf),
    * so the NTZ → TZ cast is the identity and `unix_micros` is exact —
    * the one sanctioned spelling for "ts as a number" (HBase cell
    * timestamps are longs; windows/gaps/buckets do integer arithmetic).
    */
  def tsMicros(c: Column): Column = unix_micros(c.cast("timestamp"))

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Portable zero-pad used to build lexicographically sortable rowkeys —
    * the standard HBase composite-key encoding (numeric components padded so
    * byte order == numeric order).
    */
  def pad(c: Column): Column = lpad(c.cast("string"), 12, "0")

  private val tmpCleanup = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Per-application scratch dir for sink/scan round-trip queries: the
    * applicationId keeps concurrent runs from clobbering each other, and a
    * once-per-dir JVM shutdown hook deletes it so repeated verify/bench
    * runs don't accumulate table copies in java.io.tmpdir.
    */
  def appTmpDir(s: SparkSession, prefix: String, d: String): String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/${prefix}_" +
      d.replaceAll("[^A-Za-z0-9]", "_") + "_" + s.sparkContext.applicationId
    if (tmpCleanup.putIfAbsent(dir, java.lang.Boolean.TRUE) == null) {
      // a query first issued while the JVM is already shutting down must
      // still run — skip cleanup registration rather than fail the query
      try Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def del(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(del))
          f.delete(); ()
        }
        del(new java.io.File(dir))
      })) catch { case _: IllegalStateException => () }
    }
    dir
  }

  /** On-disk bytes of a fixture table — ONE FileSystem metadata call (no
    * Spark job, no data pages read). The input to
    * [[graft.sources.HFileOps.regionCountForBytes]]'s bulk-write sizing.
    */
  def bytesOnDisk(s: SparkSession, d: String, name: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$d/$name.parquet")
    p.getFileSystem(s.sparkContext.hadoopConfiguration).getContentSummary(p).getLength
  }

  /** Exact row count of a fixture table from PARQUET FOOTER METADATA —
    * O(files) positioned footer reads, never a Spark job (the default
    * `df.count()` runs a columnar count stage even though every footer
    * already carries the answer; VERDICT r12 flagged that job in the
    * bloom-sizing path). Handles both a single parquet file and a
    * directory of part files. Callers that size probabilistic
    * structures from a FILTERED slice use this as the upper bound —
    * bloom sizing only ever needs one.
    */
  def rowCountFromMeta(s: SparkSession, d: String, name: String): Long = {
    // Memoized like relCache (fixtures are immutable for the life of a
    // run; [[invalidate]] drops both): without this, every j46/j47
    // invocation re-opened EVERY part-file footer serially on the
    // driver — O(files) driver I/O per call at a many-part-file scale
    // (ADVICE r13). Wide directories (> 16 part files) read their
    // footers in one tiny metadata-only Spark job instead of a serial
    // driver loop. The memo itself is computed OUTSIDE the cache lock
    // (a racing duplicate footer pass computes the same value — benign)
    // so an LRU get never blocks behind another path's footer I/O.
    val key = s"$d/$name.parquet"
    val hit = countCache.get(key)
    if (hit != null) return hit.longValue()
    val epochAtStart = countCache.synchronized(countEpoch)
    val n: Long = {
      val conf = s.sparkContext.hadoopConfiguration
      val root = new org.apache.hadoop.fs.Path(key)
      val fs = root.getFileSystem(conf)
      val files: Seq[String] =
        if (fs.getFileStatus(root).isDirectory)
          fs.listStatus(root).toSeq.filter(st => st.isFile &&
            st.getPath.getName.endsWith(".parquet")).map(_.getPath.toString)
        else Seq(key)
      def footerCount(conf: org.apache.hadoop.conf.Configuration)(p: String): Long = {
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(p), conf))
        try r.getRecordCount finally r.close()
      }
      if (files.size <= 16) files.map(footerCount(conf)).sum
      else {
        val ser = new org.apache.spark.util.SerializableConfiguration(conf)
        s.sparkContext.parallelize(files, math.min(files.size, 64))
          .map(p => footerCount(ser.value)(p)).sum().toLong
      }
    }
    // re-insert only if no invalidate() ran while the footers were being
    // read — otherwise this put would resurrect a count the caller just
    // declared stale (the ordering computeIfAbsent used to guarantee)
    countCache.synchronized {
      if (countEpoch == epochAtStart)
        countCache.put(key, java.lang.Long.valueOf(n))
    }
    n
  }

  // Access-ordered LRU, not an epoch cache: a count costs O(files)
  // footer I/O to rebuild, so when a long-lived JVM crosses the bound
  // the LEAST-RECENTLY-USED path should fall out, not the whole memo
  // (VERDICT r14 flagged the previous clear()-on-overflow). The
  // synchronizedMap wrapper is the mutex; [[invalidate]] iterates under
  // the same monitor.
  private val countCache: java.util.Map[String, java.lang.Long] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, java.lang.Long](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, java.lang.Long]): Boolean =
          size() > 1024
      })

  /** Canonical cells view (SURVEY.md §1.1 / Appendix A): one HBase-style
    * cell per event. `op` synthesizes delete tombstones deterministically.
    * rowkey = user:event so the key space is dense and range-scannable.
    * `ts` is epoch-µs BIGINT (HBase cell timestamps are longs; DuckDB twin:
    * `CAST(epoch_us(ts) AS BIGINT)`).
    */
  def cells(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
    ev.select(
      concat(pad(col("user_id")), lit(":"), pad(col("event_id"))).as("rowkey"),
      lit("e").as("cf"),
      col("event_type").as("qualifier"),
      tsMicros(col("ts")).as("ts"),
      col("value"),
      when(col("event_id") % 97 === 0, "delete").otherwise("put").as("op"))
  }
}
