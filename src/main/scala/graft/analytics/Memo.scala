package graft.analytics

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Session-scoped memo of deterministic DERIVED FRAMES, keyed by the
  * canonicalized analyzed plans of their inputs — the frame-valued
  * sibling of the trained-model memo (Selection.scala): several catalog
  * gates legitimately share one expensive subtree (the q19 LSH candidate
  * graph feeds PageRank, triangles, k-core, LPA, Bradley-Terry; the BM25
  * ranking feeds its own gate and the retrieval-metrics gate), and each
  * gate must stay independently verifiable — so the ENGINE caches, the
  * gates don't know.
  *
  * Soundness contract: memoized operators must be DETERMINISTIC
  * functions of their input frames (every candidate here is — md5-seeded
  * MinHash, fixed-iteration recurrences, round-6 pinned scores), so a
  * memo hit is bit-identical to a recompute. Keys hold the CANONICALIZED
  * analyzed plan of each input (expr ids normalized — two reads of the
  * same table match, in-memory inputs compare their data) plus the
  * session UUID (a new session may see new data at the same path;
  * `sessionUUID` rather than an identity hash so a restarted session can
  * never collide into a prior session's entries).
  *
  * Storage: each entry is a PARQUET SNAPSHOT, NOT a cached/checkpointed
  * RDD — block-manager entries die to any `unpersist`-all hygiene sweep
  * (the bench does one per measured query) and executor loss, while a
  * file snapshot survives both and re-reads as a plain pruned columnar
  * scan. Snapshot PLACEMENT is a deployment dial (the same shape as
  * [[Par.materialize]]'s reliable-checkpoint dial):
  *
  *   1. `spark.graft.memo.dir` set → snapshots live under it. Point it
  *      at the shared filesystem (HDFS/S3) on any multi-node cluster —
  *      executors and the driver must see the same files.
  *   2. else a checkpoint dir is configured (`SparkContext
  *      .setCheckpointDir` or `spark.graft.checkpoint.dir`) → snapshots
  *      live under `<checkpointDir>/graft-memo` — a session that already
  *      configured a reliable shared directory gets memo hits for free.
  *   3. else, LOCAL master only → `java.io.tmpdir` (one host, so a
  *      local-FS write is visible to every "executor" thread and the
  *      driver read); the path is explicitly `file:`-qualified so an
  *      HDFS `defaultFS` cannot split the write and the exists/delete
  *      bookkeeping across two filesystems.
  *   4. else (non-local master, nothing configured) → the memo is
  *      BYPASSED: every call computes its build expression directly.
  *      Correct (the build path is the priced, verified pipeline) and
  *      safe — a driver-local snapshot on a multi-node cluster would be
  *      a partial or failed read for every consumer.
  *
  * All snapshot IO (write, read, exists, delete) goes through the Hadoop
  * `FileSystem` resolved from the SAME qualified path, so eviction and
  * invalidation always delete the files the write produced. At cluster
  * scale this is exactly the "build the index once, probe it many times"
  * lake pattern (CorpusIndex.scala persists the same artifacts
  * explicitly); the memo just manages the lifecycle for intra-session
  * reuse.
  *
  * Lifecycle: eviction past `maxEntries` and invalidation NEVER delete a
  * snapshot directory immediately — handed-out frames are lazy, so a
  * consumer planned before an eviction/publish may scan after it.
  * Dropped entries are CONDEMNED and their directories reaped only once
  * they are older than `spark.graft.memo.grace.ms` (default 15 min —
  * far beyond any plan-to-scan gap in a serving micro-batch or bench
  * pass); a JVM shutdown hook purges everything unconditionally.
  *
  * Staleness: the memo keys on the input PLAN, not file contents —
  * immutable inputs per session (the lakehouse norm) make that sound,
  * but any path that OVERWRITES data a memoized operator may have read
  * must call [[Memo.invalidateAll]] (the serving layer's publish path
  * does; it is the moral equivalent of Spark's `REFRESH TABLE`).
  */
object Memo {

  private val memos =
    new java.util.concurrent.CopyOnWriteArrayList[SessionMemo]()

  private[analytics] def register(m: SessionMemo): Unit = memos.add(m)

  /** Drop every memoized frame/value AND every memoized trained model,
    * engine-wide. Call after overwriting any dataset a memoized
    * operator may have read. Snapshot directories are condemned, not
    * deleted — see the grace-period contract in the class doc. */
  def invalidateAll(): Unit = {
    memos.asScala.foreach(_.invalidate())
    Selection.invalidateModels()
  }

  /** Grace window (ms) before a condemned snapshot directory is
    * deleted. Adopted from `spark.graft.memo.grace.ms` on each frame
    * memo call; the default outlives any plan-to-scan gap a lazy
    * consumer realistically carries. */
  @volatile private[graft] var graceMs: Long = 15 * 60 * 1000L

  /** Per-memo counters for the bench artifact: builds (snapshot writes
    * for frame memos, driver-value computes for value memos, model
    * trainings for the logreg cache), their total wall seconds, hits,
    * and bypasses — so build cost is attributed to the memo, not to
    * whichever gate happened to run first in catalog order. */
  def stats(): Map[String, Map[String, Double]] =
    memos.asScala.flatMap {
      case f: FrameMemo =>
        Some(f.memoName -> Map(
          "builds" -> f.builds.get().toDouble,
          "build_s" -> f.buildNanos.get() / 1e9,
          "hits" -> f.hits.get().toDouble,
          "bypasses" -> f.bypasses.get().toDouble))
      case v: ValueMemo[_] =>
        Some(v.memoName -> Map(
          "builds" -> v.builds.get().toDouble,
          "build_s" -> v.buildNanos.get() / 1e9,
          "hits" -> v.hits.get().toDouble))
      case _ => None // a future SessionMemo kind reports nothing,
                     // never a MatchError at bench time
    }.toMap ++ Map(
      "logreg_models" -> Map(
        "builds" -> Selection.modelCacheBuilds.get().toDouble,
        "build_s" -> Selection.modelCacheBuildNanos.get() / 1e9,
        "hits" -> Selection.modelCacheHits.get().toDouble))

  /** Reset the [[stats]] counters (bench isolation). */
  private[graft] def resetStats(): Unit = {
    memos.asScala.foreach {
      case f: FrameMemo =>
        f.builds.set(0); f.buildNanos.set(0); f.hits.set(0)
        f.bypasses.set(0)
      case v: ValueMemo[_] =>
        v.builds.set(0); v.buildNanos.set(0); v.hits.set(0)
      case _ => ()
    }
    Selection.modelCacheBuilds.set(0)
    Selection.modelCacheBuildNanos.set(0)
    Selection.modelCacheHits.set(0)
  }

  // Traffic-free reaping: sweep() otherwise runs only inside
  // getOrCompute/invalidate, so a long-lived server that stops calling
  // memoized operators would hold grace-expired condemned directories
  // until JVM exit. A single daemon thread ticks the sweeps instead;
  // each tick is a queue peek (no-op when nothing is condemned), so a
  // short period costs nothing.
  private val SweepTickMs = 2000L
  locally {
    val t = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val th = new Thread(r, "graft-memo-sweeper")
        th.setDaemon(true)
        th
      })
    t.scheduleWithFixedDelay(() => memos.asScala.foreach {
      case f: FrameMemo =>
        try f.sweep() catch { case _: Throwable => () }
      case _ => ()
    }, SweepTickMs, SweepTickMs,
      java.util.concurrent.TimeUnit.MILLISECONDS)
  }

  // At JVM exit, purge every snapshot this process created (live and
  // condemned, no grace) — a session-scoped memo must not leak files
  // into a shared memo dir across runs. Registered with the Hadoop
  // shutdown-hook manager ABOVE FileSystem's close priority (10) so
  // the delete runs while the filesystems are still open.
  org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
    new Runnable {
      override def run(): Unit =
        memos.asScala.foreach {
          case f: FrameMemo => f.purge()
          case _ => ()
        }
    }, 25)

  /** Stable per-session identity for memo keys: a UUID assigned to each
    * live session object and held WEAKLY — never an identity hash,
    * which can collide across session restarts (a restarted session
    * whose object lands on a recycled hash must not hit a snapshot
    * built from the prior session's view of a since-changed path). The
    * weak reference guarantees a stopped-and-collected session's id is
    * never reused: a replacement session object always maps to a fresh
    * UUID. (The runtime's own `sessionUUID` is `private[sql]`, so the
    * engine assigns its own.) */
  private[analytics] def sessionId(spark: SparkSession): String =
    sessionIds.computeIfAbsent(
      spark, _ => java.util.UUID.randomUUID().toString)

  private val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  /** The placement decision, pure so the spec can pin every branch:
    * memo dir, else checkpoint dir + `/graft-memo`, else tmpdir on a
    * local master, else None (= bypass). Shared with the single-file
    * sink assembly ([[graft.sinks.PartFiles]]), which has the same
    * "distributed write must land where the driver can read it back"
    * problem and the same correct degraded mode when nothing shared is
    * configured. */
  private[graft] def resolveRootUri(
      memoDir: Option[String],
      checkpointDir: Option[String],
      isLocal: Boolean): Option[String] =
    memoDir
      .orElse(checkpointDir.map(d => d.stripSuffix("/") + "/graft-memo"))
      .orElse(if (isLocal)
        Some("file:" + java.lang.System.getProperty("java.io.tmpdir")
          .stripSuffix("/") + "/graft-memo")
      else None)

  private[graft] def resolveRootUri(spark: SparkSession): Option[String] =
    placementOverrideForTests.getOrElse {
      val sc = spark.sparkContext
      resolveRootUri(
        spark.conf.getOption("spark.graft.memo.dir"),
        sc.getCheckpointDir
          .orElse(spark.conf.getOption("spark.graft.checkpoint.dir")),
        sc.isLocal)
    }

  /** Whether frame memos will snapshot (vs bypass) in this session —
    * operators whose build consumes a memoized frame several times use
    * this to decide if they must Par.materialize it themselves: a
    * snapshot IS already materialized (a parquet read), while a
    * bypassed memo hands back the raw lineage. */
  private[graft] def snapshotsActive(spark: SparkSession): Boolean =
    resolveRootUri(spark).isDefined

  /** Test seam: a local[N] suite cannot present a non-local master, so
    * the bypass EXECUTION path (not just the decision function) is
    * pinned by forcing the resolved placement. `Some(None)` = bypass;
    * `Some(Some(uri))` = snapshot under `uri`; `None` = real decision. */
  @volatile private[graft] var placementOverrideForTests
      : Option[Option[String]] = None
}

/** Common surface of the session memos, for central invalidation. */
private[graft] trait SessionMemo { def invalidate(): Unit }

/** Plan-keyed LRU of DRIVER-SIDE values (trained centroid models,
  * bounded dictionaries — anything model-sized that gates re-derive
  * from the same inputs). The value lives on the driver, so unlike
  * [[FrameMemo]] no snapshot lifecycle (and no placement dial) exists;
  * the soundness contract is the same — the computing closure must be a
  * deterministic function of the keyed inputs. */
private[graft] final class ValueMemo[V](name: String, maxEntries: Int = 64)
    extends SessionMemo {

  Memo.register(this)

  private[graft] def memoName: String = name

  private case class Key(session: String, plans: Seq[LogicalPlan], params: String)

  private val cache =
    new java.util.LinkedHashMap[Key, V](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Key, V]): Boolean = size() > maxEntries
    }

  private[graft] val hits = new java.util.concurrent.atomic.AtomicLong(0)
  private[graft] val builds = new java.util.concurrent.atomic.AtomicLong(0)
  private[graft] val buildNanos = new java.util.concurrent.atomic.AtomicLong(0)

  def getOrCompute(inputs: Seq[DataFrame], params: String)(build: => V): V = {
    require(inputs.nonEmpty, "memo needs at least one input frame")
    val key = Key(Memo.sessionId(inputs.head.sparkSession),
      inputs.map(_.queryExecution.analyzed.canonicalized), params)
    synchronized { Option(cache.get(key)) } match {
      case Some(v) => hits.incrementAndGet(); v
      case None =>
        val t0 = java.lang.System.nanoTime()
        val v = build
        builds.incrementAndGet()
        buildNanos.addAndGet(java.lang.System.nanoTime() - t0)
        synchronized {
          Option(cache.get(key)).getOrElse { cache.put(key, v); v }
        }
    }
  }

  def invalidate(): Unit = synchronized { cache.clear() }
}

/** One memo table: plan-keyed LRU of parquet-snapshot directories on
  * the filesystem [[Memo.resolveRootUri]] selects (bypassing entirely
  * when a non-local master has no shared directory configured).
  * Eviction and invalidation CONDEMN directories; a sweep deletes them
  * only after `spark.graft.memo.grace.ms`, so a lazily-planned frame
  * handed out before the drop still reads its files. */
private[graft] final class FrameMemo(name: String, maxEntries: Int = 32)
    extends SessionMemo {

  Memo.register(this)

  private[graft] def memoName: String = name

  private case class Key(session: String, plans: Seq[LogicalPlan], params: String)
  private case class Snap(fs: FileSystem, dir: HPath)

  private val cache =
    new java.util.LinkedHashMap[Key, Snap](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Key, Snap]): Boolean = {
        val evict = size() > maxEntries
        if (evict) condemn(e.getValue)
        evict
      }
    }

  // (snapshot, condemnedAt nanos) — deleted by sweep() once older than
  // the grace window, or unconditionally by purge() at JVM exit
  private val condemned =
    new java.util.concurrent.ConcurrentLinkedQueue[(Snap, Long)]()

  private[graft] val hits = new java.util.concurrent.atomic.AtomicLong(0)
  private[graft] val builds = new java.util.concurrent.atomic.AtomicLong(0)
  private[graft] val buildNanos = new java.util.concurrent.atomic.AtomicLong(0)
  private[graft] val bypasses = new java.util.concurrent.atomic.AtomicLong(0)

  /** Return the memoized frame for (inputs, params), computing and
    * snapshotting `build` on first use. `inputs` should be the MINIMAL
    * column projections the operator actually reads (so an unrelated
    * extra column on the caller's frame does not fragment the key).
    * Feed LOGICAL plans, never checkpointed/materialized frames: a
    * localCheckpoint leaf carries a fresh RDD identity per
    * materialization, so such a key can never hit and re-snapshots on
    * every call (file-backed reads and in-memory relations both
    * canonicalize stably). */
  def getOrCompute(inputs: Seq[DataFrame], params: String)
                  (build: => DataFrame): DataFrame = {
    require(inputs.nonEmpty, "memo needs at least one input frame")
    val spark = inputs.head.sparkSession
    spark.conf.getOption("spark.graft.memo.grace.ms")
      .flatMap(_.toLongOption).foreach(Memo.graceMs = _)
    sweep()
    val rootUri = Memo.resolveRootUri(spark)
    if (rootUri.isEmpty) {
      // non-local master, no shared directory configured: a snapshot
      // would be driver-local and unreadable (or partial) from the
      // executors — compute the priced build path instead
      bypasses.incrementAndGet()
      return build
    }
    val key = Key(Memo.sessionId(spark),
      inputs.map(_.queryExecution.analyzed.canonicalized), params)
    val cached = synchronized { Option(cache.get(key)) }
    cached match {
      case Some(snap) if snap.fs.exists(snap.dir) =>
        hits.incrementAndGet()
        spark.read.parquet(snap.dir.toString)
      case _ =>
        val hconf = spark.sparkContext.hadoopConfiguration
        val root = new HPath(rootUri.get)
        val fs = root.getFileSystem(hconf)
        // session-scoped, collision-free leaf under the shared root;
        // qualified so read/exists/delete address the FS the write used
        val dir = fs.makeQualified(new HPath(root,
          s"${Memo.sessionId(spark)}/${name}_" +
            java.util.UUID.randomUUID().toString.take(12)))
        val t0 = java.lang.System.nanoTime()
        build.write.mode("overwrite").parquet(dir.toString)
        builds.incrementAndGet()
        buildNanos.addAndGet(java.lang.System.nanoTime() - t0)
        val snap = Snap(fs, dir)
        val winner = synchronized {
          // two concurrent first calls both compute (same bits — the
          // operators are deterministic); keep one snapshot
          Option(cache.get(key)).filter(s => s.fs.exists(s.dir)) match {
            case Some(existing) => condemn(snap); existing
            case None => cache.put(key, snap); snap
          }
        }
        spark.read.parquet(winner.dir.toString)
    }
  }

  /** Drop every entry; directories are condemned (grace-deferred), not
    * deleted — an in-flight consumer planned before a publish keeps its
    * files until the grace window lapses. */
  def invalidate(): Unit = {
    synchronized {
      cache.values().asScala.foreach(condemn)
      cache.clear()
    }
    sweep()
  }

  private def condemn(snap: Snap): Unit =
    condemned.add((snap, java.lang.System.nanoTime()))

  /** Delete condemned directories older than the grace window. Runs
    * inside getOrCompute/invalidate AND on [[Memo]]'s background tick,
    * so a traffic-less server still reaps. */
  private[analytics] def sweep(): Unit = {
    val cutoff = java.lang.System.nanoTime() - Memo.graceMs * 1000000L
    var head = condemned.peek()
    while (head != null && head._2 <= cutoff) {
      if (condemned.remove(head)) deleteDir(head._1)
      head = condemned.peek()
    }
  }

  /** JVM-exit cleanup: delete every snapshot this memo created — live
    * and condemned, no grace. */
  private[graft] def purge(): Unit = {
    invalidate()
    var next = condemned.poll()
    while (next != null) { deleteDir(next._1); next = condemned.poll() }
  }

  private def deleteDir(snap: Snap): Unit =
    try snap.fs.delete(snap.dir, true)
    catch { case _: java.io.IOException => () }
}
