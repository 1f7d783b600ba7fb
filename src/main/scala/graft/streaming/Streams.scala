package graft

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming pipelines (SURVEY §2.D — beyond-parity; the
  * reference syncs batches on a timer, it has no streaming engine at all).
  * Each pipeline is the streaming form of a batch operator in the inventory
  * and is pinned to the batch result by StreamingSpec.
  *
  * Scale notes: all three shapes are the standard 1000-executor ones —
  * stateful ops shuffle by key once and keep per-key state in the state
  * store (RocksDB in production), the stream-static join broadcasts the dim
  * side, and watermarks bound state size.
  */
object Streams {

  case class SessEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
      session_start: java.sql.Timestamp)

  /** Gap-based sessionization (30-minute inactivity) via
    * flatMapGroupsWithState — the custom-state streaming operator. Sessions
    * are emitted per micro-batch; an always-on deployment would hold the
    * open tail session in state with an event-time timeout, here the
    * AvailableNow batch carries the full group so every session closes.
    * Matches the batch window formulation in st_sessionize exactly. */
  def sessionize(events: DataFrame): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("user_id", "event_id", "ts").as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessEvent], SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[SessEvent], state: GroupState[List[SessEvent]]) =>
          val evs = (state.getOption.getOrElse(Nil) ++ it)
            .sortBy(e => (e.ts.getTime, e.event_id))
          state.update(Nil)
          if (evs.isEmpty) Iterator.empty
          else {
            val out = Seq.newBuilder[SessionOut]
            var sessionId = 0L
            var start = evs.head.ts
            var n = 0L
            var prev: java.sql.Timestamp = null
            evs.foreach { e =>
              if (prev == null || (e.ts.getTime - prev.getTime) / 1000 > 1800) {
                if (n > 0) out += SessionOut(uid, sessionId, n, start)
                sessionId += 1; start = e.ts; n = 0
              }
              n += 1; prev = e.ts
            }
            if (n > 0) out += SessionOut(uid, sessionId, n, start)
            out.result().iterator
          }
      }
  }

  case class FunnelEvent(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, event_type: String)
  case class FunnelOut(user_id: Long, t_signup: java.sql.Timestamp,
      t_click: java.sql.Timestamp, t_purchase: java.sql.Timestamp, stage: Int)

  /** Streaming ordered funnel (signup -> click -> purchase) with the exact
    * chained-min semantics of the batch ev_funnel: t_click = min click ts at
    * or after the first signup, t_purchase = min purchase ts at or after
    * t_click. Events accumulate in per-user state; each micro-batch emits
    * the user's current funnel snapshot (an always-on deployment would emit
    * on event-time timeout instead — AvailableNow carries the full group,
    * so the single emission is final). */
  def funnel(events: DataFrame): Dataset[FunnelOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("user_id", "event_id", "ts", "event_type").as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[FunnelEvent], FunnelOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[FunnelEvent], state: GroupState[List[FunnelEvent]]) =>
          val evs = state.getOption.getOrElse(Nil) ++ it
          state.update(evs)
          def minTs(tpe: String, atOrAfter: Option[java.sql.Timestamp]) = {
            val c = evs.filter(e => e.event_type == tpe &&
              atOrAfter.forall(a => !e.ts.before(a))).map(_.ts)
            if (c.isEmpty) None else Some(c.min(Ordering.by((t: java.sql.Timestamp) => t.getTime)))
          }
          minTs("signup", None) match {
            case None => Iterator.empty // funnel starts at signup
            case some @ Some(tSignup) =>
              val tClick = minTs("click", some)
              val tPurchase = tClick.flatMap(tc => minTs("purchase", Some(tc)))
              val stage = if (tPurchase.isDefined) 3 else if (tClick.isDefined) 2 else 1
              Iterator.single(FunnelOut(uid, tSignup,
                tClick.orNull, tPurchase.orNull, stage))
          }
      }
  }

  /** Exactly-once event-id dedup with bounded state: duplicates arriving
    * within the watermark horizon are dropped, state for old ids is
    * reclaimed as the watermark advances. */
  def dedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static join: the streaming fact side joins a static dimension;
    * Catalyst broadcasts the dim like any batch join, no state needed.
    * The hint is gated on the static side's own plan-stats size estimate —
    * customer grows with SF, and stream-static joins see no AQE, so an
    * unconditional hint would force a multi-GB broadcast every micro-batch
    * at 100 TB-class scale; above the gate the planner's threshold rules
    * decide. */
  def enrich(events: DataFrame, customer: DataFrame): DataFrame = {
    val est = customer.queryExecution.optimizedPlan.stats.sizeInBytes
    val dim = if (est <= Tables.BroadcastGateBytes) broadcast(customer) else customer
    events.join(dim, col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("c_mktsegment"), col("value"))
  }

  /** Watermarked stream-stream interval join: each `view` event joins the
    * same user's `purchase` events that land within [view_ts, view_ts + 30
    * min]. Both sides are watermarked so the state store retains only the
    * interval horizon per side — the bounded-state shape that makes
    * stream-stream joins viable on a 1000-executor cluster (state is
    * sharded by the join key, expiry driven by event time, not row count). */
  def correlate(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val p = purchases
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    v.join(p, expr(
      "v_user = p_user AND p_ts >= v_ts AND p_ts <= v_ts + interval 30 minutes"))
      .select(col("v_user").as("user_id"), col("view_id"), col("purchase_id"),
        col("v_ts"), col("p_ts"))
  }

  /** CDC apply loop: a stream of keyed change rows
    * `(op: upsert|delete, seq, key, payload…)` folded into a [[Store]]
    * table once per micro-batch via foreachBatch — the reference's
    * timer-driven incremental sync re-expressed as an always-on stream.
    * Each batch is first compacted to the highest-seq change per key
    * (the Debezium->MERGE shape), then applied through the same
    * footer-pruned upsert/delete the batch write path uses, so a 1-row
    * change never rewrites the table. Checkpointing gives exactly-once
    * apply per batch id. */
  def cdcApply(changes: DataFrame, store: Store, table: String, key: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.expressions.Window
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val w = Window.partitionBy(col(key)).orderBy(col("seq").desc)
        val latest = batch.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        val ups = latest.filter(col("op") === "upsert").drop("op", "seq")
        val dels = latest.filter(col("op") === "delete").select(col(key))
        // post-compaction the key sets are disjoint; apply order is free
        if (!ups.isEmpty) store.upsert(table, ups, key)
        if (!dels.isEmpty) store.deleteByKey(table, dels, key)
        ()
      }
      .start()
  }

  /** Streaming materialized view: every micro-batch lands in the store
    * through the compacting append (files at size carry unchanged between
    * versions) and the additive aggregate view then refreshes
    * INCREMENTALLY — per trigger the refresh aggregates only that batch's
    * changed files, so a continuously-ingesting table keeps a hot
    * aggregate at O(batch) cost instead of O(table) per refresh. The
    * compaction's rewrites are retracted exactly (sign -1) by the same
    * file-diff the batch IVM path uses. Replay safety is EXACTLY-once per
    * batch id: the batch id is recorded in the store catalog in the same
    * commit as the appended rows (marker set before the append; the
    * append's catalog persist carries it), so a micro-batch replayed after
    * a crash between the append-commit and the checkpoint commit finds its
    * marker, skips the append, and only re-runs the idempotent refresh. */
  /** The checkpoint's query id (`metadata` uuid, minted when the checkpoint
    * dir is first created). Keying stream markers on it — not the path —
    * means deleting and recreating the same checkpoint dir (batch ids
    * restart at 0) can never match a stale marker and silently drop
    * batches. Empty string if unreadable (pre-start call, foreign FS). */
  private[graft] def checkpointRunId(
      spark: org.apache.spark.sql.SparkSession, checkpoint: String): String =
    try {
      val p = new org.apache.hadoop.fs.Path(checkpoint, "metadata")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(p)) ""
      else {
        val in = fs.open(p)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        "\"id\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(s)
          .map(_.group(1)).getOrElse("")
      }
    } catch { case _: Exception => "" }

  // ---- change-feed replication (downstream CDC) --------------------------
  // The consumer half of the store's row-level change feed: a mirror table
  // follows a source table by applying each version span's NET delta —
  // O(changed files) per poll via the carried-file diff, never a full copy.
  // Convergence is by IDEMPOTENCE, not coordination: the net delta between
  // two snapshots re-applies harmlessly (upsert of identical rows and
  // delete of absent keys are no-ops), so any crash window replays to the
  // same mirror state; the durable watermark only bounds how far back a
  // replay re-reads. At 100 TB this is the cross-warehouse replication
  // shape: the feed ships only changed files' rows, and the apply is the
  // same footer-pruned upsert/delete the write path uses.

  /** Seed `mirror` as a copy of `source` and set the follower watermark, so
    * the first [[applyChanges]] starts from the copied version. */
  def initMirror(store: Store, source: String, mirror: String, key: String): Unit = {
    store.replace(mirror, store.read(source))
    store.commitStreamBatch(s"cf:$source->$mirror", store.currentVersion(source))
  }

  /** Apply all source versions past the watermark to the mirror; returns
    * the number of change rows applied (0 when already caught up). */
  def applyChanges(store: Store, source: String, mirror: String,
      key: String): Long = {
    val marker = s"cf:$source->$mirror"
    val from = store.lastStreamBatch(marker).map(_.toInt).getOrElse(
      throw new IllegalStateException(s"mirror $mirror not initialized (initMirror)"))
    val to = store.currentVersion(source)
    if (to <= from) return 0L
    val delta = store.readChanges(source, from, to).cache()
    try {
      val applied = delta.count()
      val ups = delta.filter(col("_change_type") === "insert").drop("_change_type")
      // a key both deleted and (re)inserted in the span nets to the insert
      val dels = delta.filter(col("_change_type") === "delete").select(col(key))
        .except(ups.select(col(key)))
      if (!ups.isEmpty) store.upsert(mirror, ups, key)
      if (!dels.isEmpty) store.deleteByKey(mirror, dels, key)
      // watermark commits LAST: a crash anywhere above replays the same
      // net delta idempotently instead of losing the tail
      store.commitStreamBatch(marker, to)
      applied
    } finally { delta.unpersist(); () }
  }

  /** Always-on follower: a rate ticker drives [[applyChanges]] polling.
    * The checkpoint only pins the ticker; correctness lives in the store
    * watermark + idempotent apply, so the checkpoint can be discarded
    * freely. */
  def changeFeedStream(spark: org.apache.spark.sql.SparkSession, store: Store,
      source: String, mirror: String, key: String, checkpoint: String,
      intervalMs: Long = 500): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("rate").option("rowsPerSecond", "2").load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(intervalMs))
      .foreachBatch { (_: DataFrame, _: Long) =>
        applyChanges(store, source, mirror, key); ()
      }
      .start()

  def streamingMatview(rows: DataFrame, store: Store, table: String,
      view: String, groupCols: Seq[String], sumCols: Seq[String],
      checkpoint: String,
      avgCols: Seq[String] = Nil): org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batch ids are scoped to the checkpoint's query id (see
        // checkpointRunId); markers from a dead incarnation of the same
        // path are dropped here and the drop rides this batch's commit
        val streamKey =
          s"mv:$checkpoint@${checkpointRunId(batch.sparkSession, checkpoint)}"
        store.streamBatchKeys
          .filter(k => k.startsWith(s"mv:$checkpoint@") && k != streamKey)
          .foreach(store.dropStreamBatch)
        applyMatviewBatch(store, table, view, groupCols, sumCols, avgCols,
          streamKey, batchId, batch)
      }
      .start()

  /** One micro-batch of [[streamingMatview]], exactly-once per batch id
    * (factored out so the replay/crash paths are spec-testable without the
    * streaming machinery). */
  private[graft] def applyMatviewBatch(store: Store, table: String,
      view: String, groupCols: Seq[String], sumCols: Seq[String],
      avgCols: Seq[String], streamKey: String, batchId: Long,
      batch: DataFrame): Unit = {
    if (store.lastStreamBatch(streamKey).exists(_ >= batchId)) {
      // replayed, already-applied batch: the rows are in the table;
      // bring the view to that state — CREATING it if the crash landed
      // between the append-commit and the first batch's view creation
      if (!store.exists(view))
        store.createIncrementalMatview(view, table, groupCols, sumCols, avgCols)
      else { store.incrementalRefresh(view); () }
    } else {
      val prevMarker = store.lastStreamBatch(streamKey)
      val verBefore =
        if (store.exists(table)) store.currentVersion(table) else -1
      store.noteStreamBatch(streamKey, batchId)
      try store.appendCompacting(table, batch)
      catch { case e: Throwable =>
        // roll the marker back ONLY if the append really did not commit
        // (version unchanged): appendCompacting can throw after the
        // catalog persisted, and a blind clear would let an in-session
        // retry of this batch id double-append
        val verAfter =
          if (store.exists(table)) store.currentVersion(table) else -1
        if (verAfter == verBefore)
          store.restoreStreamBatch(streamKey, prevMarker)
        throw e }
      if (!store.exists(view))
        store.createIncrementalMatview(view, table, groupCols, sumCols, avgCols)
      else store.incrementalRefresh(view)
    }
  }
}
