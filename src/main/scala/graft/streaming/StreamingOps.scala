package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming semantics of the reference's continuous constructs
  * (SURVEY.md §2.2 "Streaming"):
  *
  *  - `CREATE MATERIALIZED VIEW ... TO target AS SELECT` (ClickHouseParser.py:
  *    4085-4133): a continuously-maintained aggregate over an append stream
  *    → Structured Streaming query writing to the target; `POPULATE` is the
  *    initial batch backfill (same transform, batch read).
  *  - `WATCH view` (ClickHouseParser.py:14249-14321): a subscription to the
  *    view's refreshes → a streaming query over the same plan with a
  *    client-facing sink.
  *  - LIVE VIEW engine kind (ch_view_dependencies.py:302): modeled as the
  *    MV case with complete-mode output.
  *
  * The reference executes nothing streaming itself — these exceed parity
  * (noted divergence, SURVEY.md §2.2) and are kept operator-shaped: a
  * transform function from source DataFrame to result DataFrame, applied
  * identically in batch (POPULATE/backfill) and streaming (refresh) mode —
  * the Kappa pattern that keeps the two paths provably consistent.
  */
object StreamingOps {

  /** A materialized view definition: one transform applied in both batch
    * (populate) and streaming (continuous refresh) mode. */
  final case class MaterializedView(
      name: String,
      transform: DataFrame => DataFrame)

  /** POPULATE: batch backfill of the MV over existing data. */
  def populate(mv: MaterializedView, source: DataFrame): DataFrame =
    mv.transform(source)

  /** Continuous refresh: the same transform over a file stream, written
    * to an in-memory sink named after the MV (stand-in for the `TO target`
    * table; swap the sink format for parquet/kafka in production).
    * Watermarking/output mode are the caller's choice via the transform. */
  def refresh(
      spark: SparkSession,
      mv: MaterializedView,
      sourceDir: String,
      schema: StructType,
      outputMode: OutputMode = OutputMode.Complete()
  ): StreamingQuery = {
    val src = spark.readStream.schema(schema).parquet(sourceDir)
    mv.transform(src).writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(mv.name)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** MV registry backing [[watch]] — CH registers MVs in the catalog; the
    * WATCH statement subscribes by name. */
  private val mvRegistry =
    scala.collection.concurrent.TrieMap.empty[String, MaterializedView]

  def register(mv: MaterializedView): Unit = mvRegistry.put(mv.name, mv)

  def dropView(name: String): Unit = mvRegistry.remove(name)

  /** `WATCH view` (watchStmt, ClickHouseParser.py:14249-14321): a
    * client-facing subscription to a registered view's continuous
    * refreshes. Returns the STREAMING twin of the registered transform
    * over the view's source — each micro-batch emits the refreshed rows,
    * which is CH's WATCH contract (a result-version stream; add `.limit`
    * on the caller side for WATCH ... LIMIT n). The caller attaches the
    * sink (console for an interactive client, memory for tests). */
  def watch(
      spark: SparkSession,
      viewName: String,
      sourceDir: String,
      schema: StructType
  ): DataFrame = {
    val mv = mvRegistry.getOrElse(viewName,
      throw new IllegalArgumentException(s"WATCH: unknown view '$viewName'"))
    mv.transform(spark.readStream.schema(schema).parquet(sourceDir))
  }

  /** `WATCH v EVENTS` (watchStmt EVENTS alternative, ClickHouseParser.py:
    * 14249-14321): the heartbeat form — one `version` row per refresh
    * instead of the full result rows. CH numbers refreshes densely
    * (1, 2, ...); a distributed stream has no global refresh counter, so
    * the version here is the count of source rows folded in so far — the
    * same monotone watermark contract (each refresh that changed the view
    * emits a strictly larger version), with the single-column schema
    * pinned in StreamingSpec. */
  def watchEvents(
      spark: SparkSession,
      viewName: String,
      sourceDir: String,
      schema: StructType
  ): DataFrame = {
    if (!mvRegistry.contains(viewName))
      throw new IllegalArgumentException(s"WATCH: unknown view '$viewName'")
    spark.readStream.schema(schema).parquet(sourceDir)
      .groupBy().agg(count(lit(1)).cast("long").as("version"))
  }

  /** Tumbling-window event aggregation with late-data handling — the
    * streaming twin of the batch `e1_tumbling_window` query. Watermark
    * bounds state: at 100 TB/day ingest, unbounded window state is the
    * first thing that kills an MV job. */
  def windowedCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(col("window.start").as("h"), col("event_type"), col("n"), col("v"))

  /** Streaming exact-dedup — the continuous twin of `Dedup.exactGroups`:
    * drop records whose digest was already seen, keyed on the digest ALONE
    * (a duplicate arriving at a different event time is still a duplicate),
    * with the watermark bounding the dedup state — digests older than the
    * watermark are forgotten, so at 100 TB/day the state store stays
    * bounded by the watermark horizon, not the stream history. */
  def dedupStream(df: DataFrame, digestCols: Seq[String],
      tsCol: String, watermark: String = "1 hour"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(digestCols)

  /** Funnel state for [[funnelStream]]: per level, the latest chain-start
    * time (µs) — Long.MinValue = level not reached. Identical DP state to
    * the batch fold (`NativeExpressions.windowFunnelCompute`). */
  final case class FunnelState(starts: Seq[Long])
  final case class FunnelOut(user_id: Long, level: Int)

  /** Streaming twin of [[graft.operators.ChOps.windowFunnel]]: per-user
    * funnel depth maintained continuously with flatMapGroupsWithState.
    * Each micro-batch folds its events (ts order, lower step first on
    * ties — the batch fold's encoded order) into the per-user chain-start
    * state and emits the user's current depth; in batch execution one
    * "micro-batch" holds everything and the result equals the batch
    * operator (StreamingSpec pins that equivalence). State is O(steps)
    * per user. */
  def funnelStream(
      events: Dataset[(Long, Long, String)], // (user_id, ts_micros, event_type)
      steps: Seq[String],
      windowMicros: Long
  ): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    require(steps.distinct.size == steps.length, "funnel steps must be distinct")
    val stepIdx = steps.zipWithIndex.toMap
    events.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[FunnelState]) =>
          val starts = state.getOption.map(_.starts.toArray)
            .getOrElse(Array.fill(steps.length)(Long.MinValue))
          rows.toSeq
            .flatMap { case (_, ts, et) => stepIdx.get(et).map(i => (ts, i)) }
            .sortBy(identity)
            .foreach { case (ts, i) =>
              if (i == 0) starts(0) = math.max(starts(0), ts)
              else if (starts(i - 1) != Long.MinValue &&
                  ts - starts(i - 1) <= windowMicros)
                starts(i) = math.max(starts(i), starts(i - 1))
            }
          state.update(FunnelState(starts.toSeq))
          Iterator.single(FunnelOut(uid, starts.lastIndexWhere(_ != Long.MinValue) + 1))
      }
  }

  /** Session state for [[sessionize]]. */
  final case class SessionState(sessionId: Long, lastTs: Long, count: Long)
  final case class SessionOut(user_id: Long, session_id: Long, n_events: Long)

  /** Stateful sessionization with mapGroupsWithState — the streaming twin
    * of the batch `e2_sessionize` query (30-min gap → new session).
    * State per user is O(1), and a processing-time timeout REAPS idle
    * users (state.remove() on timeout) — without it, per-user state grows
    * with the user population forever, the classic unbounded-state leak.
    * In batch execution the timeout branch never fires (there is no
    * second micro-batch), which is exactly the batch semantics wanted. */
  def sessionize(
      events: Dataset[(Long, Long)], // (user_id, epoch_seconds)
      gapSeconds: Long = 1800
  ): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[SessionState, SessionOut](
        GroupStateTimeout.ProcessingTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // idle user: emit the closed session and free the state slot
            val st = state.get
            state.remove()
            SessionOut(userId, st.sessionId, st.count)
          } else {
            val sorted = rows.map(_._2).toSeq.sorted
            var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L))
            sorted.foreach { ts =>
              st = if (st.lastTs == Long.MinValue || ts - st.lastTs > gapSeconds)
                SessionState(st.sessionId + 1, ts, 1L)
              else st.copy(lastTs = ts, count = st.count + 1)
            }
            state.update(st)
            // reap after 2 gap lengths with no events for this user
            state.setTimeoutDuration(gapSeconds * 2 * 1000)
            SessionOut(userId, st.sessionId, st.count)
          }
      }
  }
}
