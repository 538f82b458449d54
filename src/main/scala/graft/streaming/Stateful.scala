package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.{QueryDef, Tables}

/** Typed event row for stateful operators (the explicit schema of
  * Sources.eventSchema as a case class).
  */
case class Event(
    event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Running per-user state carried across micro-batches. */
case class UserStat(user_id: Long, n_events: Long, total_value: Double)

/** Open-session state (epoch millis) for the custom sessionizer. */
case class OpenSession(start_ms: Long, last_ms: Long, n_events: Long)

/** A finalized session emitted by [[Stateful.sessionizeWithState]]. */
case class ClosedSession(
    user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long)

/** Carried packing state per shard: the open sequence's id and how many
  * tokens it already holds.
  */
case class PackState(next_seq: Long, fill: Long)

/** One (document, sequence) overlap emitted by [[Stateful.packStream]] —
  * the same loader-manifest row as the batch
  * [[graft.ops.Coverage.packSequences]], plus the shard that owns the
  * sequence.
  */
case class PackSlice(
    shard: Int, doc_id: Long, seq_id: Long, doc_off: Long, seq_off: Long, n_toks: Long)

/** Minimal doc row for [[Stateful.packStream]]. */
case class PackInput(doc_id: Long, text: String)

/** Per-user funnel state: first qualifying timestamp of each stage in
  * MICROSECONDS (full Timestamp precision — `getTime` alone would drop
  * sub-millisecond digits and diverge from the batch operator's strict
  * comparisons), −1 = stage not reached.
  */
case class FunnelState(s1_us: Long, s2_us: Long, s3_us: Long)

/** Current funnel stage per user, emitted each batch the user advances. */
case class FunnelStage(user_id: Long, stage: Int)

/** A funnel-relevant event buffered by
  * [[Stateful.funnelStreamWatermarked]] until the watermark passes it:
  * kind 1/2/3 = signup/click/purchase, event-time in microseconds, and
  * the event_id tiebreak the batch operator's ordering uses.
  */
case class PendingEv(kind: Int, ts_us: Long, event_id: Long)

/** [[Stateful.funnelStreamWatermarked]] state: the committed stage
  * machine (24 bytes) plus the not-yet-finalizable event buffer —
  * bounded by the user's funnel-relevant events inside the watermark
  * lateness window (~24 bytes each), NOT by history.
  */
case class FunnelLateState(s1_us: Long, s2_us: Long, s3_us: Long, pending: Seq[PendingEv])

/** Stateful streaming beyond tumbling windows — session windows and
  * arbitrary per-key state (SURVEY.md §7.5; the reference has no state
  * ops at all, §2.6 note — this is the modern surface its pipeline
  * would grow into).
  */
object Stateful {

  /** Event-time session windows: per-user sessions that close after
    * `gap` of inactivity. In streaming this is
    * `withWatermark + groupBy(session_window(...))` — Spark merges and
    * expires session state per key; at scale state size is bounded by
    * (active keys × open sessions), not history.
    *
    * The batch form is oracle-checkable: the classic lag()/cumsum
    * sessionization reproduces Spark's merge rule — an event at EXACTLY
    * last+gap still merges (closed boundary), so the new-session test is
    * `diff > gap`, not `>=`.
    */
  def userSessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"))

  val sessionQuery = QueryDef(
    "stream_session_window",
    """WITH marked AS (
      |  SELECT user_id, ts,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sess AS (
      |  SELECT user_id, ts,
      |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |                             ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked)
      |SELECT user_id,
      |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
      |       count(*) AS n_events
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin)(
    (s, d) => userSessions(Tables.events(s, d)).orderBy("user_id", "session_start"))

  /** Arbitrary per-key state via mapGroupsWithState (the Structured
    * Streaming replacement for DStream updateStateByKey): a running
    * per-user aggregate that survives across micro-batches. Update-mode
    * output; NoTimeout keeps state forever — production pipelines set
    * `ProcessingTimeTimeout` + `state.setTimeoutDuration` to bound state,
    * which is the knob that matters at 100 TB key cardinality.
    */
  def runningUserStats(events: Dataset[Event]): Dataset[UserStat] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { e => n += 1; tot += e.value }
          val next = UserStat(uid, n, tot)
          state.update(next)
          next
      }
  }

  /** Custom sessionization via flatMapGroupsWithState — the fully-manual
    * alternative to [[userSessions]]'s session_window, for when session
    * CLOSE events themselves are the product (alerting, billing): emits
    * one row per closed session, nothing while a session is open.
    *
    * Two close paths, both covered in StatefulSpec:
    *  - a new event for the key arrives past the gap → the old session
    *    closes inline and a fresh one opens;
    *  - the key goes quiet → the EventTimeTimeout fires once the
    *    watermark passes last_event + gap, closing the session without
    *    any further event for that key (state removed — at scale this is
    *    the guarantee that idle keys don't accumulate state forever).
    */
  /** The sessionizer's SHARED transition function — one definition fed
    * by both the flatMapGroupsWithState form and the transformWithState
    * form ([[SessionProcessor]]), the same anti-drift recipe as the
    * funnel's [[advanceFunnel]]: fold a batch's sorted event times into
    * the open session, returning the new open state and every session
    * the batch closed inline (a new event past the gap closes the old
    * session and opens a fresh one).
    */
  private def advanceSession(
      open0: Option[OpenSession],
      times: Seq[Long],
      gapMs: Long): (Option[OpenSession], Seq[OpenSession]) = {
    var open = open0
    val closed = Seq.newBuilder[OpenSession]
    times.foreach { t =>
      open match {
        case Some(s) if t - s.last_ms <= gapMs =>
          open = Some(s.copy(last_ms = math.max(s.last_ms, t), n_events = s.n_events + 1))
        case Some(s) =>
          closed += s
          open = Some(OpenSession(t, t, 1))
        case None =>
          open = Some(OpenSession(t, t, 1))
      }
    }
    (open, closed.result())
  }

  private def closedOf(uid: Long, s: OpenSession, gapMs: Long): ClosedSession =
    ClosedSession(uid, new Timestamp(s.start_ms), new Timestamp(s.last_ms + gapMs), s.n_events)

  def sessionizeWithState(
      events: Dataset[Event],
      gapMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val closed = closedOf(uid, state.get, gapMs)
            state.remove()
            Iterator(closed)
          } else {
            val times = rows.map(_.ts.getTime).toSeq.sorted
            val (open, closedInline) = advanceSession(state.getOption, times, gapMs)
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last_ms + gapMs)
            }
            closedInline.map(closedOf(uid, _, gapMs)).iterator
          }
      }
  }

  /** The sessionizer on Spark 4's `transformWithState` — same migration
    * story as [[FunnelProcessor]]: named typed state, explicit
    * event-time timers, RocksDB provider required. Semantics are
    * IDENTICAL to [[sessionizeWithState]] by construction — both feed
    * [[advanceSession]] with the batch's sorted times and close idle
    * sessions once the watermark passes last_event + gap (the spec
    * replays the same batches through both and asserts equal outputs).
    * The armed-timer bookkeeping mirrors [[FunnelProcessor]]: re-arming
    * DELETES the superseded timer, and a stale timer that fires anyway
    * (its expiry no longer matches the open session's deadline) is a
    * no-op instead of an early close.
    */
  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Event, ClosedSession] {
    @transient private var open: ValueState[OpenSession] = _
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getValueState(
        "open", org.apache.spark.sql.Encoders.product[OpenSession], TTLConfig.NONE)
      armed = getHandle.getValueState(
        "armed", org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        uid: Long, rows: Iterator[Event], tv: TimerValues): Iterator[ClosedSession] = {
      val times = rows.map(_.ts.getTime).toSeq.sorted
      val (next, closedInline) = advanceSession(Option(open.get()), times, gapMs)
      val prevArmed = if (armed.exists()) armed.get() else -1L
      next.foreach { s =>
        open.update(s)
        val deadline = s.last_ms + gapMs
        if (prevArmed != deadline) {
          if (prevArmed > tv.getCurrentWatermarkInMs()) getHandle.deleteTimer(prevArmed)
          getHandle.registerTimer(deadline)
          armed.update(deadline)
        }
      }
      closedInline.map(closedOf(uid, _, gapMs)).iterator
    }

    override def handleExpiredTimer(
        uid: Long, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[ClosedSession] = {
      val cur = Option(open.get())
      cur match {
        case Some(s) if info.getExpiryTimeInMs() >= s.last_ms + gapMs =>
          open.clear(); armed.clear()
          Iterator.single(closedOf(uid, s, gapMs))
        case _ => Iterator.empty // stale timer: the session was extended
      }
    }
  }

  def sessionizeWithStateTws(
      events: Dataset[Event],
      gapMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionProcessor(gapMinutes * 60000L),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** STREAMING sequence packing — the batch concat-then-chunk manifest
    * ([[graft.ops.Coverage.packSequences]]) lifted onto an unbounded
    * stream via flatMapGroupsWithState: each shard carries its open
    * sequence's (id, fill) across micro-batches, so the first doc of
    * batch N+1 continues filling exactly where batch N stopped — no
    * sequence is padded or abandoned at a batch boundary, which is the
    * property a naive per-batch repack loses (every boundary would leak
    * a partial sequence).
    *
    * Sharding: doc_id % `shards` spreads the stream over independent
    * packers; a sequence is identified by (shard, seq_id). Parallelism
    * and state are both shard-bounded — state is ONE 16-byte record per
    * shard regardless of stream length, the floor for any stateful
    * operator. Within a batch each shard sorts its docs by doc_id, so
    * output is deterministic given batch composition (arrival order
    * across batches is the stream's own nondeterminism; replay of the
    * same batches reproduces the same manifest, which StatefulSpec
    * pins).
    */
  /** The packer's SHARED transition function — both the
    * flatMapGroupsWithState form and [[PackProcessor]] feed it, so the
    * two manifests can never drift: fold a batch's docs (sorted by
    * doc_id) into the shard's open sequence, tiling each doc's tokens
    * across sequence boundaries.
    */
  private def advancePack(
      shard: Int,
      st: PackState,
      docs: Seq[PackInput],
      seqTokens: Long): (PackState, Seq[PackSlice]) = {
    var seq = st.next_seq
    var fill = st.fill
    val out = Seq.newBuilder[PackSlice]
    docs.sortBy(_.doc_id).foreach { d =>
      var remaining = d.text.split("\\s+", -1).length.toLong
      var docOff = 0L
      while (remaining > 0) {
        val take = math.min(seqTokens - fill, remaining)
        out += PackSlice(shard, d.doc_id, seq, docOff, fill, take)
        docOff += take; fill += take; remaining -= take
        if (fill == seqTokens) { seq += 1; fill = 0 }
      }
    }
    (PackState(seq, fill), out.result())
  }

  def packStream(
      docs: Dataset[PackInput],
      seqTokens: Long = 2048L,
      shards: Int = 256): Dataset[PackSlice] = {
    import docs.sparkSession.implicits._
    require(seqTokens >= 1, s"seqTokens must be >= 1 (got $seqTokens)")
    require(shards >= 1, s"shards must be >= 1 (got $shards)")
    docs
      .groupByKey(d => (d.doc_id % shards).toInt)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard: Int, rows: Iterator[PackInput], state: GroupState[PackState]) =>
          val (next, out) = advancePack(
            shard, state.getOption.getOrElse(PackState(0L, 0L)), rows.toSeq, seqTokens)
          state.update(next)
          out.iterator
      }
  }

  /** The packer on `transformWithState` — no timers (packing is purely
    * arrival-driven, `TimeMode.None`), one named 16-byte ValueState per
    * shard. Semantics IDENTICAL to [[packStream]] by construction: both
    * feed [[advancePack]] (the spec replays the same batches through
    * both and asserts equal manifests). Requires the RocksDB provider,
    * like every StatefulProcessor.
    */
  class PackProcessor(seqTokens: Long)
      extends StatefulProcessor[Int, PackInput, PackSlice] {
    @transient private var st: ValueState[PackState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState(
        "pack", org.apache.spark.sql.Encoders.product[PackState], TTLConfig.NONE)

    override def handleInputRows(
        shard: Int, rows: Iterator[PackInput], tv: TimerValues): Iterator[PackSlice] = {
      val (next, out) = advancePack(
        shard, Option(st.get()).getOrElse(PackState(0L, 0L)), rows.toSeq, seqTokens)
      st.update(next)
      out.iterator
    }
  }

  def packStreamTws(
      docs: Dataset[PackInput],
      seqTokens: Long = 2048L,
      shards: Int = 256): Dataset[PackSlice] = {
    import docs.sparkSession.implicits._
    require(seqTokens >= 1, s"seqTokens must be >= 1 (got $seqTokens)")
    require(shards >= 1, s"shards must be >= 1 (got $shards)")
    docs
      .groupByKey(d => (d.doc_id % shards).toInt)
      .transformWithState(
        new PackProcessor(seqTokens), TimeMode.None(), OutputMode.Append())
  }

  /** Streaming starter for [[packStream]]: the manifest appends to
    * parquet (exactly-once through the sink's _spark_metadata log +
    * the checkpointed state store).
    */
  def startPackStream(
      docs: Dataset[PackInput],
      outDir: String,
      checkpointDir: String,
      seqTokens: Long = 2048L,
      shards: Int = 256): org.apache.spark.sql.streaming.StreamingQuery =
    packStream(docs, seqTokens, shards).writeStream
      .outputMode(OutputMode.Append())
      .queryName("pack_stream")
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outDir)
      .start()

  /** STREAMING FUNNEL — the incremental form of
    * [[graft.ops.Temporal.funnelSteps]]: a per-user stage machine that
    * carries first-signup / first-qualifying-click /
    * first-qualifying-purchase timestamps across micro-batches, applying
    * the SAME strict-order + conversion-deadline rules (click ≤ 24 h
    * after the first signup, purchase ≤ 48 h after that click).
    *
    * Equality contract: equals the batch operator when events arrive in
    * event-time order ACROSS batches (within a batch any order is fine —
    * the group's rows are sorted here). The stage machine is monotone:
    * under ordered arrival the first qualifying event per stage IS the
    * minimum, so commits never need revisiting. For out-of-order
    * arrival (an earlier click arriving after a later one was
    * committed) use [[funnelStreamWatermarked]], which buffers inside
    * the watermark window and commits only what can no longer be
    * reordered — this zero-buffer form remains the cheaper choice when
    * the source IS ordered (e.g. a per-user-keyed, timestamp-ordered
    * Kafka topic).
    *
    * At scale: state is 24 bytes per user seen, with stage-3 users
    * removable via timeout; a funnel over 10⁹ users is ~24 GB spread
    * over the cluster's state stores — fine — and each micro-batch pays
    * one shuffle on user_id, the same grain as the batch form.
    */
  private def microsOf(t: Timestamp): Long = t.getTime / 1000 * 1000000L + t.getNanos / 1000

  /** 1/2/3 for the funnel's stage events, 0 for non-advancing types. */
  private def funnelKind(eventType: String): Int = eventType match {
    case "signup" => 1
    case "click" => 2
    case "purchase" => 3
    case _ => 0
  }

  /** ONE transition of the funnel stage machine — shared by the ordered
    * ([[funnelStream]]) and watermark-buffered
    * ([[funnelStreamWatermarked]]) variants so the two can only differ
    * in WHEN events are applied, never in the rules.
    */
  private def advanceFunnel(
      st: FunnelState, kind: Int, t: Long,
      clickDl: Long, purchDl: Long): FunnelState = kind match {
    case 1 if st.s1_us < 0 => st.copy(s1_us = t)
    case 2 if st.s2_us < 0 && st.s1_us >= 0 && t > st.s1_us && t <= st.s1_us + clickDl =>
      st.copy(s2_us = t)
    case 3 if st.s3_us < 0 && st.s2_us >= 0 && t > st.s2_us && t <= st.s2_us + purchDl =>
      st.copy(s3_us = t)
    case _ => st
  }

  private def stageOf(st: FunnelState): Int =
    if (st.s3_us >= 0) 3 else if (st.s2_us >= 0) 2 else if (st.s1_us >= 0) 1 else 0

  def funnelStream(
      events: Dataset[Event],
      clickDeadlineHours: Int = 24,
      purchaseDeadlineHours: Int = 48): Dataset[FunnelStage] = {
    import events.sparkSession.implicits._
    val clickDl = clickDeadlineHours * 3600L * 1000000L
    val purchDl = purchaseDeadlineHours * 3600L * 1000000L
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          // sort the batch's slice of the group: within-batch arrival
          // order is arbitrary even when the SOURCE is in order
          rows.toSeq.sortBy(e => (microsOf(e.ts), e.event_id)).foreach { e =>
            st = advanceFunnel(st, funnelKind(e.event_type), microsOf(e.ts), clickDl, purchDl)
          }
          state.update(st)
          FunnelStage(uid, stageOf(st))
      }
  }

  /** STREAMING FUNNEL WITH LATE DATA — the watermark-delayed form of
    * [[funnelStream]], which is exact only under event-time-ordered
    * arrival ACROSS batches (its documented trade): an out-of-order
    * click arriving after a later click was committed under-counts
    * conversions there. Here nothing commits until it is safe: each
    * user's funnel-relevant events BUFFER in state, and only once the
    * watermark passes an event's time — i.e. Spark guarantees nothing
    * earlier can still arrive — is it applied, in (event-time,
    * event_id) order, through the SAME stage machine
    * ([[advanceFunnel]]). Within the watermark delay, arrival order is
    * therefore irrelevant by construction; events later than the
    * watermark allows are dropped by the operator's own late-row filter
    * (the standard watermark contract), exactly as an aggregation would.
    *
    * Mechanics: `flatMapGroupsWithState` with EventTimeTimeout. On
    * data: append the batch's funnel-relevant rows to the buffer,
    * commit the prefix at-or-below the current watermark, emit the
    * committed stage. On timeout (watermark advanced past a buffered
    * event with no new data for the user): same commit + emit. The
    * timeout is re-armed to the earliest still-pending event so a
    * buffered user finalizes as soon as the watermark allows, not on
    * its next unrelated event.
    *
    * State bound (documented, not hoped): 24 bytes of committed machine
    * per user ever seen, plus ~24 bytes per funnel-relevant event still
    * inside the lateness window — the buffer drains to empty every time
    * the watermark passes it, so its size tracks delay × per-user event
    * rate, never history. At 10⁹ users with a 1 h delay and sparse
    * per-user activity this stays within a few GB per state store.
    * Scale shape is unchanged from [[funnelStream]]: one user_id
    * shuffle per micro-batch.
    */
  def funnelStreamWatermarked(
      events: Dataset[Event],
      delay: String = "1 hour",
      clickDeadlineHours: Int = 24,
      purchaseDeadlineHours: Int = 48): Dataset[FunnelStage] = {
    import events.sparkSession.implicits._
    val clickDl = clickDeadlineHours * 3600L * 1000000L
    val purchDl = purchaseDeadlineHours * 3600L * 1000000L
    events
      .withWatermark("ts", delay)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[FunnelLateState]) =>
          val st = state.getOption.getOrElse(FunnelLateState(-1L, -1L, -1L, Nil))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val incoming = rows.flatMap { e =>
            val k = funnelKind(e.event_type)
            if (k == 0) None else Some(PendingEv(k, microsOf(e.ts), e.event_id))
          }.toSeq
          // strictly below the watermark: Spark's late-row filter still
          // ADMITS rows with event time exactly equal to the watermark,
          // so committing a ts_us == wmUs event here would let an
          // equal-timestamp, lower-event_id row arriving next batch be
          // applied AFTER it — breaking the (ts, event_id) ordering
          // guarantee at the boundary. Boundary events hold one more
          // batch; the wm+1 timer re-arm below guarantees they finalize.
          val (commit, hold) = (st.pending ++ incoming).partition(_.ts_us < wmUs)
          var machine = FunnelState(st.s1_us, st.s2_us, st.s3_us)
          commit.sortBy(p => (p.ts_us, p.event_id)).foreach { p =>
            machine = advanceFunnel(machine, p.kind, p.ts_us, clickDl, purchDl)
          }
          state.update(FunnelLateState(machine.s1_us, machine.s2_us, machine.s3_us, hold))
          if (hold.nonEmpty) {
            // finalize as soon as the watermark passes the earliest
            // buffered event (must arm strictly past the current
            // watermark — Spark rejects a timeout at or before it)
            val nextMs = hold.map(_.ts_us).min / 1000L
            state.setTimeoutTimestamp(math.max(nextMs, state.getCurrentWatermarkMs() + 1))
          }
          Iterator.single(FunnelStage(uid, stageOf(machine)))
      }
  }

  /** The watermark-buffered funnel on Spark 4's `transformWithState` —
    * the arbitrary-stateful-processing successor to
    * mapGroupsWithState/flatMapGroupsWithState, and the API a new
    * pipeline should target: NAMED, TYPED state variables instead of
    * one opaque blob (the committed 24-byte machine and the pending
    * buffer live in separate stores, so the buffer's churn never
    * rewrites the machine), first-class event-time timers
    * (`registerTimer`) instead of one implicit timeout slot, and
    * per-state TTL when eviction policy is wanted. Requires the RocksDB
    * state store provider (enforced by Spark itself) — which is also
    * the right provider at 10⁹-user scale, where state must spill.
    *
    * Semantics are IDENTICAL to [[funnelStreamWatermarked]] by
    * construction: both feed the same [[advanceFunnel]] transition
    * function with the same commit-at-watermark discipline (the spec
    * replays the same shuffled arrivals through both and asserts equal
    * outcomes). A stale timer left by re-arming fires as a no-op
    * commit and re-emits the user's unchanged stage — harmless under
    * update-mode "latest row per user wins" semantics.
    */
  class FunnelProcessor(clickDl: Long, purchDl: Long)
      extends StatefulProcessor[Long, Event, FunnelStage] {
    @transient private var committed: ValueState[FunnelState] = _
    @transient private var pending: ListState[PendingEv] = _
    // the currently-armed timer's timestamp, so re-arming DELETES the
    // superseded timer instead of accumulating one per (key, batch) —
    // the single-slot discipline setTimeoutTimestamp gives the
    // flatMapGroupsWithState form for free, made explicit here (a
    // steady trickle of future-timestamped events would otherwise grow
    // the timer store without bound and fire a redundant no-op emit
    // per stale timer)
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      committed = getHandle.getValueState(
        "committed", org.apache.spark.sql.Encoders.product[FunnelState], TTLConfig.NONE)
      pending = getHandle.getListState(
        "pending", org.apache.spark.sql.Encoders.product[PendingEv], TTLConfig.NONE)
      armed = getHandle.getValueState(
        "armed", org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }

    private def commitAndEmit(
        uid: Long, incoming: Seq[PendingEv], wmMs: Long): Iterator[FunnelStage] = {
      val wmUs = wmMs * 1000L
      // strictly below the watermark — same boundary discipline as the
      // flatMapGroupsWithState form (see funnelStreamWatermarked):
      // Spark still admits rows AT the watermark, so a ts_us == wmUs
      // event must hold one more batch or an equal-timestamp
      // lower-event_id late arrival would be applied out of order
      val (commit, hold) = (pending.get().toSeq ++ incoming).partition(_.ts_us < wmUs)
      var machine = Option(committed.get()).getOrElse(FunnelState(-1L, -1L, -1L))
      commit.sortBy(p => (p.ts_us, p.event_id)).foreach { p =>
        machine = advanceFunnel(machine, p.kind, p.ts_us, clickDl, purchDl)
      }
      committed.update(machine)
      pending.clear()
      val prevArmed = if (armed.exists()) armed.get() else -1L
      if (hold.nonEmpty) {
        pending.put(hold.toArray)
        val next = math.max(hold.map(_.ts_us).min / 1000L, wmMs + 1)
        if (prevArmed != next) {
          if (prevArmed > wmMs) getHandle.deleteTimer(prevArmed)
          getHandle.registerTimer(next)
          armed.update(next)
        }
      } else if (prevArmed >= 0) {
        if (prevArmed > wmMs) getHandle.deleteTimer(prevArmed)
        armed.clear()
      }
      Iterator.single(FunnelStage(uid, stageOf(machine)))
    }

    override def handleInputRows(
        uid: Long, rows: Iterator[Event], tv: TimerValues): Iterator[FunnelStage] = {
      val incoming = rows.flatMap { e =>
        val k = funnelKind(e.event_type)
        if (k == 0) None else Some(PendingEv(k, microsOf(e.ts), e.event_id))
      }.toSeq
      commitAndEmit(uid, incoming, tv.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(
        uid: Long, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[FunnelStage] =
      commitAndEmit(uid, Nil, tv.getCurrentWatermarkInMs())
  }

  def funnelStreamTws(
      events: Dataset[Event],
      delay: String = "1 hour",
      clickDeadlineHours: Int = 24,
      purchaseDeadlineHours: Int = 48): Dataset[FunnelStage] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delay)
      .as[Event]
      .groupByKey(_.user_id)
      .transformWithState(
        new FunnelProcessor(
          clickDeadlineHours * 3600L * 1000000L, purchaseDeadlineHours * 3600L * 1000000L),
        TimeMode.EventTime(), OutputMode.Update())
  }

  /** Streaming starter for [[funnelStreamTws]] (update mode; caller's
    * session must run the RocksDB state store provider).
    */
  def startFunnelStreamTws(
      events: Dataset[Event],
      checkpointDir: String,
      delay: String = "1 hour"): org.apache.spark.sql.streaming.StreamingQuery =
    funnelStreamTws(events, delay).writeStream
      .outputMode(OutputMode.Update())
      .queryName("funnel_stream_tws")
      .option("checkpointLocation", checkpointDir)
      .format("memory")
      .start()

  /** Streaming starter for [[funnelStreamWatermarked]] (update mode —
    * stages are monotone, so the latest row per user is the position).
    */
  def startFunnelStreamWatermarked(
      events: Dataset[Event],
      checkpointDir: String,
      delay: String = "1 hour"): org.apache.spark.sql.streaming.StreamingQuery =
    funnelStreamWatermarked(events, delay).writeStream
      .outputMode(OutputMode.Update())
      .queryName("funnel_stream_late")
      .option("checkpointLocation", checkpointDir)
      .format("memory")
      .start()

  /** Streaming starter for [[funnelStream]] (update mode — each batch
    * emits the current stage of every user it touched; the latest row
    * per user is the funnel position).
    */
  def startFunnelStream(
      events: Dataset[Event],
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    funnelStream(events).writeStream
      .outputMode(OutputMode.Update())
      .queryName("funnel_stream")
      .option("checkpointLocation", checkpointDir)
      .format("memory")
      .start()

  /** Streaming starter for [[runningUserStats]] (update mode — each batch
    * emits only the keys it touched).
    */
  def startRunningUserStats(
      events: Dataset[Event],
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    runningUserStats(events).writeStream
      .outputMode(OutputMode.Update())
      .queryName("running_user_stats")
      .option("checkpointLocation", checkpointDir)
      .format("memory")
      .start()

  val all: Seq[QueryDef] = Seq(sessionQuery)
}
