package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming slice (SURVEY.md §2.E16): the same event-time
  * logic runs in batch and on an unbounded file stream.
  *
  * Design rule: the aggregation is ONE function over a DataFrame —
  * `readStream` vs `read` is the only difference between the modes, so
  * batch-vs-stream equivalence is testable and the 100 TB batch pipeline
  * and its incremental streaming twin can't drift apart.
  */
object EventStream {

  /** events-shaped schema as produced by [[graft.core.Tables.events]]
    * after its ns→µs normalization.
    */
  val eventSchema: StructType = StructType.fromDDL(
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING")

  /** Tumbling event-time windows per event type — identical expression to
    * the batch q33 aggregation. On a stream, add a watermark upstream.
    */
  def windowedByType(events: DataFrame, windowDur: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 4))).cast(DoubleType).as("sum_value"),
        avg(col("value").cast(DecimalType(12, 4))).cast(DoubleType).as("avg_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"), col("avg_value"))

  /** Unbounded file-source stream over a directory of events parquet. */
  def readEventStream(
      spark: SparkSession,
      dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  // ---- declared streaming query: finite replay of q33 -----------------

  private val replayDirs =
    scala.collection.concurrent.TrieMap[(String, String), String]()
  private val sinkCounter = new java.util.concurrent.atomic.AtomicLong()

  /** Normalized multi-file replay copy of the events fixture, built once
    * per (application, fixture dir): the raw fixture's ns timestamps go
    * through [[graft.core.Tables.events]]' µs normalization (a raw
    * readStream would mis-type them), and the 6-file layout makes the
    * replay arrive in several triggers — a real incremental run, not one
    * big batch wearing a streaming hat.
    */
  private def replayDir(spark: SparkSession, d: String): String =
    replayDirs.getOrElseUpdate((spark.sparkContext.applicationId, d),
      graft.core.SharedRelations.timeShared(spark, "stream_replay") {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_stream_replay").toString
      graft.core.Tables.events(spark, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props").cast("string"))
        .repartition(6).write.mode("overwrite").parquet(dir)
      dir
    })

  /** Declared q276: the streaming twin of q33 — the SAME windowed
    * aggregation expression, but executed by a real Structured
    * Streaming query over a finite file replay (3 triggers of 2 files),
    * complete output mode into a memory sink, returned as the sink
    * table once the replay drains. Complete mode re-emits the full
    * window×type relation per trigger, so the final table equals the
    * batch answer row for row — which is exactly the batch-stream
    * equivalence contract the engine promises, here driver-checked
    * against the q33 oracle instead of spec-only.
    *
    * Scale shape: the aggregation state is windows × event-types
    * (domain-bounded), and each trigger's increment is one shuffle of
    * two files' partial aggregates — on a cluster this is the standing
    * incremental job whose per-trigger cost tracks arrival rate, not
    * history. The memory sink is the harness-visible stand-in for the
    * deltalike/console sinks the library also provides; its contents
    * are aggregate-sized, never event-sized.
    */
  def q276StreamEventWindows(spark: SparkSession, d: String): DataFrame = {
    val stream = readEventStream(spark, replayDir(spark, d),
      maxFilesPerTrigger = 2)
    val name = s"q276_sink_${sinkCounter.incrementAndGet()}"
    // the streaming state is windows × event-types — domain-bounded and
    // tiny — but every shuffle partition carries a state store whose
    // checkpoint files are written per trigger; 32 partitions of
    // near-empty state triple the replay's wall-clock in pure store
    // I/O. Size the stateful shuffle to the state, not to the cores
    // (the conf is read once at query start; restored after).
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    val q =
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        windowedByType(stream)
          .writeStream.format("memory").queryName(name)
          .outputMode(OutputMode.Complete).start()
      } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  // ---- declared streaming query: finite ordered replay of q66 --------

  private val orderedReplayDirs =
    scala.collection.concurrent.TrieMap[(String, String), String]()

  /** Event-TIME-ordered multi-file replay of the events fixture, built
    * once per (application, fixture dir): six contiguous time-range
    * chunks plus a far-future sentinel row, file mtimes ascending so
    * the file source replays them oldest-range first. Unlike
    * [[replayDir]]'s random 6-way split (fine for the order-free q276
    * windowed agg in complete mode), stateful APPEND-mode queries need
    * the replay to respect event time: the watermark is global, so a
    * shuffled replay would let one chunk's far-future rows close other
    * users' still-arriving sessions mid-stream. Chunk contiguity gives
    * the exact batch-equivalence argument: when a session times out at
    * watermark W, any later event of that user is ≥ W + delay, i.e.
    * beyond the gap — the batch twin would have split there too.
    */
  private def orderedReplayDir(spark: SparkSession, d: String): String =
    orderedReplayDirs.getOrElseUpdate((spark.sparkContext.applicationId, d),
      graft.core.SharedRelations.timeShared(spark, "stream_oreplay") {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_stream_oreplay").toString
      val ev = graft.core.Tables.events(spark, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props").cast("string"))
      val span = ev.agg(
        min(unix_micros(col("ts"))).as("lo"),
        max(unix_micros(col("ts"))).as("hi")).collect().head
      val (lo, hi) = (span.getLong(0), span.getLong(1))
      val n = 6
      (0 until n).foreach { i =>
        val from = lo + (hi - lo + 1) * i / n
        val to = lo + (hi - lo + 1) * (i + 1) / n
        writeReplayChunk(
          ev.where(unix_micros(col("ts")) >= from &&
            unix_micros(col("ts")) < to), dir, i)
      }
      // sentinel far beyond hi + gap + lateness: pushes the watermark
      // past every open session's timeout so the finite replay emits
      // ALL sessions; its own (negative-user) session never closes and
      // is filtered by the caller
      val sentinel = spark.range(1).select(
        lit(-1L).as("event_id"),
        timestamp_micros(lit(hi + 30L * 24 * 3600 * 1000000L)).as("ts"),
        lit(-1L).as("user_id"), lit("__sentinel").as("event_type"),
        lit(0.0).as("value"), lit(null).cast("string").as("props"))
      writeReplayChunk(sentinel, dir, n)
      dir
    })

  /** Write one replay chunk as a single parquet file named and
    * mtime-stamped by its index, so the file stream source's
    * (mtime, path) ordering replays chunks in index order.
    */
  private[streaming] def writeReplayChunk(
      df: DataFrame, dir: String, idx: Int): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_chunk")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.toFile.listFiles()
      .filter(_.getName.endsWith(".parquet")).head.toPath
    val dest = java.nio.file.Paths.get(dir, f"chunk_$idx%02d.parquet")
    java.nio.file.Files.move(part, dest)
    java.nio.file.Files.setLastModifiedTime(dest,
      java.nio.file.attribute.FileTime.fromMillis(1700000000000L + idx * 1000L))
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
  }

  /** Declared q277: the streaming twin of q66 — gap-based sessions via
    * [[sessionize]]'s flatMapGroupsWithState + EventTimeTimeout path,
    * run as a real Structured Streaming query over the event-time-
    * ordered file replay (4 triggers), append mode into a memory sink.
    * Sessions close EXACTLY ONCE as the watermark passes end + gap
    * (the data path closes in-batch gaps, the timeout path closes
    * cross-batch ones), and the sentinel's final watermark push closes
    * the tail — so the drained sink equals the batch sessionization
    * row for row, driver-checked against the q66 oracle.
    *
    * Scale shape: one shuffle per trigger on user_id, O(active users)
    * state — three longs per open session, evicted at timeout; the
    * sink holds sessions, never events. This is the standing
    * clickstream-sessionizer whose per-trigger cost tracks arrival
    * rate, with the SAME emitted relation as the nightly batch job.
    */
  def q277StreamSessionize(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val stream = readEventStream(spark, orderedReplayDir(spark, d),
      maxFilesPerTrigger = 2)
    val name = s"q277_sink_${sinkCounter.incrementAndGet()}"
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    val q =
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        sessionize(stream.withWatermark("ts", "10 minutes").as[EventRow],
          gapMs = 30L * 60 * 1000)
          .toDF()
          .writeStream.format("memory").queryName(name)
          .outputMode(OutputMode.Append).start()
      } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    try q.processAllAvailable() finally q.stop()
    spark.table(name).where(col("user_id") >= 0)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
  }

  /** Declared q280: the streaming Welford z-score anomaly detector
    * ([[anomalies]]) run as a real Structured Streaming query over the
    * event-time-ordered file replay — the last stateful streaming path
    * to go driver-visible (it was spec-only through round 11). The
    * online contract is order-sensitive (each event scores against the
    * moments of the events BEFORE it), and the ordered replay makes
    * that order exactly global (µs ts, event_id): chunks are contiguous
    * time ranges, the per-batch fold sorts within the trigger, so the
    * cross-batch concatenation IS the global sort — which is what makes
    * an exact SQL oracle possible (cumulative window frame
    * `ROWS UNBOUNDED PRECEDING AND 1 PRECEDING` per event type,
    * ordered by `epoch_us(ts), event_id`).
    *
    * Scale shape: state is three numbers per event TYPE (domain-
    * bounded, never per-event), one user-invisible shuffle per trigger
    * on event_type, emissions only for screened outliers. The sentinel
    * row forms its own single-event group (n=1 < minN, never emits)
    * and is filtered here anyway.
    */
  def q280StreamAnomalies(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val stream = readEventStream(spark, orderedReplayDir(spark, d),
      maxFilesPerTrigger = 2)
    val name = s"q280_sink_${sinkCounter.incrementAndGet()}"
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    val q =
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        anomalies(stream.as[EventRow], minN = 30, threshold = 3.0)
          .toDF()
          .writeStream.format("memory").queryName(name)
          .outputMode(OutputMode.Append).start()
      } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    try q.processAllAvailable() finally q.stop()
    spark.table(name).where(col("event_type") =!= "__sentinel")
      .select(col("event_type"), col("event_id"), col("ts"),
        col("value"), col("z"), col("n_seen"))
  }

  /** Exact SQL twin of [[q280StreamAnomalies]]: the Welford running
    * moments over a prefix equal the two-pass mean/stddev_samp of that
    * prefix, so the streaming detector's output is the cumulative
    * exclusive window screen in (µs ts, event_id) order.
    */
  val q280Sql: String =
    """WITH scr AS (
      |  SELECT event_type, event_id, ts, value,
      |    count(*) OVER w AS n_seen,
      |    avg(value) OVER w AS mu,
      |    stddev_samp(value) OVER w AS sd
      |  FROM events
      |  WINDOW w AS (PARTITION BY event_type
      |               ORDER BY epoch_us(ts), event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT event_type, CAST(event_id AS BIGINT) AS event_id, ts,
      |  CAST(value AS DOUBLE) AS value,
      |  CAST((value - mu) / sd AS DOUBLE) AS z,
      |  CAST(n_seen AS BIGINT) AS n_seen
      |FROM scr
      |WHERE n_seen >= 30 AND sd > 0
      |  AND abs((value - mu) / sd) >= 3.0""".stripMargin

  /** Streaming windowed aggregation with watermarking: late events more
    * than `lateness` behind the max seen ts are dropped; closed windows
    * are emitted finally (append mode) and their state evicted — bounded
    * state on an unbounded stream.
    */
  def windowedWithWatermark(
      stream: DataFrame,
      windowDur: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    windowedByType(stream.withWatermark("ts", lateness), windowDur)

  // ---- streaming dedup -----------------------------------------------

  /** Streaming exact deduplication — the ingest-side twin of the batch
    * dedup tier ([[graft.operators.Dedup]]): drop any row whose key was
    * already seen, keeping state only until the event-time watermark
    * passes (`dropDuplicatesWithinWatermark`), so state is bounded by
    * the lateness horizon instead of growing with the stream. The keys
    * are typically a content fingerprint (see [[fingerprinted]]) — the
    * streaming form of collapse-by-md5 exact dedup.
    */
  def dedupWithinWatermark(
      stream: DataFrame,
      keyCols: Seq[String],
      tsCol: String = "ts",
      lateness: String = "10 minutes"): DataFrame =
    stream.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Add the exact-dedup content fingerprint (md5 of the sorted distinct
    * token set — same definition as the batch `q30`) to a text-bearing
    * stream, so [[dedupWithinWatermark]] can key on it.
    */
  def fingerprinted(stream: DataFrame, textCol: String): DataFrame =
    stream.withColumn("fingerprint",
      md5(concat_ws(" ", array_sort(array_distinct(split(col(textCol), " "))))))

  // ---- stream-stream interval join ------------------------------------

  /** Stream-stream inner join with an event-time interval condition:
    * each left event pairs with right events of the same key whose
    * timestamp falls in `[left.ts, left.ts + maxDelay]` (funnel
    * attribution: click → purchase within the window). Both sides carry
    * watermarks and the join condition bounds the time range in BOTH
    * directions, so Spark can size the state store to watermark +
    * interval and evict — the one configuration where stream-stream
    * joins have bounded state on unbounded streams. Identical
    * expression works in batch (the spec pins stream ≡ batch).
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      maxDelay: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", lateness).alias("l")
    val r = right.withWatermark("ts", lateness).alias("r")
    l.join(r,
      expr(s"l.$keyCol = r.$keyCol AND " +
        s"r.ts >= l.ts AND r.ts <= l.ts + interval $maxDelay"))
      .select(
        col(s"l.$keyCol").as(keyCol),
        col("l.event_id").as("left_id"),
        col("r.event_id").as("right_id"),
        col("l.ts").as("left_ts"),
        ((unix_micros(col("r.ts")) - unix_micros(col("l.ts"))) / 1000L)
          .cast("long").as("delay_ms"))
  }

  // ---- custom keyed state: per-user running profile -------------------

  case class EventRow(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  case class UserProfile(
      user_id: Long, n_events: Long, sum_value: Double, last_ts: java.sql.Timestamp)

  /** Per-user running profile via `mapGroupsWithState` — the custom-state
    * extension point (arbitrary accumulator logic, here count/sum/last
    * seen). State is per key, partitioned by user: at scale this is one
    * shuffle and O(users) state, evictable by timeout in production.
    */
  def userProfiles(events: Dataset[EventRow]): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserProfile, UserProfile](
        GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[EventRow], state: GroupState[UserProfile]) =>
          val prev = state.getOption.getOrElse(
            UserProfile(user, 0L, 0.0, new java.sql.Timestamp(0L)))
          val next = rows.foldLeft(prev) { (acc, e) =>
            UserProfile(
              user,
              acc.n_events + 1,
              // decimal-cent arithmetic: associative, partition-order-proof
              (BigDecimal(acc.sum_value) + BigDecimal(e.value)).toDouble,
              if (e.ts.after(acc.last_ts)) e.ts else acc.last_ts)
          }
          state.update(next)
          next
      }
  }

  /** Batch twin of [[userProfiles]] for the equivalence spec. */
  def userProfilesBatch(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(20, 10))).cast(DoubleType).as("sum_value"),
        max(col("ts")).as("last_ts"))

  // ---- sessionization: flatMapGroupsWithState + event-time timeout ---

  case class Session(
      user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  /** Internal per-key state of [[sessionize]] (public: the codegen'd
    * state serializer needs reflective access). Times in MICROSECONDS:
    * the events fixture is µs-precision (>99% of rows carry sub-ms
    * components), and a millisecond-truncated gap test would split
    * sessions differently from the µs batch twin near the boundary.
    */
  case class OpenSession(startUs: Long, endUs: Long, count: Long)

  /** Epoch microseconds of a Timestamp (getTime truncates to ms; the
    * nanos field carries the full fractional second).
    */
  private def micros(t: java.sql.Timestamp): Long =
    (t.getTime - t.getNanos / 1000000) * 1000L + t.getNanos / 1000

  private def tsOfMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** Per-user sessionization on an unbounded stream: a session is a run
    * of events with gaps < `gapMs`; a session closes (and is emitted
    * exactly once) when the event-time watermark passes its end + gap —
    * implemented with `flatMapGroupsWithState` and
    * `EventTimeTimeout`, the full custom-state surface: arbitrary
    * per-key state, timeout-driven emission, bounded memory on an
    * unbounded stream. Input must carry a watermark on `ts`.
    */
  def sessionize(
      events: Dataset[EventRow],
      gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMs * 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[EventRow], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed the open session's end + gap → final
            val s = state.get
            state.remove()
            Iterator.single(Session(user,
              tsOfMicros(s.startUs), tsOfMicros(s.endUs), s.count))
          } else {
            // fold this batch's events (sorted: micro-batch order is not
            // event-time order) into the open session, emitting any
            // sessions closed by an in-batch gap
            val sorted = rows.toSeq.sortBy(e => micros(e.ts))
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = micros(e.ts)
              open match {
                case Some(s) if t - s.endUs < gapUs =>
                  open = Some(s.copy(endUs = math.max(s.endUs, t), count = s.count + 1))
                case Some(s) =>
                  closed += Session(user,
                    tsOfMicros(s.startUs), tsOfMicros(s.endUs), s.count)
                  open = Some(OpenSession(t, t, 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // timeout API is ms epoch: ceil so the µs deadline is never
              // rounded EARLY past a still-in-gap event (D >> 1 ms makes
              // the residual harmless either way)
              state.setTimeoutTimestamp((s.endUs + gapUs + 999L) / 1000L)
            }
            closed.result().iterator
          }
      }
  }

  /** Batch twin of [[sessionize]]: gap-based sessions via the classic
    * lag + cumulative-sum window trick (new session when the gap from
    * the previous event ≥ gapMs). Emits ALL sessions (batch input is
    * finite, so every session is closed).
    */
  def sessionizeBatch(events: DataFrame, gapMs: Long): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev").isNull, 1)
          .when(unix_micros(col("ts")) - unix_micros(col("__prev")) >= gapMs * 1000L, 1)
          .otherwise(0))
      .withColumn("__session_id",
        sum(col("__new_session")).over(byUser
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("__session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("__session_id")
  }

  /** Declared q66 — gap-based sessionization of the events fixture
    * (30-minute inactivity gap). One shuffle on the session key covers
    * the lag window, the cumulative-sum window AND the per-session
    * aggregate — the user-key partitioning is established once and
    * reused through all three.
    */
  def q66Sessionize(spark: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    sessionizeBatch(graft.core.Tables.events(spark, d), gapMs = 30L * 60 * 1000)

  val q66Sql: String =
    """WITH l AS (
      |  SELECT user_id, ts, event_id,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |n AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN prev IS NULL
      |          OR epoch_us(ts) - epoch_us(prev) >= 1800000000
      |         THEN 1 ELSE 0 END AS ns
      |  FROM l),
      |s AS (
      |  SELECT user_id, ts,
      |    sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                  ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM n)
      |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
      |  count(*) AS n_events
      |FROM s GROUP BY user_id, sid""".stripMargin

  // ---- streaming anomaly detection: Welford state per event type ----

  /** Internal per-type state of [[anomalies]]: Welford running moments
    * (public: the codegen'd state serializer needs reflective access).
    */
  case class TypeMoments(n: Long, mean: Double, m2: Double)

  case class Anomaly(
      event_type: String, event_id: Long, ts: java.sql.Timestamp,
      value: Double, z: Double, n_seen: Long)

  /** Streaming z-score anomaly detector — the unbounded twin of the
    * batch q108 rolling screen: per event type, a Welford running
    * (n, mean, M2) lives in `mapGroupsWithState` state (three doubles
    * per key — bounded forever), and each arriving event is scored
    * against the moments BEFORE it updates them. Events with
    * |z| ≥ `threshold` after a `minN` warm-up are emitted.
    *
    * Within a micro-batch, rows are folded in (ts, event_id) order so
    * replays are deterministic; across batches, ordering is the
    * stream's arrival order — the standard online-detector contract
    * (the spec pins equivalence against a sequential batch replay).
    * The sort key is µs-precision (same q277 lesson: >99% of fixture
    * events carry sub-ms components, and a ms-truncated key would
    * fold same-ms events in event_id order while a full-precision
    * engine orders them by actual time).
    */
  def anomalies(events: Dataset[EventRow], minN: Long = 30,
      threshold: Double = 3.0): Dataset[Anomaly] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[TypeMoments, Anomaly](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (etype: String, rows: Iterator[EventRow],
            state: GroupState[TypeMoments]) =>
          var st = state.getOption.getOrElse(TypeMoments(0L, 0.0, 0.0))
          val out = Seq.newBuilder[Anomaly]
          rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            if (st.n >= minN) {
              val sd = math.sqrt(st.m2 / (st.n - 1))
              if (sd > 0) {
                val z = (e.value - st.mean) / sd
                if (math.abs(z) >= threshold)
                  out += Anomaly(etype, e.event_id, e.ts, e.value, z, st.n)
              }
            }
            val n1 = st.n + 1
            val d = e.value - st.mean
            val mean1 = st.mean + d / n1
            st = TypeMoments(n1, mean1, st.m2 + d * (e.value - mean1))
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Sequential replay of [[anomalies]] for the equivalence spec: the
    * same Welford fold over the batch in (ts, event_id) order.
    */
  def anomaliesReplay(events: Seq[EventRow], minN: Long,
      threshold: Double): Seq[Anomaly] =
    events.groupBy(_.event_type).toSeq.flatMap { case (etype, es) =>
      var st = TypeMoments(0L, 0.0, 0.0)
      es.sortBy(e => (micros(e.ts), e.event_id)).flatMap { e =>
        val hit =
          if (st.n >= minN) {
            val sd = math.sqrt(st.m2 / (st.n - 1))
            val z = if (sd > 0) (e.value - st.mean) / sd else 0.0
            if (sd > 0 && math.abs(z) >= threshold)
              Some(Anomaly(etype, e.event_id, e.ts, e.value, z, st.n))
            else None
          } else None
        val n1 = st.n + 1
        val d = e.value - st.mean
        val mean1 = st.mean + d / n1
        st = TypeMoments(n1, mean1, st.m2 + d * (e.value - mean1))
        hit
      }
    }
}
