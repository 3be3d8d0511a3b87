package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-timeout sessionization of an event stream — the canonical
  * custom-state streaming operator (SURVEY §7.1: `readStream` →
  * `flatMapGroupsWithState` for state Spark's built-in windows can't
  * express: a session ends `gap` after its LAST event, not on a fixed
  * grid).
  *
  * Two twins with identical semantics:
  *  - [[batchSessions]]: pure window functions (lag → gap flag →
  *    running session index → aggregate). Fully SQL-portable; the
  *    oracle states the identical computation.
  *  - [[streamingSessions]]: incremental per-key state via
  *    `flatMapGroupsWithState` with event-time timeout — sessions
  *    close either by an in-stream gap or by watermark passage, so
  *    state is O(open sessions), never O(history).
  *
  * All arithmetic is integer (epoch micros, value in cents via
  * floor(v·100 + 0.5)) so cross-engine and batch/stream parity are
  * exact.
  */
object Sessionize {

  /** Input event (the events table's sessionization projection).
    * Carries the TIMESTAMP column itself — the watermark annotation
    * lives on it, and event-time timeout requires the annotated column
    * to survive into the stateful operator.
    */
  final case class Ev(user_id: Long, ts: java.sql.Timestamp, cents: Long) {
    def tsUs: Long =
      ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L
  }

  /** Closed session. */
  final case class Session(user_id: Long, session_start_us: Long,
                           session_end_us: Long, n_events: Long,
                           value_cents: Long)

  /** Open-session state (public: the state encoder's generated code
    * must construct and read it).
    */
  final case class Open(startUs: Long, endUs: Long, n: Long, cents: Long)

  /** Event-DataFrame (user_id, ts, event_id, value) → one row per
    * session: (user_id, session_seq, session_start_us, session_end_us,
    * n_events, value_cents). `session_seq` numbers a user's sessions
    * in time order from 1.
    */
  def batchSessions(events: DataFrame, gapSeconds: Long): DataFrame = {
    val gapUs = gapSeconds * 1000000L
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val running = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("e_us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("gap", col("e_us") - lag(col("e_us"), 1).over(byUser))
      .withColumn("new_s",
        when(col("gap").isNull || col("gap") > gapUs, 1).otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(running))
      .groupBy(col("user_id"), col("sid").cast("int").as("session_seq"))
      .agg(min(col("e_us")).as("session_start_us"),
        max(col("e_us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("value_cents"))
  }

  /** The SQL oracle twin of [[batchSessions]] (DuckDB dialect). */
  def batchSessionsOracleSql(gapSeconds: Long): String = {
    val gapUs = gapSeconds * 1000000L
    s"""WITH g AS (
       | SELECT user_id, ts, event_id, value,
       |  epoch_us(ts) AS e_us,
       |  epoch_us(ts) - lag(epoch_us(ts)) OVER
       |    (PARTITION BY user_id ORDER BY ts, event_id) AS gap
       | FROM events),
       |s AS (
       | SELECT user_id, e_us, value,
       |  sum(CASE WHEN gap IS NULL OR gap > $gapUs THEN 1 ELSE 0 END) OVER
       |    (PARTITION BY user_id ORDER BY ts, event_id
       |     ROWS UNBOUNDED PRECEDING) AS sid
       | FROM g)
       |SELECT user_id, CAST(sid AS int) AS session_seq,
       | min(e_us) AS session_start_us, max(e_us) AS session_end_us,
       | count(*) AS n_events,
       | CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
       |   AS value_cents
       |FROM s GROUP BY 1, 2""".stripMargin
  }

  /** Streaming twin: per-user open-session state, closed sessions
    * emitted on gap or event-time timeout. Input rows may arrive in
    * any order WITHIN a micro-batch (sorted here); across batches the
    * watermark bounds lateness exactly as for any stateful streaming
    * op.
    */
  def streamingSessions(events: Dataset[Ev], gapSeconds: Long)
      : Dataset[Session] = {
    val gapUs = gapSeconds * 1000000L
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Open, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Ev], state: GroupState[Open]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed the open session's gap horizon: close it
            val out = state.getOption.map(o =>
              Session(user, o.startUs, o.endUs, o.n, o.cents))
            state.remove()
            out.iterator
          } else {
            // DROP events older than the current watermark explicitly:
            // flatMapGroupsWithState hands late rows to the function
            // rather than filtering them like the built-in stateful
            // ops, and a late row here would silently merge into (or
            // corrupt the ordering of) the open session. Dropping
            // makes the contract exact: the stream equals the batch
            // twin run on the watermark-filtered input (pinned in
            // StreamingAndPlanSpec).
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val sorted = rows.toArray.filter(_.tsUs >= wmUs).sortBy(_.tsUs)
            val closed = Seq.newBuilder[Session]
            var open = state.getOption
            sorted.foreach { e =>
              val us = e.tsUs
              open match {
                case Some(o) if us - o.endUs <= gapUs =>
                  open = Some(Open(o.startUs, math.max(o.endUs, us),
                    o.n + 1, o.cents + e.cents))
                case Some(o) =>
                  closed += Session(user, o.startUs, o.endUs, o.n, o.cents)
                  open = Some(Open(us, us, 1, e.cents))
                case None =>
                  open = Some(Open(us, us, 1, e.cents))
              }
            }
            open.foreach { o =>
              state.update(o)
              // close when the watermark passes end + gap; clamped just
              // past the current watermark — a session whose last event
              // arrived with event time already gap-behind the watermark
              // would otherwise compute a timeout in the past, which
              // setTimeoutTimestamp rejects
              state.setTimeoutTimestamp(math.max(
                o.endUs / 1000L + gapSeconds * 1000L,
                state.getCurrentWatermarkMs() + 1L))
            }
            closed.result().iterator
          }
      }
  }

  /** Project the events table into the streaming input shape, keeping
    * the watermarked `ts` column itself.
    */
  def toEvents(spark: SparkSession, events: DataFrame): Dataset[Ev] = {
    import spark.implicits._
    events.select(col("user_id"), col("ts"),
      floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .as[Ev]
  }
}
