package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Stateful streaming sessionization with custom per-user state
  * (`flatMapGroupsWithState`) — the incremental counterpart of
  * [[graft.operators.Events.sessionize]]'s batch window formulation.
  *
  * State per user: the running session (id, bounds, counters). An
  * event farther than `gap` from the previous one closes the open
  * session (emitted) and starts the next. On AvailableNow drain the
  * final open sessions are flushed via ProcessingTime timeout at
  * stream end — for the batch-parity spec we emit open sessions too,
  * then compare against the batch result exactly.
  */
object SessionStream {

  final case class Evt(user_id: Long, ts: java.sql.Timestamp,
                       event_id: Long, value: Double)
  final case class SessionState(sessionId: Int, startMs: Long, endMs: Long,
                                n: Long, value: Double)
  final case class SessionOut(user_id: Long, session_id: Int, n_events: Long,
                              start_ms: Long, end_ms: Long, session_value: Double)

  /** Streaming sessionize over a parquet events directory; returns
    * all sessions (closed + final open) after draining available
    * input. Events must arrive in event-time order per user within
    * the drained batch, which AvailableNow + a sort inside each group
    * guarantees here (a production continuous stream would pair this
    * with a watermark and EventTimeTimeout).
    */
  def sessionizeAvailableNow(spark: SparkSession, eventsDir: String,
                             queryName: String,
                             gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    graft.core.Tables.withNanosConf(spark) {
    val gapMs = gapMinutes * 60L * 1000L
    val schema = spark.read.parquet(eventsDir).schema

    val events = spark.readStream.schema(schema).parquet(eventsDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[Evt]

    val sessions = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evts: Iterator[Evt], state: GroupState[List[SessionState]]) =>
          // one AvailableNow micro-batch contains the whole drain;
          // sort by event time (tie: event_id) like the batch window
          val sorted = evts.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var sessions = state.getOption.getOrElse(Nil)
          var cur = sessions.headOption
          val closed = scala.collection.mutable.ArrayBuffer.empty[SessionState]
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if (t / 1000L) - (s.endMs / 1000L) <= gapMs / 1000L =>
                cur = Some(s.copy(endMs = t, n = s.n + 1,
                  value = s.value + e.value))
              case Some(s) =>
                closed += s
                cur = Some(SessionState(s.sessionId + 1, t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(1, t, t, 1, e.value))
            }
          }
          state.update(cur.toList)
          // emit closed sessions now; the open one on a later trigger
          // (for the drain-everything spec we emit it too, flagged by
          // being the last per user)
          (closed ++ cur).iterator.map(s =>
            SessionOut(user, s.sessionId, s.n, s.startMs, s.endMs, s.value))
      }

    val q = sessions.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
    // conf restored here: AvailableNow fully drained inside the scope,
    // so no micro-batch ever plans without the nanos conf
    }
  }
}
