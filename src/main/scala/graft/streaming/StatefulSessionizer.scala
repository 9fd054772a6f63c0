package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with explicit state (§2.8): the
  * `flatMapGroupsWithState` twin of the batch sessionizer (oracle query
  * `e3_sessionize`). Per key, an open session lives in [[SessionState]];
  * events whose gap exceeds `gapSec` close it and emit a [[SessionOut]].
  *
  * Scale: state is one small record per active key, evicted on close — the
  * bounded-state streaming alternative to re-shuffling history every batch.
  */
case class SessionEvent(userId: Long, tsMillis: Long)
case class SessionState(startMillis: Long, lastMillis: Long, n: Long)
case class SessionOut(userId: Long, startMillis: Long, n: Long, durationSec: Long)

object StatefulSessionizer {

  def sessionize(
      events: Dataset[SessionEvent],
      gapSec: Long
  ): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) => {
          val sorted = it.toSeq.sortBy(_.tsMillis)
          var cur = state.getOption
          val closed = Seq.newBuilder[SessionOut]
          for (e <- sorted) {
            cur match {
              case Some(s) if e.tsMillis - s.lastMillis <= gapSec * 1000 =>
                cur = Some(s.copy(lastMillis = e.tsMillis, n = s.n + 1))
              case Some(s) =>
                closed += SessionOut(userId, s.startMillis, s.n,
                  (s.lastMillis - s.startMillis) / 1000)
                cur = Some(SessionState(e.tsMillis, e.tsMillis, 1))
              case None =>
                cur = Some(SessionState(e.tsMillis, e.tsMillis, 1))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
        }
      )
  }
}
