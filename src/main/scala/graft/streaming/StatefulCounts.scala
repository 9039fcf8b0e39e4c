package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-key streaming state via mapGroupsWithState — the shape
  * for stateful logic the built-in windowed aggregates can't express
  * (the reference's per-job crawl counters, Q3 state machine, live
  * here in a streaming deployment).
  */
object StatefulCounts {

  case class UserEvent(user_id: Long, event_type: String)
  case class UserState(events: Long, errors: Long)
  case class UserSnapshot(user_id: Long, events: Long, errors: Long)

  /** Running per-user (events, errors) counters, updated per
    * micro-batch, emitted as a changelog in Update mode. */
  def runningCounts(events: Dataset[UserEvent]): Dataset[UserSnapshot] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserSnapshot](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[UserEvent],
         state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0L))
          var ev = prev.events
          var er = prev.errors
          batch.foreach { e =>
            ev += 1
            if (e.event_type == "error") er += 1
          }
          val next = UserState(ev, er)
          state.update(next)
          UserSnapshot(userId, next.events, next.errors)
      }
  }
}
