package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** x15: streaming per-user event-sequence TRANSITIONS — the stateful
  * stream twin of the batch transition matrix (`ops.Analytics.q72`),
  * built on `flatMapGroupsWithState`: each user's state is their LAST
  * seen event, each micro-batch emits one (from_type, to_type) hop per
  * consecutive pair — including the hop that stitches this batch's first
  * event to the previous batch's last — so the running aggregate of hops
  * equals the batch matrix over the same prefix.
  *
  * Ordering contract: within a micro-batch rows sort by (ts, event_id) —
  * the batch query's exact order — before pairing, so intra-batch
  * disorder is absorbed; an event arriving in a LATER batch than a
  * younger sibling is stitched in arrival order (the at-least-once
  * streaming trade; the batch query is the retrospective exact form).
  *
  * Scale notes: state is one (ts, event_id, type) triple per user —
  * bounded by user cardinality, not stream length, partitioned by the
  * user key's shuffle; for unbounded user spaces add the
  * [[StatefulDedup.dedupStreamTtl]] TTL pattern verbatim.
  */
object Transitions {

  case class UserEvent(
      user_id: Long, ts: java.sql.Timestamp, event_id: Long,
      event_type: String)
  case class Hop(user_id: Long, from_type: String, to_type: String)
  case class Last(ts: Long, event_id: Long, event_type: String)

  def transitions(events: Dataset[UserEvent]): Dataset[Hop] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Last, Hop](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[Last]) =>
          val batch = rows.toList.sortBy(e => (e.ts.getTime, e.event_id))
          val seq = state.getOption
            .map(l => UserEvent(uid, new java.sql.Timestamp(l.ts),
              l.event_id, l.event_type))
            .toList ++ batch
          val hops = seq.iterator.zip(seq.iterator.drop(1))
            .map { case (a, b) => Hop(uid, a.event_type, b.event_type) }
            .toList
          val lastEv = seq.last
          state.update(Last(lastEv.ts.getTime, lastEv.event_id,
            lastEv.event_type))
          hops.iterator
      }
  }
}
