package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** x23: STREAMING SCD2 maintenance — the stateful-stream twin of the
  * batch dimension build (`ops.Scd.q91`) the way a warehouse actually
  * ingests a change log: per-key state is the OPEN version (attribute,
  * effective_from, version number); an arriving event with a changed
  * attribute emits the now-CLOSED version (is_current = false,
  * effective_to = the new event's time) and opens the next; a same-
  * attribute event extends the open version silently (the collapse).
  * The sink therefore accumulates exactly the dimension's closed
  * history, in version order per key, while the open rows live in state
  * — which is precisely the split a streaming dim maintains (closed
  * history appended to the table, current rows served from state/cache).
  *
  * Stream ≡ batch: with chronological (ts, event_id) arrival the fold
  * sees the batch build's exact order, so the change sequence — and
  * with it every (attr, from, to, version) closed row — is identical to
  * `scd2Build`'s non-current rows (the x23b gate proves it against
  * q91's oracle filtered to closed versions). Out-of-order arrival
  * degrades in arrival order (the at-least-once trade x15 documents);
  * the batch build is the retrospective exact form.
  *
  * Scale notes: state is one (attr, ts, version) triple per key —
  * bounded by key cardinality, not stream length, sharded by the
  * groupByKey shuffle; add [[StatefulDedup.dedupStreamTtl]]'s TTL
  * pattern for unbounded key spaces. Timestamps stay `java.sql.Timestamp`
  * end-to-end (µs precision round-trips; a getTime/ms shortcut would
  * corrupt effective_from under the hash gate).
  */
object Scd2Stream {

  case class LogEvent(
      user_id: Long, ts: java.sql.Timestamp, event_id: Long,
      event_type: String)
  case class OpenVersion(
      event_type: String, effective_from: java.sql.Timestamp, version: Int)
  case class ClosedVersion(
      user_id: Long, event_type: String,
      effective_from: java.sql.Timestamp, effective_to: java.sql.Timestamp,
      version: Int, is_current: Boolean)

  def scd2Stream(log: Dataset[LogEvent]): Dataset[ClosedVersion] = {
    import log.sparkSession.implicits._
    log.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenVersion, ClosedVersion](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[LogEvent], state: GroupState[OpenVersion]) =>
          val batch = rows.toList.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
          var cur = state.getOption.orNull
          val closed = List.newBuilder[ClosedVersion]
          batch.foreach { e =>
            if (cur == null) {
              cur = OpenVersion(e.event_type, e.ts, 1)
            } else if (cur.event_type != e.event_type) {
              closed += ClosedVersion(uid, cur.event_type,
                cur.effective_from, e.ts, cur.version, is_current = false)
              cur = OpenVersion(e.event_type, e.ts, cur.version + 1)
            } // same attribute: the open version extends, nothing emits
          }
          if (cur != null) state.update(cur)
          closed.result().iterator
      }
  }
}
