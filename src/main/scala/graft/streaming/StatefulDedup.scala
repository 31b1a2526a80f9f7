package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact dedup with custom state (`flatMapGroupsWithState`) —
  * the reference target's PK duplicate guard (`init/postgres-2/init.sql:2`)
  * as a first-class stateful stream operator: the first document to arrive
  * under a content key is emitted, every later arrival is suppressed, and
  * the seen-set persists in the state store across micro-batches and
  * restarts.
  *
  * Scale notes: state is one boolean per distinct key, partitioned by the
  * key's shuffle — bounded by corpus cardinality, not stream length. For
  * unbounded key spaces give the state a TTL via
  * `GroupStateTimeout.ProcessingTimeTimeout` (the daily rate-cache cutoff
  * pattern, R18) instead of `NoTimeout`.
  */
object StatefulDedup {

  case class Keyed(key: String, doc_id: Long, text: String)

  /** Emit only the first arrival per key. Within a single micro-batch the
    * group's iterator order is not deterministic, so the minimum doc_id
    * wins the tie — across batches, arrival order decides, as in any
    * at-least-once ingest.
    */
  def dedupStream(docs: Dataset[Keyed]): Dataset[Keyed] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.key)
      .flatMapGroupsWithState[Boolean, Keyed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Keyed], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(rows.minBy(_.doc_id))
          }
      }
  }

  case class KeyedT(key: String, doc_id: Long, text: String,
      ts: java.sql.Timestamp)

  /** The BOUNDED-state form for unbounded key spaces — the TTL the
    * [[dedupStream]] scale note prescribes, implemented: a key's seen-bit
    * expires once the event-time watermark passes its last arrival + ttl,
    * so state holds only keys seen within the horizon instead of every key
    * ever. The price is the standard streaming-dedup contract (the same
    * trade Spark's own `dropDuplicatesWithinWatermark` makes): a duplicate
    * recurring AFTER the horizon is re-admitted. Each arrival slides the
    * key's expiry forward (touch-extends), and the timeout target is
    * clamped above the current watermark — `setTimeoutTimestamp` rejects
    * already-passed instants for a very-late (within `lateness`) batch.
    */
  def dedupStreamTtl(
      docs: Dataset[KeyedT],
      lateness: String,
      ttlMs: Long): Dataset[KeyedT] = {
    import docs.sparkSession.implicits._
    docs.withWatermark("ts", lateness)
      .as[KeyedT]
      .groupByKey(_.key)
      .flatMapGroupsWithState[Long, KeyedT](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[KeyedT], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val batch = rows.toList // single-pass iterator, bounded per key+batch
            val out =
              if (state.exists) Iterator.empty
              else Iterator.single(batch.minBy(r => (r.ts.getTime, r.doc_id)))
            state.update(batch.map(_.ts.getTime).max)
            state.setTimeoutTimestamp(
              math.max(state.get + ttlMs, state.getCurrentWatermarkMs() + 1))
            out
          }
      }
  }
}
