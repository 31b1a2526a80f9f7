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
}
