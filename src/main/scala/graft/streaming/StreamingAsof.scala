package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch as-of join (`graft.ops.Events.asofJoin`,
  * q65): enrich every probe event, as it arrives, with the user's latest
  * build-side event (e.g. most recent purchase) — the online feature-store
  * lookup. State per user is ONE row: the best (ts, event_id) build event
  * seen so far; probes join against it with zero shuffle beyond the
  * per-micro-batch user_id partition.
  *
  * Ordering contract (mirrors the batch total order (ts, tag, event_id)):
  * within a micro-batch, rows are processed in exactly that order, so a
  * build event enriches equal-or-later probes of the SAME batch including
  * the inclusive-at-equal-ts case. Across batches the state carries the
  * MAX-(ts, event_id) build event rather than the last-arrived one, so a
  * late (out-of-order) build arrival can never regress the state — but a
  * probe that arrives BEFORE its matching build row (across batches) is
  * enriched with the state as of its own batch, which is the honest online
  * answer. When batches respect event-time order, streamed output equals
  * the batch operator row-for-row (pinned by StreamingAsofSpec).
  *
  * Scale shape: state is 3 longs + a double per DISTINCT user; back the
  * store with RocksDB at web scale. NoTimeout is deliberate: a user's
  * latest purchase stays valid indefinitely; expire via a business-rule
  * TTL only if the semantics call for it.
  */
object StreamingAsof {

  final case class Enriched(event_id: Long, user_id: Long, ts_us: Long,
      event_type: String, asof_id: Option[Long], asof_value: Option[Double],
      lag_us: Option[Long])

  /** (b_id, b_value, b_ts_us) of the user's best build event so far. */
  private type BuildState = (Long, Double, Long)

  def enrich(eventsStream: DataFrame, buildType: String = "purchase")(
      implicit spark: SparkSession): Dataset[Enriched] = {
    import spark.implicits._
    eventsStream
      .select(col("event_id").cast("long"), col("user_id").cast("long"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("event_type"), col("value").cast("double"))
      .as[(Long, Long, Long, String, Double)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[BuildState, Enriched](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long, String, Double)],
         state: GroupState[BuildState]) =>
          // the batch operator's total order: (ts, tag, event_id) with
          // build rows (tag 0) before probes at equal ts
          val sorted = rows.toVector.sortBy(r =>
            (r._3, if (r._4 == buildType) 0 else 1, r._1))
          var st = state.getOption
          val out = Vector.newBuilder[Enriched]
          for (r <- sorted) {
            if (r._4 == buildType) {
              // max-(ts, event_id) wins: a late replay of an OLD build
              // event must not regress the state
              if (st.forall(s => s._3 < r._3 || (s._3 == r._3 && s._1 < r._1))) {
                st = Some((r._1, r._5, r._3))
              }
            } else {
              out += Enriched(r._1, uid, r._3, r._4,
                st.map(_._1), st.map(_._2), st.map(s => r._3 - s._3))
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }
}
