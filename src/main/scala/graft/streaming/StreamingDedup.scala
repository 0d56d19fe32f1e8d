package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ops.Exprs

/** Streaming EXACT dedup over the `documents` stream: emit each document
  * the first time its content (normalized text, same normalize + fnv1a64
  * kernels as the batch A1 surface — reference semantics
  * internal/dedupe/dedupe.go:260-284) is seen; suppress every later
  * arrival. The streaming twin of the batch exact-dedup winners (q05/q22):
  * replaying any prefix of the stream yields exactly the batch winners of
  * that prefix (pinned by StreamingDedupSpec).
  *
  * State model: `flatMapGroupsWithState` keyed by the 64-bit content hash;
  * state per key is the winning doc_id. Within one micro-batch the minimum
  * doc_id wins (the group iterator's order is not deterministic, the min
  * is) — across batches the earlier batch wins, which is the streaming
  * "kept-order" analogue. Output is append-mode safe: a key emits at most
  * one row ever.
  *
  * Scale shape: the only exchange per micro-batch is the hash partition on
  * the 8-byte key; state is one long per DISTINCT document, so the state
  * store holds the corpus fingerprint, not the corpus. At web scale back
  * it with the RocksDB state store provider (spilling keys off-heap) and
  * note the deliberate choice of NoTimeout: expiring state with a TTL
  * would re-admit duplicates older than the TTL — exact dedup state must
  * be as durable as the corpus it fingerprints.
  */
object StreamingDedup {

  final case class NovelDoc(doc_id: Long, xhash: Long)

  /** documents stream (doc_id, text, ...) -> first-seen novel docs. */
  def novelDocs(docsStream: DataFrame)(
      implicit spark: SparkSession): Dataset[NovelDoc] = {
    import spark.implicits._
    docsStream
      .select(col("doc_id").cast("long").as("doc_id"),
        Exprs.fnv1a64(Exprs.normCol(col("text"))).as("xhash"))
      .as[(Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, NovelDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (hash: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          // state value = the winning doc_id (one primitive long per key)
          if (state.exists) Iterator.empty
          else {
            val winner = rows.map(_._1).min
            state.update(winner)
            Iterator.single(NovelDoc(winner, hash))
          }
      }
  }
}
