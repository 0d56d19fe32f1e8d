package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Windowed ingestion metrics over the `events` stream table — the
  * pipeline-observability member of the metrics family (north_star: "…
  * extraction metrics … written to a metrics table"; the reference's only
  * analogue is the run report, report.go:34-72, which is a single batch
  * summary — event-time windowing is graft-only surface). Also makes the
  * doctor's `events` probe load-bearing: the table it checks is consumed
  * here.
  *
  * Determinism discipline (oracle-hash-identical across engines):
  *   - `value` is quantized to integer cents PER ROW, BEFORE the sum — a
  *     double sum's result depends on partitioning/order; an int64 sum
  *     doesn't.
  *   - inter-arrival gaps are computed in whole MICROSECONDS (no division,
  *     no rounding mode to disagree on) with a total order tie-break
  *     (ts, event_id).
  *
  * Scale shape: one hash exchange on (event_type, hour) shared by the lag
  * window and the aggregation (same clustering keys, Catalyst reuses the
  * partitioning); distinct-user count is a standard two-phase aggregate.
  * Hot event types are bounded by the hour bucketing; residual skew is
  * AQE's job.
  */
object Events {

  /** Per-row integer quantization of the double `value` (cents). */
  private def cents: Column = floor(col("value") * 100).cast("long")

  /** Parquet writes the synthetic events' ts as TIMESTAMP_NTZ (no UTC
    * adjustment); with the session pinned to UTC this cast maps wall time
    * to the same instant DuckDB's naive-as-UTC reads give — and it's a
    * no-op when the input is already a zoned timestamp (streaming test
    * fixtures).
    */
  private def ts: Column = col("ts").cast("timestamp")

  /** Tumbling 1-hour event-time windows per event_type: event count,
    * distinct users, order-independent value sum, and the max intra-window
    * inter-arrival gap (an ingestion-lag/skew indicator; -1 for
    * single-event windows).
    */
  def windowedMetrics(events: DataFrame): DataFrame = {
    val hour = date_trunc("hour", ts)
    val w = Window.partitionBy(col("event_type"), hour)
      .orderBy(ts, col("event_id"))
    events.select(
        col("event_type"), hour.as("h"), col("user_id"), cents.as("cents"),
        (unix_micros(ts) - lag(unix_micros(ts), 1).over(w)).as("gap_us"))
      .groupBy(col("h"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("cents")).as("value_cents"),
        coalesce(max(col("gap_us")), lit(-1L)).as("max_gap_us"))
      .select(unix_timestamp(col("h")).as("hour_ts"), col("event_type"),
        col("n_events"), col("n_users"), col("value_cents"), col("max_gap_us"))
  }

  /** Gap-based sessionization, batch form (oracled as q40): a user's
    * events are split into sessions wherever the inter-event gap EXCEEDS
    * `gapMinutes`; one row per session with start/end, count and the
    * order-independent cents sum. Two stacked window functions + the final
    * aggregate all cluster on user_id, so the whole operator is ONE hash
    * exchange. Boundary semantics: an event EXACTLY gapMinutes after its
    * predecessor still merges — `session_window` merges sessions on an
    * inclusive boundary (verified by an exact-boundary fixture in
    * EventsSpec; the first cut used `>=` and diverged from the engine), so
    * the split predicate here is strictly `gap > gapMinutes`.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val base = events.select(col("user_id"), col("event_id"),
      unix_micros(ts).as("t"), cents.as("cents"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    base
      .withColumn("is_new",
        when(lag(col("t"), 1).over(w).isNull ||
          col("t") - lag(col("t"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("is_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("t")).as("start_us"),
        max(col("t")).as("end_us"),
        count(lit(1)).as("n_events"),
        sum(col("cents")).as("value_cents"))
  }

  /** Sessionization via the built-in `session_window` — the form that runs
    * UNCHANGED on a stream (merging session state is managed by the
    * engine; with a watermark, append mode emits each session exactly once
    * when the watermark passes sessionEnd+gap). Chosen over a hand-rolled
    * `flatMapGroupsWithState` deliberately: composing the built-in is
    * preference (a) in the custom-operator ladder — the state store,
    * session merge and timeout logic come from the engine, codegen'd,
    * instead of custom state code. [[sessionize]] is the relational twin
    * whose DuckDB oracle locks the session semantics.
    */
  def sessionWindows(events: DataFrame, gapMinutes: Int = 30,
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events.withColumn("ts", ts))(d =>
      events.withColumn("ts", ts).withWatermark("ts", d))
    src.groupBy(session_window(col("ts"), s"$gapMinutes minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(cents).as("value_cents"))
      .select(col("user_id"), unix_micros(col("w.start")).as("start_us"),
        col("n_events"), col("value_cents"))
  }

  /** The streaming-safe windowed aggregate (no lag window, no EXACT
    * distinct — neither is expressible incrementally): tumbling 1-hour
    * `window()` + optional event-time watermark. User counts ARE on the
    * stream, as `n_users_approx` = HyperLogLog++ `approx_count_distinct`
    * (its sketch merges incrementally across micro-batches, which is
    * exactly why exact countDistinct can't ride along) — the batch q39
    * surface keeps the EXACT `n_users`, and the two may diverge by the
    * HLL++ relative error (~2% at the default precision); a consumer
    * needing exactness reconciles against the batch table. The SAME
    * function serves batch frames (watermark is a no-op there), which is
    * what StreamingSpec pins: streamed-with-watermark == batch, window by
    * window, including the sketch column.
    */
  def windowedCounts(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events.withColumn("ts", ts))(d => events.withColumn("ts", ts).withWatermark("ts", d))
    src.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(cents).as("value_cents"),
        approx_count_distinct(col("user_id")).as("n_users_approx"))
      .select(unix_timestamp(col("w.start")).as("hour_ts"), col("event_type"),
        col("n_events"), col("value_cents"), col("n_users_approx"))
  }

  /** Schema-on-read over the semi-structured `props` JSON column plus the
    * per-type rollup: parse `$.k` as a long, then count/sum/min/max per
    * event_type — the typed-projection step every event pipeline runs over
    * its freeform-properties column (no reference analogue; graft-added
    * §2.9).
    *
    * `from_json` is PERMISSIVE: malformed JSON (or a missing/non-numeric
    * `k`) yields a null struct/field, so bad rows still count toward `n`
    * but drop out of the k aggregates — a poisoned record degrades one
    * field, never the job (pinned by EventsSpec). Scale shape: the parse
    * is a map-side projection next to the scan; the rollup is ONE
    * event_type-keyed exchange carrying map-side partial rows. At 100 TB
    * the only caveat is that `props` must be column-pruned INTO the scan
    * (it is — ReadSchema carries just event_type + props here), because a
    * freeform JSON column is routinely the widest thing in an event table.
    */
  /** As-of join: attach to every probe event the LATEST build-side event
    * (the `buildType`, e.g. each user's most recent purchase) with
    * build.ts <= probe.ts, per user — the classic point-in-time lookup
    * Spark has no native operator for (feature stores, attribution,
    * "state as of this moment" enrichment).
    *
    * Implementation is the sort-based union trick, NOT a range join: tag
    * build rows 0 / probe rows 1, union, and take a running
    * `last(ignoreNulls)` of the build payload over
    * (partition user_id, order ts, tag, event_id, rows unbounded
    * preceding..current). Every probe row then carries the build row most
    * recently seen at or before it. Semantics are pinned by the sort key:
    * tag 0 < 1 makes a build event AT the probe's exact timestamp count
    * as "prior" (inclusive, matching DuckDB/kdb ASOF); event_id makes
    * equal-ts build ties deterministic (latest id wins under last()).
    *
    * Scale shape: ONE user_id exchange + sort — no per-candidate row
    * explosion (a range join materializes probe×build pairs per user
    * before picking the max; this never materializes more than the union
    * itself). Skew is bounded by a single user's event count. Lag is
    * integer microseconds (no division, nothing to round).
    */
  def asofJoin(events: DataFrame, buildType: String = "purchase"): DataFrame = {
    val build = events.filter(col("event_type") === buildType)
      .select(col("user_id"), ts.as("ts"), lit(0).as("tag"), col("event_id"),
        lit(null).cast("string").as("event_type"),
        col("event_id").as("b_id"), col("value").as("b_value"),
        ts.as("b_ts"))
    val probe = events.filter(col("event_type") =!= buildType)
      .select(col("user_id"), ts.as("ts"), lit(1).as("tag"), col("event_id"),
        col("event_type"),
        lit(null).cast("long").as("b_id"),
        lit(null).cast("double").as("b_value"),
        lit(null).cast("timestamp").as("b_ts"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    build.unionByName(probe)
      .withColumn("asof_id", last(col("b_id"), ignoreNulls = true).over(w))
      .withColumn("asof_value", last(col("b_value"), ignoreNulls = true).over(w))
      .withColumn("asof_ts", last(col("b_ts"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"),
        col("asof_id"), col("asof_value"),
        (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("lag_us"))
  }

  /** Range join (interval containment): every probe event paired with
    * every build-side event of the same user whose attribution window
    * [build.ts, build.ts + windowSec] contains it — e.g. clicks within an
    * hour after each purchase. Genuinely many-to-many (overlapping windows
    * both match), unlike [[asofJoin]]'s latest-one.
    *
    * Scale shape: a naive `ts BETWEEN` predicate plans as a nested-loop /
    * cartesian per user — the textbook range-join blowup. Instead time is
    * bucketed at EXACTLY the window width, so every interval covers
    * exactly two buckets (k, k+1) and every probe lives in exactly one;
    * exploding the build side to its two buckets turns the range join
    * into a plain (user_id, bucket) EQUI-join + residual filter, with
    * each qualifying pair meeting exactly once (no dedup needed). The
    * plan is two scans, a 2x build explode, one shuffle per side, zero
    * nested loops (asserted in EventsSpec). Bounds are inclusive on both
    * ends, in integer microseconds — nothing to round, nothing to
    * disagree on across engines.
    */
  def rangeJoin(events: DataFrame, buildType: String = "purchase",
      probeType: String = "click", windowSec: Long = 3600): DataFrame = {
    require(windowSec > 0, s"window must be positive, got $windowSec")
    val w = windowSec * 1000000L
    val bkt = (c: Column) => floor(c / w).cast("long")
    val build = events.filter(col("event_type") === buildType)
      .select(col("event_id").as("build_id"), col("user_id"),
        unix_micros(ts).as("b_us"))
      .withColumn("bucket",
        explode(array(bkt(col("b_us")), bkt(col("b_us")) + 1)))
    val probe = events.filter(col("event_type") === probeType)
      .select(col("event_id").as("probe_id"), col("user_id"),
        unix_micros(ts).as("p_us"))
      .withColumn("bucket", bkt(col("p_us")))
    probe.join(build, Seq("user_id", "bucket"))
      .filter(col("p_us") >= col("b_us") && col("p_us") <= col("b_us") + w)
      .select(col("probe_id"), col("build_id"), col("user_id"),
        (col("p_us") - col("b_us")).as("delta_us"))
  }

  def propsMetrics(events: DataFrame): DataFrame = {
    val schema = StructType(Seq(StructField("k", LongType)))
    events
      .select(col("event_type"),
        from_json(col("props"), schema).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"))
  }
}
