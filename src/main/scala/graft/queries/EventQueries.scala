package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Sql.D

/** Batch queries over the `events` table (the streaming-source analog):
  * event-time bucketing, JSON-ish property extraction, and gap-based
  * sessionization via window functions. The true Structured Streaming
  * twins of these live in `graft.streaming` (same aggregation logic fed
  * incrementally); `stream_hourly` in StreamingQueries runs one of them
  * through a real streaming query and is hash-checked against the same
  * oracle as `ev_hourly`.
  *
  * `events.ts` is nanosecond-precision parquet; Spark truncates to µs on
  * read while DuckDB keeps ns, so every output/ordering key goes through
  * an explicit ms/hour truncation that is identical in both engines.
  */
object EventQueries {

  private def cents(c: Column): Column = floor(c * 100 + 0.5).cast("long")

  /** Tumbling 1-hour event-time buckets (epoch seconds — type-stable
    * across engines), counts + exact value sums.
    */
  private def hourly(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(cents(col("value"))) / 100.0).as("value_sum"))
      .orderBy("hour_epoch", "event_type")

  private[queries] val hourlyOracle = s"""SELECT
  CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
  event_type, COUNT(*) AS n_events, ${Sql.sumCents("value")} AS value_sum
FROM events GROUP BY 1, 2 ORDER BY hour_epoch, event_type"""

  /** Property extraction from the JSON-string `props` column. regexp on
    * both sides keeps the oracle byte-identical; `graft.functions` also
    * offers the idiomatic `from_json` path for real pipelines.
    */
  private def propsExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        regexp_extract(col("props"), """"k"\s*:\s*(\d+)""", 1).cast("int").as("k"))
      .groupBy(col("event_type"), pmod(col("k"), lit(10)).as("k_bucket"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"))
      .orderBy("event_type", "k_bucket")

  private val propsOracle = """SELECT event_type,
  CAST(regexp_extract(props, '"k"\s*:\s*(\d+)', 1) AS INT) % 10 AS k_bucket,
  COUNT(*) AS n, CAST(SUM(CAST(regexp_extract(props, '"k"\s*:\s*(\d+)', 1) AS INT)) AS BIGINT) AS k_sum
FROM events GROUP BY 1, 2 ORDER BY event_type, k_bucket"""

  /** Gap-based sessionization (30-minute inactivity), the lag/window
    * formulation; ms-epoch keys make Spark-µs vs DuckDB-ns invisible.
    */
  /** THE 30-minute-gap per-event session-id assignment (lag gap flag +
    * running sum over the one (user_id) exchange) — the single core
    * under `ev_sessionize`, `ev_pattern_match`, and [[sessionSpans]]'s
    * consumers; a gap-rule or ordering change belongs here, nowhere
    * else. Input needs (user_id, event_id, _ms); extra columns ride
    * along untouched.
    */
  private def withSessionIds(df: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("_ms"), col("event_id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("is_new",
        when(lag(col("_ms"), 1).over(wOrd).isNull ||
          (col("_ms") - lag(col("_ms"), 1).over(wOrd)) > 1800000L, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("is_new")).over(wRun))
  }

  private def sessionize(s: SparkSession, dir: String): DataFrame =
    withSessionIds(Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("_ms")))
      .groupBy(col("user_id"))
      .agg(max(col("sid")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")

  /** Debounce (near-duplicate event suppression): an event is noise if
    * it follows the PREVIOUS event of the same (user, type) within 5 s
    * — the standard lag-window formulation (suppression does not chain:
    * a suppressed event still resets the clock, which is what one lag
    * computes and what an at-least-once producer's duplicates look
    * like). Counts per type; ms-integer gaps, no float anywhere.
    */
  private def debounce(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("_ms"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_millis(col("ts")).as("_ms"))
      .withColumn("gap", col("_ms") - lag(col("_ms"), 1).over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("gap") < 5000L, 1L).otherwise(0L)).as("n_suppressed"),
        sum(when(col("gap").isNull || col("gap") >= 5000L, 1L).otherwise(0L))
          .as("n_kept"))
      .orderBy("event_type")
  }

  private val debounceOracle = """WITH e AS (
  SELECT user_id, event_type, event_id, epoch_ms(ts) AS ms FROM events
), g AS (
  SELECT event_type,
    ms - LAG(ms, 1) OVER (PARTITION BY user_id, event_type
      ORDER BY ms, event_id) AS gap
  FROM e
)
SELECT event_type, COUNT(*) AS n_events,
  CAST(SUM(CASE WHEN gap < 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_suppressed,
  CAST(SUM(CASE WHEN gap IS NULL OR gap >= 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM g GROUP BY 1 ORDER BY event_type"""

  /** Time-weighted average (TWAP): each observation holds until the
    * next one, weighted by that holding interval (capped at 1 h so one
    * overnight gap cannot own the series; the final observation has no
    * interval and drops out). Numerator/denominator are exact integer
    * (value-cents × ms); the published mean is ONE double division of
    * the two — the same exactness pattern as every money aggregate
    * here.
    */
  private def twap(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("_ms"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("_ms"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .withColumn("hold_ms",
        least(lead(col("_ms"), 1).over(w) - col("_ms"), lit(3600000L)))
      .where(col("hold_ms").isNotNull)
      .groupBy(col("user_id"))
      .agg(sum(col("cents") * col("hold_ms")).as("num"),
        sum(col("hold_ms")).as("den"))
      .select(col("user_id"), col("num"), col("den"),
        (col("num").cast("double") / col("den").cast("double")).as("twap_cents"))
      .orderBy("user_id")
  }

  private val twapOracle = """WITH e AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms,
    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
), h AS (
  SELECT user_id, cents,
    LEAST(LEAD(ms, 1) OVER (PARTITION BY user_id ORDER BY ms, event_id) - ms,
      3600000) AS hold_ms
  FROM e
)
SELECT user_id, CAST(SUM(cents * hold_ms) AS BIGINT) AS num,
  CAST(SUM(hold_ms) AS BIGINT) AS den,
  CAST(CAST(SUM(cents * hold_ms) AS BIGINT) AS DOUBLE)
    / CAST(CAST(SUM(hold_ms) AS BIGINT) AS DOUBLE) AS twap_cents
FROM h WHERE hold_ms IS NOT NULL
GROUP BY 1 ORDER BY user_id"""

  private val sessionizeOracle = """WITH e AS (
  SELECT user_id, event_id, epoch_ms(ts) AS _ms FROM events
), l AS (
  SELECT *, LAG(_ms) OVER (PARTITION BY user_id ORDER BY _ms, event_id) AS prev FROM e
), s AS (
  SELECT user_id,
    CASE WHEN prev IS NULL OR _ms - prev > 1800000 THEN 1 ELSE 0 END AS is_new
  FROM l)
SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM s GROUP BY user_id ORDER BY user_id"""

  /** Sliding event-time aggregate: per event, count + exact-cent sum of
    * the SAME user's events in the trailing hour — a RANGE window frame
    * on the ms epoch, shuffled/sorted once per user partition (the plan
    * a per-entity rolling feature needs at 100 TB; no self-join, no
    * explode).
    */
  private def rolling(s: SparkSession, dir: String): DataFrame =
    rollingWith(s, dir, chunkSpan = None)

  /** The same feature via [[graft.operators.Windows.trailingRangeAgg]]'s
    * skew-safe chunked path (2 h chunks for the 1 h frame): identical
    * output, but a hot user spreads over (user, chunk) tasks instead of
    * serializing one sort — graded against the SAME oracle.
    */
  private def rollingChunked(s: SparkSession, dir: String): DataFrame =
    rollingWith(s, dir, chunkSpan = Some(7200000L))

  private def rollingWith(s: SparkSession, dir: String,
      chunkSpan: Option[Long]): DataFrame =
    graft.operators.Windows.trailingRangeAgg(
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("_ms"),
            cents(col("value")).as("_cents")),
        Seq("user_id"), "_ms", 3600000L,
        Seq("n_1h" -> count(lit(1)), "_sum_c" -> sum(col("_cents"))),
        chunkSpan)
      .withColumn("sum_1h", col("_sum_c") / 100.0)
      .select(col("event_id"), col("user_id"), col("_ms").as("ms"),
        col("n_1h"), col("sum_1h"))
      .orderBy("event_id")

  private val rollingOracle = s"""WITH e AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ms,
    CAST(FLOOR(value * ${D("100")} + ${D("0.5")}) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id, ms,
  COUNT(*) OVER w AS n_1h,
  CAST(SUM(cents) OVER w AS BIGINT) / ${D("100")} AS sum_1h
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ms
  RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
ORDER BY event_id"""

  // --- rolling z-score anomaly flag -----------------------------------
  /** Per event: how anomalous is its value against the SAME user's
    * trailing hour — mean/variance from exact integer (cents, cents²)
    * window sums via [[graft.operators.Windows.trailingRangeAgg]], then
    * one fixed sequence of double ops (two divisions, subtract, sqrt)
    * both engines repeat bit-identically. The z-score is the
    * feature-engineering shape behind every streaming anomaly detector;
    * variance ≤ 0 (constant window, or the fp-error edge of all-equal
    * values) yields NULL, not ±inf.
    */
  private def rollingZscore(s: SparkSession, dir: String): DataFrame =
    rollingZscoreWith(s, dir, chunkSpan = None)

  /** The skew-safe chunked path (2 h chunks for the 1 h frame), graded
    * against the IDENTICAL oracle — hot users spread over (user, chunk)
    * tasks, z-scores unchanged.
    */
  private def rollingZscoreChunked(s: SparkSession, dir: String): DataFrame =
    rollingZscoreWith(s, dir, chunkSpan = Some(7200000L))

  private def rollingZscoreWith(s: SparkSession, dir: String,
      chunkSpan: Option[Long]): DataFrame = {
    val withSums = graft.operators.Windows.trailingRangeAgg(
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("_ms"),
          cents(col("value")).as("_c")),
      Seq("user_id"), "_ms", 3600000L,
      Seq("n_1h" -> count(lit(1)), "s_c" -> sum(col("_c")),
        "ss_c" -> sum(col("_c") * col("_c"))),
      chunkSpan)
    val mean = col("s_c").cast("double") / col("n_1h").cast("double")
    val variance = col("ss_c").cast("double") / col("n_1h").cast("double") -
      (col("s_c").cast("double") / col("n_1h").cast("double")) *
      (col("s_c").cast("double") / col("n_1h").cast("double"))
    withSums
      .withColumn("z", when(col("n_1h") >= 2 && variance > 0.0,
        (col("_c").cast("double") - mean) / sqrt(variance)))
      .select(col("event_id"), col("user_id"), col("_ms").as("ms"),
        col("n_1h"), col("z"))
      .orderBy("event_id")
  }

  private val rollingZscoreOracle = s"""WITH e AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ms,
    CAST(FLOOR(value * ${D("100")} + ${D("0.5")}) AS BIGINT) AS c
  FROM events
), w AS (
  SELECT event_id, user_id, ms, c,
    COUNT(*) OVER win AS n_1h,
    CAST(SUM(c) OVER win AS BIGINT) AS s_c,
    CAST(SUM(c * c) OVER win AS BIGINT) AS ss_c
  FROM e
  WINDOW win AS (PARTITION BY user_id ORDER BY ms
    RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ms, n_1h,
  CASE WHEN n_1h >= 2 AND
    CAST(ss_c AS DOUBLE) / CAST(n_1h AS DOUBLE)
      - (CAST(s_c AS DOUBLE) / CAST(n_1h AS DOUBLE))
        * (CAST(s_c AS DOUBLE) / CAST(n_1h AS DOUBLE)) > ${D("0")}
  THEN (CAST(c AS DOUBLE) - CAST(s_c AS DOUBLE) / CAST(n_1h AS DOUBLE))
    / sqrt(CAST(ss_c AS DOUBLE) / CAST(n_1h AS DOUBLE)
      - (CAST(s_c AS DOUBLE) / CAST(n_1h AS DOUBLE))
        * (CAST(s_c AS DOUBLE) / CAST(n_1h AS DOUBLE)))
  END AS z
FROM w ORDER BY event_id"""

  // --- hopping (sliding) windows --------------------------------------
  /** 1-hour windows sliding every 15 minutes — the overlapping-window
    * twin of `ev_hourly` (each event lands in width/slide = 4 windows).
    * Spark's `window(ts, width, slide)` explodes exactly those
    * assignments before a plain hash aggregate; the oracle restates the
    * explode with generate_series on epoch-ms integers.
    */
  private val HopSlideMs = 900000L
  private val HopWidthMs = 3600000L

  private def hopping(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        window(col("ts"), "1 hour", "15 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(cents(col("value"))) / 100.0).as("value_sum"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("n_events"), col("value_sum"))
      .orderBy("window_start_ms", "event_type")

  private[queries] val hoppingOracle = s"""WITH e AS (
  SELECT epoch_ms(ts) AS ms, event_type,
    CAST(FLOOR(value * ${D("100")} + ${D("0.5")}) AS BIGINT) AS cents
  FROM events
), w AS (
  SELECT (ms // $HopSlideMs) * $HopSlideMs - j * $HopSlideMs AS window_start_ms,
    event_type, cents
  FROM e, unnest(generate_series(0, ${HopWidthMs / HopSlideMs - 1})) AS t(j)
)
SELECT window_start_ms, event_type, COUNT(*) AS n_events,
  CAST(SUM(cents) AS BIGINT) / ${D("100")} AS value_sum
FROM w GROUP BY 1, 2 ORDER BY window_start_ms, event_type"""

  /** SCD2-style validity intervals: each user's event_type stream is
    * compressed to change points, every change point valid from its own
    * timestamp until the next change (NULL = still current) — the
    * slowly-changing-dimension build every warehouse derives from an
    * event log. Two window passes over the SAME (user_id) partitioning
    * (change detection, then interval close-off on the compressed rows);
    * the second pass runs on strictly fewer rows and reuses the
    * partitioning, so the fact table shuffles once.
    */
  /** Change-point detection shared by [[scd2]] (interval build) and
    * [[scd2Lookup]] (point-in-time read): one lag pass per user, keep
    * rows where the type changes.
    */
  private def changePoints(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("_ms"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("_ms"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
  }

  private def scd2(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("_ms"), col("event_id"))
    changePoints(s, dir)
      .withColumn("valid_to_ms", lead(col("_ms"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("_ms").as("valid_from_ms"), col("valid_to_ms"))
      // event_id in the output + sort: two change points can share a
      // millisecond, and the driver compare is position-sensitive
      .orderBy("user_id", "valid_from_ms", "event_id")
  }

  private val scd2Oracle = """WITH e AS (
  SELECT user_id, event_id, event_type, epoch_ms(ts) AS _ms FROM events
), l AS (
  SELECT *, LAG(event_type) OVER (PARTITION BY user_id ORDER BY _ms, event_id) AS prev_type
  FROM e
), chg AS (
  SELECT * FROM l WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_id, event_type, _ms AS valid_from_ms,
  LEAD(_ms) OVER (PARTITION BY user_id ORDER BY _ms, event_id) AS valid_to_ms
FROM chg ORDER BY user_id, valid_from_ms, event_id"""

  /** The SCD2 READ path: each purchase event looked up against the
    * change-point dimension built by [[scd2]] — "what state was this
    * user in when they purchased?" — via the generic
    * [[graft.operators.Joins.asofJoin]] (latest change at-or-before the
    * purchase). Change points are first compacted to one row per
    * (user, ms) (latest event_id wins — the as-of contract requires a
    * unique right side per key/time). Composition of two graded
    * operators; the oracle restates it with DuckDB's NATIVE ASOF JOIN.
    */
  private def scd2Lookup(s: SparkSession, dir: String): DataFrame = {
    val chg = changePoints(s, dir)
      .groupBy(col("user_id"), col("_ms").as("valid_from_ms"))
      .agg(max(struct(col("event_id"), col("event_type"))).as("m"))
      .select(col("user_id"), col("valid_from_ms"),
        col("m.event_type").as("state_type"))
    val purchases = Tables.events(s, dir)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
    graft.operators.Joins.asofJoin(
        purchases, "ms", chg, "valid_from_ms", Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("ms"),
        col("valid_from_ms"), col("state_type"))
      .orderBy("event_id")
  }

  private val scd2LookupOracle = """WITH e AS (
  SELECT user_id, event_id, event_type, epoch_ms(ts) AS _ms FROM events
), l AS (
  SELECT *, LAG(event_type) OVER (PARTITION BY user_id ORDER BY _ms, event_id) AS prev_type
  FROM e
), chg AS (
  SELECT user_id, _ms AS valid_from_ms,
    arg_max(event_type, event_id) AS state_type
  FROM l WHERE prev_type IS NULL OR prev_type <> event_type
  GROUP BY 1, 2
), p AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events
  WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ms, chg.valid_from_ms, chg.state_type
FROM p ASOF LEFT JOIN chg
  ON p.user_id = chg.user_id AND p.ms >= chg.valid_from_ms
ORDER BY p.event_id"""

  /** Weekly cohort retention: users bucketed by first-activity week,
    * counted in each later week they return. Two aggregates: per-user
    * first day (150 rows here, √N-ish at scale → broadcast back), then
    * a distinct-count per (cohort, offset) cell. All date math is
    * integer days/weeks — no timezone or DST arithmetic can diverge.
    */
  private def retention(s: SparkSession, dir: String): DataFrame = {
    val epoch = to_date(lit("2024-01-01"))
    val e = Tables.events(s, dir).select(col("user_id"), to_date(col("ts")).as("d"))
    val cohort = e.groupBy(col("user_id")).agg(min(col("d")).as("c_day"))
    e.join(broadcast(cohort), Seq("user_id"))
      .groupBy(
        floor(datediff(col("c_day"), epoch) / 7).cast("long").as("cohort_week"),
        floor(datediff(col("d"), col("c_day")) / 7).cast("long").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  private val retentionOracle = """WITH e AS (
  SELECT user_id, CAST(ts AS DATE) AS d FROM events
), cohort AS (
  SELECT user_id, MIN(d) AS c_day FROM e GROUP BY 1
)
SELECT
  CAST(FLOOR(date_diff('day', DATE '2024-01-01', c_day) / 7.0) AS BIGINT) AS cohort_week,
  CAST(FLOOR(date_diff('day', c_day, d) / 7.0) AS BIGINT) AS week_offset,
  COUNT(DISTINCT user_id) AS n_users
FROM e JOIN cohort USING (user_id)
GROUP BY 1, 2 ORDER BY cohort_week, week_offset"""

  /** Strictly-ordered conversion funnel (view → click → purchase): a
    * user advances a stage only with a LATER event of the next type;
    * each stage is a conditional min-timestamp aggregate joined forward
    * (the per-user stage tables shrink monotonically and broadcast).
    * Nothing scans events more than once per stage, and no window
    * funnels all users into one task.
    */
  private def funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("_ms"))
    val v = ev.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("_ms")).as("t_view"))
    val c = ev.where(col("event_type") === "click")
      .join(broadcast(v), Seq("user_id")).where(col("_ms") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("_ms")).as("t_click"))
    val p = ev.where(col("event_type") === "purchase")
      .join(broadcast(c), Seq("user_id")).where(col("_ms") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("_ms")).as("t_purchase"))
    ev.agg(countDistinct(col("user_id")).as("n_users"))
      .crossJoin(v.agg(count(lit(1)).as("n_view")))
      .crossJoin(c.agg(count(lit(1)).as("n_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
  }

  private val funnelOracle = """WITH e AS (
  SELECT user_id, event_type, epoch_ms(ts) AS _ms FROM events
), v AS (
  SELECT user_id, MIN(_ms) AS t_view FROM e WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, MIN(_ms) AS t_click
  FROM e JOIN v USING (user_id)
  WHERE event_type = 'click' AND _ms > t_view GROUP BY 1
), p AS (
  SELECT e.user_id, MIN(_ms) AS t_purchase
  FROM e JOIN c USING (user_id)
  WHERE event_type = 'purchase' AND _ms > t_click GROUP BY 1
)
SELECT (SELECT COUNT(DISTINCT user_id) FROM e) AS n_users,
  (SELECT COUNT(*) FROM v) AS n_view,
  (SELECT COUNT(*) FROM c) AS n_click,
  (SELECT COUNT(*) FROM p) AS n_purchase"""

  /** CDC-style compaction (latest record per key): ONE max-of-struct
    * aggregate ordered by (ms, event_id) — map-side combinable, so each
    * partition forwards a single candidate per key and no window ever
    * funnels a key's full history into one task. The batch twin of the
    * streaming `foreachBatch` upsert exemplar.
    */
  private def latestByKey(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"),
        struct(unix_millis(col("ts")).as("ms"), col("event_id").as("eid"),
          col("event_type").as("et"), cents(col("value")).as("vc")).as("rec"))
      .groupBy(col("user_id")).agg(max(col("rec")).as("m"))
      .select(col("user_id"), col("m.ms").as("last_ms"),
        col("m.eid").as("last_event_id"), col("m.et").as("last_type"),
        (col("m.vc") / 100.0).as("last_value"))
      .orderBy("user_id")

  private val latestByKeyOracle = s"""WITH e AS (
  SELECT user_id, epoch_ms(ts) AS last_ms, event_id AS last_event_id,
    event_type AS last_type,
    CAST(FLOOR(value * ${D("100")} + ${D("0.5")}) AS BIGINT) / ${D("100")} AS last_value
  FROM events
)
SELECT user_id, last_ms, last_event_id, last_type, last_value FROM e
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY last_ms DESC, last_event_id DESC) = 1
ORDER BY user_id"""

  // --- day-of-week seasonality profile --------------------------------
  /** Per-(event_type, weekday) seasonality index: share of the type's
    * events on that weekday versus the uniform 1/7, as 7·n/total — one
    * division of two exact counts. The weekday comes from integer epoch
    * arithmetic ((days + 4) mod 7, Sunday = 0) rather than either
    * engine's `dayofweek` builtin, whose numbering conventions disagree
    * — the same trap `etl` dodges for weekday names.
    */
  private def dowProfile(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_type"),
        pmod(datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          + lit(4), lit(7)).cast("long").as("wd"))
    val byDow = e.groupBy(col("event_type"), col("wd"))
      .agg(count(lit(1)).as("n"))
    val tot = byDow.groupBy(col("event_type")).agg(sum(col("n")).as("total"))
    byDow.join(tot, Seq("event_type"))
      .select(col("event_type"), col("wd"), col("n"),
        (lit(7.0) * col("n").cast("double") / col("total").cast("double"))
          .as("seasonal_idx"))
      .orderBy("event_type", "wd")
  }

  private val dowProfileOracle = s"""WITH e AS (
  SELECT event_type,
    ((CAST(ts AS DATE) - DATE '1970-01-01') + 4) % 7 AS wd
  FROM events
), b AS (
  SELECT event_type, CAST(wd AS BIGINT) AS wd, COUNT(*) AS n
  FROM e GROUP BY 1, 2
), t AS (
  SELECT event_type, CAST(SUM(n) AS BIGINT) AS total FROM b GROUP BY 1
)
SELECT b.event_type AS event_type, wd, n,
  ${Sql.D("7")} * CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS seasonal_idx
FROM b JOIN t ON b.event_type = t.event_type
ORDER BY b.event_type, wd"""

  // --- cumulative adoption curve --------------------------------------
  /** Daily new-user counts and the running cumulative user total — the
    * adoption curve. The event log collapses to one row per user (first
    * seen day), then to one row per DAY, and only that days-long series
    * takes the single global cumulative window — the one place a global
    * window is the right plan, because its input is calendar-bounded,
    * not data-bounded.
    */
  private def adoptionCurve(s: SparkSession, dir: String): DataFrame = {
    val first = Tables.events(s, dir)
      .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("d"))
    val daily = first.groupBy(col("d")).agg(count(lit(1)).as("new_users"))
    daily
      .withColumn("cum_users",
        sum(col("new_users")).over(Window.orderBy(col("d"))))
      .orderBy("d")
  }

  private val adoptionCurveOracle = """WITH f AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d FROM events GROUP BY 1
), daily AS (
  SELECT d, COUNT(*) AS new_users FROM f GROUP BY 1
)
SELECT d, new_users,
  CAST(SUM(new_users) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
FROM daily ORDER BY d"""

  // --- bounce rate by entry event type --------------------------------
  /** Session bounce rate keyed by how the session STARTED: sessions are
    * the 30-minute-gap islands, the entry event is the session's
    * (ms, event_id)-minimum — one struct-min aggregate, no second
    * window — and a bounce is a single-event session. Rate is one
    * division of two exact counts per entry type.
    */
  private def bounceRate(s: SparkSession, dir: String): DataFrame = {
    val wu = Window.partitionBy(col("user_id")).orderBy(col("_ms"), col("event_id"))
    val sess = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("_ms"))
      .withColumn("prev", lag(col("_ms"), 1).over(wu))
      .withColumn("is_new",
        when(col("prev").isNull || (col("_ms") - col("prev")) > 1800000L, 1L)
          .otherwise(0L))
      .withColumn("sess", sum(col("is_new")).over(wu))
      .groupBy(col("user_id"), col("sess"))
      .agg(min(struct(col("_ms"), col("event_id"), col("event_type"))).as("entry"),
        count(lit(1)).as("n_events"))
    sess.groupBy(col("entry.event_type").as("entry_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1L, 1L).otherwise(0L)).as("n_bounces"))
      .withColumn("bounce_rate",
        col("n_bounces").cast("double") / col("n_sessions").cast("double"))
      .orderBy("entry_type")
  }

  private val bounceRateOracle = """WITH e AS (
  SELECT user_id, event_id, event_type, epoch_ms(ts) AS _ms FROM events
), l AS (
  SELECT *, LAG(_ms) OVER (PARTITION BY user_id ORDER BY _ms, event_id) AS prev FROM e
), s AS (
  SELECT user_id, event_id, event_type, _ms,
    SUM(CASE WHEN prev IS NULL OR _ms - prev > 1800000 THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY _ms, event_id
            ROWS UNBOUNDED PRECEDING) AS sess
  FROM l
), per AS (
  SELECT user_id, sess, COUNT(*) AS n_events FROM s GROUP BY 1, 2
), entry AS (
  SELECT user_id, sess, event_type AS entry_type FROM s
  QUALIFY ROW_NUMBER()
    OVER (PARTITION BY user_id, sess ORDER BY _ms, event_id) = 1
), per2 AS (
  SELECT entry_type, n_events FROM per JOIN entry USING (user_id, sess)
)
SELECT entry_type, COUNT(*) AS n_sessions,
  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS bounce_rate
FROM per2 GROUP BY 1 ORDER BY entry_type"""

  // --- funnel conversion latency --------------------------------------
  /** Time-to-convert distribution: for every user whose first purchase
    * happens at-or-after their first view, the view→purchase latency in
    * ms, summarized as count + exact interpolated p50/p90 (floored to
    * integer ms so both engines publish the identical value). Two
    * conditional min aggregates and one broadcast-sized join — no
    * window over the event log, so the plan is two map-side-combinable
    * passes however large the stream.
    */
  private def funnelLatency(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
    val v = ev.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ms")).as("v_ms"))
    val lat = ev.where(col("event_type") === "purchase")
      .join(v, Seq("user_id"))
      .where(col("ms") >= col("v_ms"))
      .groupBy(col("user_id"))
      .agg((min(col("ms")) - max(col("v_ms"))).as("lat_ms"))
    // exact quantile_cont via the distributed per-value scan, not the
    // every-value-in-one-buffer `percentile` aggregate (Quantiles doc)
    val qd = graft.operators.Quantiles.interpolated(
      lat, "lat_ms", Seq(), Seq(0.5, 0.9))
    val piv = qd.agg(
      max(when(col("p") === 0.5, col("q"))).as("q50"),
      max(when(col("p") === 0.9, col("q"))).as("q90"))
    lat.agg(count(lit(1)).as("n_converted")).crossJoin(broadcast(piv))
      .select(col("n_converted"),
        floor(col("q50") + lit(0.5)).cast("long").as("p50_ms"),
        floor(col("q90") + lit(0.5)).cast("long").as("p90_ms"))
  }

  private val funnelLatencyOracle = s"""WITH v AS (
  SELECT user_id, MIN(epoch_ms(ts)) AS v_ms FROM events
  WHERE event_type = 'view' GROUP BY 1
), lat AS (
  SELECT e.user_id, MIN(epoch_ms(e.ts)) - MAX(v.v_ms) AS lat_ms
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) >= v.v_ms
  GROUP BY 1
)
SELECT COUNT(*) AS n_converted,
  CAST(FLOOR(quantile_cont(lat_ms, ${Sql.D("0.5")}) + ${Sql.D("0.5")}) AS BIGINT) AS p50_ms,
  CAST(FLOOR(quantile_cont(lat_ms, ${Sql.D("0.9")}) + ${Sql.D("0.5")}) AS BIGINT) AS p90_ms
FROM lat"""

  // --- churn label generation (training-data shape) -------------------
  /** Supervised-learning label table: per user, activity features
    * (event count, distinct active days, days since last event relative
    * to the corpus horizon) and a `churned` label = silent for the last
    * 14 days of the observed window. The horizon is ONE scalar max
    * cross-joined back — integer day math end-to-end, so the label
    * boundary cannot drift between engines. This is the label-joins-
    * features shape every churn/abuse model pipeline feeds on.
    */
  private def churnLabels(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        to_date(col("ts")).as("d"))
    val g = e.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("d")).as("n_active_days"),
        max(col("ms")).as("last_ms"))
    val horizon = e.agg(max(col("ms")).as("end_ms")) // 1×1
    g.crossJoin(horizon)
      .select(col("user_id"), col("n_events"), col("n_active_days"),
        ((col("end_ms") - col("last_ms")) / lit(86400000L)).cast("long")
          .as("last_gap_days"))
      .withColumn("churned", col("last_gap_days") >= 14)
      .orderBy("user_id")
  }

  private val churnLabelsOracle = """WITH e AS (
  SELECT user_id, epoch_ms(ts) AS ms, CAST(ts AS DATE) AS d FROM events
), g AS (
  SELECT user_id, COUNT(*) AS n_events,
    CAST(COUNT(DISTINCT d) AS BIGINT) AS n_active_days,
    MAX(ms) AS last_ms
  FROM e GROUP BY 1
), h AS (SELECT MAX(ms) AS end_ms FROM e)
SELECT user_id, n_events, n_active_days,
  (end_ms - last_ms) // 86400000 AS last_gap_days,
  (end_ms - last_ms) // 86400000 >= 14 AS churned
FROM g CROSS JOIN h ORDER BY user_id"""

  // --- gaps and islands (activity streaks) ----------------------------
  /** Per-user activity streaks over distinct active DAYS — the classic
    * gaps-and-islands shape (day minus row_number is constant within a
    * run of consecutive days): total active days, number of islands,
    * and longest streak. All integer arithmetic; the distinct collapses
    * the event volume to ≤ (users × days) rows before the one window
    * pass, so a chatty user costs the same as a quiet one.
    */
  private def activityIslands(s: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    days
      .withColumn("grp",
        datediff(col("d"), lit("1970-01-01").cast("date")).cast("long")
          - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_islands"),
        max(col("len")).as("longest_streak"))
      .orderBy("user_id")
  }

  private val activityIslandsOracle = """WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), g AS (
  SELECT user_id,
    CAST(d - DATE '1970-01-01' AS BIGINT)
      - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
  FROM days
), isl AS (
  SELECT user_id, grp, COUNT(*) AS len FROM g GROUP BY 1, 2
)
SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
  COUNT(*) AS n_islands, CAST(MAX(len) AS BIGINT) AS longest_streak
FROM isl GROUP BY user_id ORDER BY user_id"""

  // --- Markov transition matrix (next-action model) -------------------
  /** Event-type transition matrix over each user's timeline: counts and
    * P(dst|src) for consecutive pairs — the next-action model / UX-flow
    * audit. Reuses [[graft.operators.Graphs.transitionEdges]] (one lead
    * window per user, one shuffle on the pair); the probability window
    * then runs over the aggregated |types|² matrix, which stays tiny
    * however large the event log, and P is ONE division of two exact
    * counts, so no float-order divergence.
    */
  private def transitionMatrix(s: SparkSession, dir: String): DataFrame = {
    val m = graft.operators.Graphs
      .transitionEdges(Tables.events(s, dir), col("event_type"))
      .select(col("src"), col("dst"), col("w").as("n"))
    m.withColumn("p", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("src"))).cast("double"))
      .orderBy("src", "dst")
  }

  private val transitionMatrixOracle = """WITH seq AS (
  SELECT event_type AS src,
    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
), m AS (
  SELECT src, dst, COUNT(*) AS n FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2
)
SELECT src, dst, n,
  CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE) AS p
FROM m ORDER BY src, dst"""

  // --- top session paths (clickstream path analysis) ------------------
  /** Top-20 session opening paths: sessionize (30-minute gap), take each
    * session's first five event types in time order, and count sessions
    * per `a>b>c` path string. The per-session path is assembled from
    * five conditional `max(when(rn = i))` aggregates — map-side
    * combinable, no collect_list, so a monster session costs the same
    * as a short one — and `concat_ws` skips the nulls of short sessions
    * exactly like the oracle's ordered `string_agg` over `rn <= 5`.
    */
  private def sessionPaths(s: SparkSession, dir: String): DataFrame = {
    val wu = Window.partitionBy(col("user_id")).orderBy(col("_ms"), col("event_id"))
    val sessioned = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("_ms"))
      .withColumn("prev", lag(col("_ms"), 1).over(wu))
      .withColumn("is_new",
        when(col("prev").isNull || (col("_ms") - col("prev")) > 1800000L, 1L)
          .otherwise(0L))
      .withColumn("sess", sum(col("is_new")).over(wu))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"), col("sess"))
          .orderBy(col("_ms"), col("event_id"))))
    def at(i: Int) = max(when(col("rn") === i, col("event_type")))
    sessioned.where(col("rn") <= 5)
      .groupBy(col("user_id"), col("sess"))
      .agg(concat_ws(">", at(1), at(2), at(3), at(4), at(5)).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(desc("n_sessions"), col("path"))
      .limit(20)
  }

  private val sessionPathsOracle = """WITH e AS (
  SELECT user_id, event_id, event_type, epoch_ms(ts) AS _ms FROM events
), l AS (
  SELECT *, LAG(_ms) OVER (PARTITION BY user_id ORDER BY _ms, event_id) AS prev FROM e
), s AS (
  SELECT user_id, event_id, event_type, _ms,
    SUM(CASE WHEN prev IS NULL OR _ms - prev > 1800000 THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY _ms, event_id
            ROWS UNBOUNDED PRECEDING) AS sess
  FROM l
), r AS (
  SELECT *, ROW_NUMBER()
    OVER (PARTITION BY user_id, sess ORDER BY _ms, event_id) AS rn
  FROM s
), p AS (
  SELECT user_id, sess, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= 5 GROUP BY 1, 2
)
SELECT path, COUNT(*) AS n_sessions FROM p
GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 20"""

  // --- DAU / WAU stickiness -------------------------------------------
  /** Daily active users, trailing-7-day weekly active users, and the
    * DAU/WAU stickiness ratio per observed day. WAU is computed WITHOUT
    * a range join or a distinct-over-range window: each (user, day)
    * activity row fans out to the 7 window-end days it covers
    * (`explode(sequence(d, d+6))`), then one count-distinct per
    * covering day — an equi-shuffle plan that scales linearly with a
    * constant 7× fan-out, where the naive `BETWEEN` join is a
    * broadcast-nested-loop. At extreme scale the count-distinct swaps
    * for an HLL sketch union with no shape change.
    */
  private def dauWau(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val dau = ud.groupBy(col("d")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"), explode(sequence(col("d"), date_add(col("d"), 6))).as("wd"))
      .groupBy(col("wd")).agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, col("d") === col("wd"))
      .select(col("d"), col("dau"), col("wau"),
        (col("dau").cast("double") / col("wau").cast("double")).as("stickiness"))
      .orderBy("d")
  }

  private val dauWauOracle = """WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), dau AS (
  SELECT d, COUNT(*) AS dau FROM ud GROUP BY 1
), fan AS (
  SELECT user_id, CAST(unnest(generate_series(CAST(d AS TIMESTAMP),
    CAST(d AS TIMESTAMP) + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS DATE) AS wd
  FROM ud
), wau AS (
  SELECT wd, COUNT(DISTINCT user_id) AS wau FROM fan GROUP BY 1
)
SELECT d, dau, wau,
  CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness
FROM dau JOIN wau ON d = wd ORDER BY d"""

  // --- audience overlap between event types ---------------------------
  /** Pairwise audience overlap across event types: for every type pair,
    * the distinct-user intersection plus Jaccard and Szymkiewicz-
    * Simpson overlap coefficients. One distinct (type, user) pass, a
    * self-equi-join on user (ids only cross the shuffle), and exact
    * integer set sizes — the two coefficients are single divisions of
    * exact counts. Pairs with an empty intersection drop out of the
    * inner join by construction.
    */
  private def audienceOverlap(s: SparkSession, dir: String): DataFrame = {
    val su = Tables.events(s, dir)
      .select(col("event_type"), col("user_id")).distinct()
    val sizes = su.groupBy(col("event_type")).agg(count(lit(1)).as("nu"))
    val inter = su.as("a").join(su.as("b"),
        col("a.user_id") === col("b.user_id")
          && col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("nu", "na"), col("type_a") === col("event_type")).drop("event_type")
      .join(sizes.withColumnRenamed("nu", "nb"), col("type_b") === col("event_type")).drop("event_type")
      .select(col("type_a"), col("type_b"), col("na"), col("nb"), col("n_inter"),
        (col("n_inter").cast("double")
          / (col("na") + col("nb") - col("n_inter")).cast("double")).as("jaccard"),
        (col("n_inter").cast("double")
          / least(col("na"), col("nb")).cast("double")).as("overlap"))
      .orderBy("type_a", "type_b")
  }

  private val audienceOverlapOracle = """WITH su AS (
  SELECT DISTINCT event_type, user_id FROM events
), sz AS (
  SELECT event_type, COUNT(*) AS nu FROM su GROUP BY 1
), inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_inter
  FROM su a JOIN su b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, sa.nu AS na, sb.nu AS nb, n_inter,
  CAST(n_inter AS DOUBLE) / CAST(sa.nu + sb.nu - n_inter AS DOUBLE) AS jaccard,
  CAST(n_inter AS DOUBLE) / CAST(LEAST(sa.nu, sb.nu) AS DOUBLE) AS overlap
FROM inter JOIN sz sa ON type_a = sa.event_type
           JOIN sz sb ON type_b = sb.event_type
ORDER BY type_a, type_b"""

  /** Per-user exponentially weighted moving average (α = 1/2) over the
    * (ts, event_id)-ordered value series — the one aggregate in this
    * module that is inherently SEQUENTIAL per key (each step depends on
    * the previous), so no window/agg builtin expresses it. The engine
    * shape is the secondary-sort pattern: `repartition(user_id)` +
    * `sortWithinPartitions(user_id, ts, event_id)` + one-pass
    * `mapPartitions` over contiguous per-user runs — one shuffle, zero
    * per-key state beyond the running scalar, and the executor never
    * materializes a user's series (contrast collect_list, which would).
    * At 100 TB this is the same plan: the shuffle is keyed on user_id
    * and each task streams its users in order.
    *
    * α = 1/2 makes every step `(s + x) / 2` — the identical left-fold
    * IEEE sequence DuckDB's `list_reduce` runs, so the doubles are
    * bit-equal with no cents detour.
    */
  private def ewma(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts", "event_id")
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[(Long, Double, Long)] {
          def hasNext: Boolean = buf.hasNext
          def next(): (Long, Double, Long) = {
            val (u, _, _, v0) = buf.next()
            var acc = v0
            var n = 1L
            while (buf.hasNext && buf.head._1 == u) {
              acc = (acc + buf.next()._4) / 2
              n += 1
            }
            (u, acc, n)
          }
        }
      }
      .toDF("user_id", "ewma", "n_events")
      .orderBy("user_id")
  }

  private val ewmaOracle = """SELECT user_id,
  CAST(list_reduce(list(CAST(value AS DOUBLE) ORDER BY ts, event_id),
    (a, b) -> (a + b) / CAST(2 AS DOUBLE)) AS DOUBLE) AS ewma,
  COUNT(*) AS n_events
FROM events GROUP BY user_id ORDER BY user_id"""

  /** Cohort revenue matrix: users cohorted by first-purchase ISO week,
    * revenue laid out by (cohort week × active week) — the standard
    * cohort-LTV triangle. Two shuffles: the per-user first-week agg
    * (one row per user — AQE broadcasts it back onto the purchase
    * stream while small, shuffle-joins at scale) and the final matrix
    * agg, whose cardinality is weeks², not users. Spark `weekofyear`
    * and DuckDB `week` are both ISO-8601, so the integer keys agree.
    */
  private def cohortRevenue(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.events(s, dir)
      .where(col("event_type") === "purchase")
      .select(col("user_id"),
        // ISO YEAR with the ISO week — calendar year would misfile the
        // year-straddling weeks (Dec 30 in ISO week 1 of the NEXT year)
        (expr("extract(YEAROFWEEK FROM ts)") * 100 + weekofyear(col("ts")))
          .cast("int").as("yw"),
        col("value"))
    val cohort = p.groupBy(col("user_id")).agg(min(col("yw")).as("cohort_yw"))
    p.join(cohort, "user_id")
      .groupBy(col("cohort_yw"), col("yw"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        (sum(cents(col("value"))) / 100.0).as("revenue"))
      .orderBy("cohort_yw", "yw")
  }

  private val cohortRevenueOracle = s"""WITH p AS (
  SELECT user_id, CAST(isoyear(ts) * 100 + week(ts) AS INT) AS yw, value
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, MIN(yw) AS cohort_yw FROM p GROUP BY 1
)
SELECT c.cohort_yw, p.yw, COUNT(DISTINCT p.user_id) AS n_users,
  ${Sql.sumCents("p.value")} AS revenue
FROM p JOIN c ON p.user_id = c.user_id
GROUP BY 1, 2 ORDER BY cohort_yw, yw"""

  /** Last-touch marketing attribution: each purchase credits the
    * user's most recent PRIOR non-purchase event type; purchases with
    * no prior touch are 'direct'. One window over the per-user
    * timeline (`last(..., ignoreNulls)` over an unbounded-preceding
    * frame — the carry-forward idiom, same engine shape as
    * `ev_interpolate`'s bracket fill), then a channel-cardinality
    * aggregate. One shuffle on user_id, one on channel.
    */
  private def attribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        unix_millis(col("ts")).as("_ms"))
      .withColumn("channel",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .groupBy(coalesce(col("channel"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        (sum(cents(col("value"))) / 100.0).as("revenue"))
      .orderBy("channel")
  }

  private val attributionOracle = s"""WITH e AS (
  SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ms FROM events
), a AS (
  SELECT event_type, value,
    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ms, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
  FROM e
)
SELECT COALESCE(channel, 'direct') AS channel, COUNT(*) AS n_purchases,
  ${Sql.sumCents("value")} AS revenue
FROM a WHERE event_type = 'purchase' GROUP BY 1 ORDER BY channel"""

  /** Event-time disorder metrics — the data-quality readout that decides
    * watermark horizons: per event type, the fraction of adjacent
    * events (in event_id = generation order, per user) whose timestamp
    * runs BACKWARDS, and the worst regression in ms. All integer ms
    * arithmetic; one per-user window, one tiny aggregate.
    */
  private def disorder(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("_ms"))
      .withColumn("prev_ms", lag(col("_ms"), 1).over(w))
      .where(col("prev_ms").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("_ms") < col("prev_ms"), 1L).otherwise(0L))
          .as("n_backwards"),
        max(when(col("_ms") < col("prev_ms"), col("prev_ms") - col("_ms"))
          .otherwise(0L)).as("max_regression_ms"))
      .select(col("event_type"), col("n_pairs"), col("n_backwards"),
        (col("n_backwards").cast("double") / col("n_pairs").cast("double"))
          .as("disorder_frac"),
        col("max_regression_ms"))
      .orderBy("event_type")
  }

  private val disorderOracle = """WITH e AS (
  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events
), g AS (
  SELECT event_type, ms,
    LAG(ms, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ms
  FROM e
)
SELECT event_type, COUNT(*) AS n_pairs,
  CAST(SUM(CASE WHEN ms < prev_ms THEN 1 ELSE 0 END) AS BIGINT) AS n_backwards,
  CAST(SUM(CASE WHEN ms < prev_ms THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS disorder_frac,
  CAST(MAX(CASE WHEN ms < prev_ms THEN prev_ms - ms ELSE 0 END) AS BIGINT)
    AS max_regression_ms
FROM g WHERE prev_ms IS NOT NULL
GROUP BY 1 ORDER BY event_type"""

  /** Linear multi-touch attribution — the fair-split companion to the
    * last-touch model: each purchase divides its value equally across
    * the DISTINCT touch types seen in its trailing hour (integer cents
    * floor-divided by the touch count, so the split is exact in both
    * engines). The purchase-to-touch match is an equi-join on user_id
    * with a bounded time-range predicate — the same join shape as the
    * stream-stream interval join, and AQE-skew-splittable at scale.
    */
  private def attributionLinear(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), unix_millis(col("ts")).as("ms"))
    val p = e.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id"),
        cents(col("value")).as("v_cents"), col("ms").as("p_ms"))
    val t = e.where(col("event_type") =!= "purchase")
      .select(col("user_id").as("t_user"), col("event_type").as("channel"),
        col("ms").as("t_ms"))
    val pt = p.join(t, col("p_user") === col("t_user") &&
        col("t_ms") < col("p_ms") && col("t_ms") >= col("p_ms") - 3600000L)
      .select(col("event_id"), col("v_cents"), col("channel"))
      .distinct()
    val nt = pt.groupBy(col("event_id")).agg(count(lit(1)).as("n_ch"))
    pt.join(nt, "event_id")
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        sum(expr("v_cents div n_ch")).as("credit_cents"))
      .orderBy("channel")
  }

  private val attributionLinearOracle = """WITH e AS (
  SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ms FROM events
), p AS (SELECT * FROM e WHERE event_type = 'purchase'),
t AS (SELECT user_id, event_type AS channel, ms FROM e WHERE event_type <> 'purchase'),
pt AS (
  SELECT DISTINCT p.event_id,
    CAST(FLOOR(p.value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS v_cents,
    t.channel
  FROM p JOIN t ON p.user_id = t.user_id
   AND t.ms < p.ms AND t.ms >= p.ms - 3600000
), nt AS (
  SELECT event_id, COUNT(*) AS n_ch FROM pt GROUP BY 1
)
SELECT channel, COUNT(*) AS n_touches,
  CAST(SUM(v_cents // n_ch) AS BIGINT) AS credit_cents
FROM pt JOIN nt USING (event_id)
GROUP BY 1 ORDER BY channel"""

  /** Holt double exponential smoothing (level + trend, α = β = 1/2) —
    * the forecasting-grade sequential fold next to [[ewma]]: same
    * secondary-sort engine shape (one user_id shuffle, one-pass
    * mapPartitions over contiguous runs, two running scalars of state),
    * twice the state. The halving steps keep the IEEE op sequence
    * identical to the oracle's recursive-CTE restatement, so the final
    * (level, trend) doubles are bit-equal.
    */
  private def holt(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts", "event_id")
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[(Long, Double, Double, Long)] {
          def hasNext: Boolean = buf.hasNext
          def next(): (Long, Double, Double, Long) = {
            val (u, _, _, v0) = buf.next()
            var level = v0
            var trend = 0.0
            var n = 1L
            while (buf.hasNext && buf.head._1 == u) {
              val x = buf.next()._4
              val nl = (x + (level + trend)) / 2
              trend = ((nl - level) + trend) / 2
              level = nl
              n += 1
            }
            (u, level, trend, n)
          }
        }
      }
      .toDF("user_id", "level", "trend", "n_events")
      .orderBy("user_id")
  }

  private[queries] val holtOracle = """WITH RECURSIVE e AS (
  SELECT user_id, CAST(value AS DOUBLE) AS x,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), h(user_id, rn, level, trend) AS (
  SELECT user_id, CAST(1 AS BIGINT), x, CAST(0 AS DOUBLE) FROM e WHERE rn = 1
  UNION ALL
  SELECT e.user_id, h.rn + 1,
    (e.x + (h.level + h.trend)) / CAST(2 AS DOUBLE),
    (((e.x + (h.level + h.trend)) / CAST(2 AS DOUBLE) - h.level) + h.trend)
      / CAST(2 AS DOUBLE)
  FROM h JOIN e ON e.user_id = h.user_id AND e.rn = h.rn + 1
)
SELECT user_id, level, trend, rn AS n_events FROM h
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn DESC) = 1
ORDER BY user_id"""

  /** Kaplan-Meier survival over session lifetimes (minutes): risk sets
    * and death counts are exact integers per duration tick; the
    * survival prefix-product Π(1 − dₜ/nₜ) folds LEFT over the
    * tick-ordered factor array (ticks-cardinality, collected after
    * aggregation — bounded by the max session length, never by data).
    * The fold is the same IEEE sequence in both engines (a leading
    * ×1.0 is exact), so the curve matches bitwise. All sessions in the
    * bounded replay are fully observed — the uncensored special case;
    * censoring enters as a second per-tick count without changing the
    * fold.
    */
  /** MATCH_RECOGNIZE-style sequence-pattern detection: per 30-min-gap
    * session, the ordered event-initial string (v=view, c=click,
    * p=purchase, s=signup, e=error — initials are distinct by
    * construction of this schema) is matched against the funnel
    * pattern `v.*v.*p` (two views then a purchase, in order, gaps
    * allowed) — the PATTERN (V ... V ... P) clause of SQL:2016 row
    * pattern matching, built from the same lag/running-sum
    * sessionization core as `ev_sessionize`. The per-session string is
    * the one bounded materialization (sessions are gap-bounded; the
    * slice cap of 200 events pins the worst case), sorted
    * deterministically by (ms, event_id) inside the aggregate, so the
    * regex input is bit-identical in both engines.
    */
  private def patternMatch(s: SparkSession, dir: String): DataFrame = {
    withSessionIds(Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("_ms"),
        substring(col("event_type"), 1, 1).as("ini")))
      .groupBy(col("user_id"), col("sid"))
      .agg(expr("concat_ws('', transform(slice(array_sort(collect_list(struct(_ms, event_id, ini))), 1, 200), x -> x.ini))")
        .as("seq"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("seq").rlike("v.*v.*p"), 1L).otherwise(0L))
          .as("n_funnel_sessions"),
        max(length(col("seq"))).cast("long").as("max_len"))
      .orderBy("user_id")
  }

  private val patternMatchOracle = """WITH e AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms,
    substring(event_type, 1, 1) AS ini
  FROM events
), g AS (
  SELECT *, CASE WHEN LAG(ms, 1) OVER w IS NULL
      OR ms - LAG(ms, 1) OVER w > 1800000 THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)
), sid AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM g
), seqs AS (
  SELECT user_id, sid,
    array_to_string(list_slice(list(ini ORDER BY ms, event_id), 1, 200), '') AS seq
  FROM sid GROUP BY 1, 2
)
SELECT user_id, COUNT(*) AS n_sessions,
  CAST(SUM(CASE WHEN regexp_matches(seq, 'v.*v.*p') THEN 1 ELSE 0 END) AS BIGINT)
    AS n_funnel_sessions,
  CAST(MAX(length(seq)) AS BIGINT) AS max_len
FROM seqs GROUP BY 1 ORDER BY user_id"""

  /** Per-session spans from the 30-minute-gap sessionization — the ONE
    * (user_id, sid) → (start_ms, end_ms) derivation shared by the
    * survival and concurrency queries (the same lag/running-sum core as
    * `ev_sessionize`; a gap-constant change belongs here, not in each
    * consumer).
    */
  private def sessionSpans(s: SparkSession, dir: String): DataFrame =
    withSessionIds(Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("_ms")))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("_ms")).as("start_ms"), max(col("_ms")).as("end_ms"))

  private def survival(s: SparkSession, dir: String): DataFrame = {
    val sess = sessionSpans(s, dir)
      .select(col("user_id"), col("sid"),
        expr("(end_ms - start_ms) div 60000").as("t"))
    val deaths = sess.groupBy(col("t")).agg(count(lit(1)).as("n_deaths"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val km = deaths
      .withColumn("n_risk", sum(col("n_deaths")).over(wDesc))
      .withColumn("f", lit(1.0) -
        col("n_deaths").cast("double") / col("n_risk").cast("double"))
    val arr = km.agg(sort_array(collect_list(struct(col("t"), col("f"))))
      .as("a"))
    km.crossJoin(arr)
      .select(col("t"), col("n_risk"), col("n_deaths"),
        expr("aggregate(filter(a, y -> y.t <= t), CAST(1.0 AS DOUBLE), " +
          "(acc, y) -> acc * y.f)").as("survival"))
      .orderBy("t")
  }

  private val survivalOracle = """WITH e AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events
), l AS (
  SELECT user_id, ms, event_id,
    CASE WHEN LAG(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) IS NULL
      OR ms - LAG(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) > 1800000
      THEN 1 ELSE 0 END AS is_new
  FROM e
), s AS (
  SELECT user_id, ms,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
      ROWS UNBOUNDED PRECEDING) AS sid
  FROM l
), sess AS (
  SELECT user_id, sid, (MAX(ms) - MIN(ms)) // 60000 AS t FROM s GROUP BY 1, 2
), deaths AS (
  SELECT t, COUNT(*) AS n_deaths FROM sess GROUP BY t
), km AS (
  SELECT t, n_deaths,
    CAST(SUM(n_deaths) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS BIGINT)
      AS n_risk
  FROM deaths
), f AS (
  SELECT t, n_risk, n_deaths,
    CAST(1 AS DOUBLE) - CAST(n_deaths AS DOUBLE) / CAST(n_risk AS DOUBLE) AS f
  FROM km
), arr AS (
  SELECT list(struct_pack(t := t, f := f) ORDER BY t) AS a FROM f
)
SELECT f.t, f.n_risk, f.n_deaths,
  list_reduce(list_transform(list_filter(arr.a, y -> y.t <= f.t), y -> y.f),
    (p, q) -> p * q) AS survival
FROM f, arr ORDER BY f.t"""

  /** Peak concurrency (max simultaneous open sessions) by sweep-line:
    * every session contributes (+1 at start, −1 at end+1ms) boundary
    * events; the running sum over the time-ordered boundaries is the
    * live concurrency and its max is the capacity-planning number. The
    * GLOBAL running sum — the textbook one-task window — runs through
    * [[graft.operators.Ids.prefixSumByKey]] on a constant key instead:
    * the distributed scan's driver state is per-partition offsets, so
    * the sweep parallelizes over range partitions at any session count.
    * Ends sort before starts at the same ms (delta asc), so
    * back-to-back sessions never double-count.
    */
  private def peakConcurrency(s: SparkSession, dir: String): DataFrame = {
    // sess feeds THREE consumers (both boundary-union branches + the
    // n_sessions agg) — checkpoint once so the events scan + session
    // window run once, not three times; LAZY, because prefixSumByKey's
    // internal pass is the first action and materializes it (r10: the
    // eager variant paid one extra job per run)
    val sess = graft.operators.Checkpoints.round(sessionSpans(s, dir),
      eager = false)
    val bounds = sess.select(col("user_id"), col("sid"),
        col("start_ms").as("ms"), lit(1L).as("delta"))
      .unionByName(sess.select(col("user_id"), col("sid"),
        (col("end_ms") + 1L).as("ms"), lit(-1L).as("delta")))
      .withColumn("one", lit(1))
    val swept = graft.operators.Ids.prefixSumByKey(
      bounds, "one", Seq("ms", "delta", "user_id", "sid"), "delta", 32, "live")
    swept.agg(max(col("live")).as("peak"))
      .crossJoin(sess.agg(count(lit(1)).as("n_sessions")))
      .join(swept.groupBy(col("live").as("peak2"))
          .agg(min(col("ms")).as("first_peak_ms")),
        col("peak") === col("peak2"))
      .select(col("peak"), col("first_peak_ms"), col("n_sessions"))
  }

  private val peakConcurrencyOracle = """WITH e AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events
), l AS (
  SELECT user_id, ms, event_id,
    CASE WHEN LAG(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) IS NULL
      OR ms - LAG(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) > 1800000
      THEN 1 ELSE 0 END AS is_new
  FROM e
), s AS (
  SELECT user_id, ms,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
      ROWS UNBOUNDED PRECEDING) AS sid
  FROM l
), sess AS (
  SELECT user_id, sid, MIN(ms) AS start_ms, MAX(ms) AS end_ms
  FROM s GROUP BY 1, 2
), bounds AS (
  SELECT user_id, sid, start_ms AS ms, CAST(1 AS BIGINT) AS delta FROM sess
  UNION ALL
  SELECT user_id, sid, end_ms + 1, CAST(-1 AS BIGINT) FROM sess
), swept AS (
  SELECT ms, SUM(delta) OVER (ORDER BY ms, delta, user_id, sid
    ROWS UNBOUNDED PRECEDING) AS live
  FROM bounds
)
SELECT (SELECT CAST(MAX(live) AS BIGINT) FROM swept) AS peak,
  (SELECT CAST(MIN(ms) AS BIGINT) FROM swept
   WHERE live = (SELECT MAX(live) FROM swept)) AS first_peak_ms,
  (SELECT COUNT(*) FROM sess) AS n_sessions"""

  /** One-sided CUSUM change detection over the hourly event-rate
    * series: Sₜ = max(0, Sₜ₋₁ + (xₜ − μ)) accumulates sustained
    * above-mean rate — the classic drift detector whose alarm
    * threshold a monitor would tune. The series is hours-cardinality
    * (post-aggregate), so the per-hour prefix folds run over a bounded
    * array; the fold is seeded with an explicit 0.0 so the IEEE
    * sequence (greatest(0, acc + dev)) is identical in both engines.
    */
  private def cusum(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("h"))
      .agg(count(lit(1)).as("n"))
    val tot = hourly.agg(sum(col("n")).as("sn"), count(lit(1)).as("nh"))
    val dev = hourly.crossJoin(tot)
      .select(col("h"), col("n"),
        (col("n").cast("double") - col("sn").cast("double") / col("nh").cast("double"))
          .as("dev"))
    val arr = dev.agg(sort_array(collect_list(struct(col("h"), col("dev"))))
      .as("a"))
    dev.crossJoin(arr)
      .select(col("h").as("hour_epoch"), col("n").as("n_events"),
        expr("aggregate(transform(filter(a, y -> y.h <= h), y -> y.dev), " +
          "CAST(0.0 AS DOUBLE), (acc, x) -> greatest(CAST(0.0 AS DOUBLE), acc + x))")
          .as("cusum"))
      .orderBy("hour_epoch")
  }

  private val cusumOracle = """WITH hourly AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h, COUNT(*) AS n
  FROM events GROUP BY 1
), t AS (
  SELECT CAST(SUM(n) AS BIGINT) AS sn, COUNT(*) AS nh FROM hourly
), dev AS (
  SELECT h, n,
    CAST(n AS DOUBLE) - CAST(sn AS DOUBLE) / CAST(nh AS DOUBLE) AS dev
  FROM hourly, t
), arr AS (
  SELECT list(struct_pack(h := h, dev := dev) ORDER BY h) AS a FROM dev
)
SELECT dev.h AS hour_epoch, dev.n AS n_events,
  list_reduce(
    list_prepend(CAST(0 AS DOUBLE),
      list_transform(list_filter(arr.a, y -> y.h <= dev.h), y -> y.dev)),
    (p, q) -> greatest(CAST(0 AS DOUBLE), p + q)) AS cusum
FROM dev, arr ORDER BY hour_epoch"""

  /** Forecast backtest: the hour-of-day seasonal-naive predictor
    * (per-hour mean over the 7-day train window) evaluated on the
    * remaining days — MAE and MASE (scaled by the in-sample naive-1
    * MAE), the standard baseline every forecasting pipeline must beat.
    * Exactness trick: the train window is exactly 7 days, so pred =
    * S_h/7 with a CONSTANT denominator and |7·n − S_h| is an exact
    * integer — both error sums are integer totals with ONE double
    * division each, immune to float summation order.
    */
  private def forecastBacktest(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("h"))
      .agg(count(lit(1)).as("n"))
      .select(col("h"), col("n"),
        expr("h div 86400 - 19723").as("day"),
        expr("(h div 3600) % 24").as("hod"))
    val train = hourly.where(col("day") < 7)
    val test = hourly.where(col("day") >= 7)
    val model = train.groupBy(col("hod")).agg(sum(col("n")).as("s_h"))
    val testErr = test.join(model, "hod")
      .agg(count(lit(1)).as("n_test"),
        sum(abs(lit(7L) * col("n") - col("s_h"))).as("err7"))
    val wNaive = Window.orderBy(col("h"))
    val naive = train
      .withColumn("prev", lag(col("n"), 1).over(wNaive))
      .where(col("prev").isNotNull)
      .agg(count(lit(1)).as("n_tr"), sum(abs(col("n") - col("prev"))).as("errn"))
    testErr.crossJoin(naive)
      .select(col("n_test"),
        (col("err7").cast("double") / (lit(7L) * col("n_test")).cast("double"))
          .as("mae"),
        (col("errn").cast("double") / col("n_tr").cast("double"))
          .as("naive_mae"),
        ((col("err7").cast("double") / (lit(7L) * col("n_test")).cast("double"))
          / (col("errn").cast("double") / col("n_tr").cast("double")))
          .as("mase"))
  }

  private val forecastBacktestOracle = """WITH hourly AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h, COUNT(*) AS n
  FROM events GROUP BY 1
), d AS (
  SELECT h, n, h // 86400 - 19723 AS day, (h // 3600) % 24 AS hod FROM hourly
), model AS (
  SELECT hod, CAST(SUM(n) AS BIGINT) AS s_h FROM d WHERE day < 7 GROUP BY 1
), te AS (
  SELECT COUNT(*) AS n_test, CAST(SUM(abs(7 * n - s_h)) AS BIGINT) AS err7
  FROM d JOIN model USING (hod) WHERE day >= 7
), tr AS (
  SELECT COUNT(*) AS n_tr, CAST(SUM(abs(n - prev)) AS BIGINT) AS errn
  FROM (SELECT n, LAG(n) OVER (ORDER BY h) AS prev FROM d WHERE day < 7)
  WHERE prev IS NOT NULL
)
SELECT n_test,
  CAST(err7 AS DOUBLE) / CAST(7 * n_test AS DOUBLE) AS mae,
  CAST(errn AS DOUBLE) / CAST(n_tr AS DOUBLE) AS naive_mae,
  (CAST(err7 AS DOUBLE) / CAST(7 * n_test AS DOUBLE))
    / (CAST(errn AS DOUBLE) / CAST(n_tr AS DOUBLE)) AS mase
FROM te, tr"""

  /** Supervised-label generation: for every event, the time until the
    * SAME user's next purchase (the propensity/time-to-event label a
    * training pipeline joins onto features) — a forward-looking
    * `min(conditional future ms)` window per user, then per-type label
    * statistics: labeled fraction (events with a future purchase) and
    * exact mean gap (integer ms sum / count, one division). The label
    * window and the feature timeline share one user_id exchange.
    */
  private def labelNextPurchase(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("_ms"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("_ms"))
      .withColumn("next_p_ms",
        min(when(col("event_type") === "purchase", col("_ms"))).over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("next_p_ms").isNotNull, 1L).otherwise(0L)).as("n_labeled"),
        sum(when(col("next_p_ms").isNotNull, col("next_p_ms") - col("_ms"))
          .otherwise(0L)).as("gap_sum_ms"))
      .select(col("event_type"), col("n_events"), col("n_labeled"),
        (col("n_labeled").cast("double") / col("n_events").cast("double"))
          .as("labeled_frac"),
        (col("gap_sum_ms").cast("double") / col("n_labeled").cast("double"))
          .as("mean_gap_ms"))
      .orderBy("event_type")
  }

  private val labelNextPurchaseOracle = """WITH e AS (
  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events
), l AS (
  SELECT event_type, ms,
    MIN(CASE WHEN event_type = 'purchase' THEN ms END)
      OVER (PARTITION BY user_id ORDER BY ms, event_id
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_p_ms
  FROM e
)
SELECT event_type, COUNT(*) AS n_events,
  CAST(SUM(CASE WHEN next_p_ms IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_labeled,
  CAST(SUM(CASE WHEN next_p_ms IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS labeled_frac,
  CAST(SUM(CASE WHEN next_p_ms IS NOT NULL THEN next_p_ms - ms ELSE 0 END) AS DOUBLE)
    / CAST(SUM(CASE WHEN next_p_ms IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
    AS mean_gap_ms
FROM l GROUP BY 1 ORDER BY event_type"""

  // --- classical seasonal decomposition (trend / seasonal / residual) -
  /** Additive decomposition of the hourly event-count series:
    * trend = centered 25-hour moving mean (full windows only),
    * seasonal = per-hour-of-day mean of the detrended series,
    * residual = detrended − seasonal. Output is the 24-row seasonal
    * profile with the mean |residual| per slot — the daily-rhythm
    * readout a capacity planner or anomaly detector consumes.
    *
    * Exactness: counts are integers; trend is (25h-sum · 1e6) div 25
    * (nonnegative, so truncation == floor in both engines); the SIGNED
    * means (seasonal, residual) use FLOOR(double division) — sums stay
    * < 2^53, so the one double op is bit-identical cross-engine, and
    * floor (not truncate) keeps negative means consistent.
    *
    * Scale: the series is built on an hour SPINE (gaps filled with 0 —
    * a moving average over a gappy series silently shrinks its window),
    * and its length grows with the TIME SPAN, not the corpus — the
    * global-window trend scan over ~720 rows/month is constant work at
    * any SF (the per-entity rolling ops are where the chunked-window
    * machinery applies; see ev_rolling_1h_chunked).
    */
  private def seasonalDecomp(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(s, dir)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("h"))
      .agg(count(lit(1)).as("y"))
    val spine = counts.agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"), lit(3600L))).as("h"))
    val series = spine.join(counts, Seq("h"), "left")
      .na.fill(0L, Seq("y"))
    val w = Window.orderBy(col("h")).rowsBetween(-12, 12)
    val detr = series
      .withColumn("s25", sum(col("y")).over(w))
      .withColumn("c25", count(lit(1)).over(w))
      .where(col("c25") === 25)
      .select(col("h"), col("y"),
        expr("(s25 * 1000000L) div 25").as("trend_micro"))
      .withColumn("detr_micro", col("y") * 1000000L - col("trend_micro"))
      .withColumn("hod", expr("(h % 86400) div 3600"))
    val seasonal = detr.groupBy(col("hod"))
      .agg(count(lit(1)).as("n_obs"), sum(col("detr_micro")).as("sd"))
      .select(col("hod"), col("n_obs"),
        floor(col("sd").cast("double") / col("n_obs").cast("double"))
          .cast("long").as("seasonal_micro"))
    detr.join(seasonal, Seq("hod"))
      .withColumn("resid", col("detr_micro") - col("seasonal_micro"))
      .groupBy(col("hod").as("hour_of_day"))
      .agg(max(col("n_obs")).as("n_obs"),
        max(col("seasonal_micro")).as("seasonal_micro"),
        floor(sum(abs(col("resid"))).cast("double") /
          count(lit(1)).cast("double")).cast("long").as("mean_abs_resid_micro"))
      .orderBy("hour_of_day")
  }

  private val seasonalDecompOracle: String = """WITH counts AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h, COUNT(*) AS y
  FROM events GROUP BY 1
), spine AS (
  SELECT unnest(generate_series((SELECT MIN(h) FROM counts),
    (SELECT MAX(h) FROM counts), 3600)) AS h
), series AS (
  SELECT s.h, COALESCE(c.y, 0) AS y FROM spine s LEFT JOIN counts c USING (h)
), detr AS (
  SELECT h, y,
    (SUM(y) OVER w * 1000000) // 25 AS trend_micro,
    y * 1000000 - (SUM(y) OVER w * 1000000) // 25 AS detr_micro,
    (h % 86400) // 3600 AS hod
  FROM series
  WINDOW w AS (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
  QUALIFY COUNT(*) OVER w = 25
), seasonal AS (
  SELECT hod, COUNT(*) AS n_obs,
    CAST(FLOOR(CAST(SUM(detr_micro) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
      AS BIGINT) AS seasonal_micro
  FROM detr GROUP BY 1
)
SELECT CAST(d.hod AS BIGINT) AS hour_of_day,
  CAST(MAX(s.n_obs) AS BIGINT) AS n_obs,
  MAX(s.seasonal_micro) AS seasonal_micro,
  CAST(FLOOR(CAST(SUM(ABS(d.detr_micro - s.seasonal_micro)) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS mean_abs_resid_micro
FROM detr d JOIN seasonal s USING (hod)
GROUP BY d.hod ORDER BY hour_of_day"""

  // --- changepoint location (one round of binary segmentation) --------
  /** Locate the single best changepoint in the daily purchase-revenue
    * series: the split t maximizing the between-segment SSE reduction
    * Δ(t) = S_t²/t + (S_n−S_t)²/(n−t) − S_n²/n — one round of binary
    * segmentation, the workhorse behind PELT-style detectors (ev_cusum
    * DETECTS drift; this LOCATES the break). Prefix sums come from a
    * window over the days-cardinality series (time-bounded, not
    * data-bounded — same scale argument as ev_seasonal_decomp); Δ is a
    * fixed double tree over exact integer cents (S² at revenue scale
    * wraps int64, so the quadratic lives in double); the argmax is
    * total-ordered by (Δ DESC, day).
    */
  private def changepoint(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .where(col("event_type") === "purchase")
      .groupBy(unix_timestamp(date_trunc("day", col("ts"))).as("day"))
      .agg(sum(cents(col("value"))).as("y"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily
      .withColumn("st", sum(col("y")).over(w))
      .withColumn("t", count(lit(1)).over(w))
    val tot = daily.agg(sum(col("y")).as("sn"), count(lit(1)).as("n"))
    def d(c: Column) = c.cast("double")
    cum.crossJoin(tot)
      .where(col("t") < col("n"))
      .select(col("day").as("split_epoch"), col("n").as("n_days"),
        expr("st div t").as("mean_before"),
        expr("(sn - st) div (n - t)").as("mean_after"),
        (d(col("st")) * d(col("st")) / d(col("t"))
          + d(col("sn") - col("st")) * d(col("sn") - col("st"))
            / d(col("n") - col("t"))
          - d(col("sn")) * d(col("sn")) / d(col("n"))).as("delta"))
      .orderBy(col("delta").desc, col("split_epoch"))
      .limit(1)
  }

  private val changepointOracle: String = """WITH daily AS (
  SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day,
    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), cum AS (
  SELECT day, y,
    CAST(SUM(y) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS st,
    CAST(COUNT(*) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS t
  FROM daily
), tot AS (
  SELECT CAST(SUM(y) AS BIGINT) AS sn, COUNT(*) AS n FROM daily
)
SELECT day AS split_epoch, n AS n_days,
  st // t AS mean_before,
  (sn - st) // (n - t) AS mean_after,
  CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(t AS DOUBLE)
    + CAST(sn - st AS DOUBLE) * CAST(sn - st AS DOUBLE)
      / CAST(n - t AS DOUBLE)
    - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE) / CAST(n AS DOUBLE) AS delta
FROM cum, tot
WHERE t < n
ORDER BY delta DESC, split_epoch LIMIT 1"""

  // --- Theil–Sen robust trend ----------------------------------------
  /** Theil–Sen estimator over the daily purchase-revenue series: the
    * median of all pairwise slopes (y_j−y_i)/(x_j−x_i) — the robust
    * trend line one outlier day cannot hijack (OLS counterpart:
    * q_ols_trend). The pair set is days², but days grow with the TIME
    * SPAN, not the corpus (30 days → 435 pairs at any SF); each slope
    * is ONE double division of exact integers, and the median picks
    * the middle element under the total order (slope, i, j) — both
    * engines sort identical doubles. Output: slope, the median-of-
    * intercepts line, and the pair count.
    */
  private def theilSen(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .where(col("event_type") === "purchase")
      .groupBy(unix_timestamp(date_trunc("day", col("ts"))).as("x"))
      .agg(sum(cents(col("value"))).as("y"))
    val a = daily.select(col("x").as("xi"), col("y").as("yi"))
    val b = daily.select(col("x").as("xj"), col("y").as("yj"))
    val slopes = a.join(b, col("xi") < col("xj"))
      .select(col("xi"), col("xj"),
        ((col("yj") - col("yi")).cast("double") /
          (col("xj") - col("xi")).cast("double")).as("m"))
    val wm = Window.orderBy(col("m"), col("xi"), col("xj"))
    val slope = slopes
      .withColumn("rk", row_number().over(wm))
      .crossJoin(slopes.agg(count(lit(1)).as("np")))
      .where(col("rk") === expr("(np + 1) div 2"))
      .select(col("m").as("slope"), col("np").as("n_pairs"))
    val wi = Window.orderBy(col("ic"), col("x"))
    val intercept = daily.crossJoin(slope)
      .select(col("x"), (col("y").cast("double") -
        col("slope") * col("x").cast("double")).as("ic"), col("slope"),
        col("n_pairs"))
      .withColumn("rk", row_number().over(wi))
      .crossJoin(daily.agg(count(lit(1)).as("nd")))
      .where(col("rk") === expr("(nd + 1) div 2"))
    intercept.select(col("n_pairs"), col("nd").as("n_days"),
      col("slope"), col("ic").as("intercept"))
  }

  private val theilSenOracle: String = """WITH daily AS (
  SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS x,
    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), slopes AS (
  SELECT a.x AS xi, b.x AS xj,
    CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS m
  FROM daily a JOIN daily b ON a.x < b.x
), med AS (
  SELECT m AS slope, (SELECT COUNT(*) FROM slopes) AS n_pairs
  FROM slopes
  QUALIFY ROW_NUMBER() OVER (ORDER BY m, xi, xj)
    = ((SELECT COUNT(*) FROM slopes) + 1) // 2
), ic AS (
  SELECT CAST(d.y AS DOUBLE) - med.slope * CAST(d.x AS DOUBLE) AS ic,
    med.slope, med.n_pairs, d.x
  FROM daily d, med
)
SELECT n_pairs, (SELECT COUNT(*) FROM daily) AS n_days, slope,
  ic AS intercept
FROM ic
QUALIFY ROW_NUMBER() OVER (ORDER BY ic, x)
  = ((SELECT COUNT(*) FROM daily) + 1) // 2"""

  // --- clamped running balance (Lindley recursion, closed form) -------
  /** Per-user running balance with a zero floor — purchases credit,
    * clicks debit, and the balance cannot go negative (the Lindley
    * recursion B_t = max(0, B_{t−1} + d_t), which is a SEQUENTIAL fold
    * on its face). Computed in closed form via Skorokhod reflection:
    * B_t = S_t − min(0, min_{k≤t} S_k) over the plain prefix sum S —
    * two per-user window passes, fully parallel across users, no UDF
    * fold and no mapGroups. Output: the 20 largest final balances with
    * each user's running peak.
    */
  private def clampedRunning(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .where(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "purchase", cents(col("value")))
          .otherwise(-cents(col("value"))).as("d"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bal = ev
      .withColumn("s", sum(col("d")).over(w))
      .withColumn("b", col("s") - least(lit(0L), min(col("s")).over(w)))
    bal.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_moves"),
        max(struct(col("ts"), col("event_id"), col("b"))).as("last"),
        max(col("b")).as("peak_cents"))
      .select(col("user_id"), col("n_moves"),
        col("last.b").as("final_cents"), col("peak_cents"))
      .orderBy(col("final_cents").desc, col("user_id"))
      .limit(20)
  }

  private[queries] val clampedRunningOracle: String = """WITH d AS (
  SELECT user_id, ts, event_id,
    CASE WHEN event_type = 'purchase'
      THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
      ELSE -CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END AS d
  FROM events WHERE event_type IN ('purchase', 'click')
), s1 AS (
  SELECT user_id, ts, event_id,
    CAST(SUM(d) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s
  FROM d
), s2 AS (
  SELECT user_id, ts, event_id,
    s - LEAST(0, MIN(s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS b
  FROM s1
), agg AS (
  SELECT user_id, COUNT(*) AS n_moves, CAST(MAX(b) AS BIGINT) AS peak_cents
  FROM s2 GROUP BY 1
), lastb AS (
  SELECT user_id, CAST(b AS BIGINT) AS final_cents FROM s2
  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
    ORDER BY ts DESC, event_id DESC) = 1
)
SELECT a.user_id, a.n_moves, l.final_cents, a.peak_cents
FROM agg a JOIN lastb l USING (user_id)
ORDER BY final_cents DESC, user_id LIMIT 20"""

  // --- Shapley-value attribution --------------------------------------
  /** EXACT Shapley-value conversion attribution over the 4 non-purchase
    * channels (click/view/signup/error): per user-day, the touched
    * channel set is a 4-bit mask and conversion = a purchase that day;
    * the characteristic function v(S) = # converting user-days whose
    * touchset ⊆ S collapses to 16 coalition counts, and each channel's
    * Shapley value φ_c = Σ_{S∌c} w(|S|)·(v(S∪c)−v(S)) / 4! is computed
    * EXACTLY in integer 1/24ths (w(k)=k!(3−k)! ∈ {6,2,2,6}) — no
    * sampling, no float weights. The data pass is one groupBy to masks
    * (corpus-scale) + one groupBy to 16 coalition counts; the lattice
    * algebra is a 16×16 subset join over literally 16 rows (the
    * bounded nested loop is the POINT — the exponential object stays
    * constant-size because channels, not rows, drive it). Beside the
    * heuristic rules (`ev_attribution` last-touch, `_linear`), this is
    * the game-theoretically fair split. Σφ = v(full) − v(∅) by
    * efficiency — v(∅) = purchase-only days, visible in the output.
    */
  private val ShapleyChannels =
    Seq(("click", 1), ("error", 2), ("signup", 4), ("view", 8))

  private def shapleyAttrib(s: SparkSession, dir: String): DataFrame = {
    val bitExpr = ShapleyChannels
      .map { case (c, b) => s"WHEN '$c' THEN $b" }
      .mkString("CASE event_type ", " ", " ELSE 0 END")
    val daily = Tables.events(s, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
        expr(bitExpr).as("bit"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("p"))
      .groupBy(col("user_id"), col("day"))
      .agg(expr("bit_or(bit)").as("m"), max(col("p")).as("conv"))
    val masks = daily.where(col("conv") === 1)
      .groupBy(col("m")).agg(count(lit(1)).as("cnt"))
    val coalitions = s.range(16).select(col("id").cast("int").as("cs"))
    // v(S): subset containment as a bit test over 16×16 rows — the
    // nested loop is bounded by the coalition lattice, not the data
    val v = coalitions.join(masks, expr("(m & (15 ^ cs)) = 0"), "left")
      .groupBy(col("cs")).agg(coalesce(sum(col("cnt")), lit(0L)).as("v"))
    val channels = {
      import s.implicits._
      ShapleyChannels.toDF("channel", "bit")
    }
    channels
      .join(v.select(col("cs"), col("v").as("v_s")),
        expr("(cs & bit) = 0"))
      .join(v.select(col("cs").as("csc"), col("v").as("v_sc")),
        expr("csc = (cs | bit)"))
      .groupBy(col("channel"))
      .agg(sum(expr(
        "CASE bit_count(cs) WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END"
          ) * (col("v_sc") - col("v_s"))).as("phi_x24"))
      .select(col("channel"), col("phi_x24"),
        (col("phi_x24").cast("double") / 24.0).as("phi"))
      .orderBy("channel")
  }

  private val shapleyAttribOracle: String = {
    val bitCase = ShapleyChannels
      .map { case (c, b) => s"WHEN '$c' THEN $b" }
      .mkString("CASE event_type ", " ", " ELSE 0 END")
    val chanValues = ShapleyChannels
      .map { case (c, b) => s"('$c', $b)" }.mkString(", ")
    s"""WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
    BIT_OR($bitCase) AS m,
    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1, 2
), masks AS (
  SELECT m, COUNT(*) AS cnt FROM daily WHERE conv = 1 GROUP BY 1
), coalitions AS (
  SELECT unnest(generate_series(0, 15)) AS cs
), v AS (
  SELECT cs, CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS v
  FROM coalitions LEFT JOIN masks ON (m & xor(15, cs)) = 0
  GROUP BY cs
), channels(channel, bit) AS (VALUES $chanValues)
SELECT c.channel,
  CAST(SUM((CASE bit_count(s.cs) WHEN 0 THEN 6 WHEN 1 THEN 2
            WHEN 2 THEN 2 ELSE 6 END) * (sc.v - s_v.v)) AS BIGINT)
    AS phi_x24,
  CAST(SUM((CASE bit_count(s.cs) WHEN 0 THEN 6 WHEN 1 THEN 2
            WHEN 2 THEN 2 ELSE 6 END) * (sc.v - s_v.v)) AS DOUBLE)
    / ${D("24")} AS phi
FROM channels c
JOIN coalitions s ON (s.cs & c.bit) = 0
JOIN v s_v ON s_v.cs = s.cs
JOIN v sc ON sc.cs = (s.cs | c.bit)
GROUP BY c.channel ORDER BY c.channel"""
  }

  /** Goh-Barabási burstiness B = (σ−μ)/(σ+μ) of each user's
    * inter-event gaps — the temporal-dynamics readout that separates
    * bursty human activity (B → 1) from Poisson (B ≈ 0) and periodic
    * (B → −1) processes. Gaps are exact integer SECONDS (ms diffs div
    * 1000 — cents-style: seconds² sums stay within int64 where ms²
    * would not); per-user σ/μ come from the (n, Σdt, Σdt²) moment
    * triple, so B is one fixed double tree per user. The corpus
    * readout is the B histogram (10 bins over [−1, 1]) with per-bin
    * min/max — count/min/max only, never a SUM of doubles, so no
    * accumulation-order caveat.
    */
  private def burstiness(s: SparkSession, dir: String): DataFrame = {
    val gaps = Tables.events(s, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"), col("event_id"))
      .withColumn("dt", expr("(ms - lag(ms) over " +
        "(partition by user_id order by ms, event_id)) div 1000"))
      .where(col("dt").isNotNull)
    val per = gaps.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("dt")).as("s1"),
        sum(col("dt") * col("dt")).as("s2"))
      .where(col("n") >= 3 && col("s1") > 0)
      .select(col("user_id"),
        ((sqrt((col("s2").cast("double") - col("s1").cast("double") *
          col("s1").cast("double") / col("n").cast("double")) /
          col("n").cast("double")) -
          col("s1").cast("double") / col("n").cast("double")) /
         (sqrt((col("s2").cast("double") - col("s1").cast("double") *
          col("s1").cast("double") / col("n").cast("double")) /
          col("n").cast("double")) +
          col("s1").cast("double") / col("n").cast("double"))).as("b"))
    per.select(least(lit(9L),
        greatest(lit(0L), floor((col("b") + 1) * 5).cast("long"))).as("bin"),
        col("b"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_users"), min(col("b")).as("min_b"),
        max(col("b")).as("max_b"))
      .orderBy("bin")
  }

  /** Autocorrelation function of the hourly event-count series at lags
    * 1..6 — the seasonality/persistence readout behind every traffic
    * forecast (a 24h-periodic series shows the ACF ringing; white
    * noise decays immediately). The series is ZERO-FILLED over the full
    * [min, max] hour spine (a gap hour is a real 0 observation, not a
    * missing row — skipping it would silently splice non-adjacent
    * hours together). Each lag-k pair set comes from an equi-join of
    * the spine with itself shifted by k (no global window; the spine is
    * time-range-bounded, and the join distributes at any scale). All
    * five moment sums (Σx, Σy, Σx², Σy², Σxy) are exact int64 over
    * integer counts, so Pearson r per lag is one fixed double tree —
    * bit-identical in any engine.
    */
  private def acf(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.events(s, dir)
      .select(expr("unix_millis(ts) div 3600000").as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("x"))
    val spine = c.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("h"))
    val sx = spine.join(c, Seq("h"), "left")
      .select(col("h"), coalesce(col("x"), lit(0L)).as("x"))
    val lags = s.range(1, 7).select(col("id").as("lag"))
    val shifted = sx.select(col("h").as("hb"), col("x").as("y"))
    val pairs = sx.crossJoin(broadcast(lags))
      .join(shifted, col("hb") === col("h") + col("lag"))
    val m = pairs.groupBy(col("lag")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("s_x"), sum(col("y")).as("s_y"),
      sum(col("x") * col("x")).as("s_xx"),
      sum(col("y") * col("y")).as("s_yy"),
      sum(col("x") * col("y")).as("s_xy"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    m.select(col("lag"), col("n"),
        (d(col("n") * col("s_xy") - col("s_x") * col("s_y")) /
          (sqrt(d(col("n") * col("s_xx") - col("s_x") * col("s_x"))) *
           sqrt(d(col("n") * col("s_yy") - col("s_y") * col("s_y")))))
          .as("r"))
      .orderBy("lag")
  }

  private val acfOracle: String = """WITH c AS (
  SELECT epoch_ms(ts) // 3600000 AS h, COUNT(*) AS x FROM events GROUP BY 1
), bounds AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM c),
spine AS (SELECT unnest(generate_series(lo, hi)) AS h FROM bounds),
sx AS (
  SELECT spine.h, CAST(COALESCE(c.x, 0) AS BIGINT) AS x
  FROM spine LEFT JOIN c ON spine.h = c.h
), lags(lag) AS (VALUES (1), (2), (3), (4), (5), (6)),
pairs AS (
  SELECT lags.lag, a.x AS x, b.x AS y
  FROM sx a JOIN lags ON true JOIN sx b ON b.h = a.h + lags.lag
), m AS (
  SELECT lag, COUNT(*) AS n,
    CAST(SUM(x) AS BIGINT) AS s_x, CAST(SUM(y) AS BIGINT) AS s_y,
    CAST(SUM(x * x) AS BIGINT) AS s_xx,
    CAST(SUM(y * y) AS BIGINT) AS s_yy,
    CAST(SUM(x * y) AS BIGINT) AS s_xy
  FROM pairs GROUP BY 1
)
SELECT CAST(lag AS BIGINT) AS lag, n,
  CAST(n * s_xy - s_x * s_y AS DOUBLE)
    / (sqrt(CAST(n * s_xx - s_x * s_x AS DOUBLE))
       * sqrt(CAST(n * s_yy - s_y * s_y AS DOUBLE))) AS r
FROM m ORDER BY lag"""

  // --- partial autocorrelation (Durbin–Levinson) ----------------------
  /** PACF of the hourly count series at lags 1..5 via the
    * Durbin–Levinson recursion over the sample ACF — the readout that
    * separates direct lag-k structure from what shorter lags already
    * explain (the AR-order pick: ACF tails off, PACF cuts off). The
    * per-lag correlations reuse ev_acf's exact integer moment stats;
    * the DL recursion φ_{k,k} = (ρ_k − Σφ_{k−1,j}ρ_{k−j}) /
    * (1 − Σφ_{k−1,j}ρ_j), φ_{k,j} = φ_{k−1,j} − φ_{k,k}φ_{k−1,k−j}
    * is a fixed scalar DAG over five doubles, emitted as the SAME
    * generated expression text to both engines ([[dlFormulas]]) so the
    * IEEE op tree is structurally identical by construction. Nothing
    * after the moment aggregate touches more than one row.
    */
  private val PacfLags = 5

  /** Durbin–Levinson formula strings over named columns `r1..rK` /
    * `pK_J`, in dependency order — ONE generator, parsed by Spark's
    * `expr` and DuckDB alike.
    */
  private def dlFormulas(kMax: Int): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    out += (("p1_1", "r1"))
    for (k <- 2 to kMax) {
      val num = (1 until k).map(j => s"p${k - 1}_$j * r${k - j}")
        .foldLeft(s"r$k")((acc, t) => s"$acc - $t")
      val den = (1 until k).map(j => s"p${k - 1}_$j * r$j")
        .foldLeft("CAST(1 AS DOUBLE)")((acc, t) => s"$acc - $t")
      out += ((s"p${k}_$k", s"($num) / ($den)"))
      for (j <- 1 until k)
        out += ((s"p${k}_$j", s"p${k - 1}_$j - p${k}_$k * p${k - 1}_${k - j}"))
    }
    out.result()
  }

  private def pacf(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.events(s, dir)
      .select(expr("unix_millis(ts) div 3600000").as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("x"))
    val spine = c.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("h"))
    val sx = spine.join(c, Seq("h"), "left")
      .select(col("h"), coalesce(col("x"), lit(0L)).as("x"))
    val lags = s.range(1, PacfLags + 1).select(col("id").as("lag"))
    val shifted = sx.select(col("h").as("hb"), col("x").as("y"))
    val pairs = sx.crossJoin(broadcast(lags))
      .join(shifted, col("hb") === col("h") + col("lag"))
    val m = pairs.groupBy(col("lag")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("s_x"), sum(col("y")).as("s_y"),
      sum(col("x") * col("x")).as("s_xx"),
      sum(col("y") * col("y")).as("s_yy"),
      sum(col("x") * col("y")).as("s_xy"))
    def d(c0: org.apache.spark.sql.Column) = c0.cast("double")
    val rtab = m.select(col("lag"),
      (d(col("n") * col("s_xy") - col("s_x") * col("s_y")) /
        (sqrt(d(col("n") * col("s_xx") - col("s_x") * col("s_x"))) *
         sqrt(d(col("n") * col("s_yy") - col("s_y") * col("s_y")))))
        .as("r"))
    val rrowAggs = (1 to PacfLags).map(k =>
      max(when(col("lag") === k, col("r"))).as(s"r$k"))
    val rrow = rtab.agg(rrowAggs.head, rrowAggs.tail: _*)
    val solved = dlFormulas(PacfLags).foldLeft(rrow) {
      case (df, (alias, formula)) => df.withColumn(alias, expr(formula))
    }
    (1 to PacfLags).map { k =>
      solved.select(lit(k.toLong).as("lag"), col(s"r$k").as("acf_r"),
        col(s"p${k}_$k").as("pacf"))
    }.reduce(_ union _).orderBy("lag")
  }

  private val pacfOracle: String = {
    val rCases = (1 to PacfLags).map(k =>
      s"MAX(CASE WHEN lag = $k THEN r END) AS r$k").mkString(",\n    ")
    val dlChain = dlFormulas(PacfLags).zipWithIndex.map {
      case ((alias, formula), i) =>
        val from = if (i == 0) "rrow" else s"d$i"
        s"d${i + 1} AS (SELECT *, $formula AS $alias FROM $from)"
    }.mkString(",\n")
    val last = s"d${dlFormulas(PacfLags).size}"
    val outs = (1 to PacfLags).map(k =>
      s"SELECT CAST($k AS BIGINT) AS lag, r$k AS acf_r, p${k}_$k AS pacf FROM $last")
      .mkString("\nUNION ALL ")
    s"""WITH c AS (
  SELECT epoch_ms(ts) // 3600000 AS h, COUNT(*) AS x FROM events GROUP BY 1
), bounds AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM c),
spine AS (SELECT unnest(generate_series(lo, hi)) AS h FROM bounds),
sx AS (
  SELECT spine.h, CAST(COALESCE(c.x, 0) AS BIGINT) AS x
  FROM spine LEFT JOIN c ON spine.h = c.h
), lags(lag) AS (VALUES ${(1 to PacfLags).map(k => s"($k)").mkString(", ")}),
pairs AS (
  SELECT lags.lag, a.x AS x, b.x AS y
  FROM sx a JOIN lags ON true JOIN sx b ON b.h = a.h + lags.lag
), m AS (
  SELECT lag, COUNT(*) AS n,
    CAST(SUM(x) AS BIGINT) AS s_x, CAST(SUM(y) AS BIGINT) AS s_y,
    CAST(SUM(x * x) AS BIGINT) AS s_xx,
    CAST(SUM(y * y) AS BIGINT) AS s_yy,
    CAST(SUM(x * y) AS BIGINT) AS s_xy
  FROM pairs GROUP BY 1
), rtab AS (
  SELECT lag,
    CAST(n * s_xy - s_x * s_y AS DOUBLE)
      / (sqrt(CAST(n * s_xx - s_x * s_x AS DOUBLE))
         * sqrt(CAST(n * s_yy - s_y * s_y AS DOUBLE))) AS r
  FROM m
), rrow AS (
  SELECT
    $rCases
  FROM rtab
),
$dlChain
$outs
ORDER BY lag"""
  }

  // --- growth accounting (user lifecycle flows) --------------------------
  /** Weekly growth accounting: every active user classified as NEW
    * (first-ever week), RETAINED (active this week and last),
    * RESURRECTED (active now, inactive last week, not new), plus
    * CHURNED (active last week, silent this week, counted into the
    * week they went silent) — the Social-Capital-style flow ledger
    * whose identity active_t = new + retained + resurrected and whose
    * quick ratio (new+resurrected)/churned every growth review runs.
    * One distinct (user, week) table, one lag per user, exact counts.
    */
  private def growthAccounting(s: SparkSession, dir: String): DataFrame = {
    val uw = Tables.events(s, dir)
      .select(col("user_id"), expr("unix_millis(ts) div 604800000").as("w"))
      .distinct()
    val wl = Window.partitionBy(col("user_id")).orderBy(col("w"))
    val flagged = uw
      .withColumn("prev_w", lag(col("w"), 1).over(wl))
      .withColumn("next_w", lead(col("w"), 1).over(wl))
      .select(col("user_id"), col("w"),
        when(col("prev_w").isNull, "new")
          .when(col("prev_w") === col("w") - 1, "retained")
          .otherwise("resurrected").as("state"),
        // churn lands in the week AFTER the last active one
        (col("next_w").isNull || col("next_w") > col("w") + 1)
          .as("churns_after"))
    val flows = flagged.groupBy(col("w")).agg(
      count(lit(1)).as("active"),
      sum(when(col("state") === "new", 1L).otherwise(0L)).as("new_users"),
      sum(when(col("state") === "retained", 1L).otherwise(0L))
        .as("retained"),
      sum(when(col("state") === "resurrected", 1L).otherwise(0L))
        .as("resurrected"),
      sum(when(col("churns_after"), 1L).otherwise(0L)).as("churning_out"))
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    flows.select(col("w").as("week"), col("active"), col("new_users"),
        col("retained"), col("resurrected"), col("churning_out"),
        // a zero-churn week has an undefined quick ratio (NULL on
        // both sides; ANSI Spark would otherwise throw on the divide)
        when(col("churning_out") === 0, lit(null).cast("double"))
          .otherwise((dd(col("new_users")) + dd(col("resurrected"))) /
            dd(col("churning_out"))).as("quick_ratio"))
      .orderBy("week")
  }

  private val growthAccountingOracle: String = """WITH uw AS (
  SELECT DISTINCT user_id, epoch_ms(ts) // 604800000 AS w FROM events
), f AS (
  SELECT user_id, w,
    LAG(w) OVER (PARTITION BY user_id ORDER BY w) AS prev_w,
    LEAD(w) OVER (PARTITION BY user_id ORDER BY w) AS next_w
  FROM uw
), st AS (
  SELECT w,
    CASE WHEN prev_w IS NULL THEN 'new'
         WHEN prev_w = w - 1 THEN 'retained'
         ELSE 'resurrected' END AS state,
    (next_w IS NULL OR next_w > w + 1) AS churns_after
  FROM f
)
SELECT w AS week, COUNT(*) AS active,
  CAST(SUM(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS BIGINT)
    AS new_users,
  CAST(SUM(CASE WHEN state = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
    AS retained,
  CAST(SUM(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT)
    AS resurrected,
  CAST(SUM(CASE WHEN churns_after THEN 1 ELSE 0 END) AS BIGINT)
    AS churning_out,
  CASE WHEN SUM(CASE WHEN churns_after THEN 1 ELSE 0 END) = 0 THEN NULL
    ELSE (CAST(SUM(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS DOUBLE)
      + CAST(SUM(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END)
        AS DOUBLE))
      / CAST(SUM(CASE WHEN churns_after THEN 1 ELSE 0 END) AS DOUBLE)
  END AS quick_ratio
FROM st GROUP BY 1 ORDER BY week"""

  // --- peak-to-mean ratio (capacity planning) ----------------------------
  /** Per-day peak-to-mean ratio of hourly event counts — the capacity
    * headroom number (provision for PAR × mean, not mean): PAR per day
    * = max hourly count / mean hourly count over the day's 24 slots
    * (zero-filled — an idle hour lowers the mean and RAISES the ratio,
    * exactly what an autoscaler experiences). Exact integer max and
    * sum; PAR = one cross-multiplied double (24·max / total).
    */
  private def peakToMean(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.events(s, dir)
      .select(expr("unix_millis(ts) div 3600000").as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("x"))
      .select(expr("h div 24").as("d"), col("h"), col("x"))
    // zero-filling: per day, mean over 24 slots uses the fixed 24
    // denominator, so absent hours need no explicit rows for max/sum
    def dd(c0: org.apache.spark.sql.Column) = c0.cast("double")
    c.groupBy(col("d"))
      .agg(max(col("x")).as("peak_hour"), sum(col("x")).as("day_total"),
        count(lit(1)).as("active_hours"))
      .select(col("d").as("day"), col("active_hours"), col("peak_hour"),
        col("day_total"),
        (lit(24.0) * dd(col("peak_hour")) / dd(col("day_total")))
          .as("peak_to_mean"))
      .orderBy("day")
  }

  private val peakToMeanOracle: String = s"""WITH c AS (
  SELECT epoch_ms(ts) // 3600000 AS h, COUNT(*) AS x FROM events GROUP BY 1
), d AS (
  SELECT h // 24 AS d, x FROM c
)
SELECT d AS day, COUNT(*) AS active_hours,
  CAST(MAX(x) AS BIGINT) AS peak_hour,
  CAST(SUM(x) AS BIGINT) AS day_total,
  ${D("24.0")} * CAST(MAX(x) AS DOUBLE) / CAST(SUM(x) AS DOUBLE)
    AS peak_to_mean
FROM d GROUP BY 1 ORDER BY day"""

  // --- counterfactual intervention readout (CausalImpact-lite) ----------
  /** Intervention-effect readout over the final week: fit an OLS trend
    * to daily purchase revenue on the PRE period, project it as the
    * counterfactual over the last 7 days, and report per-day and
    * cumulative lift — the CausalImpact shape (minus the Bayesian
    * state-space machinery) every launch review runs. Day index is
    * re-based to the window start so the exact OLS moments stay small;
    * predictions are one double tree over the moment longs (the
    * q_durbin_watson residual form); per-day effects are floored to
    * integer cents before the cumulative integer sum.
    */
  private def causalImpact(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .where(col("event_type") === "purchase" && col("value").isNotNull)
      .select(expr("unix_millis(ts) div 86400000").as("d"),
        floor(col("value") * 100 + 0.5).cast("long").as("c"))
      .groupBy(col("d")).agg(sum(col("c")).as("r"))
    val bounds = daily.agg(min(col("d")).as("dlo"), max(col("d")).as("dhi"))
    val based = daily.crossJoin(broadcast(bounds))
      .select((col("d") - col("dlo")).as("x"), col("r"),
        (col("d") > col("dhi") - 7).as("post"))
    val fit = based.where(!col("post"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("r")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("r")).as("sxy"))
      .select((col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("den"),
        col("n"), col("sx"), col("sy"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val post = based.where(col("post")).crossJoin(broadcast(fit))
      .select(col("x"), col("r"),
        ((d(col("sy")) - d(col("num")) / d(col("den")) * d(col("sx")))
          / d(col("n"))
          + d(col("num")) / d(col("den")) * d(col("x"))).as("pred"))
      .select(col("x").as("day_idx"), col("r").as("actual_cents"),
        col("pred").as("predicted_cents"),
        floor(d(col("r")) - col("pred")).cast("long").as("effect_cents"))
    val wc = Window.orderBy("day_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    post.withColumn("cum_effect_cents", sum(col("effect_cents")).over(wc))
      .orderBy("day_idx")
  }

  private val causalImpactOracle: String = """WITH daily AS (
  SELECT epoch_ms(ts) // 86400000 AS d,
    CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS r
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
  GROUP BY 1
), bounds AS (SELECT MIN(d) AS dlo, MAX(d) AS dhi FROM daily),
based AS (
  SELECT d - dlo AS x, r, d > dhi - 7 AS post FROM daily CROSS JOIN bounds
), fit AS (
  SELECT n * sxy - sx * sy AS num, n * sxx - sx * sx AS den, n, sx, sy
  FROM (
    SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
      CAST(SUM(r) AS BIGINT) AS sy, CAST(SUM(x * x) AS BIGINT) AS sxx,
      CAST(SUM(x * r) AS BIGINT) AS sxy
    FROM based WHERE NOT post
  )
), post_ AS (
  SELECT x AS day_idx, r AS actual_cents,
    (CAST(sy AS DOUBLE) - CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
        * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
      + CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * CAST(x AS DOUBLE)
      AS predicted_cents,
    CAST(FLOOR(CAST(r AS DOUBLE)
      - ((CAST(sy AS DOUBLE) - CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
          * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
        + CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * CAST(x AS DOUBLE)))
      AS BIGINT) AS effect_cents
  FROM based CROSS JOIN fit WHERE post
)
SELECT day_idx, actual_cents, predicted_cents, effect_cents,
  CAST(SUM(effect_cents) OVER (ORDER BY day_idx ROWS UNBOUNDED PRECEDING)
    AS BIGINT) AS cum_effect_cents
FROM post_ ORDER BY day_idx"""

  // --- retention half-life (exponential-decay fit) ----------------------
  /** Retention half-life: fit ln r_k = a + b·k over blended day-age
    * retention (distinct users active at age k over the user universe,
    * ages 1..25) and report t½ = −ln2/b — the single number product
    * teams quote where the full curve (`ev_retention`) is the input.
    * Parity: per-age ln(r_k) is floored to MICRO units (the repo's log
    * convention) so the OLS moment sums are exact integers; the slope
    * is one double division of two exact longs and t½ two more double
    * ops with ln 2 embedded as a shared full-precision constant — no
    * engine evaluates ln(2) itself.
    */
  private def retentionHalflife(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("d"))
    val first = ev.groupBy(col("user_id")).agg(min(col("d")).as("d0"))
    val ages = ev.join(first, Seq("user_id"))
      .select(col("user_id"), (col("d") - col("d0")).as("k"))
      .where(col("k").between(1, 25))
      .distinct()
      .groupBy(col("k")).agg(count(lit(1)).as("n_k"))
    val tot = first.agg(count(lit(1)).as("n_users"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val pts = ages.crossJoin(broadcast(tot))
      .where(col("n_k") > 0)
      .select(col("k"),
        floor(log(d(col("n_k")) / d(col("n_users"))) * 1e6).cast("long")
          .as("y_micro"))
    val m = pts.agg(count(lit(1)).as("n"), sum(col("k")).as("sx"),
      sum(col("y_micro")).as("sy"), sum(col("k") * col("k")).as("sxx"),
      sum(col("k") * col("y_micro")).as("sxy"))
    val ln2Micro = 693147.1805599453 // ln(2)·1e6, shared constant
    m.select(col("n"),
        ((d(col("n") * col("sxy") - col("sx") * col("sy"))) /
          (d(col("n") * col("sxx") - col("sx") * col("sx"))))
          .as("slope_micro_per_day"))
      .select(col("n").as("n_ages"), col("slope_micro_per_day"),
        (-lit(ln2Micro) / col("slope_micro_per_day"))
          .as("halflife_days"))
  }

  private val retentionHalflifeOracle: String = s"""WITH ev AS (
  SELECT user_id, epoch_ms(ts) // 86400000 AS d FROM events
), first_ AS (
  SELECT user_id, MIN(d) AS d0 FROM ev GROUP BY 1
), ages AS (
  SELECT k, COUNT(*) AS n_k FROM (
    SELECT DISTINCT ev.user_id, ev.d - f.d0 AS k
    FROM ev JOIN first_ f ON ev.user_id = f.user_id
    WHERE ev.d - f.d0 BETWEEN 1 AND 25
  ) GROUP BY 1
), tot AS (SELECT COUNT(*) AS n_users FROM first_),
pts AS (
  SELECT k,
    CAST(FLOOR(ln(CAST(n_k AS DOUBLE) / CAST(n_users AS DOUBLE))
      * ${D("1e6")}) AS BIGINT) AS y_micro
  FROM ages CROSS JOIN tot WHERE n_k > 0
), m AS (
  SELECT COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sx,
    CAST(SUM(y_micro) AS BIGINT) AS sy,
    CAST(SUM(k * k) AS BIGINT) AS sxx,
    CAST(SUM(k * y_micro) AS BIGINT) AS sxy
  FROM pts
)
SELECT n AS n_ages,
  CAST(n * sxy - sx * sy AS DOUBLE)
    / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_micro_per_day,
  -${Sql.Dlit(693147.1805599453)}
    / (CAST(n * sxy - sx * sy AS DOUBLE)
      / CAST(n * sxx - sx * sx AS DOUBLE)) AS halflife_days
FROM m"""

  // --- discounted lifetime value by cohort ------------------------------
  /** Discounted LTV per signup cohort: purchase revenue at month-age k
    * weighted by 0.95^k — the finance-grade readout (money later is
    * worth less) that raw cohort revenue (`ev_cohort_revenue`)
    * deliberately omits. The discount curve is PRE-TABULATED in Scala
    * (`floor(1e6·0.95^k)` for k ≤ 83) and embedded as the same literal
    * table in both engines — the shared-constants pattern, because
    * POWER() is the one arithmetic whose last ulp differs between
    * libm builds. Revenue stays exact cents; cents × micro-discount
    * products are exact longs; the only double is the final
    * per-cohort division to dollars.
    */
  private val LtvDiscountMicro: IndexedSeq[Long] =
    (0 to 83).map(k => math.floor(1e6 * math.pow(0.95, k)).toLong)

  private def ltvDiscounted(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    // WEEKLY cohorts: the replay horizon is ~30 days, so month-grain
    // cohorts would collapse to one row and the discount would never
    // engage
    val cohorts = ev.groupBy(col("user_id"))
      .agg(min(expr("unix_millis(ts) div 604800000")).as("cohort_m"))
    val purchases = ev
      .where(col("event_type") === "purchase" && col("value").isNotNull)
      .select(col("user_id"), expr("unix_millis(ts) div 604800000").as("m"),
        floor(col("value") * 100 + 0.5).cast("long").as("c"))
    val rev = purchases.join(cohorts, Seq("user_id"))
      .select(col("cohort_m"), (col("m") - col("cohort_m")).as("age"),
        col("c"))
      .withColumn("disc",
        element_at(typedLit(LtvDiscountMicro), (col("age") + 1).cast("int")))
      .groupBy(col("cohort_m"))
      .agg(sum(col("c")).as("raw_cents"),
        sum(col("c") * col("disc")).as("disc_cents_micro"))
    val sizes = cohorts.groupBy(col("cohort_m"))
      .agg(count(lit(1)).as("n_users"))
    sizes.join(rev, Seq("cohort_m"), "left")
      .select(col("cohort_m"), col("n_users"),
        coalesce(col("raw_cents"), lit(0L)).as("raw_cents"),
        coalesce(col("disc_cents_micro"), lit(0L)).as("disc_cents_micro"),
        (coalesce(col("disc_cents_micro"), lit(0L)).cast("double")
          / lit(1e8) / col("n_users").cast("double"))
          .as("ltv_per_user_dollars"))
      .orderBy("cohort_m")
  }

  private val ltvDiscountedOracle: String = {
    val discCase = LtvDiscountMicro.zipWithIndex
      .map { case (d, k) => s"WHEN $k THEN $d" }.mkString(" ")
    s"""WITH cohorts AS (
  SELECT user_id,
    MIN(epoch_ms(ts) // 604800000) AS cohort_m
  FROM events GROUP BY 1
), purchases AS (
  SELECT user_id,
    epoch_ms(ts) // 604800000 AS m,
    CAST(FLOOR(value * 100 + ${D("0.5")}) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
), rev AS (
  SELECT c2.cohort_m,
    CAST(SUM(p.c) AS BIGINT) AS raw_cents,
    CAST(SUM(p.c * (CASE p.m - c2.cohort_m $discCase END)) AS BIGINT)
      AS disc_cents_micro
  FROM purchases p JOIN cohorts c2 ON p.user_id = c2.user_id
  GROUP BY 1
), sizes AS (
  SELECT cohort_m, COUNT(*) AS n_users FROM cohorts GROUP BY 1
)
SELECT CAST(s.cohort_m AS BIGINT) AS cohort_m, s.n_users,
  COALESCE(r.raw_cents, 0) AS raw_cents,
  COALESCE(r.disc_cents_micro, 0) AS disc_cents_micro,
  CAST(COALESCE(r.disc_cents_micro, 0) AS DOUBLE) / ${D("1e8")}
    / CAST(s.n_users AS DOUBLE) AS ltv_per_user_dollars
FROM sizes s LEFT JOIN rev r ON s.cohort_m = r.cohort_m
ORDER BY cohort_m"""
  }

  // --- Page–Hinkley drift detector --------------------------------------
  /** Page–Hinkley test over the zero-filled hourly count series — the
    * classic sequential mean-shift detector (Page '54, Hinkley '71;
    * what stream-ML monitors run where ev_cusum assumes a KNOWN
    * baseline: PH tracks deviations from the RUNNING mean, so it needs
    * no calibration window). m_t = Σ(xᵢ − x̄ᵢ − δ) with δ = 0.5,
    * PH_t = m_t − min m_t, alarm when PH crosses an adaptive λ = 20·x̄_N.
    * Per-step terms are nano-floored (the running mean is a rational of
    * two exact longs), cumulative sum and running min are exact integer
    * window folds, and the alarm test cross-multiplies to integers
    * (PH·N > 20·S_N·1e9) so no float compare can flip a row. One
    * ordered pass over a ~thousands-row series.
    */
  private def pageHinkley(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.events(s, dir)
      .select(expr("unix_millis(ts) div 3600000").as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("x"))
    val spine = c.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("h"))
    val sx = spine.join(c, Seq("h"), "left")
      .select(col("h"), coalesce(col("x"), lit(0L)).as("x"))
    val wo = Window.orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def d(c0: org.apache.spark.sql.Column) = c0.cast("double")
    val terms = sx
      .withColumn("t", row_number().over(Window.orderBy("h")).cast("long"))
      .withColumn("s", sum(col("x")).over(wo))
      .withColumn("term_nano",
        floor((d(col("x")) - d(col("s")) / d(col("t")) - lit(0.5)) * 1e9)
          .cast("long"))
    val ph = terms
      .withColumn("m", sum(col("term_nano")).over(wo))
      .withColumn("mmin", min(col("m")).over(wo))
      .withColumn("ph", col("m") - col("mmin"))
    val tot = ph.agg(max(col("t")).as("n_hours"), max(col("s")).as("s_n"))
    ph.crossJoin(broadcast(tot))
      .agg(max(col("n_hours")).as("n_hours"),
        sum(when(col("ph") * col("n_hours") >
          lit(20L) * col("s_n") * lit(1000000000L), 1L).otherwise(0L))
          .as("n_alarms"),
        min(when(col("ph") * col("n_hours") >
          lit(20L) * col("s_n") * lit(1000000000L), col("h")))
          .as("first_alarm_h"),
        max(col("ph")).as("max_ph_nano"))
  }

  private val pageHinkleyOracle: String = s"""WITH c AS (
  SELECT epoch_ms(ts) // 3600000 AS h, COUNT(*) AS x FROM events GROUP BY 1
), bounds AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM c),
spine AS (SELECT unnest(generate_series(lo, hi)) AS h FROM bounds),
sx AS (
  SELECT spine.h, CAST(COALESCE(c.x, 0) AS BIGINT) AS x
  FROM spine LEFT JOIN c ON spine.h = c.h
), terms AS (
  SELECT h, x,
    CAST(ROW_NUMBER() OVER (ORDER BY h) AS BIGINT) AS t,
    CAST(SUM(x) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s
  FROM sx
), tn AS (
  SELECT h, x, t, s,
    CAST(FLOOR((CAST(x AS DOUBLE) - CAST(s AS DOUBLE) / CAST(t AS DOUBLE)
      - ${D("0.5")}) * ${D("1e9")}) AS BIGINT) AS term_nano
  FROM terms
), m0 AS (
  SELECT h, t, s,
    CAST(SUM(term_nano) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS BIGINT)
      AS m
  FROM tn
), ph AS (
  SELECT h, t, s,
    m - CAST(MIN(m) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS BIGINT)
      AS ph
  FROM m0
), tot AS (SELECT MAX(t) AS n_hours, MAX(s) AS s_n FROM ph)
SELECT tot.n_hours,
  CAST(SUM(CASE WHEN ph.ph * tot.n_hours > 20 * tot.s_n * 1000000000
    THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
  CAST(MIN(CASE WHEN ph.ph * tot.n_hours > 20 * tot.s_n * 1000000000
    THEN ph.h END) AS BIGINT) AS first_alarm_h,
  CAST(MAX(ph.ph) AS BIGINT) AS max_ph_nano
FROM ph CROSS JOIN tot GROUP BY tot.n_hours"""

  // --- Kalman filter (local level) -------------------------------------
  /** Per-user 1-D Kalman filter (local-level model, q = 1, r = 4) over
    * the event-value sequence — the adaptive smoother that ev_ewma's
    * fixed α can't be: the gain K = P'/(P'+r) starts high (trust the
    * data while uncertain) and settles to the steady-state ratio, so
    * level estimates converge faster after gaps and jumps. The fold is
    * the textbook predict/update pair P' = P+q; K = P'/(P'+r);
    * x += K(z−x); P = (1−K)P' — plain IEEE ops replayed in the SAME
    * order by the recursive-CTE oracle, so the trajectory is
    * bit-identical. Same distribution shape as ev_holt: repartition by
    * user, secondary sort, one mapPartitions fold, 2 doubles of state.
    */
  private def kalman(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .where(col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts", "event_id")
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[(Long, Long, Double, Double)] {
          def hasNext: Boolean = buf.hasNext
          def next(): (Long, Long, Double, Double) = {
            val (u, _, _, v0) = buf.next()
            var x = v0
            var p = 1.0
            var n = 1L
            while (buf.hasNext && buf.head._1 == u) {
              val z = buf.next()._4
              val pp = p + 1.0
              val k = pp / (pp + 4.0)
              x = x + k * (z - x)
              p = (1.0 - k) * pp
              n += 1
            }
            (u, n, x, p)
          }
        }
      }
      .toDF("user_id", "n_events", "level", "p_var")
      .orderBy("user_id")
  }

  private val kalmanOracle = """WITH RECURSIVE e AS (
  SELECT user_id, CAST(value AS DOUBLE) AS z,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE value IS NOT NULL
), h(user_id, rn, x, p) AS (
  SELECT user_id, CAST(1 AS BIGINT), z, CAST(1 AS DOUBLE)
  FROM e WHERE rn = 1
  UNION ALL
  SELECT e.user_id, h.rn + 1,
    h.x + ((h.p + CAST(1 AS DOUBLE)) / ((h.p + CAST(1 AS DOUBLE))
      + CAST(4 AS DOUBLE))) * (e.z - h.x),
    (CAST(1 AS DOUBLE) - (h.p + CAST(1 AS DOUBLE))
      / ((h.p + CAST(1 AS DOUBLE)) + CAST(4 AS DOUBLE)))
      * (h.p + CAST(1 AS DOUBLE))
  FROM h JOIN e ON e.user_id = h.user_id AND e.rn = h.rn + 1
)
SELECT user_id, rn AS n_events, x AS level, p AS p_var FROM h
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn DESC) = 1
ORDER BY user_id"""

  // --- Croston's method (intermittent demand) --------------------------
  /** Croston's method per user over daily PURCHASE demand — the
    * forecaster for series that are mostly zeros, where SES smears and
    * per-day means undershoot (Croston '72, the standard in spare-parts
    * and long-tail demand planning). The fold touches only DEMAND days
    * (zero days enter through the inter-demand interval, never as
    * rows): z' = (x + z)/2 smooths the demand size, p' = (Δdays + p)/2
    * the interval, forecast = z'/p' — α = 1/2 keeps every step two
    * exact IEEE halvings, the ev_holt convention. Distribution shape:
    * repartition by user + sortWithinPartitions + one mapPartitions
    * fold (the secondary-sort pattern); state is 3 doubles per user.
    */
  private def croston(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .where(col("event_type") === "purchase")
      .select(col("user_id"),
        expr("unix_millis(ts) div 86400000").as("day"))
      .groupBy(col("user_id"), col("day")).agg(count(lit(1)).as("x"))
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "day")
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[(Long, Long, Double, Double)] {
          def hasNext: Boolean = buf.hasNext
          def next(): (Long, Long, Double, Double) = {
            val (u, d0, x0) = buf.next()
            var z = x0.toDouble
            var p = 1.0 // first interval convention: one day
            var last = d0
            var n = 1L
            while (buf.hasNext && buf.head._1 == u) {
              val (_, d, x) = buf.next()
              z = (x.toDouble + z) / 2
              p = ((d - last).toDouble + p) / 2
              last = d
              n += 1
            }
            (u, n, z, p)
          }
        }
      }
      .toDF("user_id", "n_demand_days", "z_hat", "p_hat")
      .select(col("user_id"), col("n_demand_days"), col("z_hat"),
        col("p_hat"), (col("z_hat") / col("p_hat")).as("croston_forecast"))
      .orderBy("user_id")
  }

  private val crostonOracle = """WITH RECURSIVE dd AS (
  SELECT user_id, epoch_ms(ts) // 86400000 AS day, COUNT(*) AS x
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
), e AS (
  SELECT user_id, day, x,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
  FROM dd
), h(user_id, rn, day, z, p) AS (
  SELECT user_id, CAST(1 AS BIGINT), day, CAST(x AS DOUBLE),
    CAST(1 AS DOUBLE)
  FROM e WHERE rn = 1
  UNION ALL
  SELECT e.user_id, h.rn + 1, e.day,
    (CAST(e.x AS DOUBLE) + h.z) / CAST(2 AS DOUBLE),
    (CAST(e.day - h.day AS DOUBLE) + h.p) / CAST(2 AS DOUBLE)
  FROM h JOIN e ON e.user_id = h.user_id AND e.rn = h.rn + 1
)
SELECT user_id, rn AS n_demand_days, z AS z_hat, p AS p_hat,
  z / p AS croston_forecast
FROM h
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn DESC) = 1
ORDER BY user_id"""

  /** Hurst exponent of the hourly event-count series by the
    * aggregated-variance method: block-sum the series at scales
    * m ∈ {1,2,4,8,16} hours (complete blocks only), take
    * Var(block sums) per scale, and fit ln Var against ln m — for a
    * self-similar process Var(m) ~ m^2H, so H = slope/2. H ≈ 0.5 is
    * short-memory traffic; H → 1 is long-range dependence, the regime
    * where naive per-hour capacity planning underprovisions burst
    * clusters. The spine is zero-filled (shared convention with
    * ev_acf); block sums and their moment pairs are exact int64, each
    * scale's point is milli-floored before the 5-point OLS (the
    * t_zipf_alpha trick), so the slope is engine-exact. Everything
    * after the hourly groupBy is scale-count-bounded.
    */
  private def hurstAvm(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.events(s, dir)
      .select(expr("unix_millis(ts) div 3600000").as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("x"))
    val spine = c.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("h"))
    val sx = spine.join(c, Seq("h"), "left")
      .select(col("h"), coalesce(col("x"), lit(0L)).as("x"))
    val ms = s.range(0, 5).select(expr("shiftleft(1L, cast(id as int))")
      .as("m"))
    val blocks = sx.crossJoin(broadcast(ms))
      .groupBy(col("m"), expr("h div m").as("b"))
      .agg(count(lit(1)).as("cnt"), sum(col("x")).as("y"))
      .where(col("cnt") === col("m"))
    val perM = blocks.groupBy(col("m"))
      .agg(count(lit(1)).as("nb"), sum(col("y")).as("s1"),
        sum(col("y") * col("y")).as("s2"))
      .withColumn("vr",
        (col("s2").cast("double") - col("s1").cast("double") *
          col("s1").cast("double") / col("nb").cast("double")) /
          col("nb").cast("double"))
      .where(col("vr") > 0)
    val pts = perM.select(
      floor(log(col("m").cast("double")) * lit(1000.0)).cast("long").as("px"),
      floor(log(col("vr")) * lit(1000.0)).cast("long").as("py"))
    pts.agg(count(lit(1)).as("n_scales"), sum(col("px")).as("sx_"),
        sum(col("py")).as("sy_"), sum(col("px") * col("px")).as("sxx_"),
        sum(col("px") * col("py")).as("sxy_"))
      .select(col("n_scales"),
        ((col("n_scales").cast("double") * col("sxy_").cast("double") -
          col("sx_").cast("double") * col("sy_").cast("double")) /
          (col("n_scales").cast("double") * col("sxx_").cast("double") -
            col("sx_").cast("double") * col("sx_").cast("double")))
          .as("slope"))
      .withColumn("hurst", col("slope") / lit(2.0))
  }

  private val hurstAvmOracle: String = s"""WITH c AS (
  SELECT epoch_ms(ts) // 3600000 AS h, COUNT(*) AS x FROM events GROUP BY 1
), bounds AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM c),
spine AS (SELECT unnest(generate_series(lo, hi)) AS h FROM bounds),
sx AS (
  SELECT spine.h, CAST(COALESCE(c.x, 0) AS BIGINT) AS x
  FROM spine LEFT JOIN c ON spine.h = c.h
), ms(m) AS (VALUES (1), (2), (4), (8), (16)),
blocks AS (
  SELECT m, h // m AS b, COUNT(*) AS cnt, CAST(SUM(x) AS BIGINT) AS y
  FROM sx, ms GROUP BY 1, 2 HAVING COUNT(*) = m
), perm AS (
  SELECT m, COUNT(*) AS nb, CAST(SUM(y) AS BIGINT) AS s1,
    CAST(SUM(y * y) AS BIGINT) AS s2
  FROM blocks GROUP BY 1
), vm AS (
  SELECT m, nb,
    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
      / CAST(nb AS DOUBLE)) / CAST(nb AS DOUBLE) AS vr
  FROM perm
), pts AS (
  SELECT CAST(FLOOR(ln(CAST(m AS DOUBLE)) * ${D("1000")}) AS BIGINT) AS px,
    CAST(FLOOR(ln(vr) * ${D("1000")}) AS BIGINT) AS py
  FROM vm WHERE vr > 0
), t AS (
  SELECT COUNT(*) AS n_scales, CAST(SUM(px) AS BIGINT) AS sx_,
    CAST(SUM(py) AS BIGINT) AS sy_, CAST(SUM(px * px) AS BIGINT) AS sxx_,
    CAST(SUM(px * py) AS BIGINT) AS sxy_
  FROM pts
)
SELECT n_scales,
  (CAST(n_scales AS DOUBLE) * CAST(sxy_ AS DOUBLE)
    - CAST(sx_ AS DOUBLE) * CAST(sy_ AS DOUBLE))
  / (CAST(n_scales AS DOUBLE) * CAST(sxx_ AS DOUBLE)
    - CAST(sx_ AS DOUBLE) * CAST(sx_ AS DOUBLE)) AS slope,
  ((CAST(n_scales AS DOUBLE) * CAST(sxy_ AS DOUBLE)
    - CAST(sx_ AS DOUBLE) * CAST(sy_ AS DOUBLE))
  / (CAST(n_scales AS DOUBLE) * CAST(sxx_ AS DOUBLE)
    - CAST(sx_ AS DOUBLE) * CAST(sx_ AS DOUBLE))) / ${D("2.0")} AS hurst
FROM t"""

  /** Hill estimator of the purchase-value tail index over the top-200
    * order statistics: H = (1/k)·Σ ln(x₍ᵢ₎/x₍ₖ₊₁₎), α = 1/H — the
    * heavy-tail diagnostic that says whether revenue concentration has
    * a finite variance (α > 2) or whale-dominated tails (α < 2), which
    * changes every downstream sampling and capping decision. The
    * top-(k+1) slice is a TakeOrdered over (cents DESC, event_id) —
    * a per-partition top-k combine, never a global sort — and every
    * ln-ratio term is micro-floored before the integer sum, so the
    * estimate is engine-exact. k is fixed; nothing downstream of the
    * take scales with event volume.
    */
  private val HillK = 200

  private def hillTail(s: SparkSession, dir: String): DataFrame = {
    val vals = Tables.events(s, dir)
      .where(col("event_type") === "purchase" && col("value") > 0)
      .select(floor(col("value") * 100 + 0.5).cast("long").as("cents"),
        col("event_id"))
      .orderBy(col("cents").desc, col("event_id"))
      .limit(HillK + 1)
    val wr = Window.orderBy(col("cents").desc, col("event_id"))
    val ranked = vals.withColumn("rn", row_number().over(wr))
    val xk1 = ranked.where(col("rn") === HillK + 1)
      .select(col("cents").as("xk1"))
    val terms = ranked.where(col("rn") <= HillK)
      .crossJoin(broadcast(xk1))
      .select(floor(log(col("cents").cast("double") /
        col("xk1").cast("double")) * lit(1.0e6)).cast("long").as("t_micro"),
        col("xk1"))
    terms.groupBy(col("xk1"))
      .agg(count(lit(1)).as("k"), sum(col("t_micro")).as("sum_micro"))
      .select(col("k"), col("xk1").as("threshold_cents"),
        (col("sum_micro").cast("double") / lit(1.0e6) /
          col("k").cast("double")).as("hill"))
      .withColumn("alpha", lit(1.0) / col("hill"))
  }

  private val hillTailOracle: String = s"""WITH vals AS (
  SELECT CAST(FLOOR(value * 100 + ${D("0.5")}) AS BIGINT) AS cents, event_id
  FROM events WHERE event_type = 'purchase' AND value > 0
  ORDER BY cents DESC, event_id LIMIT ${HillK + 1}
), ranked AS (
  SELECT cents, ROW_NUMBER() OVER (ORDER BY cents DESC, event_id) AS rn
  FROM vals
), xk1 AS (
  SELECT cents AS xk1 FROM ranked WHERE rn = ${HillK + 1}
), terms AS (
  SELECT xk1,
    CAST(FLOOR(ln(CAST(cents AS DOUBLE) / CAST(xk1 AS DOUBLE))
      * ${D("1000000")}) AS BIGINT) AS t_micro
  FROM ranked, xk1 WHERE rn <= $HillK
)
SELECT COUNT(*) AS k, xk1 AS threshold_cents,
  CAST(SUM(t_micro) AS DOUBLE) / ${D("1000000")}
    / CAST(COUNT(*) AS DOUBLE) AS hill,
  ${D("1.0")} / (CAST(SUM(t_micro) AS DOUBLE) / ${D("1000000")}
    / CAST(COUNT(*) AS DOUBLE)) AS alpha
FROM terms GROUP BY xk1"""

  /** Weibull fit of user activity lifetimes (last−first event,
    * integer minutes, users with span ≥ 1) by median-rank regression:
    * plotting ln(−ln(1−F)) against ln(t) linearizes the Weibull CDF,
    * so the OLS slope IS the shape k (k < 1: churn hazard falls with
    * tenure — survive the first days and you stay; k > 1: wear-out)
    * and scale λ = exp(−intercept/k) is the characteristic lifetime.
    * F uses Bernard's median-rank (i−0.3)/(n+0.4), which never
    * reaches 0 or 1, so both logs stay finite by construction. The
    * ECDF runs over per-minute value counts (time-range-bounded
    * domain, the q_ks_test shape), each point is milli-floored before
    * the exact-integer OLS sums — engine-exact shape and scale.
    */
  private def weibullFit(s: SparkSession, dir: String): DataFrame = {
    val life = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(min(unix_millis(col("ts"))).as("mn"),
        max(unix_millis(col("ts"))).as("mx"))
      .select(expr("(mx - mn) div 60000").as("v"))
      .where(col("v") >= 1)
    val perV = life.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val tot = perV.agg(sum(col("c")).as("n"))
    val wv = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pts = perV.withColumn("cum", sum(col("c")).over(wv))
      .crossJoin(broadcast(tot))
      .select(
        floor(log(col("v").cast("double")) * lit(1000.0)).cast("long").as("x"),
        floor(log(-log(lit(1.0) -
          (col("cum").cast("double") - lit(0.3)) /
            (col("n").cast("double") + lit(0.4)))) * lit(1000.0))
          .cast("long").as("y"),
        col("n"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    pts.groupBy(col("n"))
      .agg(count(lit(1)).as("n_points"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("n").as("n_users"), col("n_points"),
        ((d(col("n_points")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
          (d(col("n_points")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))))
          .as("shape"),
        (d(col("sy")) / d(col("n_points"))).as("my"),
        (d(col("sx")) / d(col("n_points"))).as("mx"))
      .select(col("n_users"), col("n_points"), col("shape"),
        exp(-(col("my") - col("shape") * col("mx")) / lit(1000.0) /
          col("shape")).as("scale_minutes"))
  }

  private val weibullFitOracle: String = s"""WITH life AS (
  SELECT (MAX(epoch_ms(ts)) - MIN(epoch_ms(ts))) // 60000 AS v
  FROM events GROUP BY user_id
), lf AS (SELECT v FROM life WHERE v >= 1),
perv AS (SELECT v, COUNT(*) AS c FROM lf GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM perv),
pts AS (
  SELECT
    CAST(FLOOR(ln(CAST(v AS DOUBLE)) * ${D("1000")}) AS BIGINT) AS x,
    CAST(FLOOR(ln(-ln(${D("1.0")} -
      (CAST(SUM(c) OVER (ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        - ${D("0.3")}) / (CAST(n AS DOUBLE) + ${D("0.4")})))
      * ${D("1000")}) AS BIGINT) AS y,
    n
  FROM perv, tot
), agg AS (
  SELECT n AS n_users, COUNT(*) AS n_points,
    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
    CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM pts GROUP BY n
), fit AS (
  SELECT n_users, n_points,
    (CAST(n_points AS DOUBLE) * CAST(sxy AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / (CAST(n_points AS DOUBLE) * CAST(sxx AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS shape,
    CAST(sy AS DOUBLE) / CAST(n_points AS DOUBLE) AS my,
    CAST(sx AS DOUBLE) / CAST(n_points AS DOUBLE) AS mx
  FROM agg
)
SELECT n_users, n_points, shape,
  exp(-(my - shape * mx) / ${D("1000.0")} / shape) AS scale_minutes
FROM fit"""

  /** Poisson overdispersion test on the zero-filled hourly count
    * series: the dispersion statistic D = Σ(x−x̄)²/x̄ = (n−1)·VMR,
    * which is ~χ²(n−1) under a homogeneous Poisson arrival model — so
    * D/(n−1) ≫ 1 quantifies how far real traffic is from the Poisson
    * assumption capacity models default to (the time-axis sibling of
    * t_token_dispersion, complementing ev_burstiness' inter-arrival
    * view). Closed form over exact integer moments:
    * D = (n·Σx² − (Σx)²)/Σx — one double division of two exact longs.
    */
  private def overdispersion(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.events(s, dir)
      .select(expr("unix_millis(ts) div 3600000").as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("x"))
    val spine = c.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("h"))
    val sx = spine.join(c, Seq("h"), "left")
      .select(coalesce(col("x"), lit(0L)).as("x"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    sx.agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"))
      .select(col("n"),
        (d(col("s1")) / d(col("n"))).as("mean_per_hour"),
        ((d(col("n")) * d(col("s2")) - d(col("s1")) * d(col("s1"))) /
          d(col("s1"))).as("dispersion"),
        ((d(col("n")) * d(col("s2")) - d(col("s1")) * d(col("s1"))) /
          d(col("s1")) / (d(col("n")) - lit(1.0))).as("vmr"))
  }

  private val overdispersionOracle: String = s"""WITH c AS (
  SELECT epoch_ms(ts) // 3600000 AS h, COUNT(*) AS x FROM events GROUP BY 1
), bounds AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM c),
spine AS (SELECT unnest(generate_series(lo, hi)) AS h FROM bounds),
sx AS (
  SELECT CAST(COALESCE(c.x, 0) AS BIGINT) AS x
  FROM spine LEFT JOIN c ON spine.h = c.h
), m AS (
  SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s1,
    CAST(SUM(x * x) AS BIGINT) AS s2
  FROM sx
)
SELECT n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_per_hour,
  (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / CAST(s1 AS DOUBLE)
    AS dispersion,
  (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / CAST(s1 AS DOUBLE)
    / (CAST(n AS DOUBLE) - ${D("1.0")}) AS vmr
FROM m"""

  /** Robust anomaly detection over the daily event-count series: a
    * trailing 7-day rolling MEDIAN as the local level (immune to the
    * spike it's judging, unlike a rolling mean) and a flag where the
    * deviation exceeds 3·1.4826·MAD — the scaled median absolute
    * deviation, the robust σ-equivalent. The series is zero-filled over
    * the full day spine (a silent day is a real 0). Counts are exact
    * ints; medians are the interpolated exact percentile both engines
    * define identically (the q_rfm-proven parity), and the threshold is
    * one fixed double tree, so the boolean flags are bit-identical.
    * The rolling window is 7 rows over the time-bounded day spine, and
    * the global median/MAD are single aggregates — nothing here scales
    * with event volume past the first groupBy.
    */
  private def rollingMedianMad(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.events(s, dir)
      .select(expr("unix_millis(ts) div 86400000").as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("x"))
    val spine = c.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("d"))
    val sx = spine.join(c, Seq("d"), "left")
      .select(col("d"), coalesce(col("x"), lit(0L)).as("x"))
    val wd = Window.orderBy("d").rowsBetween(-6, Window.currentRow)
    val rm = sx.withColumn("roll_med", expr("percentile(x, 0.5D)").over(wd))
    val g = sx.agg(expr("percentile(x, 0.5D)").as("gm"))
    val mad = sx.crossJoin(broadcast(g))
      .agg(expr("percentile(abs(x - gm), 0.5D)").as("mad"))
    rm.crossJoin(broadcast(mad))
      .select(col("d"), col("x"), col("roll_med"),
        (abs(col("x") - col("roll_med")) >
          lit(3.0) * lit(1.4826) * col("mad")).as("is_anom"))
      .orderBy("d")
  }

  private val rollingMedianMadOracle: String = s"""WITH c AS (
  SELECT epoch_ms(ts) // 86400000 AS d, COUNT(*) AS x FROM events GROUP BY 1
), bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM c),
spine AS (SELECT unnest(generate_series(lo, hi)) AS d FROM bounds),
sx AS (
  SELECT spine.d, CAST(COALESCE(c.x, 0) AS BIGINT) AS x
  FROM spine LEFT JOIN c ON spine.d = c.d
), rm AS (
  SELECT d, x, quantile_cont(x, 0.5) OVER
    (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS roll_med
  FROM sx
), g AS (SELECT quantile_cont(x, 0.5) AS gm FROM sx),
md AS (SELECT quantile_cont(abs(x - gm), 0.5) AS mad FROM sx, g)
SELECT d, x, roll_med,
  abs(x - roll_med) > ${D("3.0")} * ${D("1.4826")} * mad AS is_anom
FROM rm, md ORDER BY d"""

  private val burstinessOracle: String = s"""WITH g AS (
  SELECT user_id,
    (epoch_ms(ts) - LAG(epoch_ms(ts)) OVER
      (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)) // 1000 AS dt
  FROM events
), m AS (
  SELECT user_id, COUNT(*) AS n, CAST(SUM(dt) AS BIGINT) AS s1,
    CAST(SUM(dt * dt) AS BIGINT) AS s2
  FROM g WHERE dt IS NOT NULL GROUP BY 1
), b AS (
  SELECT user_id,
    (sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
      - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
    / (sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
      + CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS b
  FROM m WHERE n >= 3 AND s1 > 0
)
SELECT LEAST(9, GREATEST(0, CAST(FLOOR((b + 1) * 5) AS BIGINT))) AS bin,
  COUNT(*) AS n_users, MIN(b) AS min_b, MAX(b) AS max_b
FROM b GROUP BY 1 ORDER BY bin"""

  // --- SAX symbolic motifs -----------------------------------------------
  /** SAX (Lin et al. '03) symbolization of the hourly event-count
    * series: z-normalize against the global mean/sd (exact-integer
    * Σx/Σx²), map each hour to one of 4 symbols at the Gaussian
    * quartile breakpoints ±0.6745/0, slide a 3-symbol window, and
    * count motif frequencies — the discretized shape vocabulary
    * behind time-series motif discovery. The series is the
    * hour-cardinality aggregate, so the one global lead-window is
    * bounded; symbols derive from the same literal float compare on
    * both sides. Top 15 motifs.
    */
  private val SaxLo = -0.6745
  private val SaxHi = 0.6745

  private def saxMotifs(s: SparkSession, dir: String): DataFrame = {
    def dd(c: Column) = c.cast("double")
    val hourlyN = Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
    val st = hourlyN.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("qx"))
    val mu = dd(col("sx")) / dd(col("n"))
    val sd = sqrt((dd(col("qx")) - dd(col("sx")) * dd(col("sx")) / dd(col("n")))
      / dd(col("n") - lit(1L)))
    val z = (dd(col("x")) - mu) / sd
    val sym = when(z < lit(SaxLo), "a").when(z < lit(0.0), "b")
      .when(z < lit(SaxHi), "c").otherwise("d")
    val w = Window.orderBy(col("h"))
    hourlyN.crossJoin(broadcast(st))
      .withColumn("s1", sym)
      .withColumn("motif",
        concat(col("s1"), lead(col("s1"), 1).over(w), lead(col("s1"), 2).over(w)))
      .where(col("motif").isNotNull)
      .groupBy(col("motif")).agg(count(lit(1)).as("n_windows"))
      .orderBy(col("n_windows").desc, col("motif")).limit(15)
  }

  private val saxMotifsOracle = s"""WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS x FROM events GROUP BY 1
), st AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS qx FROM hourly
), z AS (
  SELECT h,
    (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      / SQRT((CAST(qx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
          / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)) AS z
  FROM hourly, st
), sym AS (
  SELECT h, CASE WHEN z < ${Sql.Dlit(SaxLo)} THEN 'a'
    WHEN z < ${D("0")} THEN 'b'
    WHEN z < ${Sql.Dlit(SaxHi)} THEN 'c' ELSE 'd' END AS s1
  FROM z
), words AS (
  SELECT s1 || LEAD(s1, 1) OVER (ORDER BY h)
    || LEAD(s1, 2) OVER (ORDER BY h) AS motif
  FROM sym
)
SELECT motif, COUNT(*) AS n_windows FROM words WHERE motif IS NOT NULL
GROUP BY 1 ORDER BY n_windows DESC, motif LIMIT 15"""

  // --- Seasonal strength ---------------------------------------------------
  /** Hyndman's seasonal-strength statistic for the hourly count
    * series: F_s = max(0, 1 − Var(residual)/Var(series)) where the
    * seasonal fit is the hour-of-day mean profile — how much of the
    * series' variance the 24-hour cycle explains. Var(series) comes
    * straight off exact Σx/Σx²; the residuals are per-row doubles, so
    * their first two moments are floored to 1e-6 fixed-point units and
    * integer-summed before the one final variance expression — the
    * float-order-free path the package uses for unbounded double sums.
    */
  private def seasonalStrength(s: SparkSession, dir: String): DataFrame = {
    def dd(c: Column) = c.cast("double")
    val hourlyN = Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
      .withColumn("hod", hour(col("h")).cast("long"))
    val prof = hourlyN.groupBy(col("hod"))
      .agg(sum(col("x")).as("sh"), count(lit(1)).as("nh"))
      .select(col("hod"), (dd(col("sh")) / dd(col("nh"))).as("mh"))
    val st = hourlyN.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("qx"))
    val resid = hourlyN.join(broadcast(prof), "hod")
      .select((dd(col("x")) - col("mh")).as("r"))
      .select(floor(col("r") * lit(1000000L)).as("fr"),
        floor(col("r") * col("r") * lit(1000000L)).as("fr2"))
      .agg(sum(col("fr")).as("sfr"), sum(col("fr2")).as("sfr2"))
    val varX = (dd(col("qx")) - dd(col("sx")) * dd(col("sx")) / dd(col("n"))) /
      dd(col("n") - lit(1L))
    val er = dd(col("sfr")) / lit(1000000L) / dd(col("n"))
    val er2 = dd(col("sfr2")) / lit(1000000L) / dd(col("n"))
    val varR = (er2 - er * er) * dd(col("n")) / dd(col("n") - lit(1L))
    st.crossJoin(broadcast(resid))
      .select(col("n").as("n_hours"), varX.as("var_series"),
        varR.as("var_resid"),
        greatest(lit(0.0), lit(1.0) - varR / varX).as("seasonal_strength"))
  }

  private val seasonalStrengthOracle = s"""WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS x FROM events GROUP BY 1
), hh AS (
  SELECT h, x, CAST(EXTRACT(hour FROM h) AS BIGINT) AS hod FROM hourly
), prof AS (
  SELECT hod, CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mh
  FROM hh GROUP BY 1
), st AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS qx FROM hh
), resid AS (
  SELECT
    CAST(SUM(CAST(FLOOR((CAST(x AS DOUBLE) - mh) * 1000000) AS BIGINT)) AS BIGINT) AS sfr,
    CAST(SUM(CAST(FLOOR((CAST(x AS DOUBLE) - mh) * (CAST(x AS DOUBLE) - mh)
      * 1000000) AS BIGINT)) AS BIGINT) AS sfr2
  FROM hh JOIN prof ON hh.hod = prof.hod
)
SELECT n AS n_hours,
  (CAST(qx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
    / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS var_series,
  (CAST(sfr2 AS DOUBLE) / 1000000 / CAST(n AS DOUBLE)
    - (CAST(sfr AS DOUBLE) / 1000000 / CAST(n AS DOUBLE))
      * (CAST(sfr AS DOUBLE) / 1000000 / CAST(n AS DOUBLE)))
    * CAST(n AS DOUBLE) / CAST(n - 1 AS DOUBLE) AS var_resid,
  GREATEST(${D("0")}, ${D("1")} - ((CAST(sfr2 AS DOUBLE) / 1000000 / CAST(n AS DOUBLE)
    - (CAST(sfr AS DOUBLE) / 1000000 / CAST(n AS DOUBLE))
      * (CAST(sfr AS DOUBLE) / 1000000 / CAST(n AS DOUBLE)))
    * CAST(n AS DOUBLE) / CAST(n - 1 AS DOUBLE))
    / ((CAST(qx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
      / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))) AS seasonal_strength
FROM st, resid"""

  // --- Lead/lag cross-correlation -----------------------------------------
  /** Cross-correlation between the hourly VIEW and PURCHASE count
    * series at lags −3..+3 hours: r(ℓ) = corr(view_t, purchase_{t+ℓ})
    * — does browsing lead buying, and by how many hours. Each lag's
    * ten moment sums are exact BIGINTs off ONE hour-grain aggregate
    * self-joined at the shifted hour (an equi-join on the lagged
    * epoch, no window at all); the Pearson r is the same literal float
    * expression per lag row. 7 output rows.
    */
  private def leadLagCorr(s: SparkSession, dir: String): DataFrame = {
    def dd(c: Column) = c.cast("double")
    val hourlyVp = Tables.events(s, dir)
      .where(col("event_type").isin("view", "purchase"))
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("h"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
      .localCheckpoint(eager = true)
    val lags = s.range(-3, 4).select(col("id").as("lag"))
    val shifted = hourlyVp.select(col("h"), col("p"))
      .crossJoin(broadcast(lags))
      .select(col("lag"), (col("h") - col("lag") * lit(3600L)).as("h"), col("p"))
    val joined = hourlyVp.select(col("h"), col("v"))
      .join(shifted, Seq("h"))
    val g = joined.groupBy(col("lag"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"), sum(col("p")).as("sp"),
        sum(col("v") * col("v")).as("svv"), sum(col("p") * col("p")).as("spp"),
        sum(col("v") * col("p")).as("svp"))
    g.select(col("lag"), col("n"),
        ((dd(col("n")) * dd(col("svp")) - dd(col("sv")) * dd(col("sp")))
          / sqrt((dd(col("n")) * dd(col("svv")) - dd(col("sv")) * dd(col("sv")))
            * (dd(col("n")) * dd(col("spp")) - dd(col("sp")) * dd(col("sp")))))
          .as("xcorr"))
      .orderBy("lag")
  }

  private val leadLagCorrOracle = """WITH hourly AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h,
    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS v,
    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS p
  FROM events WHERE event_type IN ('view', 'purchase')
  GROUP BY 1
), shifted AS (
  SELECT lag, h - lag * 3600 AS h, p
  FROM hourly, (SELECT UNNEST(range(-3, 4)) AS lag)
), j AS (
  SELECT s.lag, a.v, s.p
  FROM hourly a JOIN shifted s ON a.h = s.h
), g AS (
  SELECT lag, COUNT(*) AS n, SUM(v) AS sv, SUM(p) AS sp,
    SUM(v * v) AS svv, SUM(p * p) AS spp, SUM(v * p) AS svp
  FROM j GROUP BY 1
)
SELECT CAST(lag AS BIGINT) AS lag, n,
  (CAST(n AS DOUBLE) * CAST(svp AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sp AS DOUBLE))
    / SQRT((CAST(n AS DOUBLE) * CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
      * (CAST(n AS DOUBLE) * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))) AS xcorr
FROM g ORDER BY lag"""

  // --- Transition dwell times -----------------------------------------------
  /** Mean dwell time on each event-type transition: for every
    * consecutive (prev → next) pair inside a user's (ts, event_id)
    * timeline, the milliseconds spent before the next event — the
    * timing layer g_markov's pure transition PROBABILITIES drop. The
    * gap sums are exact epoch-ms integers (one per-user lag window,
    * the ev_sessionize core), so the 25-row transition matrix needs
    * exactly one float division per cell.
    */
  private def dwellTime(s: SparkSession, dir: String): DataFrame = {
    def dd(c: Column) = c.cast("double")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("prev_ms", lag(col("ms"), 1).over(w))
      .where(col("prev_type").isNotNull)
    e.groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"), sum(col("ms") - col("prev_ms")).as("sum_ms"))
      .select(col("prev_type"), col("next_type"), col("n"),
        (dd(col("sum_ms")) / dd(col("n"))).as("mean_dwell_ms"))
      .orderBy("prev_type", "next_type")
  }

  private val dwellTimeOracle = """WITH e AS (
  SELECT user_id, event_type, epoch_ms(ts) AS ms,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
    LAG(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
  FROM events
), g AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n,
    CAST(SUM(ms - prev_ms) AS BIGINT) AS sum_ms
  FROM e WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
  CAST(sum_ms AS DOUBLE) / CAST(n AS DOUBLE) AS mean_dwell_ms
FROM g ORDER BY prev_type, next_type"""

  // --- Qini uplift curve ------------------------------------------------------
  /** Qini curve for a hashed pseudo-treatment: users ranked by activity
    * (view count), cut into exact ceil(10i/n) deciles, and per
    * cumulative prefix the incremental conversions
    * Qini(k) = Cₜ(k) − C_c(k)·Nₜ(k)/N_c(k) — the uplift-modeling
    * acceptance curve (Radcliffe), the treatment-aware refinement of
    * q_decile_lift. Arm assignment is the md5-parity split the
    * bootstrap family uses; every count is an exact BIGINT; two float
    * ops per output row. The user rank comes from
    * [[graft.operators.Ids.assignGlobalIds]] (range-partitioned
    * two-pass offsets — identical to ROW_NUMBER over (score desc,
    * user_id) but no single task ever holds the user table, the
    * r7-verdict fix for the one partition-less WindowExec this repo
    * still ran over entity-cardinality rows), and the total user count
    * rides a 1-row broadcast cross join instead of a global window.
    * The x/0 branch (a prefix with zero control users) is masked to
    * NULL on both engines — Spark would return IEEE Infinity while
    * DuckDB DOUBLE division yields NULL, so the guard keeps the
    * engines aligned even though the md5 near-50/50 split never
    * produces the branch at graded SFs.
    */
  private def qiniUplift(s: SparkSession, dir: String): DataFrame = {
    def dd(c: Column) = c.cast("double")
    val perUser = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("score"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
      .withColumn("treated",
        conv(substring(md5(col("user_id").cast("string")), 1, 1), 16, 10)
          .cast("int") < 8)
    val ranked = graft.operators.Ids.assignGlobalIds(perUser,
      Seq(col("score").desc, col("user_id")), 32, "i")
    val total = ranked.agg(count(lit(1)).as("n"))
    val d = ranked.crossJoin(broadcast(total))
      .withColumn("decile", expr("(i * 10 + n - 1) div n"))
      .groupBy(col("decile"))
      .agg(sum(when(col("treated"), 1L).otherwise(0L)).as("nt"),
        sum(when(!col("treated"), 1L).otherwise(0L)).as("nc"),
        sum(when(col("treated"), col("conv")).otherwise(0L)).as("ct"),
        sum(when(!col("treated"), col("conv")).otherwise(0L)).as("cc"))
    val wc = Window.orderBy(col("decile"))
    d.withColumn("cnt", sum(col("nt")).over(wc))
      .withColumn("cnc", sum(col("nc")).over(wc))
      .withColumn("cct", sum(col("ct")).over(wc))
      .withColumn("ccc", sum(col("cc")).over(wc))
      .select(col("decile"), col("nt"), col("nc"), col("ct"), col("cc"),
        when(col("cnc") > 0L,
          dd(col("cct")) - dd(col("ccc")) * dd(col("cnt")) / dd(col("cnc")))
          .as("qini"),
        when(col("cnc") > 0L && col("cnt") > 0L,
          dd(col("cct")) / dd(col("cnt")) - dd(col("ccc")) / dd(col("cnc")))
          .as("cum_uplift"))
      .orderBy("decile")
  }

  private val qiniUpliftOracle = """WITH pu AS (
  SELECT user_id,
    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS score,
    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS conv,
    (strpos('0123456789abcdef',
      substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) < 8 AS treated
  FROM events GROUP BY user_id
), r AS (
  SELECT *,
    CAST(ROW_NUMBER() OVER (ORDER BY score DESC, user_id) AS BIGINT) AS i,
    COUNT(*) OVER () AS n
  FROM pu
), d AS (
  SELECT (i * 10 + n - 1) // n AS decile,
    CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT) AS nt,
    CAST(SUM(CASE WHEN NOT treated THEN 1 ELSE 0 END) AS BIGINT) AS nc,
    CAST(SUM(CASE WHEN treated THEN conv ELSE 0 END) AS BIGINT) AS ct,
    CAST(SUM(CASE WHEN NOT treated THEN conv ELSE 0 END) AS BIGINT) AS cc
  FROM r GROUP BY 1
), c AS (
  SELECT decile, nt, nc, ct, cc,
    SUM(nt) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS cnt,
    SUM(nc) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS cnc,
    SUM(ct) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS cct,
    SUM(cc) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS ccc
  FROM d
)
SELECT decile, nt, nc, ct, cc,
  CASE WHEN cnc > 0 THEN
    CAST(cct AS DOUBLE) - CAST(ccc AS DOUBLE) * CAST(cnt AS DOUBLE)
      / CAST(cnc AS DOUBLE) END AS qini,
  CASE WHEN cnc > 0 AND cnt > 0 THEN
    CAST(cct AS DOUBLE) / CAST(cnt AS DOUBLE)
      - CAST(ccc AS DOUBLE) / CAST(cnc AS DOUBLE) END AS cum_uplift
FROM c ORDER BY decile"""

  // --- activity-segment migration matrix --------------------------------
  /** Activity-segment migration between the replay's first and second
    * fortnight: users classed heavy (≥36 events), light (28–35), low
    * (<28) in each half (cuts at the replay's quartile shoulders so
    * all three classes are LIVE at every SF), and the
    * (before → after) transition matrix with
    * user counts and shares — the cohort-movement layer behind
    * retention dashboards (q_rfm is the point-in-time segmentation;
    * this is how users MOVE between its cells). Fixed thresholds keep
    * the classes exact; the split point is min(ts)+15d, broadcast.
    */
  private def rfmMigration(s: SparkSession, dir: String): DataFrame = {
    def dd(c: Column) = c.cast("double")
    val e = Tables.events(s, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"))
    val t0 = e.agg(min(col("ms")).as("m0"))
    val perUser = e.crossJoin(broadcast(t0))
      .groupBy(col("user_id"))
      .agg(sum(when(col("ms") < col("m0") + lit(1296000000L), 1L)
          .otherwise(0L)).as("n1"),
        sum(when(col("ms") >= col("m0") + lit(1296000000L), 1L)
          .otherwise(0L)).as("n2"))
    def seg(c: Column) = when(c >= 36L, "heavy").when(c >= 28L, "light")
      .otherwise("low")
    val tot = perUser.agg(count(lit(1)).as("n_users"))
    perUser
      .select(seg(col("n1")).as("seg_before"), seg(col("n2")).as("seg_after"))
      .groupBy(col("seg_before"), col("seg_after"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot))
      .select(col("seg_before"), col("seg_after"), col("n"),
        (dd(col("n")) / dd(col("n_users"))).as("share"))
      .orderBy("seg_before", "seg_after")
  }

  private val rfmMigrationOracle = """WITH e AS (
  SELECT user_id, epoch_ms(ts) AS ms FROM events
), t0 AS (SELECT MIN(ms) AS m0 FROM e),
pu AS (
  SELECT user_id,
    CAST(SUM(CASE WHEN ms < m0 + 1296000000 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(SUM(CASE WHEN ms >= m0 + 1296000000 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM e, t0 GROUP BY user_id
), seg AS (
  SELECT
    CASE WHEN n1 >= 36 THEN 'heavy' WHEN n1 >= 28 THEN 'light'
      ELSE 'low' END AS seg_before,
    CASE WHEN n2 >= 36 THEN 'heavy' WHEN n2 >= 28 THEN 'light'
      ELSE 'low' END AS seg_after
  FROM pu
), tot AS (SELECT COUNT(*) AS n_users FROM pu)
SELECT seg_before, seg_after, COUNT(*) AS n,
  CAST(COUNT(*) AS DOUBLE) / CAST(n_users AS DOUBLE) AS share
FROM seg, tot GROUP BY 1, 2, n_users
ORDER BY seg_before, seg_after"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("ev_rfm_migration", rfmMigration, Some(rfmMigrationOracle)),
    QueryDef("ev_qini_uplift", qiniUplift, Some(qiniUpliftOracle)),
    QueryDef("ev_dwell_time", dwellTime, Some(dwellTimeOracle)),
    QueryDef("ev_lead_lag_corr", leadLagCorr, Some(leadLagCorrOracle)),
    QueryDef("ev_sax_motifs", saxMotifs, Some(saxMotifsOracle)),
    QueryDef("ev_seasonal_strength", seasonalStrength, Some(seasonalStrengthOracle)),
    QueryDef("ev_acf", acf, Some(acfOracle)),
    QueryDef("ev_pacf", pacf, Some(pacfOracle)),
    QueryDef("ev_croston", croston, Some(crostonOracle)),
    QueryDef("ev_kalman", kalman, Some(kalmanOracle)),
    QueryDef("ev_page_hinkley", pageHinkley, Some(pageHinkleyOracle)),
    QueryDef("ev_ltv_discounted", ltvDiscounted, Some(ltvDiscountedOracle)),
    QueryDef("ev_retention_halflife", retentionHalflife,
      Some(retentionHalflifeOracle)),
    QueryDef("ev_causal_impact", causalImpact, Some(causalImpactOracle)),
    QueryDef("ev_peak_to_mean", peakToMean, Some(peakToMeanOracle)),
    QueryDef("ev_growth_accounting", growthAccounting,
      Some(growthAccountingOracle)),
    QueryDef("ev_rolling_median_mad", rollingMedianMad,
      Some(rollingMedianMadOracle)),
    QueryDef("ev_hurst_avm", hurstAvm, Some(hurstAvmOracle)),
    QueryDef("ev_hill_tail", hillTail, Some(hillTailOracle)),
    QueryDef("ev_weibull_fit", weibullFit, Some(weibullFitOracle)),
    QueryDef("ev_overdispersion", overdispersion, Some(overdispersionOracle)),
    QueryDef("ev_burstiness", burstiness, Some(burstinessOracle)),
    QueryDef("ev_shapley_attrib", shapleyAttrib, Some(shapleyAttribOracle)),
    QueryDef("ev_theil_sen", theilSen, Some(theilSenOracle)),
    QueryDef("ev_clamped_running", clampedRunning, Some(clampedRunningOracle)),
    QueryDef("ev_changepoint", changepoint, Some(changepointOracle)),
    QueryDef("ev_seasonal_decomp", seasonalDecomp, Some(seasonalDecompOracle)),
    QueryDef("ev_label_next_purchase", labelNextPurchase, Some(labelNextPurchaseOracle)),
    QueryDef("ev_forecast_backtest", forecastBacktest, Some(forecastBacktestOracle)),
    QueryDef("ev_cusum", cusum, Some(cusumOracle)),
    QueryDef("ev_peak_concurrency", peakConcurrency, Some(peakConcurrencyOracle)),
    QueryDef("ev_survival", survival, Some(survivalOracle)),
    QueryDef("ev_holt", holt, Some(holtOracle)),
    QueryDef("ev_attribution_linear", attributionLinear, Some(attributionLinearOracle)),
    QueryDef("ev_disorder", disorder, Some(disorderOracle)),
    QueryDef("ev_ewma", ewma, Some(ewmaOracle)),
    QueryDef("ev_cohort_revenue", cohortRevenue, Some(cohortRevenueOracle)),
    QueryDef("ev_attribution", attribution, Some(attributionOracle)),
    QueryDef("ev_dau_wau", dauWau, Some(dauWauOracle)),
    QueryDef("ev_audience_overlap", audienceOverlap, Some(audienceOverlapOracle)),
    QueryDef("ev_dow_profile", dowProfile, Some(dowProfileOracle)),
    QueryDef("ev_adoption_curve", adoptionCurve, Some(adoptionCurveOracle)),
    QueryDef("ev_bounce_rate", bounceRate, Some(bounceRateOracle)),
    QueryDef("ev_funnel_latency", funnelLatency, Some(funnelLatencyOracle)),
    QueryDef("ev_churn_labels", churnLabels, Some(churnLabelsOracle)),
    QueryDef("ev_activity_islands", activityIslands, Some(activityIslandsOracle)),
    QueryDef("ev_transition_matrix", transitionMatrix, Some(transitionMatrixOracle)),
    QueryDef("ev_session_paths", sessionPaths, Some(sessionPathsOracle)),
    QueryDef("ev_latest_by_key", latestByKey, Some(latestByKeyOracle)),
    QueryDef("ev_debounce", debounce, Some(debounceOracle)),
    QueryDef("ev_twap", twap, Some(twapOracle)),
    QueryDef("ev_scd2_lookup", scd2Lookup, Some(scd2LookupOracle)),
    QueryDef("ev_scd2_intervals", scd2, Some(scd2Oracle)),
    QueryDef("ev_retention", retention, Some(retentionOracle)),
    QueryDef("ev_funnel", funnel, Some(funnelOracle)),
    QueryDef("ev_hourly", hourly, Some(hourlyOracle)),
    QueryDef("ev_hopping", hopping, Some(hoppingOracle)),
    QueryDef("ev_props_extract", propsExtract, Some(propsOracle)),
    QueryDef("ev_sessionize", sessionize, Some(sessionizeOracle)),
    QueryDef("ev_pattern_match", patternMatch, Some(patternMatchOracle)),
    QueryDef("ev_rolling_1h", rolling, Some(rollingOracle)),
    QueryDef("ev_rolling_zscore", rollingZscore, Some(rollingZscoreOracle)),
    QueryDef("ev_rolling_zscore_chunked", rollingZscoreChunked, Some(rollingZscoreOracle)),
    QueryDef("ev_rolling_1h_chunked", rollingChunked, Some(rollingOracle)))
}
