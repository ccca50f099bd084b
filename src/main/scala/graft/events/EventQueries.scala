package graft.events

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, StructType, StructField, LongType, StringType}
import graft.sources.Tables

/** SURVEY.md §2B — the event-DB / time-series block, re-expressing the
  * reference's EVM event indexer (node/src/indexer_impl.rs: ABI-decoded
  * events into per-type indexed tables with TTL) and the rollup executor
  * (node/src/rollup_executor.rs:256 `process`: drain the mutation log into
  * size-bounded compressed batches, record RollupRecord stats).
  */
/** Planted key material for the signed-mutation fixture: sender i uses
  * private scalar i+1, whose addresses are publicly derivable constants.
  * Computed once per JVM from the curve itself, so the Spark side, the
  * oracle SQL and the specs can never drift apart. */
object VerifySigFixture {
  lazy val plantedAddresses: Seq[String] =
    (1 to 10).map(i => graft.functions.crypto.Secp256k1.privToAddress(BigInt(i)))
}

object EventQueries {

  private val D = DecimalType(18, 2)

  /** Time-range scan. Filters on the RAW on-disk ts so the bounds reach
    * the parquet scan as pushed filters of the raw column's own type
    * (row-group pruning at 100 TB); the session-UTC timestamp is
    * materialized only for surviving rows. Branches on the raw dtype
    * like `Tables.events`: epoch-nano long bounds for the legacy
    * nanos-long vintage, NTZ literals for the current files — so both
    * corpora stay readable AND pushed. */
  def evtTimeRange(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.eventsRaw(spark, dir)
    raw.schema("ts").dataType match {
      case LongType =>
        val lo = lit(1704672000000000000L) // 2024-01-08 00:00:00 UTC, nanos
        val hi = lit(1705276800000000000L) // 2024-01-15 00:00:00 UTC, nanos
        raw.filter(col("ts") >= lo && col("ts") < hi)
          .select(col("event_id"),
            timestamp_micros(expr("ts div 1000")).as("ts"),
            col("event_type"), col("value"))
      case _ =>
        val lo = lit("2024-01-08 00:00:00").cast("timestamp_ntz")
        val hi = lit("2024-01-15 00:00:00").cast("timestamp_ntz")
        raw.filter(col("ts") >= lo && col("ts") < hi)
          .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
            col("event_type"), col("value"))
    }
  }

  val evtTimeRangeSql: String =
    """SELECT event_id, ts, event_type, value FROM events
      |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'""".stripMargin

  /** ABI decode: one `from_json` parse per row into the declared typed
    * schema (the Spark analog of decoding an EVM log against its JSON ABI),
    * not N repeated get_json_object calls. */
  def evtDecodeAbi(spark: SparkSession, dir: String): DataFrame = {
    // STRING wire schema, LONG surface: the reference indexer renders
    // every int width as a quoted decimal string (param_to_value), and a
    // LongType parse field would null the whole struct on that form —
    // parse as string (accepts bare numbers too: Jackson hands back the
    // raw token text) and cast after, like AbiDecode.wireOf
    val abiSchema = StructType(Seq(StructField("k", StringType)))
    Tables.events(spark, dir)
      // presence check on the raw JSON path, BEFORE the parse: filtering
      // on decoded.k would be alias-inlined into the pushed Filter by
      // PushDownPredicates and the struct parse would run twice per row;
      // this is also exactly the oracle's json_extract_string IS NOT NULL
      .filter(get_json_object(col("props"), "$.k").isNotNull)
      .withColumn("decoded", from_json(col("props"), abiSchema))
      .select(col("event_id"), col("event_type"),
        col("decoded.k").cast("long").as("k"))
  }

  val evtDecodeAbiSql: String =
    """SELECT event_id, event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL""".stripMargin

  /** ABI fixture for the synthetic event log: every testdata event type
    * declared as a contract event over the shared `k` prop, with mixed
    * widths so the decode exercises each type-mapping branch (narrow
    * uint/int → LONG, uint256 → decimal string, string → string) and
    * mixed indexed flags. The shape mirrors the WETH ABI the reference's
    * own test pins (event_processor.rs:244). */
  val testdataAbi: String =
    """[
      |{"anonymous":false,"type":"event","name":"signup",
      | "inputs":[{"indexed":true,"name":"k","type":"uint32"}]},
      |{"anonymous":false,"type":"event","name":"click",
      | "inputs":[{"indexed":false,"name":"k","type":"uint48"}]},
      |{"anonymous":false,"type":"event","name":"view",
      | "inputs":[{"indexed":true,"name":"k","type":"uint256"}]},
      |{"anonymous":false,"type":"event","name":"error",
      | "inputs":[{"indexed":false,"name":"k","type":"int64"}]},
      |{"anonymous":false,"type":"event","name":"purchase",
      | "inputs":[{"indexed":false,"name":"k","type":"string"}]}
      |]""".stripMargin

  /** Full multi-event ABI decode (event_processor.rs:98-206 log_to_doc /
    * param_to_value; indexer_impl.rs:197 one table per event type): the
    * driver-checked long-format view — one row per (log, declared param)
    * with the reference's JSON string rendering and the indexed flag.
    * Single scan; each row parsed once by its own event's schema. The
    * per-type typed tables come from `AbiDecode.decode` (spec-checked
    * with the WETH-style fixture). */
  def evtDecodeAbiMulti(spark: SparkSession, dir: String): DataFrame =
    AbiDecode.decodeLong(Tables.events(spark, dir),
      AbiDecode.parseAbi(testdataAbi))

  val evtDecodeAbiMultiSql: String =
    """SELECT event_id, event_type AS decoded_type, 'k' AS param,
      |  json_extract_string(props, '$.k') AS value_str,
      |  CAST(CASE WHEN event_type IN ('signup','view') THEN 1 ELSE 0 END AS BIGINT) AS indexed
      |FROM events""".stripMargin

  /** Tumbling-window aggregation: hourly per event type. One shuffle on
    * (bucket, type); partial agg map-side. */
  def evtWindowAgg(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(D)).cast("double").as("sum_value"))
  }

  val evtWindowAggSql: String =
    """SELECT date_trunc('hour', ts) AS bucket, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Top-k heavy hitters by key (deterministic tiebreak on user_id). */
  def evtTopk(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(D)).cast("double").as("total_value"))
      .orderBy(col("n_events").desc, col("user_id").asc)
      .limit(10)
  }

  val evtTopkSql: String =
    """SELECT user_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY user_id ORDER BY n_events DESC, user_id ASC LIMIT 10""".stripMargin

  /** Approximate top-k senders per event type through the mergeable
    * Misra-Gries `HeavyHitters` aggregate: per-partition partial state
    * is ≤ `capacity` counters per group — independent of stream length
    * and key cardinality, unlike the exact `evt_topk` whose partial agg
    * state grows with distinct keys. At 100 TB the exact query's
    * per-type (type, user) pre-aggregate is itself a full shuffle of
    * every distinct pair; the sketch answers from one pass of bounded
    * memory with error ≤ n/(capacity+1). Capacity 4096 exceeds this
    * corpus's distinct senders, so no decrement fires and the result is
    * EXACT — the oracle is plain GROUP BY + row_number; the plan is the
    * one that survives the scale-up. */
  def evtApproxTopk(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(graft.functions.GraftFunctions
        .heavy_hitters(col("user_id"), 4096, 10).as("hh"))
      .select(col("event_type"), posexplode(col("hh")).as(Seq("r0", "e")))
      .select(col("event_type"), (col("r0") + 1).cast("long").as("rank"),
        col("e.key").as("user_id"), col("e.cnt").as("cnt"))

  val evtApproxTopkSql: String =
    """SELECT event_type, CAST(rank AS BIGINT) AS rank, user_id, cnt FROM (
      |  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS cnt,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY COUNT(*) DESC, user_id) AS rank
      |  FROM events GROUP BY event_type, user_id) t
      |WHERE rank <= 10""".stripMargin

  /** Latest event per (key, type) — the per-event-table "current row"
    * view. row_number over one shuffle, never groupBy-max + self-join. */
  def evtLatestPerKey(spark: SparkSession, dir: String): DataFrame = {
    // argmax AGGREGATION, not a row_number window: max_by gets partial
    // aggregation, so a hot (user, type) key collapses to one row per
    // map partition before the shuffle instead of sorting its whole
    // history in a single window task (same skew rationale as
    // doc_state_latest; event_id is the unique tiebreak)
    Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(max_by(struct(col("value"), col("ts")),
        struct(col("ts"), col("event_id"))).as("m"))
      .select(col("user_id"), col("event_type"),
        col("m.value").as("last_value"), col("m.ts").as("last_ts"))
  }

  val evtLatestPerKeySql: String =
    """SELECT user_id, event_type, value AS last_value, ts AS last_ts FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t WHERE rn = 1""".stripMargin

  /** Gap-based sessionization (30-min idle gap). Session id = running
    * count of gap-breaks per user; all epoch-microsecond integer math so
    * the oracle hash is exact. Shuffles once on user_id. */
  def evtSessionize(spark: SparkSession, dir: String): DataFrame =
    sessionizeDirect(Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts"))), SessionGapUs)

  private val SessionGapUs = 30L * 60 * 1000 * 1000
  private val SessionBucketUs = 6L * 3600 * 1000 * 1000

  /** Core direct sessionize over (user_id, ts_us, event_id) rows —
    * factored out so SessionizeFuzzSpec can feed adversarial streams. */
  private[events] def sessionizeDirect(ev: DataFrame, gapUs: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    ev
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        (max(col("ts_us")) - min(col("ts_us"))).as("dur_us"))
  }

  /** Skew-resilient sessionize: identical output to `evtSessionize`
    * (same oracle SQL), different shape for hot users. The direct form
    * sorts a user's ENTIRE history in one window task — a bot user
    * emitting half the corpus serializes the stage. Two phases instead:
    *
    *  1. local sessionization inside (user, 6h-bucket) windows — the
    *     hot user's sort splits across buckets — aggregated to one
    *     summary row per local session (n, min_us, max_us);
    *  2. an order-preserving merge over the per-session SUMMARY rows:
    *     per user in (bucket, local session) order, a session starts a
    *     new global session iff its first event is > gap after the
    *     previous session's last event. That boundary pair is exactly
    *     the inter-event gap the direct form tests (within a bucket the
    *     local split already proved gap > threshold), so the running
    *     count reproduces the direct numbering 1:1. Sessions spanning
    *     buckets re-merge; chains spanning many buckets merge
    *     transitively through the running sum.
    *
    * The phase-2 window is over session summaries, not events — for the
    * dense/bursty hot keys that cause event skew, sessions ≪ events
    * (a user whose every event is > gap apart degenerates back to
    * per-event rows, but such a user has no dense hot partition in
    * phase 1 either). Requires bucket > gap so empty buckets imply a
    * session break — 6h vs 30min. */
  def evtSessionizeBuckets(spark: SparkSession, dir: String): DataFrame =
    sessionizeBuckets(Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts"))),
      SessionGapUs, SessionBucketUs)

  /** Dispatched sessionize: `SkewDispatch` probes the user_id histogram
    * (one Misra-Gries pass) and picks the direct form on uniform keys —
    * where the bucketed twin's two-phase machinery costs ~2× — or the
    * bucketed form when a hot user would overfill one window task. Same
    * output contract and oracle as both twins: the engine-grade
    * behavior at 100 TB, where the key histogram isn't known a priori
    * and the caller shouldn't have to choose. */
  def evtSessionizeAuto(spark: SparkSession, dir: String): DataFrame =
    if (graft.operators.SkewDispatch.decide(
        Tables.events(spark, dir), col("user_id"),
        minHotRows = graft.operators.SkewDispatch.SessionizeMinHotRows))
      evtSessionizeBuckets(spark, dir)
    else evtSessionize(spark, dir)

  /** Core two-phase sessionize over (user_id, ts_us, event_id) rows.
    * Requires bucketUs > gapUs (empty bucket ⇒ session break). */
  private[events] def sessionizeBuckets(ev: DataFrame, gapUs: Long,
      bucketUs: Long): DataFrame = {
    require(bucketUs > gapUs, s"bucket ($bucketUs) must exceed gap ($gapUs)")
    val local = Window.partitionBy(col("user_id"), col("bucket"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val sessions = ev
      .withColumn("bucket", expr(s"ts_us div $bucketUs"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(local))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("lsid", sum(col("is_new")).over(
        local.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("bucket"), col("lsid"))
      .agg(count(lit(1)).as("n"),
        min(col("ts_us")).as("min_us"), max(col("ts_us")).as("max_us"))
    val byUserSessions = Window.partitionBy(col("user_id"))
      .orderBy(col("bucket").asc, col("lsid").asc)
    sessions
      .withColumn("prev_max_us", lag(col("max_us"), 1).over(byUserSessions))
      .withColumn("starts_session",
        when(col("prev_max_us").isNull ||
          col("min_us") - col("prev_max_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("starts_session")).over(
        byUserSessions.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(sum(col("n")).as("n_events"),
        min(col("min_us")).as("start_us"),
        (max(col("max_us")) - min(col("min_us"))).as("dur_us"))
  }

  val evtSessionizeSql: String =
    """WITH g AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us,
      |    CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      |s AS (
      |  SELECT user_id, ts_us,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us ASC ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM g)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
      |  MIN(ts_us) AS start_us, MAX(ts_us) - MIN(ts_us) AS dur_us
      |FROM s GROUP BY user_id, session_id""".stripMargin

  /** Sliding-window rate-limit audit — the abuse/quota check an event
    * indexer runs over its write stream (the reference's storage node
    * gates writes per sender; this is the analytical view of who would
    * have tripped a per-key quota): for each event, the count of the
    * same user's events in the trailing hour (RANGE frame over epoch-µs,
    * so same-microsecond bursts are counted as peers identically in both
    * engines), emitting only the violations. One shuffle on user_id; the
    * frame is integer math end to end. A hot user concentrates in one
    * window task — same hazard class as the direct sessionize, and the
    * same bucket-summary mitigation applies if a corpus needs it. */
  def evtRateLimit(spark: SparkSession, dir: String): DataFrame =
    rateLimitDirect(Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us")),
      2L, 3600L * 1000 * 1000)

  /** Core direct rate limit over (event_id, user_id, ts_us) rows —
    * factored out so RateLimitFuzzSpec can feed adversarial streams. */
  private[events] def rateLimitDirect(ev: DataFrame, maxPerHour: Long,
      windowUs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-(windowUs - 1), 0)
    ev
      .withColumn("n_1h", count(lit(1)).over(w))
      .filter(col("n_1h") > maxPerHour)
  }

  val evtRateLimitSql: String =
    """SELECT event_id, user_id, ts_us, n_1h FROM (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |    CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      |      RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_1h
      |  FROM events) t
      |WHERE n_1h > 2""".stripMargin

  private val RateWindowUs = 3600L * 1000 * 1000
  private val RateBucketUs = 2L * 3600 * 1000 * 1000

  /** Skew-resilient rate-limit audit: identical output to `evtRateLimit`
    * (same oracle SQL), different shape for hot senders — and quota
    * violators are BY DEFINITION the hottest senders, so the direct
    * form's one-task-per-user window is the worst possible straggler
    * shape for exactly the corpora this audit matters on.
    *
    * The trailing window (1h) never exceeds the bucket (2h), so an
    * event's frame spans at most its own bucket and the previous one.
    * That makes a GHOST-REPLICATION split exact: each event lands in its
    * own (user, bucket) partition as a real row, and events in the LAST
    * windowUs of a bucket are replicated once into the next bucket as
    * ghost contributors (counted by neighbours' frames, never emitted).
    * One local RANGE window per (user, bucket) then sees every
    * contributor of every real row — n_1h is exactly the direct form's
    * full-history frame, but the hot user's sort is split into
    * 2h-bucket tasks (≤ rate·3h rows each) instead of one task holding
    * its entire history. Cost: ≤1.5× row replication (only last-hour
    * events ghost), one explode on a single scan, same single shuffle.
    * Unlike sessionize's summary-merge, no second window is needed —
    * the frame never reaches past one bucket boundary. */
  def evtRateLimitBuckets(spark: SparkSession, dir: String): DataFrame =
    rateLimitBuckets(Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us")),
      2L, RateWindowUs, RateBucketUs)

  /** Core ghost-replicated rate limit over (event_id, user_id, ts_us)
    * rows — factored out so RateLimitFuzzSpec can feed adversarial
    * streams. Requires bucketUs ≥ windowUs (frame spans ≤ 2 buckets). */
  private[events] def rateLimitBuckets(ev: DataFrame, maxPerHour: Long,
      windowUs: Long, bucketUs: Long): DataFrame = {
    require(bucketUs >= windowUs,
      s"bucket ($bucketUs) must be at least the window ($windowUs)")
    val w = Window.partitionBy(col("user_id"), col("bucket"))
      .orderBy(col("ts_us")).rangeBetween(-(windowUs - 1), 0)
    ev
      // FLOOR division, not `div` (which truncates toward zero): a
      // pre-epoch timestamp would otherwise land in a mis-edged bucket
      // and its ghost-band test would use the wrong boundary, dropping
      // cross-bucket contributors — pmod is non-negative, so
      // (ts - pmod(ts, b)) / b is the true floor for any sign
      .withColumn("b0",
        expr(s"(ts_us - pmod(ts_us, ${bucketUs}L)) div ${bucketUs}L"))
      .withColumn("copies",
        when(col("ts_us") >= (col("b0") + 1L) * lit(bucketUs) - lit(windowUs - 1),
          array(struct(col("b0").as("bucket"), lit(true).as("is_real")),
            struct((col("b0") + 1L).as("bucket"), lit(false).as("is_real"))))
          .otherwise(array(struct(col("b0").as("bucket"), lit(true).as("is_real")))))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        explode(col("copies")).as("c"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("c.bucket").as("bucket"), col("c.is_real").as("is_real"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .filter(col("is_real") && col("n_1h") > maxPerHour)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("n_1h"))
  }

  /** Dispatched rate limit: probes the sender histogram (memoized
    * Misra-Gries pass, shared with the other event dispatches) and picks
    * the direct window on uniform corpora or the ghost-replicated split
    * when one sender would serialize a window task. Same output contract
    * and oracle as both twins. */
  def evtRateLimitAuto(spark: SparkSession, dir: String): DataFrame =
    if (graft.operators.SkewDispatch.decide(
        Tables.events(spark, dir), col("user_id"),
        minHotRows = graft.operators.SkewDispatch.RateLimitMinHotRows))
      evtRateLimitBuckets(spark, dir)
    else evtRateLimit(spark, dir)

  /** Event ⋈ dimension enrichment (broadcast the dim). */
  def evtJoinDims(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cust = Tables.customer(spark, dir)
    ev.join(broadcast(cust), ev("user_id") === cust("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(D)).cast("double").as("sum_value"))
  }

  val evtJoinDimsSql: String =
    """SELECT c_mktsegment, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment, event_type""".stripMargin

  /** TTL retention (EventDatabase.ttl): keep the trailing 7 days relative
    * to the stream head. The head is a 1-row broadcast, not a window over
    * a single global partition. */
  def evtTtlRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val head = ev.agg(max(col("ts")).as("max_ts"))
    ev.crossJoin(broadcast(head))
      .filter(col("ts") >= col("max_ts") - expr("INTERVAL 7 DAYS"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_retained"))
  }

  val evtTtlRetentionSql: String =
    """SELECT event_type, COUNT(*) AS n_retained FROM events
      |WHERE ts >= (SELECT MAX(ts) - INTERVAL 7 DAY FROM events)
      |GROUP BY event_type""".stripMargin

  /** Rollup batching (rollup_executor.rs `process`): assign log entries to
    * size-bounded batches — cumulative payload size within each day
    * partition (rollups never span days, which also keeps the running sum
    * parallel across days instead of one global sequential fold). */
  private def rollupAssigned(spark: SparkSession, dir: String): DataFrame = {
    val thresholdBytes = 4096L
    val byDay = Window.partitionBy(col("day"))
      .orderBy(col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("day", to_date(col("ts")))
      .withColumn("sz", length(col("props")).cast("long"))
      .withColumn("running", sum(col("sz")).over(byDay))
      .withColumn("batch_id", ((col("running") - col("sz")) / thresholdBytes).cast("long"))
  }

  def rollupBatches(spark: SparkSession, dir: String): DataFrame =
    rollupAssigned(spark, dir)
      .groupBy(col("day"), col("batch_id"))
      .agg(count(lit(1)).as("n_mutations"), sum(col("sz")).as("raw_size"))

  val rollupBatchesSql: String =
    """WITH a AS (
      |  SELECT CAST(ts AS DATE) AS day, event_id, CAST(length(props) AS BIGINT) AS sz,
      |    SUM(CAST(length(props) AS BIGINT)) OVER (PARTITION BY CAST(ts AS DATE) ORDER BY event_id ASC ROWS UNBOUNDED PRECEDING) AS running
      |  FROM events)
      |SELECT day, CAST(FLOOR((running - sz) / 4096.0) AS BIGINT) AS batch_id,
      |  COUNT(*) AS n_mutations, CAST(SUM(sz) AS BIGINT) AS raw_size
      |FROM a GROUP BY 1, 2""".stripMargin

  /** RollupRecord analog: per-batch start/end ids + counts + raw size
    * (rollup_executor.rs RollupRecord{start_block, end_block,
    * mutation_count, raw_data_size}). */
  def rollupStats(spark: SparkSession, dir: String): DataFrame =
    rollupAssigned(spark, dir)
      .groupBy(col("day"), col("batch_id"))
      .agg(min(col("event_id")).as("start_id"), max(col("event_id")).as("end_id"),
        count(lit(1)).as("mutation_count"), sum(col("sz")).as("raw_data_size"))

  val rollupStatsSql: String =
    """WITH a AS (
      |  SELECT CAST(ts AS DATE) AS day, event_id, CAST(length(props) AS BIGINT) AS sz,
      |    SUM(CAST(length(props) AS BIGINT)) OVER (PARTITION BY CAST(ts AS DATE) ORDER BY event_id ASC ROWS UNBOUNDED PRECEDING) AS running
      |  FROM events)
      |SELECT day, CAST(FLOOR((running - sz) / 4096.0) AS BIGINT) AS batch_id,
      |  MIN(event_id) AS start_id, MAX(event_id) AS end_id,
      |  COUNT(*) AS mutation_count, CAST(SUM(sz) AS BIGINT) AS raw_data_size
      |FROM a GROUP BY 1, 2""".stripMargin

  /** MutationHeader stats: per (day, action) log statistics. */
  def mutationLogStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"), col("event_type").as("action"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_senders"),
        sum(length(col("props")).cast("long")).as("payload_bytes"))

  val mutationLogStatsSql: String =
    """SELECT CAST(ts AS DATE) AS day, event_type AS action, COUNT(*) AS n,
      |  COUNT(DISTINCT user_id) AS n_senders,
      |  CAST(SUM(CAST(length(props) AS BIGINT)) AS BIGINT) AS payload_bytes
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Exact distinct users per event type through the custom bitmap
    * TypedImperativeAggregate (partial state = one bit per id — the
    * cheap-on-the-wire exact alternative to hash-set distinct for dense
    * id spaces). Oracle = plain COUNT(DISTINCT). */
  def evtBitmapDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(graft.functions.GraftFunctions.bitmap_distinct(col("user_id")).as("n_users"))

  val evtBitmapDistinctSql: String =
    "SELECT event_type, COUNT(DISTINCT user_id) AS n_users FROM events GROUP BY event_type"

  /** Funnel analysis — ordered-sequence matching over each user's event
    * stream: the stage reached walking signup → click → high-value
    * purchase (value >= 180 — the conversion event worth funneling on) in
    * event-time order. Relational min-chain form: stage k's earliest
    * qualifying (ts, id) key must strictly follow stage k-1's — three
    * per-user aggregations co-partitioned on user_id; no per-user event
    * array ever materializes, so the shape is immune to events-per-user
    * skew. (A list_reduce-based oracle is also out: DuckDB 1.0's parallel
    * ordered-list aggregation is nondeterministic.) */
  def evtFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("k", struct(unix_micros(col("ts")).as("t"), col("event_id").as("i")))
      .withColumn("c",
        when(col("event_type") === "signup", 1)
          .when(col("event_type") === "click", 2)
          .when(col("event_type") === "purchase" && col("value") >= 180.0, 3)
          .otherwise(0))
    val t1 = ev.filter(col("c") === 1)
      .groupBy(col("user_id")).agg(min(col("k")).as("k1"))
    val t2 = ev.filter(col("c") === 2).join(t1, Seq("user_id"))
      .filter(col("k") > col("k1"))
      .groupBy(col("user_id")).agg(min(col("k")).as("k2"))
    val t3 = ev.filter(col("c") === 3).join(t2, Seq("user_id"))
      .filter(col("k") > col("k2"))
      .groupBy(col("user_id")).agg(min(col("k")).as("k3"))
    ev.select(col("user_id")).distinct()
      .join(t1, Seq("user_id"), "left")
      .join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select(
        when(col("k3").isNotNull, 3L).when(col("k2").isNotNull, 2L)
          .when(col("k1").isNotNull, 1L).otherwise(0L).as("funnel_stage"))
      .groupBy(col("funnel_stage"))
      .agg(count(lit(1)).as("n_users"))
  }

  val evtFunnelSql: String =
    """WITH ev AS (
      |  SELECT user_id, ROW(epoch_us(ts), event_id) AS k,
      |    CASE WHEN event_type = 'signup' THEN 1
      |         WHEN event_type = 'click' THEN 2
      |         WHEN event_type = 'purchase' AND value >= 180.0 THEN 3
      |         ELSE 0 END AS c
      |  FROM events),
      |t1 AS (SELECT user_id, MIN(k) AS k1 FROM ev WHERE c = 1 GROUP BY user_id),
      |t2 AS (SELECT ev.user_id, MIN(k) AS k2 FROM ev JOIN t1 USING (user_id)
      |       WHERE c = 2 AND k > k1 GROUP BY ev.user_id),
      |t3 AS (SELECT ev.user_id, MIN(k) AS k3 FROM ev JOIN t2 USING (user_id)
      |       WHERE c = 3 AND k > k2 GROUP BY ev.user_id),
      |users AS (SELECT DISTINCT user_id FROM ev)
      |SELECT CAST(CASE WHEN k3 IS NOT NULL THEN 3 WHEN k2 IS NOT NULL THEN 2
      |            WHEN k1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS funnel_stage,
      |  COUNT(*) AS n_users
      |FROM users LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
      |  LEFT JOIN t3 USING (user_id)
      |GROUP BY 1""".stripMargin

  /** Gap-fill with last-observation-carried-forward — the tsdb staple
    * for irregular streams: every user gets a dense hourly grid between
    * their first and last observation, empty hours filled from the most
    * recent prior hour. Grid generation is per-user `sequence`+explode
    * (no global calendar join); the fill is one ignore-nulls window over
    * the user's own partition — shuffles once on user_id. */
  def evtGapfill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val hourly = ev
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(max_by(col("value"), struct(col("ts"), col("event_id"))).as("v"))
    val grid = hourly.groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "h"), "left")
      .withColumn("filled", last(col("v"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("h"), col("filled"))
  }

  val evtGapfillSql: String =
    """WITH hourly AS (
      |  SELECT user_id, h, v FROM (
      |    SELECT user_id, date_trunc('hour', ts) AS h, value AS v,
      |      ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
      |        ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events) t WHERE rn = 1),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(MIN(h), MAX(h), INTERVAL 1 HOUR)) AS h
      |  FROM hourly GROUP BY user_id)
      |SELECT g.user_id, g.h,
      |  LAST_VALUE(v IGNORE NULLS) OVER (
      |    PARTITION BY g.user_id ORDER BY g.h ROWS UNBOUNDED PRECEDING) AS filled
      |FROM grid g LEFT JOIN hourly USING (user_id, h)""".stripMargin

  /** Mergeable-sketch rollup — the pre-aggregation pattern that makes
    * distinct counts tractable at 100 TB: per-(day, type) HLL sketches
    * (DataSketches, via hll_sketch_agg) are built once and UNIONED per
    * type, so re-aggregating a year of daily partitions touches sketch
    * bytes, not raw user ids. Rows-only (estimates aren't reproducible in
    * the oracle); accuracy spec-checked against exact distinct. */
  def evtSketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
  }

  /** Log-integrity verification (the storage node's per-sender nonce
    * monotonicity check, storage/src/state_store.rs): count order
    * violations — event ids that regress within a sender's time-ordered
    * stream. */
  def mutationIntegrity(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("prev_id", lag(col("event_id"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_mutations"),
        sum(when(col("prev_id").isNotNull && col("event_id") < col("prev_id"), 1L)
          .otherwise(0L)).as("n_violations"))
  }

  val mutationIntegritySql: String =
    """SELECT user_id, COUNT(*) AS n_mutations,
      |  CAST(SUM(CASE WHEN prev_id IS NOT NULL AND event_id < prev_id THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
      |FROM (
      |  SELECT user_id, event_id,
      |    LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_id
      |  FROM events) t
      |GROUP BY user_id""".stripMargin

  /** Ownership verification analog (node/src/mutation_utils.rs recovers
    * each mutation's sender from its signature; db_store_v2.rs:819
    * verify_docs_ownership rejects mutations to docs the sender does not
    * own). Without crypto in scope, the consistency check: a doc key
    * (props.k) is owned by the sender of its earliest mutation; any later
    * mutation from a different sender counts as a foreign write.
    *
    * Skew-immune shape: NO per-key window sort (a hot doc key — one
    * contract = 10% of the log — cannot be split by AQE inside a window).
    * Instead two map-side-combinable aggregations: (k, user_id) partials
    * split a hot k across senders in stage 1; stage 2 works on those tiny
    * per-sender rows, picks owner = min_by(user_id, earliest touch), and
    * gets the owner's own write count from the SAME min_by — so
    * n_foreign = total − owner's count with no join back at all.
    * (ts, event_id) is unique per event, so min_by is deterministic.
    * Assumes user_id is non-null (true of the event log schema): a null
    * sender would group separately here but count 0 in the oracle's
    * `user_id <> owner` — coalesce user_id upstream if a source ever
    * allows null senders. */
  def mutationOwnership(spark: SparkSession, dir: String): DataFrame = {
    val perSender = Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("k"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        min(struct(col("ts"), col("event_id"))).as("first_touch"))
    perSender.groupBy(col("k"))
      .agg(min_by(col("user_id"), col("first_touch")).as("owner"),
        sum(col("n")).as("n_mutations"),
        (sum(col("n")) - min_by(col("n"), col("first_touch"))).as("n_foreign"))
  }

  val mutationOwnershipSql: String =
    """WITH o AS (
      |  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, user_id,
      |    FIRST_VALUE(user_id) OVER (
      |      PARTITION BY CAST(json_extract_string(props, '$.k') AS BIGINT)
      |      ORDER BY ts ASC, event_id ASC) AS owner
      |  FROM events)
      |SELECT k, MAX(owner) AS owner, COUNT(*) AS n_mutations,
      |  CAST(SUM(CASE WHEN user_id <> owner THEN 1 ELSE 0 END) AS BIGINT) AS n_foreign
      |FROM o GROUP BY k""".stripMargin

  /** Time-weighted average value per key — the tsdb staple for irregular
    * samples: each value weighted by its holding interval. Numerator and
    * denominator are exact (decimal × integer microseconds); the ratio is
    * one IEEE division of exact operands. */
  def evtTimeWeightedAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("next_us", lead(col("ts_us"), 1).over(w))
      .filter(col("next_us").isNotNull)
      .withColumn("dur_us", col("next_us") - col("ts_us"))
      .groupBy(col("user_id"))
      .agg(
        sum(col("value").cast(D) * col("dur_us").cast(DecimalType(18, 0))).as("wsum"),
        sum(col("dur_us")).as("total_us"))
      // the exact numerator has ~17 significant digits — more than a
      // double carries — so only the rounded ratio is emitted (the raw
      // decimal→double cast is 1-ulp engine-dependent at that width)
      .select(col("user_id"), col("total_us"),
        round(col("wsum").cast("double") / col("total_us"), 6).as("twa"))
  }

  val evtTimeWeightedAvgSql: String =
    """SELECT user_id, total_us,
      |  round(CAST(wsum AS DOUBLE) / total_us, 6) AS twa
      |FROM (
      |  SELECT user_id,
      |    SUM(CAST(value AS DECIMAL(18,2)) * CAST(dur_us AS DECIMAL(18,0))) AS wsum,
      |    CAST(SUM(dur_us) AS BIGINT) AS total_us
      |  FROM (
      |    SELECT user_id, value,
      |      LEAD(epoch_us(ts)) OVER w - epoch_us(ts) AS dur_us
      |    FROM events
      |    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)) t
      |  WHERE dur_us IS NOT NULL
      |  GROUP BY user_id) g""".stripMargin

  /** Fixed-width value histogram per event type — the profile/monitoring
    * staple. One groupBy with full map-side combine; bucket ids are exact
    * (floor of one IEEE division), money sums in DECIMAL(18,2). At 100 TB
    * the result stays tiny: |types| × |buckets| rows out of one scan. */
  def evtHistogram(spark: SparkSession, dir: String): DataFrame = {
    val width = 25.0
    Tables.events(spark, dir)
      .withColumn("bucket", floor(col("value") / width).cast("long"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n_events"), sum(col("value").cast(D)).as("sv"))
      .select(col("event_type"), col("bucket"),
        (col("bucket") * width).as("bucket_lo"),
        col("n_events"), col("sv").cast("double").as("sum_value"))
  }

  val evtHistogramSql: String =
    """SELECT event_type, bucket, bucket * 25.0 AS bucket_lo,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM (SELECT event_type, value,
      |        CAST(floor(value / 25.0) AS BIGINT) AS bucket FROM events) t
      |GROUP BY event_type, bucket""".stripMargin

  /** Weekly retention cohorts: users grouped by first-activity week,
    * counted at each later activity-week offset. Week ids are exact
    * integer division of epoch microseconds (`unix_micros` here,
    * `epoch_us` in DuckDB — both exact BIGINT µs of the same instant).
    * Shape: one shuffle on user_id folds each user to (first week,
    * distinct weeks) — per-user state is bounded by the corpus timespan
    * in weeks, never event count — then one small re-aggregation on
    * (cohort, offset). */
  def evtRetentionCohort(spark: SparkSession, dir: String): DataFrame = {
    val usPerWeek = 604800000000L
    Tables.events(spark, dir)
      .select(col("user_id"), expr(s"unix_micros(ts) div $usPerWeek").as("wk"))
      .groupBy(col("user_id"))
      .agg(min(col("wk")).as("cohort_wk"), collect_set(col("wk")).as("wks"))
      .select(col("cohort_wk"), explode(col("wks")).as("wk"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("wk_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  val evtRetentionCohortSql: String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
      |c AS (
      |  SELECT user_id, wk, MIN(wk) OVER (PARTITION BY user_id) AS cohort_wk
      |  FROM uw)
      |SELECT cohort_wk, wk - cohort_wk AS wk_offset,
      |  CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM c GROUP BY 1, 2""".stripMargin

  /** Z-score anomaly flagging per event type. Moments are EXACT decimal
    * sums (sum, sum-of-squares) so the per-type stats are partition-order
    * independent; mean/var/z are then a fixed chain of IEEE ops written
    * identically in the oracle, rounded to 6dp. The 5-row stats table
    * broadcasts back onto the scan — one shuffle for the agg, none for
    * the join. */
  def evtAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val dv = col("value").cast(D)
    val stats = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dv).as("sv"), sum(dv * dv).as("sq"))
      .select(col("event_type"),
        (col("sv").cast("double") / col("n")).as("mean"),
        (col("sq").cast("double") / col("n") -
          (col("sv").cast("double") / col("n")) * (col("sv").cast("double") / col("n")))
          .as("variance"))
    Tables.events(spark, dir)
      .join(broadcast(stats), Seq("event_type"))
      .withColumn("z", round((col("value") - col("mean")) / sqrt(col("variance")), 6))
      .filter(abs(col("z")) > 3.0)
      .select(col("event_id"), col("event_type"), col("value"), col("z"))
  }

  val evtAnomalySql: String =
    """WITH s AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS sv,
      |    SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS sq
      |  FROM events GROUP BY 1),
      |st AS (
      |  SELECT event_type, CAST(sv AS DOUBLE) / n AS mean,
      |    CAST(sq AS DOUBLE) / n - (CAST(sv AS DOUBLE) / n) * (CAST(sv AS DOUBLE) / n) AS variance
      |  FROM s)
      |SELECT event_id, e.event_type, value,
      |  round((value - mean) / sqrt(variance), 6) AS z
      |FROM events e JOIN st ON e.event_type = st.event_type
      |WHERE abs(round((value - mean) / sqrt(variance), 6)) > 3.0""".stripMargin

  /** Most common 3-step event paths — the sequence-mining sibling of the
    * funnel: per-user lead chains over one window (single shuffle on
    * user_id), then a count per path string. Ordering ties break on
    * event_id, matching the oracle's µs timestamps. */
  def evtTopPaths(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("e1", lead(col("event_type"), 1).over(w))
      .withColumn("e2", lead(col("event_type"), 2).over(w))
      .filter(col("e2").isNotNull)
      .withColumn("path", concat_ws(">", col("event_type"), col("e1"), col("e2")))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("path").asc)
      .limit(20)
  }

  val evtTopPathsSql: String =
    """WITH p AS (
      |  SELECT event_type || '>' ||
      |    LEAD(event_type, 1) OVER w || '>' ||
      |    LEAD(event_type, 2) OVER w AS path,
      |    LEAD(event_type, 2) OVER w AS e2
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
      |SELECT path, COUNT(*) AS n_paths FROM p WHERE e2 IS NOT NULL
      |GROUP BY path ORDER BY n_paths DESC, path ASC LIMIT 20""".stripMargin

  /** OHLC downsampling bars per (event_type, hour) — the classic tsdb
    * resample (the reference serves time/block-ordered event scans;
    * indexer_impl.rs orders by block time). One shuffle: a single groupBy
    * with min_by/max_by picks open/close on the total order
    * (ts, event_id) while min/max/count/sum fold map-side — no window
    * sort, no second pass. min/max of doubles and the decimal volume sum
    * are order-independent, so the bars are hash-exact. */
  def evtOhlc(spark: SparkSession, dir: String): DataFrame = {
    val ord = struct(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bar_ts"))
      .agg(
        min_by(col("value"), ord).as("open"),
        max_by(col("value"), ord).as("close"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(D)).cast("double").as("volume"))
  }

  // open/close on the FULL (ts, event_id) total order — DuckDB's arg_min
  // can't take a composite key, so the oracle ranks with row_number over
  // the same order (ties on ts are real in burst corpora; event_id is
  // the deterministic tiebreak on both sides)
  val evtOhlcSql: String =
    """WITH e AS (SELECT event_type, date_trunc('hour', ts) AS bar_ts,
      |             value, ts, event_id FROM events),
      |o AS (SELECT event_type, bar_ts, value AS open FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, bar_ts
      |    ORDER BY ts ASC, event_id ASC) AS rn FROM e) t WHERE rn = 1),
      |c AS (SELECT event_type, bar_ts, value AS close FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, bar_ts
      |    ORDER BY ts DESC, event_id DESC) AS rn FROM e) t WHERE rn = 1),
      |a AS (SELECT event_type, bar_ts, max(value) AS high, min(value) AS low,
      |        CAST(COUNT(*) AS BIGINT) AS n_events,
      |        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume
      |      FROM e GROUP BY 1, 2)
      |SELECT a.event_type, a.bar_ts, o.open, c.close, a.high, a.low,
      |  a.n_events, a.volume
      |FROM a JOIN o USING (event_type, bar_ts) JOIN c USING (event_type, bar_ts)""".stripMargin

  /** Moving-average CROSSOVER signals (golden/death cross) — the
    * classic time-series alerting primitive over the event stream,
    * computed the way it scales: the corpus first collapses to hourly
    * close bars (ONE groupBy shuffle, `evt_ohlc`'s argmax close on the
    * (ts, event_id) total order), and the short/long SMAs run as
    * row-frame windows OVER BARS — window input cardinality is
    * types × hours, never events, so a 100 TB tick stream still sorts
    * only its bar table. Cross-engine exactness: closes cast to
    * DECIMAL(18,2), SMA comparison done by width-controlled decimal
    * cross-multiplication (s_sum·l_n vs l_sum·s_n — no float division
    * decides a signal), crossings detected on the sign chain via lag.
    * The reported MA values are one IEEE division each (deterministic). */
  def evtSmaCross(spark: SparkSession, dir: String): DataFrame = {
    val n2 = DecimalType(2, 0)
    val ord = struct(col("ts"), col("event_id"))
    val bars = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bar_ts"))
      .agg(max_by(col("value"), ord).cast(D).as("close"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bar_ts").asc)
    val ws = w.rowsBetween(-4, 0)
    val wl = w.rowsBetween(-19, 0)
    val d = sum(col("close")).over(ws).cast(D) * count(lit(1)).over(wl).cast(n2) -
      sum(col("close")).over(wl).cast(D) * count(lit(1)).over(ws).cast(n2)
    val scored = bars
      .withColumn("s_ma", sum(col("close")).over(ws).cast("double") /
        count(lit(1)).over(ws))
      .withColumn("l_ma", sum(col("close")).over(wl).cast("double") /
        count(lit(1)).over(wl))
      .withColumn("cmp",
        when(d > 0, 1L).when(d < 0, -1L).otherwise(0L))
      .withColumn("prev_cmp", lag(col("cmp"), 1).over(w))
    scored
      .filter(col("prev_cmp").isNotNull &&
        ((col("cmp") === 1L && col("prev_cmp") <= 0L) ||
          (col("cmp") === -1L && col("prev_cmp") >= 0L)))
      .select(col("event_type"), col("bar_ts"),
        col("s_ma").as("short_ma"), col("l_ma").as("long_ma"),
        when(col("cmp") === 1L, lit("golden")).otherwise(lit("death"))
          .as("direction"))
  }

  val evtSmaCrossSql: String =
    """WITH c AS (
      |  SELECT event_type, bar_ts, CAST(value AS DECIMAL(18,2)) AS close FROM (
      |    SELECT event_type, date_trunc('hour', ts) AS bar_ts, value,
      |      ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
      |        ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events) t WHERE rn = 1),
      |m AS (
      |  SELECT event_type, bar_ts,
      |    CAST(SUM(close) OVER ws AS DECIMAL(18,2)) AS s_sum,
      |    CAST(COUNT(*) OVER ws AS DECIMAL(2,0)) AS s_n,
      |    CAST(SUM(close) OVER wl AS DECIMAL(18,2)) AS l_sum,
      |    CAST(COUNT(*) OVER wl AS DECIMAL(2,0)) AS l_n
      |  FROM c
      |  WINDOW ws AS (PARTITION BY event_type ORDER BY bar_ts
      |           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
      |         wl AS (PARTITION BY event_type ORDER BY bar_ts
      |           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
      |x AS (
      |  SELECT *, CASE WHEN s_sum * l_n - l_sum * s_n > 0 THEN 1
      |                 WHEN s_sum * l_n - l_sum * s_n < 0 THEN -1
      |                 ELSE 0 END AS cmp
      |  FROM m),
      |y AS (
      |  SELECT *, LAG(cmp) OVER (PARTITION BY event_type ORDER BY bar_ts) AS prev_cmp
      |  FROM x)
      |SELECT event_type, bar_ts,
      |  CAST(s_sum AS DOUBLE) / CAST(s_n AS BIGINT) AS short_ma,
      |  CAST(l_sum AS DOUBLE) / CAST(l_n AS BIGINT) AS long_ma,
      |  CASE WHEN cmp = 1 THEN 'golden' ELSE 'death' END AS direction
      |FROM y
      |WHERE prev_cmp IS NOT NULL
      |  AND ((cmp = 1 AND prev_cmp <= 0) OR (cmp = -1 AND prev_cmp >= 0))""".stripMargin

  /** Sliding (hopping) window aggregates: 1-hour windows every 15
    * minutes — each event lands in 4 overlapping windows. Spark's
    * `window(ts, dur, slide)` expands rows to their covering windows
    * BEFORE the partial aggregation, so the exchange carries per-window
    * partials (4× window count), never 4× the events. The oracle makes
    * the same expansion explicit with a 4-offset cross join. */
  def evtSlidingWindow(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(col("event_type"), window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(D)).cast("double").as("sum_value"))
      .select(col("event_type"), col("window.start").as("w_start"),
        col("n"), col("sum_value"))
  }

  val evtSlidingWindowSql: String =
    """WITH off AS (SELECT unnest([0, 900, 1800, 2700]) AS o),
      |e AS (SELECT event_type, value,
      |        epoch_us(ts) - epoch_us(ts) % 900000000 AS base_us
      |      FROM events)
      |SELECT event_type,
      |  make_timestamp(base_us - CAST(o AS BIGINT) * 1000000) AS w_start,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM e CROSS JOIN off
      |GROUP BY 1, 2""".stripMargin

  /** Signed-mutation verification — the reference's core trust property
    * (node/src/mutation_utils.rs:75-127 `unwrap_and_light_verify`: every
    * write is an EIP-712 TypedData payload whose sender is RECOVERED from
    * the secp256k1 signature, never trusted from a field). Fixture: a
    * deterministic slice of the event log is wrapped in the SDK's exact
    * typed-data shape (sdk/src/provider/storage_provider_v2.ts
    * `wrapTypedRequest`: Message(bytes payload, string nonce), empty
    * domain) and signed executor-side with planted keys (sender i ↦
    * private scalar i+1); a deterministic subset is forged with the
    * wrong key. The query then recovers every sender with the
    * `recover_signer` kernel and counts valid vs forged per claimed
    * signer. Signing AND recovery are per-row codegen'd expressions —
    * no shuffle until the final 8-group aggregate, linear at 100 TB.
    *
    * The oracle replays the fixture arithmetic in SQL with the planted
    * addresses inlined (publicly derivable constants for keys 1..8) —
    * so a single wrong recovered address breaks the hash compare. */
  def mutationVerifySig(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions.{eip712_sign, recover_signer}
    val addrs = VerifySigFixture.plantedAddresses // keys 1..10
    val addrLit = array(addrs.map(lit): _*)
    val tdPrefix =
      """{"types":{"EIP712Domain":[],"Message":[{"name":"payload","type":"bytes"},{"name":"nonce","type":"string"}]},"domain":{},"primaryType":"Message","message":{"payload":"0x"""
    Tables.events(spark, dir)
      .filter(col("event_id") % 8 === 1)
      .withColumn("sender_idx", expr("(event_id % 64) div 8"))
      .withColumn("forged", col("event_id") % 13 === 0)
      .withColumn("signing_key",
        when(col("forged"), col("sender_idx") + 2).otherwise(col("sender_idx") + 1))
      .withColumn("typed_data", concat(
        lit(tdPrefix),
        lower(hex(encode(concat_ws("-", col("event_type"), col("event_id")), "UTF-8"))),
        lit("\",\"nonce\":\""), col("event_id").cast("string"), lit("\"}}")))
      .withColumn("sig", eip712_sign(col("typed_data"), col("signing_key")))
      .withColumn("recovered", recover_signer(col("typed_data"), col("sig")))
      .withColumn("claimed_signer", element_at(addrLit, col("sender_idx").cast("int") + 1))
      .groupBy(col("claimed_signer"))
      .agg(count(lit(1)).as("n_mutations"),
        sum(when(col("recovered") === col("claimed_signer"), 1L).otherwise(0L)).as("n_valid"),
        sum(when(col("forged"), 1L).otherwise(0L)).as("n_forged"))
  }

  val mutationVerifySigSql: String = {
    val values = VerifySigFixture.plantedAddresses.take(8).zipWithIndex
      .map { case (a, i) => s"($i, '$a')" }.mkString(",\n      |  ")
    s"""WITH f AS (
      |  SELECT event_id, (event_id % 64) // 8 AS sender_idx,
      |    CASE WHEN event_id % 13 = 0 THEN 1 ELSE 0 END AS forged
      |  FROM events WHERE event_id % 8 = 1),
      |a AS (SELECT * FROM (VALUES
      |  $values) AS t(sender_idx, claimed_signer))
      |SELECT a.claimed_signer, COUNT(*) AS n_mutations,
      |  CAST(SUM(1 - f.forged) AS BIGINT) AS n_valid,
      |  CAST(SUM(f.forged) AS BIGINT) AS n_forged
      |FROM f JOIN a ON f.sender_idx = a.sender_idx
      |GROUP BY a.claimed_signer""".stripMargin
  }

  /** One decoded per-event-type table from `AbiDecode.decode` — the
    * analog of reading the collection the reference indexer writes per
    * event (indexer_impl.rs:197). Driver-checks the per-type typed-table
    * surface (decodeLong's long view is checked separately): the `view`
    * event decodes its uint256 param to the reference's decimal-string
    * form. */
  def evtDecodeTypedTable(spark: SparkSession, dir: String): DataFrame =
    AbiDecode.decode(Tables.events(spark, dir),
      AbiDecode.parseAbi(testdataAbi), targetEvents = Set("view"))("view")
      .select(col("event_id"), col("k"))

  val evtDecodeTypedTableSql: String =
    """SELECT event_id, json_extract_string(props, '$.k') AS k
      |FROM events WHERE event_type = 'view'""".stripMargin

  /** Nonce-replay detection as a query (the relational twin of the API's
    * nonce cell): the reference storage node accepts a mutation only if
    * its nonce strictly exceeds the sender's stored nonce
    * (storage/src/state_store.rs `get_nonce`/`incr_nonce`;
    * db3_storage.proto GetNonce) — anything at-or-below the running max
    * is a replay and is rejected. Replayed over the log: per sender in
    * (ts, event_id) order, a mutation whose nonce (props.k) is <= the
    * max nonce seen before it would have been rejected. One window
    * shuffle on the sender key, then a map-side-combinable aggregate. */
  def mutationNonceReplay(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .withColumn("nonce", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("prev_max", max(col("nonce")).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_mutations"),
        sum(when(col("prev_max").isNotNull && col("nonce") <= col("prev_max"), 1L)
          .otherwise(0L)).as("n_rejected"))
  }

  val mutationNonceReplaySql: String =
    """SELECT user_id, COUNT(*) AS n_mutations,
      |  CAST(SUM(CASE WHEN prev_max IS NOT NULL AND nonce <= prev_max THEN 1 ELSE 0 END) AS BIGINT) AS n_rejected
      |FROM (
      |  SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS nonce,
      |    MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) OVER (
      |      PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      |  FROM events) t
      |GROUP BY user_id""".stripMargin

  /** Rolling distinct actives (DAU + trailing-7-day DAU per observed
    * day) — the stickiness metric pair every activity dashboard needs.
    * Shape for 100 TB: events first collapse to DISTINCT (day, user)
    * pairs — one shuffle, and the only pass over raw events — then each
    * pair explodes to the ≤ 7 observation days it contributes to (×7 on
    * the already-collapsed pairs, not on events) and a two-phase
    * distinct count folds per observation day. Day ids are exact integer
    * division of epoch microseconds, same convention as the retention
    * cohorts. */
  def evtRollingDau(spark: SparkSession, dir: String): DataFrame = {
    val usPerDay = 86400000000L
    val daily = Tables.events(spark, dir)
      .select(col("user_id"), expr(s"unix_micros(ts) div $usPerDay").as("day"))
      .distinct()
    val dau1 = daily.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val roll = daily
      .withColumn("obs_day", explode(sequence(col("day"), col("day") + 6)))
      .groupBy(col("obs_day"))
      .agg(countDistinct(col("user_id")).as("dau7"))
    dau1.join(roll, dau1("day") === roll("obs_day"))
      .select(col("day"), col("dau"), col("dau7"))
  }

  val evtRollingDauSql: String =
    """WITH daily AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
      |dau1 AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM daily GROUP BY day),
      |roll AS (
      |  SELECT d2.day, CAST(COUNT(DISTINCT d1.user_id) AS BIGINT) AS dau7
      |  FROM (SELECT DISTINCT day FROM daily) d2
      |  JOIN daily d1 ON d1.day BETWEEN d2.day - 6 AND d2.day
      |  GROUP BY d2.day)
      |SELECT day, dau, dau7 FROM dau1 JOIN roll USING (day)""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_rolling_dau" -> (evtRollingDau _),
    "evt_decode_typed_table" -> (evtDecodeTypedTable _),
    "mutation_nonce_replay" -> (mutationNonceReplay _),
    "mutation_verify_sig" -> (mutationVerifySig _),
    "evt_sliding_window" -> (evtSlidingWindow _),
    "evt_ohlc" -> (evtOhlc _),
    "evt_anomaly" -> (evtAnomaly _),
    "evt_top_paths" -> (evtTopPaths _),
    "evt_histogram" -> (evtHistogram _),
    "evt_retention_cohort" -> (evtRetentionCohort _),
    "evt_bitmap_distinct" -> (evtBitmapDistinct _),
    "mutation_integrity" -> (mutationIntegrity _),
    "mutation_ownership" -> (mutationOwnership _),
    "evt_sketch_rollup" -> (evtSketchRollup _),
    "evt_gapfill" -> (evtGapfill _),
    "evt_funnel" -> (evtFunnel _),
    "evt_time_weighted_avg" -> (evtTimeWeightedAvg _),
    "evt_time_range" -> (evtTimeRange _),
    "evt_decode_abi" -> (evtDecodeAbi _),
    "evt_decode_abi_multi" -> (evtDecodeAbiMulti _),
    "evt_window_agg" -> (evtWindowAgg _),
    "evt_topk" -> (evtTopk _),
    "evt_approx_topk" -> (evtApproxTopk _),
    "evt_latest_per_key" -> (evtLatestPerKey _),
    "evt_sessionize" -> (evtSessionize _),
    "evt_rate_limit" -> (evtRateLimit _),
    "evt_rate_limit_buckets" -> (evtRateLimitBuckets _),
    "evt_rate_limit_auto" -> (evtRateLimitAuto _),
    "evt_sma_cross" -> (evtSmaCross _),
    "evt_sessionize_buckets" -> (evtSessionizeBuckets _),
    "evt_sessionize_auto" -> (evtSessionizeAuto _),
    "evt_join_dims" -> (evtJoinDims _),
    "evt_ttl_retention" -> (evtTtlRetention _),
    "rollup_batches" -> (rollupBatches _),
    "rollup_stats" -> (rollupStats _),
    "mutation_log_stats" -> (mutationLogStats _),
  )

  val oracles: Map[String, String] = Map(
    "evt_rolling_dau" -> evtRollingDauSql,
    "evt_rate_limit" -> evtRateLimitSql,
    "evt_rate_limit_buckets" -> evtRateLimitSql, // identical output contract
    "evt_rate_limit_auto" -> evtRateLimitSql, // dispatches between the twins
    "evt_sma_cross" -> evtSmaCrossSql,
    "evt_decode_typed_table" -> evtDecodeTypedTableSql,
    "mutation_nonce_replay" -> mutationNonceReplaySql,
    "mutation_verify_sig" -> mutationVerifySigSql,
    "evt_sliding_window" -> evtSlidingWindowSql,
    "evt_ohlc" -> evtOhlcSql,
    "evt_anomaly" -> evtAnomalySql,
    "evt_top_paths" -> evtTopPathsSql,
    "evt_histogram" -> evtHistogramSql,
    "evt_retention_cohort" -> evtRetentionCohortSql,
    "evt_bitmap_distinct" -> evtBitmapDistinctSql,
    "mutation_integrity" -> mutationIntegritySql,
    "mutation_ownership" -> mutationOwnershipSql,
    "evt_gapfill" -> evtGapfillSql,
    "evt_funnel" -> evtFunnelSql,
    "evt_time_weighted_avg" -> evtTimeWeightedAvgSql,
    "evt_time_range" -> evtTimeRangeSql,
    "evt_decode_abi" -> evtDecodeAbiSql,
    "evt_decode_abi_multi" -> evtDecodeAbiMultiSql,
    "evt_window_agg" -> evtWindowAggSql,
    "evt_topk" -> evtTopkSql,
    "evt_approx_topk" -> evtApproxTopkSql,
    "evt_latest_per_key" -> evtLatestPerKeySql,
    "evt_sessionize" -> evtSessionizeSql,
    "evt_sessionize_buckets" -> evtSessionizeSql, // identical output contract
    "evt_sessionize_auto" -> evtSessionizeSql, // dispatches between the twins
    "evt_join_dims" -> evtJoinDimsSql,
    "evt_ttl_retention" -> evtTtlRetentionSql,
    "rollup_batches" -> rollupBatchesSql,
    "rollup_stats" -> rollupStatsSql,
    "mutation_log_stats" -> mutationLogStatsSql,
  )
}
