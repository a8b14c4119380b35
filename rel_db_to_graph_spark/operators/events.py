"""Event-stream analytics (batch side; streaming/ has the readStream
variants). The events table carries a native ``timestamp`` column
(parquet timestamp[us]); all ts math goes through ``unix_micros`` so
the µs domain is explicit and integer-exact (µs values overflow
double's 53-bit mantissa, so no double arithmetic anywhere).

Both ops are the batch twins of standard streaming shapes:
  * hourly_rollup  — tumbling-window aggregate (watermark+window in the
    streaming variant). One shuffle on (event_type, hour).
  * sessionize     — gap-based sessionization via lag/cumsum windows,
    partitioned by user: scales with users, the per-user sort is local
    to its hash partition.

Aggregate sums go through decimal casts so results are partition-order
independent (hash-stable for the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_SEC = 1800


def ts_micros(events: DataFrame, col: str = "ts"):
    """µs-since-epoch long from the events ts column, robust to the two
    physical encodings testdata has shipped: native timestamp[us]
    (current) via unix_micros, or int64 ns-since-epoch (legacy
    TIMESTAMP(NANOS) read under nanosAsLong) via integer division.
    Integer ops only — µs/ns magnitudes overflow double's mantissa."""
    dtype = dict(events.dtypes).get(col, "timestamp")
    if dtype.startswith("timestamp"):
        return F.unix_micros(F.col(col))
    if dtype == "bigint":
        # ns→µs integral division. Column `/` is double division (µs/ns
        # magnitudes overflow the 53-bit mantissa), so `div` it is — with
        # the identifier backtick-quoted, never raw-interpolated.
        safe = col.replace("`", "``")
        return F.expr(f"`{safe}` div 1000")
    raise TypeError(
        f"events.{col} has dtype {dtype!r}; expected timestamp (µs) or "
        "bigint (ns-since-epoch). Refusing to guess a time unit.")


def with_event_time(events: DataFrame) -> DataFrame:
    """Normalize ts -> a proper timestamp column ``event_time``."""
    return events.withColumn(
        "event_time", F.timestamp_micros(ts_micros(events)))


def hourly_rollup(events: DataFrame) -> DataFrame:
    """(event_type, hour, n_events, n_users, sum_value) — tumbling 1h."""
    e = with_event_time(events)
    return (
        e.groupBy(
            F.col("event_type"),
            F.date_format(F.date_trunc("hour", F.col("event_time")),
                          "yyyy-MM-dd HH:mm:ss").alias("hour"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("sum_value"),
        )
    )


def asof_join(left: DataFrame, right: DataFrame, on: str, ts_col: str,
              payload: dict[str, str], tiebreak: str | None = None) -> DataFrame:
    """Backward as-of join: for each left row, attach the latest right row
    with ``right.ts_col <= left.ts_col`` per ``on`` key (DuckDB/kdb ASOF
    LEFT JOIN semantics, inclusive). Spark has no native as-of join; the
    naive form (range join + per-left-row max) explodes to |L|·|R| pairs
    per key. This union-merge form never materializes pairs:

        tag right rows side=0 and left rows side=1, union, then one
        window per key ordered by (ts, side): last(payload, ignorenulls)
        carries the most recent right payload forward into each left row.

    One shuffle on the key, per-key local sort — identical scale shape to
    sessionize: linear in |L|+|R| regardless of match fan-in.

    ``payload`` maps right column -> output name (names must not collide
    with left columns); ``tiebreak`` (a payload OUTPUT name) makes the
    winner among equal-ts right rows deterministic: the greatest value
    wins (last in window order).

    The payload travels as ONE struct through a single
    last(ignorenulls) so the matched right row is atomic — carrying each
    column independently would tear the payload across different right
    rows whenever a right row holds NULL in one payload column.
    """
    r = right.select(
        F.col(on), F.col(ts_col).alias("_ts"),
        F.struct(*[F.col(c).alias(o) for c, o in payload.items()]).alias("_p"),
        F.lit(0).alias("_side"))
    l = left.withColumn("_ts", F.col(ts_col)).withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    order = [F.col("_ts"), F.col("_side")]
    if tiebreak:
        order.append(F.col("_p").getField(tiebreak))
    w = (Window.partitionBy(on).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = u.select(
        *left.columns, "_side",
        F.last("_p", ignorenulls=True).over(w).alias("_p"))
    return (carried.filter(F.col("_side") == 1)
            .select(*left.columns,
                    *[F.col("_p").getField(o).alias(o)
                      for o in payload.values()]))


def range_join(points: DataFrame, intervals: DataFrame, on: str,
               ts_col: str, start_col: str, end_col: str,
               bucket_width: int) -> DataFrame:
    """Point-in-interval range join: pair each point row with every
    interval row of the same ``on`` key satisfying
    ``start_col < ts_col <= end_col`` (strict lower / inclusive upper —
    the trailing-window convention; reference has no range join, this is
    a north-star addition alongside asof_join).

    Spark turns a bare non-equi predicate into a per-key nested loop
    (BroadcastNestedLoopJoin when keyless) — quadratic per key. Instead
    the classic bucketing rewrite makes it an equi-join: every point maps
    to one time bucket ``ts div bucket_width``; every interval is
    replicated to each bucket it overlaps (``sequence`` + ``explode``,
    ≤ 1 + len/bucket_width copies); join on (key, bucket), then refine
    with the exact range predicate. Each qualifying pair is produced
    exactly once because a point lives in exactly one bucket.

    ``bucket_width`` (same unit as the ts columns) only tunes the
    replication factor — correctness holds for any positive value; pick
    it ≈ the typical interval length so intervals copy ~2×. One shuffle
    on (key, bucket); AQE handles hot buckets like any skewed equi-join.
    Column names must not collide across the two inputs (except ``on``).
    """
    w = int(bucket_width)
    pt = points.withColumn("_b", F.expr(f"{ts_col} div {w}"))
    iv = intervals.withColumn(
        "_b",
        F.explode(F.sequence(F.expr(f"{start_col} div {w}"),
                             F.expr(f"{end_col} div {w}"))))
    return (
        pt.join(iv, [on, "_b"])
        .filter((F.col(ts_col) > F.col(start_col)) &
                (F.col(ts_col) <= F.col(end_col)))
        .drop("_b")
    )


def rate_anomalies(events: DataFrame, trailing: int = 6,
                   z_thresh: float = 2.0) -> DataFrame:
    """Event-rate anomaly detection: per (event_type, hour) counts
    z-scored against the TRAILING ``trailing``-hour window of the same
    type; rows with |z| > z_thresh are flagged. The monitoring query
    every event pipeline runs against its own throughput.

    Two shuffles total: the (type, hour) count aggregation, then one
    window partitioned by event_type — hours per type is tiny compared
    to events, so the window input is already reduced ~|events|/|hours|
    fold by the pre-aggregation (never window over raw events).

    Variance is computed from INTEGER sums (Σn, Σn², cnt are exact in
    doubles) via the explicit E[x²]−E[x]² formula rather than
    var_pop/stddev window functions: both engines then evaluate the
    same double expression on the same exact inputs, so the z-scores
    are bit-identical for the oracle gate (incremental Welford-style
    variance would associate differently per engine). sqrt is IEEE
    correctly-rounded in both.
    """
    hourly = (with_event_time(events)
              .groupBy("event_type",
                       F.date_trunc("hour", F.col("event_time"))
                       .alias("_hour_ts"))
              .agg(F.count("*").alias("n")))
    w = (Window.partitionBy("event_type").orderBy("_hour_ts")
         .rowsBetween(-trailing, -1))
    scored = (hourly
              .withColumn("_s", F.sum("n").over(w).cast("double"))
              .withColumn("_s2", F.sum(F.col("n") * F.col("n")).over(w)
                          .cast("double"))
              .withColumn("_c", F.count("n").over(w).cast("double"))
              .filter(F.col("_c") >= trailing))
    mean = F.col("_s") / F.col("_c")
    var = (F.col("_s2") - F.col("_s") * F.col("_s") / F.col("_c")) / F.col("_c")
    z = (F.col("n") - mean) / F.sqrt(var + F.lit(1e-9))
    return (scored
            .withColumn("z", F.round(z, 6))
            .filter(F.abs(F.col("z")) > F.lit(float(z_thresh)))
            .select("event_type",
                    F.date_format("_hour_ts", "yyyy-MM-dd HH:mm:ss")
                    .alias("hour"),
                    "n", "z"))


def sessionize(events: DataFrame, gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """Gap-based sessions: (user_id, session_id, n_events, session_start,
    duration_sec). A new session starts when the gap to the previous event
    of the same user exceeds ``gap_sec``. Ties on ts are broken by
    event_id so the window order is total and deterministic."""
    # microsecond domain: parquet stores timestamp[us], and µs is the
    # finest DuckDB-comparable resolution
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap_us = F.lit(int(gap_sec) * 1_000_000)
    flagged = events.withColumn("ts_us", ts_micros(events)).withColumn(
        "_new",
        F.when(F.col("ts_us") - F.lag("ts_us").over(w) > gap_us, F.lit(1))
        .otherwise(F.lit(0)),
    ).withColumn(
        "_first",
        F.when(F.lag("ts_us").over(w).isNull(), F.lit(1)).otherwise(F.lit(0)))
    sess = flagged.withColumn(
        "session_id",
        F.sum(F.col("_new") + F.col("_first")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.timestamp_micros(F.min("ts_us")),
                          "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            ((F.max("ts_us") - F.min("ts_us")) / F.lit(1_000_000.0))
            .alias("duration_sec"),
        )
    )
