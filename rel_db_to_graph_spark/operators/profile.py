"""Table profiling — the ANALYZE-style per-column statistics report
(null count, exact distinct count, numeric min/max, string min/max)
every ingestion pipeline runs before trusting a new snapshot.

One WIDE aggregation pass computes every column's stats in a single
scan (Catalyst fuses the aggregates; the scan is read once however
many columns are profiled), then a ``stack`` unpivot emits the long
(column, stat...) report. Exact distincts make the report
oracle-checkable; at 100 TB swap ``countDistinct`` for
``approx_count_distinct`` per column — the plan shape (one pass, one
tiny output) is unchanged, and corpus_stats_approx_err shows how to
audit the sketch tier.

Cross-engine float note: numeric min/max are emitted as DOUBLE columns
(not stringified — engines disagree on double→string formatting);
string/date min/max are emitted as ISO strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str) — one row per profiled column, computed in a
    single scan. Numeric columns fill min_num/max_num (as double);
    string/date/timestamp columns fill min_str/max_str (dates as ISO
    strings); the opposite pair is NULL."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        is_num = isinstance(fields[c], _NUMERIC)
        aggs.append(F.sum(F.col(c).isNull().cast("long"))
                    .alias(f"_nulls_{c}"))
        aggs.append(F.countDistinct(c).alias(f"_dist_{c}"))
        if is_num:
            aggs.append(F.min(c).cast("double").alias(f"_minn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"_maxn_{c}"))
        else:
            aggs.append(F.min(F.col(c).cast("string"))
                        .alias(f"_mins_{c}"))
            aggs.append(F.max(F.col(c).cast("string"))
                        .alias(f"_maxs_{c}"))
    wide = df.agg(*aggs)
    rows = []
    for c in cols:
        is_num = isinstance(fields[c], _NUMERIC)
        minn = f"_minn_{c}" if is_num else "CAST(NULL AS DOUBLE)"
        maxn = f"_maxn_{c}" if is_num else "CAST(NULL AS DOUBLE)"
        mins = "CAST(NULL AS STRING)" if is_num else f"_mins_{c}"
        maxs = "CAST(NULL AS STRING)" if is_num else f"_maxs_{c}"
        rows.append(f"'{c}', _n, _nulls_{c}, _dist_{c}, "
                    f"{minn}, {maxn}, {mins}, {maxs}")
    stacked = ", ".join(rows)
    return wide.select(F.expr(
        f"stack({len(cols)}, {stacked}) as "
        "(column, n_rows, n_nulls, n_distinct, min_num, max_num, "
        "min_str, max_str)"))
