"""Incremental dense ids (operators/increment.py): old ids immutable,
union dense, idempotent, deterministic. Oracle parity for
``dense_ids_increment`` runs in test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from rel_db_to_graph_spark.operators.graph_build import dense_ids_scalable
from rel_db_to_graph_spark.operators.increment import dense_ids_append
from rel_db_to_graph_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def _setup(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    snapshot = orders.filter(F.col("o_orderkey") % 3 != 0)
    existing = dense_ids_scalable(snapshot.select("o_orderkey"), "o_orderkey")
    return orders, existing


def test_old_ids_immutable_and_union_dense(spark):
    orders, existing = _setup(spark)
    old = {r.pk: r.node_id for r in existing.collect()}
    merged = dense_ids_append(existing, orders, "o_orderkey")
    got = {r.pk: r.node_id for r in merged.collect()}
    assert all(got[pk] == nid for pk, nid in old.items())
    n = len(got)
    assert sorted(got.values()) == list(range(n))
    assert n == orders.select("o_orderkey").distinct().count()
    # every appended id sits above the old range
    appended = {pk: nid for pk, nid in got.items() if pk not in old}
    assert appended and min(appended.values()) == len(old)


def test_idempotent_on_already_mapped_batch(spark):
    orders, existing = _setup(spark)
    snapshot = orders.filter(F.col("o_orderkey") % 3 != 0)
    again = dense_ids_append(existing, snapshot, "o_orderkey")
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, existing.collect()))


def test_deterministic_and_empty_existing(spark):
    orders, existing = _setup(spark)
    a = sorted(map(tuple, dense_ids_append(existing, orders,
                                           "o_orderkey").collect()))
    b = sorted(map(tuple, dense_ids_append(existing, orders,
                                           "o_orderkey").collect()))
    assert a == b
    # empty existing mapping -> plain dense_ids_scalable result
    empty = existing.filter(F.lit(False))
    from_scratch = sorted(map(tuple, dense_ids_append(
        empty, orders, "o_orderkey").collect()))
    direct = sorted(map(tuple, dense_ids_scalable(
        orders.select("o_orderkey"), "o_orderkey").collect()))
    assert from_scratch == direct


def test_incremental_edges_equal_from_scratch_over_merged(spark):
    """The incremental edge union (old edges under the old mapping +
    batch edges under the merged mapping) equals a from-scratch edge
    build over the merged mapping."""
    from pyspark.sql import functions as F

    from rel_db_to_graph_spark.queries import q_graph_increment

    incremental = sorted(map(tuple,
                             q_graph_increment(spark, SF_SMOKE).collect()))
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    cust_ids = dense_ids_scalable(customer.select("c_custkey"), "c_custkey")
    snap_ids = dense_ids_scalable(
        orders.filter(F.col("o_orderkey") % 3 != 0).select("o_orderkey"),
        "o_orderkey")
    merged = dense_ids_append(snap_ids, orders, "o_orderkey")
    scratch = sorted(map(tuple, (
        orders.join(merged.withColumnsRenamed(
            {"pk": "o_orderkey", "node_id": "src"}), "o_orderkey")
        .join(cust_ids.withColumnsRenamed(
            {"pk": "o_custkey", "node_id": "dst"}), "o_custkey")
        .select("src", "dst")).collect()))
    assert incremental == scratch


def test_snapshot_diff_classifies_ops(spark):
    from rel_db_to_graph_spark.operators.increment import snapshot_diff
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k long, v string")
    got = {r["k"]: r["op"] for r in snapshot_diff(old, new, "k").collect()}
    assert got == {2: "U", 3: "D", 4: "I"}


def test_merge_upsert_roundtrips_to_new(spark):
    from pyspark.sql import functions as F

    from rel_db_to_graph_spark.operators.increment import (
        merge_upsert,
        snapshot_diff,
    )
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k long, v string")
    diff = snapshot_diff(old, new, "k")
    merged = merge_upsert(old, diff.join(new, "k", "left"), "k")
    assert ({tuple(r) for r in merged.collect()}
            == {tuple(r) for r in new.collect()})
    # null-valued payload columns survive the fingerprint
    old2 = spark.createDataFrame([(1, None)], "k long, v string")
    new2 = spark.createDataFrame([(1, None)], "k long, v string")
    assert snapshot_diff(old2, new2, "k").count() == 0


def test_snapshot_diff_fingerprint_is_injection_proof(spark):
    """Adversarial values for the old concat_ws("\\x1f", …, "\\x00")
    scheme (VERDICT r6 item 2 / ADVICE r6): a value containing the
    separator byte must not shift content between columns, and a
    literal sentinel string must not alias NULL. Every pair below is a
    GENUINE update the old fingerprint would have missed (no 'U'
    emitted) and a genuine no-op it could have flagged."""
    from rel_db_to_graph_spark.operators.increment import snapshot_diff

    schema = "k long, a string, b string"
    cases = [
        # separator shift: ("x\x1fy", "z") vs ("x", "y\x1fz") concat
        # identically under the old scheme — must be detected as U
        ([(1, "x\x1fy", "z")], [(1, "x", "y\x1fz")], {1: "U"}),
        # literal sentinel vs NULL — old scheme hashed both to "\x00"
        ([(2, "\x00", "b")], [(2, None, "b")], {2: "U"}),
        ([(3, None, None)], [(3, "\x00", "\x00")], {3: "U"}),
        # unchanged adversarial rows must stay quiet
        ([(4, "x\x1fy", None)], [(4, "x\x1fy", None)], {}),
        ([(5, "\x00", "\x1f")], [(5, "\x00", "\x1f")], {}),
        # values that LOOK like JSON must not alias real structure
        ([(6, '","b":"', "q")], [(6, '","b":"q', None)], {6: "U"}),
    ]
    for old_rows, new_rows, want in cases:
        old = spark.createDataFrame(old_rows, schema)
        new = spark.createDataFrame(new_rows, schema)
        got = {r["k"]: r["op"]
               for r in snapshot_diff(old, new, "k").collect()}
        assert got == want, (old_rows, new_rows, got, want)


def test_snapshot_diff_sees_sub_millisecond_timestamp_updates(spark):
    """ADVICE r7: Spark's default to_json timestampFormat truncates to
    milliseconds, so 00:00:00.123456 vs .123999 used to serialize
    identically and the update was silently missed. The explicit
    microsecond timestampFormat must surface it as 'U' (and equal
    microsecond timestamps must stay quiet)."""
    import datetime as dt

    from rel_db_to_graph_spark.operators.increment import snapshot_diff

    schema = "k long, ts timestamp"
    t1 = dt.datetime(2024, 1, 1, 0, 0, 0, 123456)
    t2 = dt.datetime(2024, 1, 1, 0, 0, 0, 123999)
    old = spark.createDataFrame([(1, t1), (2, t1)], schema)
    new = spark.createDataFrame([(1, t2), (2, t1)], schema)
    got = {r["k"]: r["op"] for r in snapshot_diff(old, new, "k").collect()}
    assert got == {1: "U"}, got
