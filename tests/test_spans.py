"""Exact-substring duplication spans (dedup.py::duplicated_spans):
planted copied passages are found, disjoint texts produce nothing,
stride/window bounds hold. Oracle parity for ``dup_spans`` runs in
test_oracle_parity."""

from __future__ import annotations

from rel_db_to_graph_spark.operators.dedup import duplicated_spans

PASSAGE = "the quick brown fox jumps over the lazy dog again and again"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_copied_passage_is_found(spark):
    rows = [
        (0, "intro words here " + PASSAGE + " closing remarks"),
        (1, "different opening " + PASSAGE + " other tail text"),
        (2, "totally unrelated content with its own words only here"),
    ]
    got = duplicated_spans(_docs(spark, rows), length=20, stride=1).collect()
    assert got, "shared passage must produce duplicated spans"
    assert all(r.n_docs == 2 and r.first_doc == 0 for r in got)


def test_disjoint_docs_produce_no_spans(spark):
    rows = [(0, "alpha beta gamma delta epsilon zeta eta theta"),
            (1, "one two three four five six seven eight nine ten")]
    assert duplicated_spans(_docs(spark, rows), length=20,
                            stride=1).count() == 0


def test_stride_catches_long_runs(spark):
    """Windows at stride s are guaranteed to land inside any shared run
    of >= length + s - 1 chars."""
    shared = "x" * 60                   # normalized run of 60 chars
    rows = [(0, "aaa " + shared + " bbb"), (1, "ccc " + shared + " ddd")]
    got = duplicated_spans(_docs(spark, rows), length=40, stride=10)
    assert got.count() >= 1
