"""Bigram LM scoring (operators/lm.py): gibberish scores worse than
corpus-typical text, smoothing handles unseen bigrams, deterministic.
Oracle parity for ``lm_nll`` runs in test_oracle_parity."""

from __future__ import annotations

from rel_db_to_graph_spark.operators.lm import bigram_counts, doc_nll

ROWS = [
    (0, "the cat sat on the mat and the cat sat again"),
    (1, "the cat sat on the mat once more today"),
    (2, "the dog sat on the mat and the dog sat"),
    (3, "zq xv qj vk jx kq zz vq qx jz zx qq"),   # gibberish
]


def _docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_gibberish_scores_worse_per_bigram(spark):
    nll = {r.doc_id: r.nll / r.n_bigrams
           for r in doc_nll(_docs(spark)).collect()}
    assert nll[3] > nll[0] and nll[3] > nll[1] and nll[3] > nll[2]


def test_counts_and_smoothing(spark):
    bigrams, unigrams, v = bigram_counts(_docs(spark))
    c = {(r.a, r.b): r.c_ab for r in bigrams.collect()}
    u = {r.a: r.c_a for r in unigrams.collect()}
    assert c[("the", "cat")] == 3 and c[("cat", "sat")] == 3
    # unigram counts = bigram-position occurrences (all but each doc's
    # last token)
    assert u["the"] == 8
    assert v == len({w for _, t in ROWS for w in t.split()})
    # add-one smoothing: an unseen bigram gets the floor 1/(c_a+V)
    assert ("mat", "dog") not in c


def test_deterministic_and_partition_invariant(spark):
    a = sorted(map(tuple, doc_nll(_docs(spark).coalesce(1)).collect()))
    b = sorted(map(tuple, doc_nll(_docs(spark).repartition(8)).collect()))
    assert a == b
