"""BPE training (operators/bpe.py) vs a reference pure-python
implementation: identical merge sequences (counts, ties, greedy
non-overlapping apply), plus tokenize-length conservation."""

from __future__ import annotations

import re
from collections import Counter

from rel_db_to_graph_spark.operators.bpe import (
    bpe_tokenize,
    bpe_train,
    word_counts,
)
from rel_db_to_graph_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE

ROWS = [
    (0, "low lower lowest low low"),
    (1, "new newer newest new lowly"),
    (2, "wide wider widest low new"),
]


def _norm_words(text: str) -> list[str]:
    t = re.sub(r"[^a-z0-9 ]", " ", text.lower())
    return [w for w in re.sub(r" +", " ", t).strip().split(" ") if w]


def _python_bpe(word_freq: dict[str, int], n_merges: int):
    """Reference implementation: per-position pair counts, ties by
    (count desc, pair lexicographic), greedy left-to-right apply."""
    vocab = {w: [c for c in w] for w in word_freq}
    merges = []
    for step in range(n_merges):
        counts: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += word_freq[w]
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, left, right, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def _docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_merge_sequence_matches_python_twin(spark):
    freq: Counter = Counter()
    for _, text in ROWS:
        freq.update(_norm_words(text))
    want, _ = _python_bpe(dict(freq), n_merges=8)
    got = bpe_train(_docs(spark), n_merges=8)
    assert [(m["step"], m["left"], m["right"], m["pair_count"])
            for m in got] == want


def test_merge_sequence_matches_twin_on_real_corpus(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    freq = {r.word: r.n for r in word_counts(docs).collect()}
    want, _ = _python_bpe(freq, n_merges=5)
    got = bpe_train(docs, n_merges=5)
    assert [(m["step"], m["left"], m["right"], m["pair_count"])
            for m in got] == want


def test_tokenize_piece_counts_match_twin(spark):
    freq: Counter = Counter()
    for _, text in ROWS:
        freq.update(_norm_words(text))
    merges = bpe_train(_docs(spark), n_merges=6)
    pieces = {r.doc_id: r.n_pieces
              for r in bpe_tokenize(_docs(spark), merges).collect()}
    _, vocab = _python_bpe(dict(freq), n_merges=6)
    for doc_id, text in ROWS:
        want = sum(len(vocab[w]) for w in _norm_words(text))
        assert pieces[doc_id] == want


def test_merges_reduce_piece_count(spark):
    none = bpe_tokenize(_docs(spark), []).collect()
    merges = bpe_train(_docs(spark), n_merges=6)
    some = bpe_tokenize(_docs(spark), merges).collect()
    total0 = sum(r.n_pieces for r in none)
    total1 = sum(r.n_pieces for r in some)
    assert total1 < total0


def _python_bpe_batched(word_freq: dict[str, int], n_merges: int,
                        batch: int):
    """Twin of bpe.bpe_train_batched: per round, rank pairs by (count
    desc, lexicographic), greedily accept up to ``batch`` pairwise
    symbol-disjoint pairs from the top 16*batch, apply all, repeat."""
    vocab = {w: [c for c in w] for w in word_freq}
    merges = []
    step = 0
    while len(merges) < n_merges:
        want = min(batch, n_merges - len(merges))
        counts: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += word_freq[w]
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        used, accepted = set(), []
        for (a, b), cnt in ranked[:16 * batch]:
            if len(accepted) >= want or cnt <= 0:
                break
            if a in used or b in used:
                continue
            used.update((a, b))
            accepted.append((a, b, cnt))
        if not accepted:
            break
        for left, right, cnt in accepted:
            for w, syms in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == left
                            and syms[i + 1] == right):
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                vocab[w] = out
            merges.append((step, left, right, cnt))
            step += 1
    return merges, vocab


def test_batched_batch1_equals_sequential(spark):
    from rel_db_to_graph_spark.operators.bpe import bpe_train_batched
    seq = bpe_train(_docs(spark), n_merges=8)
    b1 = bpe_train_batched(_docs(spark), n_merges=8, batch=1)
    assert seq == b1


def test_batched_matches_python_twin_real_corpus(spark):
    """40 merges in 5 rounds of 8 — the realistic-vocab shape — pinned
    against the pure-python twin of the same batched policy."""
    from rel_db_to_graph_spark.operators.bpe import bpe_train_batched
    docs = load_table(spark, SF_SMOKE, "documents")
    freq = {r.word: r.n for r in word_counts(docs).collect()}
    want, _ = _python_bpe_batched(freq, n_merges=40, batch=8)
    got = bpe_train_batched(docs, n_merges=40, batch=8)
    assert [(m["step"], m["left"], m["right"], m["pair_count"])
            for m in got] == want
    assert len(got) == 40


def test_batched_delta_recount_matches_twin(spark, monkeypatch, capsys):
    """Force the sparse-round DELTA recount (round 9: pair counts are
    kept exact by exploding only CHANGED sequences once merge sites are
    sparse) and pin the merge sequence against the python twin, which
    full-recounts every round — equality proves the delta algebra is
    exact. The corpus: one hot bigram so round 1 runs the dense path,
    plus hundreds of low-frequency distinct words so later rounds'
    accepted pairs have counts far below the sequence count."""
    import hashlib

    from rel_db_to_graph_spark.operators.bpe import bpe_train_batched

    rows = [("the thing there", 1)] * 150    # hot 'th' — dense round 1
    for i in range(600):                      # sparse tail
        h = hashlib.md5(f"w{i}".encode()).hexdigest()
        w = "".join(chr(ord("a") + int(c, 16) % 26) for c in h[:8])
        rows.append((w, 1))
    docs = spark.createDataFrame([(t,) for t, _ in rows], "text string")
    freq = {r.word: r.n for r in word_counts(docs).collect()}
    want, _ = _python_bpe_batched(freq, n_merges=24, batch=4)
    monkeypatch.setenv("SPARK_GRAFT_TRACE", "1")
    got = bpe_train_batched(docs, n_merges=24, batch=4,
                            delta_frac=0.5)   # force the sparse path
    out = capsys.readouterr().out
    assert "delta rewrite" in out, out       # the sparse path really ran
    assert "full(lazy) rewrite" in out, out  # and so did the dense one
    assert [(m["step"], m["left"], m["right"], m["pair_count"])
            for m in got] == want


def test_batched_accepts_are_symbol_disjoint_per_round(spark):
    from rel_db_to_graph_spark.operators.bpe import bpe_train_batched
    got = bpe_train_batched(_docs(spark), n_merges=12, batch=4)
    # reconstruct rounds: steps are consecutive; group by round of 4
    # is not observable from output alone, so check the invariant the
    # policy guarantees instead: each merge's count is exact under the
    # pre-round table — verified transitively by the twin equality
    # above; here pin monotone step numbering and non-empty output
    assert [m["step"] for m in got] == list(range(len(got)))
    assert got


def test_ranked_tokenizer_equals_fold_tokenizer(spark):
    """The mapInPandas rank-based tokenizer (vocab-scale path) must
    agree exactly with the fold-expression path on the same merges."""
    from rel_db_to_graph_spark.operators.bpe import (
        bpe_tokenize_ranked,
        bpe_train_batched,
    )
    docs = load_table(spark, SF_SMOKE, "documents")
    merges = bpe_train_batched(docs, n_merges=40, batch=8)
    fold = {r.doc_id: r.n_pieces for r in bpe_tokenize(docs, merges).collect()}
    ranked = {r.doc_id: r.n_pieces
              for r in bpe_tokenize_ranked(docs, merges).collect()}
    assert fold == ranked and len(fold) == 500


def _norm_text(text: str) -> str:
    t = re.sub(r"[^a-z0-9 ]", " ", text.lower())
    return re.sub(r" +", " ", t).strip()


def test_raw_mode_matches_python_twin(spark):
    """pretokenize=False (SentencePiece-style: the whole normalized
    text is one symbol sequence, spaces are symbols) must follow the
    SAME batched policy over sequence_counts — the shared round loop
    means the existing twin applies verbatim with whole-text keys."""
    from rel_db_to_graph_spark.operators.bpe import (
        bpe_train_batched,
        sequence_counts,
    )
    docs = load_table(spark, SF_SMOKE, "documents").limit(40)
    freq = {r.word: r.n for r in sequence_counts(docs).collect()}
    want, _ = _python_bpe_batched(freq, n_merges=48, batch=8)
    got = bpe_train_batched(docs, n_merges=48, batch=8,
                            pretokenize=False)
    assert [(m["step"], m["left"], m["right"], m["pair_count"])
            for m in got] == want
    # merges must cross word boundaries in this regime
    assert any(" " in m["left"] + m["right"] for m in got)


def test_raw_ranked_tokenizer_matches_vocab_rewrite(spark):
    """Raw-mode ranked tokenizer vs the python twin's final vocab: a
    document's piece count is the length of its fully-merged
    sequence."""
    from rel_db_to_graph_spark.operators.bpe import (
        bpe_tokenize_ranked,
        bpe_train_batched,
        sequence_counts,
    )
    docs = load_table(spark, SF_SMOKE, "documents").limit(40)
    freq = {r.word: r.n for r in sequence_counts(docs).collect()}
    _, vocab = _python_bpe_batched(freq, n_merges=48, batch=8)
    merges = bpe_train_batched(docs, n_merges=48, batch=8,
                               pretokenize=False)
    got = {r.doc_id: r.n_pieces
           for r in bpe_tokenize_ranked(docs, merges,
                                        pretokenize=False).collect()}
    want = {r.doc_id: len(vocab[_norm_text(r.text)])
            for r in docs.collect()}
    assert got == want and len(got) == 40


def _duck_docs(rows):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    return con


def test_bpe_oracle_generator_matches_python_twin():
    """The DuckDB retraining twin (oracle.py::_bpe_train_sql) replays
    the batched policy EXACTLY on a toy corpus — pure DuckDB vs the
    pure-python twin, no Spark: same merges, counts, tie-breaks, and
    greedy non-overlapping rewrites (incl. the [l,o,w] overlap family),
    and graceful stop on pair exhaustion."""
    from rel_db_to_graph_spark.oracle import _bpe_train_sql

    freq = Counter(w for _, t in ROWS for w in _norm_words(t))
    con = _duck_docs(ROWS)
    # the toy corpus exhausts at 18 merges, so n_merges=40 still drives
    # the graceful-exhaustion path; rounds=10 (vs the old 40) bounds the
    # UNROLLED round CTEs DuckDB must execute — the generator emits one
    # CTE chain per round whether or not pairs remain, and 40 rounds of
    # dead SQL was ~4x the wall of the rounds that do work
    # (optimization round 13, r12 verdict item 3: suite wall time)
    for n_merges, batch in ((12, 4), (40, 8)):       # 40 > 18 → exhaustion
        want = [(s, a, b, c) for s, a, b, c in
                _python_bpe_batched(dict(freq), n_merges, batch)[0]]
        got = con.execute(
            _bpe_train_sql(n_merges, batch, rounds=10, pretokenize=True)
        ).fetchall()
        assert got == want, (n_merges, batch)


def test_bpe_oracle_poison_row_fires_on_short_unroll():
    """An unroll depth the trainer would outrun must yield a LOUD
    poison row, never a silently truncated merge list."""
    from rel_db_to_graph_spark.oracle import _bpe_train_sql

    con = _duck_docs(ROWS)
    got = con.execute(
        _bpe_train_sql(n_merges=500, batch=1, rounds=2, pretokenize=True)
    ).fetchall()
    assert got[-1][1] == "__ORACLE_UNROLL_EXHAUSTED__"
    assert got[-1][3] == -1
