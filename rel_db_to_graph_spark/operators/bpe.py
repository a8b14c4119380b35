"""BPE vocabulary training — byte-pair-encoding merge learning as
DataFrame reductions, the tokenizer-building step of an LLM data
pipeline (Sennrich, Haddow, Birch, "Neural Machine Translation of Rare
Words with Subword Units", ACL 2016).

Spark-first decomposition: the expensive part of BPE is counting
adjacent symbol pairs over the corpus; the cheap part is picking the
best pair and rewriting. So each merge round is

  1. ONE aggregation — explode per-position adjacent pairs from the
     distinct-WORD table weighted by word frequency (the corpus itself
     is touched once, up front, to build word counts; rounds then run
     over the vocabulary-sized word table, the classic Sennrich
     optimization), groupBy(pair) with map-side combine,
  2. a 1-row argmax collect (ties: count desc, then lexicographic
     (left, right) — total, deterministic),
  3. a map-only fold rewriting each word's symbol array with the
     merge applied greedily left-to-right (non-overlapping, matching
     the reference regex-replace semantics), localCheckpointed so
     round r+1's plan does not replay rounds 1..r.

Simplifications vs production BPE (documented, pinned by the pure-
python twin in tests): no end-of-word marker, whitespace pre-
tokenization via text.py::normalize/tokens. Deterministic by
construction — no seeds anywhere. HASH-CHECKED by the driver since
round 7: the DuckDB twin (oracle.py::_bpe_parts) retrains the
tokenizer — unrolled rounds, the same greedy batch-accept policy,
and wrapped-string replace() rewrites reproducing the greedy merge
fold exactly; also crosschecked against a reference python
implementation in tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rel_db_to_graph_spark.operators.text import normalize, tokens


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) — the vocabulary-sized frame BPE rounds iterate on."""
    return (docs.select(F.explode(tokens(normalize(F.col(text_col))))
                        .alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count("*").alias("n")))


def sequence_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) where ``word`` is the WHOLE normalized document text,
    spaces kept as symbols — the SentencePiece-style no-pre-tokenization
    merge domain. With whitespace pre-tokenization a tiny vocabulary
    saturates after a few hundred merges (the sf testdata has ~40
    distinct words); without it merges keep combining across word
    boundaries into phrases, so a tokenizer-realistic merge count
    (2k-32k) is actually learnable, and every training round scans a
    corpus-sized (not vocab-sized) table — the honest scale regime the
    round-7 sf1 audit measures (tools/bpe_scale_audit.py). Identical
    texts still group, so the shared round loop and its python twin
    apply verbatim."""
    return (docs.select(normalize(F.col(text_col)).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count("*").alias("n")))


def _chars(colname: str) -> Column:
    """Split the named string column into its character array."""
    return F.expr(f"transform(sequence(1, length({colname})), "
                  f"i -> substr({colname}, i, 1))")


def _merge_expr(left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping merge of the adjacent pair
    (left, right) inside the ``syms`` array — a single codegen fold:
    the accumulator carries (rewritten prefix, one pending symbol)."""
    la, ra = left.replace("'", "\\'"), right.replace("'", "\\'")
    return F.expr(
        "CASE WHEN size(syms) < 2 THEN syms ELSE "
        "aggregate(slice(syms, 2, size(syms) - 1), "
        "named_struct('out', CAST(array() AS ARRAY<STRING>), "
        "             'prev', element_at(syms, 1)), "
        "(acc, x) -> IF(acc.prev = '" + la + "' AND x = '" + ra + "', "
        "  named_struct('out', concat(acc.out, array('" + la + ra + "')), "
        "               'prev', CAST(NULL AS STRING)), "
        "  named_struct('out', IF(acc.prev IS NULL, acc.out, "
        "                         concat(acc.out, array(acc.prev))), "
        "               'prev', x)), "
        "acc -> IF(acc.prev IS NULL, acc.out, "
        "          concat(acc.out, array(acc.prev)))) END")


def bpe_train(docs: DataFrame, n_merges: int = 10,
              text_col: str = "text") -> list[dict]:
    """Learn ``n_merges`` BPE merges; returns
    [{step, left, right, pair_count}] in merge order. One pair-count
    aggregation + one vocabulary rewrite per round."""
    width = docs.sparkSession.sparkContext.defaultParallelism
    words = (word_counts(docs, text_col)
             .select("n", _chars("word").alias("syms"))
             .repartition(width)   # full width (see bpe_train_batched)
             .localCheckpoint(eager=True))

    merges: list[dict] = []
    for step in range(n_merges):
        pairs = (words
                 .filter(F.size("syms") >= 2)
                 .select("n", F.explode(F.arrays_zip(
                     F.slice("syms", 1, F.size("syms") - 1).alias("a"),
                     F.slice("syms", 2, F.size("syms") - 1).alias("b")))
                     .alias("p"))
                 .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                 .agg(F.sum("n").alias("cnt")))
        top = pairs.orderBy(F.desc("cnt"), "a", "b").limit(1).collect()
        if not top or top[0]["cnt"] <= 0:
            break
        left, right, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append({"step": step, "left": left, "right": right,
                       "pair_count": cnt})
        words = (words.select("n", _merge_expr(left, right).alias("syms"))
                 .localCheckpoint(eager=True))
    return merges


def bpe_train_batched(docs: DataFrame, n_merges: int = 100,
                      batch: int = 8, text_col: str = "text",
                      pretokenize: bool = True,
                      delta_frac: float = 0.02) -> list[dict]:
    """Learn up to ``n_merges`` merges with ~n_merges/batch driver
    round-trips instead of n_merges (VERDICT r5 item 7 — the shape that
    makes a realistic 32k-vocab training feasible: at batch=32 that is
    1k Spark jobs, not 32k).

    Per round: ONE pair-count aggregation, one bounded collect of the
    top 16*batch pairs, then a driver-side greedy scan that accepts up
    to ``batch`` pairs in (count desc, lexicographic) order whose
    SYMBOLS are pairwise disjoint, and ONE vocabulary rewrite applying
    all accepted merges as chained folds in a single codegen pass.

    Why symbol-disjointness: merging (a,b) provably leaves the count of
    any symbol-disjoint pair unchanged (it only deletes pairs touching
    a/b and creates pairs containing the new token), so disjoint
    batch-mates commute — the rewrite is order-independent and each
    accepted pair's recorded count is exact. The sequence can still
    differ from strictly-sequential BPE: sequential recounts after
    every merge, and a pair OVERLAPPING an earlier accept (skipped
    here, deferred to the next round) or a brand-new token pair could
    out-rank a later batch-mate. batch=1 reproduces ``bpe_train``
    exactly (tested); the batched sequence itself is deterministic and
    pinned against a python twin implementing the same policy
    (tests/test_bpe.py).

    ``delta_frac`` gates the sparse-round DELTA recount (round 9):
    when a round's accepted merge SITES fall below delta_frac x
    |sequences|, the pair-count table is updated by exploding only the
    CHANGED sequences (old pairs negative, new positive — exact integer
    algebra, so the merge sequence and every twin are untouched)
    instead of a full recount. MEASURED at sf1 (BASELINE.md round-9
    BPE): locally the dense single-job recount over the
    merge-compressed corpus is already near-optimal, and an eager
    2*sites >= |seq| delta gate made the 2k-merge audit 1139->1509 s
    (delta's extra driver jobs + the full-corpus rewrite map outweigh
    its explode savings at 50k sequences) — hence the conservative
    default: delta engages only in the deep-sparse tail here, while at
    production sequence counts (where one recount explode is the
    dominant term) the crossover moves orders of magnitude higher and
    the same knob expresses it.

    ``pretokenize=False`` trains over whole normalized documents
    (``sequence_counts``) instead of the whitespace vocabulary — the
    SentencePiece-style regime where merges cross word boundaries and
    rounds scan a corpus-sized table."""
    counts = word_counts if pretokenize else sequence_counts
    # The counts groupBy leaves the table at the AQE-coalesced
    # post-shuffle width (8 partitions on the 32-core sf1 audit —
    # BASELINE.md round-7 known lever): every subsequent round's
    # corpus-sized pair explode inherits it, leaving ~4x parallelism
    # unused. Spread once to full width here; localCheckpoint + the
    # narrow per-round rewrites preserve it for the whole training run.
    width = docs.sparkSession.sparkContext.defaultParallelism
    words = (counts(docs, text_col)
             .select("n", _chars("word").alias("syms"))
             .repartition(width)
             .localCheckpoint(eager=True))

    def _pair_rows(df: DataFrame) -> DataFrame:
        """(a, b, n) adjacent-pair rows of a (n, syms) frame."""
        return (df.filter(F.size("syms") >= 2)
                .select("n", F.explode(F.arrays_zip(
                    F.slice("syms", 1, F.size("syms") - 1).alias("a"),
                    F.slice("syms", 2, F.size("syms") - 1).alias("b")))
                    .alias("p"))
                .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"),
                        "n"))

    import os as _os
    import time as _time
    _trace = _os.environ.get("SPARK_GRAFT_TRACE", "") == "1"

    # Incremental pair-count state (round 9): the corpus is exploded
    # into pair rows ONCE up front; afterwards each round keeps the
    # RAM-resident counts table exact by one of two EQUIVALENT moves
    # (both integer-exact, so the merge sequence — and the python/SQL
    # twins — are untouched):
    #   * full recount while the accepted merges still touch a
    #     corpus-scale number of sites (early rounds: recounting once
    #     is cheaper than delta's old+new explode over ~everything);
    #   * exact DELTA once merge sites are sparse: explode pairs of
    #     only the CHANGED sequences (old negative, new positive) and
    #     fold into the counts table — a merge provably leaves every
    #     pair of an unchanged sequence alone, so sparse rounds cost
    #     O(changed) instead of O(corpus). This is what collapsed the
    #     sf1 2k-merge audit's long tail (BASELINE.md round-9 BPE).
    # The switch uses the accepted pairs' own exact counts (= merge
    # sites, known driver-side) vs the sequence count — deterministic,
    # data-independent of engine state.
    n_seq = words.count()
    # LINEAGE RULE (learned the hard way — StackOverflowError in task
    # deserialization at ~14 rounds): RDD.doCheckpoint truncates only
    # the FIRST checkpoint-marked RDD it reaches from a job's final
    # RDD, so stacking a marked counts table above a marked lazy words
    # table leaves words' lineage untruncated forever and the RDD chain
    # grows by ~|accepted| per round. Invariant here: at most ONE
    # marked-pending RDD exists at any time — dense rounds keep counts
    # as a PLAIN plan (the next top-collect job both recounts and
    # truncates the pending words), sparse rounds use only EAGER
    # checkpoints (self-truncating: the materializing job's final RDD
    # is the marked one).
    counts = (_pair_rows(words).groupBy("a", "b")
              .agg(F.sum("n").alias("cnt"))
              .localCheckpoint(eager=True))
    counts_ram = True
    merges: list[dict] = []
    step = 0
    while len(merges) < n_merges:
        want = min(batch, n_merges - len(merges))
        # scan depth 16x batch (round 9; was 4x). Honest result: the
        # sf1 2k-merge audit measured no acceptance lift at depth 512
        # vs 128 — acceptance is NOT prefix-limited but
        # SYMBOL-CONCENTRATED (the top of the ranking shares the few
        # hottest tokens, so a deeper prefix adds more of the same
        # conflicts). The deeper scan is kept (a few KB more collect,
        # and it can only help on corpora with flatter symbol
        # distributions); the policy is unchanged (greedy disjoint
        # scan over the global ranking prefix); oracle + python twin
        # use the identical depth.
        _t0 = _time.time()
        top = (counts.orderBy(F.desc("cnt"), "a", "b")
               .limit(16 * batch).collect())
        if _trace:
            kind = "top" if counts_ram else "recount+top"
            print(f"    [bpe] round@{len(merges)} {kind} "
                  f"{_time.time() - _t0:.2f}s", flush=True)
        used: set[str] = set()
        accepted: list[tuple[str, str, int]] = []
        for row in top:
            if len(accepted) >= want or row["cnt"] <= 0:
                break
            a, b = row["a"], row["b"]
            if a in used or b in used:
                continue
            used.update((a, b))
            accepted.append((a, b, int(row["cnt"])))
        if not accepted:
            break
        sites = sum(cnt for _, _, cnt in accepted)
        _t0 = _time.time()
        if sites >= delta_frac * n_seq:
            # dense round: a full recount is cheaper than delta's
            # extra jobs + full-corpus rewrite map (see delta_frac). The recount plan stays
            # LAZY — the next round's top-collect executes it, and that
            # job's lineage walk is also what truncates the pending
            # words checkpoint (see the lineage rule above).
            rewritten = words
            for left, right, _ in accepted:
                rewritten = rewritten.select(
                    "n", _merge_expr(left, right).alias("syms"))
            words = rewritten.localCheckpoint(eager=False)
            counts = (_pair_rows(words).groupBy("a", "b")
                      .agg(F.sum("n").alias("cnt")))
            counts_ram = False
        else:
            # sparse round: exact delta over changed sequences only —
            # a merge provably leaves every pair of an unchanged
            # sequence alone, so the explodes cost O(changed), not
            # O(corpus). All checkpoints here are EAGER (the lineage
            # rule); the preceding top-collect already truncated any
            # pending dense-round words.
            if not counts_ram:
                # dense->sparse transition: materialize the last dense
                # recount once so deltas fold into a RAM base
                counts = counts.localCheckpoint(eager=True)
                counts_ram = True
            both = words.select("n", F.col("syms").alias("_old"),
                                F.col("syms"))
            for left, right, _ in accepted:
                both = both.select("n", "_old",
                                   _merge_expr(left, right).alias("syms"))
            both = both.localCheckpoint(eager=True)
            touched = both.filter(F.col("syms") != F.col("_old"))
            delta = (_pair_rows(touched.select("n", "syms"))
                     .unionByName(_pair_rows(
                         touched.select((-F.col("n")).alias("n"),
                                        F.col("_old").alias("syms")))))
            counts = (counts.unionByName(
                          delta.groupBy("a", "b")
                          .agg(F.sum("n").alias("cnt")))
                      .groupBy("a", "b").agg(F.sum("cnt").alias("cnt"))
                      .filter(F.col("cnt") > 0)
                      .localCheckpoint(eager=True))
            words = both.select("n", "syms")
        if _trace:
            mode = ("full(lazy)" if sites >= delta_frac * n_seq
                    else "delta")
            print(f"    [bpe] round@{len(merges)} {mode} rewrite "
                  f"(sites={sites}) {_time.time() - _t0:.2f}s",
                  flush=True)
        for left, right, cnt in accepted:
            merges.append({"step": step, "left": left, "right": right,
                           "pair_count": cnt})
            step += 1
    return merges


def bpe_tokenize(docs: DataFrame, merges: list[dict],
                 text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_pieces): apply the learned merges to every document —
    map-only (the merge list is folded into the plan as n_merges chained
    rewrite expressions over each word's symbol array)."""
    d = docs.select(
        F.col(id_col),
        F.explode(tokens(normalize(F.col(text_col)))).alias("word"))
    d = d.filter(F.col("word") != "").select(
        id_col, _chars("word").alias("syms"))
    for m in merges:
        d = d.select(id_col, _merge_expr(m["left"], m["right"])
                     .alias("syms"))
    return (d.select(id_col, F.size("syms").alias("k"))
            .groupBy(id_col).agg(F.sum("k").cast("long").alias("n_pieces")))


def bpe_tokenize_ranked(docs: DataFrame, merges: list[dict],
                        text_col: str = "text",
                        id_col: str = "doc_id",
                        pretokenize: bool = True) -> DataFrame:
    """(doc_id, n_pieces) via the RANK-based tokenizer — the shape that
    survives a realistic vocabulary. ``bpe_tokenize`` folds one rewrite
    expression per merge into the plan: fine at ~100 merges, but a 32k
    vocabulary would blow whole-stage codegen (expression tree and
    generated-method size scale with merge count). Here the merge table
    ships ONCE to the workers as a rank dict inside an Arrow-batched
    mapInPandas, and each word applies its best-ranked mergeable pair
    repeatedly — the standard tokenizer-inference algorithm. Per-batch
    word memoization makes repeated words O(1). Equality with the fold
    path is pinned in tests/test_bpe.py.

    Map-only, zero shuffle before the per-doc sum; the rank dict is
    O(vocab) driver->worker bytes, shipped once per task via the
    serialized closure (at 32k merges, ~1 MB — broadcast-sized).
    """
    ranks = {(m["left"], m["right"]): i for m in merges
             for i in [m["step"]]}
    pretok = bool(pretokenize)

    def run(batches):
        import re

        import pandas as _pd

        memo: dict[str, int] = {}

        def n_pieces_of(word: str) -> int:
            got = memo.get(word)
            if got is not None:
                return got
            syms = list(word)
            while len(syms) >= 2:
                best_rank, best_i = None, -1
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_rank is None:
                    break
                # apply THIS merge greedily left-to-right across the
                # word (matching _merge_expr's non-overlapping fold)
                left, right = syms[best_i], syms[best_i + 1]
                out, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == left
                            and syms[i + 1] == right):
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            memo[word] = len(syms)
            return len(syms)

        for pdf in batches:
            out = {"doc_id": [], "n_pieces": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # NULL text -> 0 pieces (str(None) would tokenize the
                # literal word 'none'), matching normalize()'s NULL
                # propagation and the DuckDB twin's LEFT JOIN zero
                t = "" if text is None else str(text)
                t = re.sub(r"[^a-z0-9 ]", " ", t.lower())
                t = re.sub(r" +", " ", t).strip()
                # pretokenize=False: the whole normalized text is one
                # symbol sequence (spaces are symbols) — the twin of
                # sequence_counts training
                words = ([w for w in t.split(" ") if w] if pretok
                         else ([t] if t else []))
                out["doc_id"].append(doc_id)
                out["n_pieces"].append(sum(n_pieces_of(w) for w in words))
            yield _pd.DataFrame(out)

    return (docs.select(F.col(id_col).alias("doc_id"),
                        F.col(text_col).alias("text"))
            .mapInPandas(run, schema="doc_id long, n_pieces long"))
