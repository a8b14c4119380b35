"""Driver-window accounting (ADVICE r4 + VERDICT r4 gap #1): the driver's
per-round CORRECTNESS sweep checks only the FIRST 50 entries of
__spark_entry__.QUERIES. Round 3 hid five wrong-answer queries past that
boundary for two rounds. These tests make the blind spot structural
instead of procedural: the verified history is derived from the
committed CORRECTNESS_r*.json files, so the invariant self-updates as
the driver records new rounds."""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _entry_module():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ever_checked() -> set[str]:
    names: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        names.update(json.load(open(path)))
    return names


def test_never_checked_queries_sit_inside_the_window():
    mod = _entry_module()
    order = list(mod.queries())
    never = set(order) - _ever_checked()
    outside = sorted(never - set(order[:WINDOW]))
    assert not outside, (
        f"{outside} have never earned a driver CORRECTNESS row but sit "
        f"past position {WINDOW} — rotate them into the window")


def test_every_oracle_has_a_query():
    mod = _entry_module()
    missing = sorted(set(mod.oracle_sql()) - set(mod.queries()))
    assert not missing, f"oracle entries without a query: {missing}"


def test_no_oracle_backed_query_is_stale_beyond_two_rounds():
    """Oracle-backed queries must re-earn a driver row at least every
    ~2 rounds (VERDICT r4 'keep rotating' ask). 'Stale' = last green row
    two or more rounds before the latest recorded round AND resting
    outside the window this round."""
    mod = _entry_module()
    order = list(mod.queries())
    oracled = set(mod.oracle_sql())
    last_round: dict[str, int] = {}
    rounds = []
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        r = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        rounds.append(r)
        for name in json.load(open(path)):
            last_round[name] = max(last_round.get(name, 0), r)
    latest = max(rounds)
    stale = sorted(
        n for n in order[WINDOW:]
        if n in oracled and last_round.get(n, 0) <= latest - 2)
    assert not stale, (
        f"oracle-backed queries {stale} last verified in round "
        f"<= r{latest - 2} yet rest outside the window")


def test_newly_oracled_queries_front_the_window():
    """Round-7 rule: a rows-only green stops counting as 'verified' the
    moment the query gains an oracle entry, so an upgraded query
    re-sorts to the never-checked front and earns its first HASH-checked
    driver row the very next round (instead of resting on a no_oracle
    green for a full rotation)."""
    mod = _entry_module()
    order = list(mod.queries())
    oracled = set(mod.oracle_sql())
    hash_green: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        for name, row in json.load(open(path)).items():
            if row.get("hash_match") is True:
                hash_green.add(name)
    never_hash_checked = [n for n in order
                          if n in oracled and n not in hash_green]
    outside = sorted(set(never_hash_checked) - set(order[:WINDOW]))
    assert not outside, (
        f"{outside} have an oracle but no hash-checked driver row, yet "
        f"sit past position {WINDOW} — the no_oracle-discount rule in "
        f"_last_verified_round should front them")


def test_registry_capacity_survives_two_projected_rounds():
    """VERDICT r6 item 3: with WINDOW=50 and the <=2-round staleness
    bar, the derived rotation is only satisfiable while the registry
    stays under ~150 - growth. This test SIMULATES two future driver
    rounds — each fronts the 50 stalest, then GROWTH projected new
    queries join the registry — and asserts the staleness invariant
    still holds after each, so the capacity cliff becomes a test
    failure in the round BEFORE it binds (consolidate overlapping
    queries when it fires; see q_ann_variants for the pattern)."""
    GROWTH = 12          # addition budget per round (historical mean;
                         # adding more than this in one round is itself
                         # a capacity decision — this test prices it)

    mod = _entry_module()
    sim_last: dict[str, int] = {}
    rounds = [0]
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        r = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        rounds.append(r)
        for name in json.load(open(path)):
            sim_last[name] = max(sim_last.get(name, 0), r)
    latest = max(rounds)
    names = list(mod.QUERIES)
    pos = {n: i for i, n in enumerate(names)}
    for future in (latest + 1, latest + 2):
        order = sorted(names, key=lambda n: (sim_last.get(n, 0),
                                             pos.get(n, 10_000)))
        for n in order[:WINDOW]:
            sim_last[n] = future
        names = names + [f"_projected_r{future}_{i}" for i in range(GROWTH)]
        order = sorted(names, key=lambda n: (sim_last.get(n, 0),
                                             pos.get(n, 10_000)))
        stale = [n for n in order[WINDOW:]
                 if sim_last.get(n, 0) <= future - 2]
        assert not stale, (
            f"registry at {len(names)} queries can no longer keep "
            f"staleness <= 2 rounds after simulated round {future}: "
            f"{stale[:8]}... — consolidate overlapping queries NOW "
            f"(the cliff binds next round)")
