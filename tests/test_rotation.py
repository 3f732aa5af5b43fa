"""Pin the driver-window rotation rule (queries/__init__.py).

The external driver verifies only the first WINDOW entries of queries();
through round 5 the ordering was a hand-maintained list and drifted
(orders_expectations fell out of the tracking comment).  From round 6 the
window is COMPUTED from the CORRECTNESS_r*.json history; these tests pin
the rule so it cannot regress:

  1. reference-core queries always occupy the first slots;
  2. never-green oracle-paired queries enter ahead of any green;
  3. greens re-enter stalest-first;
  4. rows-only queries never take a window slot;
  5. the full cycle bound: simulating rounds where every in-window
     query goes green, each oracle-paired query re-earns a row at
     least every ceil(len(oracle-core)/(WINDOW-core)) rounds.
"""

from __future__ import annotations

import math

from txf_continuous_data_pipeline_spark import queries as Q


def _fake_registry(n_oracle=80, n_rows_only=5):
    reg = {name: (None, "SELECT 1") for name in Q.CORE}
    for i in range(n_oracle):
        reg[f"oq{i:03d}"] = (None, "SELECT 1")
    for i in range(n_rows_only):
        reg[f"ro{i:03d}"] = (None, None)
    return reg


def test_core_always_first():
    reg = _fake_registry()
    order = Q.rotation_order(reg, history={})
    assert order[: len(Q.CORE)] == Q.CORE
    # even when every core query is multi-round green
    order = Q.rotation_order(reg, history={n: 5 for n in Q.CORE})
    assert order[: len(Q.CORE)] == Q.CORE


def test_never_green_enters_before_any_green():
    reg = _fake_registry()
    hist = {f"oq{i:03d}": 1 + (i % 4) for i in range(40)}  # 40 green
    order = Q.rotation_order(reg, history=hist)
    tail = order[len(Q.CORE) :]
    never = [n for n in tail if n.startswith("oq") and n not in hist]
    greens = [n for n in tail if n in hist]
    # all never-green precede all greens
    assert max(tail.index(n) for n in never) < min(
        tail.index(n) for n in greens
    )


def test_greens_reenter_stalest_first():
    reg = _fake_registry(n_oracle=10, n_rows_only=0)
    hist = {f"oq{i:03d}": (i % 5) + 1 for i in range(10)}
    order = Q.rotation_order(reg, history=hist)
    rounds = [hist[n] for n in order[len(Q.CORE) :]]
    assert rounds == sorted(rounds)


def test_rows_only_never_in_window():
    reg = _fake_registry(n_oracle=Q.WINDOW + 20, n_rows_only=8)
    order = Q.rotation_order(reg, history={})
    assert not any(n.startswith("ro") for n in order[: Q.WINDOW])
    # rows-only entries still appear (in the tail)
    assert sum(n.startswith("ro") for n in order) == 8


def test_rotation_is_deterministic():
    reg = _fake_registry()
    hist = {f"oq{i:03d}": 1 + (i % 3) for i in range(30)}
    assert Q.rotation_order(reg, hist) == Q.rotation_order(reg, hist)


def test_cycle_bound_under_simulated_rounds():
    """If every in-window query goes green each round, no oracle-paired
    query waits more than ceil(pool/slots) rounds between rows."""
    reg = _fake_registry(n_oracle=121, n_rows_only=4)
    oracle = [n for n in reg if reg[n][1] is not None and n not in Q.CORE]
    slots = Q.WINDOW - len(Q.CORE)
    bound = math.ceil(len(oracle) / slots)

    hist: dict[str, int] = {}
    last_row = {n: 0 for n in oracle}
    for rnd in range(1, 3 * bound + 1):
        window = Q.rotation_order(reg, dict(hist))[: Q.WINDOW]
        for n in window:
            hist[n] = rnd
            if n in last_row:
                gap = rnd - last_row[n]
                assert gap <= bound, (n, rnd, gap)
                last_row[n] = rnd
    # after warm-up every oracle-paired query has a row
    assert all(v > 0 for v in last_row.values())


def test_live_registry_debt_all_in_window():
    """Against the REAL registry + on-disk history: every oracle-paired
    query either has a green row already or sits inside this round's
    window - debt never waits a round."""
    order = Q.rotation_order()
    window = set(order[: Q.WINDOW])
    hist = Q._load_green_history()
    for name, (_, sql) in Q.REGISTRY.items():
        if sql is None:
            continue
        assert name in hist or name in window, name


def test_live_registry_core_present():
    assert all(n in Q.REGISTRY for n in Q.CORE)
    order = Q.rotation_order()
    assert order[: len(Q.CORE)] == Q.CORE


def test_retry_reenters_ahead_of_greens():
    """A query in RETRY (changed semantics/oracle) is treated as
    never-green: it re-enters the window ahead of every green even
    when its old form has a recent green row."""
    reg = _fake_registry()
    hist = {f"oq{i:03d}": 1 + (i % 4) for i in range(40)}
    retried = "oq000"
    assert retried in hist
    order = Q.rotation_order(reg, history=hist)
    base_pos = order.index(retried)
    try:
        Q.RETRY = frozenset(Q.RETRY | {retried})
        order2 = Q.rotation_order(reg, history=hist)
        greens = [
            n for n in order2[len(Q.CORE):]
            if n in hist and n not in Q.RETRY
        ]
        assert order2.index(retried) < min(order2.index(n) for n in greens)
        assert order2.index(retried) <= base_pos
    finally:
        Q.RETRY = frozenset(Q.RETRY - {retried})


def test_live_retry_in_window():
    """Every RETRY name is a real oracle-paired registry entry and sits
    inside this round's window (the point of the mechanism)."""
    order = Q.rotation_order()
    window = set(order[: Q.WINDOW])
    for name in Q.RETRY:
        assert name in Q.REGISTRY and Q.REGISTRY[name][1] is not None
        assert name in window, name


def test_text_family_split_preserves_registration_order():
    """r11 verdict #7: queries/text.py was split by family; the split
    must be rotation-invariant. Pin that (a) every _TEXT_ORDER query
    is registered, (b) the text-family slice of the REAL registry is
    contiguous and in exactly the pinned pre-split order (the facade's
    reorder stanza), and (c) the slice starts where the module import
    order puts it (after timeseries/relational, before similarity) -
    so rotation_order's registration-order tie-break is unchanged by
    the split."""
    from txf_continuous_data_pipeline_spark.queries import REGISTRY
    from txf_continuous_data_pipeline_spark.queries.text import (
        _TEXT_ORDER,
    )

    names = list(REGISTRY)
    assert set(_TEXT_ORDER) <= set(names)
    idx = [names.index(n) for n in _TEXT_ORDER]
    assert idx == list(range(idx[0], idx[0] + len(idx))), (
        "text slice not contiguous/ordered"
    )
    # the families' pre-facade registration (module import order)
    # would NOT be the pinned order - the reorder stanza is
    # load-bearing; guard that someone removing it trips here
    assert names.index("text_stats") < names.index("minhash_neardup")
    assert names.index("dedup_exact_groups") == idx[0]
