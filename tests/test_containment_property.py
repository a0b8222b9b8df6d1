"""Prefix-filter losslessness, property-tested (no Spark needed).

``dedup_containment``'s scale claim rests on a pigeonhole argument: if
C(A→B) ≥ τ then at least one of A's floor((1-τ)|A|)+1 rarest grams is
in B, so the prefix-gram candidate join loses nothing. The Spark plan
is hash-matched against the DuckDB oracle (driver compare +
tests/test_dedup_containment.py), and this module closes the loop:
the ORACLE — which encodes the same prefix-filter candidates — must
equal a brute-force all-pairs containment model on arbitrary
hypothesis-generated corpora. Spark == oracle == definition.

DuckDB-only, so the property runs in milliseconds per example instead
of Spark job time."""

from __future__ import annotations

import re

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from customer_churn_prediction_spark.text.dedup import (
    CONTAINMENT_THRESHOLD,
    ORACLES,
)

_WORDS = [f"w{i}" for i in range(12)]

_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=14).map(
    " ".join
)


@st.composite
def _corpus(draw):
    """Base docs plus DERIVED docs — token-range fragments, padded
    copies, padded fragments — so high-containment pairs are common
    instead of a ~0.3% accident of uniform sampling (a property that
    almost always compares two empty sets tests nothing)."""
    docs = [draw(_doc) for _ in range(draw(st.integers(2, 5)))]
    for _ in range(draw(st.integers(1, 3))):
        src = docs[draw(st.integers(0, len(docs) - 1))]
        toks = src.split()
        if len(toks) >= 3:
            i = draw(st.integers(0, len(toks) - 3))
            j = draw(st.integers(i + 3, len(toks)))
            frag = " ".join(toks[i:j])
            pad = draw(_doc)
            docs.append(
                draw(
                    st.sampled_from(
                        [frag, (src + " " + pad).strip(),
                         (frag + " " + pad).strip()]
                    )
                )
            )
        else:
            docs.append(src)
    return docs


def _grams(text: str) -> frozenset[tuple[str, str, str]]:
    toks = re.split(r"\s+", text.strip().lower()) if text.strip() else []
    return frozenset(
        (toks[i], toks[i + 1], toks[i + 2])
        for i in range(len(toks) - 2)
    )


def _brute_force(docs: list[str]) -> set[tuple[int, int]]:
    """The pure containment DEFINITION: every directed pair with
    C(A→B) ≥ τ, contained side's gram set no larger (ties to the
    lower doc_id), empty-gram docs excluded."""
    g = {i: _grams(t) for i, t in enumerate(docs)}
    out = set()
    for a, ga in g.items():
        if not ga:
            continue
        for b, gb in g.items():
            if a == b or not gb:
                continue
            smaller = len(ga) < len(gb) or (
                len(ga) == len(gb) and a < b
            )
            if not smaller:
                continue
            if len(ga & gb) / len(ga) >= CONTAINMENT_THRESHOLD:
                out.add((a, b))
    return out


def _oracle(docs: list[str]) -> set[tuple[int, int]]:
    con = duckdb.connect()
    frame = pd.DataFrame(
        {"doc_id": range(len(docs)), "text": docs}
    )
    con.register("documents", frame)
    rows = con.execute(ORACLES["dedup_containment"]).fetchall()
    return {(int(r[0]), int(r[1])) for r in rows}


@settings(max_examples=150, deadline=None)
@given(_corpus())
def test_prefix_filter_oracle_equals_brute_force(docs):
    assert _oracle(docs) == _brute_force(docs)


def test_strategy_is_not_vacuous():
    """The generator must actually produce containment pairs, or the
    property above silently degenerates to comparing empty sets."""
    from hypothesis import find

    found = find(_corpus(), lambda docs: len(_brute_force(docs)) >= 1)
    assert _brute_force(found)


def test_fragment_pair_is_found():
    """Deterministic anchor: a strict fragment inside a larger doc."""
    big = " ".join(_WORDS)               # 12 distinct words, 10 grams
    fragment = " ".join(_WORDS[3:7])     # 4 words, 2 grams, both in big
    got = _oracle([big, fragment])
    assert got == {(1, 0)} == _brute_force([big, fragment])
