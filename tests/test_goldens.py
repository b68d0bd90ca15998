"""Frozen golden results (FIXTURES.md F2): the oracle's top-10 lists for the
reference query set over the tiny corpus, captured once and checked in.
Guards the oracle itself against accidental semantic drift — the engine is
checked against the oracle, the oracle against these goldens."""

import json
import os

import pytest

from deusu_spark import synth
from deusu_spark.oracle import oracle

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens_tiny.json")


@pytest.fixture(scope="module")
def goldens():
    with open(GOLDENS) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def idx():
    return oracle.build_index(synth.gen_transcripts(200), fancy_threshold=300)


def test_oracle_matches_frozen_goldens(idx, goldens):
    for q, exp in goldens.items():
        got = [[d, s] for d, s in oracle.search(idx, q, k=10)]
        assert got == exp["k10"], q


def test_bm25_oracle_matches_frozen_goldens(idx, goldens):
    for q, exp in goldens.items():
        got = oracle.search_bm25(idx, q, k=10)
        for (gd, gs), (ed, es) in zip(got, exp["bm25_k10"]):
            assert gd == ed and abs(gs - es) < 1e-9, q
        assert len(got) == len(exp["bm25_k10"]), q
