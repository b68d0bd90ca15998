"""Pure-Python third implementations for the model-based curation trio
(semdedup / ccnet_buckets / classifier_score).

The driver gate compares Spark vs DuckDB, but classifier_score runs the
SAME md5 arithmetic in both engines and semdedup's oracle recomputes the
same centroid sampling — a shared-recipe bug would pass the oracle. These
tests recompute each op from the raw parquet with hashlib/numpy/Counter
and assert exact (or rounded-boundary-tolerant) agreement.
"""

import hashlib
import math
import re

import numpy as np
import pandas as pd
import pytest

from deusu_spark import pipelines

SF_DIR = "/root/testdata/sf0.001"


def _round_half_up(x: float, nd: int) -> float:
    m = 10**nd
    return math.copysign(math.floor(abs(x) * m + 0.5) / m, x)


def _tokens_py(text: str) -> list[str]:
    return [t for t in re.split("[^a-z0-9]+", text.lower()) if t]


@pytest.fixture(scope="module")
def docs_pdf():
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


def test_classifier_score_python_recompute(spark, docs_pdf):
    got = {
        r["doc_id"]: r
        for r in pipelines.q_classifier_score(spark, SF_DIR).collect()
    }
    n_checked = 0
    for _, row in docs_pdf.iterrows():
        toks = _tokens_py(row["text"])
        if not toks:
            assert row["doc_id"] not in got
            continue
        ws = []
        for t in toks:
            b = int(hashlib.md5(f"f:{t}".encode()).hexdigest()[:15], 16) % (
                pipelines.FT_BUCKETS
            )
            wh = hashlib.md5(f"w:{b}".encode()).hexdigest()[:2]
            ws.append((int(wh, 16) - 127.5) / 127.5)
        exp = _round_half_up(sum(ws) / len(ws), 5)
        g = got[row["doc_id"]]
        assert g["n_tokens"] == len(ws)
        # float summation order may differ at the 5th decimal boundary
        assert abs(g["score"] - exp) <= 1.5e-5
        if abs(exp) > 1e-4:
            assert g["keep"] == (exp > 0)
        n_checked += 1
    assert n_checked >= 100


def test_ccnet_buckets_python_recompute(spark, docs_pdf):
    got = {
        r["doc_id"]: r for r in pipelines.q_ccnet_buckets(spark, SF_DIR).collect()
    }
    from collections import Counter

    model: Counter = Counter()
    doc_toks = {}
    for _, row in docs_pdf.iterrows():
        toks = _tokens_py(row["text"])
        doc_toks[row["doc_id"]] = toks
        model.update(toks)
    total = sum(model.values())
    lp = {
        d: _round_half_up(
            sum(math.log(model[t] / total) for t in toks) / len(toks), 5
        )
        for d, toks in doc_toks.items()
        if toks
    }
    for d, v in lp.items():
        assert abs(got[d]["logprob"] - v) <= 1.5e-5
    # NTILE(3) per language over (logprob desc, doc_id asc): first
    # (n mod 3) terciles take the extra row
    langs = docs_pdf.set_index("doc_id")["lang"].to_dict()
    by_lang: dict[str, list[int]] = {}
    for d in lp:
        by_lang.setdefault(langs[d], []).append(d)
    names = pipelines._CCNET_NAMES
    for lang, ds in by_lang.items():
        # rank on the SPARK-rounded value so boundary rounding can't flip
        # the recomputed order relative to what both engines ranked on
        ds.sort(key=lambda d: (-got[d]["logprob"], d))
        n = len(ds)
        base, extra = divmod(n, 3)
        sizes = [base + (1 if i < extra else 0) for i in range(3)]
        i = 0
        for bidx, sz in enumerate(sizes):
            for d in ds[i : i + sz]:
                assert got[d]["bucket"] == names[bidx], (lang, d)
            i += sz


def test_semdedup_python_recompute(spark, docs_pdf):
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    got = {r["vec_id"]: r for r in pipelines.q_semdedup(spark, SF_DIR).collect()}
    V = np.asarray(emb.sort_values("vec_id")["embedding"].to_list(), dtype=np.float64)
    ids = emb.sort_values("vec_id")["vec_id"].to_numpy()
    nrm = np.linalg.norm(V, axis=1)
    C = V[ids < pipelines.IVF_K]
    cn = nrm[ids < pipelines.IVF_K]
    sims = (V @ C.T) / (nrm[:, None] * cn[None, :])
    sims = np.sign(sims) * np.floor(np.abs(sims) * 1e4 + 0.5) / 1e4
    cell = np.argmax(sims, axis=1)  # first max == lowest cell on ties
    dup_of: dict[int, int] = {}
    for c in range(pipelines.IVF_K):
        members = ids[cell == c]
        M = V[cell == c]
        mn = nrm[cell == c]
        if len(members) < 2:
            continue
        S = (M @ M.T) / (mn[:, None] * mn[None, :])
        S = np.sign(S) * np.floor(np.abs(S) * 1e4 + 0.5) / 1e4
        for j in range(len(members)):
            lower = [
                int(members[i])
                for i in range(j)
                if S[i, j] >= pipelines.SEMDEDUP_T
            ]
            if lower:
                dup_of[int(members[j])] = min(lower)
    assert len(got) == len(ids)
    n_dropped = 0
    for k, vid in enumerate(ids):
        g = got[int(vid)]
        assert g["cell"] == cell[k]
        if int(vid) in dup_of:
            assert not g["keep"]
            assert g["dup_of"] == dup_of[int(vid)]
            n_dropped += 1
        else:
            assert g["keep"] and g["dup_of"] is None
    # the fixture thresholds were chosen so the op actually prunes
    assert n_dropped >= 1
