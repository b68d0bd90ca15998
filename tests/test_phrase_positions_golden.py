"""Constructed-fixture golden for q_phrase_positions (the driver-gate
relational twin of the positions sidecar): oracle-independent pins on
counts, start positions, and adjacency strictness."""

import os
import tempfile

import pandas as pd
from pyspark.sql import functions as F  # noqa: F401

from deusu_spark import pipelines


def _docs_dir(texts):
    d = tempfile.mkdtemp(prefix="phrase_golden_")
    df = pd.DataFrame(
        [(i, t, "en", "web") for i, t in enumerate(texts)],
        columns=["doc_id", "text", "lang", "source"],
    )
    df["n_chars"] = df["text"].str.len()
    df.to_parquet(os.path.join(d, "documents.parquet"))
    return d


def test_phrase_positions_constructed(spark):
    texts = [
        "table hash join",              # 0: one match at start 0
        "a table hash b table hash",    # 1: matches at 1 and 4
        "table x hash",                 # 2: non-adjacent -> no match
        "hash table",                   # 3: reversed -> no match
        "TABLE HASH upper case",        # 4: lowercased -> match at 0
        "nothing here",                 # 5
    ]
    d = _docs_dir(texts)
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in pipelines.q_phrase_positions(spark, d).collect()
    }
    assert got == {0: (1, 0), 1: (2, 1), 4: (1, 0)}


def test_phrase_positions_no_eval_python(spark):
    """The adjacency join stays JVM-side: no Python UDF in the plan."""
    d = _docs_dir(["table hash"])
    plan = pipelines.q_phrase_positions(spark, d)._jdf.queryExecution()
    assert "EvalPython" not in plan.executedPlan().toString()


def test_near_positions_constructed(spark):
    texts = [
        "customer join now",            # 0: span 1 -> 1 pair
        "customer a b c d e join",      # 1: span 6 -> outside window
        "join x customer y join",       # 2: spans 2 and 2 -> 2 pairs
        "customer only",                # 3
        "join only",                    # 4
        "customer a join b customer",   # 5: pairs (0,2),(2,4): spans 2,2
    ]
    d = _docs_dir(texts)
    got = {
        r["doc_id"]: (r["n_pairs"], r["min_span"])
        for r in pipelines.q_near_positions(spark, d).collect()
    }
    assert got == {0: (1, 1), 2: (2, 2), 5: (2, 2)}


def test_near_positions_no_eval_python(spark):
    d = _docs_dir(["customer join"])
    plan = pipelines.q_near_positions(spark, d)._jdf.queryExecution()
    assert "EvalPython" not in plan.executedPlan().toString()
