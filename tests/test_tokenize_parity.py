"""JVM column-expression tokenizer (build.tokenized_docs) vs the pure-Python
parity oracle (build._tokenize_partition / textproc.py), row for row.

The build's hot path is the JVM version; the Python version exists only to
pin reference semantics (ParserClass.pas:1136-1204, ImportData.dpr:316-320,
GenDb.dpr:381-402). Any divergence — folding, entity decode, token regex,
stopword gate, dedup order, 10k cap, flags, filter byte, host elements —
fails here before it can fail rank-identity.
"""

import pandas as pd
import pytest

from deusu_spark import synth
from deusu_spark.build import DOCS_SCHEMA, _tokenize_partition, tokenized_docs

TRICKY = [
    # (role, text, tool)
    ("user", "Über die Straße: M&auml;rz &amp; Co &nbsp;und so", ""),
    ("assistant", "foo bar-baz 42x _lead -dash 9_b", "tool1"),
    ("system", "", ""),
    ("tool", "   leading and trailing   ", ""),
    ("user", "a" * 300 + " short", ""),          # 255-char token cap
    ("assistant", "the and to in it du der die", ""),  # all stopwords
    ("user", "dies ist eine deutsche seite", ""),       # german detection
    ("system", "x " * 200, "grep-v2"),                   # repeated token
    ("user", "linux the linux kernel conv", ""),         # dedup + url flag
    ("assistant", "UPPER Case MiXeD &Auml;",""),
    ("user", "&amp;amp; &amp;nbsp; &reg;&copy;", ""),   # entity edge order
    ("tool", "num3ric 007 9-9_9", "t.x/y"),
]


def _inputs(spark):
    rows = []
    for i, (role, text, tool) in enumerate(TRICKY):
        rows.append((f"conv{i:08d}", i % 3, role, text, tool))
    # plus a slice of the synthetic corpus (hot terms, german sprinkle, …)
    for r in synth.gen_transcripts(30).itertuples(index=False):
        rows.append((r.conv_id, int(r.turn_idx), r.role, r.text, r.tool))
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool"]
    )
    df = spark.createDataFrame(pdf)
    df = df.withColumn("rank", df.turn_idx.cast("int") - 1).withColumn(
        "backlinks", (df.turn_idx + 1).cast("long")
    )
    return df.repartitionByRange(2, "conv_id", "turn_idx").sortWithinPartitions(
        "conv_id", "turn_idx"
    )


@pytest.fixture(scope="module")
def both(spark):
    src = _inputs(spark)
    jvm = tokenized_docs(src).toPandas()
    py = src.mapInPandas(_tokenize_partition, schema=DOCS_SCHEMA).toPandas()
    key = ["conv_id", "turn_idx"]
    return (
        jvm.sort_values(key).reset_index(drop=True),
        py.sort_values(key).reset_index(drop=True),
    )


def test_row_counts(both):
    jvm, py = both
    assert len(jvm) == len(py) > 30


def test_scalar_columns_identical(both):
    jvm, py = both
    for col in [
        "_pid", "_rn", "conv_id", "turn_idx", "url", "host", "title",
        "description", "dl", "german", "fd", "he", "rank", "backlinks",
    ]:
        assert jvm[col].tolist() == py[col].tolist(), col


def test_terms_and_flags_identical(both):
    jvm, py = both
    for i in range(len(jvm)):
        assert list(jvm["terms"][i]) == list(py["terms"][i]), (
            jvm["conv_id"][i],
            jvm["turn_idx"][i],
        )
        assert list(jvm["tflags"][i]) == list(py["tflags"][i]), (
            jvm["conv_id"][i],
            jvm["turn_idx"][i],
        )


def test_no_python_in_build_tokenize_plan(spark):
    """The staged-docs projection must contain no Python evaluation node."""
    src = _inputs(spark)
    plan = tokenized_docs(src)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
