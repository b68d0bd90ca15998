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


def _fuzz_strings(n, seed=99):
    """Seeded gnarly strings: unicode mix, entities, umlauts, control chars,
    overlong tokens, '&' edge cases — one batch, one Spark job."""
    import random

    rng = random.Random(seed)
    alphabets = [
        "abcdefghijklmnop ",
        "äöüß ÄÖÜ ",
        "0123456789-_ ",
        "&auml;&ouml;&uuml;&szlig;&amp;&nbsp;&reg;&copy;&",
        "\t\n\r\x0b\x0c ",
        "日本語中文💡 ",
        "!@#$%^*()[]{};:'\",.<>/?\\|`~",
    ]
    out = []
    for _ in range(n):
        parts = []
        for _ in range(rng.randint(0, 12)):
            a = rng.choice(alphabets)
            parts.append("".join(rng.choice(a) for _ in range(rng.randint(1, 30))))
        if rng.random() < 0.1:
            parts.append("x" * rng.randint(250, 300))
        out.append("".join(parts))
    return out


def test_fuzz_parity(spark):
    """300 seeded gnarly texts through both tokenizers — byte-identical
    terms/flags/sidecars."""
    texts = _fuzz_strings(300)
    rows = [
        (f"c{i:05d}", i % 4, ["user", "assistant", "system", "tool"][i % 4],
         t, "" if i % 3 else "tool7")
        for i, t in enumerate(texts)
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool"])
    df = (
        spark.createDataFrame(pdf)
        .withColumn("rank", df_lit(-1))
        .withColumn("backlinks", df_lit(1).cast("long"))
        .repartitionByRange(3, "conv_id", "turn_idx")
        .sortWithinPartitions("conv_id", "turn_idx")
    )
    key = ["conv_id", "turn_idx"]
    jvm = tokenized_docs(df).toPandas().sort_values(key).reset_index(drop=True)
    py = (
        df.mapInPandas(_tokenize_partition, schema=DOCS_SCHEMA)
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert len(jvm) == len(py) == 300
    for col in ["description", "dl", "german", "fd", "he"]:
        assert jvm[col].tolist() == py[col].tolist(), col
    for i in range(len(jvm)):
        assert list(jvm["terms"][i]) == list(py["terms"][i]), repr(texts[i])[:120]
        assert list(jvm["tflags"][i]) == list(py["tflags"][i]), repr(texts[i])[:120]


def df_lit(v):
    from pyspark.sql import functions as F

    return F.lit(v)


def test_no_python_in_build_tokenize_plan(spark):
    """The staged-docs projection must contain no Python evaluation node."""
    src = _inputs(spark)
    plan = tokenized_docs(src)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
