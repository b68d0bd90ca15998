"""Deterministic synthetic transcript corpus (FIXTURES.md F1) + doc metadata
mapping (SURVEY §7.4 / FIXTURES F3).

Everything is seeded and pure — no wall clock, no external data. The same
generator feeds the pure-Python oracle (via pandas) and the Spark engine
(via spark.createDataFrame / parquet), so per-turn ``text`` equality between
the two sides holds by construction and is re-verified in tests.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

SEED = 42
VOCAB_SIZE = 5000
ZIPF_S = 1.1
HOT_TERMS = ("linux", "google", "java", "ubuntu", "firefox")
GERMAN_SPRINKLE = ("und", "der", "die", "das", "nicht", "über")
STOP_SPRINKLE = ("the", "and", "to", "in", "it")
ROLES = ("user", "assistant", "system", "tool")
EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)


def crc32(s: str) -> int:
    """Standard reflected CRC-32 (poly 0xEDB88320, seed 0xFFFFFFFF) —
    identical to the reference's Hash.pas:28-82 CalcCRC."""
    return zlib.crc32(s.encode("utf-8")) & 0xFFFFFFFF


def turns_per_conv(k: int) -> int:
    """FIXTURES F1: T_k = 1 + (k*2654435761 mod 19)."""
    return 1 + (k * 2654435761) % 19


def gen_transcripts(
    n_conv: int, seed: int = SEED, start: int = 0, rare_every: int = 0
) -> pd.DataFrame:
    """Generate the transcripts table (conv_id, turn_idx, role, text, tool,
    ts) deterministically. ~10 turns/conversation on average.

    ``start`` offsets the conversation-id range (conv{start:08d}…) so large
    corpora can be generated in bounded-RAM chunks — pass a per-chunk seed
    (e.g. SEED + start) for distinct content; defaults reproduce the
    original single-call output byte-for-byte.

    ``rare_every``: every Nth turn additionally carries ONE
    globally-unique token (``r<conv>x<turn>``) — the Heaps-law knob: the
    vocabulary then grows linearly with the corpus (~turns/N extra
    terms), which the fixed Zipf vocabulary cannot exercise. 0 = off
    (default; stock corpus unchanged)."""
    rng = np.random.default_rng(seed)

    conv_k = np.arange(start, start + n_conv, dtype=np.int64)
    sizes = 1 + (conv_k * 2654435761) % 19
    total = int(sizes.sum())

    conv_idx = np.repeat(conv_k, sizes)
    turn_idx = np.concatenate([np.arange(s) for s in sizes]).astype(np.int32)
    grow = np.arange(total, dtype=np.int64)  # global row index in gen order

    # Zipf(s=1.1) vocabulary w0000..w4999
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    probs = ranks ** (-ZIPF_S)
    probs /= probs.sum()
    vocab = np.array([f"w{i:04d}" for i in range(VOCAB_SIZE)])

    n_tokens = rng.integers(5, 121, size=total)
    tok_total = int(n_tokens.sum())
    toks = rng.choice(vocab, size=tok_total, p=probs)
    bounds = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(n_tokens, out=bounds[1:])

    hot_mask = rng.random(total) < 0.30
    hot_pick = rng.integers(0, len(HOT_TERMS), size=total)
    de_mask = rng.random(total) < 0.10
    de_pick = rng.integers(0, len(GERMAN_SPRINKLE), size=(total, 3))
    stop_mask = rng.random(total) < 0.50
    stop_pick = rng.integers(0, len(STOP_SPRINKLE), size=total)
    tool_mask = rng.random(total) < 0.15
    tool_pick = rng.integers(0, 8, size=total)

    texts = []
    for i in range(total):
        words = list(toks[bounds[i] : bounds[i + 1]])
        if hot_mask[i]:
            words.insert(int(len(words) // 2), HOT_TERMS[hot_pick[i]])
        if de_mask[i]:
            words.extend(GERMAN_SPRINKLE[j] for j in de_pick[i])
        if stop_mask[i]:
            words.append(STOP_SPRINKLE[stop_pick[i]])
        if rare_every and i % rare_every == 0:
            words.append(f"r{int(conv_idx[i])}x{int(turn_idx[i])}")
        texts.append(" ".join(words))

    roles = [ROLES[(int(k) + int(t)) % 4] for k, t in zip(conv_idx, turn_idx)]
    tools = [f"tool{tool_pick[i]}" if tool_mask[i] else "" for i in range(total)]
    ts = [EPOCH + timedelta(seconds=60 * int(g)) for g in grow]

    return pd.DataFrame(
        {
            "conv_id": [f"conv{int(k):08d}" for k in conv_idx],
            "turn_idx": turn_idx,
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts,
        }
    )


# ---------------------------------------------------------------------------
# Transcript → document metadata mapping (the decided SURVEY §7.4 contract):
#   doc      = one turn
#   url      = f"{conv_id}/{turn_idx}"   (host = conv_id ⇒ per-host collapse
#                                         becomes per-conversation collapse)
#   title    = role
#   desc     = first 255 chars of text, trimmed (ParserClass.pas:1282-1284)
#   backlinks   = 1 + crc32(url) % 1000            (FIXTURES F3, heavy-tailed)
#   domain_rank = -1 unless crc32(host) % 10 == 0, else crc32(host) % 1e6
# All reference scoring formulas then apply unchanged.
# ---------------------------------------------------------------------------


def doc_url(conv_id: str, turn_idx: int) -> str:
    return f"{conv_id}/{turn_idx}"


def doc_backlinks(url: str) -> int:
    return 1 + crc32(url) % 1000


def doc_domain_rank(host: str) -> int:
    c = crc32(host)
    return -1 if c % 10 else c % 1_000_000


def write_parquet(df: pd.DataFrame, path: str) -> None:
    df = df.copy()
    # Spark cannot read TIMESTAMP(NANOS); store microsecond precision
    df["ts"] = df["ts"].astype("datetime64[us, UTC]")
    # bounded row groups: pandas' default writes ONE row group, which is
    # unsplittable — Spark would read (and range-shuffle-write) the whole
    # corpus in a single map task, serializing the build's first stage.
    # 50k-row groups (~20 MB) give the scan row-group-granular parallelism.
    df.to_parquet(path, index=False, row_group_size=50_000)
