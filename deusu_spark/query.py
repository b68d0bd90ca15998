"""Distributed query engine: partition-pruned segment reads → vectorized
varbyte decode → docmeta join → saturating score aggregation → top-k.

Spark mapping of searchservernew.dpr's FindKeys/GenResults lifecycle
(SURVEY §3.1): the per-term sequential bitfield intersection becomes one
declarative plan — union of per-term decoded postings, groupBy(doc_id) with
an all-terms-present filter, left-anti join for NOTs, orderBy/limit top-k —
so Catalyst/AQE pick the physical strategy and nothing funnels through the
driver.

Scale levers (all exercised even though tests run on local[32]):
  - bucket+term predicate pushdown into the parquet/Iceberg scan (the
    crc32&63 partition layout mirrors keys00..63, GenDb.dpr:349)
  - segment metadata (first_doc/last_doc/n/max_static) is read without blobs
    (column pruning) and drives driver-side pruning:
      * AND queries: doc-range interval intersection across terms — only
        segments overlapping every term's coverage are decoded
      * single-term queries: block-max pruning (WAND-style) — segments whose
        score upper bound cannot reach the current top-k threshold are never
        decoded; exact because bounds are true maxima and ties (bound == θ)
        are always decoded
  - two-pass fancy-hits execution (searchservernew.dpr:1836-1855): pass 1
    reads the rank-filtered accelerator lists, falls back to full postings
    when fewer than 1000 results — block-max WAND's semantic ancestor
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import codec
from .build import current_index_dir, static_scores
from .constants import DEFAULT_WEIGHTS, MAX_RESULTS, SCORE_CLAMP
from .queryplan import PlanTerm, compile_query
from .synth import crc32

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("ti", T.IntegerType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("flags", T.IntegerType()),
    ]
)

SCORED_SCHEMA = T.StructType(
    [
        T.StructField("ti", T.IntegerType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)


class SearchEngine:
    def __init__(self, spark: SparkSession, index_root: str):
        self.spark = spark
        self.vdir = current_index_dir(index_root)
        with open(os.path.join(self.vdir, "meta.json")) as f:
            self.meta = json.load(f)
        self.docmeta = spark.read.parquet(os.path.join(self.vdir, "docmeta"))
        self.lexicon = spark.read.parquet(os.path.join(self.vdir, "lexicon"))
        self.postings = spark.read.parquet(os.path.join(self.vdir, "postings"))
        self._docmeta_cols = self.docmeta.select(
            "doc_id", "fd", "he", "rank", "backlinks", "dl"
        ).cache()  # the reference's in-RAM sidecar vectors (LoadCacheData)
        self.lexicon = self.lexicon.cache()
        self._avgdl: float | None = None

    @property
    def avgdl(self) -> float:
        if self._avgdl is None:
            self._avgdl = float(
                self.docmeta.agg(F.avg("dl")).collect()[0][0] or 1.0
            )
        return self._avgdl

    # -- lexicon probe ------------------------------------------------------
    def term_df(self, term: str) -> int:
        b = crc32(term) % 64
        rows = (
            self.lexicon.where((F.col("bucket") == b) & (F.col("term") == term))
            .select("df")
            .collect()
        )
        return int(rows[0]["df"]) if rows else 0

    def compile(self, query: str) -> list[PlanTerm]:
        # prefetch all candidate dfs with ONE bucket-pruned lexicon read
        from .queryplan import host_of, parse_query

        cands = set()
        for kw in parse_query(query):
            key = kw[1:] if kw[:1] in "+-" else kw
            if host_of(key) is None and ":" not in key:
                cands.add(key)
        dfs: dict[str, int] = {}
        if cands:
            conds = None
            for t in cands:
                c = (F.col("bucket") == crc32(t) % 64) & (F.col("term") == t)
                conds = c if conds is None else (conds | c)
            for r in self.lexicon.where(conds).select("term", "df").collect():
                dfs[r["term"]] = int(r["df"])
        return compile_query(
            query, self.meta["n_docs"], lambda t: dfs.get(t, 0)
        )

    # -- public API ----------------------------------------------------------
    def search(
        self,
        query: str,
        k: int = 10,
        weights: dict[str, int] | None = None,
        prune: bool = True,
        mode: str = "deusu",
    ) -> list[tuple[int, int]]:
        """Top-k [(doc_id, score)] by (score desc, doc_id asc).

        mode='deusu': the reference scoring formula (SURVEY §2.6), integer
        scores, rank-identical to the oracle. mode='bm25': textbook
        BM25(k1=1.2, b=0.75) with binary TF and dl = body token count (the
        reference computes WordCount but discards it, SURVEY §2.6) — single
        full-postings pass, float scores.
        """
        w = dict(DEFAULT_WEIGHTS)
        if weights:
            w.update(weights)
        terms = self.compile(query)
        if not terms:
            return []
        # block-max bounds are computed for default deusu weights at build
        prune = prune and w == DEFAULT_WEIGHTS and mode == "deusu"

        if mode == "bm25":
            rows, _ = self._run_pass(
                terms, k, w, use_fancy=False, prune=False,
                need_count=False, mode="bm25",
            )
            return [(d, round(s, 6)) for d, s in rows[:k]]

        fancy_terms = [
            t
            for t in terms
            if t.host is None and t.df > self.meta["fancy_threshold"]
        ]
        if fancy_terms:
            rows, count = self._run_pass(
                terms, k, w, use_fancy=True, prune=prune, need_count=True
            )
            if count >= MAX_RESULTS:
                return [(d, int(s)) for d, s in rows[:k]]
        rows, _ = self._run_pass(
            terms, k, w, use_fancy=False, prune=prune, need_count=False
        )
        return [(d, int(s)) for d, s in rows[:k]]

    def search_page(
        self,
        query: str,
        startwith: int = 1,
        showcount: int = 10,
        **kw,
    ) -> list[tuple[int, int]]:
        """Pagination semantics — searchservernew.dpr:1820-1821,1328-1363:
        startwith clamped 1..991, showcount 10..1000, results beyond 1000
        never shown (startwith > 991 yields nothing beyond the top-1000)."""
        startwith = min(max(startwith, 1), 991)
        showcount = min(max(showcount, 10), 1000)
        rows = self.search(query, k=min(startwith + showcount - 1, 1000), **kw)
        return rows[startwith - 1 :]

    def query_info(self, query: str) -> dict:
        """Corpus/term statistics echoed by the reference response
        (searchservernew.dpr:1349-1357): corpussize + per-term df and idf."""
        terms = self.compile(query)
        return {
            "corpussize": int(self.meta["n_docs"]),
            "keywords": [
                {"keyword": t.key, "occurrences": t.df, "idf": round(t.idf, 6)}
                for t in terms
            ],
        }

    # -- one pass -------------------------------------------------------------
    def _run_pass(
        self,
        terms: list[PlanTerm],
        k: int,
        w: dict[str, int],
        use_fancy: bool,
        prune: bool,
        need_count: bool,
        mode: str = "deusu",
    ) -> tuple[list[tuple[int, int]], int]:
        """Execute one pass. Returns (ordered rows, count_signal) where
        count_signal = min(ResultCount, max(k, 1001)) — enough for the
        two-pass '<1000 results → full pass' decision
        (searchservernew.dpr:1848-1855)."""
        fetch = max(k, MAX_RESULTS + 1) if need_count else k
        pos = [t for t in terms if t.action in ("SET", "AND")]
        neg = [t for t in terms if t.action == "NOT"]

        single_plain = (
            prune
            and len(pos) == 1
            and not neg
            and pos[0].host is None
            and not pos[0].url_only
            and not pos[0].title_only
        )

        seg_meta = self._segment_meta(terms, use_fancy)
        if single_plain:
            # every posting of a single plain term is a result, so the result
            # count is known from segment metadata without decoding
            total = int(seg_meta[seg_meta["ti"] == pos[0].ti]["n"].sum())
            rows = self._single_term_blockmax(pos[0], seg_meta, fetch, w, use_fancy)
            return rows, min(total, fetch)

        # host terms read from docmeta, not segments — they carry no segment
        # coverage and must not constrain the interval intersection
        allowed = (
            _interval_intersection(seg_meta, [t.ti for t in pos if t.host is None])
            if prune
            else None
        )
        decoded = self._decode(terms, use_fancy, seg_meta, allowed)
        if decoded is None:
            return [], 0

        # decoded row count is known from segment metadata: broadcast the
        # candidate stream when it is small (saves a full docmeta shuffle)
        est_rows = int(seg_meta["n"].sum()) if not seg_meta.empty else 0
        scored = self._score_rows(
            decoded, terms, w, mode=mode, broadcast_decoded=0 < est_rows < 2_000_000
        )
        pos_df = scored.where(F.col("ti").isin([t.ti for t in pos]))
        # per-term scores are each clamped; saturating sequential addition of
        # non-negative terms equals min(sum, clamp) (searchservernew.dpr:926)
        agg_score = (
            F.least(F.sum("score"), F.lit(float(SCORE_CLAMP)))
            if mode == "deusu"
            else F.sum("score")
        )
        cand = (
            pos_df.groupBy("doc_id")
            .agg(F.count("*").alias("cnt"), agg_score.alias("score"))
            .where(F.col("cnt") == len(pos))
            .drop("cnt")
        )
        if neg:
            neg_docs = scored.where(
                F.col("ti").isin([t.ti for t in neg])
            ).select("doc_id").distinct()
            cand = cand.join(neg_docs, "doc_id", "left_anti")
        rows = (
            cand.orderBy(F.desc("score"), F.asc("doc_id")).limit(fetch).collect()
        )
        return [(r["doc_id"], r["score"]) for r in rows], len(rows)

    # -- segment metadata (no blobs) -------------------------------------------
    def _segment_meta(self, terms: list[PlanTerm], use_fancy: bool) -> pd.DataFrame:
        conds = []
        ti_of = {}
        for t in terms:
            if t.host is not None:
                continue
            kind = (
                "fancy"
                if use_fancy and t.df > self.meta["fancy_threshold"]
                else "full"
            )
            b = crc32(t.key) % 64
            conds.append(
                (F.col("bucket") == b)
                & (F.col("term") == t.key)
                & (F.col("kind") == kind)
            )
            ti_of.setdefault((t.key, kind), []).append(t.ti)
        if not conds:
            return pd.DataFrame(
                columns=["ti", "term", "kind", "first_doc", "last_doc", "n", "max_static"]
            )
        cond = conds[0]
        for c in conds[1:]:
            cond = cond | c
        pdf = (
            self.postings.where(cond)
            .select("term", "kind", "first_doc", "last_doc", "n", "max_static")
            .toPandas()
        )
        out = []
        for (key, kind), tis in ti_of.items():
            sub = pdf[(pdf["term"] == key) & (pdf["kind"] == kind)]
            for ti in tis:
                s = sub.copy()
                s["ti"] = ti
                out.append(s)
        if not out:
            return pd.DataFrame(
                columns=["ti", "term", "kind", "first_doc", "last_doc", "n", "max_static"]
            )
        return pd.concat(out, ignore_index=True)

    # -- decode ------------------------------------------------------------------
    def _decode(
        self,
        terms: list[PlanTerm],
        use_fancy: bool,
        seg_meta: pd.DataFrame,
        allowed: dict[int, np.ndarray] | None,
    ) -> DataFrame | None:
        """DataFrame (ti, doc_id, flags) of all query-term postings after
        location filters; host terms contribute docmeta-derived rows."""
        spark = self.spark
        parts: list[DataFrame] = []

        # plain terms: read blobs (partition-pruned), decode in mapInPandas
        term_specs: dict[tuple[str, str], list[tuple[int, bool, bool]]] = {}
        conds = []
        for t in terms:
            if t.host is not None:
                continue
            kind = (
                "fancy"
                if use_fancy and t.df > self.meta["fancy_threshold"]
                else "full"
            )
            spec = term_specs.setdefault((t.key, kind), [])
            spec.append((t.ti, t.url_only, t.title_only))
            b = crc32(t.key) % 64
            c = (
                (F.col("bucket") == b)
                & (F.col("term") == t.key)
                & (F.col("kind") == kind)
            )
            # interval pruning: restrict decoded segments to those that can
            # still matter (segments are identified by first_doc)
            if allowed is not None and t.ti in allowed and len(allowed[t.ti]) > 0:
                c = c & F.col("first_doc").isin([int(x) for x in allowed[t.ti]])
            elif allowed is not None and t.ti in allowed:
                c = c & F.lit(False)
            conds.append(c)

        if conds:
            cond = conds[0]
            for c in conds[1:]:
                cond = cond | c
            segs = self.postings.where(cond).select("term", "kind", "blob")
            specs = {k: v for k, v in term_specs.items()}

            def decode_fn(iterator):
                for pdf in iterator:
                    tis, dids, fls = [], [], []
                    for term, kind, blob in zip(
                        pdf["term"], pdf["kind"], pdf["blob"]
                    ):
                        docs, flags = codec.decode(bytes(blob))
                        for ti, uo, to in specs[(term, kind)]:
                            if uo:
                                m = (flags & 4) != 0
                            elif to:
                                m = (flags & 2) != 0
                            else:
                                m = slice(None)
                            d, f = docs[m], flags[m]
                            tis.append(np.full(len(d), ti, dtype=np.int32))
                            dids.append(d)
                            fls.append(f.astype(np.int32))
                    if tis:
                        yield pd.DataFrame(
                            {
                                "ti": np.concatenate(tis),
                                "doc_id": np.concatenate(dids),
                                "flags": np.concatenate(fls),
                            }
                        )

            parts.append(segs.mapInPandas(decode_fn, schema=DECODED_SCHEMA))

        # host terms: host_postings ≡ docmeta filtered by host
        for t in terms:
            if t.host is not None:
                parts.append(
                    self.docmeta.where(F.col("host") == t.host).select(
                        F.lit(t.ti).cast("int").alias("ti"),
                        "doc_id",
                        F.lit(0).cast("int").alias("flags"),
                    )
                )

        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # -- scoring -------------------------------------------------------------
    def _score_rows(
        self,
        decoded: DataFrame,
        terms: list[PlanTerm],
        w,
        mode: str = "deusu",
        broadcast_decoded: bool = False,
    ) -> DataFrame:
        """Join sidecars and compute per-posting scores, vectorized.

        mode='deusu': the exact reference score (searchservernew.dpr:874-899
        + host path :355-364). mode='bm25': textbook BM25 weight with binary
        TF (idf = ln(1+(N-df+0.5)/(df+0.5)), k1=1.2, b=0.75).
        """
        plan = {
            t.ti: {
                "idf": t.idf,
                "df": t.df,
                "include_bl": t.include_backlink,
                "is_host": t.host is not None,
                "is_set": t.action == "SET",
            }
            for t in terms
        }
        max_bl = int(self.meta["max_backlinks"])
        n_docs = int(self.meta["n_docs"])
        avgdl = self.avgdl if mode == "bm25" else 1.0
        if broadcast_decoded:
            # candidate set is known-small (block-max path): broadcast it so
            # the sidecar join is a map-side lookup over cached docmeta
            decoded = F.broadcast(decoded)
        joined = decoded.join(self._docmeta_cols, "doc_id")

        def score_fn(iterator):
            import math as _math

            for pdf in iterator:
                n = len(pdf)
                if n == 0:
                    continue
                ti = pdf["ti"].to_numpy(np.int32)
                out = np.zeros(n, dtype=np.float64)
                flags = pdf["flags"].to_numpy(np.int64)
                fd = pdf["fd"].to_numpy(np.int64)
                he = pdf["he"].to_numpy(np.int64)
                rank = pdf["rank"].to_numpy(np.int64)
                bl = pdf["backlinks"].to_numpy(np.int64)
                dl = pdf["dl"].to_numpy(np.float64)
                for t_i, p in plan.items():
                    m = ti == t_i
                    if not m.any():
                        continue
                    if mode == "bm25":
                        if p["is_host"]:
                            out[m] = 0.0
                        else:
                            idf = _math.log(
                                1.0 + (n_docs - p["df"] + 0.5) / (p["df"] + 0.5)
                            )
                            out[m] = (
                                idf
                                * (1.2 + 1.0)
                                / (1.0 + 1.2 * (1 - 0.75 + 0.75 * dl[m] / avgdl))
                            )
                    elif p["is_host"]:
                        v = np.full(m.sum(), w["b1"], dtype=np.float64)
                        v += (31 - (fd[m] & 31)) * w["b7"]
                        if p["is_set"]:
                            v += np.round(_bl_value(bl[m], max_bl))
                        out[m] = np.clip(v, 1, SCORE_CLAMP)
                    else:
                        s = static_scores(
                            flags[m],
                            fd[m],
                            he[m],
                            rank[m],
                            bl[m],
                            max_bl,
                            include_backlink=p["include_bl"],
                            weights=w,
                        )
                        v = np.round(s * p["idf"])
                        out[m] = np.minimum(v, SCORE_CLAMP)
                yield pd.DataFrame(
                    {"ti": ti, "doc_id": pdf["doc_id"].to_numpy(np.int64), "score": out}
                )

        return joined.mapInPandas(score_fn, schema=SCORED_SCHEMA)

    # -- single-term block-max top-k --------------------------------------------
    def _single_term_blockmax(
        self,
        t: PlanTerm,
        seg_meta: pd.DataFrame,
        fetch: int,
        w: dict[str, int],
        use_fancy: bool,
    ) -> list[tuple[int, int]]:
        """Exact WAND-style top-k for a single plain term: decode segments in
        descending score-bound order; stop once no remaining segment's bound
        can reach the current kth score (strict <; ties are decoded)."""
        sm = seg_meta[seg_meta["ti"] == t.ti]
        if sm.empty:
            return []
        ns = sm["n"].to_numpy(np.int64)
        bounds = np.minimum(np.round(sm["max_static"].to_numpy() * t.idf), SCORE_CLAMP)
        order = np.argsort(-bounds, kind="stable")
        firsts = sm["first_doc"].to_numpy(np.int64)

        # round 1: decode the highest-bound segments covering >= fetch postings
        got, pos = 0, 0
        batch = []
        while pos < len(order) and got < fetch:
            batch.append(order[pos])
            got += int(ns[order[pos]])
            pos += 1
        heap = self._decode_segments(t, [int(firsts[i]) for i in batch], use_fancy, w)
        heap.sort(key=lambda r: (-r[1], r[0]))
        if pos >= len(order) or len(heap) < fetch:
            return heap[:fetch]

        # round 2: any remaining segment whose bound can still reach the kth
        # score (ties included) must be decoded; after that the top-k is exact
        # because bounds are true per-segment maxima of round(static * idf).
        # The -1 margin covers the <=1-point rounding drift between the
        # JVM-computed max_static and numpy query-side scores (build.py
        # static_score_col parity note).
        theta = heap[fetch - 1][1]
        rest = [i for i in order[pos:] if bounds[i] >= theta - 1]
        if rest:
            heap.extend(
                self._decode_segments(t, [int(firsts[i]) for i in rest], use_fancy, w)
            )
            heap.sort(key=lambda r: (-r[1], r[0]))
        return heap[:fetch]

    def _decode_segments(
        self, t: PlanTerm, first_docs: list[int], use_fancy: bool, w
    ) -> list[tuple[int, int]]:
        kind = "fancy" if use_fancy and t.df > self.meta["fancy_threshold"] else "full"
        b = crc32(t.key) % 64
        segs = self.postings.where(
            (F.col("bucket") == b)
            & (F.col("term") == t.key)
            & (F.col("kind") == kind)
            & F.col("first_doc").isin(first_docs)
        ).select("blob")
        decoded = segs.mapInPandas(
            _decode_only_fn(t.ti), schema=DECODED_SCHEMA
        )
        scored = self._score_rows(decoded, [t], w, broadcast_decoded=True)
        rows = scored.select("doc_id", "score").collect()
        return [(r["doc_id"], r["score"]) for r in rows]


def _decode_only_fn(ti: int):
    def fn(iterator):
        for pdf in iterator:
            dids, fls = [], []
            for blob in pdf["blob"]:
                d, f = codec.decode(bytes(blob))
                dids.append(d)
                fls.append(f.astype(np.int32))
            if dids:
                d = np.concatenate(dids)
                yield pd.DataFrame(
                    {
                        "ti": np.full(len(d), ti, dtype=np.int32),
                        "doc_id": d,
                        "flags": np.concatenate(fls),
                    }
                )

    return fn


def _bl_value(bl: np.ndarray, max_bl: int) -> np.ndarray:
    import math

    ln_mbl = math.log(max_bl) if max_bl > 0 else 0.0
    if ln_mbl <= 0:
        return np.where(bl == 0, 1.0, 0.0)
    return np.where(bl == 0, 1.0, 2500.0 * np.log(np.maximum(bl, 1)) / ln_mbl)


def _interval_intersection(
    seg_meta: pd.DataFrame, pos_tis: list[int]
) -> dict[int, np.ndarray] | None:
    """Doc-range pruning for AND queries: a doc can only match if every
    positive term has a segment covering it. Returns, per ti, the first_doc
    keys of segments overlapping the global intersection (None = no pruning
    possible / single positive term)."""
    if len(pos_tis) < 2 or seg_meta.empty:
        return None
    coverages = {}
    for ti in pos_tis:
        sub = seg_meta[seg_meta["ti"] == ti]
        if sub.empty:
            # a positive term with no postings: AND result is empty — signal
            # by allowing nothing anywhere
            return {t: np.array([], dtype=np.int64) for t in seg_meta["ti"].unique()}
        iv = sub[["first_doc", "last_doc"]].to_numpy(np.int64)
        coverages[ti] = _merge_intervals(iv)
    inter = None
    for iv in coverages.values():
        inter = iv if inter is None else _intersect_intervals(inter, iv)
        if len(inter) == 0:
            break
    allowed: dict[int, np.ndarray] = {}
    for ti in seg_meta["ti"].unique():
        sub = seg_meta[seg_meta["ti"] == ti]
        lo = sub["first_doc"].to_numpy(np.int64)
        hi = sub["last_doc"].to_numpy(np.int64)
        keep = _overlaps_any(lo, hi, inter)
        allowed[int(ti)] = lo[keep]
    return allowed


def _merge_intervals(iv: np.ndarray) -> np.ndarray:
    if len(iv) == 0:
        return iv
    iv = iv[np.argsort(iv[:, 0])]
    out = [iv[0].tolist()]
    for lo, hi in iv[1:]:
        if lo <= out[-1][1] + 1:
            out[-1][1] = max(out[-1][1], hi)
        else:
            out.append([lo, hi])
    return np.array(out, dtype=np.int64)


def _intersect_intervals(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    out = []
    i = j = 0
    while i < len(a) and j < len(b):
        lo = max(a[i][0], b[j][0])
        hi = min(a[i][1], b[j][1])
        if lo <= hi:
            out.append([lo, hi])
        if a[i][1] < b[j][1]:
            i += 1
        else:
            j += 1
    return np.array(out, dtype=np.int64) if out else np.empty((0, 2), dtype=np.int64)


def _overlaps_any(lo: np.ndarray, hi: np.ndarray, inter: np.ndarray) -> np.ndarray:
    if len(inter) == 0:
        return np.zeros(len(lo), dtype=bool)
    keep = np.zeros(len(lo), dtype=bool)
    for ilo, ihi in inter:
        keep |= (lo <= ihi) & (hi >= ilo)
    return keep
