"""ANN (banded hyperplane LSH) quality + oracle parity.

Recall is measured on deliberately CLUSTERED vectors (the driver's test
embeddings are near-isotropic, where "nearest neighbor" is geometrically
meaningless); the operator itself is the same one the driver query uses.
Oracle parity runs the DuckDB SQL from __spark_entry__ on the sf0.001
embeddings and requires identical candidate-pair sets."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from deusu_spark import pipelines

N_CLUSTERS = 8
PER_CLUSTER = 25
DIM = 32
NOISE = 0.05


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs, labels = [], []
    for c in range(N_CLUSTERS):
        pts = centers[c] + NOISE * rng.standard_normal((PER_CLUSTER, DIM))
        vecs.append(pts)
        labels += [c] * PER_CLUSTER
    V = np.concatenate(vecs)
    rows = [(i, [float(x) for x in V[i]]) for i in range(len(V))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    return df, V


def test_lsh_recall_vs_bruteforce(spark, clustered):
    df, V = clustered
    n = len(V)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    sims = Vn @ Vn.T

    bands = pipelines.hyperplane_bands(df, n_planes=24, band_size=6).collect()
    by_id: dict[int, set] = {}
    for r in bands:
        by_id.setdefault(r["vec_id"], set()).add(r["band"])

    recalls, cand_sizes = [], []
    for q in range(0, n, 17):  # a spread of query vectors
        exact = np.argsort(-sims[q])
        top10 = [int(d) for d in exact if d != q][:10]
        cands = {
            other
            for other, bs in by_id.items()
            if other != q and bs & by_id[q]
        }
        recalls.append(len(set(top10) & cands) / 10)
        cand_sizes.append(len(cands))
    assert np.mean(recalls) >= 0.8, (np.mean(recalls), recalls)
    # selectivity: candidates must be a small fraction of the corpus,
    # otherwise "high recall" would be trivial
    assert np.mean(cand_sizes) < 0.35 * n, np.mean(cand_sizes)


def test_broadcast_path_matches_literal_path(spark, clustered):
    """Above ANN_LITERAL_DIM_MAX the planes ride a broadcast into a numpy
    matmul instead of plan literals — the (id, band) output must be
    identical. Forced here by dropping the literal-dim cutoff to 0."""
    df, _ = clustered
    lit_rows = {
        (r["vec_id"], r["band"])
        for r in pipelines.hyperplane_bands(df, n_planes=24, band_size=6).collect()
    }
    bc_rows = {
        (r["vec_id"], r["band"])
        for r in pipelines.hyperplane_bands(
            df, n_planes=24, band_size=6, max_literal_dim=0
        ).collect()
    }
    assert bc_rows == lit_rows
    assert len(lit_rows) == N_CLUSTERS * PER_CLUSTER * 4  # 24/6 bands per vec


def test_plane_weights_deterministic():
    a = pipelines.lsh_plane_weights(4, 16)
    b = pipelines.lsh_plane_weights(4, 16)
    assert a == b
    assert all(w in (1.0, -1.0) for row in a for w in row)
    # not degenerate: both signs occur in every plane
    assert all(1.0 in row and -1.0 in row for row in a)


def test_ivf_recall_vs_bruteforce(spark, clustered):
    """IVF with one sampled centroid per cluster, nprobe=2: probing ~2/8 of
    the corpus must still recover most of the true top-10 (on clustered
    vectors the true neighbors live in the query's own cell)."""
    df, V = clustered
    n = len(V)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    sims = Vn @ Vn.T

    # one representative per cluster (vectors are laid out cluster-major)
    cents = [[float(x) for x in V[c * PER_CLUSTER]] for c in range(N_CLUSTERS)]
    assigned = {
        r["vec_id"]: r["cell"]
        for r in pipelines.ivf_assign(df, cents).collect()
    }
    assert set(assigned) == set(range(n))

    recalls, scanned = [], []
    for q in range(0, n, 17):
        probed = set(
            pipelines.ivf_probe_cells([float(x) for x in V[q]], cents, nprobe=2)
        )
        cand = {i for i, c in assigned.items() if c in probed and i != q}
        exact = np.argsort(-sims[q])
        top10 = [int(d) for d in exact if d != q][:10]
        recalls.append(len(set(top10) & cand) / 10)
        scanned.append(len(cand))
    assert np.mean(recalls) >= 0.8, (np.mean(recalls), recalls)
    # selectivity: nprobe=2 of 8 cells -> ~1/4 of the corpus scanned
    assert np.mean(scanned) < 0.4 * n, np.mean(scanned)


def test_ivf_broadcast_path_matches_literal_path(spark, clustered):
    """Above ANN_LITERAL_DIM_MAX the centroids ride a broadcast into a numpy
    matmul argmax instead of plan literals — cell assignments must be
    identical. Forced by dropping the literal-dim cutoff to 0."""
    df, V = clustered
    cents = [[float(x) for x in V[c * PER_CLUSTER]] for c in range(N_CLUSTERS)]
    lit = {
        (r["vec_id"], r["cell"])
        for r in pipelines.ivf_assign(df, cents).collect()
    }
    bc = {
        (r["vec_id"], r["cell"])
        for r in pipelines.ivf_assign(df, cents, max_literal_dim=0).collect()
    }
    assert bc == lit
    assert len(lit) == len(V)


def test_ivf_train_recovers_clusters(spark, clustered):
    """Farthest-first init picks one seed per well-separated cluster; Lloyd
    refinement pulls each centroid to its cluster mean. The trained cells
    must BE the clusters: balanced occupancy and near-total nprobe=1 recall
    (vs nprobe=2 the sampled-centroid tests need). Also reproducible: the
    means are rounded past float-summation-order noise."""
    from collections import Counter

    df, V = clustered
    n = len(V)
    cents = pipelines.ivf_train(df, k=N_CLUSTERS, iters=3)
    assert len(cents) == N_CLUSTERS
    assigned = {
        r["vec_id"]: r["cell"]
        for r in pipelines.ivf_assign(df, cents).collect()
    }
    sizes = Counter(assigned.values())
    assert len(sizes) == N_CLUSTERS, sizes
    assert max(sizes.values()) <= 2 * PER_CLUSTER, sizes

    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    sims = Vn @ Vn.T
    recalls = []
    for q in range(0, n, 17):
        probed = set(
            pipelines.ivf_probe_cells([float(x) for x in V[q]], cents, nprobe=1)
        )
        cand = {i for i, c in assigned.items() if c in probed and i != q}
        exact = np.argsort(-sims[q])
        top10 = [int(d) for d in exact if d != q][:10]
        recalls.append(len(set(top10) & cand) / 10)
    assert np.mean(recalls) >= 0.9, (np.mean(recalls), recalls)

    assert cents == pipelines.ivf_train(df, k=N_CLUSTERS, iters=3)


def test_ivf_topk_matches_duckdb_oracle(spark):
    """The driver-gate parity for ann_ivf_topk, run locally at sf0.001."""
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = [
        (r["vec_id"], r["cell"], round(r["cos_sim"], 7))
        for r in pipelines.q_ann_ivf_topk(spark, sf).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    want = [
        (a, b, round(c, 7))
        for a, b, c in con.execute(entry._ann_ivf_sql()).fetchall()
    ]
    assert got == want
    assert len(got) == 15


def test_ann_candidates_match_duckdb_oracle(spark):
    """The driver-gate parity, run locally at sf0.001."""
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = {
        (r["vec_a"], r["vec_b"])
        for r in pipelines.q_ann_lsh_candidates(spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    want = {tuple(r) for r in con.execute(entry._ann_lsh_sql()).fetchall()}
    assert got == want
    assert len(got) > 0
