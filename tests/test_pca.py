"""PCA finish: distributed exact moments -> driver-side eigen.

Pins (a) the integer power-iteration tier bit-exactly against the
DuckDB recursive-CTE oracle, (b) the eigh tier's orthonormality and
eigenvalue ordering, and (c) the round-2-brief projected-variance
property: variance captured by the top components equals the returned
eigenvalues, and the power-iteration direction's Rayleigh quotient
lands inside the covariance spectrum near its top.
"""

from __future__ import annotations

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def xmat(embs):
    pdf = embs.toPandas()
    return np.stack(pdf["embedding"].values).astype(np.float64)


def test_power_iteration_matches_duckdb_oracle(spark, embs):
    import duckdb

    from graph500_spark.operators.simsearch import (
        pca_power_iteration,
        pca_power_iteration_sql,
    )

    got = {
        r["dim"]: r["loading"]
        for r in pca_power_iteration(embs).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM"
        f" '{SF_DIR}/embeddings.parquet'"
    )
    want = dict(con.execute(pca_power_iteration_sql()).fetchall())
    assert got == want  # bit-exact integers, both engines


def test_power_iteration_sign_canonical(spark, embs):
    from graph500_spark.operators.simsearch import pca_power_iteration

    loadings = [r["loading"] for r in pca_power_iteration(embs).collect()]
    assert max(loadings, key=abs) == 1_000_000  # peak dim pinned +1e6


def test_power_iteration_rayleigh_in_spectrum(spark, embs, xmat):
    from graph500_spark.operators.simsearch import pca_power_iteration

    v = np.array(
        [
            r["loading"]
            for r in pca_power_iteration(embs).orderBy("dim").collect()
        ],
        dtype=np.float64,
    )
    v /= np.linalg.norm(v)
    xc = xmat - xmat.mean(0)
    cov = xc.T @ xc / xmat.shape[0]
    rq = float(v @ cov @ v)
    vals = np.linalg.eigvalsh(cov)
    # Rayleigh quotient of ANY unit vector sits in [lmin, lmax]; after
    # 20 iterations on this spectrum it must be in the top decile.
    assert vals[0] - 1e-12 <= rq <= vals[-1] + 1e-12
    assert rq >= np.quantile(vals, 0.9)


def test_pca_components_projected_variance(spark, embs, xmat):
    from graph500_spark.operators.simsearch import pca_components_df

    rows = pca_components_df(embs, n_components=4).collect()
    d = xmat.shape[1]
    k = 1 + max(r["component"] for r in rows)
    vecs = np.zeros((d, k))
    eigs = np.zeros(k)
    for r in rows:
        vecs[r["dim"], r["component"]] = r["loading"] / 1e6
        eigs[r["component"]] = r["eigenvalue"] / 1e6
    # orthonormal up to the 1e-6 quantization
    gram = vecs.T @ vecs
    assert np.allclose(gram, np.eye(k), atol=1e-4)
    # eigenvalues sorted descending and all positive
    assert all(eigs[i] >= eigs[i + 1] for i in range(k - 1))
    assert (eigs > 0).all()
    # projected variance: Var(X v_c) == eigenvalue_c (quantized)
    xc = xmat - xmat.mean(0)
    proj_var = (xc @ vecs).var(axis=0, ddof=0)
    assert np.allclose(proj_var, eigs, atol=1e-4)
    # sign canonicalization: per-component peak loading positive
    for c in range(k):
        col = vecs[:, c]
        assert col[int(np.argmax(np.abs(col)))] > 0


class TestEmbeddingPropagation:
    def test_mean_aggregation_signed(self, spark):
        from graph500_spark.operators.simsearch import (
            KMEANS_SCALE,
            embedding_propagation,
        )

        # vertex 1 ~ {10, 11}, vertex 2 ~ {10}; vertex 10 ~ {1, 2}
        # but only 10 and 11 have embeddings
        und = [(1, 10), (1, 11), (2, 10)]
        edges = spark.createDataFrame(
            und + [(b, a) for a, b in und], "src: long, dst: long"
        )
        embs = spark.createDataFrame(
            [
                (10, [0.5, -0.25]),
                (11, [-0.5, 0.75]),
                (1, [1.0, 1.0]),
            ],
            "vec_id: long, embedding: array<float>",
        )
        rows = {
            (r.vertex, r.dim): (r.n_vec_neighbors, r.mean_q)
            for r in embedding_propagation(edges, embs).collect()
        }
        s = KMEANS_SCALE
        # vertex 1: neighbors 10, 11 -> mean of (0.5,-0.5)=0, (-0.25,0.75)=0.25
        assert rows[(1, 1)] == (2, 0)
        assert rows[(1, 2)] == (2, int(0.25 * s))
        # vertex 2: neighbor 10 only
        assert rows[(2, 1)] == (1, int(0.5 * s))
        assert rows[(2, 2)] == (1, int(-0.25 * s))
        # vertex 10: embedded neighbor 1 only (2 has no embedding)
        assert rows[(10, 1)] == (1, s)
        # vertex 11: embedded neighbor 1
        assert rows[(11, 2)] == (1, s)
        # truncation toward zero on negative sums: vertex with
        # neighbors summing to -3 over 2 -> -1 (not -2)
        und2 = [(7, 20), (7, 21)]
        edges2 = spark.createDataFrame(
            und2 + [(b, a) for a, b in und2], "src: long, dst: long"
        )
        embs2 = spark.createDataFrame(
            [(20, [-1e-6]), (21, [-2e-6])],
            "vec_id: long, embedding: array<float>",
        )
        r2 = {
            (r.vertex, r.dim): r.mean_q
            for r in embedding_propagation(edges2, embs2).collect()
        }
        assert r2[(7, 1)] == -1
