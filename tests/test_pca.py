"""PCA operator: numerical equivalence against numpy over the real
embeddings table, plan shape (zero-shuffle projection), and the ANN
use-case (projected-space neighbors approximate full-space neighbors).
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from minarrow_spark.operators.pca import gramian, pca_fit, pca_project
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    tbl = pq.read_table(f"{SF_SMALL}/embeddings.parquet")
    x = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    return df, x


def test_gramian_matches_numpy(emb):
    df, x = emb
    g, s, n = gramian(df)
    assert n == len(x)
    np.testing.assert_allclose(g, x.T @ x, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(s, x.sum(axis=0), rtol=1e-10, atol=1e-12)


def test_components_match_numpy(emb):
    df, x = emb
    comps, ev = pca_fit(df, k=4)
    cov = np.cov(x, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:4]
    ref = v[:, order].T
    # eigenvectors match up to sign; explained variances match
    for c, r in zip(comps, ref):
        assert abs(abs(np.dot(c, r)) - 1.0) < 1e-8
    np.testing.assert_allclose(ev, w[order], rtol=1e-8)
    # fit is stable across partitionings to float tolerance
    comps2, ev2 = pca_fit(df.repartition(7), k=4)
    np.testing.assert_allclose(comps, comps2, atol=1e-9)


def test_projection_zero_shuffle_and_correct(emb):
    df, x = emb
    comps, _ = pca_fit(df, k=4)
    proj = pca_project(df, comps)
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rows = {r["vec_id"]: r["proj"] for r in proj.collect()}
    file_ids = pq.read_table(f"{SF_SMALL}/embeddings.parquet").column(
        "vec_id"
    ).to_pylist()  # same row order as x
    want = x @ comps.T
    got = np.array([rows[i] for i in file_ids])
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)
