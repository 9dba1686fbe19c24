"""Distributed PCA (moment partials + local eigendecomposition)."""

import numpy as np
import pyarrow.parquet as pq

from autoner_ray.stages.similarity import pca_fit, pca_project

SF = "/root/testdata/sf0.001"


def _ref(k):
    t = pq.read_table(f"{SF}/embeddings.parquet")
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    mu = X.mean(axis=0)
    Xc = X - mu
    _, S, Vt = np.linalg.svd(Xc, full_matrices=False)
    comps = Vt[:k]
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    ev = (S**2) / len(X)
    return X, mu, Xc, comps, ev[:k] / ev.sum()


def test_pca_fit_matches_numpy_svd(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    mean, comps, ratio = pca_fit(ds, 4)
    _, mu, _, ref_c, ref_r = _ref(4)
    assert np.allclose(mean, mu, atol=1e-9)
    assert np.allclose(comps, ref_c, atol=1e-6)
    assert np.allclose(ratio, ref_r, atol=1e-6)


def test_pca_project_matches_numpy(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    out = pca_project(ds, 4).to_pandas().sort_values("vec_id")
    P = np.array(out["components"].tolist())
    _, _, Xc, ref_c, _ = _ref(4)
    assert np.allclose(P, np.round(Xc @ ref_c.T, 6), atol=1e-5)
    assert P.shape == (500, 4)
