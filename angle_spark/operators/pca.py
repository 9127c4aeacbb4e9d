"""Distributed PCA compression of embedding columns.

The reference compresses embeddings with a low-rank SVD of a (softmax'd)
gram matrix to find top-k feature directions (ESE pca_compress, reference
angle_emb/angle.py:465-478). Spark-first shape: the D x D gram matrix is
the only thing that crosses executors — partial grams per partition via
mapInPandas (numpy matmul per Arrow batch), summed on the driver (D is
embedding width, e.g. 64-1024: the gram is tiny no matter the corpus),
eigendecomposition locally, then projection is a JVM-side... projection
needs a matmul per row, done in one more Arrow pass.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def gram_matrix(emb: DataFrame, vec_col: str = "embedding") -> np.ndarray:
    """X^T X via per-partition partials; one collect of P D x D matrices
    (mean-centering is left to the caller if wanted)."""

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            g = X.T @ X
            acc = g if acc is None else acc + g
        if acc is not None:
            yield pd.DataFrame({"gram": [acc.ravel().tolist()], "d": [acc.shape[0]]})

    rows = emb.select(vec_col).mapInPandas(
        partial, schema="gram array<double>, d int"
    ).collect()
    if not rows:
        return np.zeros((0, 0))
    d = rows[0]["d"]
    total = np.zeros((d, d))
    for r in rows:
        total += np.array(r["gram"]).reshape(d, d)
    return total


def covariance_stats(emb: DataFrame, vec_col: str = "embedding") -> tuple[np.ndarray, int]:
    """-> (D x D population covariance, n): the distributed heavy part of
    PCA. One mapInPandas pass ships only P (D x D gram + D sum + count)
    partials to the driver; cov = gram/n - mu mu^T. This is the operator
    the pca_covariance driver entry oracle-checks against DuckDB's
    covar_pop (the K x K eigendecomposition that follows is driver-local
    linalg in any engine)."""

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = s = None
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            gg = X.T @ X
            ss = X.sum(axis=0)
            g = gg if g is None else g + gg
            s = ss if s is None else s + ss
            n += len(X)
        if g is not None:
            yield pd.DataFrame(
                {"gram": [g.ravel().tolist()], "sums": [s.tolist()], "n": [n], "d": [g.shape[0]]}
            )

    rows = emb.select(vec_col).mapInPandas(
        partial, schema="gram array<double>, sums array<double>, n long, d int"
    ).collect()
    if not rows:
        return np.zeros((0, 0)), 0
    d = rows[0]["d"]
    gram = np.zeros((d, d))
    sums = np.zeros(d)
    n = 0
    for r in rows:
        gram += np.array(r["gram"]).reshape(d, d)
        sums += np.array(r["sums"])
        n += r["n"]
    mu = sums / n
    return gram / n - np.outer(mu, mu), n


def pca_components(gram: np.ndarray, k: int) -> np.ndarray:
    """top-k eigenvectors (D x k), deterministic sign (first nonzero
    element positive) so projections reproduce across runs."""
    vals, vecs = np.linalg.eigh(gram)
    order = np.argsort(vals)[::-1][:k]
    W = vecs[:, order]
    for j in range(W.shape[1]):
        col = W[:, j]
        nz = np.flatnonzero(np.abs(col) > 1e-12)
        if len(nz) and col[nz[0]] < 0:
            W[:, j] = -col
    return W


def pca_project(
    emb: DataFrame, components: np.ndarray, vec_col: str = "embedding", out_col: str = "pca"
) -> DataFrame:
    """project vectors onto the components (one Arrow pass, batched
    matmul — the multi-GPU rank-sharded map analog, reference
    examples/multigpu_infer.py:22-38)."""
    W = components
    other = [c for c in emb.columns if c != vec_col]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            P = X @ W
            out = pdf[other].copy()
            out[out_col] = list(P)
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in emb.schema.fields
        if f.name != vec_col
    ) + f", {out_col} array<double>"
    return emb.mapInPandas(fn, schema=schema)


def pca_compress(emb: DataFrame, k: int, vec_col: str = "embedding") -> DataFrame:
    """end-to-end: gram -> top-k components -> projected DataFrame."""
    g = gram_matrix(emb, vec_col)
    W = pca_components(g, k)
    return pca_project(emb, W, vec_col)
