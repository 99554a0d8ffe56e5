"""Distributed model training: L2-regularized logistic regression by
IRLS / Newton over sufficient-statistic partials.

Each pass over the corpus reduces every block to
``(Xᵀ(p − y), XᵀRX, loss, n)`` — a d-vector, a d×d matrix and two
scalars, independent of block row count — and the driver solves the
d×d Newton system.  Convergence is quadratic (≤ ~8 passes in
practice), so a 100 TB corpus is touched a handful of times and the
exchange per pass is O(blocks · d²), never O(rows): the same
sufficient-statistics discipline as the covariance/PCA ops, applied to
an iterative objective that has no closed form.

Features are standardized inside the pass using (mean, std) from one
prior moment pass — both broadcast via ``ray.put`` — so conditioning
never depends on raw feature scales."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def logreg_train(ds: rd.Dataset, feature_cols: list[str],
                 label_col: str, *, l2: float = 1e-3,
                 max_iters: int = 12, tol: float = 1e-8) -> dict:
    """Train w, b for P(y=1|x) = sigmoid(x·w + b).  Returns
    {"weights", "bias", "mean", "std", "n", "accuracy", "iters",
    "loss"} — weights in STANDARDIZED feature space (apply to
    (x − mean)/std).  Deterministic: fixed init at 0, deterministic
    pass order inside blocks, partial sums associate within 1e-12."""
    d = len(feature_cols)
    ds = ds.materialize()  # ≥ max_iters passes read this input

    def moments(t: pa.Table) -> pd.DataFrame:
        X = np.column_stack([
            t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in feature_cols])
        return pd.DataFrame({
            "n": pd.array([len(X)], dtype="int64"),
            "s": [X.sum(axis=0).tobytes()],
            "ss": [(X * X).sum(axis=0).tobytes()]})

    m = ds.map_batches(moments, batch_format="pyarrow",
                       zero_copy_batch=True).to_pandas()
    n = float(m["n"].sum())
    s = np.sum([np.frombuffer(b) for b in m["s"]], axis=0)
    ss = np.sum([np.frombuffer(b) for b in m["ss"]], axis=0)
    mean = s / n
    std = np.sqrt(np.maximum(ss / n - mean ** 2, 1e-12))
    mean_ref, std_ref = ray.put(mean), ray.put(std)

    theta = np.zeros(d + 1)  # [w, b]
    prev_loss = np.inf
    iters_done = 0
    for _ in range(max_iters):
        theta_ref = ray.put(theta)

        def newton_partial(t: pa.Table, _th=theta_ref) -> pd.DataFrame:
            th = ray.get(_th)
            mu, sd = ray.get(mean_ref), ray.get(std_ref)
            X = np.column_stack([
                t[c].to_numpy(zero_copy_only=False).astype(np.float64)
                for c in feature_cols])
            X = (X - mu) / sd
            Xb = np.column_stack([X, np.ones(len(X))])
            y = t[label_col].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            p = _sigmoid(Xb @ th)
            grad = Xb.T @ (p - y)
            r = np.maximum(p * (1.0 - p), 1e-9)
            hess = Xb.T @ (Xb * r[:, None])
            eps = 1e-12
            loss = -np.sum(y * np.log(p + eps)
                           + (1 - y) * np.log(1 - p + eps))
            return pd.DataFrame({
                "grad": [grad.tobytes()], "hess": [hess.tobytes()],
                "loss": [float(loss)],
                "n": pd.array([len(y)], dtype="int64")})

        parts = ds.map_batches(newton_partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
        grad = np.sum([np.frombuffer(b) for b in parts["grad"]], axis=0)
        hess = np.sum([np.frombuffer(b).reshape(d + 1, d + 1)
                       for b in parts["hess"]], axis=0)
        loss = float(parts["loss"].sum())
        # L2 on weights only, not the bias
        reg = np.concatenate([np.full(d, l2), [0.0]])
        grad = grad + reg * theta
        hess = hess + np.diag(reg)
        loss = loss + 0.5 * float(np.sum(reg * theta * theta))
        theta = theta - np.linalg.solve(hess, grad)
        iters_done += 1
        if np.isfinite(prev_loss) and \
                abs(prev_loss - loss) <= tol * max(1.0, abs(prev_loss)):
            break
        prev_loss = loss

    theta_ref = ray.put(theta)

    def acc_partial(t: pa.Table, _th=theta_ref) -> pd.DataFrame:
        th = ray.get(_th)
        mu, sd = ray.get(mean_ref), ray.get(std_ref)
        X = np.column_stack([
            t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in feature_cols])
        X = (X - mu) / sd
        Xb = np.column_stack([X, np.ones(len(X))])
        y = t[label_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        pred = (Xb @ th) > 0
        return pd.DataFrame({
            "hit": pd.array([int((pred == (y > 0.5)).sum())],
                            dtype="int64"),
            "n": pd.array([len(y)], dtype="int64")})

    a = ds.map_batches(acc_partial, batch_format="pyarrow",
                       zero_copy_batch=True).to_pandas()
    return {"weights": theta[:d], "bias": float(theta[d]),
            "mean": mean, "std": std, "n": int(n),
            "accuracy": float(a["hit"].sum()) / float(a["n"].sum()),
            "iters": iters_done, "loss": loss}


def lang_en_features(t: pa.Table) -> pa.Table:
    """The ``doc_lang_logreg`` feature contract, shared by the
    distributed query, the scalar fixture builder and (expression by
    expression) the SQL oracle: (n_ws_tokens, avg_tok_len,
    stopword_ratio) from ``text.token_stats_batch`` + y = lang=='en'."""
    import pyarrow.compute as pc

    from . import text

    stats = text.token_stats_batch(t)
    return pa.table({
        "n_ws_tokens": pc.cast(stats["n_ws_tokens"], pa.float64()),
        "avg_tok_len": stats["avg_tok_len"],
        "stopword_ratio": stats["stopword_ratio"],
        "y": pc.cast(pc.equal(t["lang"], "en"), pa.int64()),
    })


def train_logreg_reference(X: np.ndarray, y: np.ndarray, *,
                           l2: float = 1e-3, max_iters: int = 12,
                           tol: float = 1e-8) -> list[np.ndarray]:
    """Single-process full-matrix IRLS — the independent scalar path
    the oracle fixture rides.  Same math as ``logreg_train`` (zero
    init, standardize by population moments, L2 on weights only,
    relative-loss stop) but computed in ONE numpy pass per iteration
    with no blocking, so agreement with the distributed trainer (to
    the oracle's 6-decimal rounding) attests the sufficient-statistic
    exchange.  Returns [theta_0 .. theta_T] (theta = [w, b]),
    theta_0 = zeros, T = iterations run."""
    X = X.astype(np.float64)
    n, d = X.shape
    mean = X.sum(axis=0) / n
    std = np.sqrt(np.maximum((X * X).sum(axis=0) / n - mean ** 2, 1e-12))
    Xs = (X - mean) / std
    Xb = np.column_stack([Xs, np.ones(n)])
    y = y.astype(np.float64)
    reg = np.concatenate([np.full(d, l2), [0.0]])
    theta = np.zeros(d + 1)
    thetas = [theta.copy()]
    prev_loss = np.inf
    for _ in range(max_iters):
        p = _sigmoid(Xb @ theta)
        grad = Xb.T @ (p - y) + reg * theta
        r = np.maximum(p * (1.0 - p), 1e-9)
        hess = Xb.T @ (Xb * r[:, None]) + np.diag(reg)
        eps = 1e-12
        loss = -float(np.sum(y * np.log(p + eps)
                             + (1 - y) * np.log(1 - p + eps)))
        loss += 0.5 * float(np.sum(reg * theta * theta))
        theta = theta - np.linalg.solve(hess, grad)
        thetas.append(theta.copy())
        if np.isfinite(prev_loss) and \
                abs(prev_loss - loss) <= tol * max(1.0, abs(prev_loss)):
            break
        prev_loss = loss
    return thetas


def ensure_logreg_fixture(sf_dir: str) -> str:
    """Idempotently persist the scalar-path IRLS iterate trajectory of
    ``doc_lang_logreg`` as ``(iter, dim, val)`` rows (dim 0..2 =
    standardized feature weights, dim 3 = bias; iter 0 = the zero
    init).  The SQL oracle takes theta_{T-1} from this fixture and
    recomputes EVERYTHING else independently from the documents table:
    the features, the standardization moments, iteration T's gradient
    and Hessian sums at theta_{T-1}, the Newton solve (Cramer's rule
    on the 4×4 system), and the training accuracy at the recomputed
    final theta — so a wrong distributed moment/grad/Hessian exchange,
    a broken feature kernel, or a solver bug all break equality; only
    iterations 1..T−1 of the trajectory ride the fixture.
    Validation-scale only."""
    import os

    import pyarrow.parquet as _pq

    from ..util import ensure_fixture, fixture_path

    path = fixture_path("logreg", sf_dir)

    def build() -> pa.Table:
        tbl = _pq.read_table(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "lang", "text"])
        feats = lang_en_features(tbl)
        X = np.column_stack([
            feats[c].to_numpy(zero_copy_only=False)
            for c in ("n_ws_tokens", "avg_tok_len", "stopword_ratio")])
        y = feats["y"].to_numpy(zero_copy_only=False)
        thetas = train_logreg_reference(X, y)
        its, dims, vals = [], [], []
        for i, th in enumerate(thetas):
            its.append(np.full(len(th), i, dtype=np.int64))
            dims.append(np.arange(len(th), dtype=np.int64))
            vals.append(th)
        return pa.table({
            "iter": pa.array(np.concatenate(its)),
            "dim": pa.array(np.concatenate(dims)),
            "val": pa.array(np.concatenate(vals))})

    return ensure_fixture(path, f"{os.path.abspath(sf_dir)}|v1", build)
