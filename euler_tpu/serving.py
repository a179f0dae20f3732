"""Embedding serving: an out-of-band HTTP service over inferred
embeddings.

TPU-native stand-in for the reference's serving tier
(reference: euler/service/grpc_server.h:38 + the knn retrieval tool,
knn/knn.py:36-86). The reference serves *graph queries* over gRPC because
training lives outside the store; here training is SPMD and the only
thing worth serving out-of-band is the product of inference —
embeddings. The service loads the estimator's ``infer`` output
(``embedding_{worker}.npy`` + ``ids_{worker}.npy``, the same files the
reference writes, base_estimator.py:157-179) and answers:

  GET  /healthz                        -> {"status": "ok", "n": N, "d": D}
  POST /embedding {"ids": [...]}       -> {"embeddings": [[...], ...]}
  POST /knn {"vector": [...], "k": 5}  -> {"ids": [...], "scores": [...]}
  POST /knn {"id": 7, "k": 5}          -> neighbors of a stored id

Plain stdlib http.server — zero new dependencies; the KNN search runs on
the device via knn.KnnIndex (exact MXU top-k).

CLI: python -m euler_tpu.serving --dir infer_out/ --port 8787
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Tuple

import numpy as np

from euler_tpu.knn import KnnIndex


def load_inferred(out_dir: str) -> Tuple[np.ndarray, np.ndarray]:
    """Concatenate every worker's embedding/ids shard pair."""
    embs, ids = [], []
    for ef in sorted(glob.glob(os.path.join(out_dir, "embedding_*.npy"))):
        w = os.path.basename(ef)[len("embedding_"):-len(".npy")]
        idf = os.path.join(out_dir, f"ids_{w}.npy")
        if not os.path.exists(idf):
            raise FileNotFoundError(f"missing {idf} for {ef}")
        embs.append(np.load(ef))
        ids.append(np.load(idf))
    if not embs:
        raise FileNotFoundError(f"no embedding_*.npy under {out_dir}")
    return np.concatenate(embs), np.concatenate(ids)


class EmbeddingService:
    def __init__(self, embeddings: np.ndarray, ids: np.ndarray,
                 metric: str = "l2"):
        self.emb = np.asarray(embeddings, np.float32)
        self.ids = np.asarray(ids)
        self.index = KnnIndex(self.emb, self.ids, metric=metric)
        self._row_of = {int(i): r for r, i in enumerate(self.ids)}

    # -- request handlers --------------------------------------------------
    def healthz(self):
        return {"status": "ok", "n": int(self.emb.shape[0]),
                "d": int(self.emb.shape[1])}

    def embedding(self, req):
        rows = [self._row_of.get(int(i), -1) for i in req["ids"]]
        out = [self.emb[r].tolist() if r >= 0 else None for r in rows]
        return {"embeddings": out}

    def knn(self, req):
        k = int(req.get("k", 10))
        if "vector" in req:
            q = np.asarray([req["vector"]], np.float32)
        elif "id" in req:
            r = self._row_of.get(int(req["id"]), -1)
            if r < 0:
                return {"error": f"unknown id {req['id']}"}
            q = self.emb[r][None]
        else:
            return {"error": "need 'vector' or 'id'"}
        dist, nn_ids = self.index.search(q, k=k)
        return {"ids": np.asarray(nn_ids)[0].tolist(),
                "scores": np.asarray(dist)[0].tolist()}


def make_server(service: EmbeddingService, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):     # quiet
            pass

        def _send(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                return self._send(service.healthz())
            return self._send({"error": "not found"}, 404)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                return self._send({"error": "bad json"}, 400)
            try:
                if self.path == "/embedding":
                    return self._send(service.embedding(req))
                if self.path == "/knn":
                    out = service.knn(req)
                    return self._send(out, 400 if "error" in out else 200)
            except (KeyError, TypeError, ValueError) as e:
                return self._send({"error": str(e)}, 400)
            return self._send({"error": "not found"}, 404)

    return ThreadingHTTPServer((host, port), Handler)


def serve_embeddings(out_dir: str, host: str = "127.0.0.1", port: int = 0,
                     metric: str = "l2", background: bool = False):
    """Start serving the infer output; returns the server (its .server_port
    is the bound port). background=True runs in a daemon thread."""
    emb, ids = load_inferred(out_dir)
    srv = make_server(EmbeddingService(emb, ids, metric), host, port)
    if background:
        threading.Thread(target=srv.serve_forever, daemon=True).start()
    else:
        srv.serve_forever()
    return srv


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="python -m euler_tpu.serving",
        description="Serve inferred embeddings (lookup + exact KNN) over "
                    "HTTP")
    p.add_argument("--dir", required=True,
                   help="estimator infer output directory")
    # loopback by default: the endpoints are unauthenticated — exposing
    # them on all interfaces must be an explicit opt-in
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--metric", default="l2",
                   choices=["l2", "ip", "cosine"])
    args = p.parse_args(argv)
    emb, ids = load_inferred(args.dir)
    srv = make_server(EmbeddingService(emb, ids, args.metric), args.host,
                      args.port)
    print(f"[euler_tpu] serving {emb.shape[0]} embeddings on "
          f"{args.host}:{srv.server_port}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
