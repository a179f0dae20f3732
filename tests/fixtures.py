"""Shared toy graph fixture (own design, euler JSON schema).

A 8-node, 2-node-type, 2-edge-type weighted heterogeneous graph with
dense/sparse/binary features — the analogue of the reference's 6-node
fixture role (reference: tools/test_data/graph.json), used by unit tests.

Topology (ext ids 100..107; even ids type "item", odd ids type "user"):
  edge type "click": 100->101 (w1), 100->103 (w3), 102->101 (w2),
                     104->105 (w1), 106->107 (w2), 101->100 (w1)
  edge type "buy"  : 100->105 (w2), 102->107 (w1), 104->101 (w4),
                     103->100 (w1), 105->102 (w2)
Node 107 has no out-edges at all; 106 has only "click".
"""
import numpy as np

EXT_IDS = [100, 101, 102, 103, 104, 105, 106, 107]

EDGES = [
    # (src, dst, type, weight)
    (100, 101, "click", 1.0),
    (100, 103, "click", 3.0),
    (102, 101, "click", 2.0),
    (104, 105, "click", 1.0),
    (106, 107, "click", 2.0),
    (101, 100, "click", 1.0),
    (100, 105, "buy", 2.0),
    (102, 107, "buy", 1.0),
    (104, 101, "buy", 4.0),
    (103, 100, "buy", 1.0),
    (105, 102, "buy", 2.0),
]


def toy_graph_json():
    nodes = []
    for i, ext in enumerate(EXT_IDS):
        ntype = "item" if ext % 2 == 0 else "user"
        nodes.append({
            "id": ext,
            "type": ntype,
            "weight": float(i + 1),
            "features": [
                {"name": "dense2", "type": "dense",
                 "value": [float(ext), float(ext) / 10.0]},
                {"name": "sparse_ids", "type": "sparse",
                 "value": [ext * 10 + j for j in range(1 + i % 3)]},
                {"name": "tag", "type": "binary", "value": f"n{ext}"},
                {"name": "price", "type": "dense", "value": [float(i) * 2.5]},
            ],
        })
    edges = []
    for src, dst, et, w in EDGES:
        edges.append({
            "src": src, "dst": dst, "type": et, "weight": w,
            "features": [
                {"name": "edense", "type": "dense", "value": [w * 10.0]},
                {"name": "esparse", "type": "sparse", "value": [src, dst]},
                {"name": "ebin", "type": "binary", "value": f"e{src}-{dst}"},
            ],
        })
    return {"nodes": nodes, "edges": edges}
