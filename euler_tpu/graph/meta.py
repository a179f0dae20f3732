"""Graph metadata.

TPU-native counterpart of the reference's ``GraphMeta``
(reference: euler/core/graph/graph_meta.h:41) plus the dataset metadata
contract of tf_euler (reference: tf_euler/python/dataset/cora.py:33-49).

Unlike the reference — which keeps meta inside a C++ singleton — meta here is a
plain (hashable-enough) Python dataclass kept *outside* jit: every shape-bearing
quantity (feature dims, type counts, degree caps) must be static for XLA.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Dict, List, Optional, Tuple

DENSE = "dense"
SPARSE = "sparse"
BINARY = "binary"


@dataclasses.dataclass(frozen=True)
class FeatureSpec:
    """One named feature of nodes or edges.

    kind: 'dense' (float32, fixed dim), 'sparse' (int ids, padded to max_len),
    'binary' (bytes, host-only).
    """

    name: str
    kind: str
    dim: int  # dense: vector width; sparse: padded max length; binary: 0

    def to_dict(self):
        return dataclasses.asdict(self)

    @staticmethod
    def from_dict(d):
        return FeatureSpec(**d)


@dataclasses.dataclass(frozen=True)
class GraphMeta:
    """Static description of a converted graph.

    Mirrors the information the reference keeps in ``euler.meta``
    (node/edge type name<->id maps, feature name->(type,id,dim) maps;
    reference: euler/core/graph/graph_meta.h) with local-id compaction info
    added (the reference keeps uint64 ids everywhere; on TPU we compact to
    int32 local ids at conversion time — SURVEY.md §7 "uint64 node ids").
    """

    n_nodes: int
    n_edges: int
    node_types: Tuple[str, ...]
    edge_types: Tuple[str, ...]
    node_features: Tuple[FeatureSpec, ...]
    edge_features: Tuple[FeatureSpec, ...]
    directed: bool = True
    has_in_edges: bool = False
    sparse_hash_buckets: int = 0  # 0 => sparse ids kept verbatim (must fit int32)
    n_partitions: int = 1
    # per-partition edge counts (recorded at convert time) — lets every
    # host compute the global shard padding width without opening any
    # other host's partition file (multi-host loading)
    part_edge_counts: Optional[Tuple[int, ...]] = None

    # ---- convenience -----------------------------------------------------
    @property
    def num_node_types(self) -> int:
        return len(self.node_types)

    @property
    def num_edge_types(self) -> int:
        return len(self.edge_types)

    def node_type_id(self, name) -> int:
        if isinstance(name, int):
            return name
        return self.node_types.index(name)

    def edge_type_id(self, name) -> int:
        if isinstance(name, int):
            return name
        return self.edge_types.index(name)

    def node_feature(self, name: str) -> FeatureSpec:
        for f in self.node_features:
            if f.name == name:
                return f
        raise KeyError(f"unknown node feature {name!r}")

    def edge_feature(self, name: str) -> FeatureSpec:
        for f in self.edge_features:
            if f.name == name:
                return f
        raise KeyError(f"unknown edge feature {name!r}")

    # ---- (de)serialization ----------------------------------------------
    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["node_features"] = [f.to_dict() for f in self.node_features]
        d["edge_features"] = [f.to_dict() for f in self.edge_features]
        for k in ("node_types", "edge_types"):
            d[k] = list(d[k])
        return json.dumps(d, indent=2)

    @staticmethod
    def from_json(s: str) -> "GraphMeta":
        d = json.loads(s)
        d["node_types"] = tuple(d["node_types"])
        d["edge_types"] = tuple(d["edge_types"])
        d["node_features"] = tuple(
            FeatureSpec.from_dict(f) for f in d["node_features"])
        d["edge_features"] = tuple(
            FeatureSpec.from_dict(f) for f in d["edge_features"])
        if d.get("part_edge_counts") is not None:
            d["part_edge_counts"] = tuple(d["part_edge_counts"])
        return GraphMeta(**d)
