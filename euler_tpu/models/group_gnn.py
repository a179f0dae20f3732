"""Multi-graph group GNN nets.

TPU-native counterpart of the reference's group nets
(reference: tf_euler/python/mp_utils/group_gnn.py:29-138 —
``GroupGNNNet`` runs one independent GNN per root group;
``SharedGroupGNNNet`` shares the conv stack + output fc across groups
while each group keeps its own dataflow; ``SharedGNNNet`` adds a shared
ShallowEncoder as the featurizer, covered here by passing any encoder
module as ``feature``). Every group traces into the same jitted program
(multi-tower models stay one XLA computation).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

from flax import linen as nn

from euler_tpu.dataflow import flows as flows_lib
from euler_tpu.graph.store import GraphTensors
from euler_tpu.models import convs as convs_lib

Array = Any


class GroupGNNNet(nn.Module):
    """Independent per-group GNNs: ``group_x[i] = gnns[i](roots[i])``
    with separate parameters per tower
    (reference: group_gnn.py:29-37)."""

    gnns: Tuple[nn.Module, ...]

    def __call__(self, g: GraphTensors, group_roots: Sequence[Array]):
        if len(group_roots) != len(self.gnns):
            raise ValueError(
                f"GroupGNNNet has {len(self.gnns)} towers but got "
                f"{len(group_roots)} root groups")
        return [tower(g, roots)
                for tower, roots in zip(self.gnns, group_roots)]


class SharedGroupGNNNet(nn.Module):
    """One conv stack + output fc SHARED across root groups; each group
    samples through its own dataflow (reference: group_gnn.py:40-108 —
    convs built once for dims[:-1], final Dense(dims[-1]); whole-graph
    flows rejected). ``feature`` is the shared to_x featurizer
    (SharedGNNNet's ShallowEncoder role, group_gnn.py:127-138)."""

    conv: str
    group_flows: Tuple[Any, ...]     # one dataflow callable per group
    dims: Tuple[int, ...]            # conv dims[:-1] + output dim[-1]
    feature: nn.Module
    conv_kwargs: dict = None
    dtype: Any = None

    @nn.compact
    def __call__(self, g: GraphTensors, group_roots: Sequence[Array]):
        if len(group_roots) != len(self.group_flows):
            raise ValueError(
                f"SharedGroupGNNNet has {len(self.group_flows)} flows "
                f"but got {len(group_roots)} root groups")
        for flow in self.group_flows:
            if isinstance(flow, flows_lib.WholeDataFlow):
                raise ValueError(
                    "Group GNN does not support whole dataflow")
        cls = convs_lib.get_conv_class(self.conv)
        convs = [cls(dim=d, name=f"conv_{i}",
                     **(self.conv_kwargs or {}))
                 for i, d in enumerate(self.dims[:-1])]
        fc = nn.Dense(self.dims[-1], name="out_fc")
        outs = []
        for flow, roots in zip(self.group_flows, group_roots):
            key = self.make_rng("sample")
            blocks = flow(g, key, roots)
            x = self.feature(g, blocks[0].n_id)
            if self.dtype is not None:
                x = x.astype(self.dtype)
            for conv, block in zip(convs, blocks):
                x = nn.relu(conv((x[: block.size[0]], x), block))
                if self.dtype is not None:
                    x = x.astype(self.dtype)
            outs.append(fc(x))
        return outs
