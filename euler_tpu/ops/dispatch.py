"""ShardView dispatch predicate shared by every op module.

Each graph verb routes to its SPMD implementation when handed a
``euler_tpu.parallel.sharded.ShardView`` (one shard's local arrays +
collective context inside shard_map) instead of a single-chip
``GraphTensors``. A single isinstance-based predicate lives here so the
check cannot drift between op modules (duck-typed hasattr copies would
silently mis-route to the single-chip path if a field were renamed).

The sharded module is looked up lazily: it imports the op modules, so a
top-level import here would be circular — and if it was never imported,
no ShardView can exist.
"""
import sys


def is_shard_view(g) -> bool:
    mod = sys.modules.get("euler_tpu.parallel.sharded")
    return mod is not None and isinstance(g, mod.ShardView)
