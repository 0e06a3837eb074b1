"""Benchmark fencing that works over the axon TPU relay.

`jax.block_until_ready` is a NO-OP on the relay (futures resolve at enqueue,
observed 2026-08-18), so the only reliable fence is a host fetch ordered
behind the enqueued work on each device stream. Fetching a full output leaf
skews timings by the relay transfer time (ADVICE r2: a 1080p render is ~24 MB
— far more than the ~1 ms scalar round-trip), so `sync` indexes a scalar
ON-DEVICE first and fetches 4 bytes.

For multi-device (sharded or replicated) outputs, one scalar is fetched per
addressable shard: a replicated array's plain host read touches only one
shard's device, leaving the other streams unbounded.
"""

from __future__ import annotations

import jax


def sync(out) -> float:
    """Fence every device stream feeding `out`; returns one probe scalar."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    vals = []
    for s in getattr(leaf, "addressable_shards", []) or []:
        d = s.data
        vals.append(float(d[(0,) * d.ndim]))
    if not vals:
        vals.append(float(leaf[(0,) * leaf.ndim]))
    return vals[0]
