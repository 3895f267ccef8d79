"""Undirected edge dropout over static-shape edge lists.

TPU-native replacement for pyg's ``dropout_adj(force_undirected=True)``
(ref egnn_satorras.py:319-329): instead of materialising a smaller edge
list (dynamic shape), we zero the edge *mask*. Both directions of an edge
share their fate: the Bernoulli draw is a hash of the canonical
(min, max) node pair, so (i,j) and (j,i) always agree.
"""
from __future__ import annotations

import jax.numpy as jnp


def _mix(x: jnp.ndarray) -> jnp.ndarray:
    """32-bit finaliser-style integer mix (murmur3 fmix32)."""
    x = x.astype(jnp.uint32)
    x ^= x >> 16
    x *= jnp.uint32(0x85EBCA6B)
    x ^= x >> 13
    x *= jnp.uint32(0xC2B2AE35)
    x ^= x >> 16
    return x


def undirected_edge_dropout(senders: jnp.ndarray, receivers: jnp.ndarray,
                            edge_mask: jnp.ndarray, rate: float,
                            seed: jnp.ndarray) -> jnp.ndarray:
    """Return a new edge mask with ~``rate`` of undirected edges dropped.

    seed: uint32 scalar (vary per step). Pads (mask 0) stay 0.
    """
    lo = jnp.minimum(senders, receivers).astype(jnp.uint32)
    hi = jnp.maximum(senders, receivers).astype(jnp.uint32)
    h = _mix(_mix(lo ^ jnp.uint32(seed)) ^ hi)
    uniform = h.astype(jnp.float32) / jnp.float32(4294967296.0)
    keep = (uniform >= rate).astype(edge_mask.dtype)
    return edge_mask * keep
