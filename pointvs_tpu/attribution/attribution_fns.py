"""Attribution methods over a trained model (ref:
point_vs/attribution/attribution_fns.py).

TPU-native redesign of the masking family: the reference removed one atom
(or bond) at a time and re-ran the model sequentially — N (or E) full
forwards with host round-trips (ref atom_masking :365-467). Here a masked
variant is *mask arithmetic on a statically shaped batch* (zero the node's
mask and its incident edges' masks), so all leave-one-out forwards run as a
single vmapped, jit-compiled program on device, chunked to bound memory.
Masking a node this way is exactly equivalent to deleting it: a
masked node leaves the mean pool and GraphNorm statistics, and its
messages/coordinate updates are mask-zeroed.

All functions share the signature
    fn(model, params, batch, task=None, **kwargs) -> np.ndarray
where `batch` is a batch-of-1 GraphBatch (no leading device axis); scores
are returned for the *real* (unpadded) atoms/edges.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import rankdata

SIGMOID = False
_CHUNK = 32


def _apply_kwargs(model, task):
    from pointvs_tpu.models.multitask import MultitaskSatorrasEGNN
    if task is not None and isinstance(model, MultitaskSatorrasEGNN):
        return {'task': task}
    return {}


def _score_fn(model, task):
    """(params, batch) -> scalar score, matching reference conventions:
    mean over 3 targets for multi-regression, optional sigmoid."""
    kwargs = _apply_kwargs(model, task)

    def score(params, batch):
        out = model.apply(params, batch, **kwargs)
        val = jnp.mean(out[0]) if out.shape[-1] > 1 else out[0, 0]
        if SIGMOID:
            val = jax.nn.sigmoid(val)
        return val

    return score


def _masked_batch(batch, node_gone: jnp.ndarray):
    """Zero out masks for the given node-indicator vector [N] (1 = drop)."""
    keep_nodes = batch.node_mask * (1.0 - node_gone)
    drop_edge = (node_gone[jnp.minimum(batch.senders,
                                       batch.node_mask.shape[0] - 1)]
                 + node_gone[jnp.minimum(batch.receivers,
                                         batch.node_mask.shape[0] - 1)])
    keep_edges = batch.edge_mask * (drop_edge == 0)
    return batch._replace(node_mask=keep_nodes, edge_mask=keep_edges)


def _chunked_map(fn, indices, chunk: int = _CHUNK):
    """vmap in fixed-size chunks (pads the tail) to bound device memory."""
    n = indices.shape[0]
    pad = (-n) % chunk
    padded = jnp.concatenate([indices, jnp.zeros((pad,) + indices.shape[1:],
                                                 indices.dtype)])
    stacked = padded.reshape(-1, chunk, *indices.shape[1:])
    out = jax.lax.map(jax.vmap(fn), stacked)
    return out.reshape(-1)[:n]


def atom_masking(model, params, batch, task: Optional[str] = None,
                 **kwargs) -> np.ndarray:
    """Leave-one-atom-out score deltas, batched on device (ref :365-442)."""
    n_pad = batch.node_mask.shape[0]
    n_real = int(np.asarray(batch.node_mask).sum())
    score = _score_fn(model, task)

    @jax.jit
    def run(params, batch):
        original = score(params, batch)

        def one(i):
            gone = (jnp.arange(n_pad) == i).astype(batch.node_mask.dtype)
            return original - score(params, _masked_batch(batch, gone))

        return _chunked_map(one, jnp.arange(n_pad))

    scores = np.asarray(run(params, batch))
    return scores[:n_real]


def bond_masking(model, params, batch, task: Optional[str] = None,
                 **kwargs) -> np.ndarray:
    """Leave-one-bond-out: both endpoint atoms are removed, scored only for
    ligand-receptor edges (edge class 1), 0 elsewhere (ref :35-109)."""
    n_pad = batch.node_mask.shape[0]
    e_real = int(np.asarray(batch.edge_mask).sum())
    score = _score_fn(model, task)
    senders = jnp.minimum(batch.senders, n_pad - 1)
    receivers = jnp.minimum(batch.receivers, n_pad - 1)

    @jax.jit
    def run(params, batch):
        original = score(params, batch)

        def one(e):
            a, b = senders[e], receivers[e]
            gone = ((jnp.arange(n_pad) == a) | (jnp.arange(n_pad) == b)
                    ).astype(batch.node_mask.dtype)
            delta = original - score(params, _masked_batch(batch, gone))
            is_lig_rec = batch.edge_attr[e, 1] > 0
            return jnp.where(is_lig_rec & (batch.edge_mask[e] > 0),
                             delta, 0.0)

        return _chunked_map(one, jnp.arange(batch.edge_mask.shape[0]))

    return np.asarray(run(params, batch))[:e_real]


def cam(model, params, batch, task: Optional[str] = None,
        **kwargs) -> np.ndarray:
    """Class activation mapping: per-node embeddings through the FC head
    (ref :312-362); 3-target outputs averaged."""
    apply_kwargs = _apply_kwargs(model, task)
    _, aux = model.apply(params, batch, capture_aux=True, **apply_kwargs)
    feats = aux['node_embeddings']

    # Run the head on per-node features (the head is linear + pointwise, so
    # applying it per-node is the reference's pre-pool dot product).
    from pointvs_tpu.models.multitask import MultitaskSatorrasEGNN
    if isinstance(model, MultitaskSatorrasEGNN):
        if 'classification' in (task or 'classification'):
            x = model.apply(params, feats,
                            method=lambda m, f: m.head_pose(f))
        else:
            x = model.apply(params, feats,
                            method=lambda m, f: m.head_affinity(f))
    else:
        if model.include_strain_info:
            strain = jnp.broadcast_to(
                batch.strain[:1, :1], (feats.shape[0], 1))
            feats = jnp.concatenate([feats, strain], axis=1)
        x = model.apply(params, feats, method=lambda m, f: m.head(f))
    x = np.asarray(x)
    if x.ndim == 2 and x.shape[1] == 3:
        x = np.mean(x, axis=1)
    n_real = int(np.asarray(batch.node_mask).sum())
    return x.reshape(-1)[:n_real]


def _layer_aux(model, params, batch, task):
    out, aux = model.apply(params, batch, capture_aux=True,
                           **_apply_kwargs(model, task))
    return aux['layers']


def node_attention(model, params, batch, task=None, gnn_layer: int = -1,
                   **kwargs) -> np.ndarray:
    """Node-attention weights of one layer as atom scores (ref :259-292)."""
    layers = _layer_aux(model, params, batch, task)
    vals = np.asarray(layers[gnn_layer]['node_att_val']).reshape(-1)
    n_real = int(np.asarray(batch.node_mask).sum())
    vals = vals[:n_real]
    if SIGMOID:
        return np.log(vals / (1 - vals))
    return vals


def edge_attention(model, params, batch, task=None, gnn_layer: int = -1,
                   **kwargs) -> np.ndarray:
    """Edge-attention weights of one layer as bond scores (ref :295-309)."""
    layers = _layer_aux(model, params, batch, task)
    vals = np.asarray(layers[gnn_layer]['att_val']).reshape(-1)
    e_real = int(np.asarray(batch.edge_mask).sum())
    return vals[:e_real]


def mean_node_attention_rank(model, params, batch, task=None,
                             **kwargs) -> np.ndarray:
    """Mean rank of node attention across layers (<10) (ref :212-231)."""
    layers = _layer_aux(model, params, batch, task)
    n_real = int(np.asarray(batch.node_mask).sum())
    ranks = []
    for idx, aux in enumerate(layers):
        if 'node_att_val' in aux:
            if idx == 10:
                break
            vals = np.asarray(aux['node_att_val']).reshape(-1)[:n_real]
            ranks.append(rankdata(vals) - 1)
    return np.mean(np.vstack(ranks).T, axis=1)


def mean_edge_attention_rank(model, params, batch, task=None,
                             **kwargs) -> np.ndarray:
    """Mean rank of edge attention across layers (<10) (ref :234-256)."""
    layers = _layer_aux(model, params, batch, task)
    e_real = int(np.asarray(batch.edge_mask).sum())
    ranks = []
    for idx, aux in enumerate(layers):
        if 'att_val' in aux:
            if idx == 10:
                break
            vals = np.asarray(aux['att_val']).reshape(-1)[:e_real]
            ranks.append(rankdata(vals) - 1)
    return np.mean(np.vstack(ranks).T, axis=1)


def track_position_changes(model, params, batch, task=None,
                           **kwargs) -> np.ndarray:
    """Total per-atom displacement across all coordinate updates
    (ref :136-156)."""
    layers = _layer_aux(model, params, batch, task)
    n_real = int(np.asarray(batch.node_mask).sum())
    original = np.asarray(batch.coords)[:n_real]
    displacements = []
    for aux in layers:
        coords = np.asarray(aux['intermediate_coords'])[:n_real]
        displacements.append(
            np.sqrt(np.sum((coords - original) ** 2, axis=1)))
    return np.sum(np.vstack(displacements).T, axis=1)


def track_bond_lengths(model, params, batch, task=None,
                       **kwargs) -> np.ndarray:
    """Bond-length change between input and final coordinates
    (ref :112-133)."""
    layers = _layer_aux(model, params, batch, task)
    e_real = int(np.asarray(batch.edge_mask).sum())
    senders = np.asarray(batch.senders)[:e_real]
    receivers = np.asarray(batch.receivers)[:e_real]
    original = np.asarray(batch.coords)
    final = np.asarray(layers[-1]['intermediate_coords'])
    lengths = []
    for coords in (original, final):
        lengths.append(np.linalg.norm(
            coords[senders] - coords[receivers], axis=1))
    return lengths[1] - lengths[0]


ATTRIBUTION_FNS = {
    'atom_masking': atom_masking,
    'masking': atom_masking,
    'bond_masking': bond_masking,
    'cam': cam,
    'class_activation': cam,
    'node_attention': node_attention,
    'edge_attention': edge_attention,
    'attention': node_attention,
    'mean_node_attention_rank': mean_node_attention_rank,
    'mean_edge_attention_rank': mean_edge_attention_rank,
    'displacement': track_position_changes,
    'bond_lengths': track_bond_lengths,
}
