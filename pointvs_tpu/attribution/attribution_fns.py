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


def _tiled_masked_scores(model, params, batch, gone_matrix: jnp.ndarray,
                         task: Optional[str]) -> jnp.ndarray:
    """Scores for C masked variants as ONE standard forward over a tiled
    mega-batch (C concatenated copies of the graph, copy c with
    gone_matrix[c] atoms masked out).

    This is the TPU-native form of leave-one-out masking: every chunk of
    C variants is a single static-shape forward — no vmap over the model,
    no per-variant dispatch (the reference re-ran the model N times
    sequentially; SURVEY.md section 7 calls out this exact redesign).
    """
    apply_kwargs = _apply_kwargs(model, task)
    c = gone_matrix.shape[0]
    n = batch.node_mask.shape[0]
    e = batch.edge_mask.shape[0]

    node_offsets = jnp.repeat(jnp.arange(c, dtype=jnp.int32) * n, n)
    edge_offsets = jnp.repeat(jnp.arange(c, dtype=jnp.int32) * n, e)
    perm_offsets = jnp.repeat(jnp.arange(c, dtype=jnp.int32) * e, e)

    tiled_node_mask = jnp.tile(batch.node_mask, c)
    gone_flat = gone_matrix.reshape(-1).astype(batch.node_mask.dtype)
    node_mask = tiled_node_mask * (1.0 - gone_flat)
    graph_id = jnp.where(
        tiled_node_mask > 0,
        jnp.repeat(jnp.arange(c, dtype=jnp.int32), n), c)

    senders_t = jnp.tile(batch.senders, c)
    receivers_t = jnp.tile(batch.receivers, c)
    valid = senders_t < n
    senders = jnp.where(valid, senders_t + edge_offsets, c * n)
    receivers = jnp.where(receivers_t < n,
                          receivers_t + edge_offsets, c * n)
    # Edge is gone if either endpoint is masked in its copy.
    gone_at = gone_matrix.reshape(-1)
    s_idx = jnp.minimum(senders, c * n - 1)
    r_idx = jnp.minimum(receivers, c * n - 1)
    keep = (1.0 - jnp.maximum(gone_at[s_idx], gone_at[r_idx]))
    edge_mask = jnp.tile(batch.edge_mask, c) * keep

    mega = batch._replace(
        node_feats=jnp.tile(batch.node_feats, (c, 1)),
        coords=jnp.tile(batch.coords, (c, 1)),
        node_mask=node_mask,
        graph_id=graph_id,
        senders=senders,
        receivers=receivers,
        edge_attr=jnp.tile(batch.edge_attr, (c, 1)),
        edge_mask=edge_mask,
        y=jnp.zeros((c,) + batch.y.shape[1:], jnp.float32),
        graph_mask=jnp.ones((c,), jnp.float32),
        strain=jnp.tile(batch.strain, (c, 1)),
        recv_perm=jnp.tile(batch.recv_perm, c) + perm_offsets,
        # Per-copy symmetry is preserved by tiling (masking only touches
        # masks): inv_tiled[c*E + j] = c*E + inv[j].
        inv_recv_perm=(None if getattr(batch, 'inv_recv_perm', None) is None
                       else jnp.tile(batch.inv_recv_perm, c) + perm_offsets))

    out = model.apply(params, mega, **apply_kwargs)     # [C, dim_out]
    if out.shape[-1] > 1:
        vals = jnp.mean(out, axis=-1)
    else:
        vals = out[:, 0]
    if SIGMOID:
        vals = jax.nn.sigmoid(vals)
    return vals


def _masked_deltas(model, params, batch, gone_rows: np.ndarray,
                   task: Optional[str], chunk: int = _CHUNK) -> np.ndarray:
    """original_score - score(masked variant) for each row of gone_rows
    [V, N], chunked into tiled mega-batches."""
    score = _score_fn(model, task)

    @jax.jit
    def original_fn(params, batch):
        return score(params, batch)

    tiled = jax.jit(functools_partial_tiled(model, task))

    original = float(original_fn(params, batch))
    v = gone_rows.shape[0]
    # Dispatch every chunk before fetching any result: the chunks pipeline
    # on device instead of paying a host sync each.
    pending = []
    for start in range(0, v, chunk):
        rows = gone_rows[start:start + chunk]
        if rows.shape[0] < chunk:  # pad the tail chunk
            pad = np.zeros((chunk - rows.shape[0], rows.shape[1]),
                           rows.dtype)
            rows = np.concatenate([rows, pad])
        pending.append((start, tiled(params, batch, jnp.asarray(rows))))
    out = np.empty(v, np.float32)
    for start, vals in pending:
        vals = np.asarray(vals)
        out[start:start + chunk] = (
            original - vals[:min(chunk, v - start)])
    return out


def functools_partial_tiled(model, task):
    def fn(params, batch, gone):
        return _tiled_masked_scores(model, params, batch, gone, task)
    return fn


def atom_masking(model, params, batch, task: Optional[str] = None,
                 **kwargs) -> np.ndarray:
    """Leave-one-atom-out score deltas as tiled mega-batch forwards
    (ref :365-442 ran N sequential re-forwards)."""
    n_pad = batch.node_mask.shape[0]
    n_real = int(np.asarray(batch.node_mask).sum())
    gone_rows = np.eye(n_pad, dtype=np.float32)[:n_real]
    return _masked_deltas(model, params, batch, gone_rows, task)


def bond_masking(model, params, batch, task: Optional[str] = None,
                 **kwargs) -> np.ndarray:
    """Leave-one-bond-out: both endpoint atoms removed, scored only for
    ligand-receptor edges (edge class 1), 0 elsewhere (ref :35-109)."""
    n_pad = batch.node_mask.shape[0]
    e_real = int(np.asarray(batch.edge_mask).sum())
    senders = np.minimum(np.asarray(batch.senders)[:e_real], n_pad - 1)
    receivers = np.minimum(np.asarray(batch.receivers)[:e_real], n_pad - 1)
    is_lig_rec = np.asarray(batch.edge_attr)[:e_real, 1] > 0

    # Only lig-rec edges are scored; compute deltas for those, fill zeros.
    targets = np.where(is_lig_rec)[0]
    gone_rows = np.zeros((len(targets), n_pad), np.float32)
    gone_rows[np.arange(len(targets)), senders[targets]] = 1.0
    gone_rows[np.arange(len(targets)), receivers[targets]] = 1.0
    deltas = _masked_deltas(model, params, batch, gone_rows, task) \
        if len(targets) else np.zeros(0, np.float32)
    out = np.zeros(e_real, np.float32)
    out[targets] = deltas
    return out


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
