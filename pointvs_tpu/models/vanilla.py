"""Dense (p, v, m) tuple models — the "vanilla" family.

The reference's vanilla family (point_vs/models/vanilla/lie_conv.py,
lie_transformer.py) wrapped two external research libraries (lie_conv,
eqv_transformer) around zero-padded dense (coords, features, mask) batches.
Those libraries are torch-only; this module provides the TPU-native
equivalent of the same input contract and invariances: an E(n)-equivariant
GNN over dense [B, N, ...] tensors with *all-pairs* messages (optionally
distance-gated), which is the natural dense formulation on the MXU —
batched [B, N, N] interaction tensors instead of group lifts.

DenseEGNN shares the Satorras update equations (squared-distance radial,
sum feature aggregation, mean coordinate update with count clamping) so
the invariance gates carry over.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from pointvs_tpu.models.layers import MLP, TorchLinear, xavier_uniform_gain


class DenseEGNNLayer(nn.Module):
    k: int
    act: str = 'silu'
    residual: bool = True
    normalize: bool = False
    tanh: bool = True
    cutoff: Optional[float] = None  # Angstrom distance gate (None = dense)
    epsilon: float = 1e-8

    def setup(self):
        self.edge_mlp = MLP(features=(self.k, self.k),
                            acts=(self.act, self.act), name='edge_mlp')
        self.node_mlp = MLP(features=(self.k, self.k),
                            acts=(self.act, 'identity'), name='node_mlp')
        self.coord_mlp = MLP(
            features=(self.k, 1),
            acts=(self.act, 'tanh' if self.tanh else 'identity'),
            final_kernel_init=xavier_uniform_gain(0.001), final_bias=False,
            name='coord_mlp')

    def __call__(self, coords, feats, mask, train: bool = False):
        # coords [B, N, 3], feats [B, N, K], mask [B, N]
        diff = coords[:, :, None, :] - coords[:, None, :, :]   # [B,N,N,3]
        radial = jnp.sum(diff ** 2, axis=-1, keepdims=True)    # [B,N,N,1]
        pair_mask = (mask[:, :, None] * mask[:, None, :])
        pair_mask = pair_mask * (1.0 - jnp.eye(
            coords.shape[1], dtype=coords.dtype))
        if self.cutoff is not None:
            pair_mask = pair_mask * (radial[..., 0] < self.cutoff ** 2)

        if self.normalize:
            import jax
            norm = jax.lax.stop_gradient(jnp.sqrt(radial)) + self.epsilon
            diff = diff / norm

        h_i = jnp.broadcast_to(feats[:, :, None, :],
                               radial.shape[:3] + (self.k,))
        h_j = jnp.broadcast_to(feats[:, None, :, :],
                               radial.shape[:3] + (self.k,))
        m_ij = self.edge_mlp(
            jnp.concatenate([h_i, h_j, radial], axis=-1), train=train)
        m_ij = m_ij * pair_mask[..., None]

        # coordinate update: masked mean of diff * phi_x(m_ij)
        trans = diff * self.coord_mlp(m_ij, train=train)
        counts = jnp.maximum(jnp.sum(pair_mask, axis=2), 1.0)
        coords = coords + jnp.sum(trans, axis=2) / counts[..., None]

        agg = jnp.sum(m_ij, axis=2)                             # [B,N,K]
        out = self.node_mlp(
            jnp.concatenate([feats, agg], axis=-1), train=train)
        if self.residual:
            out = feats + out
        return coords, out


class DenseEGNN(nn.Module):
    """LieResNet/LieTransformer functional replacement over (p, v, m)."""
    dim_input: int
    dim_output: int = 1
    k: int = 32
    num_layers: int = 6
    act: str = 'silu'
    residual: bool = True
    normalize: bool = True
    tanh: bool = True
    cutoff: Optional[float] = None
    model_task: str = 'classification'

    def setup(self):
        self.input_embed = TorchLinear(self.k, name='input_embed')
        self.dense_layers = [DenseEGNNLayer(
            k=self.k, act=self.act, residual=self.residual,
            normalize=self.normalize, tanh=self.tanh, cutoff=self.cutoff,
            name=f'dense_layer_{i}') for i in range(self.num_layers)]
        self.head = TorchLinear(self.dim_output, name='head')

    def __call__(self, batch, train: bool = False):
        """batch: DenseBatch with p [B,N,3], v [B,N,F], m [B,N] — or the
        bare (p, v, m) tuple of the reference's vanilla contract."""
        p, v, m = (batch.p, batch.v, batch.m) if hasattr(batch, 'p') \
            else batch
        return self.forward_pvm(p, v, m, train=train)

    def forward_pvm(self, p, v, m, train: bool = False):
        mask = m.astype(p.dtype)
        feats = self.input_embed(v)
        coords = p
        for layer in self.dense_layers:
            coords, feats = layer(coords, feats, mask, train=train)
        pooled = (jnp.sum(feats * mask[..., None], axis=1)
                  / jnp.maximum(jnp.sum(mask, axis=1), 1.0)[..., None])
        return self.head(pooled)


def dense_collate(samples, max_len: Optional[int] = None,
                  num_graphs: Optional[int] = None):
    """Zero-padded dense (p, v, m) batching (ref data_loaders.py:638-675
    get_collate_fn) from GraphSamples -> DenseBatch."""
    import numpy as np
    from pointvs_tpu.data.buckets import DenseBatch
    max_len = max_len or max(s.num_nodes for s in samples)
    bsz = num_graphs or len(samples)
    assert len(samples) <= bsz
    feat_dim = samples[0].node_feats.shape[1]
    p = np.zeros((bsz, max_len, 3), np.float32)
    v = np.zeros((bsz, max_len, feat_dim), np.float32)
    m = np.zeros((bsz, max_len), np.float32)
    y = np.zeros((bsz,), np.float32)
    graph_mask = np.zeros((bsz,), np.float32)
    for i, s in enumerate(samples):
        n = s.num_nodes
        p[i, :n] = s.coords
        v[i, :n] = s.node_feats
        m[i, :n] = 1.0
        y[i] = np.asarray(s.y, np.float32).reshape(-1)[0]
        graph_mask[i] = 1.0
    return DenseBatch(p, v, m, y, graph_mask)
