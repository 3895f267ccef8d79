"""Siamese two-tower network: separate receptor and ligand EGNN encoders.

Ref parity: point_vs/models/siamese.py:23-137 (SiameseNeuralNetwork,
authored for a collaborator and unused in the paper): a receptor tower
producing a 128-d embedding, a ligand tower with coordinate updates frozen
producing a 64-d embedding; forward is
``silu(concat(rec, lig))`` -> Linear(192,64) SiLU -> Linear(64,32) SiLU ->
Linear(32,1) (ref :69-72, :99-106 — note the extra SiLU applied to the
concatenated embedding before the first linear layer).

The towers are SartorrasEGNN trunks over the two GraphBatches of a
``SiamesePair`` (built by the loader from bp=1 / bp=0 entity-filtered
datasets, mirroring the reference's zipped receptor/ligand loaders).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from pointvs_tpu.data.buckets import SiamesePair
from pointvs_tpu.models.egnn import SartorrasEGNN
from pointvs_tpu.models.layers import MLP


class SiameseEGNN(nn.Module):
    dim_input: int
    k: int = 32
    num_layers: int = 4
    rec_embed_dim: int = 128
    lig_embed_dim: int = 64
    edge_attention: bool = False
    softmax_attention: bool = False
    graphnorm: bool = True
    residual: bool = True
    normalize: bool = True
    tanh: bool = True
    scan_layers: bool = False
    model_task: str = 'classification'
    dim_output: int = 1

    def setup(self):
        tower_kwargs = dict(
            dim_input=self.dim_input, k=self.k, num_layers=self.num_layers,
            edge_attention=self.edge_attention,
            softmax_attention=self.softmax_attention,
            graphnorm=self.graphnorm, residual=self.residual,
            normalize=self.normalize, tanh=self.tanh,
            scan_layers=self.scan_layers)
        self.rec_tower = SartorrasEGNN(
            dim_output=self.rec_embed_dim, name='rec_tower', **tower_kwargs)
        # Ligand tower: coordinate updates frozen (ref siamese.py:40-41).
        self.lig_tower = SartorrasEGNN(
            dim_output=self.lig_embed_dim, update_coords=False,
            name='lig_tower', **tower_kwargs)
        self.head = MLP(features=(64, 32, self.dim_output),
                        acts=('silu', 'silu', 'identity'), name='head')

    def __call__(self, batch: SiamesePair, train: bool = False):
        rec_embed = self.rec_tower(batch.rec, train=train)
        lig_embed = self.lig_tower(batch.lig, train=train)
        embedding = jnp.concatenate([rec_embed, lig_embed], axis=-1)
        # ref :103: x = silu(embedding) before the linear stack.
        return self.head(nn.silu(embedding), train=train)
