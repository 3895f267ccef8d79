"""Siamese two-tower network: separate receptor and ligand EGNN encoders.

Ref parity: point_vs/models/siamese.py (SiameseNeuralNetwork, authored for
a collaborator and unused in the paper): a receptor tower producing a
128-d embedding, a ligand tower (coordinate updates frozen) producing a
64-d embedding, concatenated through a 64->32->1 SiLU MLP.

Here the towers are SartorrasEGNN trunks over two independent GraphBatches
(built with the dataset's bp=1 / bp=0 entity filters).
"""
from __future__ import annotations

from flax import linen as nn

from pointvs_tpu.data.buckets import GraphBatch
from pointvs_tpu.models.egnn import SartorrasEGNN
from pointvs_tpu.models.layers import MLP


class SiameseEGNN(nn.Module):
    dim_input: int
    k: int = 32
    num_layers: int = 4
    rec_embed_dim: int = 128
    lig_embed_dim: int = 64
    edge_attention: bool = False
    graphnorm: bool = True
    model_task: str = 'classification'

    def setup(self):
        self.rec_tower = SartorrasEGNN(
            dim_input=self.dim_input, k=self.k,
            dim_output=self.rec_embed_dim, num_layers=self.num_layers,
            edge_attention=self.edge_attention, graphnorm=self.graphnorm,
            name='rec_tower')
        self.lig_tower = SartorrasEGNN(
            dim_input=self.dim_input, k=self.k,
            dim_output=self.lig_embed_dim, num_layers=self.num_layers,
            edge_attention=self.edge_attention, graphnorm=self.graphnorm,
            update_coords=False, name='lig_tower')
        self.head = MLP(features=(64, 32, 1),
                        acts=('silu', 'silu', 'identity'), name='head')

    def __call__(self, rec_batch: GraphBatch, lig_batch: GraphBatch,
                 train: bool = False):
        import jax.numpy as jnp
        rec_embed = self.rec_tower(rec_batch, train=train)
        lig_embed = self.lig_tower(lig_batch, train=train)
        return self.head(jnp.concatenate([rec_embed, lig_embed], axis=-1),
                         train=train)
