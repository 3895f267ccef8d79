"""Multitask EGNN: shared equivariant trunk + pose & affinity heads.

Reference counterpart: point_vs/models/geometric/egnn_multitask.py. The head
is selected at call time by ``task`` ('classification' selects the pose head,
anything else the affinity head, ref :162-166). First/final-layer-only
attention switches thin out attention to a single layer (ref :96-122).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

from flax import linen as nn

from pointvs_tpu.data.buckets import GraphBatch
from pointvs_tpu.models.egnn import EGNNLayer, SartorrasEGNN
from pointvs_tpu.models.layers import MLP, TorchLinear


def _apply_switch(enabled: bool, first_only: bool, final_only: bool,
                  i: int, num_layers: int) -> bool:
    if not enabled:
        return False
    if not first_only and not final_only:
        return True
    if first_only and i == 0:
        return True
    if final_only and i == num_layers - 1:
        return True
    return False


class MultitaskSatorrasEGNN(SartorrasEGNN):
    node_attention_final_only: bool = False
    edge_attention_final_only: bool = False
    node_attention_first_only: bool = False
    edge_attention_first_only: bool = False

    def _make_layers(self):
        layers = []
        for i in range(self.num_layers):
            layers.append(EGNNLayer(
                input_nf=self.k, output_nf=self.k, hidden_nf=self.k,
                edges_in_d=3, act=self.act, residual=self.residual,
                edge_attention=_apply_switch(
                    self.edge_attention, self.edge_attention_first_only,
                    self.edge_attention_final_only, i, self.num_layers),
                normalize=self.normalize, graphnorm=self.graphnorm,
                tanh=self.tanh, update_coords=self.update_coords,
                permutation_invariance=self.permutation_invariance,
                attention_activation_fn=self.attention_activation_fn,
                node_attention=_apply_switch(
                    self.node_attention, self.node_attention_first_only,
                    self.node_attention_final_only, i, self.num_layers),
                edge_residual=self.edge_residual,
                gated_residual=self.gated_residual, rezero=self.rezero,
                softmax_attention=self.softmax_attention,
                name=f'egnn_layer_{i}'))
        return layers

    def setup(self):
        self.input_embed = TorchLinear(self.k, name='input_embed')
        self.egnn_layers = self._make_layers()
        # Pose head: Linear(k, 1); affinity head: Linear(k, dim_output) +
        # Softplus/ReLU (ref egnn_multitask.py:141-146).
        self.head_pose = MLP(features=(1,), acts=('identity',),
                             name='head_pose')
        self.head_affinity = MLP(
            features=(self.dim_output,),
            acts=('softplus' if self.final_softplus else 'relu',),
            name='head_affinity')

    def __call__(self, batch: GraphBatch, train: bool = False,
                 capture_aux: bool = False, task: str = 'classification'):
        h, _, aux_layers = self.embed(batch, train=train,
                                      capture_aux=capture_aux)
        pooled = self.pool(h, batch)
        if self.is_initializing():
            # Materialise BOTH heads' params so a checkpoint trained on one
            # task can continue on the other (set_task parity).
            pose = self.head_pose(pooled, train=train)
            affinity = self.head_affinity(pooled, train=train)
            out = pose if 'classification' in task else affinity
        elif 'classification' in task:
            out = self.head_pose(pooled, train=train)
        else:
            out = self.head_affinity(pooled, train=train)
        if capture_aux:
            return out, {'layers': aux_layers, 'node_embeddings': h,
                         'pooled': pooled}
        return out
