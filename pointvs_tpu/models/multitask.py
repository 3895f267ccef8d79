"""Multitask EGNN: shared equivariant trunk + pose & affinity heads.

Reference counterpart: point_vs/models/geometric/egnn_multitask.py. The head
is selected at call time by ``task`` ('classification' selects the pose head,
anything else the affinity head, ref :162-166). First/final-layer-only
attention switches thin out attention to a single layer (ref :96-122).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
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
            kwargs = dict(
                self._layer_kwargs(),
                edge_attention=_apply_switch(
                    self.edge_attention, self.edge_attention_first_only,
                    self.edge_attention_final_only, i, self.num_layers),
                node_attention=_apply_switch(
                    self.node_attention, self.node_attention_first_only,
                    self.node_attention_final_only, i, self.num_layers))
            layers.append(EGNNLayer(**kwargs, name=f'egnn_layer_{i}'))
        return layers

    def setup(self):
        if self.scan_layers:
            # nn.scan shares one layer config across the stack; the
            # first/final-only attention switches make layers heterogeneous.
            assert not (self.node_attention_final_only
                        or self.edge_attention_final_only
                        or self.node_attention_first_only
                        or self.edge_attention_first_only), \
                'scan_layers is incompatible with per-layer attention ' \
                'switches (first/final-only)'
        self.input_embed = TorchLinear(
            self.k, dtype=jnp.bfloat16 if self.bf16 else None,
            name='input_embed')
        self._setup_layers()
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
