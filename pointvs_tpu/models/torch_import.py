"""Import reference-trained PointVS torch checkpoints onto flax models.

The reference ships and serves trained ``.pt`` models whose state_dicts it
loads with two levels of legacy-key migration (ref
point_vs/models/point_neural_network_base.py:519-565: the
``edge_attention_mlp``/``node_attention_mlp`` renames of
``_transform_names`` and the compat 4-module ``att_mlp`` whose Linear sits
at Sequential index 2; ref point_vs/models/load_model.py:17-90 rebuilds the
model from the run dir's yaml sidecars). This module maps those
state_dicts — current and legacy schemas — onto the flax parameter trees
of the rebuilt egnn / multitask / lucid families, for both the unrolled
(``egnn_layer_{i}``) and scan-stacked (``egnn_scan``, params stacked on a
leading layer axis) layouts.

Every target path is validated against the destination template tree:
missing or unexpected parameters raise with the offending paths listed, so
an architecture mismatch between checkpoint and model fails loudly instead
of producing silently wrong weights.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

Path = Tuple[str, ...]


def _t(v) -> np.ndarray:
    """torch tensor (or array) -> numpy on host."""
    if hasattr(v, 'detach'):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def normalise_reference_keys(sd: Dict) -> Dict:
    """Apply the reference's own legacy-schema migrations.

    1. ``edge_attention_mlp`` -> ``att_mlp``, ``node_attention_mlp`` ->
       ``node_att_mlp`` (ref point_neural_network_base.py:528-534
       ``_transform_names``).
    2. The compat attention MLP layout (two ``nn.Identity`` modules
       prepended, ref :541-546): ``att_mlp.2.*`` keys move to
       ``att_mlp.0.*`` when no index-0 Linear exists.
    """
    out = {}
    for key, value in sd.items():
        key = key.replace('edge_attention_mlp', 'att_mlp')
        key = key.replace('node_attention_mlp', 'node_att_mlp')
        out[key] = value
    for mlp in ('att_mlp', 'node_att_mlp'):
        shifted = {}
        for key in list(out):
            if f'{mlp}.2.' in key:
                base = key.replace(f'{mlp}.2.', f'{mlp}.0.')
                if base not in out:
                    shifted[base] = out.pop(key)
        out.update(shifted)
    return out


def _infer_num_layers(sd: Dict) -> int:
    """Message-passing layer count from ``layers.N.`` keys (index 0 is the
    input-embedding PygLinearPass, ref egnn_satorras.py:271-272)."""
    idx = {int(k.split('.')[1]) for k in sd if k.startswith('layers.')}
    if not idx:
        raise ValueError(
            'state_dict has no "layers.N." keys - not a reference '
            'PointVS checkpoint?')
    return max(idx)


class _FlatBuilder:
    def __init__(self, sd: Dict):
        self.sd = sd
        self.flat: Dict[Path, np.ndarray] = {}

    def dense(self, path: Path, tkey: str):
        """torch nn.Linear -> flax Dense: kernel is weight.T."""
        self.flat[path + ('kernel',)] = _t(self.sd[f'{tkey}.weight']).T
        if f'{tkey}.bias' in self.sd:
            self.flat[path + ('bias',)] = _t(self.sd[f'{tkey}.bias'])

    def raw(self, path: Path, tkey: str):
        self.flat[path + (tkey.rsplit('.', 1)[-1],)] = _t(self.sd[tkey])

    def has(self, tkey: str) -> bool:
        return tkey in self.sd


def _satorras_flat(sd: Dict, num_layers: int,
                   multitask: bool) -> Dict[Path, np.ndarray]:
    """Reference SartorrasEGNN / MultitaskSatorrasEGNN state_dict keys ->
    flax unrolled-layout paths.

    Torch Sequential indices per ref egnn_satorras.py:76-107: edge_mlp
    Linears at 0/2, node_mlp Linear/GraphNorm/Linear at 0/1/3, coord_mlp
    Linears at 0/2 (index-2 bias-free), att_mlp/node_att_mlp Linear at 0;
    rezero/gated gates are ``*_gate_parameter`` (ref :108-121). Heads:
    ``feats_linear_layers`` (ref :309-316) or the multitask pair
    ``feats_linear_layers_pose``/``_affinity`` (ref egnn_multitask.py:
    141-145).
    """
    b = _FlatBuilder(sd)
    b.dense(('input_embed', 'Dense_0'), 'layers.0.m')
    for i in range(1, num_layers + 1):
        L: Path = (f'egnn_layer_{i - 1}',)
        p = f'layers.{i}'
        b.dense(L + ('edge_mlp', 'TorchLinear_0', 'Dense_0'),
                f'{p}.edge_mlp.0')
        b.dense(L + ('edge_mlp', 'TorchLinear_1', 'Dense_0'),
                f'{p}.edge_mlp.2')
        b.dense(L + ('node_lin1', 'Dense_0'), f'{p}.node_mlp.0')
        if b.has(f'{p}.node_mlp.1.weight'):  # GraphNorm
            for nm in ('weight', 'bias', 'mean_scale'):
                b.raw(L + ('node_graphnorm',), f'{p}.node_mlp.1.{nm}')
        b.dense(L + ('node_lin2', 'Dense_0'), f'{p}.node_mlp.3')
        b.dense(L + ('coord_mlp', 'TorchLinear_0', 'Dense_0'),
                f'{p}.coord_mlp.0')
        b.dense(L + ('coord_mlp', 'TorchLinear_1', 'Dense_0'),
                f'{p}.coord_mlp.2')
        if b.has(f'{p}.att_mlp.0.weight'):
            b.dense(L + ('att_mlp', 'Dense_0'), f'{p}.att_mlp.0')
        if b.has(f'{p}.node_att_mlp.0.weight'):
            b.dense(L + ('node_att_mlp', 'Dense_0'), f'{p}.node_att_mlp.0')
        if b.has(f'{p}.edge_gate_parameter'):
            b.flat[L + ('edge_gate',)] = _t(sd[f'{p}.edge_gate_parameter'])
        if b.has(f'{p}.node_gate_parameter'):
            b.flat[L + ('node_gate',)] = _t(sd[f'{p}.node_gate_parameter'])
    if multitask:
        b.dense(('head_pose', 'TorchLinear_0', 'Dense_0'),
                'feats_linear_layers_pose.0')
        b.dense(('head_affinity', 'TorchLinear_0', 'Dense_0'),
                'feats_linear_layers_affinity.0')
    else:
        idxs = sorted({int(k.split('.')[1]) for k in sd
                       if k.startswith('feats_linear_layers.')})
        for m, idx in enumerate(idxs):
            b.dense(('head', f'TorchLinear_{m}', 'Dense_0'),
                    f'feats_linear_layers.{idx}')
    return b.flat


def _lucid_flat(sd: Dict, num_layers: int) -> Dict[Path, np.ndarray]:
    """Reference PygLucidEGNN state_dict keys -> flax LucidEGNN paths.

    Torch Sequential indices after the build_net rewiring (ref
    egnn_lucid.py:211-288; the shared Dropout module at index 1 holds no
    params): edge_mlp Linears at 0/3, node_mlp thick Linear/GraphNorm/
    Linear at 0/2/4 (thin at 0/2), coors_mlp thick Linears at 0/3 (thin
    at 0), edge_weight thick at 0/2 (thin at 0, ref :74-77); node_norm is
    pyg LayerNorm (weight/bias), coors_norm is egnn_pytorch CoorsNorm
    (scale).
    """
    b = _FlatBuilder(sd)
    b.dense(('input_embed',), 'layers.0.m')
    for i in range(1, num_layers + 1):
        L: Path = (f'lucid_layer_{i - 1}',)
        p = f'layers.{i}'
        b.dense(L + ('edge_mlp', 'TorchLinear_0', 'Dense_0'),
                f'{p}.edge_mlp.0')
        b.dense(L + ('edge_mlp', 'TorchLinear_1', 'Dense_0'),
                f'{p}.edge_mlp.3')
        if b.has(f'{p}.edge_weight.0.weight'):
            b.dense(L + ('edge_weight', 'TorchLinear_0', 'Dense_0'),
                    f'{p}.edge_weight.0')
        if b.has(f'{p}.edge_weight.2.weight'):   # thick_attention
            b.dense(L + ('edge_weight', 'TorchLinear_1', 'Dense_0'),
                    f'{p}.edge_weight.2')
        if b.has(f'{p}.node_norm.weight'):
            b.raw(L + ('node_norm',), f'{p}.node_norm.weight')
            b.raw(L + ('node_norm',), f'{p}.node_norm.bias')
        if b.has(f'{p}.coors_norm.scale'):
            b.raw(L + ('coors_norm',), f'{p}.coors_norm.scale')
        b.dense(L + ('node_lin1',), f'{p}.node_mlp.0')
        if b.has(f'{p}.node_mlp.2.weight'):      # GraphNorm
            for nm in ('weight', 'bias', 'mean_scale'):
                b.raw(L + ('node_graphnorm',), f'{p}.node_mlp.2.{nm}')
        if b.has(f'{p}.node_mlp.4.weight'):      # thick node MLP
            b.dense(L + ('node_lin2',), f'{p}.node_mlp.4')
        b.dense(L + ('coors_mlp', 'TorchLinear_0', 'Dense_0'),
                f'{p}.coors_mlp.0')
        if b.has(f'{p}.coors_mlp.3.weight'):     # thick coors MLP
            b.dense(L + ('coors_mlp', 'TorchLinear_1', 'Dense_0'),
                    f'{p}.coors_mlp.3')
    b.dense(('head',), 'feats_linear_layers.0')
    return b.flat


_SCAN_SCOPE = {'egnn': 'egnn_scan', 'multitask': 'egnn_scan',
               'lucid': 'lucid_scan'}
_LAYER_SCOPE = {'egnn': 'egnn_layer_', 'multitask': 'egnn_layer_',
                'lucid': 'lucid_layer_'}


def _restack_for_scan(flat: Dict[Path, np.ndarray], layer_prefix: str,
                      scan_scope: str, num_layers: int
                      ) -> Dict[Path, np.ndarray]:
    """Unrolled egnn_layer_{i}/... paths -> one scan scope with params
    stacked [L, ...] (the nn.scan layout of models/egnn.py)."""
    out: Dict[Path, np.ndarray] = {}
    grouped: Dict[Path, Dict[int, np.ndarray]] = {}
    for path, value in flat.items():
        if path[0].startswith(layer_prefix):
            layer = int(path[0][len(layer_prefix):])
            grouped.setdefault(path[1:], {})[layer] = value
        else:
            out[path] = value
    for rest, by_layer in grouped.items():
        if len(by_layer) != num_layers:
            missing = sorted(set(range(num_layers)) - set(by_layer))
            raise ValueError(
                f'scan_layers import needs every layer to own parameter '
                f'{"/".join(rest)}; missing from layers {missing} (the '
                f'checkpoint has heterogeneous layers - rebuild the model '
                f'with scan_layers=False)')
        out[(scan_scope,) + rest] = np.stack(
            [by_layer[i] for i in range(num_layers)])
    return out


def torch_to_flax_params(state_dict: Dict, template, model_name: str):
    """Map a reference torch ``model_state_dict`` onto ``template``'s tree.

    ``template`` is the destination model's params (``{'params': ...}``),
    used for structure, shape and dtype validation. Returns a new tree of
    numpy arrays with the template's exact structure.
    """
    from flax import traverse_util

    if model_name not in _SCAN_SCOPE:
        raise NotImplementedError(
            f'torch checkpoint import supports egnn, lucid and multitask '
            f'models; got {model_name!r}')
    sd = normalise_reference_keys(
        {k: v for k, v in state_dict.items()})
    num_layers = _infer_num_layers(sd)

    if model_name == 'lucid':
        flat = _lucid_flat(sd, num_layers)
    else:
        flat = _satorras_flat(sd, num_layers,
                              multitask=model_name == 'multitask')

    inner = template['params'] if 'params' in template else template
    tflat = traverse_util.flatten_dict(inner)
    scan_scope = _SCAN_SCOPE[model_name]
    if any(path[0] == scan_scope for path in tflat):
        flat = _restack_for_scan(flat, _LAYER_SCOPE[model_name],
                                 scan_scope, num_layers)

    missing = sorted(set(tflat) - set(flat))
    unexpected = sorted(set(flat) - set(tflat))
    if missing or unexpected:
        raise ValueError(
            'torch checkpoint does not match the model architecture.\n'
            f'  model params with no checkpoint source: '
            f'{["/".join(p) for p in missing]}\n'
            f'  checkpoint params with no model target: '
            f'{["/".join(p) for p in unexpected]}')
    new_flat = {}
    for path, tmpl_leaf in tflat.items():
        value = flat[path]
        if tuple(value.shape) != tuple(np.shape(tmpl_leaf)):
            raise ValueError(
                f'shape mismatch at {"/".join(path)}: checkpoint '
                f'{tuple(value.shape)} vs model {tuple(np.shape(tmpl_leaf))}')
        new_flat[path] = value.astype(np.asarray(tmpl_leaf).dtype)
    new_inner = traverse_util.unflatten_dict(new_flat)
    if 'params' in template:
        out = dict(template)
        out['params'] = new_inner
        return out
    return new_inner


def load_torch_checkpoint(path):
    """Read a reference ``.pt`` checkpoint -> (state_dict, meta dict).

    Accepts both the reference's full save format (ref
    point_neural_network_base.py:510-517: model_state_dict +
    optimiser_state_dict + epochs) and a bare state_dict.
    """
    import pickle
    import torch
    try:
        ckpt = torch.load(str(path), map_location='cpu')
    except Exception as exc:
        # Older/newer torch pickle-safety defaults differ; the reference
        # format contains only tensors and plain scalars. Retry with
        # weights_only=False ONLY when the failure is the safe loader
        # rejecting non-tensor globals — a corrupt/missing file must
        # surface its real error, and arbitrary pickles must not be
        # silently executed.
        unsafe_needed = (isinstance(exc, pickle.UnpicklingError)
                         or 'weights only' in str(exc).lower()
                         or 'weights_only' in str(exc).lower())
        if not unsafe_needed:
            raise
        ckpt = torch.load(str(path), map_location='cpu',
                          weights_only=False)
    if isinstance(ckpt, dict) and 'model_state_dict' in ckpt:
        meta = {'p_epoch': int(ckpt.get('p_epoch', ckpt.get('epoch', 0))),
                'a_epoch': int(ckpt.get('a_epoch', 0)),
                'learning_rate': ckpt.get('learning_rate'),
                'weight_decay': ckpt.get('weight_decay')}
        return ckpt['model_state_dict'], meta
    return ckpt, {'p_epoch': 0, 'a_epoch': 0}
