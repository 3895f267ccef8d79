"""Reference torch-checkpoint import (VERDICT r4 missing #1).

Round-trip: train the torch reference-math nets a few optimiser steps
(so weights are well away from init), serialise them in the REFERENCE's
state_dict key schema (ref point_vs/models/geometric/egnn_satorras.py
module layout; save format ref point_neural_network_base.py:510-517),
import onto the flax models via pointvs_tpu/models/torch_import.py, and
pin forward parity at 1e-5 on multi-graph batches — for the current key
schema, both legacy schemas the reference migrates
(point_neural_network_base.py:519-565), the scan-stacked layout, the
multitask heads, the lucid family, and the full run-dir flow through
models/load_model.py.
"""
import numpy as np
import pytest
import torch

from pointvs_tpu.data.buckets import pad_graphs_to_batch
from pointvs_tpu.models import build_model
from pointvs_tpu.models.torch_import import (
    load_torch_checkpoint, torch_to_flax_params)
from pointvs_tpu.testing.torch_ref import (
    RefEGNN, RefLucidEGNN, RefMultitaskEGNN, samples_to_torch_batch)
from tests.test_forward_parity import DIM_IN, K, LAYERS, _random_samples


# --------------------------------------------------------------------- #
# Reference-format state_dict writers: torch_ref modules use their own
# attribute names; these re-key them into the reference's exact schema
# (layers.0.m input pass, layers.1..N message layers, feats_linear_layers
# heads) so the importer is exercised against real reference keys.
# --------------------------------------------------------------------- #


def _rekey(sd, mapping):
    out = {}
    for key, value in sd.items():
        for src, dst in mapping:
            if key.startswith(src):
                key = dst + key[len(src):]
                break
        out[key] = value
    return out


def ref_state_dict_egnn(net: RefEGNN):
    mapping = [('embed.', 'layers.0.m.'),
               ('head.', 'feats_linear_layers.0.')]
    for i in range(len(net.layers)):
        mapping.append((f'layers.{i}.', f'layers.{i + 1}.'))
    # torch_ref RefEGNNLayer Sequential indices == reference indices
    # (edge_mlp 0/2, node_mlp 0/1/3, coord_mlp 0/2, att_mlp 0).
    return _rekey(net.state_dict(), sorted(mapping, reverse=True))


def ref_state_dict_multitask(net: RefMultitaskEGNN):
    mapping = [('embed.', 'layers.0.m.'),
               ('head_pose.', 'feats_linear_layers_pose.0.'),
               ('head_affinity.0.', 'feats_linear_layers_affinity.0.')]
    for i in range(len(net.layers)):
        mapping.append((f'layers.{i}.', f'layers.{i + 1}.'))
    return _rekey(net.state_dict(), sorted(mapping, reverse=True))


def ref_state_dict_lucid(net: RefLucidEGNN):
    """RefLucidLayer omits the reference's no-param Dropout modules, so
    its Sequential indices differ; shift them to the reference's (ref
    egnn_lucid.py:211-288: edge_mlp 0/3, node_mlp 0/2/4, coors_mlp 0/3,
    edge_weight thick 0/2)."""
    sd = dict(net.state_dict())
    mapping = [('embed.', 'layers.0.m.'),
               ('head.', 'feats_linear_layers.0.')]
    for i in range(len(net.layers)):
        mapping.append((f'layers.{i}.', f'layers.{i + 1}.'))
    sd = _rekey(sd, sorted(mapping, reverse=True))
    out = {}
    idx_shift = [('edge_mlp.2.', 'edge_mlp.3.'),
                 ('node_mlp.1.', 'node_mlp.2.'),
                 ('node_mlp.3.', 'node_mlp.4.'),
                 ('coors_mlp.2.', 'coors_mlp.3.')]
    for key, value in sd.items():
        for src, dst in idx_shift:
            if src in key:
                key = key.replace(src, dst)
                break
        out[key] = value
    return out


def _train_torch_steps(net, samples, steps=5, lr=1e-3, multitask=False):
    feats, coords, rows, cols, eattr, gid, ys = samples_to_torch_batch(
        samples)
    opt = torch.optim.Adam(net.parameters(), lr=lr)
    for _ in range(steps):
        opt.zero_grad()
        if multitask:
            out = net(feats, coords, rows, cols, eattr, gid, len(samples),
                      task='classification')
        else:
            out = net(feats, coords, rows, cols, eattr, gid, len(samples))
        loss = torch.nn.functional.binary_cross_entropy_with_logits(
            out.reshape(-1)[:len(samples)], ys)
        loss.backward()
        opt.step()
    net.eval()
    return net


def _flax_forward(model_name, flags, scan_layers, state_dict, samples,
                  dim_output=1, **extra):
    import jax
    n_graphs = len(samples)
    batch = pad_graphs_to_batch(
        samples, num_graphs=n_graphs,
        n_pad=sum(s.num_nodes for s in samples) + 9,
        e_pad=sum(s.num_edges for s in samples) + 17)
    model = build_model(model_name, dim_input=DIM_IN, k=K,
                        dim_output=dim_output, num_layers=LAYERS,
                        scan_layers=scan_layers, **flags)
    template = jax.jit(
        lambda k, b: model.init(k, b, **extra))(
            jax.random.PRNGKey(1), batch)
    params = torch_to_flax_params(state_dict, jax.tree.map(
        np.asarray, template), model_name)
    out = np.asarray(jax.jit(
        lambda p, b: model.apply(p, b, **extra))(params, batch))
    return out[:n_graphs], batch


EGNN_FLAGS = dict(residual=True, normalize=True, tanh=True, graphnorm=True,
                  graphnorm_whole_batch=True, edge_attention=True,
                  softmax_attention=True)


@pytest.mark.parametrize('scan_layers', [False, True],
                         ids=['unrolled', 'scan'])
def test_egnn_import_round_trip(scan_layers):
    samples = _random_samples(4, seed=11)
    torch.manual_seed(0)
    net = RefEGNN(DIM_IN, K, 1, LAYERS, residual=True, normalize=True,
                  tanh=True, graphnorm=True, edge_attention=True,
                  softmax_attention=True)
    _train_torch_steps(net, samples)
    sd = ref_state_dict_egnn(net)

    flax_out, _ = _flax_forward('egnn', EGNN_FLAGS, scan_layers, sd,
                                samples)
    feats, coords, rows, cols, eattr, gid, _ = samples_to_torch_batch(
        samples)
    with torch.no_grad():
        torch_out = net(feats, coords, rows, cols, eattr, gid,
                        len(samples)).numpy().reshape(-1)
    np.testing.assert_allclose(flax_out.reshape(-1), torch_out,
                               atol=1e-5, rtol=1e-5)


def test_legacy_key_schemas():
    """Both legacy migrations the reference applies on load: the
    att_mlp->edge_attention_mlp rename and the compat 4-module att_mlp
    with its Linear at Sequential index 2."""
    samples = _random_samples(3, seed=12)
    torch.manual_seed(1)
    net = RefEGNN(DIM_IN, K, 1, LAYERS, residual=True, normalize=True,
                  tanh=True, graphnorm=True, edge_attention=True,
                  node_attention=True)
    _train_torch_steps(net, samples)
    sd = ref_state_dict_egnn(net)

    renamed = {}
    for k, v in sd.items():
        if '.node_att_mlp.' in k:
            k = k.replace('node_att_mlp', 'node_attention_mlp')
        elif '.att_mlp.' in k:
            k = k.replace('att_mlp', 'edge_attention_mlp')
        renamed[k] = v
    compat = {k.replace('att_mlp.0.', 'att_mlp.2.'): v
              for k, v in sd.items()}

    flags = dict(residual=True, normalize=True, tanh=True, graphnorm=True,
                 graphnorm_whole_batch=True, edge_attention=True,
                 node_attention=True)
    base, _ = _flax_forward('egnn', flags, False, sd, samples)
    for legacy in (renamed, compat):
        out, _ = _flax_forward('egnn', flags, False, legacy, samples)
        np.testing.assert_allclose(out, base, atol=0, rtol=0)


def test_multitask_import_both_heads():
    samples = _random_samples(4, seed=13)
    torch.manual_seed(2)
    net = RefMultitaskEGNN(DIM_IN, K, 3, LAYERS, edge_attention=True,
                           residual=True, normalize=True, tanh=True,
                           graphnorm=True, final_softplus=True)
    _train_torch_steps(net, samples, multitask=True)
    sd = ref_state_dict_multitask(net)

    flags = dict(residual=True, normalize=True, tanh=True, graphnorm=True,
                 graphnorm_whole_batch=True, edge_attention=True,
                 final_softplus=True)
    feats, coords, rows, cols, eattr, gid, _ = samples_to_torch_batch(
        samples)
    for task in ('classification', 'multi_regression'):
        out, _ = _flax_forward('multitask', flags, False, sd, samples,
                               dim_output=3, task=task)
        with torch.no_grad():
            ref = net(feats, coords, rows, cols, eattr, gid, len(samples),
                      task=task).numpy()
        np.testing.assert_allclose(
            out.reshape(len(samples), -1), ref.reshape(len(samples), -1),
            atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize('thick', [False, True], ids=['thin', 'thick'])
def test_lucid_import(thick):
    samples = _random_samples(3, seed=14)
    torch.manual_seed(3)
    tflags = dict(soft_edge=True, thick_attention=thick, norm_feats=True,
                  norm_coors=True, tanh=True, thin_mlps=not thick,
                  graphnorm=True, node_final_act=False)
    net = RefLucidEGNN(DIM_IN, K, 1, LAYERS, **tflags)
    _train_torch_steps(net, samples)
    sd = ref_state_dict_lucid(net)

    flags = dict(attention=True, thick_attention=thick, norm_feats=True,
                 norm_coords=True, tanh=True, thin_mlps=not thick,
                 graphnorm=True, graphnorm_whole_batch=True,
                 node_final_act=False)
    out, _ = _flax_forward('lucid', flags, False, sd, samples)
    feats, coords, rows, cols, eattr, gid, _ = samples_to_torch_batch(
        samples)
    with torch.no_grad():
        ref = net(feats, coords, rows, cols, eattr, gid,
                  len(samples)).numpy().reshape(-1)
    np.testing.assert_allclose(out.reshape(-1), ref, atol=1e-5, rtol=1e-5)


def test_architecture_mismatch_raises():
    import jax
    samples = _random_samples(2, seed=15)
    torch.manual_seed(4)
    net = RefEGNN(DIM_IN, K, 1, LAYERS, residual=True, normalize=True,
                  tanh=True, graphnorm=True)  # no attention
    sd = ref_state_dict_egnn(net)
    batch = pad_graphs_to_batch(samples, num_graphs=2, n_pad=64, e_pad=128)
    model = build_model('egnn', dim_input=DIM_IN, k=K, dim_output=1,
                        num_layers=LAYERS, scan_layers=False,
                        edge_attention=True, graphnorm=True)
    template = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    with pytest.raises(ValueError, match='att_mlp'):
        torch_to_flax_params(sd, jax.tree.map(np.asarray, template),
                             'egnn')


def test_reference_run_dir_flow(tmp_path):
    """A user points the rebuild at a reference-style run dir: .pt
    checkpoint + model_kwargs.yaml/cmd_args.yaml sidecars ->
    models.load_model builds the Trainer, imports the weights, and
    predictions match the torch net."""
    import jax

    from pointvs_tpu.models.load_model import load_model
    from pointvs_tpu.utils import save_yaml

    samples = _random_samples(4, seed=16)
    torch.manual_seed(5)
    net = RefEGNN(DIM_IN, K, 1, LAYERS, residual=True, normalize=True,
                  tanh=True, graphnorm=False, edge_attention=True)
    _train_torch_steps(net, samples)
    sd = ref_state_dict_egnn(net)

    run = tmp_path / 'ref_run'
    (run / 'checkpoints').mkdir(parents=True)
    torch.save({'model_state_dict': sd, 'p_epoch': 7, 'a_epoch': 0,
                'learning_rate': 0.002, 'weight_decay': 1e-4},
               run / 'checkpoints' / 'pose_ckpt_epoch_7.pt')
    # Reference-schema sidecars (ref save format): model_kwargs carries
    # the net hyperparams incl. the ignored 'act'; cmd_args the flag soup.
    save_yaml({'dim_input': DIM_IN, 'k': K, 'dim_output': 1,
               'num_layers': LAYERS, 'residual': True, 'normalize': True,
               'tanh': True, 'graphnorm': False, 'edge_attention': True,
               'act': 'relu', 'dropout': 0.0,
               'model_task': 'classification'},
              run / 'model_kwargs.yaml')
    save_yaml({'model': 'egnn', 'learning_rate': 0.002,
               'weight_decay': 1e-4, 'use_1cycle': False,
               'warm_restarts': False, 'egnn_attention': True},
              run / 'cmd_args.yaml')

    trainer, model_kwargs, cmd_args = load_model(run, silent=True)
    assert trainer.p_epoch == 7

    batch = pad_graphs_to_batch(
        samples, num_graphs=4,
        n_pad=sum(s.num_nodes for s in samples) + 9,
        e_pad=sum(s.num_edges for s in samples) + 17)
    params = jax.tree.map(np.asarray, trainer.params)
    out = np.asarray(jax.jit(trainer.model.apply)(params, batch))[:4]
    feats, coords, rows, cols, eattr, gid, _ = samples_to_torch_batch(
        samples)
    with torch.no_grad():
        ref = net(feats, coords, rows, cols, eattr, gid, 4)
    np.testing.assert_allclose(out.reshape(-1), ref.numpy().reshape(-1),
                               atol=1e-5, rtol=1e-5)
