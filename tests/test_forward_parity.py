"""Cross-framework forward parity: identical weights into the torch
reference-math EGNN (pointvs_tpu/testing/torch_ref.py, pinned to
/root/reference/point_vs/models/geometric/egnn_satorras.py:23-329) and the
flax SartorrasEGNN must produce the same outputs.

This pins the rebuild to the reference's *math* directly, not just to
invariance/determinism properties. GraphNorm configs use single-graph
batches: the reference computes GraphNorm statistics over the whole
concatenated node batch (GraphNorm inside nn.Sequential gets batch=None),
while the rebuild uses per-graph masked statistics — the two coincide
exactly when the batch holds one graph (see torch_ref.py docstring).
"""
import numpy as np
import pytest
import torch

from pointvs_tpu.data.buckets import GraphSample, pad_graphs_to_batch
from pointvs_tpu.models import build_model
from pointvs_tpu.testing.torch_ref import (
    RefEGNN, load_flax_params, samples_to_torch_batch)

K, DIM_IN, LAYERS = 16, 12, 3


def _random_samples(n_graphs, seed=0):
    rng = np.random.RandomState(seed)
    samples = []
    for g in range(n_graphs):
        n = int(rng.randint(8, 20))
        e = int(rng.randint(20, 60))
        senders = np.sort(rng.randint(0, n, e)).astype(np.int32)
        samples.append(GraphSample(
            node_feats=rng.rand(n, DIM_IN).astype(np.float32),
            coords=(rng.rand(n, 3) * 8).astype(np.float32),
            senders=senders,
            receivers=rng.randint(0, n, e).astype(np.int32),
            edge_attr=np.eye(3, dtype=np.float32)[rng.randint(0, 3, e)],
            y=np.float32(rng.randint(0, 2))))
    return samples


CONFIGS = [
    # (name, flags, n_graphs) — graphnorm configs must be single-graph
    ('default', dict(residual=True, normalize=True, tanh=True,
                     graphnorm=True), 1),
    ('sigmoid_attention', dict(residual=True, normalize=True, tanh=True,
                               graphnorm=True, edge_attention=True), 1),
    ('softmax_attention', dict(residual=True, normalize=True, tanh=True,
                               graphnorm=True, edge_attention=True,
                               softmax_attention=True), 1),
    ('node_attention', dict(residual=True, normalize=True, tanh=True,
                            graphnorm=True, edge_attention=True,
                            node_attention=True), 1),
    ('batched_no_graphnorm', dict(residual=True, normalize=True, tanh=True,
                                  graphnorm=False, edge_attention=True,
                                  softmax_attention=True), 4),
]


@pytest.mark.parametrize('name,flags,n_graphs',
                         CONFIGS, ids=[c[0] for c in CONFIGS])
def test_forward_parity(name, flags, n_graphs):
    import jax

    samples = _random_samples(n_graphs, seed=hash(name) % 2 ** 31)
    total_n = sum(s.num_nodes for s in samples)
    total_e = sum(s.num_edges for s in samples)
    batch = pad_graphs_to_batch(
        samples, num_graphs=n_graphs,
        n_pad=total_n + 7, e_pad=total_e + 13)  # deliberate padding

    model = build_model('egnn', dim_input=DIM_IN, k=K, dim_output=1,
                        num_layers=LAYERS, scan_layers=False, **flags)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    flax_out = np.asarray(jax.jit(model.apply)(params, batch)).reshape(-1)

    torch_flags = {k: v for k, v in flags.items()}
    net = RefEGNN(DIM_IN, K, 1, LAYERS, **torch_flags)
    load_flax_params(net, jax.tree.map(np.asarray, params))
    net.eval()
    feats, coords, rows, cols, eattr, gid, _ = samples_to_torch_batch(
        samples)
    with torch.no_grad():
        torch_out = net(feats, coords, rows, cols, eattr, gid,
                        n_graphs).numpy().reshape(-1)

    np.testing.assert_allclose(flax_out[:n_graphs], torch_out,
                               atol=1e-5, rtol=1e-5)
