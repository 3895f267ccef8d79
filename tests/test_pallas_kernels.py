"""Pallas windowed-segment-sum parity (interpret mode on CPU; the
compiled kernel's device parity is exercised by bench/TPU runs)."""
import jax
import jax.numpy as jnp
import numpy as np

from pointvs_tpu.ops.pallas.segment_kernels import (
    pallas_windowed_segment_sum,
)
from pointvs_tpu.ops.sorted_segment import (
    WINDOW,
    derive_max_eb,
    windowed_segment_sum,
)

np.random.seed(2)


def test_pallas_matches_xla_windowed():
    rng = np.random.RandomState(0)
    n, e, k = 1024, 8192, 32
    ids = np.sort(np.concatenate(
        [rng.randint(0, n, e - 500), np.full(500, n)])).astype(np.int32)
    data = rng.rand(e, k).astype(np.float32)
    max_eb = derive_max_eb(e, n)
    ref = windowed_segment_sum(jnp.array(data), jnp.array(ids), n)
    got = pallas_windowed_segment_sum(
        jnp.array(data), jnp.array(ids), n, WINDOW, max_eb,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)


def test_pallas_empty_windows():
    """Windows with zero incident edges must come out exactly zero."""
    rng = np.random.RandomState(1)
    n, e, k = 512, 2048, 32
    # ids concentrated in the first half: second-half windows are empty.
    # Concentration doubles the per-window load, so pass an explicit
    # capacity (the collator would have enforced this bound).
    ids = np.sort(rng.randint(0, n // 2, e)).astype(np.int32)
    data = rng.rand(e, k).astype(np.float32)
    max_eb = 2048
    got = np.asarray(pallas_windowed_segment_sum(
        jnp.array(data), jnp.array(ids), n, WINDOW, max_eb,
        interpret=True))
    assert np.all(got[n // 2:] == 0)
    ref = np.asarray(windowed_segment_sum(
        jnp.array(data), jnp.array(ids), n, max_eb=max_eb))
    np.testing.assert_allclose(got, ref, atol=1e-4)
