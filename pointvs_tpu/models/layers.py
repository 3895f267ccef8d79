"""Building blocks shared by the EGNN variants.

Initialisation matches the reference's torch defaults so that training
dynamics are comparable:

- ``TorchLinear``: torch.nn.Linear default init — weight and bias both
  U(-1/sqrt(fan_in), +1/sqrt(fan_in)).
- ``xavier_uniform_gain`` / ``xavier_normal``: used for the coord-MLP output
  head (gain 0.001, ref egnn_satorras.py:88-89) and the lucid variant's
  xavier_normal + zero-bias scheme (ref egnn_lucid.py:102-107).
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax import random


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)); flax kernels are [in, out]."""
    bound = 1.0 / math.sqrt(shape[0])
    return random.uniform(key, shape, dtype, -bound, bound)


def xavier_uniform_gain(gain: float):
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return random.uniform(key, shape, dtype, -bound, bound)
    return init


def xavier_normal(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * random.normal(key, shape, dtype)


class TorchLinear(nn.Module):
    """Dense layer with torch.nn.Linear's default initialisation.

    ``dtype`` is the flax computation dtype: params stay float32 and are
    cast down per-op (mixed-precision bf16 mode). None keeps full f32.
    """
    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    dtype: Optional[type] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel_init = self.kernel_init or torch_linear_kernel_init

        def bias_init(key, shape, dtype=jnp.float32):
            bound = 1.0 / math.sqrt(fan_in)
            return random.uniform(key, shape, dtype, -bound, bound)

        return nn.Dense(self.features, use_bias=self.use_bias,
                        kernel_init=kernel_init, bias_init=bias_init,
                        dtype=self.dtype)(x)


ACTIVATIONS = {
    'silu': nn.silu,
    'relu': nn.relu,
    'sigmoid': nn.sigmoid,
    'tanh': jnp.tanh,
    'softplus': nn.softplus,
    'identity': lambda x: x,
}


def activation(name: str) -> Callable:
    return ACTIVATIONS[name]


class MLP(nn.Module):
    """Sequence of TorchLinear layers with per-position activations.

    ``acts[i]`` is applied after layer i ('identity' to skip). Optional
    dropout after each linear (lucid variant places Dropout straight after
    the first Linear of each of its MLPs).
    """
    features: Sequence[int]
    acts: Sequence[str]
    dropout_rate: float = 0.0
    dropout_after: Sequence[int] = ()
    final_kernel_init: Optional[Callable] = None
    final_bias: bool = True
    kernel_init: Optional[Callable] = None
    dtype: Optional[type] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.features)
        for i, feats in enumerate(self.features):
            is_final = i == n - 1
            kinit = (self.final_kernel_init if (is_final and
                                                self.final_kernel_init)
                     else self.kernel_init)
            x = TorchLinear(feats, kernel_init=kinit,
                            use_bias=self.final_bias if is_final else True,
                            dtype=self.dtype)(x)
            if self.dropout_rate > 0 and i in self.dropout_after:
                x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
            x = activation(self.acts[i])(x)
        return x


def fourier_encode_dist(x: jnp.ndarray, num_encodings: int = 4) -> jnp.ndarray:
    """Fourier distance features (lucid variant, egnn_pytorch semantics).

    x: [E, 1] squared distances -> [E, 2*num_encodings + 1]
    (sin/cos at dyadic scales, raw value appended).
    """
    scales = 2.0 ** jnp.arange(num_encodings, dtype=x.dtype)
    scaled = x / scales  # [E, num_encodings] via broadcast of [E, 1]
    return jnp.concatenate(
        [jnp.sin(scaled), jnp.cos(scaled), x], axis=-1)


class CoorsNorm(nn.Module):
    """Normalise relative coordinate vectors to a learnable scale
    (egnn_pytorch CoorsNorm: unit vectors * scale, scale init 1e-2)."""
    scale_init: float = 1e-2
    eps: float = 1e-8

    @nn.compact
    def __call__(self, rel_coors: jnp.ndarray) -> jnp.ndarray:
        scale = self.param(
            'scale', lambda key, shape: jnp.full(shape, self.scale_init),
            (1,))
        # Clamp INSIDE the sqrt: padding edges have rel_coors == 0, and
        # sqrt'(0) = inf would leak NaN (inf * 0 cotangent) into every
        # gradient even though the forward is masked downstream.
        sq = jnp.sum(rel_coors ** 2, axis=-1, keepdims=True)
        norm = jnp.sqrt(jnp.maximum(sq, self.eps ** 2))
        return rel_coors / norm * scale
