"""Model registry and kwargs plumbing (ref point_vs.py:88-96, :189-221)."""
from __future__ import annotations

import inspect
from typing import Any, Dict

from pointvs_tpu.models.egnn import SartorrasEGNN
from pointvs_tpu.models.en_transformer import EnTransformer
from pointvs_tpu.models.lucid import LucidEGNN
from pointvs_tpu.models.multitask import MultitaskSatorrasEGNN
from pointvs_tpu.models.siamese import SiameseEGNN
from pointvs_tpu.models.vanilla import DenseEGNN

MODEL_REGISTRY = {
    'egnn': SartorrasEGNN,
    'lucid': LucidEGNN,
    'multitask': MultitaskSatorrasEGNN,
    'en_transformer': EnTransformer,
    # The reference's SE(3)-transformer niche (its lie_transformer wrapped
    # external research libs); served here by the En-Transformer design.
    'lie_transformer': EnTransformer,
    # Two-tower receptor/ligand network (ref point_vs/models/siamese.py).
    'siamese': SiameseEGNN,
    # Vanilla (p, v, m) family: the reference's LieConv/LieTransformer
    # wrappers (point_vs/models/vanilla/lie_conv.py:50-115) served by the
    # dense all-pairs EGNN redesign.
    'lie_conv': DenseEGNN,
    'dense_egnn': DenseEGNN,
}

# What pytree the model's __call__ consumes; drives loader collation and
# Trainer init. 'graph' = GraphBatch, 'pair' = SiamesePair (two entity-
# filtered GraphBatches), 'dense' = DenseBatch (zero-padded p/v/m).
MODEL_INPUT_KIND = {
    'siamese': 'pair',
    'lie_conv': 'dense',
    'dense_egnn': 'dense',
}


def model_input_kind(model_name: str) -> str:
    return MODEL_INPUT_KIND.get(model_name, 'graph')


def filter_model_kwargs(model_cls, kwargs: Dict[str, Any]) -> Dict[str, Any]:
    """Keep only kwargs the model dataclass accepts (the reference passes a
    flag soup into build_net(**kwargs) and relies on **kwargs swallowing
    extras; flax dataclasses are strict, so we filter)."""
    fields = set(inspect.signature(model_cls).parameters)
    return {k: v for k, v in kwargs.items() if k in fields}


def build_model(model_name: str, **model_kwargs):
    """Instantiate a model by registry name with a permissive kwarg dict."""
    if model_name not in MODEL_REGISTRY:
        raise NotImplementedError(
            f'model must be one of {sorted(MODEL_REGISTRY)}, '
            f'got {model_name!r}')
    model_cls = MODEL_REGISTRY[model_name]
    return model_cls(**filter_model_kwargs(model_cls, model_kwargs))
