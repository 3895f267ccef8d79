"""Model zoo: E(n)-equivariant GNN variants over statically padded graph
batches (reference counterpart: point_vs/models/geometric/*).
"""
from pointvs_tpu.models.egnn import SartorrasEGNN
from pointvs_tpu.models.lucid import LucidEGNN
from pointvs_tpu.models.multitask import MultitaskSatorrasEGNN
from pointvs_tpu.models.registry import MODEL_REGISTRY, build_model
