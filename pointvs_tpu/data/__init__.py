"""Host-side data pipeline: types files -> parquet structures -> pocket box
-> radius graphs -> statically shaped, bucketed batches for the TPU.

Reference counterpart: point_vs/preprocessing/* (SURVEY.md section 2.4). The
graph construction semantics are identical; the *batching* layer is new and
TPU-native (fixed-shape buckets so XLA compiles once per bucket).
"""
from pointvs_tpu.data.preprocessing import (
    angle_3d,
    centre_on_ligand,
    concat_structs,
    extract_coords,
    generate_edges,
    make_bit_vector,
    make_box,
    uniform_random_rotation,
)
from pointvs_tpu.data.buckets import GraphBatch, pad_graphs_to_batch
from pointvs_tpu.data.dataset import PointCloudDataset
from pointvs_tpu.data.loader import GraphDataLoader, get_data_loader
