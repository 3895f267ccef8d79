"""Model explanation: masking / CAM / attention attribution
(ref: point_vs/attribution/*)."""
from pointvs_tpu.attribution.attribution_fns import (
    ATTRIBUTION_FNS,
    atom_masking,
    bond_masking,
    cam,
    edge_attention,
    node_attention,
)
