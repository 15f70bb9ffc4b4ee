"""Core numerical ops: projections, matching solvers, cost matrices, pooling, NMS."""

from dmm_net_tpu.ops.projections import (  # noqa: F401
    project_simplex,
    project_capped_simplex,
    project_rows_simplex,
    project_cols_capped,
    dykstra_project,
)
from dmm_net_tpu.ops.matching import (  # noqa: F401
    match,
    sinkhorn_match,
    pgd_match,
)
from dmm_net_tpu.ops.cost import cost_matrix, mask_iou, cosine_similarity  # noqa: F401
from dmm_net_tpu.ops.deform_conv import DeformConv, deform_conv2d  # noqa: F401
