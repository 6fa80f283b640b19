from posendf_tpu.ops.fused_knn import fused_geodesic_topk
from posendf_tpu.ops.knn import (
    euclidean_rerank,
    euclidean_topk,
    geodesic_rerank,
    geodesic_topk,
    l2_topk,
)

__all__ = [
    "euclidean_rerank", "euclidean_topk", "fused_geodesic_topk",
    "geodesic_rerank", "geodesic_topk", "l2_topk",
]
