from posendf_tpu.ops.knn import (
    euclidean_rerank,
    geodesic_rerank,
    geodesic_topk,
    l2_topk,
)

__all__ = ["euclidean_rerank", "geodesic_rerank", "geodesic_topk", "l2_topk"]
