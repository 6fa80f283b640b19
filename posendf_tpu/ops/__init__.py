from posendf_tpu.ops.knn import geodesic_rerank, geodesic_topk, l2_topk

__all__ = ["geodesic_rerank", "geodesic_topk", "l2_topk"]
