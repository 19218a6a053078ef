from scotustician_spark.ml.clustering import (
    analysis_report,
    cluster_centroids,
    cluster_stats,
    kmeans_assign,
    pca_project_2d,
    representatives,
    standard_scale,
    topk_neighbors,
    tsne_hdbscan_driver,
)

__all__ = [
    "analysis_report",
    "cluster_centroids",
    "cluster_stats",
    "kmeans_assign",
    "pca_project_2d",
    "representatives",
    "standard_scale",
    "topk_neighbors",
    "tsne_hdbscan_driver",
]
