from stemseg_tpu.ops.cluster_pallas import (  # noqa: F401
    PALLAS_POINT_LIMIT,
    TILED_POINT_LIMIT,
    cluster_points_pallas,
    cluster_points_pallas_tiled,
    pallas_clustering_supported,
)
