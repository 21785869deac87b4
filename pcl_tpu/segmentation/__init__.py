"""Segmentation — TPU-native equivalents of the reference ``segmentation/``
module (SURVEY §2.8). Cluster extraction is iterated label propagation over
fixed-capacity neighbor lists (the XLA answer to PCL's queue-based flood
fill, reference: segmentation/include/pcl/segmentation/extract_clusters.h:62).
"""

from pcl_tpu.segmentation.clustering import (
    euclidean_clusters,
    labels_to_cluster_sizes,
    propagate_labels,
)
from pcl_tpu.segmentation.region_growing import region_growing
from pcl_tpu.segmentation.sac_segmentation import sac_segmentation, segment_differences
from pcl_tpu.segmentation.supervoxel import supervoxel_clustering, SupervoxelResult
from pcl_tpu.segmentation.graphcut import (
    min_cut_segmentation,
    grab_cut,
    max_flow_binary_labels,
)
from pcl_tpu.segmentation.organized import (
    organized_connected_components,
    organized_multi_plane_segmentation,
    extract_polygonal_prism,
    PlanarRegion,
)
from pcl_tpu.segmentation.advanced import (
    lccp_segmentation,
    cpc_segmentation,
    seeded_hue_segmentation,
    random_walker,
    UnaryClassifier,
)
