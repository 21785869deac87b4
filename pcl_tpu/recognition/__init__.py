"""Object recognition — TPU-native equivalents of the reference
``recognition/`` module (SURVEY §2.11): correspondence grouping (geometric
consistency, Hough voting) and greedy hypothesis verification.
"""

from pcl_tpu.recognition.grouping import (
    geometric_consistency_grouping,
    hough3d_grouping,
    refine_grouping_sac,
    GroupingResult,
)
from pcl_tpu.recognition.verification import greedy_hypothesis_verification
from pcl_tpu.recognition.linemod import (
    color_gradient_quantized,
    surface_normal_quantized,
    spread_quantized_map,
    extract_template,
    detect_templates,
    line_rgbd_detect,
    build_modality_maps,
    LinemodTemplate,
    LinemodDetection,
)
from pcl_tpu.recognition.ism import (
    ISMModel,
    train_ism,
    find_objects,
    find_strongest_peaks,
    save_ism_model,
    load_ism_model,
    simplify_cloud,
    align_y_with_normal,
)
from pcl_tpu.recognition.orr import (
    trimmed_icp,
    obj_rec_ransac,
    distance_map,
    TrimmedICPResult,
)
from pcl_tpu.recognition.orr import (
    mask_difference,
    mask_erode,
    sample_oriented_point_pairs,
    pair_feature_hash_table,
)
from pcl_tpu.recognition.global_pipeline import (
    GlobalModelDatabase,
    GlobalRecognition,
    train_global_database,
    recognize_clusters,
    segment_scene_clusters,
    render_views,
)
from pcl_tpu.recognition.linemod_io import save_templates, load_templates
