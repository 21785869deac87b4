"""Object recognition — TPU-native equivalents of the reference
``recognition/`` module (SURVEY §2.11): correspondence grouping (geometric
consistency, Hough voting) and greedy hypothesis verification.
"""

from pcl_tpu.recognition.grouping import (
    geometric_consistency_grouping,
    hough3d_grouping,
)
from pcl_tpu.recognition.verification import greedy_hypothesis_verification
