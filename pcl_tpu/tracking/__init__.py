"""Object tracking — TPU-native equivalent of the reference ``tracking/``
module (SURVEY §2.13): particle-filter pose tracking with batched coherence
evaluation (all particles scored in one sweep instead of per-particle loops).
"""

from pcl_tpu.tracking.particle_filter import (
    ParticleFilterState,
    init_tracker,
    step_tracker,
)
from pcl_tpu.tracking.kld import KLDState, init_kld_tracker, step_tracker_kld
from pcl_tpu.tracking.klt import pyramidal_klt
