from snvc_tpu.ops.grid_sample import grid_sample_2d, sample_stereo_voxel
from snvc_tpu.ops.warp import affine_resample
from snvc_tpu.ops.heatmaps import (
    bev_part_heatmaps,
    hard_argmax_2d,
    soft_argmax_2d,
)
from snvc_tpu.ops.points_in_boxes import (
    points_in_cuboid_jnp,
    occupancy_targets,
    roiaware_pool3d,
)
from snvc_tpu.ops.registration import rigid_transform_2d_batch, ncf_to_update
