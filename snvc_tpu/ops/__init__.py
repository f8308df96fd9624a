from snvc_tpu.ops.grid_sample import grid_sample_2d, sample_stereo_voxel
from snvc_tpu.ops.grid_sample_pallas import sample_stereo_voxel_pallas
from snvc_tpu.ops.warp import affine_resample, affine_resample_batch
from snvc_tpu.ops.heatmaps import (
    bev_part_heatmaps,
    heatmaps_3d,
    hard_argmax_2d,
    soft_argmax_2d,
)
from snvc_tpu.ops.points_in_boxes import (
    points_in_cuboid_jnp,
    occupancy_targets,
    roiaware_pool3d,
)
from snvc_tpu.ops.registration import rigid_transform_2d_batch, ncf_to_update
from snvc_tpu.ops.cost_volume import build_cost_volume, plane_sweep_volume
from snvc_tpu.ops.rotated_iou import bev_iou, bev_overlap, iou3d, diou_bev
from snvc_tpu.ops.nms import rotated_nms_bev, normal_nms, top_k_boxes
from snvc_tpu.ops.frustum import frustum_to_voxel, sample_frustum
from snvc_tpu.ops.assemble import assemble_instances, make_targets, make_grid_local
from snvc_tpu.ops import augment
