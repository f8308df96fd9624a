from snvc_tpu.data.kitti import KittiScene, KittiDataset, read_split
from snvc_tpu.data.instance_db import InstanceRecord, build_db_from_gt, build_db_from_predictions
from snvc_tpu.data.pipeline import InstanceBatch, RefinementPipeline
