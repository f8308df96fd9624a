from snvc_tpu.inference.refine import RefineRunner
from snvc_tpu.inference.kitti_writer import PredictionWriter
