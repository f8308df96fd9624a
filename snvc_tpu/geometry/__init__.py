from snvc_tpu.geometry.calib import Calibration, KittiLabel, read_label, format_label
from snvc_tpu.geometry import boxes, boxes2d, transforms, imgproc
