from snvc_tpu.models.vernier import (
    VernierEncoder,
    VernierHead,
    VernierScale,
    get_model,
    scope_variables,
)
from snvc_tpu.models.hrnet import HRNet
from snvc_tpu.models.stereonet import StereoNet
from snvc_tpu.models.stereo_backbone import StereoFeatureNet
from snvc_tpu.models.fc_model import FCModel
