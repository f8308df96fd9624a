from snvc_tpu.models.vernier import VernierScale, get_model
from snvc_tpu.models.hrnet import HRNet
from snvc_tpu.models.fc_model import FCModel
