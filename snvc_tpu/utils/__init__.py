from snvc_tpu.utils.cache import enable_compilation_cache
from snvc_tpu.utils.logging import get_logger, Experimenter
from snvc_tpu.utils.seeding import reset_seed
