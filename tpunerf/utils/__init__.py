from tpunerf.utils.misc import (  # noqa: F401
    make_path, seed_everything, tensor2numpy,
)
from tpunerf.utils.logging import get_logger, init_logger  # noqa: F401
