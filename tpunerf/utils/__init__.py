from tpunerf.utils.misc import (  # noqa: F401
    enable_persistent_compilation_cache, make_path, seed_everything,
    tensor2numpy,
)
from tpunerf.utils.logging import get_logger, init_logger  # noqa: F401
