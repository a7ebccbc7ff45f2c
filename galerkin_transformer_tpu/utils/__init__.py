from .prng import get_seed, split_like
from .timing import timer, simple_timer
from .config import load_config, merge_config, DotDict
from .naming import get_model_name
from .misc import default, get_num_params
from .system import (is_interactive, get_size, get_file_size, find_files,
                     get_memory, get_system)

__all__ = [
    "get_seed", "split_like", "timer", "simple_timer",
    "load_config", "merge_config", "DotDict", "get_model_name",
    "default", "get_num_params", "is_interactive", "get_size",
    "get_file_size", "find_files", "get_memory", "get_system",
]
