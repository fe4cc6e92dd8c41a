from helen_tpu.utils.filesystem import (
    chunk_list,
    ensure_output_dir,
    list_image_files,
    list_prediction_files,
    timestamped_dir,
)
from helen_tpu.utils.jax_cache import enable_persistent_compilation_cache

__all__ = [
    "chunk_list",
    "ensure_output_dir",
    "enable_persistent_compilation_cache",
    "list_image_files",
    "list_prediction_files",
    "timestamped_dir",
]
