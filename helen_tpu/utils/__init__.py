from helen_tpu.utils.filesystem import (
    chunk_list,
    ensure_output_dir,
    list_image_files,
    list_prediction_files,
    timestamped_dir,
)

__all__ = [
    "chunk_list",
    "ensure_output_dir",
    "list_image_files",
    "list_prediction_files",
    "timestamped_dir",
]
