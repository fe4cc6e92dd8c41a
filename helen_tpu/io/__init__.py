from helen_tpu.io.images import ImageRecord, MarginPolishDataset, batched_image_iterator
from helen_tpu.io.prediction_store import (
    PredictionStore,
    read_prediction_regions,
    read_region_chunks,
)
from helen_tpu.io.fasta import write_fasta

__all__ = [
    "ImageRecord",
    "MarginPolishDataset",
    "batched_image_iterator",
    "PredictionStore",
    "read_prediction_regions",
    "read_region_chunks",
    "write_fasta",
]
