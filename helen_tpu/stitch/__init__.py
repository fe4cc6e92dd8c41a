from helen_tpu.stitch.aligner import Aligner, Alignment, Filter
from helen_tpu.stitch.engine import Stitcher, stitch_contig

__all__ = ["Aligner", "Alignment", "Filter", "Stitcher", "stitch_contig"]
