from mamri_tpu.perception.volume import Volume, synthetic_volume, lps_to_ras, ras_to_lps
from mamri_tpu.perception.segmentation import SegmentationParams, SegmentationResult, segment_volume

__all__ = [
    "Volume",
    "synthetic_volume",
    "lps_to_ras",
    "ras_to_lps",
    "SegmentationParams",
    "SegmentationResult",
    "segment_volume",
]
