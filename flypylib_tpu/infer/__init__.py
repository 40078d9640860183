from flypylib_tpu.infer.tiled import TiledInference, infer_volume
from flypylib_tpu.infer.pipeline import DetectPipeline
from flypylib_tpu.infer.roi_queue import (
    ROI,
    ROIQueue,
    grid_rois,
    stream_rois,
    dvid_source,
    dvid_sink,
)

__all__ = [
    "TiledInference",
    "infer_volume",
    "DetectPipeline",
    "ROI",
    "ROIQueue",
    "grid_rois",
    "stream_rois",
    "dvid_source",
    "dvid_sink",
]
