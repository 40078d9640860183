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
from flypylib_tpu.infer.large import (
    detect_h5,
    detect_staged,
    detect_streaming,
    h5_reader,
    array_reader,
    dvid_reader,
    make_stream_plan,
    stage_volume,
    stage_volume_chunked,
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
    "detect_h5",
    "detect_staged",
    "detect_streaming",
    "h5_reader",
    "array_reader",
    "dvid_reader",
    "make_stream_plan",
    "stage_volume",
    "stage_volume_chunked",
]
