from flypylib_tpu.ops.nms import nms, nms_device, candidate_mask
from flypylib_tpu.ops.components import label_components, components_device
from flypylib_tpu.ops.matching import (
    evaluate,
    match_detections,
    obj_pr,
    obj_pr_curve,
    voxel_pr,
)
from flypylib_tpu.ops.augment import augment_patch, AUGMENT_GROUP_SIZE

__all__ = [
    "nms",
    "nms_device",
    "candidate_mask",
    "label_components",
    "components_device",
    "evaluate",
    "match_detections",
    "obj_pr",
    "obj_pr_curve",
    "voxel_pr",
    "augment_patch",
    "AUGMENT_GROUP_SIZE",
]
