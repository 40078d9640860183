"""Detection-level gate for fold_form="split" (round 5).

The split fold shifts logits by bf16-accumulation noise (~2.5e-3 at
scale 0.58); before it can become the packed U-Net default the
detection lists at a production-like operating point must be compared.
Runs detect_staged (method="both") on a 256^3 uint8 volume with the
concat and split engines and diffs the NMS + CC lists.

python experiments/unet_fold_split_detect.py [size]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from bench import make_volume_u8
from flypylib_tpu.infer.large import detect_staged, make_stream_plan
from flypylib_tpu.infer.tiled import infer_volume
from flypylib_tpu.models.zoo import unet
from flypylib_tpu.ops.packed_unet import PackedUNet, packed_unet_spec
from flypylib_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

OUT = "experiments/unet_fold_split_detect.jsonl"


def emit(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(row) + "\n")


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    spec = unet()
    pspec = packed_unet_spec(spec)
    variables = spec.init(
        jax.random.PRNGKey(0), pspec.valid_size(64 + 2 * pspec.context)
    )
    vol = make_volume_u8(size, n_blobs=max(64, size // 8))
    probe = infer_volume(
        pspec, variables,
        vol[:128, :128, :128].astype(np.float32) / 255.0, tile_out=128,
    )
    thr = float(np.quantile(probe, 0.9999))
    common = dict(window=5, threshold=thr,
                  max_detections_per_roi=32768,
                  max_components_per_roi=32768, method="both")

    lists = {}
    for ff in ("concat", "split"):
        ps = packed_unet_spec(spec)
        ps.module.fold_form = ff  # same geometry, different fold
        plan = make_stream_plan(ps, variables, vol.shape, **common)
        nms_det, cc_det = detect_staged(ps, variables, vol, plan=plan,
                                        **common)
        lists[ff] = (nms_det, cc_det)
        emit({"fold_form": ff, "size": size, "nms": len(nms_det),
              "cc": len(cc_det)})

    (n_a, c_a), (n_b, c_b) = lists["concat"], lists["split"]
    nms_same = len(n_a) == len(n_b) and bool(
        np.array_equal(n_a.locs, n_b.locs)
    )
    cc_same = len(c_a) == len(c_b) and bool(
        np.allclose(c_a.locs, c_b.locs, atol=1e-6)
    )
    emit({"size": size, "nms_identical": nms_same,
          "cc_identical": cc_same})


if __name__ == "__main__":
    main()
