"""3D U-Net variant: train on object masks, detect via connected components,
evaluate with PR matching (eval config 4 [B:10]).

The U-Net predicts blob masks rather than sharp peaks, so detection uses
the CC path (component centroids) instead of NMS — the same split flypylib
made between its peak-style and mask-style models.

Run: python examples/unet_components_eval.py [--size 64] [--epochs 3]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import flypylib_tpu as fpl
from flypylib_tpu.models.zoo import unet
from flypylib_tpu.train.trainer import TrainConfig
from examples.train_infer_eval import synthetic_cutout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    import jax

    print(f"devices: {jax.devices()}")

    train_img, train_tb = synthetic_cutout(args.size, 8, seed=0)
    test_img, test_tb = synthetic_cutout(args.size, 8, seed=1)

    spec = unet(base_features=16, levels=2, convs_per_stage=2)
    print(f"unet: context={spec.context}, size_multiple={spec.size_multiple}")

    net = fpl.FplNetwork(
        spec,
        train_config=TrainConfig(
            patch_size=spec.valid_size(40), batch_size=16,
            steps_per_epoch=60, learning_rate=5e-4,
        ),
    )
    t0 = time.time()
    hist = net.train(train_img, tbars=train_tb, epochs=args.epochs, radius=4)
    print(f"train: {time.time() - t0:.1f}s  last loss={hist[-1]['loss']:.4f}")

    t0 = time.time()
    det = net.detect(test_img, threshold=0.5, tile_out=40,
                     method="components")
    print(f"detect (CC path): {time.time() - t0:.1f}s, {len(det)} components "
          f"(gt has {len(test_tb)})")

    curve = fpl.evaluate(det, test_tb, dist_thresh=5.0)
    if len(curve["precision"]):
        print(f"precision={curve['precision'][-1]:.3f} "
              f"recall={curve['recall'][-1]:.3f}")

    # voxel-wise PR entirely on device (the probability map never
    # leaves HBM; large volumes stream in bounded memory)
    from flypylib_tpu.io.synapses import make_training_volumes

    test_lab, test_mask = make_training_volumes(
        test_tb, test_img.shape, radius=4, border=net.context
    )
    t0 = time.time()
    vpr = net.evaluate_voxels(
        test_img, test_lab, test_mask,
        thresholds=np.asarray([0.3, 0.5, 0.7], np.float32),
    )
    print(f"voxel PR (on-device): {time.time() - t0:.1f}s  "
          + "  ".join(
              f"t={t:.1f}: p={p:.3f} r={r:.3f}"
              for t, p, r in zip(vpr["thresholds"], vpr["precision"],
                                 vpr["recall"])
          ))


if __name__ == "__main__":
    main()
