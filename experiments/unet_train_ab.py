"""U-Net training engine A/B: plain vs packed (round 3).

TrainConfig(engine="packed") now resolves UNetValid models through the
differentiable PackedUNet.forward_train (f32 logits conv; every other
engine op — pool_pack, crop_packed, the ConvTranspose weight fold — is
differentiable as-is).  Measured on one v5e (this file, 100 steps x
batch 16 x patch 60): plain 24.3 steps/s (83.9 patch-Mvox/s) ->
packed 27.5 (94.9) — +13%, losses identical to 4e-6.  The win is
smaller than the ConvStack's 2.0x because the U-Net's channel widths
grow with depth, so its plain convs are less MXU-lane-starved.

python experiments/unet_train_ab.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from flypylib_tpu.models.zoo import unet
from flypylib_tpu.train.trainer import (
    TrainConfig,
    TrainData,
    Trainer,
    make_train_step,
)
from flypylib_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    spec = unet()
    rng = np.random.default_rng(0)
    size = 128
    image = rng.integers(0, 256, (size,) * 3).astype(np.uint8)
    labels = (rng.random((size,) * 3) > 0.999).astype(np.float32)
    mask = np.ones((size,) * 3, np.float32)
    steps, batch = 100, 16
    for engine in ("plain", "packed"):
        cfg = TrainConfig(patch_size=60, batch_size=batch, augment=True,
                          steps_per_epoch=steps, engine=engine)
        _, epoch_step, pvox = make_train_step(spec, cfg)
        data = TrainData.build(image, labels, mask, pvox)
        tr = Trainer(spec, cfg, seed=0)
        state = tr.init_state()
        keys = jax.random.split(jax.random.PRNGKey(1), steps)
        state, m = epoch_step(state, keys, data)
        float(m["loss"])
        t0 = time.perf_counter()
        state, m = epoch_step(state, keys, data)
        float(m["loss"])
        dt = time.perf_counter() - t0
        print(json.dumps({
            "engine": engine, "patch": pvox,
            "steps_per_s": round(steps / dt, 1),
            "patch_mvox_s": round(steps * batch * pvox**3 / dt / 1e6, 1),
            "loss": float(m["loss"]),
        }), flush=True)


if __name__ == "__main__":
    main()
