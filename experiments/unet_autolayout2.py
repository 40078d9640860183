"""AUTO-layout two-phase U-Net, attempt 2: isolate the InvalidArgument.

unet_autolayout found phase_e with ``out_shardings=Format(Layout.AUTO)``
compiles and returns skips in XLA's preferred layout
(major_to_minor=(1,0,3,2,4), tiling=((8,128),(2,1))), but something in
the consume path raised INVALID_ARGUMENT.  This probe splits the steps:

1. host-read one element of an AUTO-layout output (device->host path);
2. feed the AUTO-layout arrays to a jit compiled with DEFAULT input
   layouts (JAX should insert a relayout copy);
3. feed them to a jit compiled with EXPLICIT matching in_shardings
   formats (no relayout — the win we want);
4. feed them to a jit with in_shardings=Format(Layout.AUTO).

python experiments/unet_autolayout2.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.layout import Format, Layout

from flypylib_tpu.models.zoo import unet
from flypylib_tpu.ops.packed_conv import pack_volume, pack_weight_d1
from flypylib_tpu.ops.packed_unet import packed_unet_spec, pool_pack, unpack_volume


def step(name, fn):
    try:
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(json.dumps({"step": name, "ok": True,
                          "s": round(dt, 3)}), flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"step": name, "ok": False,
                          "error": str(e)[:300]}), flush=True)
        return None


def main():
    spec = unet()
    pspec = packed_unet_spec(spec)
    pm = pspec.module
    inner = pm.inner
    tin = pspec.valid_size(96 + 2 * pspec.context)
    variables = spec.init(jax.random.PRNGKey(0), tin)
    rng = np.random.default_rng(0)
    B = 2
    x = jnp.asarray(rng.random((B, tin, tin, tin, 1)), jnp.float32)

    cps = inner.convs_per_stage
    levels = inner.levels
    dt = pm.dtype

    def conv_relu(params, x, i):
        w = params[f"Conv_{i}"]["kernel"].astype(dt)
        b = params[f"Conv_{i}"]["bias"].astype(dt)
        y = lax.conv_general_dilated(
            x, pack_weight_d1(w), (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ) + jnp.tile(b, 8)
        return jax.nn.relu(y)

    def phase_e_body(variables, x):
        params = variables["params"]
        x = pack_volume(x.astype(dt))
        conv_i = 0
        skips = []
        for _ in range(levels):
            for _ in range(cps):
                x = conv_relu(params, x, conv_i)
                conv_i += 1
            skips.append(x)
            x = pool_pack(x)
        for _ in range(cps):
            x = conv_relu(params, x, conv_i)
            conv_i += 1
        return unpack_volume(x), skips

    auto = Format(Layout.AUTO)
    phase_e_auto = jax.jit(phase_e_body, out_shardings=auto)
    res = step("compile+run phase_e AUTO", lambda: phase_e_auto(variables, x))
    if res is None:
        return
    xd, skips = res
    for i, a in enumerate(jax.tree_util.tree_leaves((xd, skips))):
        print(f"leaf {i}: {a.shape} {a.format.layout}", flush=True)

    step("host-read xd[0,0,0,0,0]",
         lambda: np.asarray(jax.device_get(xd)).ravel()[0])
    step("host-read skip0 element",
         lambda: np.asarray(jax.device_get(skips[0])).ravel()[0])

    # a tiny consumer: sum over each input
    def consume(xd, skips):
        return (jnp.sum(xd.astype(jnp.float32))
                + sum(jnp.sum(s.astype(jnp.float32)) for s in skips))

    c_def = jax.jit(consume)
    step("consume with default-jit", lambda: float(c_def(xd, skips)))

    fmts = (xd.format, [s.format for s in skips])
    c_exp = jax.jit(consume, in_shardings=fmts)
    step("consume with explicit in_shardings formats",
         lambda: float(c_exp(xd, skips)))

    c_auto = jax.jit(consume, in_shardings=Format(Layout.AUTO))
    step("consume with AUTO in_shardings",
         lambda: float(c_auto(xd, skips)))

    # a conv consumer (the real decoder shape): fold conv on skip0
    def conv_consume(s):
        w = jnp.zeros((2, 2, 2, s.shape[-1], 64), dt)
        return jnp.sum(lax.conv_general_dilated(
            s, w, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ).astype(jnp.float32))

    step("conv-consume default-jit", lambda: float(jax.jit(conv_consume)(skips[0])))
    step("conv-consume explicit fmt",
         lambda: float(jax.jit(conv_consume,
                               in_shardings=(skips[0].format,))(skips[0])))


if __name__ == "__main__":
    main()
