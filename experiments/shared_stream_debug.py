"""Diff the staged band shell vs the streaming band-local shell (pooled)."""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from flypylib_tpu.infer.large import (
    make_stream_plan, stage_volume, array_reader,
)
from flypylib_tpu.models.zoo import unet

rng = np.random.default_rng(3)
spec = unet(base_features=2, levels=1, convs_per_stage=1)
variables = spec.init(jax.random.PRNGKey(0))
vol = rng.random((52, 81, 73)).astype(np.float32)

plan = make_stream_plan(spec, variables, vol.shape, core=24, window=3,
                        threshold=0.5, method="nms")
print("h", plan.h, "ctx", plan.ctx, "fetch_halo", plan.fetch_halo,
      "core", plan.core_dims)

rpb = plan.band_rpb()
print("band_rpb:", rpb)
if rpb is None:
    rpb = 1
b0s = plan._band_starts(rpb)
print("b0s", b0s)
fp = plan.band_pipe(rpb)
print("fp tin", fp._tin, "padded", fp.padded_shape, "out", fp._out_shape,
      "split_write", fp._split_write, "slabs", [z for z, _ in fp._slabs])

big, halo = stage_volume(vol, plan=plan)
# replicate the zero-extension from _detect_staged_shared_multi
off = halo - plan.ctx
tin = fp._tin
_, py, px = fp.padded_shape
z_top = max(zs for zs, _ in fp._slabs) + tin
need = (off + b0s[-1] - plan.h + z_top, off + py, off + px)
pad_hi = [max(0, n - s) for n, s in zip(need, big.shape)]
if any(pad_hi):
    big = jnp.pad(big, [(0, p) for p in pad_hi])

dev = jax.devices()[0]

# band-local window, exactly as _detect_streaming_shared builds it
h, ctx = plan.h, plan.ctx
vz, vy, vx = plan.shape
cz = plan.core_dims[0]
be = rpb * cz

from flypylib_tpu.infer.large import _band_window_np


def band_window(b0):
    return _band_window_np(plan, fp, array_reader(vol)[1], b0)

for bi, b0 in enumerate(b0s):
    s_staged = np.asarray(
        plan.shared_prob_band(big, halo, b0, fp, plan.pipe.variables, dev)
    )
    W = band_window(b0)
    s_local = np.asarray(
        plan.shared_prob_band_local(jax.device_put(W), b0, fp)
    )
    finite = np.isfinite(s_staged) & np.isfinite(s_local)
    diff = np.zeros_like(s_staged)
    diff[finite] = np.abs(s_staged[finite] - s_local[finite])
    mism = np.isfinite(s_staged) != np.isfinite(s_local)
    n_diff = int((diff > 0).sum())
    print(f"band {bi} b0={b0}: finite-mismatch={int(mism.sum())} "
          f"val-diff={n_diff} max={diff.max():.3e}")
    if n_diff:
        idx = np.argwhere(diff > 0)
        print("  z range", idx[:, 0].min(), idx[:, 0].max(),
              "y range", idx[:, 1].min(), idx[:, 1].max(),
              "x range", idx[:, 2].min(), idx[:, 2].max(),
              "shell shape", s_staged.shape)

# also compare the STAGED band input window content to the local one
# over the slab fetch region, to see whether input (not math) differs
off2 = off + b0s[0] - h
zs0 = fp._slabs[0][0]
inp_staged = np.asarray(big)[off2 + zs0:off2 + zs0 + tin,
                             off:off + py, off:off + px]
W0 = band_window(b0s[0])
inp_local = W0[zs0:zs0 + tin, :py, :px]
d = np.abs(inp_staged - inp_local)
print("input diff count", int((d > 0).sum()), "max", d.max())
if (d > 0).any():
    idx = np.argwhere(d > 0)
    print("  input z", idx[:, 0].min(), idx[:, 0].max(),
          "y", idx[:, 1].min(), idx[:, 1].max(),
          "x", idx[:, 2].min(), idx[:, 2].max(),
          "win shape", inp_staged.shape)
