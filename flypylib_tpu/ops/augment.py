"""On-device flip/rotation augmentation.

Parity: flypylib's training batch generator applies random flip /
axis-swap augmentation on host with NumPy (SURVEY.md section 2.2 row 3,
eval config 3 [B:9]).  Here augmentation runs on device inside the jit'd
train step, fused by XLA into the input pipeline, so the host only supplies
patch coordinates and PRNG keys.

The group is the standard 16-element symmetry group for z-anisotropic EM
volumes: (xy-transpose) x (x-flip) x (y-flip) x (z-flip).  Code bit layout
(code in [0, 16)):

- bit 0: flip z
- bit 1: flip y
- bit 2: flip x
- bit 3: transpose the (y, x) axes (applied after flips; requires Y == X)

All 16 codes enumerate the full group.  The same code must be applied to
the image patch, label patch, and mask patch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

AUGMENT_GROUP_SIZE = 16


def augment_patch(patch: jax.Array, code: jax.Array) -> jax.Array:
    """Apply augmentation ``code`` (traced int32 in [0,16)) to a patch.

    ``patch`` is (Z, Y, X) or (Z, Y, X, C); jit/vmap-safe.  The transpose
    branch requires Y == X (cubic-in-xy patches), enforced at trace time.
    """
    z_ax, y_ax, x_ax = 0, 1, 2

    def maybe(bit, fn, x):
        return lax.cond((code >> bit) & 1, fn, lambda a: a, x)

    out = maybe(0, lambda a: jnp.flip(a, z_ax), patch)
    out = maybe(1, lambda a: jnp.flip(a, y_ax), out)
    out = maybe(2, lambda a: jnp.flip(a, x_ax), out)
    if patch.shape[y_ax] != patch.shape[x_ax]:
        raise ValueError(
            "xy-transpose augmentation requires square (y, x) patches; got "
            f"shape {patch.shape}"
        )
    out = maybe(3, lambda a: jnp.swapaxes(a, y_ax, x_ax), out)
    return out


def augment_batch(batch: jax.Array, codes: jax.Array) -> jax.Array:
    """vmap of augment_patch over the leading batch dimension."""
    return jax.vmap(augment_patch)(batch, codes)
