"""Volume-sharded inference and NMS with ICI halo exchange.

This is the TPU-native analog of flypylib's inference-side parallelism
(volume blocks split across GPU threads, SURVEY.md section 3.2) and the
"spatial sequence-parallelism" called for by SURVEY.md sections 2.3/5 and
eval configs 2/5 [B:8][B:11]:

- the volume is sharded along z over the mesh's ``space`` axis;
- each shard exchanges ``context``-deep boundary slabs with its neighbors
  via ``lax.ppermute`` (compiled to ICI sends, not host round-trips);
- edge shards substitute the host-computed reflect padding;
- the fully-convolutional forward then runs per shard, producing exactly
  its slab of the global probability map — bitwise equal to a monolithic
  run because every conv is VALID;
- sharded NMS repeats the same halo trick with the NMS window and extracts
  per-shard top-k candidates with *global* coordinates, so the merge is a
  trivial host-side concatenation of tiny detection lists (the "NMS merge
  over ICI" of [B:11] — the map itself never moves).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from flypylib_tpu.io.synapses import Tbars
from flypylib_tpu.models.zoo import ModelSpec
from flypylib_tpu.ops.host_reference import sort_detections
from flypylib_tpu.utils import round_up, to3d


def _edge_halo_exchange(slab, lo_pad, hi_pad, depth_lo, depth_hi, axis):
    """Exchange z-boundary slabs with mesh neighbors; edge shards take the
    provided pads.  slab: (S, Y, X); returns (lo, hi) halo blocks."""
    n = lax.axis_size(axis)
    i = lax.axis_index(axis)
    down = [(j, j + 1) for j in range(n - 1)]  # j's planes -> j+1's lo halo
    up = [(j + 1, j) for j in range(n - 1)]  # j+1's planes -> j's hi halo
    lo = lax.ppermute(slab[slab.shape[0] - depth_lo :], axis, down)
    hi = lax.ppermute(slab[:depth_hi], axis, up)
    lo = jnp.where(i == 0, lo_pad, lo)
    hi = jnp.where(i == n - 1, hi_pad, hi)
    return lo, hi


def sharded_infer(
    spec: ModelSpec,
    variables,
    volume: np.ndarray,
    mesh: Mesh,
    axis: str = "space",
    pad_mode: str = "reflect",
    tile_z: int | None = None,
):
    """Volume-sharded whole-volume inference over a 1-D mesh axis.

    Returns the full probability map as a z-sharded global jax array
    (same shape as ``volume``).  By default each shard's forward runs over
    its whole slab; pass ``tile_z`` (must divide the slab depth and the
    model's size_multiple) to bound per-shard activation memory — the
    shard then scans over z-subtiles in HBM, so arbitrarily large slabs
    fit (pod-scale volumes, eval config 5 [B:11]).
    """
    n = mesh.shape[axis]
    c = spec.context
    vol = np.asarray(volume, dtype=np.float32)
    vz, vy, vx = vol.shape

    # host prep: reflect-pad y/x by the context; extend z to a multiple of
    # the shard count (reflect), remembering the crop
    vz_p = round_up(vz, n)
    s = vz_p // n
    if s < c:
        raise ValueError(f"z-slab {s} thinner than context {c}")
    if spec.size_multiple > 1 and s % spec.size_multiple != 0:
        raise ValueError(
            f"z-slab {s} must be a multiple of {spec.size_multiple} for "
            f"pooling-phase alignment"
        )
    # ONE reflect pad of the original volume covers the low halo, the
    # z-extension, and the high halo — so every input plane matches what a
    # monolithic context-padded run would see (two-stage padding would
    # reflect the already-reflected extension and diverge)
    padded_all = np.pad(
        vol,
        ((c, c + (vz_p - vz)), (c, c), (c, c)),
        mode=pad_mode,
    )
    zpad_lo = jnp.asarray(padded_all[:c])
    zpad_hi = jnp.asarray(padded_all[c + vz_p :])
    work = jnp.asarray(padded_all[c : c + vz_p])

    if tile_z is not None:
        if s % tile_z != 0:
            raise ValueError(f"tile_z {tile_z} must divide z-slab {s}")
        if spec.size_multiple > 1 and tile_z % spec.size_multiple != 0:
            raise ValueError(
                f"tile_z {tile_z} must be a multiple of "
                f"{spec.size_multiple} for pooling-phase alignment"
            )

    def fn(variables, slab, lo_pad, hi_pad):
        lo, hi = _edge_halo_exchange(slab, lo_pad, hi_pad, c, c, axis)
        x = jnp.concatenate([lo, slab, hi], axis=0)
        if tile_z is None:
            logits = spec.module.apply(
                variables, x[None, ..., None], train=False
            )
            return jax.nn.sigmoid(logits[0, ..., 0])

        # bounded-memory path: scan over z-subtiles of the slab
        def body(out, t):
            xt = lax.dynamic_slice(
                x, (t * tile_z, 0, 0),
                (tile_z + 2 * c, x.shape[1], x.shape[2]),
            )
            logits = spec.module.apply(
                variables, xt[None, ..., None], train=False
            )
            out = lax.dynamic_update_slice(
                out, jax.nn.sigmoid(logits[0, ..., 0]), (t * tile_z, 0, 0)
            )
            return out, None

        out0 = jnp.zeros((s, vy, vx), jnp.float32)
        out, _ = lax.scan(body, out0, jnp.arange(s // tile_z))
        return out

    out = jax.jit(shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(axis, None, None), P(), P()),
        out_specs=P(axis, None, None),
        check_vma=False,
    ))(variables, work, zpad_lo, zpad_hi)
    return out[:vz]


def sharded_nms(
    prob,
    mesh: Mesh,
    axis: str = "space",
    window=3,
    threshold: float = 0.5,
    max_per_shard: int = 1024,
) -> Tbars:
    """NMS on a z-sharded probability map with ICI halo exchange.

    Per-shard candidates are extracted with *global* z coordinates; the
    cross-shard merge is exact because each shard's max-filter sees the
    true neighbor planes via the halo — a voxel at a shard seam is a
    candidate iff it would be in a monolithic NMS.
    """
    wz, wy, wx = to3d(window)
    hl, hh = wz // 2, wz - 1 - wz // 2
    n = mesh.shape[axis]
    prob = jnp.asarray(prob, dtype=jnp.float32)
    vz, vy, vx = prob.shape
    if vz % n != 0:
        prob = jnp.pad(
            prob, ((0, round_up(vz, n) - vz), (0, 0), (0, 0)),
            constant_values=-jnp.inf,
        )
    s = prob.shape[0] // n
    max_per_shard = min(max_per_shard, s * vy * vx)  # top_k k <= slab size
    neg = jnp.full((max(hl, hh), vy, vx), -jnp.inf, dtype=jnp.float32)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None, None),),
        out_specs=(P(axis, None), P(axis), P(axis)),
        check_vma=False,
    )
    def fn(slab):
        i = lax.axis_index(axis)
        lo, hi = _edge_halo_exchange(slab, neg[:hl], neg[:hh], hl, hh, axis)
        ext = jnp.concatenate([lo, slab, hi], axis=0)
        # separable max filter: 1-D valid pass over z (halo provides the
        # padding), then padded 1-D passes over y and x
        mf = lax.reduce_window(
            ext, -jnp.inf, lax.max, (wz, 1, 1), (1, 1, 1),
            [(0, 0), (0, 0), (0, 0)],
        )
        mf = lax.reduce_window(
            mf, -jnp.inf, lax.max, (1, wy, 1), (1, 1, 1),
            [(0, 0), (wy // 2, wy - 1 - wy // 2), (0, 0)],
        )
        mf = lax.reduce_window(
            mf, -jnp.inf, lax.max, (1, 1, wx), (1, 1, 1),
            [(0, 0), (0, 0), (wx // 2, wx - 1 - wx // 2)],
        )
        mask = (slab == mf) & (slab >= threshold)
        flat = jnp.where(mask.reshape(-1), slab.reshape(-1), -jnp.inf)
        conf, idx = lax.top_k(flat, max_per_shard)
        valid = conf > -jnp.inf
        z = idx // (vy * vx) + i * s  # global z
        rem = idx % (vy * vx)
        locs = jnp.stack([z, rem // vx, rem % vx], axis=1).astype(jnp.int32)
        return locs, conf, valid

    locs, conf, valid = jax.jit(fn)(prob)
    locs, conf, valid = (np.asarray(locs), np.asarray(conf), np.asarray(valid))
    if max_per_shard < s * vy * vx and valid.reshape(n, -1).all(axis=1).any():
        # a shard saturated its top-k: grow and retry so no candidate is
        # silently dropped (same self-healing as ops.nms.nms)
        return sharded_nms(
            prob[:vz], mesh, axis, window, threshold, max_per_shard * 4
        )
    keep = valid & (locs[:, 0] < vz)
    return sort_detections(locs[keep].astype(np.float64), conf[keep])


def sharded_components(
    prob,
    mesh: Mesh,
    axis: str = "space",
    threshold: float = 0.5,
    max_components: int = 1024,
) -> Tbars:
    """Connected components on a z-sharded probability map with an exact
    cross-shard seam merge.

    Each shard labels its slab on device (flypylib_tpu.ops.components
    core) and exports, besides its compacted component stats, the
    converged label ids of its two boundary z-planes.  The host then
    unions components whose boundary voxels are 6-adjacent across a seam
    (same (y, x), consecutive z) — a tiny union-find over <= n*K
    components — and merges counts/coordinate-sums/max-conf, so centroids
    and confidences equal a monolithic run's exactly.
    """
    from flypylib_tpu.ops.components import cc_label_and_extract

    n = mesh.shape[axis]
    prob = jnp.asarray(prob, dtype=jnp.float32)
    vz, vy, vx = prob.shape
    if vz % n != 0:
        prob = jnp.pad(
            prob, ((0, round_up(vz, n) - vz), (0, 0), (0, 0)),
            constant_values=-jnp.inf,
        )
    s = prob.shape[0] // n
    K = max_components

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None, None),),
        out_specs=(P(axis), P(axis, None), P(axis), P(axis), P(axis), P(axis),
                   P(axis, None), P(axis, None)),
        check_vma=False,
    )
    def fn(slab):
        uniq, sums, count, conf, valid, over, lab = cc_label_and_extract(
            slab, threshold, K
        )
        return (
            uniq, sums, count, conf, valid, over[None],
            lab[0], lab[s - 1],
        )

    uniq, sums, count, conf, valid, over, tops, bots = jax.jit(fn)(prob)
    if bool(np.asarray(over).any()):
        return sharded_components(
            np.asarray(prob), mesh, axis, threshold, max_components * 4
        )

    uniq = np.asarray(uniq).reshape(n, K)
    sums = np.array(sums).reshape(n, K, 3)  # writable copy
    count = np.asarray(count).reshape(n, K)
    conf = np.asarray(conf).reshape(n, K)
    valid = np.asarray(valid).reshape(n, K)
    tops = np.asarray(tops).reshape(n, vy, vx)
    bots = np.asarray(bots).reshape(n, vy, vx)
    slab_sentinel = s * vy * vx

    # globalize z sums (local z -> local z + shard offset)
    sums[..., 0] += (np.arange(n)[:, None] * s) * count

    # union-find over (shard, slot) nodes
    parent = np.arange(n * K)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    for i in range(n - 1):
        b, t = bots[i], tops[i + 1]
        pair = (b < slab_sentinel) & (t < slab_sentinel)
        if not pair.any():
            continue
        rb = b[pair]
        rt = t[pair]
        kb = np.searchsorted(uniq[i], rb)
        kt = np.searchsorted(uniq[i + 1], rt)
        for a, c in set(zip(kb.tolist(), kt.tolist())):
            union(i * K + a, (i + 1) * K + c)

    flat_valid = valid.reshape(-1)
    flat_count = count.reshape(-1)
    flat_sums = sums.reshape(-1, 3)
    flat_conf = conf.reshape(-1)
    roots = {}
    for node in np.nonzero(flat_valid)[0]:
        r = find(node)
        if r not in roots:
            roots[r] = [0.0, np.zeros(3), -np.inf]
        roots[r][0] += flat_count[node]
        roots[r][1] = roots[r][1] + flat_sums[node]
        roots[r][2] = max(roots[r][2], flat_conf[node])

    if not roots:
        return Tbars(locs=np.zeros((0, 3)), conf=np.zeros((0,)))
    locs = np.stack([v[1] / v[0] for v in roots.values()])
    confs = np.asarray([v[2] for v in roots.values()])
    keep = locs[:, 0] < vz  # drop anything from the -inf z padding
    return sort_detections(locs[keep], confs[keep])
