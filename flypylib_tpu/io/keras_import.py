"""Import reference-trained Keras HDF5 weights into zoo models.

Aux subsystem (SURVEY.md section 5, checkpoint row): flypylib saved weights
with Keras ``model.save_weights`` (HDF5).  For bit-comparison against
reference-trained nets [B:5], this maps a Keras Conv3D weight file onto a
ConvStack params pytree.

Layout facts used:
- Keras Conv3D kernels are ``(kd, kh, kw, cin, cout)`` — identical to Flax
  ``nn.Conv`` NDHWC kernels, so no transposition is needed.
- Keras HDF5 weight files nest as ``/<layer>/<layer>/kernel:0`` (legacy
  ``model_weights/<layer>/...`` for full-model saves); Flax ConvStack
  params are ``{"Conv_0": {"kernel", "bias"}, ...}`` in call order.
"""

from __future__ import annotations

import re

import h5py
import numpy as np


def _natural_key(s: str):
    """Sort key splitting digit runs so layer_10 > layer_2."""
    return [
        int(tok) if tok.isdigit() else tok
        for tok in re.split(r"(\d+)", s)
    ]


def _collect_conv_weights(f: h5py.File) -> list[tuple[np.ndarray, np.ndarray]]:
    """(kernel, bias) pairs for every 5-D conv kernel, in file layer order."""
    root = f["model_weights"] if "model_weights" in f else f
    order = root.attrs.get("layer_names")
    if order is not None:
        names = [n.decode() if isinstance(n, bytes) else n for n in order]
    else:
        # natural sort: "layer_10" must come after "layer_2" (h5py key
        # order is alphabetical, which would silently permute layers for
        # nets with >= 10 same-shape convs)
        names = sorted(root.keys(), key=_natural_key)
    out = []
    for name in names:
        grp = root[name]
        # legacy keras nests group name twice
        inner = grp[name] if name in grp else grp
        kernels = [k for k in inner.keys() if k.startswith("kernel")]
        biases = [k for k in inner.keys() if k.startswith("bias")]
        if not kernels:
            continue
        kernel = np.asarray(inner[kernels[0]])
        if kernel.ndim != 5:
            continue
        bias = (
            np.asarray(inner[biases[0]])
            if biases
            else np.zeros(kernel.shape[-1], np.float32)
        )
        out.append((kernel, bias))
    return out


def load_keras_weights(path: str, params: dict) -> dict:
    """Fill a ConvStack-style params pytree from a Keras HDF5 weight file.

    ``params`` is the target pytree (from ``spec.init``); conv layers are
    matched in order and must agree in shape.  Returns a new pytree.
    """
    with h5py.File(path, "r") as f:
        weights = _collect_conv_weights(f)

    conv_names = sorted(
        (k for k in params if k.startswith("Conv")),
        key=lambda s: int(s.split("_")[-1]),
    )
    if len(weights) != len(conv_names):
        raise ValueError(
            f"layer count mismatch: file has {len(weights)} conv layers, "
            f"model has {len(conv_names)}"
        )
    new = dict(params)
    for name, (kernel, bias) in zip(conv_names, weights):
        tgt_k = params[name]["kernel"]
        if tuple(kernel.shape) != tuple(tgt_k.shape):
            raise ValueError(
                f"{name}: kernel shape {kernel.shape} != model "
                f"{tuple(tgt_k.shape)}"
            )
        new[name] = {
            "kernel": kernel.astype(np.asarray(tgt_k).dtype),
            "bias": bias.astype(np.asarray(tgt_k).dtype),
        }
    return new


def save_keras_weights(path: str, params: dict) -> None:
    """Write ConvStack conv params as a Keras-compatible HDF5 weight file
    (round-trip partner of load_keras_weights)."""
    conv_names = sorted(
        (k for k in params if k.startswith("Conv")),
        key=lambda s: int(s.split("_")[-1]),
    )
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array(
            [n.encode() for n in conv_names]
        )
        for name in conv_names:
            grp = f.create_group(name).create_group(name)
            grp.create_dataset(
                "kernel:0", data=np.asarray(params[name]["kernel"])
            )
            grp.create_dataset(
                "bias:0", data=np.asarray(params[name]["bias"])
            )
