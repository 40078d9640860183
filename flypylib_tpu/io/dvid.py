"""Minimal DVID HTTP client.

Parity: flypylib fplsynapses fetches grayscale cutouts from a DVID server
and pushes detected synapses back as DVID annotation elements (SURVEY.md
section 2.2 row 4, section 3.4).  Implemented over ``urllib`` (stdlib) so it
carries no extra dependency; tested against a local mock HTTP server.

Endpoints used (DVID REST API):

- ``GET  /api/node/{uuid}/{instance}/raw/0_1_2/{sx}_{sy}_{sz}/{ox}_{oy}_{oz}``
  -> raw uint8 bytes in x-fastest order for a grayscale cutout.
- ``GET  /api/node/{uuid}/{instance}/elements/{sx}_{sy}_{sz}/{ox}_{oy}_{oz}``
  -> JSON list of annotation elements.
- ``POST /api/node/{uuid}/{instance}/elements`` <- JSON list of elements.
"""

from __future__ import annotations

import json
import urllib.request

import numpy as np

from flypylib_tpu.io.synapses import Tbars, load_from_json, save_to_json


class DVIDClient:
    def __init__(self, server: str, uuid: str, timeout: float = 60.0):
        if not server.startswith(("http://", "https://")):
            server = "http://" + server
        self.server = server.rstrip("/")
        self.uuid = uuid
        self.timeout = timeout

    def _url(self, instance: str, path: str) -> str:
        return f"{self.server}/api/node/{self.uuid}/{instance}/{path}"

    def _get(self, url: str) -> bytes:
        with urllib.request.urlopen(url, timeout=self.timeout) as r:
            return r.read()

    def _post(self, url: str, payload: bytes) -> bytes:
        req = urllib.request.Request(
            url, data=payload, headers={"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return r.read()

    def get_gray3d(self, instance: str, size, offset) -> np.ndarray:
        """Fetch a grayscale cutout as a (z, y, x) uint8 volume.

        ``size`` and ``offset`` are (z, y, x); the URL uses DVID's
        x/y/z order.
        """
        sz, sy, sx = (int(v) for v in size)
        oz, oy, ox = (int(v) for v in offset)
        url = self._url(instance, f"raw/0_1_2/{sx}_{sy}_{sz}/{ox}_{oy}_{oz}")
        raw = self._get(url)
        expected = sx * sy * sz
        if len(raw) != expected:
            raise IOError(
                f"DVID returned {len(raw)} bytes, expected {expected}"
            )
        return np.frombuffer(raw, dtype=np.uint8).reshape(sz, sy, sx)

    def get_annotations(self, instance: str, size, offset) -> Tbars:
        """Fetch annotation elements in a box as T-bars (z, y, x coords)."""
        sz, sy, sx = (int(v) for v in size)
        oz, oy, ox = (int(v) for v in offset)
        url = self._url(instance, f"elements/{sx}_{sy}_{sz}/{ox}_{oy}_{oz}")
        obj = json.loads(self._get(url) or b"[]")
        return load_from_json(obj if obj is not None else [])

    def post_annotations(self, instance: str, tbars: Tbars) -> None:
        """Push detections as DVID PreSyn annotation elements."""
        payload = json.dumps(save_to_json(tbars, style="dvid")).encode()
        self._post(self._url(instance, "elements"), payload)
