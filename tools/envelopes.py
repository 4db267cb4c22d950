"""Shared probe domains (import-safe — no module-level work)."""
from __future__ import annotations

import numpy as np


def plume_envelope_1024(radius_vox, height_vox=1024, cx=512, cz=512):
    """BASELINE config-5 envelope: a flaring plume cone, 1024^3-class."""
    from hnanosolver_tpu.core import coords as C

    r_t = radius_vox // C.LEAF
    h_t = height_vox // C.LEAF
    cxt, czt = cx // C.LEAF, cz // C.LEAF
    tiles = []
    for y in range(h_t):
        rr = r_t * (0.6 + 0.4 * y / max(h_t - 1, 1))
        for x in range(cxt - r_t, cxt + r_t + 1):
            for z in range(czt - r_t, czt + r_t + 1):
                if (x - cxt) ** 2 + (z - czt) ** 2 <= rr * rr:
                    tiles.append((x, y, z))
    return np.array(tiles, np.int32)
