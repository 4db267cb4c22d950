"""Fused BFECC tail kernel (ops/pallas_tail.py): bit-exact against the XLA
bounds+correction+clip forms, including the one-hot MXU plane expansion."""

import jax.numpy as jnp
import numpy as np

from hnanosolver_tpu.core.topology import build_topology
from hnanosolver_tpu.ops import advection as adv
from hnanosolver_tpu.ops import shifts as sh
from hnanosolver_tpu.ops.pallas_tail import bfecc_tail_fused


def _sparse_topo():
    tiles = [
        (x, y, z)
        for x in range(3)
        for y in range(3)
        for z in range(3)
        if (x + y + z) % 5 != 4  # holes -> null-tile boundary lanes matter
    ]
    return build_topology(np.array(tiles, np.int32))


def test_tail_kernel_matches_xla_bitwise():
    topo = _sparse_topo()
    T = topo.capacity
    rng = np.random.default_rng(11)
    F = 4

    def field():
        f = rng.normal(size=(F, T, 512)).astype(np.float32)
        f[:, 0] = 0.0  # null tile
        return jnp.asarray(f)

    phi0, pf, pb = field(), field(), field()

    got = bfecc_tail_fused(topo, phi0, pf, pb, interpret=True)

    mins, maxs = sh.face_minmax_multi(topo, phi0)
    lo = jnp.minimum(jnp.minimum(phi0, mins), pf)
    hi = jnp.maximum(jnp.maximum(phi0, maxs), pf)
    want = jnp.clip(pf + 0.5 * (phi0 - pb), lo, hi)

    assert jnp.array_equal(got, want), (
        float(jnp.max(jnp.abs(got - want)))
    )


def test_tail_kernel_matches_limit_entry():
    """_bfecc_limit's lohi path (XLA) == the tail kernel, entry-to-entry."""
    topo = _sparse_topo()
    T = topo.capacity
    rng = np.random.default_rng(5)
    F = 2
    mk = lambda: jnp.asarray(  # noqa: E731
        rng.normal(size=(F, T, 512)).astype(np.float32)
    )
    phi0, pf, pb = mk(), mk(), mk()
    mins, maxs = sh.face_minmax_multi(topo, phi0)
    lohi = (jnp.minimum(phi0, mins), jnp.maximum(phi0, maxs))
    want = adv._bfecc_limit(topo, phi0, pf, pb, lohi)
    got = bfecc_tail_fused(topo, phi0, pf, pb, interpret=True)
    assert jnp.array_equal(got, want)
