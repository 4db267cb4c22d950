"""Failure detection, fault injection, and cooperative cancellation
(SURVEY §5.3). The reference's story is exceptions on invalid input plus a
HoudiniInterrupter that is constructed but never polled during GPU work
(`/root/reference/src/Utils/Utils.hpp:177-213`); these tests pin down the
stronger contracts this framework provides."""

from __future__ import annotations

import numpy as np
import pytest

from hnanosolver_tpu.config import SolverParams
from hnanosolver_tpu.models.plume import PlumeConfig, run_plume
from hnanosolver_tpu.utils.interrupt import Interrupted, Interrupter

SMALL = dict(
    params=SolverParams(iterations=2),
    cfg=PlumeConfig(center=(16.0, 8.0, 16.0), radius=5.0),
)


@pytest.mark.slow  # multi-frame scenario; signal/cancel logic covered fast by the other tests here
def test_interrupter_stops_run_between_frames():
    frames_done = []

    intr = Interrupter(poll=lambda: len(frames_done) >= 2)
    topo, state = run_plume(
        10,
        grow_every=0,
        on_frame=lambda f, t, s: frames_done.append(f),
        interrupter=intr,
        **SMALL,
    )
    # stopped after the poll tripped, long before 10 frames
    assert len(frames_done) == 2
    assert intr.was_interrupted()
    # the returned state is the last COMPLETED frame: finite and usable
    assert np.isfinite(np.asarray(state.velocity)).all()


def test_interrupter_check_raises():
    intr = Interrupter()
    intr.check("setup")  # not interrupted: no-op
    intr.interrupt()
    with pytest.raises(Interrupted, match="pressure"):
        intr.check("pressure")


def test_nan_injection_is_detected():
    from hnanosolver_tpu.core.topology import build_topology_dense
    from hnanosolver_tpu.fields import zeros_state
    from hnanosolver_tpu.utils.debug import assert_finite_state

    topo = build_topology_dense((16, 16, 16))
    state = zeros_state(topo)
    assert_finite_state(state, where="clean")  # passes
    bad = state.with_scalar(
        "density", state.scalars["density"].at[1, 3].set(np.nan)
    )
    with pytest.raises(Exception, match="clean2|non-finite|NaN|finite"):
        assert_finite_state(bad, where="clean2")


def test_truncated_checkpoint_raises_cleanly(tmp_path):
    from hnanosolver_tpu.core.topology import build_topology_dense
    from hnanosolver_tpu.fields import zeros_state
    from hnanosolver_tpu.io.state import load_npz, save_npz

    topo = build_topology_dense((16, 16, 16))
    save_npz(str(tmp_path / "ok.npz"), topo, zeros_state(topo), None, 3)
    raw = (tmp_path / "ok.npz").read_bytes()
    (tmp_path / "bad.npz").write_bytes(raw[: len(raw) // 3])
    with pytest.raises(Exception):  # zipfile/ValueError — never silent garbage
        load_npz(str(tmp_path / "bad.npz"))


def test_bad_nvdb_magic_raises(tmp_path):
    from hnanosolver_tpu.io.nvdb import read_nvdb

    p = tmp_path / "junk.nvdb"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="NanoVDB"):
        read_nvdb(str(p))
