"""Adversarial evidence for the foreign-VDB reader (VERDICT r3 item 5).

``pip install pyopenvdb`` / ``pip download openvdb`` both fail in this
image (zero egress: pypi.org does not resolve — recorded 2026-08-19), so a
real OpenVDB-written file cannot be produced here. These tests are the
next-strongest thing:

1. property/fuzz round-trips: randomized leaf masks x metadata codes x
   compressors x value types x leaf counts through the independent foreign
   encoder (tests/foreign_vdb.py), asserting exact inactive-value semantics
   against a reference decode computed directly from the spec;
2. corruption fuzz: truncated / bit-flipped archives and blosc containers
   must raise (never silently mis-decode);
3. byte-level goldens of the blosc container against c-blosc-1 spec
   constants (header offsets, codec bits, split-stream layout), including
   a HAND-ASSEMBLED container our encoder never touched;
4. the acceptance checklist for the first real Houdini file lives in
   docs/vdb_acceptance.md.

Reference contract: `/root/reference/src/Utils/Utils.hpp:366-410` (loadGrid
reads arbitrary Houdini VDB primitives).
"""

import struct

import numpy as np
import pytest

from hnanosolver_tpu.io.bloscz import (
    blosc_compress,
    blosc_decompress,
    lz4_compress,
    lz4_decompress,
)
from hnanosolver_tpu.io.vdb import read_vdb
from tests.foreign_vdb import ForeignGrid, write_foreign_vdb

COMPRESSORS = ["none", "zip", "blosc", "mask", "zip+mask", "blosc+mask"]


# ---------------------------------------------------------------------------
# 1. randomized round-trips
# ---------------------------------------------------------------------------


def _random_grid(rng, name, code, value_type="float", half=False):
    n = int(rng.integers(1, 5))
    origins = rng.integers(-4, 4, (n, 3)) * 8
    nval = 3 if value_type.startswith("vec3") else 1
    vals = rng.standard_normal((n, 512, nval)).astype(np.float64)
    if nval == 1:
        vals = vals[..., 0]
    masks = rng.random((n, 512)) < rng.uniform(0.2, 0.95)
    # at least one active voxel per leaf (OpenVDB never writes empty leaves)
    masks[np.arange(n), rng.integers(0, 512, n)] = True
    background = float(rng.uniform(-2, 2))
    sel = {}
    inact = {}
    if code in (3, 4, 5):
        for i in range(n):
            sel[i] = rng.random(512) < 0.5
    if code in (2, 4, 5):
        for i in range(n):
            # inactive values are full grid values: nval components each
            inact[i] = (rng.uniform(-1, 1, nval), rng.uniform(-1, 1, nval))
    return ForeignGrid(
        name, origins,
        vals if nval == 1 else vals,
        leaf_masks=masks, leaf_codes=[code] * n, background=background,
        value_type=value_type, half=half, voxel_size=0.25,
        sel_masks=sel, inactive_vals=inact,
    )


def _expected_values(g: ForeignGrid):
    """Inactive-value semantics computed directly from the OpenVDB
    io/Compression.h readCompressedValues contract (independent of the
    reader's code): inactive0 = bg (code 0) / -bg (others) / stored value
    (codes 2/4/5); inactive1 = bg / stored second value (code 5); codes
    3/4/5 pick inactive0/inactive1 by the selection mask; code 6 stores
    all 512 values verbatim."""
    n = len(g.origins)
    vals = np.asarray(g.values, np.float64)
    if vals.ndim == 2:
        vals = vals[..., None]
    out = vals.copy()
    bg = g.background
    for i in range(n):
        m = g.leaf_masks[i]
        code = g.leaf_codes[i]
        if code == 6:
            continue  # NO_MASK_AND_ALL_VALS: stored values kept everywhere
        inactive = ~m
        iv = g.inactive_vals.get(i, ())
        inactive0 = bg if code == 0 else -bg
        inactive1 = bg
        if code in (2, 4, 5):
            inactive0 = iv[0]
            if code == 5:
                inactive1 = iv[1]
        if code in (3, 4, 5):
            sel = g.sel_masks[i]
            out[i][inactive & sel] = inactive1
            out[i][inactive & ~sel] = inactive0
        else:
            out[i][inactive] = inactive0
    if g.half:
        out = out.astype(np.float16).astype(np.float64)
    return out[..., 0] if np.asarray(g.values).ndim == 2 else out


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_roundtrip(tmp_path, seed):
    """Random (mask, code, compressor, type, half) combinations decode to
    the spec-derived expectation exactly."""
    rng = np.random.default_rng(seed)
    comp = COMPRESSORS[seed % len(COMPRESSORS)]
    grids = []
    for gi in range(3):
        # metadata codes 0-5 exist only under COMPRESS_ACTIVE_MASK: real
        # OpenVDB's writeCompressedValues forces NO_MASK_AND_ALL_VALS (6)
        # when mask compression is off
        code = int(rng.integers(0, 7)) if "mask" in comp else 6
        value_type = ["float", "vec3s", "double"][int(rng.integers(0, 3))]
        half = bool(rng.integers(0, 2)) and value_type == "float"
        grids.append(_random_grid(rng, f"g{gi}", code, value_type, half))
    p = str(tmp_path / f"fuzz{seed}.vdb")
    write_foreign_vdb(p, grids, compress=comp)
    got = {g["name"]: g for g in read_vdb(p)}
    for g in grids:
        r = got[g.name]
        exp = _expected_values(g)
        vals = r["values"]
        if vals.ndim == 3:  # [3,N,512] -> [N,512,3]
            vals = np.moveaxis(vals, 0, -1)
        order = np.lexsort(g.origins.T[::-1])
        rorder = np.lexsort(r["origins"].T[::-1])
        np.testing.assert_allclose(
            vals[rorder], exp[order].astype(np.float32), rtol=0, atol=1e-7,
            err_msg=f"{g.name} code={g.leaf_codes[0]} comp={comp}")
        np.testing.assert_array_equal(
            np.asarray(r["leaf_masks"], bool)[rorder], g.leaf_masks[order])


@pytest.mark.parametrize("comp", COMPRESSORS)
def test_fuzz_many_leaves_one_compressor(tmp_path, comp):
    """Bigger leaf counts exercise multi-block blosc paths and zip."""
    rng = np.random.default_rng(hash(comp) % 2**31)
    n = 40
    origins = np.stack(np.meshgrid(*([np.arange(4)] * 2), np.arange(3),
                                   indexing="ij"), -1).reshape(-1, 3)[:n] * 8
    vals = np.round(rng.standard_normal((n, 512)), 3)
    masks = rng.random((n, 512)) < 0.7
    masks[:, 0] = True
    g = ForeignGrid("d", origins, vals, leaf_masks=masks,
                    leaf_codes=[6] * n, voxel_size=0.5)
    p = str(tmp_path / "many.vdb")
    write_foreign_vdb(p, [g], compress=comp)
    r = read_vdb(p)[0]
    order = np.lexsort(origins.T[::-1])
    rorder = np.lexsort(r["origins"].T[::-1])
    np.testing.assert_allclose(r["values"][rorder],
                               vals[order].astype(np.float32), atol=1e-7)


# ---------------------------------------------------------------------------
# 2. corruption: raise, never mis-decode
# ---------------------------------------------------------------------------


def _mk_archive(tmp_path, comp="blosc+mask"):
    rng = np.random.default_rng(0)
    g = _random_grid(rng, "d", 6)
    p = str(tmp_path / "base.vdb")
    write_foreign_vdb(p, [g], compress=comp)
    return p, open(p, "rb").read()


@pytest.mark.parametrize("cut", [0.3, 0.6, 0.9, 0.99])
def test_truncated_archive_never_silently_decodes(tmp_path, cut):
    """The reader's contract for damage: raise, OR (when grid offsets allow
    skipping) return with every damaged grid in ``skipped`` — never a
    silently wrong decode."""
    p, raw = _mk_archive(tmp_path)
    bad = str(tmp_path / "trunc.vdb")
    with open(bad, "wb") as f:
        f.write(raw[: int(len(raw) * cut)])
    skipped = []
    try:
        grids = read_vdb(bad, skipped)
    except (ValueError, struct.error, EOFError, IndexError):
        return
    assert skipped, "truncated archive decoded with no error and no skips"
    assert not grids


def test_flipped_magic_raises(tmp_path):
    p, raw = _mk_archive(tmp_path)
    bad = str(tmp_path / "magic.vdb")
    with open(bad, "wb") as f:
        f.write(b"\x00" * 8 + raw[8:])
    with pytest.raises(ValueError):
        read_vdb(bad)


def test_blosc_truncation_raises():
    data = np.arange(512, dtype=np.float32).tobytes()
    c = blosc_compress(data)
    for cut in (4, 15, len(c) // 2, len(c) - 1):
        with pytest.raises((ValueError, struct.error, IndexError)):
            blosc_decompress(c[:cut])


def test_blosc_fuzz_roundtrip():
    rng = np.random.default_rng(7)
    for _ in range(40):
        n = int(rng.integers(1, 5000))
        typesize = int(rng.choice([1, 2, 4, 8]))
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        if rng.random() < 0.5:  # compressible
            data = (data[: max(1, n // 16)] * 16)[:n]
        blocksize = int(rng.choice([0, 256, 1024, 32768]))
        shuffle = bool(rng.integers(0, 2))
        c = blosc_compress(data, typesize=typesize, blocksize=blocksize,
                           shuffle=shuffle)
        assert blosc_decompress(c) == data, (n, typesize, blocksize, shuffle)


def test_lz4_fuzz_roundtrip():
    rng = np.random.default_rng(11)
    for _ in range(60):
        n = int(rng.integers(0, 4000))
        data = rng.integers(0, 4, n, dtype=np.uint8).tobytes()
        c = lz4_compress(data)
        assert lz4_decompress(c, n) == data


# ---------------------------------------------------------------------------
# 3. byte-level goldens against c-blosc-1 spec constants
# ---------------------------------------------------------------------------


def test_blosc_header_golden():
    """Header fields at the offsets the c-blosc-1 format documents:
    [0]=version(2) [1]=versionlz [2]=flags [3]=typesize
    [4:8]=nbytes [8:12]=blocksize [12:16]=cbytes, all little-endian;
    LZ4 codec id 1 lives in flag bits 5-7 (0x20); byte-shuffle is bit 0."""
    data = (np.arange(256, dtype=np.float32) * 0).tobytes()  # compressible
    c = blosc_compress(data, typesize=4)
    assert c[0] == 2  # BLOSC_VERSION_FORMAT
    flags = c[2]
    assert flags >> 5 == 1  # BLOSC_LZ4
    assert flags & 0x1  # shuffle bit for typesize 4
    assert not flags & 0x4  # never bit-shuffle
    assert c[3] == 4
    nbytes, blocksize, cbytes = struct.unpack_from("<iii", c, 4)
    assert nbytes == len(data)
    assert cbytes == len(c)
    assert 0 < blocksize <= 32 * 1024
    # block-start offsets follow the 16-byte header, int32-LE each
    nblocks = (nbytes + blocksize - 1) // blocksize
    bstarts = struct.unpack_from(f"<{nblocks}i", c, 16)
    assert bstarts[0] == 16 + 4 * nblocks


def test_blosc_memcpy_mode_golden():
    """Incompressible data must use memcpy mode: flag bit 1, payload verbatim
    after the 16-byte header, cbytes == nbytes + 16."""
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 1024, dtype=np.uint8).tobytes()
    c = blosc_compress(data, typesize=1)
    assert c[2] & 0x2  # BLOSC_MEMCPYED
    nbytes, _, cbytes = struct.unpack_from("<iii", c, 4)
    assert nbytes == len(data) and cbytes == len(data) + 16
    assert c[16:] == data


def test_blosc_hand_assembled_container_decodes():
    """A container assembled BY HAND from the spec (never touched by our
    encoder): one block, 4 split streams (typesize 4, shuffled), each
    stored raw (negative-compression escape: stream length == raw length)."""
    payload = np.arange(64, dtype=np.float32).tobytes()  # 256 B
    # byte-shuffle 4-way: stream s = every 4th byte starting at s
    a = np.frombuffer(payload, np.uint8).reshape(64, 4)
    streams = [a[:, s].tobytes() for s in range(4)]
    body = b"".join(struct.pack("<i", len(s)) + s for s in streams)
    nblocks = 1
    header = struct.pack(
        "<BBBBiii", 2, 1, (1 << 5) | 0x1, 4, len(payload), len(payload),
        16 + 4 * nblocks + len(body))
    bstarts = struct.pack("<i", 16 + 4 * nblocks)
    assert blosc_decompress(header + bstarts + body) == payload


def test_blosc_dont_split_flag_honored():
    """Flag bit 4 (DONT_SPLIT, c-blosc >= 1.9) selects the single-stream
    layout: the same block body decodes differently under it, so a spec
    misreading here would corrupt values, not shift bytes."""
    payload = bytes(range(16)) * 16  # 256 B, typesize 4
    a = np.frombuffer(payload, np.uint8).reshape(64, 4)
    shuffled = b"".join(a[:, s].tobytes() for s in range(4))
    one = struct.pack("<i", len(shuffled)) + shuffled  # single raw stream
    header = struct.pack(
        "<BBBBiii", 2, 1, (1 << 5) | 0x1 | 0x10, 4, len(payload),
        len(payload), 16 + 4 + len(one))
    out = blosc_decompress(header + struct.pack("<i", 20) + one)
    assert out == payload
