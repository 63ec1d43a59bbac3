"""Native C runtime kernels vs their pure-Python counterparts."""

import numpy as np
import pytest

native = pytest.importorskip("actinon_tpu.native")

from actinon_tpu.render import image as aimg
from actinon_tpu.rng import HostLcg


def test_fnv_fold_matches_python():
    data = np.random.default_rng(0).integers(0, 2**32, 1000,
                                             dtype=np.uint64)
    h_native = native.fnv_fold(data)
    h = np.uint64(0xCBF29CE484222325)
    with np.errstate(over="ignore"):
        for v in data:
            h = (h ^ v) * np.uint64(0x100000001B3)
    assert h_native == int(h)


def test_pack_cps_matches_python():
    img = np.random.default_rng(1).uniform(-0.2, 1.4, (13, 17, 3))
    got = native.pack_cps(img)
    b = np.clip((img * 256.0).astype(np.int64), 0, 255).astype(np.uint32)
    b[img <= 0.0] = 0
    want = b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16)
    np.testing.assert_array_equal(got, want)


def test_gen_samples_matches_host_lcg():
    sel = np.array([[3, 4], [10, 2], [0, 0]])
    pos, new_state = native.gen_samples(sel[:, 1], sel[:, 0], 2, 12345)
    lcg = HostLcg(12345)
    want = []
    for y, x in sel:
        for _ in range(2):
            dx = lcg.rnd1()
            dy = lcg.rnd1()
            want.append((x + dx, y + dy))
    np.testing.assert_allclose(pos, want, rtol=1e-15)
    assert new_state == int(lcg.state)


def test_image_hash_uses_native():
    img = np.random.default_rng(2).uniform(0, 1, (8, 8, 3))
    packed = aimg.pack_cps(img)
    h1 = aimg.image_hash(packed)
    # python reference
    h = np.uint64(0xCBF29CE484222325)
    with np.errstate(over="ignore"):
        for v in packed.reshape(-1).astype(np.uint64):
            h = (h ^ v) * np.uint64(0x100000001B3)
    assert h1 == int(h)
