"""Roundtrip tests for the narrow-bit-width upload pack (ops/volume_pack.py)
and its integration into the fused preprocess program."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation3d_tpu.ops.volume_pack import pack_volume_np, unpack_volume


def _roundtrip(data):
    packed, meta = pack_volume_np(data)
    out = jax.jit(
        lambda p, lo: unpack_volume(p, scheme=meta["scheme"],
                                    shape=meta["shape"], lo=lo)
    )(jnp.asarray(packed), jnp.asarray(meta["lo"], jnp.float32))
    return np.asarray(out), meta


def test_u12_ct_roundtrip():
    rng = np.random.default_rng(0)
    data = rng.integers(-1024, 3072, size=(13, 17, 19)).astype(np.int16)
    out, meta = _roundtrip(data)
    assert meta["scheme"] == "u12"
    np.testing.assert_array_equal(out, data.astype(np.float32))
    packed, _ = pack_volume_np(data)
    # 3 bytes per 2 voxels (vs 2 bytes/voxel stored): 25% fewer upload bytes
    assert packed.nbytes <= int(np.ceil(data.size / 2)) * 3


def test_u12_odd_voxel_count():
    data = (np.arange(3 * 5 * 7, dtype=np.int16) * 31 - 1000).reshape(3, 5, 7)
    assert data.size % 2 == 1
    out, meta = _roundtrip(data)
    assert meta["scheme"] == "u12"
    np.testing.assert_array_equal(out, data.astype(np.float32))


def test_u8_narrow_range():
    rng = np.random.default_rng(1)
    data = rng.integers(-50, 200, size=(8, 9, 10)).astype(np.int16)
    out, meta = _roundtrip(data)
    assert meta["scheme"] == "u8"
    np.testing.assert_array_equal(out, data.astype(np.float32))
    packed, _ = pack_volume_np(data)
    assert packed.nbytes == data.size  # half the int16 bytes


@pytest.mark.parametrize("data", [
    np.linspace(-3.0, 3.0, 4 * 5 * 6).reshape(4, 5, 6).astype(np.float32),
    (np.arange(4 * 5 * 6, dtype=np.int32) * 100 - 5000).reshape(4, 5, 6),
])
def test_raw_fallback(data):
    out, meta = _roundtrip(data)
    assert meta["scheme"] == "raw"
    np.testing.assert_allclose(out, data.astype(np.float32), rtol=1e-6)


def test_constant_volume():
    data = np.full((6, 6, 6), -1000, np.int16)
    out, meta = _roundtrip(data)
    assert meta["scheme"] == "u8"  # span 0
    np.testing.assert_array_equal(out, data.astype(np.float32))
