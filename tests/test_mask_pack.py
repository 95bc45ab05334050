"""Device-side mask bit packing (ops/mask_pack.py): exact round-trip for
every class-count bucket, odd sizes, and inside jit."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation3d_tpu.ops.mask_pack import (
    bits_for, pack_mask, unpack_mask)


def test_bits_for_buckets():
    assert bits_for(2) == 1
    assert bits_for(3) == 2
    assert bits_for(4) == 2
    assert bits_for(5) == 4
    assert bits_for(16) == 4
    assert bits_for(17) == 8
    assert bits_for(200) == 8


@pytest.mark.parametrize("num_classes", [2, 3, 4, 9, 16, 40])
@pytest.mark.parametrize("nx", [1, 7, 8, 13, 64])
def test_roundtrip(num_classes, nx):
    rng = np.random.default_rng(num_classes * 100 + nx)
    m = rng.integers(0, num_classes, size=(3, 5, nx)).astype(np.uint8)
    packed = np.asarray(pack_mask(jnp.asarray(m), num_classes))
    got = unpack_mask(packed, nx, num_classes)
    np.testing.assert_array_equal(got, m)
    # packed size is the minimal byte count
    bits = bits_for(num_classes)
    vpb = 8 // bits
    assert packed.shape == (3, 5, -(-nx // vpb))


def test_pack_under_jit():
    m = np.array([[0, 1, 1, 0, 1, 0, 0, 1, 1]], np.uint8)
    packed = jax.jit(lambda x: pack_mask(x, 2))(jnp.asarray(m))
    got = unpack_mask(np.asarray(packed), 9, 2)
    np.testing.assert_array_equal(got, m)


def test_binary_matches_numpy_packbits():
    rng = np.random.default_rng(0)
    m = rng.integers(0, 2, size=(4, 16)).astype(np.uint8)
    packed = np.asarray(pack_mask(jnp.asarray(m), 2))
    np.testing.assert_array_equal(packed, np.packbits(m, axis=-1))
