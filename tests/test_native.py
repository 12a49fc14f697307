"""Native C++ runtime: crc32c vectors, zstd batch round-trip, downsample and
color-decode parity.  Skipped when g++/zstd are unavailable."""

import numpy as np
import pytest

nl = pytest.importorskip("interactive_unet_tpu.native.nativelib")

if not nl.available():  # pragma: no cover
    pytest.skip("native library not built", allow_module_level=True)


def test_crc32c_vectors():
    assert nl.crc32c(b"123456789") == 0xE3069283
    assert nl.crc32c(b"\x00" * 32) == 0x8A9136AA
    # matches the pure-python implementation
    from interactive_unet_tpu.storage.zarr3 import _make_crc32c_table

    table = _make_crc32c_table()

    def py_crc(data):
        crc = 0xFFFFFFFF
        for b in data:
            crc = (crc >> 8) ^ int(table[(crc ^ b) & 0xFF])
        return crc ^ 0xFFFFFFFF

    data = bytes(range(256)) * 3
    assert nl.crc32c(data) == py_crc(data)


def test_zstd_batch_roundtrip(rng):
    chunks = [rng.integers(0, 40, 2048).astype(np.uint8).tobytes()
              for _ in range(16)]
    comp = nl.zstd_compress_batch(chunks, level=1)
    assert all(len(c) < 2048 for c in comp)  # compressible data
    back = nl.zstd_decompress_batch(comp, 2048)
    for i in range(16):
        assert back[i].tobytes() == chunks[i]


def test_downsample_matches_scipy(rng):
    from scipy import ndimage

    for shape in [(32, 32, 32), (33, 47, 21), (16, 8, 64)]:
        v = rng.integers(0, 255, shape).astype(np.uint8)
        exp = ndimage.zoom(v, 0.5, order=0)
        got = nl.downsample0_u8(v, exp.shape)
        np.testing.assert_array_equal(exp, got)


def test_color_decode_matches_numpy(rng):
    from interactive_unet_tpu.ops import colors as C

    ids = rng.integers(0, 5, (48, 48))
    mask = C.COLORS[ids]
    uc = C.get_unique_colors(mask)
    onehot, weight = nl.colored_to_categorical(mask, uc)
    # numpy reference computation
    keys = (mask[..., 0].astype(np.uint32) << 16) | \
           (mask[..., 1].astype(np.uint32) << 8) | mask[..., 2]
    ck = (uc[:, 0].astype(np.uint32) << 16) | \
         (uc[:, 1].astype(np.uint32) << 8) | uc[:, 2]
    exp = (keys[..., None] == ck).astype(np.uint8) * 255
    np.testing.assert_array_equal(onehot, exp)
    np.testing.assert_array_equal(weight, 255 - exp[..., 0])


def test_sharded_store_native_path(tmp_path, rng):
    """Round-trip through the store with the native codec active."""
    from interactive_unet_tpu.storage import zarr3

    a = zarr3.Array.create(tmp_path / "a", shape=(64, 64, 64),
                           chunks=(16, 16, 16), shards=(32, 32, 32),
                           dtype=np.uint8)
    data = rng.integers(0, 255, (64, 64, 64)).astype(np.uint8)
    a[:] = data
    b = zarr3.Array.open(tmp_path / "a")
    np.testing.assert_array_equal(b[:], data)
