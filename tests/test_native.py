"""Native decoder tests: build, decode parity with Python zlib path,
corrupt-blob handling, and batch consistency."""

import struct
import zlib

import numpy as np
import pytest

from dquartic_tpu.native import decode_batch, decode_one, native_available
from dquartic_tpu.native.decode import _py_decode_one


def _blob(values, compress=True):
    raw = struct.pack(f"<{len(values)}d", *values)
    return zlib.compress(raw) if compress else raw


def test_native_builds():
    # The environment ships g++ + zlib; the library must build.
    assert native_available()


def test_decode_one_matches_python():
    vals = np.random.default_rng(0).normal(size=1000)
    blob = _blob(vals)
    out = decode_one(blob, 1)
    np.testing.assert_array_equal(out, vals)
    np.testing.assert_array_equal(out, _py_decode_one(blob, 1))


def test_decode_uncompressed():
    vals = np.arange(10, dtype=np.float64)
    blob = _blob(vals, compress=False)
    out = decode_one(blob, 0)
    np.testing.assert_array_equal(out, vals)


def test_decode_batch_many_sizes():
    rng = np.random.default_rng(1)
    arrays = [rng.normal(size=n) for n in (1, 7, 128, 4096, 33)]
    blobs = [_blob(a) for a in arrays]
    outs = decode_batch(blobs, [1] * len(blobs))
    assert len(outs) == len(arrays)
    for out, ref in zip(outs, arrays):
        np.testing.assert_array_equal(out, ref)


def test_decode_batch_mixed_compression():
    a = np.arange(5, dtype=np.float64)
    b = np.arange(8, dtype=np.float64) * 2
    outs = decode_batch([_blob(a), _blob(b, compress=False)], [1, 0])
    np.testing.assert_array_equal(outs[0], a)
    np.testing.assert_array_equal(outs[1], b)


def test_corrupt_blob_degrades_gracefully():
    good = np.arange(16, dtype=np.float64)
    outs = decode_batch([_blob(good), b"not-zlib-data"], [1, 1])
    np.testing.assert_array_equal(outs[0], good)
    assert outs[1] is None


def test_empty_batch():
    assert decode_batch([], []) == []
