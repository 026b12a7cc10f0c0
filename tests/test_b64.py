"""Vectorized base64 codec: round-trip vs the stdlib on every shape."""
import base64

import numpy as np
import pyarrow as pa
import pytest

from pmocr_ray.ops.b64 import (_C_PATH_MEAN_BYTES, b64decode_array,
                               b64encode_array)


def _random_binary(n, max_len, seed=0, with_nulls=True):
    rng = np.random.default_rng(seed)
    vals = []
    for i in range(n):
        if with_nulls and i % 17 == 3:
            vals.append(None)
        else:
            ln = int(rng.integers(0, max_len + 1))
            vals.append(bytes(rng.integers(0, 256, ln, dtype=np.uint8)))
    return vals


@pytest.mark.parametrize("max_len,n", [
    (50, 2000),                       # small elements -> numpy path
    (4 * _C_PATH_MEAN_BYTES, 300),    # large elements -> C path
])
def test_b64_roundtrip_matches_stdlib(max_len, n):
    vals = _random_binary(n, max_len)
    vals[0] = b""  # empty element
    arr = pa.array(vals, pa.binary())
    enc = b64encode_array(arr)
    exp = [base64.b64encode(v).decode("ascii") if v is not None else None
           for v in vals]
    assert enc.to_pylist() == exp
    assert b64decode_array(enc).to_pylist() == vals


def test_b64_chunked_sliced_large_types():
    vals = _random_binary(600, 40, seed=1)
    arr = pa.array(vals, pa.binary())
    exp = [base64.b64encode(v).decode("ascii") if v is not None else None
           for v in vals]
    # chunked input
    ch = pa.chunked_array([arr[:200], arr[200:]])
    assert b64encode_array(ch).to_pylist() == exp
    # sliced input (non-zero array offset)
    assert b64encode_array(arr.slice(100, 300)).to_pylist() == exp[100:400]
    enc = b64encode_array(arr)
    assert b64decode_array(enc.slice(7, 500)).to_pylist() == vals[7:507]
    # large_binary / large_string inputs
    assert b64encode_array(pa.array(vals, pa.large_binary())
                           ).to_pylist() == exp


def test_b64_decode_rejects_unpadded():
    with pytest.raises(ValueError, match="not a multiple of 4"):
        b64decode_array(pa.array(["abc"]))


def test_b64_empty_and_all_null():
    assert b64encode_array(pa.array([], pa.binary())).to_pylist() == []
    assert b64encode_array(pa.array([None, None], pa.binary())
                           ).to_pylist() == [None, None]
    assert b64decode_array(pa.array([], pa.string())).to_pylist() == []
