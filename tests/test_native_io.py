"""Native (C++) IO hot paths vs the numpy reference implementations.

The native library is built on demand with the system compiler; when no
toolchain is available these tests skip and the numpy fallbacks carry the
load (io/native.py)."""

import numpy as np
import pytest

from meteor_demod_tpu.io import native
from meteor_demod_tpu.sim import encode_iq


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


@pytest.mark.parametrize("bps", [8, 16, 32])
def test_native_decode_matches_numpy(bps):
    rng = np.random.default_rng(1)
    x = ((rng.standard_normal(5001) + 1j * rng.standard_normal(5001))
         * (90 if bps == 8 else 6000)).astype(np.complex64)
    raw = encode_iq(x, bps)
    pairs = native.decode_iq_f32(raw, bps)
    got = pairs.view(np.complex64).reshape(len(pairs))

    # numpy reference
    if bps == 8:
        a = np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128
    elif bps == 16:
        a = np.frombuffer(raw, dtype="<i2").astype(np.float32)
    else:
        a = np.frombuffer(raw, dtype="<f4").astype(np.float32)
    want = (a[0::2] + 1j * a[1::2]).astype(np.complex64)
    np.testing.assert_array_equal(got, want)


def test_native_decode_drops_partial_sample():
    raw = bytes(range(10))      # 2.5 16-bit samples
    pairs = native.decode_iq_f32(raw, 16)
    assert len(pairs) == 2


def test_native_quantize_matches_numpy():
    rng = np.random.default_rng(2)
    re = (rng.standard_normal(4096) * 200).astype(np.float32)
    im = (rng.standard_normal(4096) * 200).astype(np.float32)
    got = native.quantize_soft(re, im)
    want = np.empty(2 * len(re), dtype=np.int8)
    want[0::2] = np.trunc(np.clip(re * np.float32(0.5), -127, 127)).astype(np.int8)
    want[1::2] = np.trunc(np.clip(im * np.float32(0.5), -127, 127)).astype(np.int8)
    np.testing.assert_array_equal(got, want)
