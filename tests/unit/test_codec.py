"""Codec unit tests (SURVEY.md §4.2: pack/unpack round-trip, revcomp involution)."""

import numpy as np
import pytest

from repkiller_tpu.io import codec


def test_encode_basic():
    c = codec.encode("ACGTNacgtRX")
    assert list(c) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 4]


def test_decode_roundtrip():
    s = "ACGTNNACGTACGT"
    assert codec.decode(codec.encode(s)) == s


def test_revcomp_involution():
    rng = np.random.default_rng(0)
    c = rng.integers(0, 5, size=1003, dtype=np.uint8)
    rc = codec.revcomp_codes(c)
    assert np.array_equal(codec.revcomp_codes(rc), c)


def test_revcomp_values():
    assert list(codec.revcomp_codes(codec.encode("ACGTN"))) == [4, 0, 1, 2, 3]  # NACGT


@pytest.mark.parametrize("L", [0, 1, 15, 16, 17, 31, 32, 33, 1000])
def test_pack_unpack_roundtrip(L):
    rng = np.random.default_rng(L)
    c = rng.integers(0, 5, size=L, dtype=np.uint8)
    c = np.where(c == 4, codec.NCODE, c).astype(np.uint8)
    packed, nmask, n = codec.pack_2bit(c)
    assert n == L
    assert packed.shape[0] == (L + 15) // 16
    assert nmask.shape[0] == (L + 31) // 32
    out = codec.unpack_2bit(packed, nmask, L)
    assert np.array_equal(out, c)
