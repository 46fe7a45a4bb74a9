"""Native C++ IO library vs numpy reference — bit-identity (SURVEY.md §2.1
"CSV loader"/"Writers", §2.2 "FASTA ingestion"/"2-bit codec")."""

import io

import numpy as np
import pytest

from repkiller_tpu.io import codec, fasta, native
from repkiller_tpu.report import csv_writer

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native IO library unavailable (no g++)")

FASTA_CASES = [
    b">a desc\nACGTacgtNNXX\nGG\n>b\n\nTTTT\n",
    b"ACGT\nTTTT",                      # headerless implicit seq0
    b">only_header_no_seq\n>second\nAC\n",
    b">crlf\r\nACGT\r\nTT\r\n>mac\rGGGG\r",
    b"",
    b"\n\n  \n",
    b">spaces\n  AC GT  \n",            # inner space maps to N, ends stripped
]


def _py_parse(data: bytes):
    """The pure-python reference path (native fast path bypassed)."""
    names = []
    chunks = []
    offsets = []
    lengths = []
    pos = 0
    cur = []

    def flush():
        nonlocal pos
        if not names:
            return
        cod = codec.encode(b"".join(cur))
        if chunks:
            chunks.append(np.array([codec.NCODE], np.uint8))
            pos += 1
        offsets.append(pos)
        lengths.append(len(cod))
        chunks.append(cod)
        pos += len(cod)
        cur.clear()

    for line in data.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith(b">"):
            flush()
            names.append(line[1:].split()[0].decode() if len(line) > 1
                         else f"seq{len(names)}")
        else:
            if not names:
                names.append("seq0")
            cur.append(line)
    flush()
    codes = np.concatenate(chunks) if chunks else np.zeros(0, np.uint8)
    return codes, np.asarray(offsets, np.int64), np.asarray(lengths, np.int64)


@pytest.mark.parametrize("i", range(len(FASTA_CASES)))
def test_fasta_parse_matches_python(i):
    data = FASTA_CASES[i]
    codes, offs, lens = native.parse_fasta(data)
    pcodes, poffs, plens = _py_parse(data)
    assert np.array_equal(codes, pcodes)
    assert np.array_equal(offs, poffs)
    assert np.array_equal(lens, plens)
    # and the public read_fasta (which routes through native) agrees
    ss = fasta.read_fasta(data, spacer=1)
    assert np.array_equal(ss.codes, pcodes)
    # wider spacers: native and python paths still agree on structure
    codes32, offs32, lens32 = native.parse_fasta(data, 32)
    assert np.array_equal(lens32, plens)
    if len(poffs) > 1:
        assert offs32[1] - (poffs[1] - 1) == 32  # 32 Ns replaced the 1


def test_pack_2bit_matches_codec():
    rng = np.random.default_rng(3)
    for n in (0, 1, 15, 16, 17, 31, 32, 1000, 100003):
        codes = rng.integers(0, 5, n, dtype=np.uint8)
        pk, nm, L = native.pack_2bit(codes)
        pk2, nm2, L2 = codec.pack_2bit(codes)
        assert L == L2
        assert np.array_equal(pk, pk2)
        assert np.array_equal(nm, nm2)


def test_revcomp_matches_codec():
    rng = np.random.default_rng(4)
    codes = rng.integers(0, 5, 999, dtype=np.uint8)
    assert np.array_equal(native.revcomp(codes), codec.revcomp_codes(codes))


def test_csv_writer_byte_identical(tmp_path):
    rng = np.random.default_rng(5)
    n = 200
    ln = rng.integers(30, 400, n).astype(np.int32)
    frag = {
        "xStart": rng.integers(0, 10000, n).astype(np.int32),
        "yStart": rng.integers(0, 10000, n).astype(np.int32),
        "strand": rng.integers(0, 2, n).astype(np.int32),
        "length": ln,
        "score": rng.integers(-100, 4000, n).astype(np.int32),
        "idents": (ln * 0.9).astype(np.int32),
        "group": rng.integers(0, 40, n).astype(np.int32),
    }
    frag["xEnd"] = frag["xStart"] + ln - 1
    frag["yEnd"] = frag["yStart"] + ln - 1
    frag["idents"][0] = 0
    frag["length"][0] = 0            # division guard row

    p_native = tmp_path / "native.csv"
    csv_writer.write_frags_csv(frag, str(p_native), x_name="gx", x_len=10000,
                               total_hits=777)
    buf = io.StringIO()
    csv_writer.write_frags_csv(frag, buf, x_name="gx", x_len=10000,
                               total_hits=777)
    assert p_native.read_text() == buf.getvalue()
