"""Multi-record capabilities (BASELINE config #4 shape: chr2L+chr2R in one
FASTA): record-aware BED output, per-record masked FASTA, and no
fragment bridging across the inter-record spacer."""

import io

import numpy as np

from repkiller_tpu import Config, api
from repkiller_tpu.io import codec, fasta
from repkiller_tpu.utils import synth

# max_extend must exceed the planted 300 bp repeat: when the per-side cap
# binds mid-repeat, coverage gating's anchor fragment is truncated and the
# overlap-run winner can start past the repeat start (see chain/diagonal.py
# "cap-binding caveat") — the cap is a static-shape guard, not a tuning knob
CFG = Config(k=12, strands="f", hit_capacity=1 << 13, max_extend=512,
             min_len=40)


def _two_record_fasta():
    rng = np.random.default_rng(8)
    rep = rng.integers(0, 4, 300, dtype=np.uint8)
    a = rng.integers(0, 4, 2000, dtype=np.uint8)
    b = rng.integers(0, 4, 1500, dtype=np.uint8)
    a[400:700] = rep
    b[800:1100] = rep            # shared repeat across the two records
    return (">chr2L\n" + codec.decode(a) + "\n>chr2R\n" + codec.decode(b)
            + "\n"), a, b


def test_record_local_bed_and_mask():
    text, a, b = _two_record_fasta()
    res = api.compare(text, None, CFG, backend="oracle")
    assert res.n_fragments > 0
    buf = io.StringIO()
    res.write_intervals(buf)
    rows = [l.split("\t") for l in buf.getvalue().strip().splitlines()]
    names = {r[0] for r in rows}
    assert names == {"chr2L", "chr2R"}
    for name, s, e in rows:
        s, e = int(s), int(e)
        L = 2000 if name == "chr2L" else 1500
        assert 0 <= s < e <= L          # record-local, in bounds

    masked = res.masked_fasta()
    assert masked.count(">") == 2
    recs = masked.split(">")[1:]
    assert recs[0].startswith("chr2L") and recs[1].startswith("chr2R")
    # the planted copy regions are masked in both records
    body0 = "".join(recs[0].splitlines()[1:])
    body1 = "".join(recs[1].splitlines()[1:])
    assert set(body0[400:700]) == {"N"}
    assert set(body1[800:1100]) == {"N"}
    assert len(body0) == 2000 and len(body1) == 1500


def test_no_fragment_bridges_spacer():
    # two records that are pure copies of each other: without the wide
    # spacer an extension could run across the boundary
    rng = np.random.default_rng(9)
    a = rng.integers(0, 4, 800, dtype=np.uint8)
    text = ">r1\n" + codec.decode(a) + "\n>r2\n" + codec.decode(a) + "\n"
    ss = fasta.read_fasta(text)
    res = api.compare(ss, None, CFG, backend="oracle")
    offs, lens = np.asarray(ss.offsets), np.asarray(ss.lengths)
    for i in range(res.n_fragments):
        for s, e in ((res.frag["xStart"][i], res.frag["xEnd"][i]),
                     (min(res.frag["yStart"][i], res.frag["yEnd"][i]),
                      max(res.frag["yStart"][i], res.frag["yEnd"][i]))):
            r0 = np.searchsorted(offs, s, side="right") - 1
            r1 = np.searchsorted(offs, e, side="right") - 1
            assert r0 == r1, "fragment bridges the inter-record spacer"


def test_csv_record_ids():
    """Multi-record runs: the CSV's seqX/seqY columns carry each
    fragment's record id and the header maps records to concatenated
    offsets (round-1 verdict weak item 8 — 'which chromosome is a
    fragment on')."""
    text, a, b = _two_record_fasta()
    res = api.compare(text, None, CFG, backend="oracle")
    buf = io.StringIO()
    res.write_csv(buf)
    out = buf.getvalue()
    rec_line = [l for l in out.splitlines() if l.startswith("Records X : ")]
    assert rec_line, out.splitlines()[:8]
    recs = dict()
    for tok in rec_line[0].split(" : ")[1].split():
        name, off, ln = tok.rsplit(":", 2)
        recs[name] = (int(off), int(ln))
    assert set(recs) == {"chr2L", "chr2R"}
    assert recs["chr2L"] == (0, 2000) and recs["chr2R"][1] == 1500
    rows = [l.split(",") for l in out.splitlines() if l.startswith("Frag,")]
    assert rows
    offs = {0: 0, 1: recs["chr2R"][0]}
    lens = {0: 2000, 1: 1500}
    cross = 0
    for r in rows:
        xs, xe = int(r[1]) - 1, int(r[3]) - 1
        ys, ye = int(r[2]) - 1, int(r[4]) - 1
        sx, sy = int(r[12]), int(r[13])
        assert offs[sx] <= xs and xe < offs[sx] + lens[sx], r
        assert offs[sy] <= min(ys, ye) and max(ys, ye) < offs[sy] + lens[sy], r
        cross += sx != sy
    assert cross > 0          # the planted cross-record repeat is reported


def test_record_coords_csv_round_trip():
    """--coords record (round-3 verdict item 9): rows carry record-local
    1-based coordinates, in bounds of their record; the reader restores
    the exact concatenated-space fragment dict via the Records map."""
    from repkiller_tpu.report import csv_writer

    text, a, b = _two_record_fasta()
    res = api.compare(text, None, CFG, backend="oracle")
    assert res.n_fragments > 0

    concat = io.StringIO()
    res.write_csv(concat)
    rec = io.StringIO()
    res.write_csv(rec, coords="record")
    rec_text = rec.getvalue()
    assert "Coords : record\n" in rec_text
    assert "Coords" not in concat.getvalue()

    xs = res.x
    offs = np.asarray(xs.offsets)
    lens = np.asarray(xs.lengths)
    for line in rec_text.splitlines():
        if not line.startswith("Frag,"):
            continue
        p = line.split(",")
        rx, ry = int(p[12]), int(p[13])
        x1, y1, x2, y2 = int(p[1]), int(p[2]), int(p[3]), int(p[4])
        assert 1 <= x1 <= x2 <= lens[rx]
        lo, hi = min(y1, y2), max(y1, y2)
        assert 1 <= lo <= hi <= lens[ry]

    back = csv_writer.read_frags_csv(rec_text)
    want = csv_writer.read_frags_csv(concat.getvalue())
    for k in ("xStart", "yStart", "xEnd", "yEnd", "strand", "length",
              "score", "idents", "group"):
        assert np.array_equal(back[k], want[k]), k


def test_record_coords_multi_x_single_y_round_trip():
    """coords="record" with multi-record X vs SINGLE-record Y (round-4
    advisor, medium): the writer emits the cross convention seqY=1 while
    the Records Y map has one entry; the reader must treat the
    out-of-range record id as offset 0 (single-record sides are never
    shifted), not index out of bounds."""
    from repkiller_tpu.report import csv_writer

    rng = np.random.default_rng(21)
    rep = rng.integers(0, 4, 300, dtype=np.uint8)
    a = rng.integers(0, 4, 1500, dtype=np.uint8)
    b = rng.integers(0, 4, 1200, dtype=np.uint8)
    y = rng.integers(0, 4, 1000, dtype=np.uint8)
    a[200:500] = rep
    b[600:900] = rep
    y[350:650] = rep                       # repeat shared with both X records
    xtext = (">cA\n" + codec.decode(a) + "\n>cB\n" + codec.decode(b) + "\n")
    ytext = ">ySolo\n" + codec.decode(y) + "\n"
    res = api.compare(xtext, ytext, CFG, backend="oracle")
    assert res.n_fragments > 0

    concat = io.StringIO()
    res.write_csv(concat)
    rec = io.StringIO()
    res.write_csv(rec, coords="record")
    rec_text = rec.getvalue()
    assert "Coords : record\n" in rec_text
    assert any(int(l.split(",")[13]) == 1 for l in rec_text.splitlines()
               if l.startswith("Frag,")), "cross convention seqY=1 expected"

    back = csv_writer.read_frags_csv(rec_text)
    want = csv_writer.read_frags_csv(concat.getvalue())
    for k in ("xStart", "yStart", "xEnd", "yEnd", "strand", "length",
              "score", "idents", "group"):
        assert np.array_equal(back[k], want[k]), k


def test_record_coords_single_record_identical_rows():
    """Single-record inputs: record mode only adds the Coords header;
    every Frag row is byte-identical to concat mode."""
    g = synth.plant(3000, [(120, 3, 0.02, 0)], seed=3)
    fa = ">solo\n" + codec.decode(g.codes) + "\n"
    res = api.compare(fa, None, CFG, backend="oracle")
    c, r = io.StringIO(), io.StringIO()
    res.write_csv(c)
    res.write_csv(r, coords="record")
    rows_c = [l for l in c.getvalue().splitlines() if l.startswith("Frag,")]
    rows_r = [l for l in r.getvalue().splitlines() if l.startswith("Frag,")]
    assert rows_c == rows_r and rows_c
