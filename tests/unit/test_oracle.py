"""Oracle pipeline unit tests (SURVEY.md §4.2/§4.3).

These pin down the executable spec: k-mer extraction vs brute force, hit
finding vs brute force, extension semantics on crafted cases, and end-to-end
planted-repeat recovery.
"""

import numpy as np

from repkiller_tpu.config import Config
from repkiller_tpu.io import codec, fasta
from repkiller_tpu.oracle import pipeline as orc
from repkiller_tpu.utils import synth


def brute_kmers(codes, k):
    out = []
    for p in range(len(codes) - k + 1):
        w = codes[p : p + k]
        if (w >= 4).any():
            continue
        v = 0
        for b in w:
            v = (v << 2) | int(b)
        out.append((v, p))
    return out


def test_extract_kmers_vs_brute():
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 5, size=300, dtype=np.uint8)
    for k in (1, 4, 12, 16):
        km, pos = orc.extract_kmers(codes, k)
        expect = brute_kmers(codes, k)
        assert [(int(a), int(b)) for a, b in zip(km, pos)] == expect


def test_kmer_k16_no_overflow():
    codes = np.full(16, 3, dtype=np.uint8)  # TTTT... => all-ones 32-bit kmer
    km, pos = orc.extract_kmers(codes, 16)
    assert km[0] == np.uint32(0xFFFFFFFF) and pos[0] == 0


def test_find_hits_vs_brute():
    rng = np.random.default_rng(7)
    cx = rng.integers(0, 4, size=200, dtype=np.uint8)
    cy = rng.integers(0, 4, size=150, dtype=np.uint8)
    cy[20:40] = cx[50:70]  # shared block
    cfg = Config(k=8, max_occ=1000)
    px, py = orc.find_hits(orc.build_index(cx, 8), orc.build_index(cy, 8), cfg)
    got = set(zip(px.tolist(), py.tolist()))
    bx, by = brute_kmers(cx, 8), brute_kmers(cy, 8)
    expect = {(p, q) for v, p in bx for w, q in by if v == w}
    assert got == expect


def test_self_hits_canonical_half():
    g = synth.plant(2000, [(100, 2, 0.0, 0)], seed=5)
    cfg = Config(k=12, max_occ=1000)
    idx = orc.build_index(g.codes, 12)
    px, py = orc.find_hits(idx, idx, cfg, self_mode="f")
    assert (px < py).all()


def test_max_occ_cap():
    codes = np.zeros(100, dtype=np.uint8)  # poly-A: every kmer identical
    cfg = Config(k=8, max_occ=10)
    idx = orc.build_index(codes, 8)
    px, py = orc.find_hits(idx, idx, cfg, self_mode="f")
    assert px.shape[0] == 0  # 93 occurrences > cap 10 => skipped


def test_filter_hits_buckets():
    cfg = Config(min_hit_dist=32)
    px = np.array([0, 10, 33, 64, 0], dtype=np.int32)
    py = np.array([5, 15, 38, 69, 50], dtype=np.int32)  # first 4 on diag -5, last on -50
    fx, fy = orc.filter_hits(px, py, cfg)
    # diag -50 sorts first; diag -5 buckets: 0 (px=0 kept, px=10 dropped), 1 (33), 2 (64)
    assert fx.tolist() == [0, 0, 33, 64]
    assert fy.tolist() == [50, 5, 38, 69]


def test_extension_exact_repeat():
    # two exact copies of a 100bp unit: fragment must span the full copy
    g = synth.plant(4000, [(100, 2, 0.0, 0)], seed=11)
    cfg = Config(k=12, max_occ=64, min_len=40)
    frag = orc.compare(g.codes, None, cfg)
    a, b = sorted(g.repeats[0].positions)
    hit = (
        (frag["xStart"] <= a) & (frag["xEnd"] >= a + 99)
        & (frag["yStart"] <= b) & (frag["yEnd"] >= b + 99)
    )
    assert hit.any(), (frag, g.repeats)
    i = int(np.nonzero(hit)[0][0])
    # exact copies => perfect identity over the copy
    assert frag["idents"][i] >= 100
    assert frag["group"].shape[0] == frag["xStart"].shape[0]


def test_extension_stops_at_divergence():
    # copy with 10% divergence still found, identity below 100%
    g = synth.plant(4000, [(200, 2, 0.10, 0)], seed=13)
    cfg = Config(k=12, max_occ=64, min_len=40, min_identity=0.6)
    frag = orc.compare(g.codes, None, cfg)
    assert frag["xStart"].shape[0] >= 1
    i = int(np.argmax(frag["length"]))
    assert frag["idents"][i] < frag["length"][i]


def test_inverted_repeat_found_on_reverse_strand():
    g = synth.plant(4000, [(150, 2, 0.0, 1)], seed=17)  # one fwd + one inverted copy
    cfg = Config(k=12, max_occ=64, min_len=40, strands="fr")
    frag = orc.compare(g.codes, None, cfg)
    assert (frag["strand"] == 1).any()


def test_merge_fragments_dedup():
    # same diagonal, overlapping: keep best score
    f = {
        "xStart": np.array([10, 20], np.int32), "yStart": np.array([110, 120], np.int32),
        "xEnd": np.array([60, 70], np.int32), "yEnd": np.array([160, 170], np.int32),
        "strand": np.zeros(2, np.int32), "length": np.array([51, 51], np.int32),
        "score": np.array([100, 120], np.int32), "idents": np.array([40, 45], np.int32),
    }
    m = orc.merge_fragments(f)
    assert m["xStart"].tolist() == [20]


def test_families_link_overlapping_copies():
    # three copies of one unit => all pairwise fragments share a family
    g = synth.plant(6000, [(120, 3, 0.0, 0)], seed=23)
    cfg = Config(k=12, max_occ=64, min_len=40)
    frag = orc.compare(g.codes, None, cfg)
    # at least 3 fragments (pairs of 3 copies), all same family
    assert frag["xStart"].shape[0] >= 3
    assert np.unique(frag["group"]).shape[0] == 1


def test_repeat_intervals_cover_copies():
    g = synth.plant(6000, [(120, 3, 0.0, 0)], seed=23)
    cfg = Config(k=12, max_occ=64, min_len=40)
    frag = orc.compare(g.codes, None, cfg)
    iv = orc.repeat_intervals(frag, frag["group"], cfg, self_cmp=True)
    assert 0 in iv
    for p in g.repeats[0].positions:
        covered = ((iv[0][:, 0] <= p) & (iv[0][:, 1] >= p + 119)).any()
        assert covered, (p, iv)


def test_cross_comparison():
    rng = np.random.default_rng(31)
    cx = rng.integers(0, 4, size=3000, dtype=np.uint8)
    cy = rng.integers(0, 4, size=3000, dtype=np.uint8)
    cy[1000:1200] = cx[500:700]
    cfg = Config(k=12, max_occ=64, min_len=40)
    frag = orc.compare(cx, cy, cfg)
    hit = ((frag["xStart"] <= 500) & (frag["xEnd"] >= 699)
           & (frag["yStart"] <= 1000) & (frag["yEnd"] >= 1199))
    assert hit.any()


def test_fasta_multirecord():
    fs = fasta.read_fasta(">a desc\nACGT\nACGT\n>b\nTTTT\n")
    assert fs.names == ["a", "b"]
    assert fs.lengths.tolist() == [8, 4]
    # spacer N between records
    assert fs.codes[8] == codec.NCODE
    assert codec.decode(fs.record(0)) == "ACGTACGT"
    assert codec.decode(fs.record(1)) == "TTTT"
