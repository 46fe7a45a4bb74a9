"""Vectorized clustering vs oracle union-find sweep — exact equality
(SURVEY.md §7 M3) on random fragment tables and planted structures."""

import numpy as np
import pytest

from repkiller_tpu.config import Config
from repkiller_tpu.families.cluster import cluster_families
from repkiller_tpu.oracle import pipeline as orc


def _random_frags(n, seed, L=20000):
    rng = np.random.default_rng(seed)
    ln = rng.integers(40, 400, n).astype(np.int32)
    xs = rng.integers(0, L, n).astype(np.int32)
    ys = rng.integers(0, L, n).astype(np.int32)
    frag = {
        "xStart": xs, "yStart": ys,
        "xEnd": (xs + ln - 1).astype(np.int32),
        "yEnd": (ys + ln - 1).astype(np.int32),
        "strand": rng.integers(0, 2, n).astype(np.int32),
        "length": ln,
        "score": rng.integers(0, 2000, n).astype(np.int32),
        "idents": (ln * 0.9).astype(np.int32),
    }
    return orc.canonical_sort(frag)


@pytest.mark.parametrize("seed,n,self_cmp", [
    (1, 50, True), (2, 200, True), (3, 500, False),
    (4, 1000, True), (5, 0, True), (6, 1, True),
])
def test_matches_oracle(seed, n, self_cmp):
    frag = _random_frags(n, seed)
    for cfg in (Config(), Config(proximity=100, len_ratio=0.0),
                Config(proximity=5, len_ratio=0.9)):
        want = orc.cluster_families(frag, cfg, self_cmp)
        got = cluster_families(frag, cfg, self_cmp)
        assert np.array_equal(got, want), (got, want)


def test_dense_pileup():
    # many overlapping intervals at one locus (quadratic-ish edge count)
    n = 300
    frag = {
        "xStart": np.arange(n, dtype=np.int32),
        "yStart": np.arange(n, dtype=np.int32) + 5,
        "strand": np.zeros(n, np.int32),
        "length": np.full(n, 100, np.int32),
        "score": np.full(n, 400, np.int32),
        "idents": np.full(n, 95, np.int32),
    }
    frag["xEnd"] = frag["xStart"] + 99
    frag["yEnd"] = frag["yStart"] + 99
    frag = orc.canonical_sort(frag)
    cfg = Config()
    assert np.array_equal(cluster_families(frag, cfg, True),
                          orc.cluster_families(frag, cfg, True))


def test_chunked_edges_invariant():
    """Edge streaming (EDGE_CHUNK blocks) is bit-identical for any chunk
    size — min-label propagation reaches the per-component minimum for
    any edge processing order."""
    frag = _random_frags(800, seed=11, L=3000)   # dense: many edges
    cfg = Config(proximity=100, len_ratio=0.3)
    want = orc.cluster_families(frag, cfg, True)
    for chunk in (1, 7, 64, 1 << 20):
        got = cluster_families(frag, cfg, True, edge_chunk=chunk)
        assert np.array_equal(got, want), chunk


@pytest.mark.parametrize("seed,n,self_cmp", [
    (7, 300, True), (8, 800, False), (9, 0, True),
])
def test_device_path_matches_oracle(seed, n, self_cmp):
    """families/device.py propagation (forced via device_min_edges=0) ==
    oracle union-find, including the ratio filter and empty inputs."""
    frag = _random_frags(n, seed)
    for cfg in (Config(), Config(proximity=100, len_ratio=0.0),
                Config(proximity=5, len_ratio=0.9)):
        want = orc.cluster_families(frag, cfg, self_cmp)
        got = cluster_families(frag, cfg, self_cmp, device_min_edges=0)
        assert np.array_equal(got, want)


def test_device_path_dense_pileup_matches_host_stream():
    """Device propagation == streamed host path on a pileup whose edge
    count crosses the block size (chain components + ratio splits)."""
    rng = np.random.default_rng(12)
    n = 600
    xs = np.sort(rng.integers(0, 3000, n)).astype(np.int32)
    ln = np.where(np.arange(n) % 3 == 0, 80, 400).astype(np.int32)
    frag = {
        "xStart": xs, "yStart": xs + 7,
        "xEnd": (xs + ln - 1).astype(np.int32),
        "yEnd": (xs + 6 + ln).astype(np.int32),
        "strand": np.zeros(n, np.int32),
        "length": ln,
        "score": np.full(n, 100, np.int32),
        "idents": np.full(n, 90, np.int32),
    }
    frag = orc.canonical_sort(frag)
    cfg = Config(proximity=50)
    host = cluster_families(frag, cfg, True, device_min_edges=1 << 62)
    dev = cluster_families(frag, cfg, True, device_min_edges=0)
    assert np.array_equal(host, dev)
    assert np.array_equal(dev, orc.cluster_families(frag, cfg, True))
