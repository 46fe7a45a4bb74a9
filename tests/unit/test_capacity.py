"""utils/capacity.py — shared auto-capacity retry (round-3 verdict item 7)."""

import pytest

from repkiller_tpu.config import Config
from repkiller_tpu.utils.capacity import grow_capacity, with_auto_capacity


def test_grow_hit_capacity():
    cfg = Config(hit_capacity=1 << 10)
    grown = grow_capacity(cfg, "hit_capacity=1024 overflow: totals [2000]")
    assert grown is not None
    assert grown[0].hit_capacity == 1 << 11


def test_grow_seed_capacity_keeps_hit_capacity_consistent():
    cfg = Config(hit_capacity=1 << 12, seed_capacity=1 << 12)
    grown = grow_capacity(cfg, "seed_capacity=4096 overflow: counts [5000]")
    assert grown[0].seed_cap == 1 << 13
    assert grown[0].hit_capacity >= grown[0].seed_cap


def test_grow_unrecognised_returns_none():
    cfg = Config()
    assert grow_capacity(cfg, "some unrelated ValueError") is None


def test_with_auto_capacity_retries_until_fit():
    cfg = Config(hit_capacity=1 << 10)
    calls = []

    def fn(c):
        calls.append(c.hit_capacity)
        if c.hit_capacity < 5000:
            raise ValueError(
                f"hit_capacity={c.hit_capacity} overflow: totals [5000]")
        return "ok"

    out, used = with_auto_capacity(fn, cfg, retries=4)
    assert out == "ok"
    assert used.hit_capacity == 1 << 13
    assert calls == [1 << 10, 1 << 11, 1 << 12, 1 << 13]


def test_with_auto_capacity_gives_up_after_retries():
    cfg = Config(hit_capacity=1 << 10)

    def fn(c):
        raise ValueError(f"hit_capacity={c.hit_capacity} overflow: huge")

    with pytest.raises(ValueError, match="overflow"):
        with_auto_capacity(fn, cfg, retries=2)


def test_with_auto_capacity_propagates_other_errors():
    cfg = Config()

    def fn(c):
        raise ValueError("not a capacity problem")

    with pytest.raises(ValueError, match="not a capacity problem"):
        with_auto_capacity(fn, cfg, retries=3)
