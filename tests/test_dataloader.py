import time

import pytest

from followmyhold_tpu.utils.dataloader import prefetch_map


def test_order_preserved():
    out = list(prefetch_map(lambda x: x * 2, list(range(50)), num_workers=4))
    assert out == [x * 2 for x in range(50)]


def test_overlap_speedup():
    def slow(x):
        time.sleep(0.02)
        return x

    t0 = time.time()
    list(prefetch_map(slow, range(20), num_workers=4))
    parallel = time.time() - t0
    assert parallel < 0.02 * 20 * 0.8  # meaningfully faster than serial


def test_exception_propagates_at_item():
    def f(x):
        if x == 3:
            raise ValueError("boom")
        return x

    it = prefetch_map(f, range(6), num_workers=2)
    assert next(it) == 0
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError):
        next(it)


def test_empty():
    assert list(prefetch_map(lambda x: x, [])) == []
