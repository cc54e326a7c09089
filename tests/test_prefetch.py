"""Prefetching loader tests (ordering, completeness, device placement)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from interdiff_tpu.utils.prefetch import device_prefetch, threaded_batches


def test_threaded_batches_preserves_order():
    def gen():
        for i in range(23):
            yield {"i": np.full((2,), i)}

    out = [b["i"][0] for b in threaded_batches(gen, num_workers=3, buffer=4)]
    assert out == list(range(23))


def test_threaded_batches_overlaps_work():
    def gen():
        for i in range(6):
            time.sleep(0.05)
            yield i

    t0 = time.time()
    consumed = []
    for b in threaded_batches(gen, num_workers=2, buffer=4):
        time.sleep(0.05)  # simulate a training step
        consumed.append(b)
    elapsed = time.time() - t0
    assert consumed == list(range(6))
    # serial would be ~0.6s; overlapped should be well under
    assert elapsed < 0.55, elapsed


def test_device_prefetch_places_and_yields_all():
    batches = [{"x": np.full((4,), i, np.float32)} for i in range(7)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 7
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_allclose(np.asarray(b["x"]), i)


def test_threaded_batches_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    got = []
    try:
        for b in threaded_batches(gen, num_workers=2, buffer=2):
            got.append(b)
        raised = False
    except RuntimeError as e:
        raised = str(e) == "boom"
    assert raised and got == [1]
