"""Host-side batch prefetching — the torch `DataLoader(num_workers=4)`
equivalent (`train_diffusion_smpl.py:617-620`) for the jax training loops.

Two pieces compose:

  * :func:`threaded_batches` — materialises upcoming batches on background
    threads (numpy collation overlaps with device compute);
  * :func:`device_prefetch` — keeps ``size`` batches already transferred to
    (and sharded over) the devices so the train step never waits on PCIe.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax


def threaded_batches(make_iterator: Callable[[], Iterable], *,
                     num_workers: int = 2, buffer: int = 4) -> Iterator:
    """Run ``make_iterator()`` on a background thread pool, yielding batches
    in order with up to ``buffer`` prepared ahead.

    One iterator is consumed by ``num_workers`` threads pulling items under a
    lock (order is preserved by sequence tagging).
    """
    src = iter(make_iterator())
    out: "queue.PriorityQueue" = queue.PriorityQueue(maxsize=buffer)
    lock = threading.Lock()
    seq = [0]
    _END = object()

    def worker():
        while True:
            with lock:
                my_seq = seq[0]
                seq[0] += 1
                try:
                    item = next(src)
                except StopIteration:
                    out.put((my_seq, _END))
                    return
                except BaseException as e:  # surface errors, don't deadlock
                    out.put((my_seq, ("__error__", e)))
                    return
            out.put((my_seq, item))

    threads = [threading.Thread(target=worker, daemon=True)
               for _ in range(num_workers)]
    for t in threads:
        t.start()

    expect = 0
    hold = {}
    done = False
    while not done:
        while expect not in hold:
            s, item = out.get()
            hold[s] = item
        item = hold.pop(expect)
        expect += 1
        if item is _END:
            done = True
        elif (isinstance(item, tuple) and len(item) == 2
              and item[0] == "__error__"):
            raise item[1]
        else:
            yield item


def device_prefetch(batches: Iterable, *, size: int = 2,
                    place: Optional[Callable] = None) -> Iterator:
    """Keep ``size`` batches resident on device ahead of consumption.

    ``place`` maps a host batch to device arrays (e.g. the
    ``data_parallel_step.place_batch`` sharder); defaults to
    ``jax.device_put``.
    """
    place = place or (lambda b: jax.tree.map(jax.device_put, b))
    it = iter(batches)
    ahead = []
    try:
        for _ in range(size):
            ahead.append(place(next(it)))
    except StopIteration:
        pass
    for batch in it:
        ahead.append(place(batch))
        yield ahead.pop(0)
    yield from ahead
