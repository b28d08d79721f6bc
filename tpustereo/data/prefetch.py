"""Prefetching frame-pair iterators (SURVEY.md §3 #1, §4.4: the odometry
loop streams frames — decode should overlap device compute, never serialise
with it).

`prefetch_pairs` is the generic front end:
- a list of (left_path, right_path) with .pgm/.png extensions rides the
  native threaded loader (native/loader.cc: worker pool + in-order ring,
  libpng/own-PGM decode) when the native library is available;
- anything else (arbitrary extensions, generators of already-decoded
  arrays) uses a Python thread that stays `depth` items ahead — the same
  overlap, host-side decode in the interpreter.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterable, Iterator, Sequence, Tuple

import numpy as np

_NATIVE_EXTS = {".pgm", ".png"}


def _native_ok(pairs) -> bool:
    from tpustereo import native
    if not isinstance(pairs, (list, tuple)) or not pairs:
        return False
    for item in pairs:
        if (not isinstance(item, (list, tuple)) or len(item) != 2
                or not all(isinstance(p, str) for p in item)):
            return False
        if not all(os.path.splitext(p)[1].lower() in _NATIVE_EXTS
                   for p in item):
            return False
    return native.available()


def _thread_prefetch(it: Iterable, depth: int) -> Iterator:
    """Generic lookahead: a daemon thread keeps up to `depth` decoded items
    queued; exceptions propagate to the consumer at the failing position."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def feeder():
        try:
            for item in it:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # noqa: BLE001 — re-raised consumer-side
            q.put(e)

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def prefetch_pairs(pairs, depth: int = 2, workers: int = 2) -> Iterator[
        Tuple[np.ndarray, np.ndarray]]:
    """Iterate (left, right) uint8 frames with decode running ahead of the
    consumer. `pairs`: either a sequence of (left_path, right_path) tuples
    or any iterable yielding decoded (left, right) arrays."""
    if _native_ok(pairs):
        from tpustereo.native import PrefetchPairs
        return iter(PrefetchPairs([p[0] for p in pairs],
                                  [p[1] for p in pairs],
                                  depth=depth, workers=workers))
    seq: Iterable
    if isinstance(pairs, (list, tuple)) and pairs and isinstance(
            pairs[0], (list, tuple)) and isinstance(pairs[0][0], str):
        from tpustereo.data.io import read_image_gray

        def decode_all(ps: Sequence) -> Iterator:
            for lp, rp in ps:
                yield read_image_gray(lp), read_image_gray(rp)

        seq = decode_all(pairs)
    else:
        seq = pairs
    return _thread_prefetch(seq, depth)
