"""Ephemeral scratch placement + independent-job overlap.

Two cross-cutting performance seams (guide §2.6 / §5-§6 of the
optimization playbook):

- ``scratch_root()``: every lakehouse fixture, persisted index, and
  streaming checkpoint in this engine is *ephemeral* (created, read,
  and deleted within one query). Placing that scratch on the fastest
  node-local volume is standard practice (at cluster scale:
  NVMe / instance-store scratch, never the durable object store).
  Locally we prefer ``/dev/shm`` (tmpfs) over ``/tmp`` when the latter
  is disk-backed; override with ``SPARK_GRAFT_SCRATCH``.

- ``run_parallel(*thunks)``: Spark happily runs several jobs at once
  inside one application; actions are only sequential because driver
  code calls them sequentially. Multi-step lifecycle queries (index
  build audits, multi-file fixture stages) are chains of small jobs
  that each leave most executors idle — submitting the *independent*
  ones from a small thread pool back-fills the idle capacity. Job
  descriptions are thread-local, so each job stays labelled.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from typing import Any

_SHM = "/dev/shm"


# tmpfs competes with process memory: only prefer /dev/shm while it
# has comfortable headroom, otherwise turning disk pressure into
# OOM/ENOSPC on constrained hosts (fixtures here are <~1 GiB each and
# rmtree'd per query, so 4 GiB free is a generous floor).
_SHM_MIN_FREE_BYTES = 4 << 30


def scratch_root() -> str:
    """Directory for ephemeral per-query scratch (fixtures, indexes,
    stream checkpoints). Fastest available: $SPARK_GRAFT_SCRATCH
    (created if missing) > /dev/shm (writable tmpfs with headroom) >
    tempfile.gettempdir()."""
    env = os.environ.get("SPARK_GRAFT_SCRATCH")
    if env:
        os.makedirs(env, exist_ok=True)
        return env
    if os.path.isdir(_SHM) and os.access(_SHM, os.W_OK):
        try:
            st = os.statvfs(_SHM)
            if st.f_bavail * st.f_frsize >= _SHM_MIN_FREE_BYTES:
                return _SHM
        except OSError:
            pass
    return tempfile.gettempdir()


def run_parallel(*thunks: Callable[[], Any]) -> list[Any]:
    """Run independent Spark actions (or plain callables) concurrently
    and return their results in argument order. The pool is sized to
    the thunk count (callers pass 2-4 independent actions — enough to
    fill a stage tail, not enough to thrash the scheduler). Exceptions
    propagate to the caller exactly as in the sequential form."""
    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(fn) for fn in thunks]
        return [f.result() for f in futures]
