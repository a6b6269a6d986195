"""Reference `cugraph.comms` surface (reference comms/comms.py).

The reference hand-builds a RAFT/NCCL communicator over Dask workers
because multi-GPU cuGraph must manage its own collective transport. Spark
IS the communicator: the driver↔executor RPC fabric and the shuffle
service are what NCCL subcomms are there. So this module is a thin
session-introspection layer with the reference's call signatures —
`initialize` binds the active SparkSession, the getters report the
session's real parallelism, and `destroy` releases the binding. Nothing
here allocates transport; there is nothing to allocate.
"""

from __future__ import annotations

import uuid

__session = None
__session_id = None
__partition_type = 1
__prows = None
__pcols = None


def initialize(comms=None, p2p: bool = False, prows=None, pcols=None,
               partition_type: int = 1, spark=None):
    """Bind the comms layer to a SparkSession (reference comms.py:70-124).

    ``comms``/``p2p`` are accepted for signature parity; transport is
    Spark's own. ``prows``/``pcols`` record the requested 2-D partition
    grid for :func:`get_2D_partition` (default: near-square over the
    session's default parallelism, reference comms.py:28-33).
    """
    global __session, __session_id, __partition_type, __prows, __pcols
    if spark is None:
        from .session import get_spark

        spark = get_spark()
    __session = spark
    __session_id = uuid.uuid4().hex[:10]
    __partition_type = partition_type
    n = get_n_workers()
    if prows is None and pcols is None:
        pcols = int(n ** 0.5) or 1
        while n % pcols != 0:
            pcols -= 1
        prows = n // pcols
    __prows, __pcols = prows, pcols
    return __session


def is_initialized() -> bool:
    """reference comms.py:127-135."""
    return __session is not None


def get_comms():
    """The bound SparkSession — the Spark analog of the raftComms handle
    (reference comms.py:138-143)."""
    return __session


def get_workers() -> list:
    """Executor slot ids [0, parallelism) (reference comms.py:146-153 —
    Dask worker addresses; local-mode Spark has threads, not addresses)."""
    return list(range(get_n_workers()))


def get_session_id():
    """reference comms.py:156-163."""
    return __session_id


def get_2D_partition():
    """(prows, pcols, partition_type) — reference comms.py:166-173."""
    return __prows, __pcols, __partition_type


def get_default_handle():
    """Reference comms.py:186-195 returns the RAFT handle; the Spark analog
    of 'the thing you hand to kernels' is the session itself."""
    return __session


def get_worker_id(sID=None) -> int:
    """Reference comms.py:203-212: the calling worker's rank. On the Spark
    driver this is always rank 0; executor-side rank is
    `TaskContext.partitionId()`, which only exists inside a task."""
    return 0


def get_n_workers(sID=None) -> int:
    """Total parallel slots (reference comms.py:215-218 — Dask worker
    count; here the session's default parallelism)."""
    if __session is not None:
        return __session.sparkContext.defaultParallelism
    from .session import get_spark

    return get_spark().sparkContext.defaultParallelism


def destroy():
    """Release the binding (reference comms.py:176-183). Does NOT stop the
    SparkSession — comms did not create it."""
    global __session, __session_id, __prows, __pcols
    __session = None
    __session_id = None
    __prows = __pcols = None
