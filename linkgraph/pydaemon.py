"""PySpark worker daemon with the engine's heavy Python imports preloaded.

Every Python UDF worker is forked from this daemon process, so anything
imported here is inherited copy-on-write by ALL workers: the per-worker
cost of importing numpy/pandas plus the engine's vectorized-UDF modules is
paid ONCE per executor instead of once per forked worker — guide §4.5's
"heavyweight init once" applied to the interpreter itself. At local[32]
the stock daemon forks 32 workers that each spend ~0.5-0.6 s importing the
same modules before the first Arrow batch flows; preloading removes that
from the first Python stage of every fresh session (measured on the bench
corpus pipeline: see OPTIMIZATION_r06.md).

``session.get_spark`` points ``spark.python.daemon.module`` here only when
the package is importable from the worker launch environment (cwd or
PYTHONPATH), so daemon startup can never break for callers that import
linkgraph from a private sys.path entry.

Preloads are best-effort by design: a missing optional module must never
take down the daemon — workers would simply import on demand exactly as
they do under the stock ``pyspark.daemon``.

Fork-safety note: only modules whose import starts no background threads
are preloaded (numpy's BLAS pool and pyarrow's memory-pool threads start
lazily on first use, not at import; nothing here touches them).
"""

for _mod in (
    "numpy",
    "pandas",
    "pyarrow",
    "pyspark.sql.pandas.serializers",
    "linkgraph.corpus",
    "linkgraph.extract",
    "linkgraph.generators",
):
    try:  # noqa: SIM105
        __import__(_mod)
    except Exception:  # pragma: no cover - strictly best-effort preloading
        pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
