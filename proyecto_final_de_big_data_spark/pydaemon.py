"""Python-worker daemon module with preloaded scientific stack.

Spark's ``PythonWorkerFactory`` culls idle Python workers after a
HARDCODED one minute (``IDLE_WORKER_TIMEOUT_NS`` in spark-core — not
configurable), so any query mix where Arrow/pandas stages arrive more
than a minute apart re-forks its whole worker pool and every new worker
re-imports numpy/pandas/pyarrow from scratch (~1 s CPU each; 32 workers
forking concurrently on a cold page cache measured 8-40 s of wall time
per affected query on this suite — the dominant suite-wide stall).

The daemon process itself lives for the whole application and workers
are ``fork()``ed from it, so importing the heavy modules HERE — once,
in the daemon — makes every future worker inherit them copy-on-write:
respawn after a cull costs a fork plus socket setup (milliseconds)
instead of the import chain. This is the standard warm-pool posture for
Python-on-Spark executors, scale-independent (a 100 TB cluster pays the
same per-executor import tax), and has zero semantic surface: the
daemon protocol is delegated verbatim to ``pyspark.daemon``.

Enable with ``spark.python.daemon.module=
proyecto_final_de_big_data_spark.pydaemon`` (bench.py and the session
factory set it; the package must be importable by executor workers,
which mapInPandas closures already require).
"""

from __future__ import annotations

# Preload the heavy stack the repo's Arrow-batch operators use. Failures
# are non-fatal: a worker that needs a module the daemon could not load
# simply imports it itself, exactly as without this module.
for _mod in ("numpy", "pandas", "pyarrow", "pyspark.worker", "pyspark.sql.pandas.serializers"):
    try:  # pragma: no cover - import side effect only
        __import__(_mod)
    except Exception:  # noqa: BLE001 - any import failure must not kill the daemon
        pass

if __name__ == "__main__":
    from pyspark.daemon import manager

    manager()
