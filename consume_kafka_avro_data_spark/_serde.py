"""Executor-shipping helper for UDF-bearing modules.

PySpark serializes a pandas UDF's function by *reference* when it lives
in an importable module — so executors' Python workers must be able to
``import consume_kafka_avro_data_spark`` themselves.  That holds when
the application is launched from the repo root, but not when a host
process (e.g. the verify driver, a notebook, spark-submit from
elsewhere) imports us from an absolute path: the driver resolves the
import via ``sys.path`` manipulation that executor workers never see.

``register_pickle_by_value`` flips cloudpickle to serialize the whole
defining module by value inside the UDF closure, making every UDF
self-contained — no PYTHONPATH/addPyFile coordination, cluster or
local.  Each module that defines UDFs calls ``self_contained(__name__)``
at import time.  UDF modules must therefore keep their worker-side
dependencies to stdlib + pandas/numpy/pyarrow (always importable on
workers); anything else must be passed in as plain data.
"""

from __future__ import annotations

import sys


def self_contained(module_name: str) -> None:
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[module_name])
    except Exception:  # pragma: no cover - best effort on exotic runtimes
        pass
