"""Closure serialization helper.

Python-UDF closures (pandas_udf / mapInPandas / applyInPandas) reference
functions in this package; pyspark's cloudpickle serializes importable-module
functions BY REFERENCE, so executor workers would need ``hiss_cube_spark`` on
their own PYTHONPATH — which fails when the driver added the repo to
``sys.path`` at runtime (exactly how a test harness imports an entry module).

``register_self`` flips the module to pickle-by-value: the closure ships its
code with the task, no package install needed on workers. Called at import
time by every module that builds Python UDFs.
"""

from __future__ import annotations

import sys


def register_self(module_name: str) -> None:
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[module_name])
    except Exception:
        # non-Spark context (plain unit use) or vendored API moved — the
        # by-reference default still works when the package is installed
        pass
