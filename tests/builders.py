"""Builder lookup for tests: catalog entries OR unregistered builders.

The driver catalog is consolidated to ≤50 suite entries (round-2), but
tests keep driving the individual operator builders directly — this maps
the old per-operator names onto their plain functions.
"""

from __future__ import annotations

from retail_datawarehouse_spark.registry import catalog


def _fallbacks():
    from retail_datawarehouse_spark.dims import extracted
    from retail_datawarehouse_spark.etl import clean
    from retail_datawarehouse_spark.operators import (
        multimodal,
        sampling,
        similarity,
        textual,
    )
    from retail_datawarehouse_spark.queries import advanced, extensions
    from retail_datawarehouse_spark.streaming import pipelines

    mods = (extracted, clean, multimodal, sampling, similarity, textual,
            advanced, extensions, pipelines)
    out = {}
    for m in mods:
        for name in dir(m):
            if name.startswith("q_") and callable(getattr(m, name)):
                out.setdefault(name, getattr(m, name))
    return out


def builder(name: str):
    cat = catalog()
    if name in cat:
        return cat[name].builder
    fb = _fallbacks()
    if name in fb:
        return fb[name]
    raise KeyError(name)
