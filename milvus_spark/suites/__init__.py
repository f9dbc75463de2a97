"""Driver-facing query suites. Each module registers into milvus_spark.registry."""

from __future__ import annotations


def load_all() -> None:
    # Import order is stable; each module registers its queries on import.
    from milvus_spark.suites import arrays, curation, dml, fulltext, geo, pipeline, relational, sources_io, streaming_state, text, vector, vector2, windows  # noqa: F401
    # r6+ additions import LAST so pre-existing registration positions
    # never shift under the driver's in-order sampling rotation
    from milvus_spark.suites import addons_r6  # noqa: F401
    from milvus_spark.suites import addons_r7  # noqa: F401
    from milvus_spark.suites import addons_r8  # noqa: F401
    from milvus_spark.suites import addons_r9  # noqa: F401
    from milvus_spark.suites import addons_r9b  # noqa: F401
    from milvus_spark.suites import addons_r10  # noqa: F401
