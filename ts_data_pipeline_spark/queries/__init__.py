"""Named queries: importing this package registers every query.

Each submodule binds one operator family from SURVEY.md §2 (or the
north-star LLM-data set) to the driver contract: a PySpark callable
plus, where SQL-expressible, a DuckDB oracle.
"""

from ts_data_pipeline_spark.queries import (  # noqa: F401
    bars,
    catalog,
    enrichment,
    filters,
    flagship,
    llmdata,
    olap,
    quality,
    relational,
    sources,
    streaming,
    telemetry,
    timeseries,
)

# Suites union related members into single registry entries; import
# LAST so every member module is loaded first.
from ts_data_pipeline_spark.queries import suites  # noqa: E402,F401
