"""Streams-catalog lifecycle queries (T10, A10).

Covers catalog build, soft delete -> restore -> patch -> default
visibility filter (deleteStreamRequest.ts / restoreStreamRequest.ts /
patchStreamRequest.ts / streamStatus.ts:16) and the per-key backfill
cursor (darkpool_trades/main.py:157-179).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ts_data_pipeline_spark import io
from ts_data_pipeline_spark.operators import catalog as cat
from ts_data_pipeline_spark.registry import register


def _events_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events")
    return ev.select(F.col("user_id").cast("string").alias("stream_id"), "ts")


def catalog_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build catalog, soft-delete {2,4}, restore {4}, patch 6, list active."""
    c = cat.build_streams_catalog(_events_streams(spark, sf_dir))
    c = cat.soft_delete(c, ["2", "4"], "2024-02-01 00:00:00")
    c = cat.restore(c, ["4"])
    c = cat.patch_stream(c, "6", name="renamed-6", location="/cold/shard-0")
    return cat.active(c).drop("soft_delete_at")


CATALOG_LIFECYCLE_SQL = """
WITH bounds AS (
  SELECT CAST(user_id AS VARCHAR) AS stream_id,
         MIN(ts) AS data_start, MAX(ts) AS data_end,
         CAST(COUNT(*) AS BIGINT) AS n_records
  FROM events GROUP BY 1
),
cat AS (
  SELECT stream_id,
         'stream-' || stream_id AS name,
         'events' AS topic,
         '/live/shard-' || CAST(CAST(stream_id AS BIGINT) % 4 AS VARCHAR) AS location,
         CASE WHEN data_end >= date_trunc('day', MAX(data_end) OVER ())
              THEN 'Open' ELSE 'Closed' END AS status,
         data_start, data_end, n_records
  FROM bounds
)
SELECT stream_id,
       CASE WHEN stream_id = '6' THEN 'renamed-6' ELSE name END AS name,
       topic,
       CASE WHEN stream_id = '6' THEN '/cold/shard-0' ELSE location END AS location,
       CASE WHEN stream_id = '4' THEN 'Open' ELSE status END AS status,
       data_start, data_end, n_records
FROM cat
WHERE stream_id != '2'
"""


def backfill_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cat.backfill_cursor(_events_streams(spark, sf_dir))


BACKFILL_CURSOR_SQL = """
SELECT CAST(user_id AS VARCHAR) AS stream_id,
       MAX(ts) + INTERVAL 1 MILLISECOND AS next_cursor
FROM events GROUP BY 1
"""


def catalog_locations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Locations listing (getAllLocationsRequest.ts): stream counts
    per location with smart-case Contains on the location path,
    status include filter (F8), ordering + paging (O1/O2) — the
    catalog-browse contract over the derived streams catalog."""
    c = cat.build_streams_catalog(_events_streams(spark, sf_dir))
    listed = (
        c.filter(F.col("location").contains("shard"))  # Contains (lowercase -> smart-case insensitive)
        .filter(F.col("status").isin("Open", "Closed"))
        .groupBy("location")
        .agg(
            F.count(F.lit(1)).alias("n_streams"),
            F.sum(F.when(F.col("status") == "Open", 1).otherwise(0)).alias("n_open"),
            F.max("data_end").alias("latest_data"),
        )
        .orderBy(F.col("n_streams").desc(), F.col("location").asc())
    )
    return listed.offset(1).limit(2)


CATALOG_LOCATIONS_SQL = """
WITH bounds AS (
  SELECT CAST(user_id AS VARCHAR) AS stream_id,
         MIN(ts) AS data_start, MAX(ts) AS data_end
  FROM events GROUP BY 1
),
cat AS (
  SELECT stream_id,
         '/live/shard-' || CAST(CAST(stream_id AS BIGINT) % 4 AS VARCHAR) AS location,
         CASE WHEN data_end >= date_trunc('day', MAX(data_end) OVER ())
              THEN 'Open' ELSE 'Closed' END AS status,
         data_end
  FROM bounds
)
SELECT location,
       COUNT(*) AS n_streams,
       CAST(SUM(CASE WHEN status = 'Open' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       MAX(data_end) AS latest_data
FROM cat
WHERE location LIKE '%shard%' AND status IN ('Open', 'Closed')
GROUP BY location
ORDER BY n_streams DESC, location ASC
LIMIT 2 OFFSET 1
"""


register("catalog_lifecycle", catalog_lifecycle, CATALOG_LIFECYCLE_SQL)
register("backfill_cursor", backfill_cursor, BACKFILL_CURSOR_SQL)
def catalog_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream parent/child roll-up (streamWithChildren.ts:17-71)."""
    c = cat.build_streams_catalog(_events_streams(spark, sf_dir))
    return cat.children_rollup(cat.with_parents(c))


CATALOG_HIERARCHY_SQL = """
WITH bounds AS (
  SELECT CAST(user_id AS VARCHAR) AS stream_id,
         MIN(ts) AS data_start, MAX(ts) AS data_end
  FROM events GROUP BY 1
),
kids AS (
  SELECT stream_id,
         CAST(CAST(stream_id AS BIGINT) // 10 AS VARCHAR) AS parent_id,
         data_start, data_end
  FROM bounds
  WHERE CAST(stream_id AS BIGINT) >= 10
)
SELECT parent_id,
       COUNT(*) AS n_children,
       MIN(data_start) AS children_start,
       MAX(data_end) AS children_end
FROM kids GROUP BY parent_id
"""


register("catalog_locations", catalog_locations, CATALOG_LOCATIONS_SQL)
def catalog_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 catalog history: seed from the snapshot, apply a rename/
    relocate batch for streams 3 and 7, list the full history."""
    c = cat.build_streams_catalog(_events_streams(spark, sf_dir))
    hist = cat.as_history(c)
    updates = (
        c.filter(F.col("stream_id").isin("3", "7"))
        .select(
            "stream_id",
            F.concat(F.lit("renamed-"), F.col("stream_id")).alias("name"),
            F.lit("/cold/archive").alias("location"),
            F.lit("Closed").alias("status"),
        )
    )
    return cat.scd2_apply(hist, updates).drop("data_start", "data_end", "n_records", "soft_delete_at", "topic")


CATALOG_SCD2_SQL = """
WITH bounds AS (
  SELECT CAST(user_id AS VARCHAR) AS stream_id,
         MIN(ts) AS data_start, MAX(ts) AS data_end
  FROM events GROUP BY 1
),
snap AS (
  SELECT stream_id,
         'stream-' || stream_id AS name,
         '/live/shard-' || CAST(CAST(stream_id AS BIGINT) % 4 AS VARCHAR) AS location,
         CASE WHEN data_end >= date_trunc('day', MAX(data_end) OVER ())
              THEN 'Open' ELSE 'Closed' END AS status
  FROM bounds
)
SELECT stream_id, name, location, status,
       TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
       CASE WHEN stream_id IN ('3', '7')
            THEN TIMESTAMP '2024-02-01 00:00:00' END AS valid_to,
       stream_id NOT IN ('3', '7') AS is_current
FROM snap
UNION ALL
SELECT stream_id, 'renamed-' || stream_id, '/cold/archive', 'Closed',
       TIMESTAMP '2024-02-01 00:00:00', CAST(NULL AS TIMESTAMP), TRUE
FROM snap WHERE stream_id IN ('3', '7')
"""


register("catalog_hierarchy", catalog_hierarchy, CATALOG_HIERARCHY_SQL)
def catalog_parameters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameters catalog (parameter.ts:17-59 /
    getAllParametersRequest): one row per parameter channel with its
    type, observed min/max, group path, and stream count — derived
    from the data, filtered with a StartsWith match (F7) and ordered
    (O1)."""
    ev = io.load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("event_type").alias("parameter_id"))
        .agg(
            F.lit("Numeric").alias("ptype"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
            F.count_distinct("user_id").alias("n_streams"),
        )
        .withColumn(
            "group_path", F.concat(F.lit("/telemetry/"), F.col("parameter_id"))
        )
        .filter(~F.col("parameter_id").startswith("x"))
        .orderBy(F.col("parameter_id").asc())
    )


CATALOG_PARAMETERS_SQL = """
SELECT event_type AS parameter_id,
       'Numeric' AS ptype,
       ROUND(MIN(value), 4) AS min_value,
       ROUND(MAX(value), 4) AS max_value,
       COUNT(DISTINCT user_id) AS n_streams,
       '/telemetry/' || event_type AS group_path
FROM events
WHERE event_type NOT LIKE 'x%'
GROUP BY event_type
ORDER BY parameter_id ASC
"""


register("catalog_scd2", catalog_scd2, CATALOG_SCD2_SQL)
register("catalog_parameters", catalog_parameters, CATALOG_PARAMETERS_SQL)
