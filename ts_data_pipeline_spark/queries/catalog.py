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


# catalog_lifecycle / backfill_cursor / catalog_locations /
# catalog_hierarchy are verified together as ``catalog_browse_suite``
# (queries/suites.py).
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


def catalog_metadata_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream metadata map + MetadataFilter + full-text search
    (stream.ts:54, metadataFilter.ts:16-25, getAllStreamsRequest.ts
    ``metadata``/``search``).

    Two listings over the same metadata-filtered catalog: patch
    stream 5's metadata (tier -> cold, +note), keep only
    region=eu-west streams (case-sensitive Equals on key+value),
    then full-text-search 'hot' and 'cold' — the patched stream
    moves from the first listing to the second.
    """
    c = cat.with_metadata(
        cat.build_streams_catalog(_events_streams(spark, sf_dir))
    )
    c = cat.patch_stream(c, "5", metadata={"tier": "cold", "note": "patched"})
    eu = cat.metadata_filter(c, [cat.MetadataFilter(key="region", value="eu-west")])

    def listing(term: str) -> DataFrame:
        return cat.search_streams(eu, term).select(
            F.lit(term).alias("listing"),
            "stream_id", "name", "location", "status", "n_records",
            cat.metadata_canonical(F.col("metadata")).alias("metadata"),
        )

    return listing("hot").unionByName(listing("cold"))


CATALOG_METADATA_FILTER_SQL = """
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
         n_records,
         CASE WHEN CAST(stream_id AS BIGINT) % 4 < 2
              THEN 'eu-west' ELSE 'us-east' END AS md_region,
         CASE WHEN n_records >= AVG(n_records) OVER ()
              THEN 'hot' ELSE 'warm' END AS md_tier0,
         'team-' || CAST(CAST(stream_id AS BIGINT) % 3 AS VARCHAR) AS md_owner
  FROM bounds
),
patched AS (
  SELECT stream_id, name, topic, location, status, n_records,
         md_region, md_owner,
         CASE WHEN stream_id = '5' THEN 'cold' ELSE md_tier0 END AS md_tier,
         CASE WHEN stream_id = '5' THEN 'patched' END AS md_note
  FROM cat
),
canon AS (
  SELECT stream_id, name, location, status, n_records,
         CASE WHEN md_note IS NOT NULL
              THEN 'note=' || md_note || ';owner=' || md_owner ||
                   ';region=' || md_region || ';tier=' || md_tier
              ELSE 'owner=' || md_owner || ';region=' || md_region ||
                   ';tier=' || md_tier END AS metadata,
         lower(stream_id || ' ' || name || ' ' || topic || ' ' || location ||
               ' ' || md_region || ' ' || md_tier || ' ' || md_owner ||
               COALESCE(' ' || md_note, '')) AS hay
  FROM patched
  WHERE md_region = 'eu-west'
)
SELECT 'hot' AS listing, stream_id, name, location, status, n_records, metadata
FROM canon WHERE position('hot' IN hay) > 0
UNION ALL
SELECT 'cold' AS listing, stream_id, name, location, status, n_records, metadata
FROM canon WHERE position('cold' IN hay) > 0
"""


def catalog_event_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-group tree listing (getAllEventGroupsRequest.ts:18-52,
    parameterGroup.ts:16-45): leaf paths /telemetry/<level>/<event>,
    every prefix a group node with deep membership counts + direct
    children, filtered by location deep-search under /telemetry and
    smart-case name Contains 'r'."""
    from ts_data_pipeline_spark.queries.telemetry import events_as_event_model

    ev = events_as_event_model(io.load(spark, sf_dir, "events"))
    memb = ev.select(
        "stream_id",
        F.concat(
            F.lit("/telemetry/"), F.col("level"), F.lit("/"), F.col("event_id")
        ).alias("group_path"),
    )
    tree = cat.group_tree(memb)
    return cat.list_groups(
        tree, location="/telemetry", location_deep_search=True, name="r"
    ).orderBy("path")


CATALOG_EVENT_GROUPS_SQL = """
WITH ev AS (
  SELECT CAST(user_id AS VARCHAR) AS stream_id,
         '/telemetry/' ||
         CASE WHEN event_type = 'error' THEN 'Error'
              WHEN event_type = 'signup' THEN 'Information'
              ELSE 'Debug' END || '/' || event_type AS path
  FROM events
),
pref AS (
  SELECT stream_id, '/telemetry' AS gpath FROM ev
  UNION ALL SELECT stream_id, regexp_extract(path, '^(/[^/]+/[^/]+)', 1) FROM ev
  UNION ALL SELECT stream_id, path FROM ev
),
agg AS (
  SELECT gpath, COUNT(DISTINCT stream_id) AS n_streams,
         CAST(COUNT(*) AS BIGINT) AS n_records
  FROM pref GROUP BY 1
),
kids AS (
  SELECT regexp_replace(gpath, '/[^/]+$', '') AS parent,
         CAST(COUNT(*) AS BIGINT) AS children_count
  FROM agg GROUP BY 1
),
tree AS (
  SELECT a.gpath AS path,
         regexp_extract(a.gpath, '([^/]+)$', 1) AS name,
         regexp_replace(a.gpath, '/[^/]+$', '') AS location,
         a.n_streams, a.n_records,
         COALESCE(k.children_count, 0) AS children_count
  FROM agg a LEFT JOIN kids k ON a.gpath = k.parent
)
SELECT * FROM tree
WHERE (location = '/telemetry' OR location LIKE '/telemetry/%')
  AND position('r' IN lower(name)) > 0
ORDER BY path
"""


def snippet_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-snippet catalog listing (getAllDataSnippetsRequest.ts):
    two request shapes over the saved-snippet catalog — ContainsAny
    on parameter ids, and name-Contains + stream membership — each
    enriched with the observed selection size (rows / distinct
    streams the snippet's saved filters select today)."""
    from ts_data_pipeline_spark.plans import snippets as snip
    from ts_data_pipeline_spark.queries.telemetry import (
        events_as_parameter_values,
    )

    pv = events_as_parameter_values(io.load(spark, sf_dir, "events")).select(
        "stream_id", "ts", "parameter_id"
    )
    catalog = snip.snippets_catalog(spark)
    by_param = snip.snippet_row_counts(
        snip.list_snippets(catalog, parameter_ids=["click", "error"]), pv
    ).withColumn("req", F.lit("by_param"))
    by_name = snip.snippet_row_counts(
        snip.list_snippets(catalog, name="replay", stream_id="2"), pv
    ).withColumn("req", F.lit("by_name_stream"))
    return by_param.unionByName(by_name)


SNIPPET_LISTING_SQL = """
WITH pv AS (
  SELECT CAST(user_id AS VARCHAR) AS stream_id, ts,
         event_type AS parameter_id
  FROM events
),
snips(snippet_id, name, stream_ids, parameter_ids, from_ts, to_ts) AS (
  VALUES
   (1, 'replay-clicks', ['1','2'], ['click'],
    TIMESTAMP '2024-01-02 00:00:00', TIMESTAMP '2024-01-10 00:00:00'),
   (2, 'replay-purchases', ['3','4','5'], ['purchase','click'],
    TIMESTAMP '2024-01-05 00:00:00', TIMESTAMP '2024-01-15 00:00:00'),
   (3, 'error-audit', ['2','4','6','8'], ['error'],
    TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-20 00:00:00'),
   (4, 'signup-window', ['7'], ['signup','view'],
    TIMESTAMP '2024-01-03 00:00:00', TIMESTAMP '2024-01-08 00:00:00'),
   (5, 'view-sweep', ['1','3','5','7','9'], ['view'],
    TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-31 00:00:00')
),
counts AS (
  SELECT s.snippet_id, s.name, s.from_ts, s.to_ts,
         CAST(COUNT(p.stream_id) AS BIGINT) AS n_rows,
         COUNT(DISTINCT p.stream_id) AS n_streams
  FROM snips s LEFT JOIN pv p
    ON list_contains(s.stream_ids, p.stream_id)
   AND list_contains(s.parameter_ids, p.parameter_id)
   AND p.ts >= s.from_ts AND p.ts < s.to_ts
  GROUP BY 1, 2, 3, 4
)
SELECT c.snippet_id, c.name, c.from_ts, c.to_ts, c.n_rows, c.n_streams,
       'by_param' AS req
FROM counts c JOIN snips s USING (snippet_id)
WHERE list_has_any(s.parameter_ids, ['click','error'])
UNION ALL
SELECT c.snippet_id, c.name, c.from_ts, c.to_ts, c.n_rows, c.n_streams,
       'by_name_stream' AS req
FROM counts c JOIN snips s USING (snippet_id)
WHERE position('replay' IN lower(s.name)) > 0
  AND list_contains(list_transform(s.stream_ids, x -> lower(x)), '2')
"""


register("catalog_scd2", catalog_scd2, CATALOG_SCD2_SQL)
register("catalog_parameters", catalog_parameters, CATALOG_PARAMETERS_SQL)
register("catalog_metadata_filter", catalog_metadata_filter, CATALOG_METADATA_FILTER_SQL)
register("catalog_event_groups", catalog_event_groups, CATALOG_EVENT_GROUPS_SQL)
register("snippet_listing", snippet_listing, SNIPPET_LISTING_SQL)


def temporal_catalog_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal dimension join: every event joined to the SCD2
    catalog VERSION valid at its timestamp (operators/asof.py::
    temporal_dimension_join), rolled up per version. Streams 3 and 7
    split their events across the pre/post-2024-02-01 versions."""
    from ts_data_pipeline_spark.operators import asof

    ev = io.load(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("stream_id"), "ts"
    )
    dim = catalog_scd2(spark, sf_dir)
    joined = asof.temporal_dimension_join(ev, dim, key="stream_id")
    return joined.groupBy("stream_id", "name", "status").agg(
        F.count(F.lit(1)).alias("n_events")
    )


TEMPORAL_CATALOG_JOIN_SQL = f"""
WITH scd AS ({CATALOG_SCD2_SQL})
SELECT d.stream_id, d.name, d.status, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events e JOIN scd d
  ON CAST(e.user_id AS VARCHAR) = d.stream_id
 AND e.ts >= d.valid_from
 AND (d.valid_to IS NULL OR e.ts < d.valid_to)
GROUP BY 1, 2, 3
"""
