"""Streams-catalog operators: build, lifecycle mutation, default filters.

Reproduces the reference's stream catalog semantics (T10):
soft/hard delete, restore, patch (rename / relocate / metadata merge)
and the status model — contracts
/root/reference/dashboard/src/Models/deleteStreamRequest.ts:16-25,
restoreStreamRequest.ts, patchStreamRequest.ts, stream.ts:17-67,
streamStatus.ts:16 (Open/Closed/Aborted/Terminated/Interrupted/
Deleting/SoftDeleted/Idle).

Spark-first design: the catalog is a small dimension table derived
from (or stored beside) the data tables; every mutation is a pure
DataFrame transform (CASE expressions), so in production it maps to
a Delta MERGE while staying a deterministic, oracle-checkable
projection here. At 100 TB the catalog stays tiny (one row per
stream), so it is always the broadcast side of any enrichment join.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: streamStatus.ts:16
STREAM_STATUSES = (
    "Open", "Closed", "Aborted", "Terminated", "Interrupted",
    "Deleting", "SoftDeleted", "Idle",
)


def build_streams_catalog(
    events: DataFrame,
    *,
    stream_col: str = "stream_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Derive the streams catalog from the event data (stream.ts:17-67).

    One row per stream: name/topic/location metadata plus observed
    data_start/data_end. Status: a stream whose last datum falls in
    the final observed day is Open, else Closed — a deterministic
    stand-in for the reference's session status. A single partial+
    final min/max agg on the natural grouping key; no extra shuffle.
    """
    bounds = events.groupBy(stream_col).agg(
        F.min(ts_col).alias("data_start"),
        F.max(ts_col).alias("data_end"),
        F.count(F.lit(1)).alias("n_records"),
    )
    # Global max over the (tiny, one-row-per-stream) bounds relation —
    # an empty-frame window on a dimension table, not on the raw data.
    global_end = F.max("data_end").over(Window.partitionBy())
    sid = F.col(stream_col)
    return (
        bounds.withColumn("_gend", global_end)
        .select(
            sid.alias("stream_id"),
            F.concat(F.lit("stream-"), sid).alias("name"),
            F.lit("events").alias("topic"),
            F.concat(F.lit("/live/shard-"), (sid.cast("bigint") % 4)).alias("location"),
            F.when(
                F.col("data_end") >= F.date_trunc("day", F.col("_gend")), "Open"
            ).otherwise("Closed").alias("status"),
            F.col("data_start"),
            F.col("data_end"),
            F.col("n_records"),
            F.lit(None).cast("timestamp").alias("soft_delete_at"),
        )
    )


def with_metadata(catalog: DataFrame) -> DataFrame:
    """Attach the stream ``metadata: MAP<STRING,STRING>`` column
    (stream.ts:54 ``metadata: {[key: string]: string}``).

    Derivation is deterministic from observed facts so the catalog
    stays reproducible from data alone: region follows the shard,
    tier compares the stream's record count to the catalog average
    (a window over the tiny one-row-per-stream relation), owner
    hashes the id. Real deployments would carry these through the
    ingest headers instead.
    """
    sid = F.col("stream_id").cast("bigint")
    avg_records = F.avg("n_records").over(Window.partitionBy())
    region = F.when(sid % 4 < 2, F.lit("eu-west")).otherwise(F.lit("us-east"))
    tier = F.when(F.col("n_records") >= avg_records, "hot").otherwise("warm")
    owner = F.concat(F.lit("team-"), (sid % 3).cast("string"))
    return catalog.withColumn(
        "metadata",
        F.create_map(
            F.lit("region"), region,
            F.lit("tier"), tier,
            F.lit("owner"), owner,
        ),
    )


@dataclass
class MetadataFilter:
    """metadataFilter.ts:16-25 — case-sensitive Equals on key and/or
    value; either side may be null (= unconstrained)."""

    key: Optional[str] = None
    value: Optional[str] = None


def metadata_predicate(metadata: Column, f: MetadataFilter) -> Column:
    """One MetadataFilter as a Column predicate over the map."""
    if f.key is not None and f.value is not None:
        # lookup is null when absent -> null-rejecting equality, the
        # contract's Equals semantics.
        return metadata[f.key] == f.value
    if f.key is not None:
        return metadata[f.key].isNotNull()
    if f.value is not None:
        return F.array_contains(F.map_values(metadata), f.value)
    return F.lit(True)


def metadata_filter(
    catalog: DataFrame, filters: Sequence[MetadataFilter]
) -> DataFrame:
    """AND of MetadataFilters (getAllStreamsRequest.ts ``metadata``)."""
    out = catalog
    for f in filters:
        out = out.filter(metadata_predicate(F.col("metadata"), f))
    return out


def search_streams(catalog: DataFrame, text: str) -> DataFrame:
    """Full-text ``search`` (getAllStreamsRequest.ts): case-insensitive
    Contains across id, name, topic, location and metadata values —
    one scan-local predicate, no shuffle."""
    hay = F.lower(
        F.concat_ws(
            " ",
            F.col("stream_id"),
            F.col("name"),
            F.col("topic"),
            F.col("location"),
            F.concat_ws(" ", F.map_values(F.col("metadata"))),
        )
    )
    return catalog.filter(F.instr(hay, text.lower()) > 0)


def metadata_canonical(metadata: Column) -> Column:
    """Canonical ``k=v;...`` rendering (entries sorted by key) so a
    MAP column can participate in the order-insensitive value hash."""
    return F.array_join(
        F.array_sort(
            F.transform(
                F.map_entries(metadata),
                lambda e: F.concat_ws("=", e["key"], e["value"]),
            )
        ),
        ";",
    )


def soft_delete(
    catalog: DataFrame, stream_ids: Sequence[str], at_ts: str
) -> DataFrame:
    """deleteStreamRequest.ts:16-25 — mark streams SoftDeleted."""
    hit = F.col("stream_id").isin(*stream_ids)
    return catalog.withColumn(
        "soft_delete_at",
        F.when(hit, F.lit(at_ts).cast("timestamp")).otherwise(F.col("soft_delete_at")),
    ).withColumn(
        "status", F.when(hit, F.lit("SoftDeleted")).otherwise(F.col("status"))
    )


def restore(catalog: DataFrame, stream_ids: Sequence[str]) -> DataFrame:
    """restoreStreamRequest.ts — clear soft delete, reopen."""
    hit = F.col("stream_id").isin(*stream_ids) & F.col("soft_delete_at").isNotNull()
    return catalog.withColumn(
        "status", F.when(hit, F.lit("Open")).otherwise(F.col("status"))
    ).withColumn(
        "soft_delete_at",
        F.when(hit, F.lit(None).cast("timestamp")).otherwise(F.col("soft_delete_at")),
    )


def patch_stream(
    catalog: DataFrame,
    stream_id: str,
    *,
    name: Optional[str] = None,
    location: Optional[str] = None,
    metadata: Optional[dict] = None,
) -> DataFrame:
    """patchStreamRequest.ts — rename / relocate / metadata-merge one
    stream. ``metadata`` keys upsert into the existing map (patched
    keys win); other keys are preserved."""
    hit = F.col("stream_id") == stream_id
    out = catalog
    if name is not None:
        out = out.withColumn(
            "name", F.when(hit, F.lit(name)).otherwise(F.col("name"))
        )
    if location is not None:
        out = out.withColumn(
            "location", F.when(hit, F.lit(location)).otherwise(F.col("location"))
        )
    if metadata:
        patch_keys = list(metadata.keys())
        patch_map = F.create_map(
            *[F.lit(x) for kv in metadata.items() for x in kv]
        )
        merged = F.map_concat(
            F.map_filter(
                F.col("metadata"), lambda k, _v: ~k.isin(*patch_keys)
            ),
            patch_map,
        )
        out = out.withColumn(
            "metadata", F.when(hit, merged).otherwise(F.col("metadata"))
        )
    return out


def active(catalog: DataFrame) -> DataFrame:
    """Default visibility filter: exclude soft-deleted streams."""
    return catalog.filter(F.col("soft_delete_at").isNull())


def with_parents(catalog: DataFrame) -> DataFrame:
    """Attach the stream hierarchy (stream.ts:54 ``parents``,
    streamWithChildren.ts:17-71): deterministic tree where stream N's
    parent is N div 10 (root streams < 10 have no parent). Parents is
    an ARRAY<STRING> path from root, matching the contract shape."""
    sid = F.col("stream_id").cast("bigint")
    parent = F.when(sid >= 10, (sid / 10).cast("bigint").cast("string"))
    grandparent = F.when(sid >= 100, (sid / 100).cast("bigint").cast("string"))
    return catalog.withColumn(
        "parents",
        F.array_compact(F.array(grandparent, parent)),
    )


def children_rollup(catalog_with_parents: DataFrame) -> DataFrame:
    """streamWithChildren: per parent stream, direct-child count and
    data span of the subtree's direct children."""
    c = catalog_with_parents.select(
        "stream_id",
        F.try_element_at(F.col("parents"), F.lit(-1)).alias("parent_id"),
        "data_start",
        "data_end",
    ).filter(F.col("parent_id").isNotNull())
    return c.groupBy("parent_id").agg(
        F.count(F.lit(1)).alias("n_children"),
        F.min("data_start").alias("children_start"),
        F.max("data_end").alias("children_end"),
    )


def group_tree(
    memberships: DataFrame,
    *,
    path_col: str = "group_path",
    stream_col: str = "stream_id",
) -> DataFrame:
    """Materialize the parameter/event group hierarchy from leaf
    group paths (parameterGroup.ts:16-45 / eventGroup — path, name,
    location, childrenCount, stream membership).

    Input: one row per (stream, leaf group path) occurrence. Every
    path prefix becomes a group node; per node we aggregate deep
    membership (all rows under the subtree) and count distinct
    direct children. Plan shape: explode of ≤depth prefixes (depth
    is tiny) -> one hash agg on the path -> a self-join on the
    parent edge over the already-aggregated (small) group relation.
    At 100 TB the explode is a constant factor ≤ path depth on the
    scan; everything after the agg touches only distinct groups.
    """
    segs = F.split(F.col(path_col), "/")
    pref = memberships.select(
        F.col(stream_col).alias("_sid"),
        F.explode(
            F.transform(
                # i = 2..len(segs): "/a/b/c" splits to ["","a","b","c"];
                # joining the first i segments yields each ancestor path.
                F.sequence(F.lit(2), F.size(segs)),
                lambda i: F.array_join(F.slice(segs, F.lit(1), i), "/"),
            )
        ).alias("path"),
    )
    agg = pref.groupBy("path").agg(
        F.count_distinct("_sid").alias("n_streams"),
        F.count(F.lit(1)).alias("n_records"),
    )
    kids = (
        agg.select(F.regexp_replace(F.col("path"), "/[^/]+$", "").alias("_parent"))
        .groupBy("_parent")
        .agg(F.count(F.lit(1)).alias("children_count"))
    )
    joined = agg.join(kids, agg["path"] == kids["_parent"], "left")
    return joined.select(
        "path",
        F.regexp_extract(F.col("path"), "([^/]+)$", 1).alias("name"),
        F.regexp_replace(F.col("path"), "/[^/]+$", "").alias("location"),
        "n_streams",
        "n_records",
        F.coalesce(F.col("children_count"), F.lit(0)).alias("children_count"),
    )


def list_groups(
    tree: DataFrame,
    *,
    location: Optional[str] = None,
    location_deep_search: bool = True,
    name: Optional[str] = None,
    group_paths: Optional[Sequence[str]] = None,
) -> DataFrame:
    """getAllEventGroupsRequest.ts:18-52 filters over a group tree:
    location prefix (deep = all descendants, else direct children
    only), smart-case Contains on name (case-sensitive iff the
    pattern has a capital), and group-path Equals list."""
    out = tree
    if location is not None:
        loc = F.col("location")
        if location_deep_search:
            out = out.filter(
                (loc == location) | loc.startswith(location.rstrip("/") + "/")
            )
        else:
            out = out.filter(loc == location)
    if name is not None:
        if name != name.lower():
            out = out.filter(F.instr(F.col("name"), name) > 0)
        else:
            out = out.filter(F.instr(F.lower(F.col("name")), name) > 0)
    if group_paths is not None:
        out = out.filter(F.col("path").isin(*group_paths))
    return out


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    *,
    key: str = "stream_id",
    tracked: Sequence[str] = ("name", "location", "status"),
    at_ts: str = "2024-02-01 00:00:00",
) -> DataFrame:
    """Apply a batch of catalog updates as SCD-type-2 history.

    Emulates MERGE on a plain table (the guide's v1 CDC pattern:
    anti-join + union): current rows whose key appears in ``updates``
    are closed (valid_to = at_ts, is_current = false); updated/new
    versions open at at_ts. One broadcast-able join against the
    updates batch — history never rewrites untouched keys' rows.

    ``history`` needs (key, *tracked, valid_from, valid_to,
    is_current); ``updates`` needs (key, *tracked).
    """
    at = F.lit(at_ts).cast("timestamp")
    upd_keys = updates.select(F.col(key).alias("_uk")).distinct()
    # Close the current version of every updated key.
    joined = history.join(
        F.broadcast(upd_keys), history[key] == F.col("_uk"), "left"
    )
    closed = joined.select(
        *[F.col(c) for c in history.columns if c not in ("valid_to", "is_current")],
        F.when(
            F.col("_uk").isNotNull() & F.col("is_current"), at
        ).otherwise(F.col("valid_to")).alias("valid_to"),
        F.when(
            F.col("_uk").isNotNull() & F.col("is_current"), F.lit(False)
        ).otherwise(F.col("is_current")).alias("is_current"),
    )
    opened = updates.select(
        F.col(key),
        *[F.col(c) for c in tracked],
        at.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed.unionByName(opened)


def as_history(catalog: DataFrame, *, since: str = "2024-01-01 00:00:00") -> DataFrame:
    """Seed an SCD2 history from a point-in-time catalog snapshot."""
    return catalog.select(
        "stream_id", "name", "location", "status",
        F.lit(since).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def backfill_cursor(
    data: DataFrame, *, key_col: str = "stream_id", ts_col: str = "ts"
) -> DataFrame:
    """Per-key REST-backfill cursor: max(ts) + 1 ms (A10).

    The reference advances its darkpool pagination cursor to
    ``max(executed_at) + 1ms`` per symbol
    (/root/reference/darkpool_trades/main.py:157-179). One partial+
    final max agg per key — the minimal plan.
    """
    return data.groupBy(F.col(key_col)).agg(
        (F.max(ts_col) + F.expr("INTERVAL 1 MILLISECOND")).alias("next_cursor")
    )
