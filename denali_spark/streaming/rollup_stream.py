"""Continuous materialized views: a foreachBatch sink that appends each
micro-batch to a catalog source table and folds its maintained rollup(s)
forward — the streaming spelling of REFRESH MATERIALIZED VIEW.

Exactly-once effect from at-least-once replays, with NO sink-local state:
- the append stamps ``streaming-batch-id`` into its snapshot summary and
  skips the write when any snapshot already carries the batch's id (the
  same dedup the `writeStream.format("denali")` sink uses,
  sources/datasource.py), re-checked inside the commit's CAS retry and
  backed by a ``streaming-batch-id.high-watermark`` table property that
  outlives snapshot expiry (one logical stream per source table: a
  restart with a FRESH checkpoint reuses batch ids and would dedupe
  away — use a fresh table, or UNSET the high-watermark property to
  declare the old stream finished);
- the refresh is watermark-idempotent (sources/ivm.py): a replayed batch
  whose append was skipped finds the watermark already at or past its
  snapshot and no-ops, while a crash BETWEEN append and refresh just
  leaves a pending delta the next refresh folds — the changelog range is
  derived from watermarks, never from batch boundaries.

Scale shape: each trigger costs one append commit plus one IVM refresh
whose delta read is the batch's files only; rollup file rewrites stay
bounded by touched groups. N rollups over one stream share the single
append and fold independently (each carries its own watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from denali_spark.sources.catalog_io import SparkCatalogIO
from denali_spark.sources.ivm import (
    JoinRollupSpec,
    RollupSpec,
    refresh_join_rollup,
    refresh_materialized_view,
    refresh_rollup,
)

BATCH_KEY = "streaming-batch-id"


def _refresh_one(io: SparkCatalogIO, spec) -> dict:
    if isinstance(spec, JoinRollupSpec):
        return refresh_join_rollup(io, spec)
    if isinstance(spec, RollupSpec):
        return refresh_rollup(io, spec)
    # a qualified MV name — resolve the spec from the stamped property
    parts = str(spec).split(".")
    if len(parts) < 2:
        raise ValueError(
            f"unqualified materialized-view name {spec!r}: use ns.mv"
        )
    return refresh_materialized_view(io, parts[:-1], parts[-1])


def make_rollup_refresh_sink(
    catalog_uri: str,
    source_namespace: list[str],
    source_name: str,
    rollups: list,
):
    """foreachBatch sink: append the batch to ``source_namespace.source_name``
    (batch-id-deduped) and refresh every rollup in ``rollups`` — each a
    RollupSpec, a JoinRollupSpec, or a qualified materialized-view name
    whose spec lives in its table properties."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        io = SparkCatalogIO(batch_df.sparkSession, catalog_uri)
        # write_table owns the whole dedup story: membership is re-checked
        # INSIDE the CAS retry loop (a replayed batch racing another writer
        # is caught on the reload, never double-appended), and the
        # `streaming-batch-id.high-watermark` table property advances with
        # the commit — so a late replay stays a no-op even after snapshot
        # expiry has trimmed the batch-stamped snapshots.
        io.write_table(
            batch_df, source_namespace, source_name, mode="append",
            summary_extra={BATCH_KEY: str(batch_id)},
            dedupe_summary_key=BATCH_KEY,
        )
        for spec in rollups:
            _refresh_one(io, spec)

    return _sink
