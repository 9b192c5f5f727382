"""Entry point C — the ad-hoc workbook load, Spark-first.

Re-expresses the reference's xlsx lifecycle (SURVEY.md 3.3,
userCode/xlsx/main.py:19-28 + helpers.py:82-196): three sheets
(Site Data / Metadata / Data) are schema-validated (U4), two-hop
equi-joined Data -> Metadata -> Site (J2, built with Python dicts in
the reference), units/elevation parsed (F7), deterministic ids
synthesized (F1/F5), and full-refresh loaded with duplicate-tolerant
upsert semantics (K4 — here: the merge's LSN guard).

The reference raises KeyError on a dangling foreign key
(helpers.py:112-118); strict=True reproduces that as an anti-join
count assert, strict=False drops dangling rows (inner join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import deterministic_hash, numeric_prefix
from ..sources.readers import validate_columns

SITE_COLS = ["native_id", "name", "lon", "lat", "elevation_str", "org"]
METADATA_COLS = ["md_id", "site_id", "property", "unit", "value_type"]
DATA_COLS = ["md_id", "sample_ts", "result_ts", "value", "quality"]


def load_xlsx_star(
    site: DataFrame,
    metadata: DataFrame,
    data: DataFrame,
    strict: bool = True,
) -> DataFrame:
    """Join the workbook star into one observation DataFrame:
    (obs_id, ds_id, site_native_id, site_name, lon, lat, elevation,
    property, unit, ts, value, quality)."""
    validate_columns(site, SITE_COLS)
    validate_columns(metadata, METADATA_COLS)
    validate_columns(data, DATA_COLS)

    if strict:
        dangling = data.join(
            metadata.select("md_id"), on="md_id", how="left_anti"
        ).count()
        if dangling:
            raise ValueError(
                f"{dangling} data rows reference a missing metadata id "
                "(reference raises KeyError, userCode/xlsx/helpers.py:112-118)"
            )
        dangling_md = metadata.join(
            site.select(F.col("native_id").alias("site_id")), on="site_id", how="left_anti"
        ).count()
        if dangling_md:
            raise ValueError(f"{dangling_md} metadata rows reference a missing site")

    # two-hop star join; dims are workbook-sized -> broadcast both hops
    joined = (
        data.join(F.broadcast(metadata), on="md_id", how="inner")
        .join(
            F.broadcast(site.withColumnRenamed("native_id", "site_id")),
            on="site_id",
            how="inner",
        )
    )
    ds_id = deterministic_hash(F.concat_ws("-", "site_id", "property", "unit"), 9)
    obs_id = deterministic_hash(
        F.concat_ws("-", "site_id", "property", F.col("result_ts").cast("string")), 9
    )
    return joined.select(
        obs_id.alias("obs_id"),
        ds_id.alias("ds_id"),
        F.col("site_id").alias("site_native_id"),
        F.col("name").alias("site_name"),
        "lon",
        "lat",
        numeric_prefix("elevation_str").alias("elevation"),
        "property",
        "unit",
        F.col("result_ts").alias("ts"),
        "value",
        "quality",
    )
