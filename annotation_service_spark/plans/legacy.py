"""Legacy (pre-2017-08-15 GeoLite) query-path semantics.

The reference's legacy path reads MaxMind's binary GeoLiteCity ``.dat``
via cgo/libgeoip (legacy/geoip.go:88-134) — there is no JVM/Python
reader for that format here, so the BINARY PARSE is out of scope: this
module consumes a pre-converted legacy city-records table (CSV/parquet
with the libgeoip record fields) and reproduces everything downstream
of the parse, which is where the semantics live:

- P12: legacy float32 lat/lon rounded to 3 decimals
  (legacy/legacy-dataset.go:203-209 formats "%.3f" — decimal-string
  HALF-UP rounding, reproduced exactly);
- P14/J5: FIPS→ISO subdivision remap via the broadcast fips dim,
  key = country + "-" + fips_region (legacy/fips.go:26-28); a missing
  key yields EMPTY subdivision fields (Go zero-value map lookup);
- P13-legacy: the GeolocationIP projection keeps CountryCode3 and
  AreaCode (present in legacy data, absent in GeoLite2);
- the v1 batch quirk: ONE date for the whole batch, taken from the
  FIRST item (handler/handler.go:310-313).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LEGACY_RECORD_COLUMNS = [
    "ip_low",
    "ip_high",
    "continent_code",
    "country_code",
    "country_code3",
    "country_name",
    "region",
    "metro_code",
    "city",
    "area_code",
    "postal_code",
    "latitude",
    "longitude",
]


def legacy_round3(col: F.Column) -> F.Column:
    """P12: the reference's round() goes through fmt.Sprintf("%.3f")
    on a float32 — decimal-string rounding. Spark's round() on DOUBLE
    uses the same BigDecimal-of-shortest-repr HALF_UP, so after
    casting the float32 input to double the results align."""
    return F.round(col.cast("double"), 3)


def legacy_geo_projection(records: DataFrame, fips: DataFrame) -> DataFrame:
    """P13-legacy + P14: attach ISO subdivision via the FIPS dim and
    shape the legacy GeolocationIP fields. ``records`` carries the
    pre-converted libgeoip city records; ``fips`` comes from
    sources.dims.fips_iso_map."""
    keyed = records.withColumn(
        "__fips_key", F.concat_ws("-", "country_code", "region")
    )
    joined = keyed.join(
        F.broadcast(fips), keyed["__fips_key"] == fips["fips_key"], "left"
    )
    return joined.select(
        "ip_low",
        "ip_high",
        F.struct(
            F.coalesce("continent_code", F.lit("")).alias("continent_code"),
            F.coalesce("country_code", F.lit("")).alias("country_code"),
            F.coalesce("country_code3", F.lit("")).alias("country_code3"),
            F.coalesce("country_name", F.lit("")).alias("country_name"),
            F.coalesce("region", F.lit("")).alias("region"),
            # Go zero-value on map miss → empty strings
            F.coalesce("region_iso_code", F.lit("")).alias("subdivision1_iso_code"),
            F.coalesce("region_name", F.lit("")).alias("subdivision1_name"),
            F.lit("").alias("subdivision2_iso_code"),
            F.lit("").alias("subdivision2_name"),
            F.coalesce(F.col("metro_code").cast("long"), F.lit(0)).alias("metro_code"),
            F.coalesce("city", F.lit("")).alias("city"),
            F.coalesce(F.col("area_code").cast("long"), F.lit(0)).alias("area_code"),
            F.coalesce("postal_code", F.lit("")).alias("postal_code"),
            legacy_round3(F.col("latitude")).alias("latitude"),
            legacy_round3(F.col("longitude")).alias("longitude"),
            F.lit(0).cast("long").alias("radius"),
            F.lit(False).alias("missing"),
        ).alias("geo"),
    )


def v1_batch_date(requests: DataFrame, ts_col: str = "ts") -> DataFrame:
    """The v1 batch quirk (handler/handler.go:310-313): every row in
    the batch is annotated AS OF the FIRST item's timestamp. "First"
    follows the batch's own order column when present (``__row``),
    else the earliest timestamp (deterministic superset of the
    reference's wire order)."""
    order_col = "__row" if "__row" in requests.columns else ts_col
    # distributed top-1 (TakeOrdered) + 1-row broadcast — NOT a
    # global window, which would shuffle the whole batch into a
    # single partition just to read its first row.
    first_row = F.broadcast(
        requests.orderBy(order_col)
        .limit(1)
        .select(F.col(ts_col).alias("batch_date"))
    )
    return requests.crossJoin(first_row)
