"""Legacy-path semantics tests (P12/P14/J5 + v1 batch quirk)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from annotation_service_spark.plans import legacy as lg
from annotation_service_spark.sources import dims


FIPS_CSV = (
    "Country ISO Code,Region FIPS Code,Region ISO Code,Region Name\n"
    "US,CA,US-CA,California\n"
    "DE,02,DE-BY,Bavaria\n"
)


def test_fips_remap_and_round3(spark, tmp_path):
    p = tmp_path / "fips.csv"
    p.write_text(FIPS_CSV)
    fips = dims.fips_iso_map(spark, str(p))
    records = spark.createDataFrame(
        [
            (b"\x00" * 16, b"\x01" * 16, "NA", "US", "USA", "United States",
             "CA", 803, "Los Angeles", 310, "90001", 34.05223, -118.24368),
            (b"\x02" * 16, b"\x03" * 16, "EU", "DE", "DEU", "Germany",
             "99", 0, "Nowhere", 0, "", 48.13743, 11.57549),
        ],
        "ip_low binary, ip_high binary, continent_code string, country_code string,"
        "country_code3 string, country_name string, region string, metro_code int,"
        "city string, area_code int, postal_code string, latitude float, longitude float",
    )
    out = lg.legacy_geo_projection(records, fips).collect()
    by_cc = {r.geo.country_code: r.geo for r in out}
    us = by_cc["US"]
    assert us.subdivision1_iso_code == "US-CA"
    assert us.subdivision1_name == "California"
    assert us.country_code3 == "USA"
    assert us.area_code == 310
    # P12: float32 34.05223 → %.3f → 34.052
    assert us.latitude == 34.052
    assert us.longitude == -118.244
    de = by_cc["DE"]
    # unmapped FIPS region → Go zero-value empties
    assert de.subdivision1_iso_code == ""
    assert de.subdivision1_name == ""


def test_v1_batch_date_quirk(spark):
    rows = [
        (0, dt.datetime(2018, 5, 1)),
        (1, dt.datetime(2016, 1, 1)),
        (2, dt.datetime(2020, 9, 9)),
    ]
    df = spark.createDataFrame(rows, "__row long, ts timestamp")
    out = lg.v1_batch_date(df).collect()
    assert all(r.batch_date == dt.datetime(2018, 5, 1) for r in out)
