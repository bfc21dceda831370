"""S10: pure-Python legacy GeoIP .dat binary reader.

Validated two ways: a build_dat→enumerate_dat round trip over the
nesting scenarios of legacy-dataset_test.go, and — when the reference
checkout is present — a parse of the reference's own binary fixture
(legacy/testdata/GeoIPv6.dat) against the exact expectations of
legacy/geoip_test.go (2620:0:1003:415:... → US/USA/United States/NA).
"""

from __future__ import annotations

import ipaddress
import os

import pytest
from pyspark.sql import functions as F

from annotation_service_spark.sources import legacy_dat as ld

REF_V6_DAT = "/root/reference/legacy/testdata/GeoIPv6.dat"


def _v4(b: bytes) -> str:
    return ".".join(map(str, b[-4:]))


def test_city_fixture_round_trip():
    rows = list(ld.enumerate_dat(ld.build_dat(ld.demo_fixture_networks())))
    # sorted, disjoint, canonical 16-byte bounds
    prev = -1
    for r in rows:
        lo = int.from_bytes(r["ip_low"], "big")
        hi = int.from_bytes(r["ip_high"], "big")
        assert lo > prev and hi >= lo
        assert r["ip_low"][:12] == ld.V4_MAPPED_PREFIX
        prev = hi
    by_ip = {}
    for probe in ("207.171.7.51", "207.171.8.1", "10.1.2.3", "10.65.0.1",
                  "192.0.2.7", "8.8.8.8"):
        p = int(ipaddress.ip_address(probe)) | 0xFFFF00000000
        hit = None
        for r in rows:
            if int.from_bytes(r["ip_low"], "big") <= p <= int.from_bytes(r["ip_high"], "big"):
                hit = r
        by_ip[probe] = hit
    # nested /24 wins inside the /16 (geoip tree = per-leaf decomposition)
    assert by_ip["207.171.7.51"]["country_code"] == "GB"
    assert by_ip["207.171.7.51"]["city"] == "London"
    us = by_ip["207.171.8.1"]
    assert (us["country_code"], us["country_code3"], us["country_name"],
            us["continent_code"]) == ("US", "USA", "United States", "NA")
    # REV1 US metro/area combo decodes; lat/lon at 1e-4 precision
    assert (us["metro_code"], us["area_code"]) == (803, 310)
    assert us["latitude"] == pytest.approx(33.9164, abs=1e-9)
    assert us["longitude"] == pytest.approx(-118.4041, abs=1e-9)
    assert by_ip["10.1.2.3"]["country_code"] == "DE"
    assert by_ip["10.65.0.1"]["country_code"] == "FR"  # /10 carved from the /8
    assert by_ip["192.0.2.7"]["country_code"] == "--"
    assert by_ip["8.8.8.8"] is None  # gap → miss


def test_country_edition_round_trip():
    blob = ld.build_dat(
        [("8.8.8.0", 24, dict(country_code="US")),
         ("1.1.1.0", 24, dict(country_code="AU"))],
        ld.COUNTRY_EDITION,
    )
    got = {_v4(r["ip_low"]): r for r in ld.enumerate_dat(blob)}
    assert got["8.8.8.0"]["country_name"] == "United States"
    assert got["1.1.1.0"]["continent_code"] == "OC"


@pytest.mark.skipif(not os.path.exists(REF_V6_DAT), reason="reference fixture absent")
def test_reference_v6_fixture_matches_geoip_test():
    data = open(REF_V6_DAT, "rb").read()
    dbtype, seg = ld.read_structure(data)
    assert dbtype == ld.COUNTRY_EDITION_V6 and seg == ld.COUNTRY_BEGIN
    ip = int(ipaddress.ip_address("2620:0:1003:415:fa1e:73f3:ec68:7709"))
    hit = None
    prev = -1
    for r in ld.enumerate_dat(data):
        lo = int.from_bytes(r["ip_low"], "big")
        hi = int.from_bytes(r["ip_high"], "big")
        assert lo > prev and hi >= lo  # sorted + disjoint over ~900k leaves
        prev = hi
        if lo <= ip <= hi:
            hit = r
    # legacy/geoip_test.go:TestLoadLegacyDataset expectation
    assert (hit["country_code"], hit["country_code3"], hit["country_name"],
            hit["continent_code"]) == ("US", "USA", "United States", "NA")


def test_spark_binaryfile_path_and_projection(spark, tmp_path):
    """The distributed surface: binaryFile scan → mapInPandas parse →
    legacy_geo_projection (FIPS remap + round3)."""
    from annotation_service_spark.plans import legacy as lg
    from annotation_service_spark.sources import dims

    dat = tmp_path / "20170408T080000Z-GeoLiteCity.dat"
    ld.ensure_demo_fixture(str(dat))
    recs = ld.legacy_dat_table(spark, str(dat))
    rows = recs.collect()
    assert len(rows) == len(list(ld.enumerate_dat(dat.read_bytes())))
    assert all(r.path.endswith(".dat") for r in rows)

    fips_csv = tmp_path / "fips.csv"
    fips_csv.write_text(
        "Country ISO Code,Region FIPS Code,Region ISO Code,Region Name\n"
        "US,CA,US-CA,California\n"
        "DE,02,DE-BY,Bavaria\n"
    )
    fips = dims.fips_iso_map(spark, str(fips_csv))
    geo = lg.legacy_geo_projection(recs.drop("path"), fips)
    out = {r.geo.city: r.geo for r in geo.collect()}
    assert out["El Segundo"].subdivision1_iso_code == "US-CA"
    assert out["El Segundo"].latitude == pytest.approx(33.916)
    assert out["Munich"].subdivision1_name == "Bavaria"
    assert out["Paris"].subdivision1_iso_code == ""  # unmapped FIPS → empty


def test_dat_gz_round_trip(spark, tmp_path):
    """The real legacy corpus stores ``.dat.gz`` (loader/loader.go:
    79-110 gunzips before opening): the gzipped fixture must yield the
    exact same ranges as the raw one, detected by magic bytes."""
    import gzip

    dat = tmp_path / "20170408T080000Z-GeoLiteCity.dat"
    ld.ensure_demo_fixture(str(dat))
    gz = tmp_path / "20170408T080000Z-GeoLiteCity.dat.gz"
    gz.write_bytes(gzip.compress(dat.read_bytes()))

    raw_rows = sorted(
        tuple(r)[1:] for r in ld.legacy_dat_table(spark, str(dat)).collect()
    )
    gz_rows = sorted(
        tuple(r)[1:] for r in ld.legacy_dat_table(spark, str(gz)).collect()
    )
    assert gz_rows == raw_rows
    assert len(gz_rows) == len(list(ld.enumerate_dat(dat.read_bytes())))
