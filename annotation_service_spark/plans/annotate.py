"""The annotate query lifecycle (SURVEY.md §3) as one DataFrame plan.

Reference flow (handler/handler.go:194-243, manager/manager.go:49-57,
geolite2v2/geo-ip.go:99-176, asn/asn-annotator.go:29-92):

    requests(date, ip)
      → parse/validate (P3) → 6to4 rewrite (P4)
      → as-of snapshot selection (J2)
      → geo range join (J1) → location dim join (J3 tail)
      → asn range join (J1) → AS decode (P8/P9) → AS-name join (J4)
      → GeolocationIP/ASData struct projection (P13)
      → Missing backfill (P15)
      → JSON shaping (S11/P17)

Family routing (J7) is implicit: the canonical 16-byte v4-mapped
representation makes v4 and v6 ranges disjoint in one sorted table,
so a single binary search replaces the reference's per-family lists
(manager/manager.go:213-226 becomes a representation choice).

Scale notes: the probe side (the 100 TB stream) flows through ONE
mapInPandas (broadcast binary search, possibly keyed by snapshot) and
TWO broadcast hash joins (locations, asnames). No probe-side shuffle
anywhere. Snapshot tables are partitioned by ``dataset_date``;
partition pruning keeps a narrow-date query from touching history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import ip as ipf
from ..operators.asof import asof_join
from ..operators.interval import range_join_broadcast

GEO_PAYLOAD = ["gid", "postal_code", "latitude", "longitude"]

# the v4-mapped /96: canonical home of every v4 address (J7)
_V4_SPAN_LOW = b"\x00" * 10 + b"\xff\xff" + b"\x00" * 4
_V4_SPAN_HIGH = b"\x00" * 10 + b"\xff\xff" + b"\xff" * 4
_V4_SPAN_BELOW = b"\x00" * 10 + b"\xff\xfe" + b"\xff" * 4  # _V4_SPAN_LOW − 1
_V4_SPAN_ABOVE = b"\x00" * 9 + b"\x01" + b"\x00" * 6  # _V4_SPAN_HIGH + 1 (= 2^48)


def family_union(
    v4_mapped: DataFrame, v6: DataFrame, low: str = "ip_low", high: str = "ip_high"
) -> DataFrame:
    """J7 with the reference's FAMILY ROUTING made explicit: the
    reference keeps separate v4/v6 lists and a v4 probe can never
    match a v6 row (manager/manager.go:213-226). In the single
    sorted-table design a v6 row covering the v4-mapped /96 would
    shadow that rule, so v6 rows are CLIPPED around the /96 (split
    into the pieces below/above) before the union. Real GeoLite2 v6
    data never covers ::ffff:0:0/96 — the clip is a no-op there; it
    exists so synthetic/adversarial inputs (e.g. the full-range v6
    node in handler/handler_test.go:49-126) behave identically."""
    lo, hi = F.col(low), F.col(high)
    below = F.when(
        lo < F.lit(_V4_SPAN_LOW),
        F.struct(lo.alias(low), F.least(hi, F.lit(_V4_SPAN_BELOW)).alias(high)),
    )
    above = F.when(
        hi > F.lit(_V4_SPAN_HIGH),
        F.struct(F.greatest(lo, F.lit(_V4_SPAN_ABOVE)).alias(low), hi.alias(high)),
    )
    others = [c for c in v6.columns if c not in (low, high)]
    clipped = (
        v6.select(F.explode(F.array_compact(F.array(below, above))).alias("__r"), *others)
        .select(F.col(f"__r.{low}").alias(low), F.col(f"__r.{high}").alias(high), *others)
    )
    return clipped.unionByName(v4_mapped.select(low, high, *others)).orderBy(low)


def prepare_probes(requests: DataFrame, ip_col: str = "ip") -> DataFrame:
    """P3 + P4: parse to canonical bytes, rewrite 6to4. Invalid IPs
    keep NULL bytes (they fall out as Missing, like the reference's
    per-IP error suppression, handler/handler.go:216-229)."""
    return requests.withColumn("__ipb", ipf.ip_to_bytes(F.col(ip_col))).withColumn(
        "__eff", ipf.ip6to4(F.col("__ipb"))
    )


def geolocation_struct(locations_joined: DataFrame) -> Column:
    """P13 (geolite2v2/geo-ip.go:99-125): assemble GeolocationIP.
    CountryCode3 is always empty and AreaCode 0 for GeoLite2, as in
    the reference."""
    hit = F.col("gid").isNotNull()
    return F.when(
        hit,
        F.struct(
            F.coalesce("continent_code", F.lit("")).alias("continent_code"),
            F.coalesce("country_code", F.lit("")).alias("country_code"),
            F.lit("").alias("country_code3"),
            F.coalesce("country_name", F.lit("")).alias("country_name"),
            F.coalesce("subdivision_1_iso_code", F.lit("")).alias("region"),
            F.coalesce("subdivision_1_iso_code", F.lit("")).alias("subdivision1_iso_code"),
            F.coalesce("subdivision_1_name", F.lit("")).alias("subdivision1_name"),
            F.coalesce("subdivision_2_iso_code", F.lit("")).alias("subdivision2_iso_code"),
            F.coalesce("subdivision_2_name", F.lit("")).alias("subdivision2_name"),
            F.coalesce("metro_code", F.lit(0)).alias("metro_code"),
            F.coalesce("city_name", F.lit("")).alias("city"),
            F.lit(0).cast("long").alias("area_code"),
            F.coalesce("postal_code", F.lit("")).alias("postal_code"),
            F.coalesce("latitude", F.lit(0.0)).alias("latitude"),
            F.coalesce("longitude", F.lit(0.0)).alias("longitude"),
            F.coalesce("accuracy_radius_km", F.lit(0)).alias("radius"),
            F.lit(False).alias("missing"),
        ),
    ).otherwise(
        # P15 missing backfill (handler/handler.go:66-76)
        F.struct(
            F.lit("").alias("continent_code"),
            F.lit("").alias("country_code"),
            F.lit("").alias("country_code3"),
            F.lit("").alias("country_name"),
            F.lit("").alias("region"),
            F.lit("").alias("subdivision1_iso_code"),
            F.lit("").alias("subdivision1_name"),
            F.lit("").alias("subdivision2_iso_code"),
            F.lit("").alias("subdivision2_name"),
            F.lit(0).cast("long").alias("metro_code"),
            F.lit("").alias("city"),
            F.lit(0).cast("long").alias("area_code"),
            F.lit("").alias("postal_code"),
            F.lit(0.0).alias("latitude"),
            F.lit(0.0).alias("longitude"),
            F.lit(0).cast("long").alias("radius"),
            F.lit(True).alias("missing"),
        )
    )


def asdata_struct() -> Column:
    """ASData assembly (asn/asn-annotator.go:61-90): decode the AS
    string (P8), BestASN (P9), CIDR from the flattened range (P2 at
    build time → ``cidr`` column), Missing backfill (P15)."""
    hit = F.col("as_string").isNotNull()
    systems = ipf.asn_decode(F.col("as_string"))
    return F.when(
        hit,
        F.struct(
            F.lit("").alias("ip_prefix"),
            F.coalesce("cidr", F.lit("")).alias("cidr"),
            ipf.best_asn(systems).alias("as_number"),
            F.coalesce("as_name", F.lit("")).alias("as_name"),
            F.lit(False).alias("missing"),
            systems.alias("systems"),
        ),
    ).otherwise(
        F.struct(
            F.lit("").alias("ip_prefix"),
            F.lit("").alias("cidr"),
            F.lit(None).cast("long").alias("as_number"),
            F.lit("").alias("as_name"),
            F.lit(True).alias("missing"),
            F.lit(None).cast(ipf.ASN_SYSTEM_TYPE).alias("systems"),
        )
    )


def annotate(
    requests: DataFrame,
    geo_ranges: DataFrame,
    locations: DataFrame,
    asn_ranges: DataFrame,
    asnames: DataFrame,
    ip_col: str = "ip",
    date_col: str | None = None,
    registry: DataFrame | None = None,
) -> DataFrame:
    """Full composite annotate (J9): every request row gains ``geo``
    and ``network`` structs.

    When ``date_col`` + ``registry`` are given, an as-of join selects
    the snapshot per request and the range joins are keyed by
    ``dataset_date`` (J2∘J1); otherwise the single-snapshot tables
    are used directly.
    """
    probes = prepare_probes(requests, ip_col)
    keys: list[str] = []
    if date_col is not None and registry is not None:
        probes = asof_join(probes, registry, probe_date=date_col)
        keys = ["dataset_date"]

    geo_hit = range_join_broadcast(
        probes,
        geo_ranges,
        probe_col="__eff",
        payload=GEO_PAYLOAD,
        how="left",
        keys=keys,
    )
    loc_dim = locations
    with_loc = geo_hit.join(
        F.broadcast(loc_dim), on=geo_hit["gid"] == loc_dim["geoname_id"], how="left"
    ).drop("geoname_id")

    asn_hit = range_join_broadcast(
        with_loc.withColumn("geo", geolocation_struct(with_loc)).drop(
            *GEO_PAYLOAD,
            "continent_code",
            "country_code",
            "country_name",
            "subdivision_1_iso_code",
            "subdivision_1_name",
            "subdivision_2_iso_code",
            "subdivision_2_name",
            "city_name",
            "metro_code",
            "accuracy_radius_km",
        ),
        asn_ranges,
        probe_col="__eff",
        payload=["as_string", "cidr"],
        how="left",
        keys=keys,
    )
    systems = ipf.asn_decode(F.col("as_string"))
    with_asname = asn_hit.withColumn(
        "__best", ipf.best_asn(systems)
    ).join(
        F.broadcast(asnames.select("asn", "as_name")),
        on=F.col("__best") == F.col("asn"),
        how="left",
    )
    out = with_asname.withColumn("network", asdata_struct()).drop(
        "as_string", "cidr", "as_name", "asn", "__best", "__ipb", "__eff"
    )
    return out


def to_v2_response(annotated: DataFrame, ip_col: str = "ip") -> DataFrame:
    """S11: one JSON document per request row (v2 response is a map
    ip→Annotations; row-per-ip is the distributed shape, `to_json`
    at the edge — api/v2/api-v2.go:49-55)."""
    return annotated.select(
        F.col(ip_col),
        F.to_json(F.struct("geo", "network")).alias("annotations_json"),
    )


def to_v2_response_document(
    annotated: DataFrame,
    ip_col: str = "ip",
    batch_col: str | None = None,
    annotator_date_col: str | None = "dataset_date",
) -> DataFrame:
    """S11, full v2 shape (api/v2/api-v2.go:49-55): ONE JSON document
    per batch — ``{AnnotatorDate, Annotations: {ip: {Geo, Network}}}``.
    Row-per-ip (``to_v2_response``) is the distributed-native shape;
    this document form is the wire-parity edge for serving, built with
    map_from_entries + to_json (no driver-side assembly).

    ``batch_col`` groups rows into response documents (None = one
    document for the whole DataFrame); AnnotatorDate = the min
    snapshot date used, mirroring CompositeAnnotator's earliest-date
    rule (directory/directory.go:76-85)."""
    gcols = [batch_col] if batch_col else []
    entries = F.map_from_entries(
        F.collect_list(F.struct(F.col(ip_col), F.struct("geo", "network")))
    )
    date_agg = (
        F.min(annotator_date_col)
        if annotator_date_col and annotator_date_col in annotated.columns
        else F.lit(None).cast("date")
    )
    doc = annotated.groupBy(*gcols).agg(
        date_agg.alias("annotator_date"), entries.alias("annotations")
    )
    return doc.select(
        *gcols,
        F.to_json(
            F.struct(
                F.col("annotator_date").alias("AnnotatorDate"),
                F.col("annotations").alias("Annotations"),
            )
        ).alias("response_json"),
    )


def to_v1_response_keys(
    annotated: DataFrame, ip_col: str = "ip", ts_col: str = "ts"
) -> DataFrame:
    """P17: legacy v1 response keyed ip+base36(epoch)
    (handler/handler.go:142-174)."""
    return annotated.withColumn(
        "response_key",
        ipf.base36_key(F.col(ip_col), F.unix_timestamp(F.col(ts_col))),
    )
