"""Pure-Python reader (and fixture writer) for legacy MaxMind GeoIP
``.dat`` binaries — closes S10 without cgo.

The reference opens these via cgo/libgeoip (legacy/geoip.go:88-134)
and looks up one IP at a time. The on-disk layout is public (libGeoIP
sources/docs):

- a binary trie of ``node_count`` nodes; node ``i`` occupies 6 bytes
  at offset ``i*6``: two 3-byte little-endian child values (left for
  bit 0, right for bit 1), walked MSB-first over the 32-bit (v4) or
  128-bit (v6) address;
- a child value ``v < node_count`` is an internal node id; ``v >=
  node_count`` terminates: for COUNTRY editions ``v - COUNTRY_BEGIN``
  is the country id (0 = no data), for CITY editions the record lives
  at file offset ``v + (2*3 - 1) * node_count`` (⇒ data section
  starts right after the trie; ``v == node_count`` = no data);
- a city record: country id byte, region\\0, city\\0, postal\\0,
  3-byte LE latitude then longitude (value/10000 − 180), and for
  REV1 US records a 3-byte LE dma*1000+area combo;
- file tail: ``FF FF FF`` marker + edition type byte (+ 3-byte LE
  node_count for city editions), found by scanning backwards.

Spark design: the batch surface is ``legacy_dat_table`` — one
``binaryFile`` row per snapshot file, DFS-enumerated into (range →
record) rows inside ``mapInPandas``, so a 1000-executor cluster
parses all snapshot files concurrently and everything downstream
(flatten, FIPS remap via plans/legacy.py, range join) is the same
machinery the GeoLite2 path uses. Per-IP tree walking — the
reference's query model — is deliberately replaced by one-shot range
enumeration: 100 TB of probes want a broadcast range join, not 4M
pointer chases per probe.

Validated against the reference's own binary fixture
(legacy/testdata/GeoIPv6.dat, a COUNTRY_EDITION_V6 database) and the
expectations in legacy/geoip_test.go / legacy-dataset_test.go.
"""

from __future__ import annotations

from typing import Iterator

from .geoip_tables import (
    COUNTRY_CODE3,
    COUNTRY_CONTINENTS,
    COUNTRY_NAMES,
    GEOIP_COUNTRY_CODES,
)

COUNTRY_BEGIN = 16776960
RECORD_LENGTH = 3
STRUCTURE_INFO_MAX_SIZE = 20

COUNTRY_EDITION = 1
CITY_EDITION_REV1 = 2
CITY_EDITION_REV0 = 6
COUNTRY_EDITION_V6 = 12
CITY_EDITION_REV1_V6 = 30
CITY_EDITION_REV0_V6 = 31

_CITY_TYPES = {CITY_EDITION_REV0, CITY_EDITION_REV1,
               CITY_EDITION_REV0_V6, CITY_EDITION_REV1_V6}
_V6_TYPES = {COUNTRY_EDITION_V6, CITY_EDITION_REV0_V6, CITY_EDITION_REV1_V6}
_REV1_TYPES = {CITY_EDITION_REV1, CITY_EDITION_REV1_V6}

V4_MAPPED_PREFIX = b"\x00" * 10 + b"\xff\xff"


def _le3(b: bytes, off: int) -> int:
    return b[off] | (b[off + 1] << 8) | (b[off + 2] << 16)


def _enc3(v: int) -> bytes:
    return bytes([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF])


def read_structure(data: bytes) -> tuple[int, int]:
    """Scan the tail for the FF FF FF structure marker (libGeoIP
    _setup_segments walk: positions end-3, end-4, …). Returns
    (edition_type, node_count)."""
    pos = len(data) - 3
    for _ in range(STRUCTURE_INFO_MAX_SIZE):
        if pos < 0:
            break
        if data[pos : pos + 3] == b"\xff\xff\xff":
            dbtype = data[pos + 3]
            if dbtype >= 106:  # v1.4 compatibility delta
                dbtype -= 105
            if dbtype in _CITY_TYPES:
                return dbtype, _le3(data, pos + 4)
            return dbtype, COUNTRY_BEGIN
        pos -= 1
    return COUNTRY_EDITION, COUNTRY_BEGIN  # pre-1.4 default


def _read_cstr(data: bytes, off: int) -> tuple[str, int]:
    end = data.index(b"\x00", off)
    return data[off:end].decode("utf-8", errors="replace"), end + 1


def _read_city_record(data: bytes, off: int, rev1: bool) -> dict:
    cid = data[off]
    off += 1
    region, off = _read_cstr(data, off)
    city, off = _read_cstr(data, off)
    postal, off = _read_cstr(data, off)
    lat = _le3(data, off) / 10000.0 - 180.0
    off += 3
    lon = _le3(data, off) / 10000.0 - 180.0
    off += 3
    cc = GEOIP_COUNTRY_CODES[cid] if cid < len(GEOIP_COUNTRY_CODES) else ""
    metro = area = 0
    if rev1 and cc == "US":
        combo = _le3(data, off)
        metro, area = combo // 1000, combo % 1000
    return {
        "country_code": cc,
        "country_code3": COUNTRY_CODE3.get(cc, ""),
        "country_name": COUNTRY_NAMES.get(cc, ""),
        "continent_code": COUNTRY_CONTINENTS.get(cc, ""),
        "region": region,
        "city": city,
        "postal_code": postal,
        "latitude": lat,
        "longitude": lon,
        "metro_code": metro,
        "area_code": area,
    }


def _country_record(cid: int) -> dict:
    cc = GEOIP_COUNTRY_CODES[cid] if cid < len(GEOIP_COUNTRY_CODES) else ""
    return {
        "country_code": cc,
        "country_code3": COUNTRY_CODE3.get(cc, ""),
        "country_name": COUNTRY_NAMES.get(cc, ""),
        "continent_code": COUNTRY_CONTINENTS.get(cc, ""),
        "region": "", "city": "", "postal_code": "",
        "latitude": 0.0, "longitude": 0.0, "metro_code": 0, "area_code": 0,
    }


def enumerate_dat(data: bytes) -> Iterator[dict]:
    """DFS over the trie → one row per leaf network, in ascending
    address order. ``ip_low``/``ip_high`` are canonical 16-byte
    values (v4 as ::ffff:a.b.c.d), matching the engine's J7 single
    sorted-table convention (functions/ip.py)."""
    dbtype, node_count = read_structure(data)
    bits = 128 if dbtype in _V6_TYPES else 32
    is_city = dbtype in _CITY_TYPES
    rev1 = dbtype in _REV1_TYPES
    rec_cache: dict[int, dict] = {}
    # stack of (value, depth, prefix) where value may be an internal
    # node id OR a terminal; bit-0 child pushed last so it pops first
    # → leaves emit in ascending address order
    stack: list[tuple[int, int, int]] = [(0, 0, 0)]
    while stack:
        v, depth, prefix = stack.pop()
        if v < node_count:  # internal node
            if depth >= bits:
                continue  # malformed: deeper than the address width
            base = v * 2 * RECORD_LENGTH
            stack.append((_le3(data, base + RECORD_LENGTH), depth + 1, (prefix << 1) | 1))
            stack.append((_le3(data, base), depth + 1, prefix << 1))
            continue
        if is_city:
            if v == node_count:
                continue  # no data
            off = v + (2 * RECORD_LENGTH - 1) * node_count
            rec = rec_cache.get(off)
            if rec is None:
                rec = rec_cache.setdefault(off, _read_city_record(data, off, rev1))
        else:
            cid = v - COUNTRY_BEGIN
            if cid <= 0:
                continue  # no data
            rec = rec_cache.get(cid)
            if rec is None:
                rec = rec_cache.setdefault(cid, _country_record(cid))
        span = bits - depth
        low = prefix << span
        high = low + (1 << span) - 1
        if bits == 32:
            low_b = V4_MAPPED_PREFIX + low.to_bytes(4, "big")
            high_b = V4_MAPPED_PREFIX + high.to_bytes(4, "big")
        else:
            low_b = low.to_bytes(16, "big")
            high_b = high.to_bytes(16, "big")
        yield {"ip_low": low_b, "ip_high": high_b, **rec}


LEGACY_DAT_SCHEMA = (
    "path string, ip_low binary, ip_high binary, continent_code string,"
    " country_code string, country_code3 string, country_name string,"
    " region string, metro_code long, city string, area_code long,"
    " postal_code string, latitude double, longitude double"
)


def legacy_dat_table(spark, path):
    """S10 batch surface: ``binaryFile`` scan of .dat snapshots →
    (path, range, record) rows. One Arrow batch per file; files parse
    in parallel across executors. Gzipped snapshots (``.dat.gz``, how
    the real legacy corpus is stored — loader/loader.go:79-110 gunzips
    before opening) are detected by magic bytes and decompressed
    in-task. Feed the result to
    ``plans.legacy.legacy_geo_projection`` for the FIPS remap and
    GeolocationIP shaping."""
    import gzip

    import pandas as pd

    cols = [f.split()[0] for f in LEGACY_DAT_SCHEMA.split(",")]

    def parse(it):
        for pdf in it:
            for path_str, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                if raw[:2] == b"\x1f\x8b":  # gzip magic
                    raw = gzip.decompress(raw)
                rows = list(enumerate_dat(raw))
                out = pd.DataFrame(rows, columns=[c for c in cols if c != "path"])
                out.insert(0, "path", path_str)
                yield out[cols]

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(parse, LEGACY_DAT_SCHEMA)
    )


# ---------------------------------------------------------------------------
# Fixture writer (tests / gate oracle determinism)
# ---------------------------------------------------------------------------


class _TrieNode:
    __slots__ = ("children",)

    def __init__(self):
        self.children: list = [None, None]  # None | _TrieNode | ("leaf", key)


def build_dat(
    networks: list[tuple[str, int, dict]],
    dbtype: int = CITY_EDITION_REV1,
) -> bytes:
    """Serialize (dotted_v4, prefix_len, record) networks into a
    city/country-edition .dat fixture the reader (and libgeoip)
    accepts. Records sharing identical field values share one data
    record, as real files do. v4 only (fixtures)."""
    is_city = dbtype in _CITY_TYPES
    rev1 = dbtype in _REV1_TYPES
    root = _TrieNode()
    for dotted, plen, rec in networks:
        addr = 0
        for part in dotted.split("."):
            addr = (addr << 8) | int(part)
        node = root
        for d in range(plen):
            bit = (addr >> (31 - d)) & 1
            if d == plen - 1:
                # later networks win on overlap (replaces leaf OR subtree)
                node.children[bit] = ("leaf", _rec_key(rec))
            else:
                nxt = node.children[bit]
                if isinstance(nxt, _TrieNode):
                    node = nxt
                else:
                    new = _TrieNode()
                    if isinstance(nxt, tuple):
                        # descending through an existing broader leaf:
                        # split it so the uncovered half keeps its record
                        new.children = [nxt, nxt]
                    node.children[bit] = new
                    node = new

    # assign node ids (preorder) and record deltas
    nodes: list[_TrieNode] = []

    def collect(n: _TrieNode):
        nodes.append(n)
        for ch in n.children:
            if isinstance(ch, _TrieNode):
                collect(ch)

    collect(root)
    ids = {id(n): i for i, n in enumerate(nodes)}
    node_count = len(nodes)

    data_section = bytearray(b"\x00")  # delta 0 reserved = "no data"
    deltas: dict[tuple, int] = {}
    recs_by_key = {
        _rec_key(rec): rec for _, _, rec in networks
    }
    if is_city:
        for key, rec in recs_by_key.items():
            deltas[key] = len(data_section)
            data_section += _encode_city_record(rec, rev1)

    def child_value(ch) -> int:
        if isinstance(ch, _TrieNode):
            return ids[id(ch)]
        if ch is None:
            return node_count if is_city else COUNTRY_BEGIN
        _, key = ch
        if is_city:
            return node_count + deltas[key]
        cid = GEOIP_COUNTRY_CODES.index(recs_by_key[key]["country_code"])
        return COUNTRY_BEGIN + cid

    tree = bytearray()
    for n in nodes:
        tree += _enc3(child_value(n.children[0]))
        tree += _enc3(child_value(n.children[1]))

    tail = b"\xff\xff\xff" + bytes([dbtype])
    if is_city:
        tail += _enc3(node_count)
    return bytes(tree + data_section + tail)


def _rec_key(rec: dict) -> tuple:
    return tuple(sorted(rec.items()))


def demo_fixture_networks() -> list[tuple[str, int, dict]]:
    """Deterministic city-edition fixture modeled on the scenarios in
    legacy/geoip_test.go + legacy-dataset_test.go: a US /16 with
    metro/area (the REV1 US combo), a nested non-US /24 inside it,
    a large /8, FIPS-remappable region codes (US/CA → US-CA,
    DE/02 → DE-BY), and an empty-fields record."""
    return [
        ("207.171.0.0", 16, dict(country_code="US", region="CA",
                                 city="El Segundo", postal_code="90245",
                                 latitude=33.9164, longitude=-118.4041,
                                 metro_code=803, area_code=310)),
        ("207.171.7.0", 24, dict(country_code="GB", region="", city="London",
                                 postal_code="SW1", latitude=51.5085,
                                 longitude=-0.1257, metro_code=0, area_code=0)),
        ("10.0.0.0", 8, dict(country_code="DE", region="02", city="Munich",
                             postal_code="", latitude=48.1374,
                             longitude=11.5755, metro_code=0, area_code=0)),
        ("10.64.0.0", 10, dict(country_code="FR", region="A8", city="Paris",
                               postal_code="75001", latitude=48.8534,
                               longitude=2.3488, metro_code=0, area_code=0)),
        ("192.0.2.0", 24, dict(country_code="--", region="", city="",
                               postal_code="", latitude=0.0, longitude=0.0,
                               metro_code=0, area_code=0)),
    ]


def ensure_demo_fixture(path: str) -> str:
    """Write the deterministic demo .dat to ``path`` if absent (the
    bytes are a pure function of ``demo_fixture_networks``)."""
    import os

    blob = build_dat(demo_fixture_networks(), CITY_EDITION_REV1)
    if not (os.path.exists(path) and open(path, "rb").read() == blob):
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    return path


def _encode_city_record(rec: dict, rev1: bool) -> bytes:
    out = bytearray()
    out.append(GEOIP_COUNTRY_CODES.index(rec["country_code"]))
    for f in ("region", "city", "postal_code"):
        out += rec.get(f, "").encode("utf-8") + b"\x00"
    for f in ("latitude", "longitude"):
        out += _enc3(int(round((rec.get(f, 0.0) + 180.0) * 10000)))
    if rev1 and rec["country_code"] == "US":
        out += _enc3(rec.get("metro_code", 0) * 1000 + rec.get("area_code", 0))
    return bytes(out)
