"""Property-based IP library invariants (hypothesis)."""

from __future__ import annotations

import ipaddress

from hypothesis import given, settings, strategies as st

from annotation_service_spark.functions import ip as ipf


@given(st.binary(min_size=16, max_size=16))
@settings(max_examples=300, deadline=None)
def test_bytes_roundtrip(b):
    """bytes16 → text → bytes16 is identity (v4-mapped forms
    normalize to dotted quads and back)."""
    text = ipf.py_bytes16_to_ip(b)
    assert text is not None
    back = ipf.py_ip_to_bytes16(text)
    assert back == b


@given(st.integers(min_value=0, max_value=2**32 - 1), st.integers(min_value=0, max_value=32))
@settings(max_examples=200, deadline=None)
def test_v4_cidr_range_containment(addr, prefix):
    """rangeCIDR invariants: low == the literal address; the span
    covers exactly the masked block's suffix from that address."""
    text = str(ipaddress.IPv4Address(addr)) + f"/{prefix}"
    lo, hi = ipf.py_cidr_to_range(text)
    lo_i = int.from_bytes(lo[12:], "big")
    hi_i = int.from_bytes(hi[12:], "big")
    assert lo_i == addr  # literal-low semantics
    host = 32 - prefix
    assert hi_i == addr | ((1 << host) - 1)
    assert lo_i <= hi_i


@given(st.integers(min_value=0, max_value=2**128 - 2))
@settings(max_examples=200, deadline=None)
def test_plus_minus_one_inverse(v):
    b = v.to_bytes(16, "big")
    assert ipf.py_minus_one(ipf.py_plus_one(b)) == b
    if v > 0:
        assert ipf.py_plus_one(ipf.py_minus_one(b)) == b


@given(st.integers(min_value=0, max_value=2**32 - 1), st.integers(min_value=0, max_value=32))
@settings(max_examples=200, deadline=None)
def test_cidr_roundtrip_aligned(addr, prefix):
    """For ALIGNED blocks, range→CIDR inverts CIDR→range."""
    base = addr & ~((1 << (32 - prefix)) - 1) if prefix else 0
    text = str(ipaddress.IPv4Address(base)) + f"/{prefix}"
    lo, hi = ipf.py_cidr_to_range(text)
    assert ipf.py_range_to_cidr(lo, hi) == text
