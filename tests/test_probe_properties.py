"""Property tests for the multi-probe band-key scheme (pure bit
math — no Spark session), pinning the guarantees the operators'
docstrings claim:

1. Pigeonhole: any two 60-bit fingerprints within hamming ≤
   bands·(probe+1)−1 = 7 MUST collide on some probed band key.
2. Tightness: at hamming = bands·(probe+1) = 8 the guarantee (not
   just the average case) genuinely fails — there exist pairs no
   probed band catches — so 7 is the exact guaranteed radius.
3. Probe-set symmetry: b is within hamming ≤ 1 of a's band key iff
   a is within hamming ≤ 1 of b's — probing one side of a self-join
   loses nothing.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

BITS, BANDS, BPB = 60, 4, 15
MASK = (1 << BPB) - 1


def band_keys(sig: int) -> list[int]:
    return [(sig >> ((BANDS - 1 - b) * BPB)) & MASK for b in range(BANDS)]


def probes(key: int) -> set[int]:
    return {key} | {key ^ (1 << j) for j in range(BPB)}


def collide(a: int, b: int) -> bool:
    ka, kb = band_keys(a), band_keys(b)
    return any(kb[i] in probes(ka[i]) for i in range(BANDS))


@settings(max_examples=300, deadline=None)
@given(
    sig=st.integers(min_value=0, max_value=(1 << BITS) - 1),
    flips=st.lists(
        st.integers(min_value=0, max_value=BITS - 1),
        min_size=0,
        max_size=7,
        unique=True,
    ),
)
def test_pigeonhole_radius_guaranteed(sig, flips):
    other = sig
    for j in flips:
        other ^= 1 << j
    assert collide(sig, other), (hex(sig), flips)


def test_radius_eight_not_guaranteed():
    # two flipped bits in EVERY band → no band within hamming 1
    sig = 0
    other = 0
    for b in range(BANDS):
        other |= 0b11 << (b * BPB)  # 2 flips inside each 15-bit band
    assert bin(sig ^ other).count("1") == 2 * BANDS == 8
    assert not collide(sig, other)


@settings(max_examples=200, deadline=None)
@given(
    a=st.integers(min_value=0, max_value=MASK),
    b=st.integers(min_value=0, max_value=MASK),
)
def test_probe_symmetry(a, b):
    assert (b in probes(a)) == (a in probes(b))


@settings(max_examples=200, deadline=None)
@given(sig=st.integers(min_value=0, max_value=(1 << BITS) - 1))
def test_band_keys_partition_the_signature(sig):
    # reassembling the band keys reproduces the signature exactly —
    # the shift/mask extraction loses no bits and overlaps none
    back = 0
    for i, k in enumerate(band_keys(sig)):
        back |= k << ((BANDS - 1 - i) * BPB)
    assert back == sig
