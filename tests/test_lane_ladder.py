"""Lane-ladder and tier-routing unit tests.

The multi-tier branch (s_cap >= 64) previously had no CPU coverage — a
warmup-vs-serving ladder mismatch at flagship geometries would only have
surfaced on hardware (round-3 advisor finding).  These tests pin down:
ladder shape, seq_pad membership/minimality, ready-tier routing (the
background-warmup path), and that the warmup layout enumeration covers every
decode step_layout the router can produce.
"""

from nanovllm_tpu.constants import bucket
from nanovllm_tpu.engine.batch import lane_ladder, seq_pad, step_layout
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.sampling_params import SamplingParams


def test_ladder_is_power_of_two_chain():
    for cap in (1, 8, 64, 83, 256, 512):
        lad = lane_ladder(cap)
        assert lad[0] == 8
        assert lad[-1] == bucket(max(cap, 8)) >= cap
        for a, b in zip(lad, lad[1:]):
            assert b == 2 * a


def test_seq_pad_minimal_ladder_member():
    for cap in (8, 64, 83, 256):
        lad = lane_ladder(cap)
        for n in range(1, cap + 1):
            p = seq_pad(n, cap)
            assert p in lad and p >= n
            # minimality: no smaller ladder value holds n
            assert all(v < n for v in lad if v < p)


def test_seq_pad_routes_to_ready_tiers():
    # background warmup starts with only {8, cap} ready
    for n in range(1, 257):
        p = seq_pad(n, 256, tiers={8, 256})
        assert p in (8, 256) and p >= n
    # a mid tier joins as its background compile lands
    assert seq_pad(21, 256, tiers={8, 32, 256}) == 32
    assert seq_pad(33, 256, tiers={8, 32, 256}) == 256
    # tiers=None = unrestricted full ladder
    assert seq_pad(21, 256) == 32


def _decode_seqs(n):
    out = []
    for _ in range(n):
        s = Sequence([1, 2, 3], SamplingParams(temperature=0.5), block_size=16)
        s.num_cached_tokens = 2
        s.num_new_tokens = 1
        s.block_table = [0]
        out.append(s)
    return out


def test_warmup_enumeration_covers_step_layouts():
    """Every decode-step s_pad the router can emit must be a ladder value
    (the warmup enumerates exactly the ladder, eagerly or in background)."""
    for cap in (8, 64, 83, 256):
        lad = lane_ladder(cap)
        for n in {1, 7, 8, 9, cap // 2 + 1, cap} - {0}:
            if n > cap:
                continue
            dec_end, p_start, p_end, s_pad, _ = step_layout(
                _decode_seqs(n), 16, cap
            )
            assert s_pad in lad
            assert dec_end == s_pad and p_start == p_end == s_pad
