"""Pallas-kernel vs jnp-reference equivalence tests (interpret mode on CPU).

Covers the ragged paged attention kernel (decode q_tile=1, prefill tiles,
mixed segments, GQA grouping, ragged kv lengths, page-table indirection) and
the KV-write scatter's -1-slot drop semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nanovllm_tpu.ops.attention import (
    PREFILL_TILE,
    paged_attention,
    ragged_paged_attention_ref,
)
from nanovllm_tpu.ops.kv_cache import split_kv_pages, write_kv_pages
from nanovllm_tpu.ops.ragged_paged_attention import ragged_paged_attention_pallas

PAGE = 16


def rand_cache(rng, num_pages, kvh, hd, layers=3):
    # flat 3D split-plane cache: [2 * layers * num_pages, page, kvh * hd]
    # (logical page gp: K plane 2*gp, V plane 2*gp + 1; head h = lane
    # window [h*hd, (h+1)*hd))
    return jnp.asarray(
        rng.standard_normal((2 * layers * num_pages, PAGE, kvh * hd), dtype=np.float32)
    )

LAYER = 1   # attention reads layer 1 of a 3-layer cache (indexing exercised)
PPL = 32    # pages per layer in all cases below


def build_case(rng, kv_lens_list, q_lens_list, nh, kvh, hd, num_pages=32):
    """Random case: per-seq kv lens + query lens; returns everything both
    impls need.  Block tables use distinct shuffled pages (indirection test)."""
    s = len(kv_lens_list)
    max_pages = max((k + PAGE - 1) // PAGE for k in kv_lens_list)
    perm = rng.permutation(num_pages)
    page_indices = np.zeros((s, max_pages), np.int32)
    pi = 0
    for i, klen in enumerate(kv_lens_list):
        n = (klen + PAGE - 1) // PAGE
        page_indices[i, :n] = perm[pi:pi + n]
        pi += n
    kv_pages = rand_cache(rng, num_pages, kvh, hd)
    # token rows: one row per query token, seq-major
    t = sum(q_lens_list)
    q = jnp.asarray(rng.standard_normal((t, nh, hd), dtype=np.float32))
    token_seq = np.concatenate(
        [np.full(ql, i, np.int32) for i, ql in enumerate(q_lens_list)]
    )
    positions = np.concatenate(
        [np.arange(k - ql, k, dtype=np.int32)
         for k, ql in zip(kv_lens_list, q_lens_list)]
    )
    return (
        q,
        kv_pages,
        jnp.asarray(kv_lens_list, jnp.int32),
        jnp.asarray(page_indices),
        jnp.asarray(token_seq),
        jnp.asarray(positions),
    )


def run_both_decode(case, sm_scale=0.25):
    q, kv_pages, kv_lens, page_indices, token_seq, positions = case
    ours = ragged_paged_attention_pallas(
        q, kv_pages, LAYER, PPL, kv_lens, page_indices, token_seq, positions,
        sm_scale=sm_scale, q_tile=1, interpret=True,
    )
    ref = ragged_paged_attention_ref(
        q, kv_pages, LAYER, PPL, page_indices, token_seq, positions, sm_scale=sm_scale
    )
    return np.asarray(ours), np.asarray(ref)


class TestDecodeKernel:
    def test_single_seq_single_page(self):
        rng = np.random.default_rng(0)
        case = build_case(rng, [7], [1], nh=4, kvh=2, hd=32)
        ours, ref = run_both_decode(case)
        np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)

    def test_many_seqs_ragged_ctx(self):
        rng = np.random.default_rng(1)
        kv = [1, 5, 16, 17, 33, 48, 40, 9]
        case = build_case(rng, kv, [1] * len(kv), nh=8, kvh=4, hd=32)
        ours, ref = run_both_decode(case)
        np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)

    def test_mha_group1(self):
        rng = np.random.default_rng(2)
        case = build_case(rng, [20, 31], [1, 1], nh=4, kvh=4, hd=16)
        ours, ref = run_both_decode(case)
        np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


class TestPrefillKernel:
    def test_full_prefill_causal(self):
        rng = np.random.default_rng(3)
        ql = 40  # spans 3 tiles of 16? PREFILL_TILE=128 -> pad inside one tile
        case = build_case(rng, [ql], [ql], nh=4, kvh=2, hd=32)
        q, kv_pages, kv_lens, page_indices, token_seq, positions = case
        # pad rows up to the tile boundary
        t_pad = ((ql + PREFILL_TILE - 1) // PREFILL_TILE) * PREFILL_TILE
        qp = jnp.zeros((t_pad,) + q.shape[1:], q.dtype).at[:ql].set(q)
        ts = jnp.zeros(t_pad, jnp.int32).at[:ql].set(token_seq)
        pos = jnp.zeros(t_pad, jnp.int32).at[:ql].set(positions)
        ours = ragged_paged_attention_pallas(
            qp, kv_pages, LAYER, PPL, kv_lens, page_indices,
            ts[::PREFILL_TILE], pos[::PREFILL_TILE],
            sm_scale=0.25, q_tile=PREFILL_TILE, interpret=True,
        )
        ref = ragged_paged_attention_ref(
            q, kv_pages, LAYER, PPL, page_indices, token_seq, positions, sm_scale=0.25
        )
        np.testing.assert_allclose(np.asarray(ours)[:ql], np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_chunked_prefill_with_cached_prefix(self):
        """Queries attend a longer kv context (prior chunks already cached)."""
        rng = np.random.default_rng(4)
        kv_len, q_len = 50, 10  # positions 40..49
        case = build_case(rng, [kv_len], [q_len], nh=4, kvh=2, hd=32)
        q, kv_pages, kv_lens, page_indices, token_seq, positions = case
        t_pad = PREFILL_TILE
        qp = jnp.zeros((t_pad,) + q.shape[1:], q.dtype).at[:q_len].set(q)
        ts = jnp.zeros(t_pad, jnp.int32).at[:q_len].set(token_seq)
        pos = jnp.zeros(t_pad, jnp.int32).at[:q_len].set(positions)
        ours = ragged_paged_attention_pallas(
            qp, kv_pages, LAYER, PPL, kv_lens, page_indices,
            ts[::PREFILL_TILE], pos[::PREFILL_TILE],
            sm_scale=0.25, q_tile=PREFILL_TILE, interpret=True,
        )
        ref = ragged_paged_attention_ref(
            q, kv_pages, LAYER, PPL, page_indices, token_seq, positions, sm_scale=0.25
        )
        np.testing.assert_allclose(np.asarray(ours)[:q_len], np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


class TestSegmentedDispatch:
    def test_mixed_decode_plus_prefill(self):
        """Full paged_attention dispatch over a segmented layout must match
        the ref backend row-for-row on real rows."""
        rng = np.random.default_rng(5)
        # 3 decodes + one 20-token prefill chunk
        kv_lens_list = [9, 17, 30, 20]
        q_lens_list = [1, 1, 1, 20]
        case = build_case(rng, kv_lens_list, q_lens_list, nh=4, kvh=2, hd=32)
        q, kv_pages, kv_lens, page_indices, token_seq, positions = case

        dec_end, p_start = 3, PREFILL_TILE
        p_end = p_start + PREFILL_TILE
        t_pad = p_end
        qp = jnp.zeros((t_pad,) + q.shape[1:], q.dtype)
        qp = qp.at[:3].set(q[:3]).at[p_start:p_start + 20].set(q[3:])
        ts = jnp.zeros(t_pad, jnp.int32)
        ts = ts.at[:3].set(token_seq[:3]).at[p_start:p_end].set(3)
        pos = jnp.zeros(t_pad, jnp.int32)
        pos = pos.at[:3].set(positions[:3]).at[p_start:p_start + 20].set(positions[3:])

        ours = paged_attention(
            qp, kv_pages, LAYER, PPL, kv_lens, page_indices, ts, pos,
            (dec_end, p_start, p_end), sm_scale=0.25, impl="pallas",
        )
        ref = ragged_paged_attention_ref(
            q, kv_pages, LAYER, PPL, page_indices, token_seq, positions, sm_scale=0.25
        )
        ours = np.asarray(ours)
        np.testing.assert_allclose(ours[:3], np.asarray(ref)[:3], rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(
            ours[p_start:p_start + 20], np.asarray(ref)[3:], rtol=2e-5, atol=2e-5
        )
        # gap rows untouched (zeros)
        assert np.all(ours[3:p_start] == 0)


class TestKVWrite:
    def test_scatter_and_drop(self):
        kvh, hd = 2, 8
        ppl = 4  # 2 layers x 4 pages, flat split planes
        pages = jnp.zeros((2 * 2 * ppl, PAGE, kvh * hd), jnp.float32)
        k = jnp.ones((3, kvh, hd)) * jnp.asarray([1.0, 2.0, 3.0])[:, None, None]
        v = -k
        slots = jnp.asarray([0, PAGE + 2, -1], jnp.int32)  # third is padding
        out = write_kv_pages(pages, 1, ppl, k, v, slots)  # write into layer 1
        kk, vv = split_kv_pages(out)
        assert float(kk[ppl + 0, 0, 0]) == 1.0 and float(vv[ppl + 0, 0, 0]) == -1.0
        # head 1, dim 3 = lane 1 * hd + 3
        assert float(kk[ppl + 1, 2, hd + 3]) == 2.0
        assert float(vv[ppl + 1, 2, hd + 3]) == -2.0
        assert float(jnp.sum(jnp.abs(out[:2 * ppl]))) == 0.0  # layer 0 untouched
        # dropped slot wrote nothing anywhere
        total = float(jnp.sum(jnp.abs(out)))
        expected = float(jnp.sum(jnp.abs(k[:2]))) + float(jnp.sum(jnp.abs(v[:2])))
        assert abs(total - expected) < 1e-6


class TestPlaneKVWrite:
    """The page-plane prefill write path must equal the row-scatter path."""

    @pytest.mark.parametrize("quant", [False, True])
    def test_plane_write_matches_scatter(self, quant):
        rng = np.random.default_rng(11)
        layers, ppl, kvh, hd = 2, 8, 2, 32
        if quant:
            def mk():
                return {
                    "data": jnp.zeros((2 * layers * ppl, PAGE, kvh * hd), jnp.int8),
                    "scale": jnp.zeros((layers * ppl, 2 * kvh, PAGE), jnp.float32),
                }
        else:
            def mk():
                return jnp.zeros((2 * layers * ppl, PAGE, kvh * hd), jnp.float32)

        # mixed step: 2 decode rows + a prefill chunk of 37 tokens over
        # pages [3, 4, 5] (partial first and last page)
        dec_end, p_start, p_end = 2, 128, 256
        t_pad = 256
        k = jnp.asarray(rng.standard_normal((t_pad, kvh, hd)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((t_pad, kvh, hd)).astype(np.float32))
        slots = np.full(t_pad, -1, np.int32)
        slots[0] = 7 * PAGE + 3          # decode row, page 7
        slots[1] = 6 * PAGE + 9          # decode row, page 6
        chunk_slots = np.arange(3 * PAGE + 5, 3 * PAGE + 5 + 37)
        slots[p_start: p_start + 37] = chunk_slots
        slots = jnp.asarray(slots)
        # (page, token offset within the prefill segment) + sentinel pad
        pages = jnp.asarray(
            [[3, 0], [4, 16 - 5], [5, 2 * 16 - 5], [1 << 30, 0]], jnp.int32
        )

        via_scatter = write_kv_pages(mk(), 1, ppl, k, v, slots)
        via_planes = write_kv_pages(
            mk(), 1, ppl, k, v, slots,
            segments=(dec_end, p_start, p_end), prefill_pages=pages,
        )
        if quant:
            np.testing.assert_array_equal(
                np.asarray(via_scatter["data"]), np.asarray(via_planes["data"])
            )
            np.testing.assert_allclose(
                np.asarray(via_scatter["scale"]), np.asarray(via_planes["scale"]),
                rtol=1e-6, atol=1e-7,
            )
        else:
            np.testing.assert_allclose(
                np.asarray(via_scatter), np.asarray(via_planes), rtol=1e-6, atol=1e-6
            )


class TestFusedKVWrite:
    """Fused decode write (new_kv): attention out AND resulting cache must
    equal scatter-write-then-attend, bf16/f32 and int8 caches."""

    def _decode_case(self, rng, kv_lens_list, num_pages=40):
        case = build_case(rng, kv_lens_list, [1] * len(kv_lens_list),
                          nh=4, kvh=2, hd=32, num_pages=num_pages)
        return case

    @pytest.mark.parametrize("ring_knobs", [
        dict(),                       # default ring/xlane
        dict(decode_xlane=False),     # in-lane double buffer path
        dict(decode_tpp=0),           # tail phase off
    ])
    def test_fused_matches_scatter_f32(self, ring_knobs):
        from nanovllm_tpu.ops.kv_cache import write_kv_pages
        from nanovllm_tpu.ops.ragged_paged_attention import AttnKnobs

        rng = np.random.default_rng(21)
        kv = [7, 33, 130, 48, 17]     # mixed pages; 130 exercises multi-group
        case = self._decode_case(rng, kv)
        q, kv_pages, kv_lens, page_indices, token_seq, positions = case
        s = len(kv)
        kvh, hd = 2, 32
        # zero each seq's NEWEST row so the write is observable
        k_new = jnp.asarray(rng.standard_normal((s, kvh, hd)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((s, kvh, hd)), jnp.float32)
        slots = jnp.asarray(
            [int(page_indices[i, (kv[i] - 1) // PAGE]) * PAGE
             + (kv[i] - 1) % PAGE for i in range(s)], jnp.int32)
        base = kv_pages
        for i in range(s):
            base = base.at[2 * (LAYER * PPL + slots[i] // PAGE),
                           slots[i] % PAGE].set(0.0)
            base = base.at[2 * (LAYER * PPL + slots[i] // PAGE) + 1,
                           slots[i] % PAGE].set(0.0)

        knobs = AttnKnobs(**ring_knobs)
        # path A: scatter then attend
        cache_a = write_kv_pages(base, LAYER, PPL, k_new, v_new, slots)
        out_a = ragged_paged_attention_pallas(
            q, cache_a, LAYER, PPL, kv_lens, page_indices, token_seq,
            positions, sm_scale=0.25, q_tile=1, interpret=True, knobs=knobs,
        )
        # path B: fused write inside the kernel
        out_b, cache_b = ragged_paged_attention_pallas(
            q, base, LAYER, PPL, kv_lens, page_indices, token_seq,
            positions, sm_scale=0.25, q_tile=1, interpret=True, knobs=knobs,
            new_kv=(k_new.reshape(s, -1), v_new.reshape(s, -1), None),
        )
        np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(cache_b),
                                      np.asarray(cache_a))

    def test_fused_matches_scatter_int8(self):
        from nanovllm_tpu.ops.kv_cache import (
            _quantize_rows,
            write_kv_pages,
        )

        rng = np.random.default_rng(22)
        kv = [9, 40, 129, 16]
        s = len(kv)
        kvh, hd = 2, 32
        case = self._decode_case(rng, kv)
        q, _, kv_lens, page_indices, token_seq, positions = case
        num_pages, layers = 40, 3
        cache0 = {
            "data": jnp.asarray(
                rng.integers(-100, 100, (2 * layers * num_pages, PAGE,
                                         kvh * hd)), jnp.int8),
            "scale": jnp.asarray(
                rng.uniform(0.01, 0.1, (layers * num_pages, 2 * kvh, PAGE)),
                jnp.float32),
        }
        k_new = jnp.asarray(rng.standard_normal((s, kvh, hd)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((s, kvh, hd)), jnp.float32)
        slots = jnp.asarray(
            [int(page_indices[i, (kv[i] - 1) // PAGE]) * PAGE
             + (kv[i] - 1) % PAGE for i in range(s)], jnp.int32)

        cache_a = write_kv_pages(cache0, LAYER, PPL, k_new, v_new, slots)
        out_a = ragged_paged_attention_pallas(
            q, cache_a, LAYER, PPL, kv_lens, page_indices, token_seq,
            positions, sm_scale=0.25, q_tile=1, interpret=True,
        )
        qrows, qscale = _quantize_rows(jnp.concatenate([k_new, v_new], axis=1))
        out_b, cache_b = ragged_paged_attention_pallas(
            q, cache0, LAYER, PPL, kv_lens, page_indices, token_seq,
            positions, sm_scale=0.25, q_tile=1, interpret=True,
            new_kv=(qrows[:, :kvh].reshape(s, -1),
                    qrows[:, kvh:].reshape(s, -1), qscale),
        )
        np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(cache_b["data"]),
                                      np.asarray(cache_a["data"]))
        np.testing.assert_allclose(np.asarray(cache_b["scale"]),
                                   np.asarray(cache_a["scale"]),
                                   rtol=1e-6, atol=1e-7)


class TestKnobs:
    """AttnKnobs variants must all match the oracle (the BlockSpec-grid
    fallback path included, so it cannot silently rot)."""

    def _case(self):
        rng = np.random.default_rng(12)
        kv_len, q_len = 120, 60
        case = build_case(rng, [kv_len], [q_len], nh=4, kvh=2, hd=32)
        q, kv_pages, kv_lens, page_indices, token_seq, positions = case
        t_pad = PREFILL_TILE
        qp = jnp.zeros((t_pad,) + q.shape[1:], q.dtype).at[:q_len].set(q)
        ts = jnp.zeros(t_pad, jnp.int32).at[:q_len].set(token_seq)
        pos = jnp.zeros(t_pad, jnp.int32).at[:q_len].set(positions)
        ref = ragged_paged_attention_ref(
            q, kv_pages, LAYER, PPL, page_indices, token_seq, positions,
            sm_scale=0.25,
        )
        return (qp, kv_pages, kv_lens, page_indices, ts, pos), ref, q_len

    @pytest.mark.parametrize("knobs", [
        # the BlockSpec-grid fallback (kept as the non-manual-DMA partner)
        dict(prefill_manual=False),
        # manual path at non-default sizing
        dict(prefill_npp=2, prefill_ring=3),
        dict(decode_xlane=False),
    ])
    def test_knob_variants_match_oracle(self, knobs):
        from nanovllm_tpu.ops.ragged_paged_attention import AttnKnobs

        (qp, kv_pages, kv_lens, page_indices, ts, pos), ref, q_len = \
            self._case()
        ours = ragged_paged_attention_pallas(
            qp, kv_pages, LAYER, PPL, kv_lens, page_indices,
            ts[::PREFILL_TILE], pos[::PREFILL_TILE],
            sm_scale=0.25, q_tile=PREFILL_TILE, interpret=True,
            knobs=AttnKnobs(**knobs),
        )
        np.testing.assert_allclose(np.asarray(ours)[:q_len], np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_config_reaches_spec_and_env_wins(self, monkeypatch, tmp_path):
        """Config attn_* fields land on ModelSpec.attn_knobs; NVT_* env vars
        override them; two engines in one process can diverge."""
        from nanovllm_tpu.config import Config
        from nanovllm_tpu.ops.ragged_paged_attention import AttnKnobs

        cfg_a = Config(hf_config=_tiny_hf(), attn_decode_npp=4,
                       attn_prefill_manual=False)
        cfg_b = Config(hf_config=_tiny_hf())
        ka = AttnKnobs.resolve(cfg_a)
        kb = AttnKnobs.resolve(cfg_b)
        assert ka.decode_npp == 4 and not ka.prefill_manual
        assert kb.decode_npp == 8 and kb.prefill_manual
        assert ka != kb  # divergent engines in one process
        monkeypatch.setenv("NVT_DECODE_NPP", "2")
        assert AttnKnobs.resolve(cfg_a).decode_npp == 2  # env wins

    def test_int4_scheme_resolution(self, monkeypatch):
        from nanovllm_tpu.config import Config
        from nanovllm_tpu.ops.quant_matmul import int4_scheme

        assert int4_scheme() == (128, True)
        cfg = Config(hf_config=_tiny_hf(), int4_group=64, int4_mse=False)
        assert int4_scheme(cfg) == (64, False)
        monkeypatch.setenv("NVT_INT4_GROUP", "32")
        assert int4_scheme(cfg) == (32, False)  # env wins


def _tiny_hf():
    class H:
        hidden_size = 64
        num_hidden_layers = 2
        num_attention_heads = 4
        num_key_value_heads = 2
        head_dim = 16
        intermediate_size = 96
        vocab_size = 128
        max_position_embeddings = 512
        rope_theta = 10000.0
        rms_norm_eps = 1e-6
        tie_word_embeddings = True
    return H()


class TestSlidingWindow:
    """Sliding-window masking + lower-bounded page walk vs the oracle."""

    def test_decode_window_skips_groups(self):
        # ctx 300 at PAGE 16 / npp 8 -> group width 128 columns; window 40
        # puts the lower bound at column 260 -> the walk starts at group 2,
        # exercising the g0 skip, the cross-lane cursor at g0, and the mask
        rng = np.random.default_rng(7)
        kv = [300, 135, 17, 1]
        case = build_case(rng, kv, [1] * len(kv), nh=4, kvh=2, hd=32,
                          num_pages=40)
        q, kv_pages, kv_lens, page_indices, token_seq, positions = case
        for w in (40, 128, 1):
            ours = ragged_paged_attention_pallas(
                q, kv_pages, LAYER, PPL, kv_lens, page_indices, token_seq,
                positions, sm_scale=0.25, q_tile=1, interpret=True,
                sliding_window=w,
            )
            ref = ragged_paged_attention_ref(
                q, kv_pages, LAYER, PPL, page_indices, token_seq, positions,
                sm_scale=0.25, sliding_window=w,
            )
            np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                       rtol=2e-5, atol=2e-5)

    def test_prefill_tile_window_g0_past_group(self):
        """Windowed prefill with >=2 live tiles whose lower bound crosses a
        page-group boundary (g0 > 0): the cross-lane DMA ring's producer
        starts each tile's page walk at g0_of(tile), so the perhead consume
        loop must start there too — starting at group 0 desyncs the ring
        (regression: max error ~4 vs 8e-7; ADVICE round 4)."""
        rng = np.random.default_rng(9)
        kv_len, q_len = 240, 200  # positions 40..239 span 2 tiles of 128
        case = build_case(rng, [kv_len], [q_len], nh=4, kvh=2, hd=32)
        q, kv_pages, kv_lens, page_indices, token_seq, positions = case
        t_pad = 2 * PREFILL_TILE
        qp = jnp.zeros((t_pad,) + q.shape[1:], q.dtype).at[:q_len].set(q)
        ts = jnp.zeros(t_pad, jnp.int32).at[:q_len].set(token_seq)
        pos = jnp.zeros(t_pad, jnp.int32).at[:q_len].set(positions)
        # window 7: tile 1 (first row position 168) has lower bound 162 ->
        # group 2 at the default 64-column prefill page group; window 80
        # lands the bound mid-group-1; both tiles live simultaneously
        for w in (7, 80):
            ours = ragged_paged_attention_pallas(
                qp, kv_pages, LAYER, PPL, kv_lens, page_indices,
                ts[::PREFILL_TILE], pos[::PREFILL_TILE],
                sm_scale=0.25, q_tile=PREFILL_TILE, interpret=True,
                sliding_window=w,
            )
            ref = ragged_paged_attention_ref(
                q, kv_pages, LAYER, PPL, page_indices, token_seq, positions,
                sm_scale=0.25, sliding_window=w,
            )
            np.testing.assert_allclose(np.asarray(ours)[:q_len],
                                       np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_prefill_tile_window(self):
        rng = np.random.default_rng(8)
        kv_len, q_len = 50, 10  # chunked prefill rows at positions 40..49
        case = build_case(rng, [kv_len], [q_len], nh=4, kvh=2, hd=32)
        q, kv_pages, kv_lens, page_indices, token_seq, positions = case
        t_pad = PREFILL_TILE
        qp = jnp.zeros((t_pad,) + q.shape[1:], q.dtype).at[:q_len].set(q)
        ts = jnp.zeros(t_pad, jnp.int32).at[:q_len].set(token_seq)
        pos = jnp.zeros(t_pad, jnp.int32).at[:q_len].set(positions)
        for w in (7, 33):
            ours = ragged_paged_attention_pallas(
                qp, kv_pages, LAYER, PPL, kv_lens, page_indices,
                ts[::PREFILL_TILE], pos[::PREFILL_TILE],
                sm_scale=0.25, q_tile=PREFILL_TILE, interpret=True,
                sliding_window=w,
            )
            ref = ragged_paged_attention_ref(
                q, kv_pages, LAYER, PPL, page_indices, token_seq, positions,
                sm_scale=0.25, sliding_window=w,
            )
            np.testing.assert_allclose(np.asarray(ours)[:q_len],
                                       np.asarray(ref), rtol=2e-5, atol=2e-5)
