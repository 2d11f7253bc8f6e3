"""TP cost model + one-command structure verification (VERDICT r4 item 6).

The reference's only parallelism is NCCL tensor parallelism
(reference model_runner.py:104-167, linear.py:410); ours is the same sharding
expressed as shard_map PartitionSpecs over a Mesh (parallel/mesh.py).  Real
multi-chip hardware is not available in this environment, so this tool makes
a real v5e-slice run a one-command VERIFICATION instead of a new project:

  1. **Analytic table** — per (geometry, quant, tp): bytes on ICI per decoded
     token per chip, collective count per step, per-step HBM traffic, and the
     predicted decode-step time / aggregate tok/s / scaling efficiency.  The
     prediction anchors on MEASURED single-chip step times where they exist
     (BENCHMARKS.md round 4: 14B W4A16+KV8 burst 23.19 ms/iter at tier 32 /
     ctx 1024) and otherwise on the 545 GB/s measured HBM stream rate.
  2. **Structure check** (--check) — builds the PRODUCTION ModelRunner at
     tp on the virtual CPU mesh, lowers the real step program at two layer
     counts, and verifies from the StableHLO that the per-layer collective
     pattern is EXACTLY the modeled one (2 tp-all-reduces of [t_pad, hidden]
     per layer; embed psum + sampler gathers layer-independent), so the
     analytic bytes are grounded in the compiled program, not the docstring.

Comm pattern being modeled (SURVEY.md §2.4 parity, parallel/mesh.py):
  per layer:  psum after o_proj + psum after down_proj   (bf16 [t_pad, H])
  per step:   psum after the vocab-parallel embedding    (bf16 [t_pad, H])
              + O(s_pad) sampler all_gather (KB-scale; latency only)

Assumed hardware constants (flag-overridable; calibrate on a real slice):
  --hbm-gbps   545   measured v5e HBM stream rate (BENCHMARKS.md)
  --ici-gbps    90   per-chip ring all-reduce bandwidth: 2 x 45 GB/s
                     unidirectional ICI links on one torus axis (public
                     v5e figure; a 2x4 slice's second axis would add more)
  --coll-us      2   per-collective launch/latency overhead

Ring all-reduce cost per chip: 2*(tp-1)/tp * tensor_bytes / ici_bw + lat.

Usage:
  python tools/tp_model.py                 # analytic table (writes nothing)
  python tools/tp_model.py --check        # + HLO structure verification
  python tools/tp_model.py --tp 2,4,8 --geom 8b,14b --lanes 32 --ctx 1024
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GiB = 1024 ** 3

# geometry dicts (HF configs; see bench.py GEOMETRIES + __graft_entry__)
GEOMS = {
    "0.6b": dict(hidden=1024, layers=28, heads=16, kv_heads=8, head_dim=128,
                 inter=3072, vocab=151936),
    "4b": dict(hidden=2560, layers=36, heads=32, kv_heads=8, head_dim=128,
               inter=9728, vocab=151936),
    "8b": dict(hidden=4096, layers=36, heads=32, kv_heads=8, head_dim=128,
               inter=12288, vocab=151936),
    "14b": dict(hidden=5120, layers=40, heads=40, kv_heads=8, head_dim=128,
                inter=17408, vocab=151936),
}

# weight bytes/elt of the linear stacks (head always int8, norms negligible)
QUANT_BYTES = {"w4a16": 0.5 + 4 / 128, "w8a16": 1.0, "w8a8": 1.0, "bf16": 2.0}

# measured single-chip decode-step anchors: (quant, geom) -> (ms/iter, s_pad,
# ctx) from BENCHMARKS.md (burst-iteration traces, round 3-4)
ANCHORS = {
    ("w4a16", "14b"): (23.19, 32, 1024),
}


def linear_params(g):
    """Parameter count of the per-layer linear stacks (the streamed bytes)."""
    h, hd = g["hidden"], g["head_dim"]
    qkv = h * (g["heads"] + 2 * g["kv_heads"]) * hd
    o = g["heads"] * hd * h
    mlp = 3 * h * g["inter"]
    return g["layers"] * (qkv + o + mlp)


def step_bytes(g, quant, tp, s_pad, ctx, kv_bytes=1.0):
    """Per-chip HBM bytes of one decode step: weight stream + head + KV."""
    w = linear_params(g) * QUANT_BYTES[quant] / tp
    head = g["vocab"] * g["hidden"] * 1.0 / tp          # int8 LM head
    kv = s_pad * ctx * g["layers"] * 2 * g["kv_heads"] * g["head_dim"] \
        * kv_bytes / tp
    return w, head, kv


def ici_step(g, tp, s_pad, ici_bw, coll_lat):
    """(bytes on ICI per chip per step, collective count, seconds)."""
    ncoll = 2 * g["layers"] + 1                          # psums (bf16)
    tensor = s_pad * g["hidden"] * 2
    per = 2 * (tp - 1) / tp * tensor
    byts = ncoll * per
    secs = byts / ici_bw + (ncoll + 1) * coll_lat        # +1: sampler gather
    return byts, ncoll + 1, secs


def analytic(args):
    rows = []
    for geom_name in args.geom:
        g = GEOMS[geom_name]
        quant = args.quant or ("w4a16" if geom_name == "14b" else "w8a8")
        anchor = ANCHORS.get((quant, geom_name))
        s_pad, ctx = args.lanes, args.ctx
        if anchor and not args.lanes_set:
            _, s_pad, ctx = anchor
        for tp in [1] + args.tp:
            w, head, kv = step_bytes(g, quant, tp, s_pad, ctx)
            t_hbm = (w + head + kv) / args.hbm_bw
            if tp == 1:
                i_b, nc, t_ici = 0.0, 0, 0.0
            else:
                i_b, nc, t_ici = ici_step(g, tp, s_pad, args.ici_bw,
                                          args.coll_lat)
            # anchored: measured 1-chip step time splits perfectly over tp
            # (it is HBM-stream-bound), collectives append to the critical
            # path (decode psums at KB scale are latency-bound, between
            # layers — not hidable behind the next layer's weight stream
            # without speculative prefetch XLA does do; treat as additive
            # for a conservative bound and report the overlap bound too)
            t1 = anchor[0] / 1e3 if anchor else None
            t_floor = max(t_hbm, i_b / args.ici_bw if tp > 1 else 0) \
                + (nc * args.coll_lat if tp > 1 else 0)
            t_anch = (t1 / tp + t_ici) if t1 else None
            t_pred = t_anch if t_anch else t_floor
            eff = (t1 / tp) / t_anch if t_anch else t_hbm / t_floor
            rows.append(dict(
                geom=geom_name, quant=quant, tp=tp, s_pad=s_pad, ctx=ctx,
                w_gib=(w + head) * tp / GiB,
                hbm_ms=t_hbm * 1e3,
                ici_kb_tok=i_b / max(s_pad, 1) / 1024,
                ncoll=nc, ici_ms=t_ici * 1e3,
                step_ms=t_pred * 1e3,
                toks=s_pad / t_pred, toks_chip=s_pad / t_pred / tp,
                eff=eff,
            ))
    hdr = (f"{'geom':>5} {'quant':>6} {'tp':>3} {'s_pad':>5} {'ctx':>5} "
           f"{'W GiB':>6} {'HBM ms':>7} {'ICI KB/tok':>10} {'coll':>5} "
           f"{'ICI ms':>7} {'step ms':>8} {'tok/s':>8} {'tok/s/chip':>10} "
           f"{'eff':>5}")
    print(hdr)
    for r in rows:
        print(f"{r['geom']:>5} {r['quant']:>6} {r['tp']:>3} {r['s_pad']:>5} "
              f"{r['ctx']:>5} {r['w_gib']:>6.2f} {r['hbm_ms']:>7.2f} "
              f"{r['ici_kb_tok']:>10.1f} {r['ncoll']:>5} {r['ici_ms']:>7.3f} "
              f"{r['step_ms']:>8.2f} {r['toks']:>8.0f} "
              f"{r['toks_chip']:>10.0f} {r['eff']:>5.0%}")
    return rows


_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
                "pred": 1}


def _collectives(hlo_text):
    """(op, byte count, group size) for every collective in a compiled HLO
    module (post-SPMD text: ``f32[256,256]{1,0} all-reduce(...,
    replica_groups={{0,1}}, ...)``)."""
    out = []
    pat = re.compile(
        r"(\w+)\[([\d,]*)\][^=]*?(all-reduce|all-gather|reduce-scatter)"
        r"\(.*?replica_groups=\{\{([\d,]*)\}"
    )
    for m in pat.finditer(hlo_text):
        dims = [int(d) for d in m.group(2).split(",") if d]
        n = 1
        for d in dims:
            n *= d
        byts = n * _DTYPE_BYTES.get(m.group(1), 4)
        gsize = len(m.group(4).split(","))
        out.append((m.group(3), byts, gsize))
    return out


def check(args):
    """Compile the production step on the virtual CPU mesh and verify the
    collective structure is EXACTLY the modeled one.

    The layer stack is a lax.scan over stacked weights (models/qwen3.py), so
    the two per-layer psums appear ONCE in the scan body — the tp-group
    all-reduce count must be 3 ([t_pad, H] each: o_proj + down_proj in the
    body, embed at top level) at EVERY layer count, and the only other
    tp-group traffic is the O(s_pad) sampler gather."""
    import jax

    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_platforms", "cpu")

    from __graft_entry__ import _hf_cfg
    from nanovllm_tpu.config import Config
    from nanovllm_tpu.engine.model_runner import ModelRunner

    t_pad, hidden, s_pad = 256, 256, 8
    ok = True
    for tp in args.tp:
        if tp > len(jax.devices()):
            print(f"check tp={tp}: SKIP (only {len(jax.devices())} devices)")
            continue
        per_l = {}
        for layers in (2, 4):
            hf = _hf_cfg(hidden=hidden, layers=layers, heads=2 * tp,
                         kv_heads=tp, head_dim=64, inter=4 * tp,
                         vocab=512 * tp)
            config = Config(
                hf_config=hf, random_weights=True, dtype="float32",
                tensor_parallel_size=tp, kvcache_block_size=16,
                num_kvcache_blocks=16, max_num_batched_tokens=32,
                max_num_seqs=8, max_model_len=128, attention_impl="ref",
                warmup_buckets=False,
            )
            runner = ModelRunner(config)
            layout = (s_pad, 128, t_pad, s_pad, runner._p_pad)
            (kv, packed, fb, kd, ctr), segments = \
                runner._abstract_step_operands(layout)
            text = runner._step.lower(
                runner.params, kv, packed, fb, kd, ctr, segments
            ).compile().as_text()
            per_l[layers] = [c for c in _collectives(text) if c[2] == tp]
        ar = [c for c in per_l[2] if c[0] == "all-reduce"]
        ag = [c for c in per_l[2] if c[0] == "all-gather"]
        exp_ar = t_pad * hidden * 4                   # [t_pad, H] f32
        structure_ok = (
            len(ar) == 3
            and all(b == exp_ar for _, b, _ in ar)
            # scan-carried per-layer comm: count layer-invariant
            and len(per_l[2]) == len(per_l[4])
            # sampler gathers are O(s_pad), not O(vocab)
            and all(b <= 16 * s_pad * tp for _, b, _ in ag)
        )
        ok &= structure_ok
        print(
            f"check tp={tp}: {len(ar)} tp-all-reduce x {exp_ar} B "
            f"([t_pad={t_pad}, H={hidden}] f32; 2 scan-carried per layer + "
            f"embed), {len(ag)} sampler all-gather "
            f"({[b for _, b, _ in ag]} B), layer-invariant count "
            f"{len(per_l[2])}=={len(per_l[4])} -> "
            f"{'ok' if structure_ok else 'MISMATCH'}"
        )
    print("structure check:", "PASS" if ok else "FAIL")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geom", default="8b,14b")
    ap.add_argument("--tp", default="2,4,8")
    ap.add_argument("--quant", default=None,
                    help="override (default: w4a16 at 14b, w8a8 elsewhere)")
    ap.add_argument("--lanes", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--hbm-gbps", type=float, default=545.0)
    ap.add_argument("--ici-gbps", type=float, default=90.0)
    ap.add_argument("--coll-us", type=float, default=2.0)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    args.lanes_set = "--lanes" in sys.argv
    args.geom = args.geom.split(",")
    args.tp = [int(t) for t in args.tp.split(",")]
    args.hbm_bw = args.hbm_gbps * 1e9
    args.ici_bw = args.ici_gbps * 1e9
    args.coll_lat = args.coll_us * 1e-6
    analytic(args)
    if args.check:
        check(args)


if __name__ == "__main__":
    main()
