"""Device mesh and sharding specs for tensor/data parallelism.

TPU-native replacement for the reference's process-per-GPU NCCL world
(reference model_runner.py:104-167, linear.py:137-411): a single controller
drives a ``Mesh(("dp", "tp"))`` and all communication is XLA collectives
inside ``shard_map``.  The per-layer comm pattern matches the reference
exactly (SURVEY.md §2.4): one psum after o_proj, one after down_proj, one for
the vocab-parallel embedding, and a small all_gather for the sharded sampler
— all on the "tp" axis.  The "dp" axis (multi-host: DCN; the reference is
single-node-only, SURVEY.md §5.8) carries NO collectives at all: parameters
are replicated across it, the KV cache and per-step batch are sharded on it,
and the single logical scheduler assigns each sequence to one dp group.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TP_AXIS = "tp"
DP_AXIS = "dp"


def make_mesh(tp_size: int, devices=None, dp_size: int = 1) -> Mesh:
    """Mesh over dp*tp devices, tp innermost (ICI-contiguous on real slices;
    dp spans hosts/DCN in a multi-host deployment)."""
    devices = devices if devices is not None else jax.devices()
    need = tp_size * dp_size
    assert len(devices) >= need, f"need {need} devices, have {len(devices)}"
    arr = np.asarray(devices[:need]).reshape(dp_size, tp_size)
    return Mesh(arr, (DP_AXIS, TP_AXIS))


_LAYER_PSPECS = {
    "input_norm": P(None, None),
    "qkv": P(None, None, TP_AXIS),      # column-parallel
    "qkv_b": P(None, TP_AXIS),          # bias shards with the output
    "q_norm": P(None, None),
    "k_norm": P(None, None),
    "o": P(None, TP_AXIS, None),        # row-parallel (psum after)
    "post_norm": P(None, None),
    "gate_up": P(None, None, TP_AXIS),  # column-parallel
    "down": P(None, TP_AXIS, None),     # row-parallel (psum after)
}


def param_pspecs(layers_tree: dict) -> dict:
    """PartitionSpecs matching an actual param pytree's ``layers`` subtree.

    Keys present vary by model family (QK-Norm weights, qkv bias).  Quantized
    linear weights are {"w", "s"} dicts:
      * group-quant scales ([L, K//G, N], same rank as the weight) shard on
        the same axis as the weight — the group axis follows the contraction
        axis, so a row-parallel shard owns whole groups (asserted at
        quantize time);
      * W8A8 per-channel scales ([L, N], one rank lower) follow the OUTPUT
        axis: sharded for column-parallel weights, replicated for
        row-parallel ones.
    """

    def spec_of(key: str, val):
        spec = _LAYER_PSPECS[key]
        if not isinstance(val, dict):
            return spec
        if val["s"].ndim == val["w"].ndim:
            return {"w": spec, "s": spec}
        out_sharded = spec[-1] == TP_AXIS  # column-parallel packs
        return {"w": spec, "s": P(None, TP_AXIS) if out_sharded else P(None, None)}

    return {
        "embed": P(TP_AXIS, None),
        "layers": {k: spec_of(k, v) for k, v in layers_tree.items()},
        "final_norm": P(None),
        "lm_head": P(TP_AXIS, None),
    }


def kv_pspec() -> P:
    """KV pages: [planes * dp * L * P, page, kvh * hd] — dp groups partition
    the flat leading plane axis; the head-major kvh*hd lane axis shards on
    "tp" within a group (each shard gets its contiguous kvh_l head block)."""
    return P(DP_AXIS, None, TP_AXIS)


def pack_tp(arrays: list[np.ndarray], tp: int, axis: int) -> np.ndarray:
    """Interleave tensors chunk-major for fused column-parallel matmuls.

    Splits each array into ``tp`` equal chunks along ``axis`` and concatenates
    them shard-major, so a global array sharded with P(..., "tp", ...) hands
    every shard its contiguous ``[a_s | b_s | ...]`` pack.  This is the
    TPU-mesh equivalent of the reference's packed-module weight loaders
    (QKVParallelLinear / MergedColumnParallelLinear shard offsets,
    linear.py:261-332, :201-258).
    """
    chunk_lists = [np.split(np.asarray(a), tp, axis=axis) for a in arrays]
    shards = [c for chunks in zip(*chunk_lists) for c in chunks]
    return np.concatenate(shards, axis=axis)


def pspecs_for(params) -> dict:
    """param_pspecs shaped to an actual param pytree (tied lm_head, quant,
    model-family layer keys)."""
    specs = param_pspecs(params["layers"])
    if "lm_head" not in params:
        specs.pop("lm_head")
    if "lm_head_q" in params:
        specs["lm_head_q"] = {
            "w": P(TP_AXIS, None),     # vocab-sharded rows like the bf16 head
            "s": P(None, TP_AXIS),     # [1, V_pad] per-row scales
        }
    for k in ("rot", "unrot"):         # incoherence rotation: replicated H x H
        if k in params:
            specs[k] = P(None, None)
    return specs


def shard_params(params, mesh: Mesh):
    """Place a (numpy) param pytree onto the mesh, shard by shard.

    ``make_array_from_callback`` materializes + transfers only each device's
    own slice — no host-side global duplication, and on a multi-host mesh
    each host touches only its addressable shards (the reference's analogue
    is per-rank shard slicing inside every weight_loader, linear.py:165-184).
    """
    def put(arr, spec):
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    return jax.tree.map(put, params, pspecs_for(params))
