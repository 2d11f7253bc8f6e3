"""Multi-process lockstep worker, driven by tests/test_distributed.py.

Each process runs this identical script with its own JAX_PROCESS_ID; the
engine itself calls jax.distributed.initialize() (config.distributed=True,
model_runner._init_distributed).  Every process submits the identical request
stream and must produce identical tokens — the lockstep multi-controller
design that replaces the reference's SharedMemory method broadcast
(reference engine/model_runner.py:146-288).
"""

import json
import os
import sys


PROMPTS = [
    [3, 17, 99, 5, 42, 7, 23, 88],
    [11, 29, 64, 2],
    [101, 55, 9, 81, 33, 6],
    [77, 13],
]


def main():
    ckpt, out_path = sys.argv[1], sys.argv[2]
    dp = int(os.environ.get("NVT_DP", "2"))
    tp = int(os.environ.get("NVT_TP", "1"))
    # "pallas" runs the production kernels (ragged paged attention, DMA KV
    # write, fused sampler) in interpret mode on the CPU backend — the same
    # approach as tests/test_tp_pallas.py, now across OS processes
    impl = os.environ.get("NVT_IMPL", "ref")
    quant = os.environ.get("NVT_QUANT", "none")
    kv = os.environ.get("NVT_KV", "auto")

    # the ambient environment pins JAX_PLATFORMS=axon (TPU tunnel) and
    # overrides plain env vars; force the CPU backend through jax.config
    # before anything initializes it (same trick as tests/conftest.py)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_num_cpu_devices", int(os.environ.get("NVT_LOCAL_DEVICES", "1"))
    )

    from nanovllm_tpu import LLM, SamplingParams

    llm = LLM(
        model=ckpt,
        dtype="float32",
        distributed=True,
        data_parallel_size=dp,
        tensor_parallel_size=tp,
        max_model_len=256,
        max_num_seqs=8,
        kvcache_block_size=16,
        num_kvcache_blocks=32,
        attention_impl=impl,
        quantization=quant,
        kv_cache_dtype=kv,
        decode_burst=4,
    )
    import jax

    assert jax.process_count() == int(os.environ["JAX_NUM_PROCESSES"]), (
        "engine did not bring up the multi-process runtime"
    )
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = [o["token_ids"] for o in llm.generate(PROMPTS, sp, use_tqdm=False)]
    with open(out_path, "w") as f:
        json.dump({"process": jax.process_index(), "tokens": outs}, f)


if __name__ == "__main__":
    main()
