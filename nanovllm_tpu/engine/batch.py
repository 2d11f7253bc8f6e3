"""Per-step batch assembly: Sequences -> padded, bucketed device arrays.

TPU-native replacement for the reference's ``prepare_model_input`` +
CUDA-Graph machinery (reference model_runner.py:400-495, :640-715): XLA
compiles one executable per input shape, so batch shapes are padded to a
small ladder of buckets — the bucket ladder *is* the CUDA-Graph equivalent,
and it covers prefill shapes too (the reference only graphs decode).

Padding conventions (reference model_runner.py:588-596 parity):
  * token lanes: slot_mapping = -1 (KV write skipped), token id 0, position 0
  * sequence lanes: kv_len 0, page_indices 0, cu_q_lens repeats the total so
    padded tokens map to an empty pseudo-sequence
  * logits_indices of padded lanes point at token 0 (result discarded on host)
"""

from typing import NamedTuple

import numpy as np

from nanovllm_tpu.engine.sequence import Sequence


class StepBatch(NamedTuple):
    """Attention/sampling metadata for one engine step (a jit-able pytree).

    The explicit-argument replacement for the reference's module-global
    Context (reference utils/context.py:48-55).
    """

    token_ids: np.ndarray      # [T] int32
    positions: np.ndarray      # [T] int32
    slot_mapping: np.ndarray   # [T] int32, -1 = padding (no KV write)
    cu_q_lens: np.ndarray      # [S+1] int32
    kv_lens: np.ndarray        # [S] int32, 0 = padded lane
    page_indices: np.ndarray   # [S, PAGES] int32
    logits_indices: np.ndarray  # [S] int32 (token index of each lane's last token)
    temperatures: np.ndarray   # [S] float32


def bucket(n: int, minimum: int = 8) -> int:
    """Next power-of-two bucket >= n (bounded below for tiling sanity)."""
    b = minimum
    while b < n:
        b *= 2
    return b


def page_bucket(n: int, minimum: int = 8) -> int:
    return bucket(n, minimum)


def prepare_step_batch(
    seqs: list[Sequence],
    block_size: int,
    max_pages_bucket: int | None = None,
) -> tuple[StepBatch, list[int]]:
    """Build the padded StepBatch for the scheduled sequences.

    Returns (batch, sampled_seq_indices) where sampled_seq_indices lists the
    positions in ``seqs`` whose scheduled chunk reaches the end of their
    tokens — only those produce a sampled token this step (reference
    model_runner.py:448-451).
    """
    num_tokens = sum(s.num_new_tokens for s in seqs)
    t_pad = bucket(num_tokens)
    s_pad = bucket(len(seqs))
    max_pages = max(len(s.block_table) for s in seqs)
    p_pad = max_pages_bucket or page_bucket(max_pages)
    assert p_pad >= max_pages

    token_ids = np.zeros(t_pad, dtype=np.int32)
    positions = np.zeros(t_pad, dtype=np.int32)
    slot_mapping = np.full(t_pad, -1, dtype=np.int32)
    cu_q_lens = np.full(s_pad + 1, num_tokens, dtype=np.int32)
    kv_lens = np.zeros(s_pad, dtype=np.int32)
    page_indices = np.zeros((s_pad, p_pad), dtype=np.int32)
    logits_indices = np.zeros(s_pad, dtype=np.int32)
    temperatures = np.zeros(s_pad, dtype=np.float32)

    sampled: list[int] = []
    t = 0
    cu_q_lens[0] = 0
    for i, seq in enumerate(seqs):
        n_new = seq.num_new_tokens
        start, end = seq.num_cached_tokens, seq.num_context_tokens
        token_ids[t:t + n_new] = seq.token_ids[start:end]
        pos = np.arange(start, end, dtype=np.int32)
        positions[t:t + n_new] = pos
        table = np.asarray(seq.block_table, dtype=np.int32)
        slot_mapping[t:t + n_new] = table[pos // block_size] * block_size + pos % block_size
        cu_q_lens[i + 1] = t + n_new
        kv_lens[i] = end
        page_indices[i, :len(table)] = table
        logits_indices[i] = t + n_new - 1
        temperatures[i] = seq.temperature
        if end == len(seq):
            sampled.append(i)
        t += n_new

    batch = StepBatch(
        token_ids=token_ids,
        positions=positions,
        slot_mapping=slot_mapping,
        cu_q_lens=cu_q_lens,
        kv_lens=kv_lens,
        page_indices=page_indices,
        logits_indices=logits_indices,
        temperatures=temperatures,
    )
    return batch, sampled
