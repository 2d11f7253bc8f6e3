"""Per-request sequence state.

Behavioral parity with the reference Sequence (reference:
nanovllm/engine/sequence.py:32-235): WAITING/RUNNING/FINISHED state machine,
token-layout cursor fields (``num_cached_tokens`` / ``num_new_tokens``), and
the block-table view helpers the block manager needs.

Token layout invariant (same as the reference):

    |<-- num_cached_tokens -->|<-- num_new_tokens -->|<-- not yet scheduled -->|
    |<------- num_context_tokens ------->|
    |<----------------------- num_tokens ----------------------------------->|

Differences from the reference: block_size is an instance attribute (the
reference uses a hard-coded class var, sequence.py:73), and there is no pickle
trimming — the single-controller JAX design has no worker processes to ship
sequences to (reference sequence.py:212-235 exists only for its SharedMemory
control plane).
"""

from enum import Enum, auto
from itertools import count


class SequenceStatus(Enum):
    WAITING = auto()
    RUNNING = auto()
    FINISHED = auto()


class Sequence:
    counter = count()

    def __init__(self, token_ids: list[int], sampling_params=None, block_size: int = 256):
        from nanovllm_tpu.sampling_params import SamplingParams

        if sampling_params is None:
            sampling_params = SamplingParams()
        self.seq_id: int = next(Sequence.counter)
        self.status = SequenceStatus.WAITING
        self.token_ids: list[int] = list(token_ids)
        self.num_prompt_tokens: int = len(token_ids)
        self.block_size = block_size
        # progress cursor into the KV cache
        self.num_cached_tokens: int = 0
        self.num_new_tokens: int = 0
        self.block_table: list[int] = []
        self.temperature = sampling_params.temperature
        self.max_tokens = sampling_params.max_tokens
        self.ignore_eos = sampling_params.ignore_eos
        # online-serving metadata
        self.arrival_time: float | None = None
        # data-parallel group owning this sequence's KV partition (assigned
        # at admission by the scheduler; no reference equivalent — TP-only)
        self.dp_group: int = 0
        # async scheduling: count of appended tokens whose VALUE is still on
        # device (placeholders at the tail of token_ids, patched when the
        # in-flight step's results arrive).  Always the trailing num_pending
        # entries of token_ids.
        self.num_pending: int = 0
        # a full block's prefix hash was skipped because it contained a
        # placeholder; committed via commit_full_blocks after patching
        self.hash_deferred: bool = False

    # -- basic views ---------------------------------------------------------

    def __len__(self) -> int:
        return len(self.token_ids)

    def __getitem__(self, key):
        return self.token_ids[key]

    @property
    def num_tokens(self) -> int:
        return len(self.token_ids)

    @property
    def last_token(self) -> int:
        return self.token_ids[-1]

    @property
    def is_finished(self) -> bool:
        return self.status == SequenceStatus.FINISHED

    @property
    def num_completion_tokens(self) -> int:
        return len(self.token_ids) - self.num_prompt_tokens

    @property
    def prompt_token_ids(self) -> list[int]:
        return self.token_ids[: self.num_prompt_tokens]

    @property
    def completion_token_ids(self) -> list[int]:
        return self.token_ids[self.num_prompt_tokens:]

    @property
    def num_context_tokens(self) -> int:
        """Tokens in the KV cache after this step completes."""
        return self.num_cached_tokens + self.num_new_tokens

    # -- block-level views (used by BlockManager) ----------------------------

    @property
    def num_blocks(self) -> int:
        """Blocks needed to hold every token of the sequence (ceil)."""
        return (len(self.token_ids) + self.block_size - 1) // self.block_size

    @property
    def num_cached_blocks(self) -> int:
        """Fully-cached whole blocks (the trailing partial block excluded)."""
        return self.num_cached_tokens // self.block_size

    def block(self, i: int) -> list[int]:
        """Token ids belonging to logical block ``i`` (last one may be short)."""
        assert 0 <= i < self.num_blocks
        return self.token_ids[i * self.block_size: (i + 1) * self.block_size]

    def append_token(self, token_id: int) -> None:
        self.token_ids.append(token_id)
