"""Paged KV-cache accounting and hash-chained prefix cache.

Pure-Python, device-free (no jax/torch imports) so it unit-tests on any host —
same layering property as the reference (reference:
nanovllm/engine/block_manager.py:37-41).

Behavioral invariants reproduced from the reference (block_manager.py:92-438,
see SURVEY.md §2.2):

  * Hash chain: ``hash(block_i) = xxh64(le64(hash(block_{i-1})) ||
    int64_bytes(tokens_i))``; the first block has no prefix; only *full*
    blocks carry hashes.
  * A free block keeps its hash + token_ids (lazy eviction): it can still be
    hit by the prefix cache until it is re-allocated for new content, at which
    point the hash mapping is purged only if this block still owns it.
  * Hit validation compares stored token_ids against the sequence's actual
    tokens (survives xxhash collisions).
  * The final block of a sequence is always treated as a miss, so a scheduled
    sequence always has >= 1 token to compute.
  * Free-list discipline: allocate pops the head, deallocate appends to the
    tail (FIFO reuse maximizes the lifetime of lazily-cached blocks).
  * deallocate releases blocks in reverse order and resets the sequence's
    cursor fields.
"""

from collections import deque

import numpy as np
import xxhash

from nanovllm_tpu.engine.sequence import Sequence

NO_HASH = -1


def hash_block(token_ids: list[int], prefix_hash: int = NO_HASH) -> int:
    """Chained xxhash64 of one full block (reference block_manager.py:135-165)."""
    h = xxhash.xxh64()
    if prefix_hash != NO_HASH:
        h.update(prefix_hash.to_bytes(8, "little"))
    h.update(np.asarray(token_ids, dtype=np.int64).tobytes())
    return h.intdigest()


class Block:
    """Metadata for one physical KV-cache block (data itself lives on device)."""

    __slots__ = ("block_id", "ref_count", "hash", "token_ids")

    def __init__(self, block_id: int):
        self.block_id = block_id
        self.ref_count = 0
        self.hash = NO_HASH
        self.token_ids: list[int] = []


class BlockManager:
    def __init__(self, num_blocks: int, block_size: int):
        assert num_blocks > 0
        self.block_size = block_size
        self.blocks = [Block(i) for i in range(num_blocks)]
        self.hash_to_block: dict[int, int] = {}
        self.free_queue: deque[int] = deque(range(num_blocks))
        self.used_ids: set[int] = set()

    # -- internal ------------------------------------------------------------

    def _take_free_block(self, block_id: int) -> Block:
        """Move a block off the free list for fresh content.

        Purges the stale hash mapping iff this block is still its owner
        (reference block_manager.py:186-187 lazy-eviction rule).
        """
        block = self.blocks[block_id]
        assert block.ref_count == 0
        if self.hash_to_block.get(block.hash) == block_id:
            del self.hash_to_block[block.hash]
        block.ref_count = 1
        block.hash = NO_HASH
        block.token_ids = []
        self.free_queue.remove(block_id)
        self.used_ids.add(block_id)
        return block

    def _release_block(self, block_id: int) -> None:
        assert self.blocks[block_id].ref_count == 0
        self.used_ids.remove(block_id)
        self.free_queue.append(block_id)  # tail: FIFO reuse keeps cache alive

    def _register(self, block: Block, h: int, token_ids: list[int]) -> None:
        block.hash = h
        block.token_ids = token_ids
        self.hash_to_block[h] = block.block_id

    def _match_prefix(self, seq: Sequence):
        """Walk the hash chain over the sequence's blocks until the first miss.

        Yields ``(index, token_ids, hash, block_id_or_None)`` for each *hit*
        block.  The final block of the sequence never counts as a hit
        (reference block_manager.py:263 — guarantees >= 1 token to compute).
        """
        h = NO_HASH
        for i in range(seq.num_blocks - 1):
            token_ids = seq.block(i)
            if len(token_ids) != self.block_size:
                return
            h = hash_block(token_ids, h)
            block_id = self.hash_to_block.get(h)
            if block_id is None or self.blocks[block_id].token_ids != token_ids:
                return
            yield i, token_ids, h, block_id

    # -- waiting-queue path (admission) --------------------------------------

    def get_token_layout(self, seq: Sequence) -> tuple[int, int, int]:
        """Prefix-cache probe for a waiting sequence.

        Returns (hit_tokens_in_used_blocks, hit_tokens_in_free_blocks,
        miss_tokens).  Free-list hits are counted separately because they still
        consume free-list capacity on allocate (reference scheduler.py:184-185).
        """
        assert not seq.block_table
        hit_used = hit_free = 0
        n_hit_blocks = 0
        for _i, _tok, _h, block_id in self._match_prefix(seq):
            n_hit_blocks += 1
            if block_id in self.used_ids:
                hit_used += self.block_size
            else:
                hit_free += self.block_size
        miss = len(seq) - n_hit_blocks * self.block_size
        return hit_used, hit_free, miss

    def can_allocate(self, num_tokens: int) -> bool:
        """Free-list capacity check for ``num_tokens`` worth of new blocks."""
        need = (num_tokens + self.block_size - 1) // self.block_size
        return len(self.free_queue) >= need

    def allocate(self, seq: Sequence) -> None:
        """Admit a waiting sequence: consume the prefix-hit chain, then take
        fresh blocks for the first ``num_new_tokens`` scheduled tokens.

        Phase 1 (hits): ref_count++ for used blocks, re-allocation for
        lazily-freed blocks; each hit advances ``num_cached_tokens`` by one
        block (reference block_manager.py:298-317).
        Phase 2 (miss): pop free-list head per block covering
        ``[num_cached, num_cached + num_new)``; full blocks get chained hashes
        registered immediately (reference block_manager.py:320-332).
        """
        assert not seq.block_table and seq.num_cached_tokens == 0
        chain_hash = NO_HASH
        for _i, token_ids, h, block_id in self._match_prefix(seq):
            block = self.blocks[block_id]
            if block_id in self.used_ids:
                block.ref_count += 1
            else:
                block = self._take_free_block(block_id)
            self._register(block, h, token_ids)
            seq.block_table.append(block_id)
            seq.num_cached_tokens += self.block_size
            chain_hash = h

        end = seq.num_cached_tokens + seq.num_new_tokens
        for start in range(seq.num_cached_tokens, end, self.block_size):
            token_ids = seq[start: min(start + self.block_size, end)]
            block = self._take_free_block(self.free_queue[0])
            if len(token_ids) == self.block_size:
                chain_hash = hash_block(token_ids, chain_hash)
                self._register(block, chain_hash, token_ids)
            else:
                chain_hash = NO_HASH
            seq.block_table.append(block.block_id)

    # -- running-queue path (append) -----------------------------------------

    def can_append(self, seq: Sequence, num_new_tokens: int) -> bool:
        """Can the running sequence grow by ``num_new_tokens``?

        Counts blocks beyond the sequence's current table.  When the table
        exactly covers ``num_cached_tokens`` this reduces to the reference's
        trailing-partial-block slack formula (block_manager.py:382-389); it
        additionally credits blocks pre-reserved by the decode-burst path.
        """
        target = (seq.num_cached_tokens + num_new_tokens + self.block_size - 1) \
            // self.block_size
        need = max(0, target - len(seq.block_table))
        return need <= len(self.free_queue)

    def may_append(self, seq: Sequence) -> None:
        """Extend the block table to cover ``num_context_tokens`` and register
        hashes for blocks that become exactly full this step (reference
        block_manager.py:391-438)."""
        end = seq.num_context_tokens
        for start in range(seq.num_cached_blocks * self.block_size, end, self.block_size):
            idx = start // self.block_size
            token_ids = seq[start: min(start + self.block_size, end)]
            if idx < len(seq.block_table):
                block = self.blocks[seq.block_table[idx]]
                # a block still growing must not carry a (full-block) hash yet
                assert block.hash == NO_HASH
            else:
                block = self._take_free_block(self.free_queue[0])
                seq.block_table.append(block.block_id)
            if len(token_ids) == self.block_size:
                if start + self.block_size > len(seq) - seq.num_pending:
                    # async scheduling: the block contains a placeholder token
                    # whose value is still on device — hashing now would
                    # register a wrong prefix.  Deferred to commit_full_blocks
                    # once the value is patched (engine values-postprocess).
                    seq.hash_deferred = True
                    continue
                prev = self.blocks[seq.block_table[idx - 1]].hash if idx > 0 else NO_HASH
                self._register(block, hash_block(token_ids, prev), token_ids)

    def reserve_append_block(self, seq: Sequence) -> bool:
        """Append one fresh (hashless) block to the sequence's table so a
        decode burst can write past the current block boundary.

        No reference equivalent (the reference decodes one token per step and
        never needs lookahead capacity).  The reserved block is exclusively
        owned, carries no hash until it fills (hashes are registered later by
        ``may_append``/``commit_full_blocks``), and is released with the rest
        of the table on deallocate.  Returns False when the free list is empty.
        """
        if not self.free_queue:
            return False
        block = self._take_free_block(self.free_queue[0])
        seq.block_table.append(block.block_id)
        return True

    def commit_full_blocks(self, seq: Sequence, upto_tokens: int | None = None) -> None:
        """Register prefix-cache hashes for owned blocks that became exactly
        full outside the normal may_append path (decode-burst acceptance,
        async deferred hashes).

        Walks the chain over blocks fully covered by ``num_cached_tokens``
        (further clipped to ``upto_tokens`` when given — async callers pass
        ``len(seq) - num_pending`` so no placeholder value is ever hashed);
        blocks already hashed are skipped (their hash is identical by
        construction of the chain).
        """
        n = seq.num_cached_blocks
        if upto_tokens is not None:
            n = min(n, upto_tokens // self.block_size)
        for idx in range(n):
            block = self.blocks[seq.block_table[idx]]
            if block.hash != NO_HASH:
                continue
            prev = self.blocks[seq.block_table[idx - 1]].hash if idx > 0 else NO_HASH
            token_ids = seq.block(idx)
            self._register(block, hash_block(token_ids, prev), token_ids)

    # -- release -------------------------------------------------------------

    def deallocate(self, seq: Sequence) -> None:
        """Release all blocks (finished or preempted sequence); hashes are kept
        on the freed blocks for lazy prefix-cache reuse (reference
        block_manager.py:335-358)."""
        for block_id in reversed(seq.block_table):
            block = self.blocks[block_id]
            block.ref_count -= 1
            if block.ref_count == 0:
                self._release_block(block_id)
        seq.block_table.clear()
        seq.num_cached_tokens = 0
        seq.num_new_tokens = 0

    # -- introspection (observability; not in the reference) -----------------

    @property
    def num_free_blocks(self) -> int:
        return len(self.free_queue)

    @property
    def num_used_blocks(self) -> int:
        return len(self.used_ids)
