"""Unit tests for the paged-KV block manager and hash-chained prefix cache.

Covers the invariants catalogued in SURVEY.md §2.2 (reference
block_manager.py:92-438): hash chaining, lazy eviction, last-block-miss,
FIFO free-list discipline, ref-counted sharing, and hit validation.
"""

import pytest

from nanovllm_tpu.engine.block_manager import BlockManager, hash_block, NO_HASH
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.sampling_params import SamplingParams

BS = 4  # tiny block size so tests exercise many blocks


def make_seq(tokens, block_size=BS):
    return Sequence(list(tokens), SamplingParams(), block_size=block_size)


def full_alloc(bm, seq):
    """Admit a waiting seq scheduling all its tokens at once."""
    hit_used, hit_free, miss = bm.get_token_layout(seq)
    seq.num_new_tokens = miss
    bm.allocate(seq)
    return hit_used, hit_free, miss


def commit(seq):
    seq.num_cached_tokens += seq.num_new_tokens
    seq.num_new_tokens = 0


class TestHashChain:
    def test_chained_hash_differs_by_prefix(self):
        t = list(range(BS))
        assert hash_block(t) != hash_block(t, prefix_hash=12345)
        assert hash_block(t) == hash_block(t)

    def test_full_blocks_get_hashes_partial_do_not(self):
        bm = BlockManager(8, BS)
        seq = make_seq(range(10))  # 2 full blocks + 1 partial
        full_alloc(bm, seq)
        b0, b1, b2 = (bm.blocks[i] for i in seq.block_table)
        assert b0.hash != NO_HASH and b1.hash != NO_HASH
        assert b2.hash == NO_HASH
        assert b1.hash == hash_block(list(range(BS, 2 * BS)), b0.hash)


class TestAllocateAndPrefixCache:
    def test_fresh_allocate_no_hits(self):
        bm = BlockManager(8, BS)
        seq = make_seq(range(9))
        hit_used, hit_free, miss = full_alloc(bm, seq)
        assert (hit_used, hit_free, miss) == (0, 0, 9)
        assert len(seq.block_table) == 3
        assert bm.num_used_blocks == 3

    def test_prefix_hit_on_used_blocks_shares_refcount(self):
        bm = BlockManager(8, BS)
        a = make_seq(range(10))
        full_alloc(bm, a)
        commit(a)
        b = make_seq(range(10))
        hit_used, hit_free, miss = bm.get_token_layout(b)
        assert hit_used == 2 * BS and hit_free == 0 and miss == 2
        b.num_new_tokens = miss
        bm.allocate(b)
        assert b.block_table[:2] == a.block_table[:2]
        assert b.block_table[2] != a.block_table[2]  # partial block not shared
        assert bm.blocks[a.block_table[0]].ref_count == 2

    def test_last_block_always_miss_even_if_full_and_cached(self):
        bm = BlockManager(8, BS)
        a = make_seq(range(2 * BS))  # exactly 2 full blocks
        full_alloc(bm, a)
        commit(a)
        b = make_seq(range(2 * BS))
        hit_used, hit_free, miss = bm.get_token_layout(b)
        # block 1 is b's final block: treated as a miss -> >=1 token to compute
        assert hit_used == BS and miss == BS

    def test_lazy_eviction_hit_in_free_list(self):
        bm = BlockManager(8, BS)
        a = make_seq(range(10))
        full_alloc(bm, a)
        bm.deallocate(a)
        assert bm.num_free_blocks == 8
        b = make_seq(range(10))
        hit_used, hit_free, miss = bm.get_token_layout(b)
        assert hit_used == 0 and hit_free == 2 * BS and miss == 2
        b.num_new_tokens = miss
        bm.allocate(b)
        assert b.num_cached_tokens == 2 * BS

    def test_freed_hash_purged_when_block_reused_for_new_content(self):
        bm = BlockManager(2, BS)
        a = make_seq(range(BS + 1))
        full_alloc(bm, a)
        old_hash = bm.blocks[a.block_table[0]].hash
        bm.deallocate(a)
        # both blocks recycled for different content
        c = make_seq(range(100, 100 + 2 * BS - 1))
        full_alloc(bm, c)
        assert old_hash not in bm.hash_to_block
        d = make_seq(range(BS + 1))
        hit_used, hit_free, miss = bm.get_token_layout(d)
        assert hit_free == 0 and miss == BS + 1

    def test_hit_validation_rejects_hash_collision(self):
        bm = BlockManager(8, BS)
        a = make_seq(range(BS + 1))
        full_alloc(bm, a)
        # forge a collision: same hash registered, different stored tokens
        blk = bm.blocks[a.block_table[0]]
        blk.token_ids = [999] * BS
        b = make_seq(range(BS + 1))
        hit_used, hit_free, miss = bm.get_token_layout(b)
        assert hit_used == 0 and hit_free == 0 and miss == BS + 1

    def test_can_allocate_counts_blocks(self):
        bm = BlockManager(2, BS)
        assert bm.can_allocate(2 * BS)
        assert not bm.can_allocate(2 * BS + 1)


class TestAppendPath:
    def test_decode_append_within_partial_block(self):
        bm = BlockManager(8, BS)
        seq = make_seq(range(BS + 1))
        full_alloc(bm, seq)
        commit(seq)
        seq.append_token(77)
        assert bm.can_append(seq, 1)
        seq.num_new_tokens = 1
        bm.may_append(seq)
        assert len(seq.block_table) == 2  # partial block had room

    def test_decode_append_allocates_new_block_at_boundary(self):
        bm = BlockManager(8, BS)
        seq = make_seq(range(BS))
        full_alloc(bm, seq)
        commit(seq)
        seq.append_token(77)
        seq.num_new_tokens = 1
        bm.may_append(seq)
        assert len(seq.block_table) == 2
        assert bm.blocks[seq.block_table[1]].hash == NO_HASH

    def test_block_filling_registers_hash_for_prefix_cache(self):
        bm = BlockManager(8, BS)
        seq = make_seq(range(BS - 1))
        full_alloc(bm, seq)
        commit(seq)
        seq.append_token(BS - 1)  # completes block 0 with tokens 0..BS-1
        seq.num_new_tokens = 1
        bm.may_append(seq)
        commit(seq)
        blk = bm.blocks[seq.block_table[0]]
        assert blk.hash == hash_block(list(range(BS)))
        assert bm.hash_to_block[blk.hash] == blk.block_id

    def test_can_append_false_when_no_free_blocks(self):
        bm = BlockManager(1, BS)
        seq = make_seq(range(BS))
        full_alloc(bm, seq)
        commit(seq)
        seq.append_token(7)
        assert not bm.can_append(seq, 1)

    def test_chunked_prefill_walks_blocks_incrementally(self):
        bm = BlockManager(8, BS)
        seq = make_seq(range(3 * BS + 2))
        # admit with a partial chunk
        hit_used, hit_free, miss = bm.get_token_layout(seq)
        seq.num_new_tokens = BS + 2  # chunk smaller than prompt
        bm.allocate(seq)
        commit(seq)
        assert len(seq.block_table) == 2
        # next chunk through the running path
        remaining = len(seq) - seq.num_cached_tokens
        assert bm.can_append(seq, remaining)
        seq.num_new_tokens = remaining
        bm.may_append(seq)
        commit(seq)
        assert len(seq.block_table) == 4
        # all full blocks now hashed
        hashed = [bm.blocks[b].hash != NO_HASH for b in seq.block_table]
        assert hashed == [True, True, True, False]


class TestDeallocate:
    def test_deallocate_resets_cursor_and_frees_fifo_tail(self):
        bm = BlockManager(4, BS)
        seq = make_seq(range(2 * BS))
        full_alloc(bm, seq)
        first_block = seq.block_table[0]
        bm.deallocate(seq)
        assert seq.block_table == [] and seq.num_cached_tokens == 0
        # released in reverse, appended to tail -> head of free queue is the
        # never-used blocks, maximizing cached-block lifetime
        assert list(bm.free_queue)[-1] == first_block

    def test_shared_block_not_freed_until_last_ref(self):
        bm = BlockManager(8, BS)
        a = make_seq(range(BS + 1))
        full_alloc(bm, a)
        commit(a)
        b = make_seq(range(BS + 1))
        full_alloc(bm, b)
        shared = a.block_table[0]
        assert b.block_table[0] == shared
        bm.deallocate(a)
        assert shared in bm.used_ids
        bm.deallocate(b)
        assert shared not in bm.used_ids

    def test_preempted_seq_rehits_its_own_freed_blocks(self):
        """A preempted sequence re-admitted later hits its lazily-freed blocks
        (the subtle interleaving called out in SURVEY.md §7.3)."""
        bm = BlockManager(8, BS)
        seq = make_seq(range(2 * BS + 1))
        full_alloc(bm, seq)
        commit(seq)
        old_blocks = list(seq.block_table)
        bm.deallocate(seq)  # preempt
        hit_used, hit_free, miss = bm.get_token_layout(seq)
        assert hit_free == 2 * BS and miss == 1
        seq.num_new_tokens = miss
        bm.allocate(seq)
        assert seq.block_table[:2] == old_blocks[:2]
