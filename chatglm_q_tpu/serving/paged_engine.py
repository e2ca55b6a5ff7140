"""Continuous batching over a paged KV pool.

Same scheduler/slot semantics as :class:`~chatglm_q_tpu.serving.engine.
ServingEngine` (token-exact — tests/test_paged.py), but KV lives in a
shared page pool (models/paged_kv.py) instead of per-slot max-length rows:

* admission allocates ``ceil(tokens_needed / page_size)`` physical pages
  from a free list and writes them into the slot's page-table row; a
  request whose pages don't fit waits in the queue (head-of-line) until
  finishes free pages — memory backpressure instead of OOM;
* pool memory scales with tokens in flight, so the same HBM serves far
  more slots than ``slots × max_seq_len`` dense rows (the reference keeps
  one concat cache per sequence, decoder.py:65-108 — batch-1 only);
* physical page 0 is reserved as a garbage page: inactive slots' in-chunk
  writes land there, and freed slots' table rows are reset to 0 so a
  recycled page can never be written through a stale table.

All jit shapes are static (pool, page table); admission and release only
change page-table *data*, so nothing ever recompiles.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..models import chatglm2 as M
from ..models import paged_kv as PK
from ..ops.sampling import top_p_sampling, greedy_sampling
from .engine import ServingEngine


@partial(jax.jit, static_argnames="n", donate_argnums=(0,))
def _tokbuf_write(tokbuf, row, start, vals, count, n):
    """tokbuf[row, start:start+count] = vals[:count] with DEVICE scalars for
    (row, start, count): one compiled program covers every slot/offset."""
    idx = start + jnp.arange(n)
    idx = jnp.where(jnp.arange(n) < count, idx, tokbuf.shape[1])  # OOB→drop
    return tokbuf.at[row, idx].set(vals, mode="drop")


class PagedServingEngine(ServingEngine):
    # distributed subclass: decode the whole slot batch (static slot→shard
    # groups) instead of a compacted active subset
    _full_batch_decode = False

    def __init__(self, config, params, tokenizer=None, *,
                 num_pages: int = 64, page_size: int = 256,
                 prefix_cache: bool = False,
                 speculative_k: int = 0, speculative_ngram: int = 3,
                 speculative_sampled: bool = False,
                 full_batch_decode: bool | None = None,
                 **kwargs):
        # consumed by _make_cache, which super().__init__ calls
        self.num_pages = num_pages
        self.page_size = page_size
        self.prefix_cache = prefix_cache
        if full_batch_decode is None and not self._full_batch_decode:
            # auto (unless the subclass already forces full-batch — the
            # distributed engine): the tunneled-axon backend faults
            # (INTERNAL) executing compact paged decode programs at several
            # (bucket, pages/row) shapes — (32, 2) and (8, 32) both
            # reproduce; the kernels and the full-batch structure are clean
            # (benchmarks/r5_p32_bisect.sh, docs/RESULTS.md round 5).
            # Full-batch costs little on TPU (decode is weight-stream
            # bound; inactive rows carry length-0 garbage tables), so it
            # is the default there.
            from ..config import _is_tunneled_backend

            full_batch_decode = _is_tunneled_backend()
        if full_batch_decode is not None:
            # decode every slot instead of the compacted active subset
            # (the distributed engine's mode) — see auto rule above
            self._full_batch_decode = full_batch_decode
        # in-graph prompt-lookup speculative decoding (greedy requests):
        # models/spec_decode.py; chunks fall back to plain decode whenever
        # any active request samples (temperature > 0) — unless
        # speculative_sampled, which runs exact rejection sampling against
        # the top-k/top-p filter for sampled rows (distribution-identical
        # to the plain sampler but NOT bit-reproducible against it, so it
        # is opt-in)
        self.speculative_k = speculative_k
        self.speculative_ngram = speculative_ngram
        self.speculative_sampled = speculative_sampled
        assert not kwargs.get("lookahead"), (
            "lookahead dispatch is a dense-engine feature (the paged step "
            "is compact/spec-aware); speculative_k is the paged engine's "
            "host-round-trip amortizer")
        # page-pool allocation is per GROUP: the single-host engine is one
        # group; the distributed engine (dist_engine.py) sets n_data before
        # this runs, partitioning pages and slots into data-shard groups so
        # a row's pages always live on its owning shard.  With the pool
        # additionally sharded over the model axis (n_phase > 1,
        # shard_model_pages), each group subdivides into n_phase PHASE
        # sub-pools: logical page j of a row must come from phase j % tp
        # (that chip's strided slice of the row — the msharded decode
        # kernel reads only phase-local pages).
        self._n_groups = getattr(self, "n_data", 1)
        self._n_phase = getattr(self, "n_phase", 1)
        n_subs = self._n_groups * self._n_phase
        assert num_pages % n_subs == 0, (num_pages, n_subs)
        self._group_pages = num_pages // self._n_groups
        self._sub_pages = num_pages // n_subs
        assert self._sub_pages >= 2, "each sub-pool needs a garbage page + 1"
        super().__init__(config, params, tokenizer, **kwargs)
        if self.prefill_chunk_size is not None:
            assert self.prefill_chunk_size % page_size == 0, (
                "chunked prefill over pages requires page-aligned chunks")
        if prefix_cache:
            # a prefix hit resumes prefill at a page-aligned offset — that
            # is exactly the chunked-prefill entry point
            assert self.prefill_chunk_size is not None, (
                "prefix_cache requires prefill_chunk_size")
        # each (group, phase) sub-pool's FIRST page is its reserved garbage
        # page (inactive slots write there); the single-group engine's is
        # physical page 0
        self._free = [
            [
                list(range((g * self._n_phase + m) * self._sub_pages + 1,
                           (g * self._n_phase + m + 1) * self._sub_pages))
                for m in range(self._n_phase)
            ]
            for g in range(self._n_groups)
        ]
        self._slot_pages: dict[int, list[int]] = {}
        # refcount per allocated physical page: slots and prefix-registry
        # entries each hold one reference; a page returns to the free list
        # at zero
        self._page_refs: dict[int, int] = {}
        # per group: page-aligned token prefix → its KV pages, LRU order
        # (evicted, releasing the registry's references, under pressure)
        from collections import OrderedDict
        self._prefix_lrus: list["OrderedDict[tuple, list[int]]"] = [
            OrderedDict() for _ in range(self._n_groups)
        ]
        # per-slot garbage PATTERN (max_batch, MP): logical block j of an
        # inactive row points at the garbage page of its own (group,
        # j % n_phase) sub-pool — writes stay shard-local on every axis
        mp = self.cache.page_table.shape[1]
        self._garbage = np.array(
            [[(self._slot_group(b) * self._n_phase + j % self._n_phase)
              * self._sub_pages for j in range(mp)]
             for b in range(self.max_batch)], np.int32)
        self.stats.update(prefix_hits=0, prefix_tokens_reused=0,
                          spec_accepted=0, spec_steps=0)
        # device-side token history (rows valid below cache.lengths) for
        # n-gram drafting; prompt rows written at admission
        self._tokbuf = jnp.zeros((self.max_batch, self.max_seq_len), jnp.int32)

    def _slot_group(self, slot_idx: int) -> int:
        return slot_idx // (self.max_batch // self._n_groups)

    def _make_cache(self):
        return PK.init_paged_kv_cache(
            self.mc, self.max_batch, self.num_pages,
            self.max_seq_len, self.page_size, self.kv_dtype,
        )

    @property
    def pages_in_use(self) -> int:
        return sum(len(p) for p in self._slot_pages.values())

    @property
    def pages_cached(self) -> int:
        return sum(len(p) for lru in self._prefix_lrus for p in lru.values())

    @property
    def _free_pages(self) -> list:
        """All free pages across groups/phases (introspection/tests)."""
        return [p for g in self._free for fl in g for p in fl]

    # -- page refcounting ------------------------------------------------

    def _retain(self, pages):
        for p in pages:
            self._page_refs[p] = self._page_refs.get(p, 0) + 1

    def _release(self, pages):
        for p in pages:
            self._page_refs[p] -= 1
            if self._page_refs[p] == 0:
                del self._page_refs[p]
                g, m = divmod(p // self._sub_pages, self._n_phase)
                self._free[g][m].append(p)

    def _alloc(self, n: int, group: int = 0, start_block: int = 0):
        """Take n fresh pages from ``group``'s pool (ref 1 each) for the
        row's logical blocks ``start_block..start_block+n-1`` — block j
        draws from phase sub-pool ``j % n_phase`` (single-phase engines:
        one sub-pool, plain allocation) — evicting the group's LRU prefix
        entries under pressure; None if the group cannot satisfy it."""
        frees, lru = self._free[group], self._prefix_lrus[group]
        phases = [(start_block + i) % self._n_phase for i in range(n)]
        need = [phases.count(m) for m in range(self._n_phase)]

        def shortage():
            return any(len(frees[m]) < need[m]
                       for m in range(self._n_phase))

        if shortage():
            # evict only if eviction can actually cover the shortage: a page
            # also held by an active slot stays allocated after its registry
            # reference drops, so popping the whole LRU could free ZERO
            # pages while wiping the prefix cache the next requests need
            if not lru:
                return None
            import collections as _c
            reg_refs = _c.Counter()
            for pages in lru.values():
                reg_refs.update(pages)
            potential = [0] * self._n_phase
            for p, r in reg_refs.items():
                if self._page_refs.get(p, 0) == r:  # registry-only refs
                    potential[(p // self._sub_pages) % self._n_phase] += 1
            if any(len(frees[m]) + potential[m] < need[m]
                   for m in range(self._n_phase)):
                return None

        while shortage() and lru:
            key, pages = lru.popitem(last=False)
            self._release(pages)
            if self.logger:
                self.logger.log("prefix_evict", tokens=len(key),
                                pages=len(pages))
        if shortage():
            return None
        pages = [frees[m].pop() for m in phases]
        self._retain(pages)
        return pages

    # -- prefix cache ----------------------------------------------------

    def _match_prefix(self, ids: list, group: int = 0, peek: bool = False):
        """Longest prefix registered in ``group`` that is page-aligned and
        strictly shorter than the prompt (the final token must prefill so
        its logits exist).  ``peek`` skips the LRU touch (admission-affinity
        scoring probes must not reorder evictions)."""
        P = self.page_size
        lru = self._prefix_lrus[group]
        for k in range((len(ids) - 1) // P, 0, -1):
            key = tuple(ids[: k * P])
            if key in lru:
                if not peek:
                    lru.move_to_end(key)
                return list(lru[key]), k * P
        return [], 0

    def _start_decoding(self, slot_idx, req, logits, n_ids):
        if self.prefix_cache:
            # the prompt's KV is fully written: publish EVERY page-aligned
            # prefix length for reuse — a later prompt sharing only the
            # head (system prompt, few-shot header) must match the shared
            # pages, not this prompt's full span.  Entries share page
            # objects via refcounts; the registry holds one reference per
            # entry per page.  Registration goes to the slot's OWN group:
            # its pages live on that shard, and the distributed admission
            # routes prefix-sharing requests there (prefix affinity).
            lru = self._prefix_lrus[self._slot_group(slot_idx)]
            ids = self._sliced_prompt(req)
            kmax = (len(ids) - 1) // self.page_size
            for k in range(1, kmax + 1):
                key = tuple(ids[: k * self.page_size])
                if key not in lru:
                    pages = self._slot_pages[slot_idx][:k]
                    self._retain(pages)
                    lru[key] = pages
        super()._start_decoding(slot_idx, req, logits, n_ids)

    def clear_prefix_cache(self):
        for lru in self._prefix_lrus:
            while lru:
                _, pages = lru.popitem(last=False)
                self._release(pages)

    # -- programs --------------------------------------------------------

    def _build_programs(self):
        qt = self.config.quant_type

        @partial(jax.jit, static_argnames=("bucket",), donate_argnums=(1,))
        def _prefill_into_slot(params, cache, ids_1xS, length, slot, bucket):
            # B=1 view over the shared pool through the slot's table row
            ptrow = jax.lax.dynamic_index_in_dim(cache.page_table, slot, 0)
            sub = PK.PagedKVCache(
                k_pool=cache.k_pool, v_pool=cache.v_pool,
                page_table=ptrow, lengths=jnp.zeros((1,), jnp.int32),
            )
            logits, sub = PK.prefill_paged(
                params, self.mc, ids_1xS, length[None], sub, qt, self.dtype,
                self.rt,
            )
            return logits[0], cache.replace(
                k_pool=sub.k_pool, v_pool=sub.v_pool,
                lengths=cache.lengths.at[slot].set(length),
            )

        @partial(jax.jit, donate_argnums=(1,))
        def _prefill_chunk_compact(params, cache, ids_PBxSc, starts, valids, slots):
            # COMPACT chunk batch: only the mid-prefill slots' rows are
            # computed (the dense engine's batched chunk runs all max_batch
            # rows — B× wasted MXU flops when one prompt is admitting).
            # The page table provides the row indirection for free: the
            # compact rows' writes and gathers go through their own table
            # rows; no cache-row copies.
            pt_rows = jnp.take(cache.page_table, slots, axis=0)
            sub = PK.PagedKVCache(
                k_pool=cache.k_pool, v_pool=cache.v_pool,
                page_table=pt_rows, lengths=starts.astype(jnp.int32),
            )
            logits, sub = PK.prefill_chunk_paged(
                params, self.mc, ids_PBxSc, starts, valids, sub, qt,
                self.dtype, self.rt,
            )
            new_lengths = cache.lengths
            for i in range(slots.shape[0]):
                new_lengths = new_lengths.at[slots[i]].set(sub.lengths[i])
            return logits, cache.replace(
                k_pool=sub.k_pool, v_pool=sub.v_pool, lengths=new_lengths)

        @partial(jax.jit, static_argnames=("n", "top_k", "full_batch"),
                 donate_argnums=(1,))
        def _decode_chunk_compact(params, cache, first_tok, rng, real,
                                  sampling, slots, garb, n, top_k,
                                  full_batch=False):
            # COMPACT decode: only the active slots' rows are computed
            # (bucketed to a power of two).  Padding rows (real == False)
            # get their group's garbage-page table row and length 0, so
            # their writes are discarded — free and mid-prefill slots
            # simply aren't in the batch, which removes the dense path's
            # whole garbage-write analysis.  ``full_batch`` (distributed
            # engine) decodes ALL slots in place instead: the slot→data-
            # shard mapping is static, so no cross-shard row gather exists.
            temperature, top_p, top_k_limit = sampling
            if full_batch:
                pt_rows, lens_src = cache.page_table, cache.lengths
            else:
                pt_rows = jnp.take(cache.page_table, slots, axis=0)
                lens_src = jnp.take(cache.lengths, slots)
            pt_rows = jnp.where(real[:, None], pt_rows, garb)
            lens = jnp.where(real, lens_src, 0)
            sub = PK.PagedKVCache(
                k_pool=cache.k_pool, v_pool=cache.v_pool,
                page_table=pt_rows, lengths=lens.astype(jnp.int32),
            )

            def step(carry, rng_step):
                tok, sub = carry
                logits, sub = PK.decode_step_paged(
                    params, self.mc, tok, sub, qt, self.dtype, self.rt
                )
                safe_t = jnp.where(temperature > 0, temperature, 1.0)
                sampled = top_p_sampling(
                    rng_step, logits, top_k, top_p[:, None], safe_t[:, None],
                    top_k_limit=top_k_limit[:, None],
                )
                greedy = greedy_sampling(logits)
                nxt = jnp.where(temperature > 0, sampled, greedy).astype(jnp.int32)
                return (nxt, sub), nxt

            rngs = jax.random.split(rng, n)
            (last, sub), toks = jax.lax.scan(step, (first_tok, sub), rngs)
            if full_batch:
                new_lengths = jnp.where(real, sub.lengths, cache.lengths)
            else:
                new_lengths = cache.lengths
                for i in range(slots.shape[0]):
                    new_lengths = new_lengths.at[slots[i]].set(
                        jnp.where(real[i], sub.lengths[i], new_lengths[slots[i]]))
            return toks.T, cache.replace(
                k_pool=sub.k_pool, v_pool=sub.v_pool, lengths=new_lengths)

        @partial(jax.jit, static_argnames=("n", "k", "ngram", "full_batch",
                                           "top_k"),
                 donate_argnums=(1, 2))
        def _spec_chunk_compact(params, cache, tokbuf, first_tok, real, slots,
                                garb, n, k, ngram, full_batch=False,
                                rng=None, sampling=None, top_k=100):
            # compact speculative chunk: models/spec_decode.py loop over the
            # active slots' rows (padding rows: garbage tables, length 0);
            # full_batch as in _decode_chunk_compact (distributed engine);
            # rng+sampling switch sampled rows to exact rejection sampling
            from ..models import spec_decode as SD

            if full_batch:
                pt_rows, lens_src, tb = cache.page_table, cache.lengths, tokbuf
            else:
                pt_rows = jnp.take(cache.page_table, slots, axis=0)
                lens_src = jnp.take(cache.lengths, slots)
                tb = jnp.take(tokbuf, slots, axis=0)
            pt_rows = jnp.where(real[:, None], pt_rows, garb)
            lens = jnp.where(real, lens_src, 0)
            sub = PK.PagedKVCache(
                k_pool=cache.k_pool, v_pool=cache.v_pool,
                page_table=pt_rows, lengths=lens.astype(jnp.int32),
            )
            drafts, accepts, nexts, sub, tb = SD.speculative_decode_paged(
                params, self.mc, first_tok, sub, tb, n, k, ngram,
                qt, self.dtype, self.rt, rng=rng, sampling=sampling,
                top_k=top_k,
            )
            if full_batch:
                new_lengths = jnp.where(real, sub.lengths, cache.lengths)
                tokbuf = jnp.where(real[:, None], tb, tokbuf)
            else:
                new_lengths = cache.lengths
                for i in range(slots.shape[0]):
                    new_lengths = new_lengths.at[slots[i]].set(
                        jnp.where(real[i], sub.lengths[i], new_lengths[slots[i]]))
                    tokbuf = tokbuf.at[slots[i]].set(
                        jnp.where(real[i], tb[i], tokbuf[slots[i]]))
            cache = cache.replace(k_pool=sub.k_pool, v_pool=sub.v_pool,
                                  lengths=new_lengths)
            return drafts, accepts, nexts, cache, tokbuf

        self._prefill_into_slot = _prefill_into_slot
        self._decode_chunk_compact = _decode_chunk_compact
        self._prefill_chunk_compact = _prefill_chunk_compact
        self._spec_chunk_compact = _spec_chunk_compact

    def step(self) -> list:
        """Admit, advance prefill chunks, one COMPACT decode chunk over the
        active slots only (full-batch in the distributed engine, where the
        slot→shard mapping is static)."""
        self._admit()
        self._advance_prefills()
        started, self._started_events = self._started_events, []
        active = [b for b, s in enumerate(self.slots) if s.decoding]
        if not active:
            self.stats["steps"] += 1
            return started
        n = self.chunk
        full = self._full_batch_decode
        if full:
            PB = self.max_batch
            slots = list(range(PB))
            real = np.array([self.slots[b].decoding for b in slots], bool)
            rows = {b: b for b in active}
        else:
            PB = min(1 << (len(active) - 1).bit_length(), self.max_batch)
            slots = active + [0] * (PB - len(active))
            real = np.zeros((PB,), bool)
            real[: len(active)] = True
            rows = {b: i for i, b in enumerate(active)}
        reqs = [self.slots[b].request for b in active]
        all_greedy = all(r.temperature == 0 for r in reqs)
        if self.speculative_k and (all_greedy or self.speculative_sampled):
            return self._spec_step(started, active, slots, real, n, rows,
                                   full, sampled=not all_greedy)

        def per_row(attr, default, dtype):
            return np.array(
                [getattr(self.slots[b].request, attr)
                 if real[i] else default
                 for i, b in enumerate(slots)], dtype)

        temps = per_row("temperature", 0.0, np.float32)
        tops = per_row("top_p", 1.0, np.float32)
        top_ks = per_row("top_k", 1, np.int32)
        first = np.array([self._last_tok[b] for b in slots], np.int32)
        garb = self._garbage[np.asarray(slots)]
        sort_k = self._sort_width(top_ks)
        self._rng, sub = jax.random.split(self._rng)
        toks, self.cache = self._decode_chunk_compact(
            self.params, self.cache, jnp.asarray(first), sub,
            jnp.asarray(real),
            (jnp.asarray(temps), jnp.asarray(tops), jnp.asarray(top_ks)),
            jnp.asarray(slots, dtype=jnp.int32), jnp.asarray(garb),
            n, sort_k, full_batch=full,
        )
        toks = self._fetch(toks)  # (PB, n)
        out = started
        for b in active:
            i = rows[b]
            prev_pending = int(self._last_tok[b])
            res = self._consume_slot_tokens(b, toks[i], n)
            out.append(res)
            if self.speculative_k:
                # keep the device token history in sync for later
                # speculative chunks (this chunk ran the plain path).
                # Cache positions gained this chunk hold the previous
                # pending token + all but the last emitted one (the new
                # pending token is not placed yet).  ONE jitted program
                # serves every (slot, offset, count): eager .at[] slices
                # with python-int bounds would bake a fresh executable per
                # slot per chunk (minutes each on remote-compile tunnels).
                placed = [prev_pending] + res[1][:-1]
                l_after = int(self._host_lengths[b])
                vals = np.zeros((n,), np.int32)
                vals[: len(placed)] = placed
                self._tokbuf = _tokbuf_write(
                    self._tokbuf, b, l_after - len(placed),
                    jnp.asarray(vals), len(placed), n)
        self.stats["steps"] += 1
        self.stats["decode_chunks"] += 1
        return out

    def _spec_step(self, started, active, slots, real, n, rows=None,
                   full=False, sampled=False):
        garb = self._garbage[np.asarray(slots)]
        extra = {}
        if sampled:
            # per-row sampling params (inactive/padding rows: greedy)
            def per_row(attr, default, dtype):
                return jnp.asarray(
                    [getattr(self.slots[b].request, attr)
                     if real[i] and self.slots[b].request else default
                     for i, b in enumerate(slots)], dtype)

            temps = per_row("temperature", 0.0, jnp.float32)
            tops = per_row("top_p", 1.0, jnp.float32)
            top_ks = per_row("top_k", 1, jnp.int32)
            sort_k = self._sort_width(top_ks)
            self._rng, sub = jax.random.split(self._rng)
            extra = dict(rng=sub, sampling=(temps, tops, top_ks),
                         top_k=sort_k)
        drafts, accepts, nexts, self.cache, self._tokbuf =             self._spec_chunk_compact(
                self.params, self.cache, self._tokbuf,
                jnp.asarray([self._last_tok[b] for b in slots], jnp.int32),
                jnp.asarray(real), jnp.asarray(slots, dtype=jnp.int32),
                jnp.asarray(garb), n, self.speculative_k,
                self.speculative_ngram, full_batch=full, **extra,
            )
        # _fetch, not np.asarray: under multi-process these are sharded
        # over the data axis (non-addressable shards) like the plain
        # chunk's toks
        drafts, accepts, nexts = map(self._fetch, (drafts, accepts, nexts))
        out = started
        if rows is None:
            rows = {b: i for i, b in enumerate(active)}
        for b in active:
            i = rows[b]
            row = []
            for s in range(n):
                a = int(accepts[s, i])
                row += drafts[s, i, :a].tolist() + [int(nexts[s, i])]
                self.stats["spec_accepted"] += a
            out.append(self._consume_slot_tokens(b, row, len(row)))
        self.stats["steps"] += 1
        self.stats["decode_chunks"] += 1
        self.stats["spec_steps"] += n
        return out

    # -- page allocation -------------------------------------------------

    def _pages_needed(self, req) -> int:
        reserve = max(1, min(req.max_new_tokens, 64))
        keep = max(1, self.max_seq_len - reserve)
        n_ids = len(req.prompt_ids[-keep:])
        bucket = self._bucket(n_ids)
        # +slack: in-chunk over-generation past the budget writes before the
        # host rolls it back; those writes must stay inside owned pages
        # (speculative chunks can advance up to (k+1) positions per step)
        slack = self.chunk * (self.speculative_k + 1 if self.speculative_k else 1)
        tokens = min(max(bucket, n_ids + req.max_new_tokens + slack),
                     self.max_seq_len)
        return -(-tokens // self.page_size)

    def submit(self, prompt_ids: list, **kwargs) -> int:
        """Reject a request that can NEVER fit one group's page pool —
        otherwise it would sit at the queue head with _try_admit returning
        False forever while has_work stays True (admission livelock)."""
        rid = super().submit(prompt_ids, **kwargs)
        req = self.queue[-1]
        need = self._pages_needed(req)
        worst_per_phase = -(-need // self._n_phase)
        usable = self._sub_pages - 1  # one garbage page per sub-pool
        if worst_per_phase > usable:
            self.queue.pop()
            raise ValueError(
                f"request needs {need} KV pages (≥{worst_per_phase}/phase) "
                f"but a group's sub-pool holds only {usable} usable pages — "
                f"raise num_pages or lower max_new_tokens/prompt length")
        return rid

    def _admit(self):
        for slot_idx, slot in enumerate(self.slots):
            if slot.request is not None or not self.queue:
                continue
            if not self._try_admit(slot_idx, self.queue[0]):
                return  # backpressure: wait for finishes to free pages
            self.queue.pop(0)

    def _try_admit(self, slot_idx: int, req) -> bool:
        """Allocate pages from the slot's group and start the request in
        ``slot_idx``; False (nothing changed) if the group's pool cannot
        satisfy it."""
        group = self._slot_group(slot_idx)
        ids = self._sliced_prompt(req)
        shared, shared_tokens = (
            self._match_prefix(ids, group) if self.prefix_cache else ([], 0))
        fresh_needed = self._pages_needed(req) - len(shared)
        # retain BEFORE _alloc: its LRU eviction could otherwise free
        # the very pages just matched
        self._retain(shared)
        fresh = self._alloc(max(fresh_needed, 0), group,
                            start_block=len(shared))
        if fresh is None:
            self._release(shared)
            if self.logger:
                self.logger.log("admit_wait", req_id=req.req_id,
                                group=group, pages_needed=fresh_needed,
                                pages_free=sum(len(f) for f in self._free[group]))
            return False
        pages = shared + fresh
        self._slot_pages[slot_idx] = pages
        row = self._garbage[slot_idx].copy()
        row[: len(pages)] = pages
        self.cache = self.cache.replace(
            page_table=self.cache.page_table.at[slot_idx].set(
                jnp.asarray(row))
        )
        if self.speculative_k:
            row = np.zeros((self.max_seq_len,), np.int32)
            row[: len(ids)] = ids
            self._tokbuf = self._tokbuf.at[slot_idx].set(jnp.asarray(row))
        if shared_tokens:
            self.stats["prefix_hits"] += 1
            self.stats["prefix_tokens_reused"] += shared_tokens
            if self.logger:
                self.logger.log("prefix_hit", req_id=req.req_id,
                                tokens=shared_tokens, pages=len(shared))
        if self.prefill_chunk_size is not None:
            self._assign_chunked(slot_idx, req)
            # resume prefill after the reused prefix (page-aligned)
            self.slots[slot_idx].pending_pos = shared_tokens
            self._host_lengths[slot_idx] = shared_tokens
            self.cache = self.cache.replace(
                lengths=self.cache.lengths.at[slot_idx].set(shared_tokens))
        else:
            self._admit_into_slot(slot_idx, req)
        return True

    def _maybe_finish(self, slot_idx: int):
        super()._maybe_finish(slot_idx)
        if self.slots[slot_idx].request is None and self._slot_pages.get(slot_idx):
            self._release(self._slot_pages.pop(slot_idx))
            # reset the table row so a recycled page can't be written through
            # a stale mapping (inactive-slot chunk writes must hit the
            # owning group's garbage page)
            self.cache = self.cache.replace(
                page_table=self.cache.page_table.at[slot_idx].set(
                    jnp.asarray(self._garbage[slot_idx]))
            )
