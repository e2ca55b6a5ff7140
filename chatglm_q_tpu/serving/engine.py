"""Slot-based continuous batching engine.

The reference serves batch-1 with a Python decode loop
(/root/reference/chatglm_q/decoder.py:65-108).  This engine re-creates that
capability at production shape, the TPU way (SURVEY.md §7 step 7):

* a persistent KV cache with ``max_batch`` **slots** (fixed shapes under
  jit; per-slot lengths make the batch ragged);
* **admission between decode steps**: a new request is prefilled into a
  free slot (bucketed prompt length → bounded compile set) and scattered
  into the big cache with ``lax.dynamic_update_slice`` while other slots
  keep decoding;
* **chunked decode**: ``decode_chunk`` runs N decode+sample steps fully
  on-device (``lax.scan``) between host synchronizations, so host RTT is
  amortized across N tokens; finished sequences are retired at chunk
  boundaries (their slots are freed and their over-generated tail
  discarded);
* per-slot sampling state (PRNG streams) and eos/length termination.

Single-host engine; each data-parallel shard of a multi-host deployment
runs one engine instance over its local batch slots.
"""
from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import GLMLoadConfig, TpuRuntimeConfig
from ..models import chatglm2 as M
from ..ops.sampling import top_p_sampling, greedy_sampling
from .chat import process_response

_DEFAULT_RT = TpuRuntimeConfig()


@dataclass
class Request:
    req_id: int
    prompt_ids: list
    max_new_tokens: int = 256
    temperature: float = 1.0
    top_p: float = 0.8
    top_k: int = 100
    # filled by the engine
    generated: list = field(default_factory=list)
    done: bool = False


@dataclass
class _Slot:
    request: Optional[Request] = None
    budget: int = 0
    # chunked-prefill state: remaining prompt ids and absolute position of
    # the next chunk; None when the slot is decoding (or free)
    pending_ids: Optional[list] = None
    pending_pos: int = 0

    @property
    def decoding(self) -> bool:
        return self.request is not None and self.pending_ids is None


class ServingEngine:
    def __init__(
        self,
        config: GLMLoadConfig,
        params: dict,
        tokenizer=None,
        max_batch: int = 8,
        max_seq_len: Optional[int] = None,
        decode_chunk: int = 16,
        prefill_chunk_size: Optional[int] = None,
        rt: TpuRuntimeConfig = _DEFAULT_RT,
        dtype=None,
        kv_dtype=None,
        seed: int = 0,
        logger=None,  # optional chatglm_q_tpu.utils.logging.StructuredLogger
        lookahead: bool = False,
    ):
        self.config = config
        self.mc = config.model_config
        self.params = params
        self.tokenizer = tokenizer
        self.rt = rt
        self.dtype = dtype or config.activation_dtype
        self.max_batch = max_batch
        self.max_seq_len = max_seq_len or self.mc.max_sequence_length
        self.chunk = decode_chunk
        # chunked admission: prompts prefill in fixed-size chunks batched
        # across slots, one chunk call per step, so a long prompt never
        # stalls the decode stream (None = whole-prompt admission)
        self.prefill_chunk_size = prefill_chunk_size
        self.eos_token_id = tokenizer["</s>"] if tokenizer is not None else 2

        self.kv_dtype = kv_dtype or self.dtype
        self.logger = logger
        self.stats = {"steps": 0, "admitted": 0, "finished": 0,
                      "generated_tokens": 0, "decode_chunks": 0}
        self.cache = self._make_cache()
        self.slots = [_Slot() for _ in range(max_batch)]
        self.queue: list[Request] = []
        self.finished: list[Request] = []
        # (req_id, [first_token]) events since the last step() return —
        # the admission-time sample must reach run_stream consumers too
        self._started_events: list[tuple[int, list]] = []
        self._req_counter = itertools.count()
        self._rng = jax.random.PRNGKey(seed)
        # last sampled token per slot (feeds the next decode step)
        self._last_tok = np.zeros((max_batch,), np.int32)
        # host-side mirror of cache.lengths: finish checks and boundary
        # clamps must not pay a device fetch per slot per step
        self._host_lengths = np.zeros((max_batch,), np.int64)
        # lookahead dispatch: chunk N+1 is submitted (chained on chunk N's
        # DEVICE tokens) before chunk N is fetched to the host, so the
        # host-side consume + scheduling + tunnel RTT hide behind device
        # compute.  One-chunk result lag; slots that finish inside chunk N
        # decode one discarded chunk (their writes land above the rolled-
        # back lengths / get overwritten by the next admission — the
        # engine's standard invalidation rule).
        self.lookahead = lookahead
        self._pending = None  # (toks_device, {slot: req_id at dispatch})

        self._build_programs()

    def _make_cache(self):
        return M.init_kv_cache(self.mc, self.max_batch, self.max_seq_len,
                               self.kv_dtype)

    def _build_programs(self):
        """Compile-once jit closures for slot prefill and chunked decode
        (overridden by the paged engine)."""
        qt = self.config.quant_type

        @partial(jax.jit, static_argnames=("bucket",), donate_argnums=(1,))
        def _prefill_into_slot(params, cache, ids_1xS, length, slot, bucket):
            # prefill a batch-1 temp cache, then scatter into the big cache
            tmp = M.init_kv_cache(self.mc, 1, self.max_seq_len, self.kv_dtype)
            logits, tmp = M.prefill(
                params, self.mc, ids_1xS, length[None], tmp, qt, self.dtype, self.rt
            )
            new_k = jax.lax.dynamic_update_slice(
                cache.k, tmp.k, (0, slot, 0, 0, 0)
            )
            new_v = jax.lax.dynamic_update_slice(
                cache.v, tmp.v, (0, slot, 0, 0, 0)
            )
            new_lengths = cache.lengths.at[slot].set(length)
            return logits[0], M.KVCache(k=new_k, v=new_v, lengths=new_lengths)

        @partial(jax.jit, static_argnames=("n", "top_k"), donate_argnums=(1,))
        def _decode_chunk(params, cache, first_tok, rng, active, free, sampling, n, top_k):
            # per-slot sampling params (B,) — requests with different
            # temperature/top_p/top_k coexist in one chunk
            temperature, top_p, top_k_limit = sampling

            def step(carry, rng_step):
                tok, cache = carry
                logits, cache = M.decode_step(
                    params, self.mc, tok, cache, qt, self.dtype, self.rt
                )
                safe_t = jnp.where(temperature > 0, temperature, 1.0)
                sampled = top_p_sampling(
                    rng_step, logits, top_k, top_p[:, None], safe_t[:, None],
                    top_k_limit=top_k_limit[:, None],
                )
                greedy = greedy_sampling(logits)
                nxt = jnp.where(temperature > 0, sampled, greedy).astype(jnp.int32)
                return (nxt, cache), nxt

            # FREE slots: zero their lengths for the chunk so the ragged
            # attention kernel skips ALL their KV blocks — decode attention
            # cost scales with the occupied batch (their cache rows are
            # dead, so the slot-0.. writes the chunk makes there are
            # harmless).  Mid-prefill slots (occupied, not active) must KEEP
            # their lengths: zeroing would park their chunk writes at slot 0
            # and corrupt the already-prefilled prefix — with real lengths
            # the writes land above the prefix, where the next prefill
            # chunk overwrites them.
            orig_lengths = cache.lengths
            cache = cache.replace(lengths=jnp.where(free, 0, orig_lengths))
            rngs = jax.random.split(rng, n)
            (last, cache), toks = jax.lax.scan(step, (first_tok, cache), rngs)
            # only decoding slots advance their lengths
            fixed_lengths = jnp.where(active, cache.lengths, orig_lengths)
            return toks.T, cache.replace(lengths=fixed_lengths)

        @partial(jax.jit, donate_argnums=(1,))
        def _prefill_chunk_compact(params, cache, ids_PBxSc, starts, valids, slots):
            # COMPACT chunk batch: only mid-prefill slots' rows are computed
            # (a full-batch chunk wastes max_batch/pending × the MXU flops);
            # writes and attention reach cache row slots[i] through the
            # kernel row map — no cache-row copies
            return M.prefill_chunk(
                params, self.mc, ids_PBxSc, starts, valids, cache, qt,
                self.dtype, self.rt, slot_map=slots,
            )

        self._prefill_into_slot = _prefill_into_slot
        self._decode_chunk = _decode_chunk
        self._prefill_chunk_compact = _prefill_chunk_compact

    # ------------------------------------------------------------------

    def submit(self, prompt_ids: list, **kwargs) -> int:
        prompt_ids = list(prompt_ids)
        if not prompt_ids:
            # an empty prompt would gather logits at index -1 (wrapping to
            # the padded tail's garbage hidden state) — fail loudly instead
            raise ValueError("empty prompt")
        req = Request(next(self._req_counter), prompt_ids, **kwargs)
        self.queue.append(req)
        return req.req_id

    def cancel(self, req_id: int) -> bool:
        """Cancel a request: drop it from the queue, abandon its prefill,
        or stop its decode at the next chunk boundary.  Returns whether the
        request was found still live.  A cancelled request lands in
        ``finished`` with ``done=True`` and whatever it generated so far."""
        for i, req in enumerate(self.queue):
            if req.req_id == req_id:
                req.done = True
                self.finished.append(self.queue.pop(i))
                return True
        for b, slot in enumerate(self.slots):
            if slot.request is not None and slot.request.req_id == req_id:
                slot.request.done = True
                slot.budget = 0
                slot.pending_ids = None
                # _maybe_finish retires the slot (and frees its pages in
                # the paged engine)
                self._maybe_finish(b)
                return True
        return False

    def submit_text(self, text: str, **kwargs) -> int:
        assert self.tokenizer is not None
        return self.submit(self.tokenizer.encode(text), **kwargs)

    @property
    def has_work(self) -> bool:
        return bool(self.queue) or any(s.request for s in self.slots)

    @staticmethod
    def _sort_width(top_ks) -> int:
        """Static top-k sort width: smallest power-of-two bucket covering
        the batch's largest per-request top_k (>=100 keeps one compiled
        sampling program for the default)."""
        import numpy as _np
        mx = int(_np.asarray(top_ks).max())
        return 100 if mx <= 100 else 1 << (mx - 1).bit_length()

    def _bucket(self, n: int) -> int:
        b = 16
        while b < n:
            b *= 2
        return min(b, self.max_seq_len)

    def _sliced_prompt(self, req: Request) -> list:
        # keep the most recent context, reserving generation room (like
        # decoder.py): a budget ≥ max_seq_len must not slice the prompt
        # to nothing (negative-start slice turning positive)
        reserve = max(1, min(req.max_new_tokens, 64))
        keep = max(1, self.max_seq_len - reserve)
        return req.prompt_ids[-keep:]

    def _admit(self):
        """Prefill queued requests into free slots (whole-prompt mode) or
        assign them for chunked prefill."""
        for slot_idx, slot in enumerate(self.slots):
            if slot.request is not None or not self.queue:
                continue
            if self.prefill_chunk_size is not None:
                self._assign_chunked(slot_idx, self.queue.pop(0))
            else:
                self._admit_into_slot(slot_idx, self.queue.pop(0))

    def _assign_chunked(self, slot_idx: int, req: Request):
        slot = self.slots[slot_idx]
        slot.request = req
        slot.pending_ids = self._sliced_prompt(req)
        slot.pending_pos = 0
        if self.logger:
            self.logger.log("assign", req_id=req.req_id, slot=slot_idx,
                            prompt_len=len(slot.pending_ids),
                            chunk=self.prefill_chunk_size)

    def _advance_prefills(self):
        """One COMPACT batched prefill-chunk step for slots mid-prompt
        (power-of-two bucket ≤ 4 bounds the compile set; the rest advance
        on later steps, FIFO)."""
        pending = [i for i, s in enumerate(self.slots) if s.pending_ids is not None]
        if not pending:
            return
        PB = min(1 << (len(pending).bit_length() - 1), 4)
        take = pending[:PB]
        Sc = self.prefill_chunk_size
        ids = np.zeros((PB, Sc), np.int32)
        starts = np.zeros((PB,), np.int32)
        valids = np.zeros((PB,), np.int32)
        for i, b in enumerate(take):
            s = self.slots[b]
            chunk = s.pending_ids[s.pending_pos : s.pending_pos + Sc]
            ids[i, : len(chunk)] = chunk
            starts[i] = s.pending_pos
            valids[i] = len(chunk)
        logits, self.cache = self._prefill_chunk_compact(
            self.params, self.cache, jnp.asarray(ids), jnp.asarray(starts),
            jnp.asarray(valids), jnp.asarray(take, dtype=jnp.int32),
        )
        if self.rt.sync_chunks_enabled():
            # tunneled backends: a burst of async chunk dispatches with no
            # sync trips a ~60 s transport stall at the next fetch; one
            # scalar fetch per chunk (~2 RTT) keeps the queue shallow
            # (config.TpuRuntimeConfig.sync_prefill_chunks).  _fetch: the
            # distributed engines' hook handles non-addressable shards.
            self._fetch(jnp.sum(self.cache.lengths))
        for i, b in enumerate(take):
            s = self.slots[b]
            s.pending_pos += int(valids[i])
            if s.pending_pos >= len(s.pending_ids):
                n_ids = len(s.pending_ids)
                s.pending_ids = None
                self._start_decoding(b, s.request, logits[i], n_ids)

    def _admit_into_slot(self, slot_idx: int, req: Request):
        slot = self.slots[slot_idx]
        ids = self._sliced_prompt(req)
        bucket = self._bucket(len(ids))
        padded = np.zeros((1, bucket), np.int32)
        padded[0, : len(ids)] = ids
        logits, self.cache = self._prefill_into_slot(
            self.params, self.cache, jnp.asarray(padded),
            jnp.int32(len(ids)), jnp.int32(slot_idx), bucket=bucket,
        )
        slot.request = req
        if self.logger:
            self.logger.log("admit", req_id=req.req_id, slot=slot_idx,
                            prompt_len=len(ids), bucket=bucket)
        self._start_decoding(slot_idx, req, logits, len(ids))

    def _start_decoding(self, slot_idx: int, req: Request, logits, n_ids: int):
        """Sample the first token from the prompt's final logits and switch
        the slot to the decode stream."""
        slot = self.slots[slot_idx]
        self._rng, sub = jax.random.split(self._rng)
        if req.temperature > 0:
            # bucketed static sort width (like the chunk path): raw
            # req.top_k as the static arg would compile a fresh vocab-wide
            # top-k program per distinct client value at admission time
            tok = int(top_p_sampling(
                sub, logits, self._sort_width([req.top_k]),
                req.top_p, req.temperature,
                top_k_limit=jnp.asarray([req.top_k], jnp.int32)))
        else:
            tok = int(greedy_sampling(logits))
        req.generated.append(tok)
        self._started_events.append((req.req_id, [tok]))
        slot.budget = req.max_new_tokens - 1
        self._last_tok[slot_idx] = tok
        self._host_lengths[slot_idx] = n_ids
        self.stats["admitted"] += 1
        self.stats["generated_tokens"] += 1
        self._maybe_finish(slot_idx)

    def _maybe_finish(self, slot_idx: int):
        slot = self.slots[slot_idx]
        req = slot.request
        if req is None:
            return
        if req.generated and req.generated[-1] == self.eos_token_id:
            req.done = True
        if slot.budget <= 0:
            req.done = True
        if int(self._host_lengths[slot_idx]) + 1 >= self.max_seq_len:
            req.done = True
        if req.done:
            # strip a trailing eos from the visible output
            if req.generated and req.generated[-1] == self.eos_token_id:
                req.generated.pop()
            self.finished.append(req)
            slot.request = None
            slot.budget = 0
            self.stats["finished"] += 1
            if self.logger:
                self.logger.log("finish", req_id=req.req_id, slot=slot_idx,
                                generated=len(req.generated))

    def _dispatch_chunk(self, first_tok):
        """Submit one decode chunk (no host sync).  Returns
        (toks_device (B, n), {slot: req_id at dispatch}) or None when no
        slot is decoding."""
        active_mask = np.array([s.decoding for s in self.slots], bool)
        free_mask = np.array([s.request is None for s in self.slots], bool)
        if not active_mask.any():
            return None
        # fixed chunk length: over-generation past a slot's budget/eos is
        # rolled back below.  A budget-dependent n would both stall the whole
        # batch on one nearly-done slot and compile a fresh chunk program for
        # every distinct n (minutes each on remote-compile deployments).
        n = self.chunk
        temps = np.array(
            [s.request.temperature if s.request else 0.0 for s in self.slots],
            np.float32,
        )
        tops = np.array(
            [s.request.top_p if s.request else 1.0 for s in self.slots],
            np.float32,
        )
        top_ks = np.array(
            [s.request.top_k if s.request else 1 for s in self.slots],
            np.int32,
        )

        sort_k = self._sort_width(top_ks)
        self._rng, sub = jax.random.split(self._rng)
        toks, self.cache = self._decode_chunk(
            self.params,
            self.cache,
            first_tok,
            sub,
            jnp.asarray(active_mask),
            jnp.asarray(free_mask),
            (jnp.asarray(temps), jnp.asarray(tops), jnp.asarray(top_ks)),
            n,
            sort_k,
        )
        req_ids = {b: s.request.req_id
                   for b, s in enumerate(self.slots) if s.decoding}
        self.stats["decode_chunks"] += 1
        return toks, req_ids

    def _fetch(self, x) -> np.ndarray:
        """Host fetch of a device token array.  Multi-process engines
        override this: a chunk output sharded over the data axis spans
        non-addressable devices there, and a plain ``np.asarray`` raises."""
        return np.asarray(x)

    def _consume_chunk(self, toks_np, req_ids, out):
        """Apply a fetched chunk's rows to the slots that still hold the
        request they held at dispatch (a slot freed-and-reused since then
        belongs to a different request — its rows are the discarded
        overrun of the finished one)."""
        for b, rid in req_ids.items():
            slot = self.slots[b]
            if (slot.request is None or slot.request.req_id != rid
                    or not slot.decoding):
                continue
            out.append(self._consume_slot_tokens(b, toks_np[b], self.chunk))
        return out

    def step(self) -> list[tuple[int, list]]:
        """Admit, advance pending prefill chunks, one decode chunk.
        Returns [(req_id, new_tokens)] for sequences that advanced.

        With ``lookahead``, the chunk dispatched this step is chained on the
        previous chunk's DEVICE tokens and fetched one step later, so host
        scheduling + the dispatch round trip overlap device compute (results
        lag one chunk; a request finishing mid-chunk wastes its rows of one
        extra chunk, standard rollback/invalidation).
        """
        self._admit()
        self._advance_prefills()
        started, self._started_events = self._started_events, []
        if not self.lookahead:
            disp = self._dispatch_chunk(jnp.asarray(self._last_tok))
            if disp is None:
                # still a scheduler step (admission/prefill work may have
                # happened) — count it like the paged/lookahead paths do
                self.stats["steps"] += 1
                return started
            toks, req_ids = disp
            out = self._consume_chunk(self._fetch(toks), req_ids, started)
            self.stats["steps"] += 1
            return out

        # lookahead: dispatch N+1 (stale slot view — finishes inside the
        # unfetched chunk N are not yet known), then fetch + consume N
        prev = self._pending
        if prev is not None:
            prev_toks, prev_req_ids = prev
            # a slot continues from chunk N's last DEVICE token only if it
            # still holds the request it decoded there — a slot freed and
            # re-admitted since dispatch must start from the NEW request's
            # host-known first token, not the old stream's garbage
            prev_active = np.array(
                [b in prev_req_ids
                 and self.slots[b].request is not None
                 and self.slots[b].request.req_id == prev_req_ids[b]
                 and self.slots[b].decoding
                 for b in range(self.max_batch)], bool)
            first = jnp.where(jnp.asarray(prev_active), prev_toks[:, -1],
                              jnp.asarray(self._last_tok))
        else:
            first = jnp.asarray(self._last_tok)
        self._pending = self._dispatch_chunk(first)
        out = started
        if prev is not None:
            toks_np = self._fetch(prev[0])  # syncs on chunk N only
            out = self._consume_chunk(toks_np, prev[1], out)
            # keep _last_tok coherent for slots whose pending chunk rows
            # were discarded (finished requests): nothing to do — freed
            # slots are re-seeded at admission
        self.stats["steps"] += 1
        return out

    def _consume_slot_tokens(self, b: int, row, n: int):
        """Apply one slot's decoded chunk row: append until eos/budget,
        roll back over-generation, retire if finished."""
        slot = self.slots[b]
        req = slot.request
        new = []
        # cache positions past max_seq_len - 1 are clamped writes:
        # tokens decoded there are invalid, stop appending at the wall
        remaining = self.max_seq_len - 1 - int(self._host_lengths[b])
        for t in row[:max(1, remaining)]:
            t = int(t)
            new.append(t)
            req.generated.append(t)
            slot.budget -= 1
            if t == self.eos_token_id or slot.budget <= 0:
                break
        # roll back cache length past eos/budget over-generation
        extra = n - len(new)
        if extra > 0:
            self.cache = self.cache.replace(
                lengths=self.cache.lengths.at[b].add(-extra)
            )
        self._last_tok[b] = new[-1]
        self._host_lengths[b] += len(new)
        self.stats["generated_tokens"] += len(new)
        self._maybe_finish(b)
        return (req.req_id, new)

    def run_stream(self, prompts: list, **kwargs):
        """Submit all prompts and yield ``(req_id, new_token_ids)`` as each
        chunk lands — the engine counterpart of the decoder's streaming
        generate (decoder.py:93-95).  Returns submission-order req_ids via
        the generator's ``.send``-free protocol: consume pairs until
        exhaustion; ``self.finished`` holds the completed requests."""
        for p in prompts:
            if isinstance(p, str):
                self.submit_text(p, **kwargs)
            else:
                self.submit(p, **kwargs)
        while self.has_work:
            yield from self.step()

    def run(self, prompts: list, **kwargs) -> list[str]:
        """Submit all prompts, run to completion, return decoded texts in
        submission order."""
        ids = {}
        for p in prompts:
            if isinstance(p, str):
                rid = self.submit_text(p, **kwargs)
            else:
                rid = self.submit(p, **kwargs)
            ids[rid] = None
        while self.has_work:
            self.step()
        by_id = {r.req_id: r for r in self.finished}
        out = []
        for rid in ids:
            req = by_id[rid]
            if self.tokenizer is not None:
                out.append(process_response(self.tokenizer.decode(req.generated)))
            else:
                out.append(req.generated)
        return out
