"""Continuous batching over a (data, model) device mesh — multi-host serving.

BASELINE config 5 ("continuous batching scheduled across hosts") the TPU
way: there is no per-host request queue shuffling tokens over sockets —
the whole engine state (KV cache, per-slot lengths, last tokens) is ONE
global jit program over the mesh, with the batch dimension sharded over
``data`` and the weights tensor-parallel over ``model`` (GSPMD inserts the
ICI collectives).  Every host executes the same SPMD steps; the scheduler
is deterministic, so hosts stay in lockstep without explicit coordination
messages:

* **slot → shard mapping**: batch slots are statically partitioned into
  ``data``-axis groups (slot b lives on shard b // (B / n_data)); the
  admission scheduler balances new requests across groups so no data shard
  idles while another is saturated;
* **admission**: a prefill + ``dynamic_update_slice`` into the global
  cache — GSPMD turns the slot-row update into work on the owning shard;
* **decode**: the inherited in-graph chunked decode, now sharded — per-chunk
  host work is one dispatch per chunk regardless of host count;
* **multi-process**: with ``jax.distributed`` initialized, host 0 is the
  request front-end and broadcasts (request_id, prompt) batches via
  ``multihost_utils.broadcast_one_to_all`` so every process submits the
  same sequence (``sync_submissions``); single-process multi-device runs
  (this repo's tests, one-process TPU slices) need no broadcast.

The round-1 engine (engine.py) remains the single-host fast path; this
class only adds placement and scheduling policy on top of it.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import GLMLoadConfig, TpuRuntimeConfig
from ..parallel import sharding as S
from .engine import ServingEngine, Request
from .paged_engine import PagedServingEngine


def _fetch_global(x) -> np.ndarray:
    """Host fetch that works on globally-sharded arrays under multi-process
    ``jax.distributed``: a chunk's token output is sharded over the data
    axis, so each process only addresses its own shard — all-gather it to a
    fully-replicated (hence fetchable) value first.  Every process runs the
    same deterministic SPMD program, so the gathered values agree."""
    if jax.process_count() > 1 and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


class DistributedServingEngine(ServingEngine):
    def __init__(
        self,
        config: GLMLoadConfig,
        params: dict,
        tokenizer=None,
        *,
        mesh: Mesh,
        max_batch: int = 8,
        rt: Optional[TpuRuntimeConfig] = None,
        **kwargs,
    ):
        sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        self.n_data = sizes.get(S.DATA_AXIS, 1)
        assert max_batch % self.n_data == 0, (
            f"max_batch {max_batch} must divide over data axis {self.n_data}"
        )
        self.mesh = mesh
        if rt is None:
            rt = TpuRuntimeConfig(mesh=mesh)
        super().__init__(config, params, tokenizer, max_batch=max_batch,
                         rt=rt, **kwargs)
        # shard the engine cache: batch over data, replicated over model
        kv_shardings = jax.tree.map(
            lambda spec: NamedSharding(mesh, spec), S.kv_cache_pspecs()
        )
        self.cache = jax.tree.map(jax.device_put, self.cache, kv_shardings)

    def _fetch(self, x):
        return _fetch_global(x)

    # -- scheduling ------------------------------------------------------

    @property
    def _group_size(self) -> int:
        return self.max_batch // self.n_data

    def _shard_of(self, slot_idx: int) -> int:
        return slot_idx // self._group_size

    def _admit(self):
        """Balance admissions across data-shard slot groups: fill the group
        with the fewest active slots first (the base class fills slots in
        index order, which would pile work onto data shard 0)."""
        while self.queue:
            active = [0] * self.n_data
            free: list[list[int]] = [[] for _ in range(self.n_data)]
            for idx, slot in enumerate(self.slots):
                g = self._shard_of(idx)
                if slot.request is not None:
                    active[g] += 1
                else:
                    free[g].append(idx)
            candidates = [g for g in range(self.n_data) if free[g]]
            if not candidates:
                return
            g = min(candidates, key=lambda g: active[g])
            if self.prefill_chunk_size is not None:
                self._assign_chunked(free[g][0], self.queue.pop(0))
            else:
                self._admit_into_slot(free[g][0], self.queue.pop(0))

    def sync_submissions(self, requests: Optional[list] = None, **kwargs):
        """Multi-process request ingestion: host 0 passes its pending
        request list (strings or token-id lists); every process receives
        the same batch and submits it locally, keeping the SPMD loops in
        lockstep.

        ``broadcast_one_to_all`` requires an IDENTICAL pytree structure and
        array shapes on every process, so variable-length prompts are
        shipped as one fixed-shape padded int32 matrix behind a (count,
        maxlen) header that every host enters with the same placeholder
        shape."""
        def _norm(prompts):
            out = []
            for p in prompts or []:
                if isinstance(p, str):
                    assert self.tokenizer is not None, (
                        "string prompts need an engine tokenizer")
                    out.append(self.tokenizer.encode(p))
                else:
                    out.append([int(t) for t in p])
            return out

        if jax.process_count() == 1:
            for ids in _norm(requests):
                self.submit(ids, **kwargs)
            return
        from jax.experimental import multihost_utils

        src = jax.process_index() == 0
        prompts = _norm(requests) if src else []
        header = np.asarray(
            [len(prompts), max((len(p) for p in prompts), default=0)],
            np.int32)
        header = np.asarray(multihost_utils.broadcast_one_to_all(header))
        n, maxlen = int(header[0]), int(header[1])
        if n == 0 or maxlen == 0:
            return
        mat = np.full((n, maxlen), -1, np.int32)  # ids are >= 0; -1 = pad
        if src:
            for i, p in enumerate(prompts):
                mat[i, : len(p)] = p
        mat = np.asarray(multihost_utils.broadcast_one_to_all(mat))
        for row in mat:
            self.submit([int(t) for t in row if t >= 0], **kwargs)


class DistributedPagedServingEngine(PagedServingEngine):
    """Paged continuous batching over a (data, model) mesh.

    Extends the single-host paged engine (BASELINE config 5 at paged-pool
    memory economics): the page pool's physical-page dim shards over
    ``data`` — each data shard stores only its own slots' pages — and the
    per-group allocator (paged_engine.py) keeps a row's pages strictly on
    its owning shard, so the sharded decode kernel
    (flash_attention_decode_paged_sharded) never reads cross-shard.

    Scheduling adds **prefix affinity** on top of load balancing: prefix
    registries are per data shard (pages cannot be attended across shards),
    so admission routes a request to the shard already caching its longest
    prompt prefix, and only falls back to the least-loaded shard when no
    prefix matches anywhere — KV reuse without any cross-ICI page traffic.

    Decode runs FULL-batch (``_full_batch_decode``): the slot→shard mapping
    is static, so there is no compacting row gather that GSPMD would have
    to implement as a cross-shard all-to-all.

    ``shard_model_pages=True`` additionally shards the pool's page dim over
    the model axis (per-chip pool HBM and KV reads/token ÷ tp on top of the
    ÷ dp): logical page j of a row lives on model chip ``j % tp`` (the
    phase-aware allocator, paged_engine.py), and decode merges the tp
    strided partials exactly via log-sum-exp
    (flash_attention_decode_paged_msharded) — the paged counterpart of the
    dense T-sharded cache (``kv_shard_t``) for long-context serving.
    """

    _full_batch_decode = True

    def __init__(
        self,
        config: GLMLoadConfig,
        params: dict,
        tokenizer=None,
        *,
        mesh: Mesh,
        max_batch: int = 8,
        rt: Optional[TpuRuntimeConfig] = None,
        shard_model_pages: bool = False,
        **kwargs,
    ):
        sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        self.n_data = sizes.get(S.DATA_AXIS, 1)
        assert max_batch % self.n_data == 0, (
            f"max_batch {max_batch} must divide over data axis {self.n_data}"
        )
        self.mesh = mesh
        # shard_model_pages: the pool's page dim shards over (data, model)
        # instead of data only — per-chip pool HBM and KV reads/token ÷ tp.
        # The allocator becomes phase-aware (n_phase sub-pools per group:
        # logical page j from phase j % tp) and decode dispatches to
        # flash_attention_decode_paged_msharded (exact strided-partial
        # log-sum-exp merge over the model axis).
        self.n_phase = sizes.get(S.MODEL_AXIS, 1) if shard_model_pages else 1
        self._shard_model_pages = shard_model_pages and self.n_phase > 1
        if rt is None:
            rt = TpuRuntimeConfig(mesh=mesh)
        if self._shard_model_pages and not rt.paged_shard_model:
            import dataclasses

            rt = dataclasses.replace(rt, paged_shard_model=True)
        assert not (rt.paged_shard_model and not self._shard_model_pages), (
            "rt.paged_shard_model requires shard_model_pages=True: the "
            "msharded decode kernel assumes the phase-aware page layout "
            "(logical page j on model chip j % tp) — without it, the "
            "global→local clip maps pages to WRONG local slots silently")
        super().__init__(config, params, tokenizer, max_batch=max_batch,
                         rt=rt, **kwargs)
        # unadmitted rows point at their OWN sub-pool's garbage page from
        # the start (init zeros would alias every row to shard 0's page 0,
        # making inactive-slot writes cross-shard traffic under GSPMD)
        self.cache = self.cache.replace(
            page_table=jnp.asarray(self._garbage))
        pool_shardings = jax.tree.map(
            lambda spec: NamedSharding(mesh, spec),
            S.paged_kv_pspecs(shard_model=self._shard_model_pages),
        )
        self.cache = jax.tree.map(jax.device_put, self.cache, pool_shardings)

    # slot→shard mapping: the inherited PagedServingEngine._slot_group is
    # the single canonical formula (slot // (max_batch // n_data))

    def _admit(self):
        """Prefix-affinity admission: route each queued request to the data
        shard whose registry caches its longest prompt prefix; tie-break by
        fewest active slots (the dense engine's balancer).  A shard that
        cannot allocate pages is skipped; if no shard can, admission waits
        (backpressure)."""
        while self.queue:
            req = self.queue[0]
            ids = self._sliced_prompt(req)
            active = [0] * self.n_data
            free: list[list[int]] = [[] for _ in range(self.n_data)]
            for idx, slot in enumerate(self.slots):
                g = self._slot_group(idx)
                if slot.request is not None:
                    active[g] += 1
                else:
                    free[g].append(idx)
            ranked = []
            for g in range(self.n_data):
                if not free[g]:
                    continue
                shared_tokens = 0
                if self.prefix_cache:
                    _, shared_tokens = self._match_prefix(ids, g, peek=True)
                ranked.append((-shared_tokens, active[g], g))
            if not ranked:
                return  # no free slot anywhere
            admitted = False
            for _, _, g in sorted(ranked):
                if self._try_admit(free[g][0], req):
                    self.queue.pop(0)
                    admitted = True
                    break
            if not admitted:
                return  # every candidate shard is out of pages

    # multi-process ingestion is identical to the dense engine's
    sync_submissions = DistributedServingEngine.sync_submissions

    def _fetch(self, x):
        return _fetch_global(x)
