"""Async host coordinator for the decode loop.

The TPU-native analogue of vLLM's AsyncLLMEngine (reference boundary:
XTTSv2.py:198-232, 752): callers submit prompt embeddings, the coordinator
packs them into free decode slots (continuous batching), steps the jitted
decode program, and resolves per-sequence futures with (tokens, latents).

One device program in flight at a time (single-chip serving); prefills are
interleaved with decode steps so a new request starts without draining the
batch. Multi-chip scale-out replicates this engine across mesh data shards
(see auralis_tpu.parallel).
"""
from __future__ import annotations

import asyncio
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common.logger import setup_logger
from ..models.xttsv2.config import XTTSGPTConfig
from .decode_loop import (
    DecodeState,
    decode_steps_status,
    harvest,
    init_decode_state,
    insert_sequence,
    prefill_bucket,
    release_slot,
    unpack_status,
)

logger = setup_logger("engine")


@dataclass
class SamplingOptions:
    temperature: float = 0.75
    top_p: float = 0.85
    top_k: int = 50
    repetition_penalty: float = 5.0
    do_sample: bool = True


@dataclass
class _Pending:
    embeds: np.ndarray
    length: int
    options: SamplingOptions
    future: asyncio.Future
    enqueue_time: float = field(default_factory=time.time)


class DecodeEngine:
    """Continuous-batching decode coordinator over one device (or one data
    shard). Thread-unsafe by design: drive it from a single asyncio loop."""

    def __init__(
        self,
        params: dict,
        cfg: XTTSGPTConfig,
        num_slots: int = 16,
        cache_dtype=jnp.bfloat16,
        steps_per_sync: int = 8,
        seed: int = 0,
    ):
        self.params = params
        self.cfg = cfg
        self.num_slots = num_slots
        self.steps_per_sync = steps_per_sync
        self.state: DecodeState = init_decode_state(
            cfg, num_slots, jax.random.PRNGKey(seed), dtype=cache_dtype
        )
        self._queue: deque[_Pending] = deque()
        self._slot_owner: dict[int, _Pending] = {}
        self._slot_meta: dict[int, dict] = {}
        self._steps_total = 0
        self._runner: Optional[asyncio.Task] = None
        self._wake = asyncio.Event()
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        self._closed = False

    # ------------------------------------------------------------- public
    async def generate(
        self, embeds: np.ndarray, options: SamplingOptions | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Submit prompt embeddings [T, D]; resolves to (tokens, latents)."""
        if self._closed:
            raise RuntimeError("DecodeEngine is shut down")
        loop = asyncio.get_running_loop()
        fut: asyncio.Future = loop.create_future()
        self._queue.append(
            _Pending(np.asarray(embeds), int(embeds.shape[0]), options or SamplingOptions(), fut)
        )
        self._ensure_runner()
        self._wake.set()
        return await fut

    async def shutdown(self) -> None:
        self._closed = True
        self._wake.set()
        if self._runner is not None:
            self._runner.cancel()
            try:
                await self._runner
            except (asyncio.CancelledError, Exception):
                pass
            self._runner = None
        for pending in self._queue:
            if not pending.future.done():
                pending.future.cancel()
        self._queue.clear()

    @property
    def num_active(self) -> int:
        return len(self._slot_owner)

    # ------------------------------------------------------------ internals
    def _ensure_runner(self) -> None:
        loop = asyncio.get_running_loop()
        if loop is not self._loop:
            # the engine outlives individual asyncio.run loops (the sync API
            # spins up a loop per call); re-bind the wake Event and runner
            if self._runner is not None and not self._runner.done():
                try:
                    self._runner.cancel()
                except RuntimeError:
                    pass  # previous loop already closed
            self._runner = None
            self._wake = asyncio.Event()
            self._loop = loop
        if self._runner is None or self._runner.done():
            self._runner = loop.create_task(self._run())

    def _free_slots(self) -> list[int]:
        # slot ownership is host-authoritative: a slot is free once harvested
        return [i for i in range(self.num_slots) if i not in self._slot_owner]

    LEN_BUCKETS = (256, 512, 768, 1024)

    def _len_bucket(self) -> int | None:
        """Static attention-read bound: smallest bucket safely above every
        owned slot's possible length after this block."""
        if not self._slot_owner:
            return self.LEN_BUCKETS[0]
        worst = max(
            info["prompt_len"] + (self._steps_total - info["steps_at_insert"])
            for info in self._slot_meta.values()
        ) + self.steps_per_sync + 1
        for b in self.LEN_BUCKETS:
            if worst < b:
                return b
        return None  # full length

    def _insert(self, pending: _Pending, slot: int) -> None:
        cfg, opts = self.cfg, pending.options
        bucket = prefill_bucket(pending.length, cfg.max_seq_len)
        dtype = self.state.cache.k.dtype
        padded = np.zeros((bucket, cfg.hidden_size), np.float32)
        padded[: pending.length] = pending.embeds
        self.state = insert_sequence(
            self.params,
            cfg,
            self.state,
            jnp.asarray(padded, dtype),
            jnp.int32(pending.length),
            jnp.int32(slot),
            jnp.float32(opts.temperature),
            jnp.float32(opts.top_p),
            jnp.int32(opts.top_k),
            jnp.float32(opts.repetition_penalty),
            jnp.bool_(opts.do_sample),
        )
        self._slot_owner[slot] = pending
        self._slot_meta[slot] = {
            "prompt_len": pending.length,
            "steps_at_insert": self._steps_total,
        }

    def _harvest_done(self, done: np.ndarray) -> None:
        for slot in np.nonzero(done)[0].tolist():
            pending = self._slot_owner.pop(slot, None)
            self._slot_meta.pop(slot, None)
            if pending is None:
                continue
            tokens, latents = harvest(self.state, slot)
            self.state = release_slot(self.state, jnp.int32(slot))
            if not pending.future.done():
                # drop a trailing stop token from the token list; latents keep
                # the step that predicted it (reference: XTTSv2.py:645,685-687)
                if len(tokens) and tokens[-1] == self.cfg.stop_audio_token:
                    tokens = tokens[:-1]
                try:
                    pending.future.set_result((tokens, latents))
                except RuntimeError:
                    pass  # future's loop already closed (stale cross-loop request)

    async def _run(self) -> None:
        """Pipelined decode loop: dispatch decode block k+1 before reading
        block k's status, so the (tunnel-RTT-expensive) host fetch overlaps
        device compute. Done-detection lags one block; the extra masked steps
        for a finished slot are no-ops."""
        pending_status = None  # device array from the previous block
        while not self._closed:
            # fill free slots from the queue (prefill interleaves with decode)
            free = self._free_slots()
            inserted = False
            while free and self._queue:
                self._insert(self._queue.popleft(), free.pop(0))
                inserted = True
            if inserted:
                pending_status = None  # state advanced; old status is stale

            if not self._slot_owner and not self._queue:
                pending_status = None
                self._wake.clear()
                try:
                    await asyncio.wait_for(self._wake.wait(), timeout=5.0)
                except asyncio.TimeoutError:
                    pass
                continue

            if self._slot_owner:
                self.state, packed = decode_steps_status(
                    self.params, self.cfg, self.state,
                    n_steps=self.steps_per_sync, len_bound=self._len_bucket(),
                )
                self._steps_total += self.steps_per_sync
                if pending_status is not None:
                    # overlaps with the block just dispatched
                    _, done, _ = unpack_status(
                        np.asarray(await asyncio.to_thread(jax.device_get, pending_status))
                    )
                    if done.any():
                        self._harvest_done(done)
                pending_status = packed
            # cede the loop so producers/consumers run between syncs
            await asyncio.sleep(0)
