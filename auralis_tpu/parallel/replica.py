"""Data-parallel replica serving: N independent engines (one per chip) behind
least-loaded request routing.

This is the v5e-8 default scale-out (SURVEY.md §7.8): the whole model
(~0.4 B GPT + ~50 M conditioning/vocoder) fits on one chip, so replication
beats tensor parallelism for throughput — the metric is seconds-of-audio per
second per chip, and replicas avoid all inter-chip collectives. TP over the
`model` mesh axis (parallel/mesh.py) remains available as a latency knob.

The reference's equivalent is "run more servers behind nginx"
(docs/advanced/deployment.md Load Balancing); here routing is in-process and
voice-affine (repeat voices land on the replica that already holds their
conditioning cache).
"""
from __future__ import annotations

import asyncio
from typing import Any, AsyncGenerator, List, Optional

import jax
import numpy as np

from ..common.logger import setup_logger
from ..common.output import TTSOutput
from ..common.requests import TTSRequest
from ..models.base import BaseAsyncTTSEngine, ConditioningConfig

logger = setup_logger("replica")


class ReplicatedTTSEngine(BaseAsyncTTSEngine):
    """Routes requests across independent per-device engine replicas."""

    model_type = "replicated"

    def __init__(self, engines: List[BaseAsyncTTSEngine]):
        if not engines:
            raise ValueError("need at least one engine replica")
        self.engines = engines
        # requests routed here but whose chunks haven't reached the replica's
        # decode queue yet (phase-1 conditioning in flight) — without this,
        # a burst of same-voice requests all sees load 0 and the affinity
        # tiebreak piles them onto one replica
        self._inflight = [0] * len(engines)

    # ------------------------------------------------------------- factory
    @classmethod
    def from_engine(
        cls, engine, devices: Optional[list] = None, n_replicas: Optional[int] = None
    ) -> "ReplicatedTTSEngine":
        """Clone a built XTTSv2Engine across devices: weights are device_put
        per replica; configs/tokenizer are shared (read-only host state)."""
        from ..models.xttsv2.engine import XTTSv2Engine

        devices = devices if devices is not None else jax.devices()
        if n_replicas is not None:
            devices = devices[:n_replicas]
        if not devices:
            raise ValueError("no devices for replication")

        replicas: List[BaseAsyncTTSEngine] = [engine]
        for dev in devices[1:]:
            params = jax.device_put(engine.params, dev)
            core = jax.device_put(engine.core, dev)
            # default_device makes the replica's decode state / rng allocate
            # on its own chip; all jit computations then follow the operands
            with jax.default_device(dev):
                replicas.append(
                    XTTSv2Engine(
                        engine.hifi_config,
                        engine.gpt_config,
                        params=params,
                        core=core,
                        tokenizer=engine.tokenizer,
                        max_concurrency=engine.max_concurrency,
                        decode_slots=engine.decode_slots,
                        steps_per_sync=engine.decode_engine.steps_per_sync,
                        cache_dtype=engine.decode_engine.state.cache.k.dtype,
                        vocoder_dtype=None,  # core was already cast by the donor
                    )
                )
        logger.info("replicated engine across %d device(s)", len(replicas))
        return cls(replicas)

    # -------------------------------------------------------------- routing
    def _load(self, idx: int) -> int:
        de = getattr(self.engines[idx], "decode_engine", None)
        queued = de.num_active + len(de._queue) if de is not None else 0
        return queued + self._inflight[idx]

    def _route(self, request: TTSRequest) -> int:
        """Least-loaded; voice-affinity tiebreak so a repeated voice hits the
        replica that already holds its conditioning cache."""
        loads = [self._load(i) for i in range(len(self.engines))]
        best = min(loads)
        candidates = [i for i, l in enumerate(loads) if l == best]
        if len(candidates) == 1:
            return candidates[0]
        key = hash(tuple(str(f) for f in (request.speaker_files or [])))
        return candidates[key % len(candidates)]

    # -------------------------------------------------- engine ABC surface
    @property
    def conditioning_config(self) -> ConditioningConfig:
        return self.engines[0].conditioning_config

    def get_memory_usage_curve(self) -> float:
        return sum(e.get_memory_usage_curve() for e in self.engines)

    def precompile_decode_programs(self) -> None:
        for e in self.engines:
            fn = getattr(e, "precompile_decode_programs", None)
            if fn is not None:
                fn()

    def precompile_vocoder_buckets(self) -> None:
        """Forward warmup precompiles to every replica (each owns its own
        device programs)."""
        for e in self.engines:
            fn = getattr(e, "precompile_vocoder_buckets", None)
            if fn is not None:
                fn()

    @classmethod
    def from_pretrained(cls, *args, n_replicas: Optional[int] = None, **kwargs):
        from ..models.xttsv2.engine import XTTSv2Engine

        donor = XTTSv2Engine.from_pretrained(*args, **kwargs)
        return cls.from_engine(donor, n_replicas=n_replicas)

    async def get_audio_conditioning(self, *args, **kwargs):
        """Voice pre-caching (prepare_for_streaming_generation) runs on
        replica 0; results are host numpy, usable by any replica (each
        replica's own conditioning cache fills lazily on first use)."""
        return await self.engines[0].get_audio_conditioning(*args, **kwargs)

    async def get_generation_context(self, request: TTSRequest, **kwargs):
        idx = self._route(request)
        self._inflight[idx] += 1
        try:
            handles, ids, spk, cond = await self.engines[idx].get_generation_context(
                request, **kwargs
            )
        finally:
            # the chunks are now in the replica's decode queue (or the
            # request failed) — either way the decode-side load is visible
            self._inflight[idx] -= 1
        # tag every handle with its replica so phase 2 vocodes on the same
        # device that owns the latents
        tagged = [(idx, h) for h in handles]
        return tagged, ids, spk, cond

    def cancel_generation_handle(self, handle) -> None:
        idx, inner = handle
        self.engines[idx].cancel_generation_handle(inner)

    async def process_tokens_to_speech(
        self,
        generator,
        speaker_embeddings=None,
        multimodal_data=None,
        request: TTSRequest = None,
    ) -> AsyncGenerator[TTSOutput, None]:
        idx, handle = generator
        async for out in self.engines[idx].process_tokens_to_speech(
            handle, speaker_embeddings, multimodal_data, request
        ):
            yield out

    async def shutdown(self) -> None:
        await asyncio.gather(*(e.shutdown() for e in self.engines))
