"""XTTSv2 TPU engine: conditioning -> continuous-batched decode -> vocoder.

The TPU-native counterpart of the reference engine (models/xttsv2/XTTSv2.py),
re-architected around first-party JAX programs:

- conditioning (speaker d-vector + perceiver latents) runs as jitted XLA
- token generation runs in the slot-batched decode loop (runtime/decode_loop)
  which emits vocoder latents inline — no second "logits-only" pass
- HiFi-GAN vocoding runs as one jitted program over bucketed latent lengths
- prompt assembly (text embeds ⊕ cond latents ⊕ start-audio embed) happens
  host-side in numpy from cached embedding tables: zero recompiles for
  arbitrary text lengths
"""
from __future__ import annotations

import asyncio
import dataclasses
import json
import threading
import math
import os
import time
from pathlib import Path
from typing import Any, AsyncGenerator, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...common import audio_io
from ...common.dsp_np import trim_silence_db
from ...common.logger import setup_logger
from ...common.tracing import record as trace_record, span
from ...common.output import TTSOutput
from ...common.requests import TTSRequest
from ...frontend.tokenizer import TTSTokenizer
from ...ops.mel import wav_to_mel_cloning
from ...ops.resample import resample_np
from ..base import BaseAsyncTTSEngine, ConditioningConfig
from .config import XTTSConfig, XTTSGPTConfig, tiny_test_config
from .gpt import init_gpt_params
from .hifigan import hifi_decoder, init_hifigan_params
from .modules import (
    conditioning_encoder,
    init_conditioning_encoder_params,
    init_perceiver_params,
    init_speaker_encoder_params,
    perceiver_resampler,
    speaker_encoder,
)
from .weights import find_artifact, load_core_params, load_gpt_params, load_safetensors
from ...runtime.engine_core import DecodeEngine, SamplingOptions, TokenPrompt

logger = setup_logger("xttsv2")

LATENT_BUCKETS_STEP = 64
# batched row-vocoder latent buckets: the batcher pads each batch to the
# smallest bucket >= max true length + 4 (4 latents of margin exceeds the
# generator's post-interp receptive field, and the interp index map is
# length-independent, so trimmed outputs stay bit-identical to the full-row
# program). Typical e-book chunks are ~200-300 latents, so most batches run
# the 256/384 programs instead of always padding to 640.
VOCODER_LATENT_BUCKETS = (256, 384, 512, 640)

# Intra-chunk streaming vocode segmentation, in post-interp frames (one
# post-interp frame = 256 output samples). The HiFi-GAN generator's receptive
# field is ~14 post-interp frames (conv_pre k7 + MRF k11/d5 at the x8 stage
# dominate), so PAD_PF=16 of context on each side makes segment outputs
# bit-match the full-row vocoder away from chunk boundaries — and because the
# full-row program also zero-masks past the true length, segment streaming
# reproduces the non-streaming waveform EXACTLY.
SEG_PF = 128  # ~1.37 s of audio per segment
FIRST_SEG_PF = 32  # emit the first ~0.34 s as soon as ~13 latents exist (TTFA)
PAD_PF = 16


class _VocodeBatcher:
    """Zero-added-latency micro-batching of vocoder dispatches.

    While one batch is on the device (one program dispatch + one host
    round-trip), newly finished chunks/segments accumulate and ship together
    in the next batch — nothing ever waits on a timer. This collapses the
    per-chunk dispatch overhead (ruinous when the host link is
    high-latency) and feeds the MXU larger batches (4x640-bucket HiFi-GAN
    costs ~0.94x of four singles)."""

    MAX_BATCH = 4
    # seg_first is pure weight-stream: measured on-chip (r3) batch 8 costs
    # the SAME device time as batch 4 (33.6 vs 34.6 ms) — so a concurrency-8
    # burst's 8 speculative first segments fly as ONE batch instead of two
    # serialized flights, cutting the second wave's TTFA by a full flight
    SEG_FIRST_MAX_BATCH = 8
    MAX_INFLIGHT = 3  # batches dispatched before the first fetch resolves
    # ALWAYS pad to a batch-size bucket: each size is its own XLA executable,
    # and a straggler batch would otherwise compile (slowly, via the remote
    # tunnel) in the middle of serving; padded lanes replicate item 0 and
    # are discarded (HiFi-GAN at batch 4 costs ~0.94x of four singles, so
    # the padding waste is bounded and the latency is flat)
    _BATCH_SIZES = (4,)
    _SEG_FIRST_SIZES = (4, 8)  # both warmed by precompile_vocoder_buckets

    def __init__(self, engine: "XTTSv2Engine"):
        self.engine = engine
        self._pending = {"row": [], "seg": [], "seg_first": []}
        self._task: Optional[asyncio.Task] = None
        self._inflight: Optional[asyncio.Semaphore] = None
        self._loop: Optional[asyncio.AbstractEventLoop] = None

    async def submit(self, kind: str, item: tuple) -> np.ndarray:
        loop = asyncio.get_running_loop()
        if loop is not self._loop:
            # the engine outlives individual asyncio.run loops (sync API);
            # stale drain tasks and closed-loop futures belong to the dead
            # loop and can never resolve — start fresh on the new one
            self._pending = {"row": [], "seg": [], "seg_first": []}
            self._task = None
            self._loop = loop
        fut: asyncio.Future = loop.create_future()
        self._pending[kind].append((item, fut))
        if self._task is None or self._task.done():
            self._inflight = asyncio.Semaphore(self.MAX_INFLIGHT)
            self._task = loop.create_task(self._drain())
        return await fut

    async def _drain(self) -> None:
        # pipelined: up to MAX_INFLIGHT batches run concurrently (the device
        # serializes their compute; their host fetches overlap), so a slow
        # result transfer never stalls the next batch's dispatch
        loop = asyncio.get_running_loop()
        flights: list[asyncio.Task] = []
        while any(self._pending.values()) or flights:
            flights = [t for t in flights if not t.done()]
            if not any(self._pending.values()):
                if flights:
                    await asyncio.wait(flights, return_when=asyncio.FIRST_COMPLETED)
                continue
            await self._inflight.acquire()
            # first segments gate time-to-first-audio, then mid-stream
            # segments, then whole-row vocodes
            kind = next(
                k for k in ("seg_first", "seg", "row") if self._pending[k]
            )
            cap = (
                self.SEG_FIRST_MAX_BATCH if kind == "seg_first" else self.MAX_BATCH
            )
            batch = self._pending[kind][:cap]
            del self._pending[kind][: len(batch)]
            flights.append(loop.create_task(self._fly(kind, batch)))

    async def _fly(self, kind: str, batch: list) -> None:
        items = [it for it, _ in batch]
        try:
            outs = await asyncio.to_thread(self._run_batch, kind, items)
        except Exception as e:  # propagate to every waiter
            for _, fut in batch:
                try:
                    if not fut.done():
                        fut.set_exception(e)
                except RuntimeError:
                    pass  # stale closed-loop future
            return
        finally:
            self._inflight.release()
        for (_, fut), out in zip(batch, outs):
            try:
                if not fut.done():
                    fut.set_result(out)
            except RuntimeError:
                pass  # stale closed-loop future

    def _pad(self, kind: str, seq: list) -> list:
        sizes = (
            self._SEG_FIRST_SIZES if kind == "seg_first" else self._BATCH_SIZES
        )
        if kind == "seg_first" and getattr(self.engine, "seg_first_batch1", False):
            # a LONE first segment is the time-to-first-audio critical path;
            # with the flag on it runs a dedicated batch-1 executable instead
            # of padding to 4 lanes of generator work. Measured r3 TTFA A/B
            # (concurrency 8, non-oversubscribed): batch-1 LOSES — p50
            # 174.5 -> 186.3 ms, seg_first device time 136 -> 144 ms. The
            # generator's convs are bandwidth-bound on WEIGHTS at these
            # shapes, so the 4 lanes ride the same weight stream nearly
            # free, while the batch-1 program tiles worse (sublane padding
            # at batch 1). Default stays OFF (= padded batch-4).
            sizes = (1,) + sizes
        for b in sizes:
            if len(seq) <= b:
                return seq + [seq[-1]] * (b - len(seq))
        return seq

    def _run_batch(self, kind: str, items: list) -> list:
        eng = self.engine
        n_real = len(items)
        items = self._pad(kind, items)
        if kind == "row":
            rows = jnp.stack([it[0] for it in items])
            ns = jnp.asarray([it[1] for it in items], jnp.int32)
            gs = jnp.concatenate([jnp.asarray(it[2], jnp.float32) for it in items])
            bucket = eng.serving_row_bucket(max(it[1] for it in items))
            wavs = eng._vocode_row_fn(bucket)(eng.core["hifigan"], rows, ns, gs)
            with eng._row_warm_lock:
                eng._hot_row_buckets.add(bucket)
            wavs = np.asarray(wavs).astype(np.float32) / 32767.0
            return [
                wavs[i, : eng._true_wav_len(items[i][1])] for i in range(n_real)
            ]
        if kind == "seg_first":
            # (row, n_mask, g): fixed [0, FIRST_SEG_PF) emission through the
            # small head program — ~3x less generator work than the full
            # segment window, sized for the time-to-first-audio path
            rows = jnp.stack([it[0] for it in items])
            ns = jnp.asarray([it[1] for it in items], jnp.int32)
            gs = jnp.concatenate([jnp.asarray(it[2], jnp.float32) for it in items])
            with span("vocode.seg_first_device"):
                wavs = eng._vocode_seg_first_fn()(eng.core["hifigan"], rows, ns, gs)
                wavs = np.asarray(wavs).astype(np.float32) / 32767.0
            return [wavs[i, : FIRST_SEG_PF * 256] for i in range(n_real)]
        # seg: (row, n_mask, emit_start_pf, emit_count_pf, g)
        rows = jnp.stack([it[0] for it in items])
        ns = jnp.asarray([it[1] for it in items], jnp.int32)
        starts = [eng._seg_slice_start(it[2]) for it in items]
        gs = jnp.concatenate([jnp.asarray(it[4], jnp.float32) for it in items])
        with span("vocode.seg_device"):
            wavs = eng._vocode_seg_fn()(
                eng.core["hifigan"], rows, ns, jnp.asarray(starts, jnp.int32), gs
            )
            wavs = np.asarray(wavs).astype(np.float32) / 32767.0
        outs = []
        for i in range(n_real):
            offset = items[i][2] - starts[i]
            outs.append(wavs[i, offset * 256 : (offset + items[i][3]) * 256])
        return outs


class _SpecFirstSeg:
    """Speculative first-segment vocode for a streaming chunk.

    The decode runner calls `hook(row, n_claim)` dispatch-side after each
    block (BEFORE the status fetch). Once the deterministic token count
    crosses the first-emit threshold, the first segment's vocode is launched
    immediately — its device work queues behind the decode block and its
    host fetch overlaps the status round-trip, removing one full link RTT
    from time-to-first-audio. The claim is exact unless the slot stopped
    inside the block, so the phase-2 consumer only uses the result after a
    status-backed snapshot confirms n >= claim (and discards it on an
    early final). Emitted samples sit below total_pf(claim-2) - PAD_PF, the
    same receptive-field holdback as the normal snapshot path, so the
    waveform is bit-identical either way."""

    __slots__ = ("engine", "g", "claim_n", "emit_pf", "task")

    def __init__(self, engine: "XTTSv2Engine", speaker_embeddings):
        self.engine = engine
        self.g = speaker_embeddings
        self.claim_n: Optional[int] = None
        self.emit_pf = 0
        self.task: Optional[asyncio.Task] = None

    def hook(self, row, n_claim: int) -> bool:
        eng = self.engine
        high = max(0, eng._total_pf(max(0, n_claim - 2)) - PAD_PF)
        if high < FIRST_SEG_PF:
            return False  # not enough final samples yet; call again next block
        # emit exactly FIRST_SEG_PF through the dedicated small head program
        # (~3x less generator work than the generic segment window); whatever
        # extra is already final shifts into the next (pipelined) segment
        self.claim_n, self.emit_pf = n_claim, FIRST_SEG_PF
        loop = asyncio.get_running_loop()
        self.task = loop.create_task(
            eng._vocode_batcher.submit("seg_first", (row, n_claim, self.g))
        )
        # a discarded speculation must not surface "exception never retrieved"
        self.task.add_done_callback(
            lambda t: t.exception() if not t.cancelled() else None
        )
        return True

    def discard(self) -> None:
        if self.task is not None and not self.task.done():
            self.task.cancel()
        self.task = None


class XTTSv2Engine(BaseAsyncTTSEngine):
    """Asynchronous XTTSv2 engine on the JAX decode loop."""

    model_type = "xtts"

    def __init__(
        self,
        hifi_config: XTTSConfig,
        gpt_config: XTTSGPTConfig,
        *,
        params: dict,
        core: dict,
        tokenizer: Optional[TTSTokenizer] = None,
        max_concurrency: int = 10,
        decode_slots: Optional[int] = None,
        steps_per_sync: int = 16,
        tensor_parallel_size: int = 1,
        pipeline_parallel_size: int = 1,
        cache_dtype=jnp.bfloat16,
        vocoder_dtype=jnp.bfloat16,
        kv_int8: Optional[bool] = None,
        decode_w8a8: Optional[bool] = None,
        prefill_w8a8: Optional[bool] = None,
        unroll_layers: Optional[bool] = None,
        slot_bucketing: Optional[bool] = None,
        conditioning_cache_size: int = 32,
        ref_length_quantum_s: float = 1.0,
        seg_first_batch1: bool = False,
        seed: int = 0,
        **kwargs,
    ):
        self.hifi_config = hifi_config
        if unroll_layers is None:
            # serving default on TPU: straight-line 30-layer body instead of
            # lax.fori_loop — XLA can prefetch layer l+1's weights during
            # layer l's compute, which a fori body (compiled once) cannot
            # express. Measured on-chip (r2): decode 4.50->4.15 ms/step at
            # bound 256 (-8%), 8.54->8.28 at 1024 (-3%); prefill 5.37->4.74
            # ms at bucket 128 (-12%, the TTFA-critical program). Compile
            # time grows ~linearly in depth — acceptable behind warmup()
            # + the persistent cache; hermetic CPU tests keep the fori body
            # (compile speed dominates there). Parity: test_decode_loop.py
            # unroll-vs-fori equality.
            unroll_layers = jax.default_backend() == "tpu"
        if unroll_layers != gpt_config.unroll_layers:
            gpt_config = dataclasses.replace(
                gpt_config, unroll_layers=unroll_layers
            )
        if kv_int8 is None and not gpt_config.flash_decode:
            # serving default on single-chip TPU: int8 KV halves decode's
            # KV-read bandwidth (the decode bottleneck) at 46 dB logit SNR
            # (tests/unit/test_kv_int8.py); CPU (hermetic tests) stays at
            # the cache_dtype for exact parity checks. Under tensor
            # parallelism the default is OFF: _quantize_rows reduces over
            # the model-sharded lane axis and the block-diagonal int8
            # einsums contract over the sharded dim, so GSPMD inserts
            # per-layer collectives that eat the tp latency win — opt in
            # explicitly if a profile on the target slice says otherwise.
            kv_int8 = (
                jax.default_backend() == "tpu" and tensor_parallel_size == 1
            )
        if kv_int8 is not None and kv_int8 != gpt_config.kv_int8:
            # never mutate the caller's config: it may be shared across
            # engine instances/replicas or inspected after construction
            gpt_config = dataclasses.replace(gpt_config, kv_int8=kv_int8)
        # int8 decode weights (W8A8): default AUTO on single-chip TPU —
        # chosen PER DECODE PROGRAM by a bandwidth policy, not globally.
        # Measured on v5e (BENCH_NOTES r4, tools/bench_prod_step.py,
        # int8+unroll vs int8+w8a8+unroll): halving the weight stream wins
        # -23% ms/step at slots=8/bound=256, -20% at s16/b256, -16% at
        # s16/b512, -9% at s64/b256 and s32/b1024 — every cell where the
        # weight stream is a material fraction of the KV read — but LOSES
        # ~5% at s64/b1024 where KV dominates and the per-row activation
        # quantize is pure overhead. slot_bucketing steers serving exactly
        # into the winning small-shape region, so the policy (w8a8 when
        # KV bytes < 3x weight bytes; crossover fitted from the matrix)
        # arms it for the narrow/short programs and leaves the saturated
        # long-bound program bf16. Latent SNR under w8a8 is 39.5 dB
        # (test_w8a8.py) vs 45.9 dB int8-KV-only — both far above
        # audibility. Costs: the int8 copy lives NEXT TO the bf16 blocks
        # (prefill reads those), ~+50% weight residency (~0.36 GiB),
        # counted by the HBM slot-fit. decode_w8a8=True forces it for
        # every program (the pre-r4 global behavior); False disables.
        if (decode_w8a8 or gpt_config.decode_w8a8) and tensor_parallel_size > 1:
            # blocks_q8 has no sharding specs (it would replicate on every
            # device) and the per-row activation quantize reduces over the
            # model-sharded lane axis — the same collective trap that keeps
            # kv_int8 off under TP. Refuse rather than silently regress.
            logger.warning(
                "decode_w8a8 is unsupported under tensor parallelism "
                "(int8 weights would replicate per device and activation "
                "quantization forces per-layer collectives); disabling."
            )
            decode_w8a8 = False
        if decode_w8a8 is None and not gpt_config.decode_w8a8:
            self._w8a8_auto = (
                jax.default_backend() == "tpu"
                and tensor_parallel_size == 1
                and not gpt_config.flash_decode
                and not gpt_config.ragged_decode
            )
            if self._w8a8_auto:
                logger.info(
                    "decode_w8a8 auto policy enabled (per-program int8 "
                    "weights when KV bytes < 3x weight bytes; adds "
                    "blocks_q8 to the params pytree — decode executables "
                    "key on this)"
                )
        else:
            self._w8a8_auto = False
        if decode_w8a8 is not None and decode_w8a8 != gpt_config.decode_w8a8:
            gpt_config = dataclasses.replace(gpt_config, decode_w8a8=decode_w8a8)
        # int8 prefill weights: reuse decode's blocks_q8 (zero extra HBM when
        # w8a8/auto already materialized it). Same TP refusal as decode_w8a8
        # (the int8 tensors have no sharding specs). Default ON for
        # single-chip TPU, set by the measured production-insert A/B
        # (BENCH_NOTES r4 verdict 6, tools/bisect_prefill.py): single
        # bucket-128 insert 10.35 -> 8.96 ms (-13%), burst-8 1.702 -> 1.519
        # ms/chunk (-11%), layer-stack device time -18%; last-hidden /
        # KV-row SNR vs the f32 prompt pass bounded by
        # tests/unit/test_prefill_w8a8.py.
        if prefill_w8a8 is None and not gpt_config.prefill_w8a8:
            # Auto-arm only when decode quantization was not explicitly
            # disabled: blocks_q8 is free exactly because decode already
            # materializes it (w8a8 auto/forced). A caller who opted out
            # with decode_w8a8=False keeps a pure-bf16 prompt pass too —
            # arming prefill alone would add ~0.36 GiB solely for inserts
            # and push int8 quantization noise into the KV cache they asked
            # to keep clean (ADVICE r4).
            prefill_w8a8 = (
                jax.default_backend() == "tpu"
                and tensor_parallel_size == 1
                and decode_w8a8 is not False
            )
            if prefill_w8a8:
                logger.info(
                    "prefill_w8a8 auto-enabled (single-chip TPU, int8 "
                    "prompt-pass weights reuse decode's blocks_q8; "
                    "insert-matrix executables key on this — one-time "
                    "compile absorbed by the persistent cache)"
                )
        if (prefill_w8a8 or gpt_config.prefill_w8a8) and tensor_parallel_size > 1:
            logger.warning(
                "prefill_w8a8 is unsupported under tensor parallelism "
                "(int8 weights would replicate per device and activation "
                "quantization forces per-layer collectives); disabling."
            )
            prefill_w8a8 = False
        if prefill_w8a8 is not None and prefill_w8a8 != gpt_config.prefill_w8a8:
            gpt_config = dataclasses.replace(gpt_config, prefill_w8a8=prefill_w8a8)
        self.gpt_config = gpt_config
        if gpt_config.kv_int8:
            assert not gpt_config.flash_decode, (
                "kv_int8 and flash_decode are mutually exclusive"
            )
        self.tokenizer = tokenizer
        self.max_concurrency = max_concurrency
        self.tp = tensor_parallel_size
        self.pp = pipeline_parallel_size
        # tensor-parallel serving: a (1, tp) mesh shards attention heads +
        # MLP across chips (reference passes tensor_parallel_size into vLLM,
        # XTTSv2.py:214; here the mesh + PartitionSpecs in parallel/mesh.py
        # ARE the distribution layer — GSPMD emits the all-reduces). The
        # default single-chip serving config keeps mesh=None; on a pod
        # slice, tp cuts per-step latency for TTFA-sensitive serving while
        # data_parallel_replicas scales throughput.
        self.mesh = None
        if pipeline_parallel_size > 1:
            # the knob exists for reference-API parity (XTTSv2.py:58,215);
            # at 30 layers / ~0.4B params a pipeline stage split buys
            # nothing over tp x dp on an ICI mesh (SURVEY.md §2.2) — scale
            # with tensor_parallel_size and data_parallel_replicas instead
            logger.warning(
                "pipeline_parallel_size=%d requested: pipeline parallelism "
                "is folded into the (data, model) mesh on TPU; use "
                "tensor_parallel_size (latency) or data_parallel_replicas "
                "(throughput). Proceeding without a stage split.",
                pipeline_parallel_size,
            )
        if tensor_parallel_size > 1:
            from ...parallel.mesh import make_mesh

            if gpt_config.num_attention_heads % tensor_parallel_size:
                raise ValueError(
                    f"tensor_parallel_size={tensor_parallel_size} must divide "
                    f"num_attention_heads={gpt_config.num_attention_heads}"
                )
            self.mesh = make_mesh(data=1, model=tensor_parallel_size)
        self.mel_bos_token_id = gpt_config.start_audio_token
        self.mel_eos_token_id = gpt_config.stop_audio_token

        # boot-phase timing: the tunnel rig showed a silent multi-minute
        # construction gap (r4 driver log: 21 min between the auto-arm logs
        # and the MRF line) — stamp each phase so boot cost is attributable
        _t_boot = time.perf_counter()

        def _boot_mark(phase: str) -> None:
            nonlocal _t_boot
            now = time.perf_counter()
            logger.info("boot: %s took %.1f s", phase, now - _t_boot)
            _t_boot = now

        self.params = params  # GPT pytree (incl. text embeddings + heads)
        if (
            self.gpt_config.decode_w8a8
            or self._w8a8_auto
            or self.gpt_config.prefill_w8a8
        ) and "blocks_q8" not in params:
            from .gpt import quantize_decode_weights

            # one fused program; decode programs read only blocks_q8's int8
            # tensors (jit prunes the unused bf16 blocks from their
            # executables), prefill reads only the bf16 blocks
            self.params = dict(params)
            self.params["blocks_q8"] = jax.jit(quantize_decode_weights)(
                params["blocks"]
            )
            _boot_mark("quantize_decode_weights")
        self.core = core  # conditioning + vocoder pytrees
        if vocoder_dtype is not None:
            # the generator computes in its params' dtype (MRF accumulation
            # stays f32, hifigan.py:87); bf16 matmuls/convs ride the MXU at
            # full rate — bf16 keeps f32's exponent range, and the final
            # tanh bounds the output, so waveform error stays ~1e-3 (well
            # below the 16-bit PCM quantization floor at typical levels)
            self.core = dict(core)
            self.core["hifigan"] = jax.tree.map(
                lambda x: x.astype(vocoder_dtype)
                if hasattr(x, "dtype") and x.dtype == jnp.float32
                else x,
                core["hifigan"],
            )

        # chunk-level parallelism exceeds request concurrency (one request
        # fans out into many text chunks) — default to 2x slots
        self.cache_dtype = cache_dtype
        self.decode_slots = self._fit_slots_to_hbm(
            decode_slots or max(2, 2 * max_concurrency),
            slots_explicit=decode_slots is not None,
        )
        _boot_mark("vocoder-cast + slot fit")
        if slot_bucketing is None:
            # serving default on TPU: step only the first quarter/half of the
            # slot array when the live set fits below it. Measured r3
            # back-to-back e-book A/B (64 slots, concurrency 8):
            # RTF 0.00639 -> 0.00538 (-16%) and TTFA p50 176 -> 147 ms —
            # the bench's fill/drain phases (and any real traffic's) spend
            # most steps under half occupancy, where the narrow programs cut
            # attention traffic up to 4x. Costs a 3x decode-program set;
            # warmup()/precompile_decode_programs() builds it AOT. Hermetic
            # CPU tests default OFF (compile count dominates suite time).
            slot_bucketing = jax.default_backend() == "tpu"
        # smallest young-block size that lets the first-segment speculation
        # fire after ONE block: after k steps a slot holds n = k+1 tokens and
        # the emit-safe frame count is total_pf(n-2) - PAD_PF (receptive-
        # field holdback) — find the first k where that reaches FIRST_SEG_PF
        stream_block_steps = 1
        while (
            self._total_pf(max(0, stream_block_steps - 1)) - PAD_PF < FIRST_SEG_PF
            and stream_block_steps < self.gpt_config.max_audio_tokens
        ):
            stream_block_steps += 1
        w8a8_policy = None
        if self._w8a8_auto:
            # fitted from the r4 on-chip matrix: w8a8 wins while the weight
            # stream is >= ~1/3 of the block's KV read, loses past that
            # (s64/b1024: KV 4.0 GiB vs 0.36 GiB saved -> -5%)
            d, nl = gpt_config.hidden_size, gpt_config.num_hidden_layers
            kv_elem = 1 if gpt_config.kv_int8 else jnp.dtype(cache_dtype).itemsize
            w_bytes = sum(
                int(np.prod(v.shape)) * v.dtype.itemsize
                for v in jax.tree.leaves(self.params["blocks"])
            )

            def w8a8_policy(len_bound: int, slot_bound: int) -> bool:
                kv_bytes = slot_bound * len_bound * 2 * d * nl * kv_elem
                return kv_bytes < 3 * w_bytes

        self.decode_engine = DecodeEngine(
            self.params,
            gpt_config,
            num_slots=self.decode_slots,
            cache_dtype=cache_dtype,
            steps_per_sync=steps_per_sync,
            stream_block_steps=stream_block_steps,
            seed=seed,
            device_latents=True,  # vocoder reads latents straight from HBM
            slot_bucketing=slot_bucketing,
            mesh=self.mesh,
            w8a8_policy=w8a8_policy,
        )
        _boot_mark("DecodeEngine init (KV + state alloc)")
        if self.mesh is not None:
            # conditioning + vocoder pytrees replicate onto the mesh so their
            # jits compose with mesh-sharded decode outputs (latent rows)
            from ...parallel.mesh import replicate

            self.core = {k: replicate(v, self.mesh) for k, v in self.core.items()}

        self._vocoder_jits: dict[int, Any] = {}
        # row-vocoder buckets whose programs are known-compiled (serving
        # uses only hot buckets; cold ones warm in a background thread)
        self._hot_row_buckets: set[int] = set()
        self._row_warming: set[int] = set()
        self._row_warm_lock = threading.Lock()
        # guards check-then-insert on _vocoder_jits from concurrent batch /
        # warm threads: a lost race would build DUPLICATE jit wrappers for
        # the same program, each paying its own multi-second remote compile
        self._jit_build_lock = threading.Lock()
        self._cond_jits: dict[int, Any] = {}
        self._spk_jits: dict[int, Any] = {}
        # operator knobs (judge r2): LRU entries are ~0.2 MB each — size up
        # for many-voice fleets; quantum trades conditioning-program count
        # (compile cost) against reference-tail truncation (see
        # _quantize_ref_length)
        self.conditioning_cache_size = max(1, int(conditioning_cache_size))
        self.ref_length_quantum_s = float(ref_length_quantum_s)
        self.seg_first_batch1 = bool(seg_first_batch1)
        self._cond_cache: dict[str, tuple] = {}
        self._vocode_batcher = _VocodeBatcher(self)
        self._packed_resblocks, self._packed_stages = self._maybe_pack_resblocks()
        _boot_mark("MRF packing")
        self.get_memory_usage_curve()
        _boot_mark("memory curve")

    def _maybe_pack_resblocks(self):
        """Pre-pack HiFi-GAN MRF weights for the fused Pallas kernels
        (ops/mrf.py). TPU + bf16 vocoder only: the kernel's VMEM budget
        assumes bf16 and CPU runs the XLA conv path.

        Returns (packed_resblocks, packed_stages): per-block kernels always,
        plus merged three-blocks-in-one-kernel stages (PackedMRFStage,
        bit-identical output) for every stage whose 18-conv weight set fits
        VMEM — stage 0 at C=512-initial/2=256 does not (~17 MiB), the
        narrower stages do. Per-program fixed costs dominate the per-block
        kernels (measured: a k=3 and a k=11 resblock cost 20.4 vs 25.7 ms at
        stage 3 despite 3x the taps), so merging cuts most of that."""
        try:
            hifigan = self.core["hifigan"]
            if (
                jax.default_backend() != "tpu"
                or hifigan["conv_pre_w"].dtype != jnp.bfloat16
            ):
                return None, None
            from ...ops.mrf import pack_hifigan_mrf
            from .hifigan import RESBLOCK_KERNELS

            packed, stages = pack_hifigan_mrf(
                hifigan["resblocks"], RESBLOCK_KERNELS, dtype=jnp.bfloat16
            )
            logger.info(
                "fused Pallas MRF enabled (%d resblocks packed, %d stages merged)",
                len(packed), sum(s is not None for s in stages),
            )
            return packed, stages
        except Exception as e:  # pragma: no cover — fall back to XLA convs
            logger.warning("fused MRF packing failed (%s); using XLA convs", e)
            return None, None

    # ----------------------------------------------------------- properties
    @property
    def conditioning_config(self) -> ConditioningConfig:
        return ConditioningConfig(
            speaker_embeddings=True, gpt_like_decoder_conditioning=True
        )

    def _hbm_plan_bytes(self) -> tuple[int, int]:
        """(weight_bytes, per_slot_bytes) of the static HBM plan.

        Weights = GPT + conditioning/vocoder pytrees as materialized on
        device. Per-slot = dense KV rows [L, T_max, 2*D] in the cache dtype
        (1 byte + f32 scale rows when kv_int8) plus the per-slot latent
        accumulation buffer [T_audio, D] f32 (decode_loop.py:69)."""
        cfg = self.gpt_config

        def _bytes(tree) -> int:
            return sum(
                int(np.prod(x.shape)) * x.dtype.itemsize
                for x in jax.tree.leaves(tree)
                if hasattr(x, "shape")
            )

        weight_bytes = _bytes(self.params) + _bytes(self.core)
        if cfg.kv_int8:
            per_token = 2 * cfg.hidden_size * 1 + 2 * 4  # int8 k/v + f32 scales
        else:
            per_token = 2 * cfg.hidden_size * jnp.dtype(self.cache_dtype).itemsize
        slot_bytes = cfg.num_hidden_layers * cfg.max_seq_len * per_token
        slot_bytes += cfg.max_audio_tokens * cfg.hidden_size * 4  # latents_buf
        return weight_bytes, slot_bytes

    def _fit_slots_to_hbm(self, num_slots: int, *, slots_explicit: bool) -> int:
        """Clamp the KV slot count so weights + KV fit the chip's HBM.

        The TPU analogue of the reference's empirical VRAM polynomial +
        `gpu_memory_utilization` sizing (XTTSv2.py:152-171, base.py:160-177):
        here the plan is exact arithmetic, not a curve fit. When the runtime
        exposes no `bytes_limit` (some backends don't), the plan is logged by
        `get_memory_usage_curve` but not enforced."""
        weight_bytes, slot_bytes = self._hbm_plan_bytes()
        limit = None
        try:
            stats = jax.local_devices()[0].memory_stats()
            if stats:
                limit = stats.get("bytes_limit")
        except Exception:  # pragma: no cover — backend without memory_stats
            limit = None
        if not limit:
            return num_slots
        # 8% headroom for activations, XLA scratch and compiled programs
        budget = int(limit * 0.92) - weight_bytes
        if budget < 2 * slot_bytes:
            raise RuntimeError(
                f"model weights ({weight_bytes / 1024**3:.2f} GiB) + 2 KV slots "
                f"({2 * slot_bytes / 1024**2:.0f} MiB) exceed device HBM "
                f"({limit / 1024**3:.2f} GiB); this chip cannot serve this model"
            )
        fit = int(budget // slot_bytes)
        if fit < num_slots:
            level = logger.error if slots_explicit else logger.warning
            level(
                "decode_slots=%d needs %.2f GiB KV but only %.2f GiB HBM "
                "remains after weights — clamping to %d slots",
                num_slots,
                num_slots * slot_bytes / 1024**3,
                budget / 1024**3,
                fit,
            )
            return fit
        return num_slots

    def get_memory_usage_curve(self) -> float:
        """HBM budget: weights + per-slot dense KV. Logged at engine boot so
        operators can size `max_concurrency` against the chip's HBM (the TPU
        analogue of the reference's empirical VRAM polynomial,
        XTTSv2.py:152-171)."""
        weight_bytes, slot_bytes = self._hbm_plan_bytes()
        total = weight_bytes + slot_bytes * self.decode_slots
        self.max_gb_for_model = total / 1024**3
        logger.info(
            "HBM plan: %.2f GiB (weights %.2f GiB + %d slots x %.1f MiB KV)",
            self.max_gb_for_model,
            weight_bytes / 1024**3,
            self.decode_slots,
            slot_bytes / 1024**2,
        )
        return self.max_gb_for_model

    # -------------------------------------------------------- construction
    @classmethod
    def from_pretrained(
        cls,
        pretrained_model_name_or_path: str,
        *,
        gpt_model: Optional[str] = None,
        torch_dtype=None,  # accepted for API compat; ignored
        dtype=jnp.bfloat16,
        **kwargs,
    ) -> "XTTSv2Engine":
        """Load from a local directory holding the dual-safetensors layout.
        (Hub download is not available in this offline environment.)"""
        root = Path(pretrained_model_name_or_path)
        with open(root / "config.json") as f:
            config = json.load(f)
        hifi_config = XTTSConfig.from_dict(config)
        gpt_config = XTTSGPTConfig.from_dict(config.get("gpt_config", {}))

        core_file = find_artifact(root, ("xtts-v2.safetensors",))
        gpt_root = Path(gpt_model) if gpt_model else root
        gpt_file = find_artifact(gpt_root, ("gpt2_model.safetensors",))

        core_state = load_safetensors(core_file)
        gpt_state = load_safetensors(gpt_file)
        core = load_core_params(core_state, hifi_config, dtype=jnp.float32)
        params = load_gpt_params(gpt_state, gpt_config, dtype=dtype)
        params["text_wte"] = core["text_wte"].astype(dtype)
        params["text_wpe"] = core["text_wpe"].astype(dtype)

        tokenizer = None
        for cand_dir in (gpt_root, root):
            try:
                tokenizer = TTSTokenizer.from_pretrained(str(cand_dir))
                break
            except FileNotFoundError:
                continue
        if tokenizer is None:
            raise FileNotFoundError(
                f"tokenizer.json not found under {gpt_root} or {root}"
            )
        return cls(hifi_config, gpt_config, params=params, core=core,
                   tokenizer=tokenizer, **kwargs)

    @classmethod
    def random_init(
        cls,
        config: Optional[XTTSConfig] = None,
        tokenizer: Optional[TTSTokenizer] = None,
        dtype=jnp.float32,
        seed: int = 0,
        **kwargs,
    ) -> "XTTSv2Engine":
        """Random-weight engine for hermetic tests and dry runs."""
        cfg = config or tiny_test_config()
        g = cfg.gpt
        keys = jax.random.split(jax.random.PRNGKey(seed), 6)
        t0 = time.perf_counter()
        # each module init runs under ONE jit: eager init emits one tiny XLA
        # program per tensor (hundreds at full size), and on remote-compile
        # rigs every program costs a compile-server round-trip — fusing cuts
        # full-size random boot from hundreds of compiles to five
        params = jax.jit(lambda k: init_gpt_params(g, k, dtype=dtype))(keys[0])
        core = {
            "cond_encoder": jax.jit(
                lambda k: init_conditioning_encoder_params(
                    k, spec_dim=80, embed_dim=g.hidden_size, dtype=dtype
                )
            )(keys[1]),
            "perceiver": jax.jit(
                lambda k: init_perceiver_params(
                    k, dim=g.hidden_size, num_latents=g.num_cond_latents, dtype=dtype
                )
            )(keys[2]),
            "speaker_encoder": jax.jit(
                lambda k: init_speaker_encoder_params(k, dtype=dtype)
            )(keys[3]),
            "hifigan": jax.jit(
                lambda k: init_hifigan_params(
                    k, in_channels=g.hidden_size, cond_channels=cfg.d_vector_dim,
                    upsample_initial=64 if g.hidden_size <= 128 else 512,
                    dtype=dtype,
                )
            )(keys[4]),
            "mel_stats": jnp.ones((80,), jnp.float32),
        }
        jax.block_until_ready(params["wte"])
        logger.info(
            "boot: random weight init (5 fused programs) took %.1f s",
            time.perf_counter() - t0,
        )
        return cls(cfg, g, params=params, core=core, tokenizer=tokenizer,
                   cache_dtype=dtype, **kwargs)

    # -------------------------------------------------------- conditioning
    def _speaker_fn(self, n_samples: int):
        # double-checked under _jit_build_lock like every jit-cache builder:
        # concurrent to_thread callers must reuse ONE wrapper or each pays
        # its own multi-second remote compile
        fn = self._spk_jits.get(n_samples)
        if fn is not None:
            return fn
        with self._jit_build_lock:
            if n_samples not in self._spk_jits:
                self._spk_jits[n_samples] = jax.jit(
                    lambda p, wav: speaker_encoder(p, wav, l2_norm=True)
                )
        return self._spk_jits[n_samples]

    def _cond_fn(self, n_samples: int):
        fn = self._cond_jits.get(n_samples)
        if fn is not None:
            return fn
        with self._jit_build_lock:
            if n_samples in self._cond_jits:
                return self._cond_jits[n_samples]
            mel_norms = self.core["mel_stats"]

            def run(ce, pv, wav):
                mel = wav_to_mel_cloning(
                    wav, mel_norms=mel_norms, n_fft=2048, hop_length=256,
                    win_length=1024, power=2.0, sample_rate=22050,
                    f_min=0.0, f_max=8000.0, n_mels=80,
                )  # [1, 80, F]
                h = conditioning_encoder(ce, jnp.swapaxes(mel, 1, 2),
                                         self.gpt_config.num_attention_heads)
                return perceiver_resampler(pv, h)  # [1, C, D]

            self._cond_jits[n_samples] = jax.jit(run)
        return self._cond_jits[n_samples]

    # Reference-audio lengths are truncated DOWN to the ref_length_quantum_s
    # grid (seconds; constructor/CLI knob, default 1.0) so the conditioning/
    # speaker-encoder programs compile for a bounded set of shapes —
    # arbitrary file lengths would otherwise trigger a fresh XLA compile
    # (tens of seconds) per new voice. Truncation keeps the math on the kept
    # samples exact; at most quantum seconds of a >=3 s reference are
    # dropped. Set to 0 to disable (exact reference behavior; dynamic
    # compile cost applies).
    def _quantize_ref_length(self, audio: np.ndarray, sr: int) -> np.ndarray:
        q = self.ref_length_quantum_s
        if not q:
            return audio
        quantum = max(1, int(sr * q))
        n = (audio.shape[-1] // quantum) * quantum
        if n == 0:
            n = audio.shape[-1]  # sub-quantum clips stay exact
        return audio[..., :n]

    def get_gpt_cond_latents(
        self, audio_22k: np.ndarray, length: int = 30, chunk_length: int = 6
    ) -> np.ndarray:
        """Mean perceiver latent over `chunk_length`-second windows
        (reference: XTTSv2.py:349-407). audio_22k: [1, T]."""
        sr = 22050
        if length > 0:
            audio_22k = audio_22k[:, : sr * length]
        chunks = []
        step = sr * chunk_length
        for i in range(0, audio_22k.shape[1], step):
            chunk = audio_22k[:, i : i + step]
            if chunk.shape[-1] < sr * 0.33:
                continue  # reference skips sub-1/3-second tails
            chunks.append(chunk)
        if not chunks:
            chunks = [audio_22k]
        embs = []
        for chunk in chunks:
            fn = self._cond_fn(chunk.shape[-1])
            embs.append(
                fn(self.core["cond_encoder"], self.core["perceiver"],
                   jnp.asarray(chunk, jnp.float32))
            )
        return np.mean([np.asarray(e, np.float32) for e in embs], axis=0)  # [1, C, D]

    async def get_audio_conditioning(
        self,
        audio_reference: Union[str, bytes, List],
        max_ref_length: int = 30,
        gpt_cond_len: int = 6,
        gpt_cond_chunk_len: int = 6,
        librosa_trim_db: Optional[float] = None,
        sound_norm_refs: bool = False,
        load_sr: int = 22050,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(gpt conditioning latents [1, C, D], speaker d-vector [1, 512]).

        Results are LRU-cached per (reference content, conditioning params):
        repeated-voice workloads skip the whole conditioning pass (the
        reference only offers this via prepare_for_streaming_generation)."""
        refs = audio_reference if isinstance(audio_reference, list) else [audio_reference]
        import hashlib

        hasher = hashlib.md5()
        for ref in refs:
            if isinstance(ref, (bytes, bytearray)):
                hasher.update(ref)
            else:
                hasher.update(str(ref).encode())
                try:
                    hasher.update(str(os.path.getmtime(ref)).encode())
                except OSError:
                    pass
        hasher.update(f"{max_ref_length}|{gpt_cond_len}|{gpt_cond_chunk_len}|"
                      f"{librosa_trim_db}|{sound_norm_refs}|{load_sr}".encode())
        cache_key = hasher.hexdigest()
        hit = self._cond_cache.pop(cache_key, None)
        if hit is not None:
            # re-insert on hit: dict order is the eviction order, so this is
            # a real LRU (plain check-and-return was FIFO — a continuously
            # served voice could be the first evicted)
            self._cond_cache[cache_key] = hit
            trace_record("phase1.cond_cache_hit", 0.0)
            return hit

        t_cond = time.perf_counter()
        speaker_embs, audios = [], []
        for ref in refs:
            def _load(r=ref):
                # file decode + resample are milliseconds-to-seconds of pure
                # host work: keep them off the serving event loop (the
                # decode runner shares it)
                a = audio_io.load_audio(r, load_sr)[:, : load_sr * max_ref_length]
                if librosa_trim_db is not None:
                    a = trim_silence_db(a, top_db=float(librosa_trim_db))
                a = self._quantize_ref_length(a, load_sr)
                if sound_norm_refs:
                    a = a / max(np.abs(a).max(), 1e-8) * 0.75
                return a, resample_np(a.astype(np.float32), load_sr, 16000)
            audio, wav16 = await asyncio.to_thread(_load)
            emb = await asyncio.to_thread(
                lambda w=wav16: np.asarray(
                    self._speaker_fn(w.shape[-1])(
                        self.core["speaker_encoder"], jnp.asarray(w)
                    ),
                    np.float32,
                )
            )
            speaker_embs.append(emb)
            audios.append(audio.astype(np.float32))

        full_audio = np.concatenate(audios, axis=-1)
        gpt_cond = await asyncio.to_thread(
            self.get_gpt_cond_latents, full_audio, gpt_cond_len, gpt_cond_chunk_len
        )
        speaker = np.mean(np.stack(speaker_embs), axis=0)  # [1, 512]
        trace_record("phase1.cond_miss", time.perf_counter() - t_cond)
        while len(self._cond_cache) >= self.conditioning_cache_size:
            self._cond_cache.pop(next(iter(self._cond_cache)))
        self._cond_cache[cache_key] = (gpt_cond, speaker)
        return gpt_cond, speaker

    # ------------------------------------------------------ prompt assembly
    def _cond_device(self, cond_latents) -> "jax.Array":
        """Voice conditioning latents as a device-resident [C, D] array —
        uploaded ONCE per request (128 KB), shared by every chunk's
        TokenPrompt instead of re-shipping inside each chunk's embeddings."""
        if isinstance(cond_latents, jax.Array):
            dev = cond_latents.reshape(-1, self.gpt_config.hidden_size)
        else:
            dev = jnp.asarray(
                np.asarray(cond_latents, np.float32).reshape(
                    -1, self.gpt_config.hidden_size
                )
            )
        if self.mesh is not None:
            from ...parallel.mesh import replicate

            dev = replicate(dev, self.mesh)
        return dev

    def _build_prompt(self, cond_dev, token_ids: List[int]) -> TokenPrompt:
        """Transfer-thin prompt spec: device cond latents + host token ids
        (bos/eos added here). The [cond ⊕ text+text_wpe ⊕ start-audio]
        embedding matrix is assembled IN-GRAPH at insert
        (decode_loop._assemble_prompt) — the host uploads ~2 KB of ids per
        chunk instead of a 1-2 MB matrix (the reference ships full embeds
        into vLLM per chunk, vllm_mm_gpt.py:274-295)."""
        max_text = self.gpt_config.max_text_tokens
        if len(token_ids) > max_text:
            logger.warning(
                "Text chunk of %d tokens exceeds max_text_tokens=%d; truncating",
                len(token_ids), max_text,
            )
            token_ids = token_ids[:max_text]
        ids = np.asarray(
            [self.tokenizer.bos_token_id, *token_ids, self.tokenizer.eos_token_id],
            np.int32,
        )
        return TokenPrompt(cond=cond_dev, ids=ids)

    # ----------------------------------------------------------- generation
    async def get_generation_context(
        self,
        request: TTSRequest,
        gpt_cond_latent: Optional[np.ndarray] = None,
        speaker_embeddings: Optional[np.ndarray] = None,
    ):
        """Phase 1: conditioning + chunked prompt submission. Returns
        (handles, request ids, speaker embedding, conditioning latents)."""
        if gpt_cond_latent is None or speaker_embeddings is None:
            gpt_cond_latent, speaker_embeddings = await self.get_audio_conditioning(
                request.speaker_files,
                request.max_ref_length,
                request.gpt_cond_len,
                request.gpt_cond_chunk_len,
                sound_norm_refs=request.sound_norm_refs,
                load_sr=request.load_sample_rate,
            )

        with span("phase1.tokenize"):
            token_chunks = self.tokenizer.encode_with_split(
                request.text, request.language
            )
        if not token_chunks:
            # surface a clear, early error instead of the downstream
            # empty-concatenate crash (the reference fails the same ugly way
            # on empty input: combine_outputs over zero chunks)
            raise ValueError(
                "TTSRequest.text contains no speakable content "
                f"(text={request.text!r})"
            )
        options = SamplingOptions(
            temperature=request.temperature,
            top_p=request.top_p,
            top_k=request.top_k,
            repetition_penalty=request.repetition_penalty,
            do_sample=request.do_sample,
            max_new_tokens=int(request.max_new_tokens or 0),
        )
        handles, request_ids = [], []
        cond_dev = self._cond_device(gpt_cond_latent)
        try:
            for idx, ids in enumerate(token_chunks):
                prompt = self._build_prompt(cond_dev, ids)
                # streaming requests get a snapshot mailbox so audio segments
                # can be vocoded while the chunk is still decoding (intra-chunk
                # streaming; the reference streams only whole chunks, §3.3)
                queue = asyncio.Queue() if request.stream else None
                # speculative first-segment vocode: launched by the runner the
                # moment enough tokens exist, overlapping the status round-trip
                spec = _SpecFirstSeg(self, speaker_embeddings) if request.stream else None
                fut = asyncio.ensure_future(
                    self.decode_engine.generate(
                        prompt, options, stream_queue=queue,
                        on_young_block=spec.hook if spec is not None else None,
                    )
                )
                handles.append((fut, queue, spec))
                request_ids.append(f"{request.request_id}_{idx}")
        except BaseException:
            # a failure (or cancellation of phase 1) after some chunks were
            # already submitted must not leave those chunks decoding with no
            # consumer — the caller never receives the handles
            for handle in handles:
                self.cancel_generation_handle(handle)
            raise
        return handles, request_ids, speaker_embeddings, gpt_cond_latent

    def cancel_generation_handle(self, handle) -> None:
        """Abort one chunk's decode (request abandoned before its phase-2
        generator ever started — started generators clean up in their own
        finally). Cancelling the task flags the DecodeEngine pending, which
        drops it from the queue / releases its slot on the runner's next
        pass."""
        if isinstance(handle, tuple):
            fut, _queue, spec = (tuple(handle) + (None,))[:3]
        else:
            fut, spec = handle, None
        if spec is not None:
            spec.discard()
        if not fut.done():
            fut.cancel()

    # --------------------------------------------------------------- vocode
    def _vocoder_fn(self, bucket: int):
        fn = self._vocoder_jits.get(bucket)
        if fn is not None:
            return fn
        with self._jit_build_lock:
            if bucket in self._vocoder_jits:
                return self._vocoder_jits[bucket]
            cfg = self.hifi_config

            def run(hp, latents, g):
                return hifi_decoder(
                    hp, latents, g,
                    ar_mel_length_compression=cfg.gpt_code_stride_len,
                    output_hop_length=cfg.output_hop_length,
                    input_sample_rate=cfg.input_sample_rate,
                    output_sample_rate=cfg.output_sample_rate,
                    packed_resblocks=self._packed_resblocks,
                    packed_stages=self._packed_stages,
                )

            self._vocoder_jits[bucket] = jax.jit(run)
        return self._vocoder_jits[bucket]

    def _true_wav_len(self, n_latents: int) -> int:
        cfg = self.hifi_config
        z1 = math.floor(n_latents * cfg.gpt_code_stride_len / cfg.output_hop_length)
        if cfg.output_sample_rate != cfg.input_sample_rate:
            z1 = math.floor(z1 * cfg.output_sample_rate / cfg.input_sample_rate)
        return z1 * 256  # total upsample factor of the generator

    def vocode(self, latents: np.ndarray, speaker_embedding: np.ndarray) -> np.ndarray:
        """latents [T, D] + d-vector [1, 512] -> waveform [N] at 24 kHz.
        Latents are padded to ONE fixed bucket (max_audio_tokens rounded up)
        and the output trimmed to the true length: a single XLA program for
        every chunk length — compile latency through the remote-compile
        tunnel dwarfs the padded-conv overhead (~165 ms per call either way)."""
        n = latents.shape[0]
        bucket = max(
            math.ceil(self.gpt_config.max_audio_tokens / LATENT_BUCKETS_STEP)
            * LATENT_BUCKETS_STEP,
            n,
        )
        padded = np.zeros((1, bucket, latents.shape[1]), np.float32)
        padded[0, :n] = latents
        wav = self._vocoder_fn(bucket)(
            self.core["hifigan"], jnp.asarray(padded), jnp.asarray(speaker_embedding)
        )
        return np.asarray(wav[0], np.float32)[: self._true_wav_len(n)]

    def _vocode_row_fn(self, bucket: int | None = None):
        """Jitted vocoder over a BATCH of device-resident latent rows
        [B, T_audio, D] (straight out of the decode loop's latents_buf —
        zero host round-trip for the floats). Positions >= n[b] hold stale
        slot data and are masked in-graph. `bucket` selects the latent
        length the program runs at (VOCODER_LATENT_BUCKETS): rows are
        sliced in-graph, so shorter buckets do proportionally less conv
        work; callers must pick bucket >= max(ns) + 4 for exactness."""
        t_max = self.gpt_config.max_audio_tokens
        if bucket is None:
            bucket = math.ceil(t_max / LATENT_BUCKETS_STEP) * LATENT_BUCKETS_STEP
        key = ("row", bucket)
        fn = self._vocoder_jits.get(key)
        if fn is not None:
            return fn
        with self._jit_build_lock:
            fn = self._vocoder_jits.get(key)  # double-checked: lost races
            if fn is not None:  # must reuse ONE wrapper (jit caches per fn)
                return fn
            cfg = self.hifi_config
            cut = min(bucket, t_max)

            @jax.jit
            def run(hp, rows, ns, gs):
                rows = rows[:, :cut]
                rows = jnp.where(
                    jnp.arange(cut)[None, :, None] < ns[:, None, None], rows, 0.0
                )
                b = rows.shape[0]
                padded = jnp.zeros((b, bucket, rows.shape[-1]), jnp.float32)
                padded = padded.at[:, :cut].set(rows.astype(jnp.float32))
                wav = hifi_decoder(
                    hp, padded, gs,
                    ar_mel_length_compression=cfg.gpt_code_stride_len,
                    output_hop_length=cfg.output_hop_length,
                    input_sample_rate=cfg.input_sample_rate,
                    output_sample_rate=cfg.output_sample_rate,
                    packed_resblocks=self._packed_resblocks,
                    packed_stages=self._packed_stages,
                )
                # ship int16 to the host: 4x fewer bytes on the wire, and the
                # serving formats are 16-bit PCM anyway (tanh bounds |wav|<=1)
                return jnp.round(wav * 32767.0).astype(jnp.int16)

            self._vocoder_jits[key] = run
        return self._vocoder_jits[key]

    def row_bucket(self, max_n: int) -> int:
        """Smallest row-vocoder bucket that reproduces a max_n-latent row
        exactly (see _vocode_row_fn)."""
        need = min(self.gpt_config.max_audio_tokens, max_n + 4)
        for b in VOCODER_LATENT_BUCKETS:
            if b >= need:
                return b
        return math.ceil(
            self.gpt_config.max_audio_tokens / LATENT_BUCKETS_STEP
        ) * LATENT_BUCKETS_STEP

    def serving_row_bucket(self, max_n: int) -> int:
        """row_bucket, but NEVER compiles on the serving path: if the ideal
        bucket's program isn't hot yet, serve with the smallest already-hot
        larger bucket (exact for any shorter row) and warm the ideal one in
        a background thread. Unwarmed servers converge to fully bucketed
        programs after a few batches with zero mid-request compile stalls;
        TTS.warmup() skips all of this by precompiling every bucket."""
        ideal = self.row_bucket(max_n)
        with self._row_warm_lock:  # warm threads mutate the set concurrently
            hot = set(self._hot_row_buckets)
        if ideal in hot:
            return ideal
        self._warm_row_bucket_async(ideal)
        candidates = [b for b in hot if b >= ideal]
        if candidates:
            return min(candidates)
        # nothing hot that covers this length: pay the one-time compile of
        # the TOP bucket (valid for every future length) rather than the
        # ideal one, so this stall can never repeat for a different length
        top = self.row_bucket(self.gpt_config.max_audio_tokens)
        return top

    def _warm_row_bucket_async(self, bucket: int) -> None:
        with self._row_warm_lock:
            if bucket in self._hot_row_buckets or bucket in self._row_warming:
                return
            self._row_warming.add(bucket)

        def warm():
            try:
                t_max = self.gpt_config.max_audio_tokens
                d = self.gpt_config.hidden_size
                rows = jnp.zeros((_VocodeBatcher.MAX_BATCH, t_max, d), jnp.float32)
                ns = jnp.ones((_VocodeBatcher.MAX_BATCH,), jnp.int32)
                gs = jnp.zeros(
                    (_VocodeBatcher.MAX_BATCH, self.hifi_config.d_vector_dim),
                    jnp.float32,
                )
                _ = self._vocode_row_fn(bucket)(self.core["hifigan"], rows, ns, gs)
                with self._row_warm_lock:
                    self._hot_row_buckets.add(bucket)
            finally:
                with self._row_warm_lock:
                    self._row_warming.discard(bucket)

        threading.Thread(target=warm, daemon=True, name=f"warm-row-{bucket}").start()

    def precompile_decode_programs(self) -> None:
        """Build every runner-dispatched program AOT: the decode-block set
        when slot bucketing needs it (it compiles through warmup traffic
        otherwise), plus ALL tokens-path insert programs — warmup traffic
        cannot cover the (prompt bucket x burst size) matrix
        deterministically (see DecodeEngine.precompile_inserts). Engine-level
        so ReplicatedTTSEngine forwards it to every replica."""
        if self.decode_engine.slot_bucketing:
            self.decode_engine.precompile()
        # cond width = the perceiver's fixed latent count; dtype f32 matches
        # _cond_device's upload (get_gpt_cond_latents means in np.float32)
        self.decode_engine.precompile_inserts(
            cond_len=int(self.gpt_config.num_cond_latents)
        )

    def precompile_vocoder_buckets(self, batch: int = 4) -> None:
        """Compile every (bucket, batch) row-vocoder program up front so
        length-bucketed serving never pays a mid-stream XLA compile.
        Warming EXECUTES a dummy batch (an AOT .lower().compile() does not
        reliably populate the jit call cache) and DRAINS it, so no queued
        work bleeds past this call into serving traffic."""
        t_max = self.gpt_config.max_audio_tokens
        d = self.gpt_config.hidden_size
        rows = jnp.zeros((batch, t_max, d), jnp.float32)
        ns = jnp.full((batch,), 1, jnp.int32)
        gs = jnp.zeros((batch, self.hifi_config.d_vector_dim), jnp.float32)
        for b in VOCODER_LATENT_BUCKETS:
            out = self._vocode_row_fn(b)(self.core["hifigan"], rows, ns, gs)
            with self._row_warm_lock:
                self._hot_row_buckets.add(b)
        # streaming programs: every seg_first pad size (the batcher pads a
        # burst of >4 speculative first segments to 8 — weight-stream-bound,
        # same device time as 4) and the mid-stream segment window. Warmup's
        # single streaming request only ever forms the batch-4 shapes.
        sf = self._vocode_seg_first_fn()
        for sb in _VocodeBatcher._SEG_FIRST_SIZES:
            out = sf(
                self.core["hifigan"], rows[:1].repeat(sb, 0),
                ns[:1].repeat(sb, 0), gs[:1].repeat(sb, 0),
            )
        seg = self._vocode_seg_fn()
        out2 = seg(
            self.core["hifigan"], rows, ns,
            jnp.zeros((rows.shape[0],), jnp.int32), gs,
        )
        _ = jax.device_get((out[0, :1], out2[0, :1]))  # drain queued work

    def vocode_device_row(
        self, latents_row: jax.Array, n: int, speaker_embedding: np.ndarray
    ) -> np.ndarray:
        """Vocode a device-resident latent row (see DecodeEngine
        device_latents); only the waveform crosses back to the host."""
        wav = self._vocode_row_fn()(
            self.core["hifigan"], latents_row[None], jnp.asarray([n], jnp.int32),
            jnp.asarray(speaker_embedding),
        )
        wav = np.asarray(wav[0]).astype(np.float32) / 32767.0
        return wav[: self._true_wav_len(n)]

    # ------------------------------------------------- streaming vocoder
    def _total_pf(self, n_latents: int) -> int:
        """Post-interp frame count for n latents (== _true_wav_len // 256)."""
        return self._true_wav_len(n_latents) // 256

    @property
    def _bucket_pf(self) -> int:
        cfg = self.hifi_config
        bucket = (
            math.ceil(self.gpt_config.max_audio_tokens / LATENT_BUCKETS_STEP)
            * LATENT_BUCKETS_STEP
        )
        return self._total_pf(bucket)

    def _vocode_seg_fn(self):
        """Jitted segment vocoder: interps the full masked row exactly like
        the full-row program, slices [slice_start, slice_start + PAD+SEG+PAD)
        post-interp frames, and runs the generator on the slice. With PAD_PF
        >= the generator's receptive field, the emitted center equals the
        full-row output sample-for-sample."""
        fn = self._vocoder_jits.get("seg")
        if fn is not None:
            return fn
        with self._jit_build_lock:
            if "seg" in self._vocoder_jits:
                return self._vocoder_jits["seg"]
            from .hifigan import hifigan_generator
            from ...ops.interpolate import interp_linear_scale

            cfg = self.hifi_config
            t_max = self.gpt_config.max_audio_tokens
            bucket = (
                math.ceil(t_max / LATENT_BUCKETS_STEP) * LATENT_BUCKETS_STEP
            )
            slice_len = PAD_PF + SEG_PF + PAD_PF

            @jax.jit
            def run(hp, rows, ns, slice_starts, gs):
                rows = jnp.where(
                    jnp.arange(t_max)[None, :, None] < ns[:, None, None], rows, 0.0
                )
                b = rows.shape[0]
                padded = jnp.zeros((b, bucket, rows.shape[-1]), jnp.float32)
                padded = padded.at[:, :t_max].set(rows.astype(jnp.float32))
                z = jnp.swapaxes(padded, 1, 2)
                z = interp_linear_scale(
                    z, cfg.gpt_code_stride_len / cfg.output_hop_length
                )
                if cfg.output_sample_rate != cfg.input_sample_rate:
                    z = interp_linear_scale(
                        z, cfg.output_sample_rate / cfg.input_sample_rate
                    )

                def one(zb, start):
                    return lax.dynamic_slice(
                        zb, (0, start), (zb.shape[0], slice_len)
                    )

                zs = jax.vmap(one)(z, slice_starts)  # [B, D, slice_len]
                wav = hifigan_generator(hp, jnp.swapaxes(zs, 1, 2), gs,
                                        packed_resblocks=self._packed_resblocks,
                                        packed_stages=self._packed_stages)
                return jnp.round(wav * 32767.0).astype(jnp.int16)

            self._vocoder_jits["seg"] = run
        return self._vocoder_jits["seg"]

    def _vocode_seg_first_fn(self):
        """Jitted FIRST-segment vocoder: emits [0, FIRST_SEG_PF) from a small
        head window. The interp index map is length-independent (the source
        index of output frame j is (j+0.5)/scale-0.5 regardless of total
        length, ops/interpolate.py), so interping only the first HEAD latents
        and slicing [0, FIRST_SEG_PF + PAD_PF) is bit-identical to the
        full-row program's leading frames; PAD_PF >= the generator's
        receptive field keeps the emitted center exact. ~3x less generator
        work than the generic segment window — this program sits on the
        time-to-first-audio critical path (speculative dispatch)."""
        fn = self._vocoder_jits.get("seg_first")
        if fn is not None:
            return fn
        with self._jit_build_lock:
            if "seg_first" in self._vocoder_jits:
                return self._vocoder_jits["seg_first"]
            from .hifigan import hifigan_generator
            from ...ops.interpolate import interp_linear_scale

            cfg = self.hifi_config
            t_max = self.gpt_config.max_audio_tokens
            # head latents: enough to cover the slice window after both
            # interps with margin (window/pf_per_token + interp locality)
            head = min(64, t_max)
            slice_len = FIRST_SEG_PF + PAD_PF

            @jax.jit
            def run(hp, rows, ns, gs):
                rows = rows[:, :head]
                rows = jnp.where(
                    jnp.arange(head)[None, :, None] < ns[:, None, None],
                    rows, 0.0,
                )
                z = jnp.swapaxes(rows.astype(jnp.float32), 1, 2)
                z = interp_linear_scale(
                    z, cfg.gpt_code_stride_len / cfg.output_hop_length
                )
                if cfg.output_sample_rate != cfg.input_sample_rate:
                    z = interp_linear_scale(
                        z, cfg.output_sample_rate / cfg.input_sample_rate
                    )
                z = z[..., :slice_len]
                wav = hifigan_generator(hp, jnp.swapaxes(z, 1, 2), gs,
                                        packed_resblocks=self._packed_resblocks,
                                        packed_stages=self._packed_stages)
                return jnp.round(wav * 32767.0).astype(jnp.int16)

            self._vocoder_jits["seg_first"] = run
        return self._vocoder_jits["seg_first"]

    def _seg_slice_start(self, emit_start_pf: int) -> int:
        slice_len = PAD_PF + SEG_PF + PAD_PF
        return min(
            max(emit_start_pf - PAD_PF, 0), max(self._bucket_pf - slice_len, 0)
        )

    def _vocode_segment(
        self,
        latents_row: jax.Array,
        n_mask: int,
        emit_start_pf: int,
        emit_count_pf: int,
        speaker_embedding: np.ndarray,
    ) -> np.ndarray:
        """Emit post-interp frames [emit_start, emit_start + emit_count) as
        256 samples each, identical to the full-row vocoder's output."""
        slice_start = self._seg_slice_start(emit_start_pf)
        offset = emit_start_pf - slice_start
        wav = self._vocode_seg_fn()(
            self.core["hifigan"], latents_row[None],
            jnp.asarray([n_mask], jnp.int32),
            jnp.asarray([slice_start], jnp.int32),
            jnp.asarray(speaker_embedding),
        )
        out = np.asarray(wav[0]).astype(np.float32) / 32767.0
        return out[offset * 256 : (offset + emit_count_pf) * 256]

    async def process_tokens_to_speech(
        self,
        generator,  # an asyncio future from get_generation_context
        speaker_embeddings: Optional[np.ndarray] = None,
        multimodal_data: Optional[np.ndarray] = None,
        request: TTSRequest = None,
    ) -> AsyncGenerator[TTSOutput, None]:
        """Phase 2: vocode the chunk. Non-streaming: one full-row vocode when
        the chunk finishes. Streaming: vocode fixed segments from latent
        snapshots while the chunk is still decoding; the concatenation of the
        emitted segments equals the non-streaming waveform exactly."""
        assert speaker_embeddings is not None, "XTTSv2 needs speaker embeddings"
        if isinstance(generator, tuple):
            future, queue, spec = (tuple(generator) + (None,))[:3]
        else:
            future, queue, spec = generator, None, None
        inner = self._tokens_to_speech_inner(
            future, queue, spec, speaker_embeddings, request
        )
        try:
            async for out in inner:
                yield out
        finally:
            # consumer gone (client disconnect, stream closed, error) or
            # normal completion: make sure nothing keeps burning device
            # time. cancel() on a resolved future is a no-op; a cancelled
            # decode task releases its slot in DecodeEngine (true
            # cancellation, engine_core._Pending.cancelled).
            await inner.aclose()
            if spec is not None:
                spec.discard()
            if not future.done():
                future.cancel()

    async def _tokens_to_speech_inner(
        self, future, queue, spec, speaker_embeddings, request
    ) -> AsyncGenerator[TTSOutput, None]:
        sr = self.hifi_config.output_sample_rate

        if queue is None:
            with span("phase2.decode_wait"):
                tokens, latents, n = await future
            if n == 0:
                return
            with span("phase2.vocode"):
                wav = await self._vocode_batcher.submit(
                    "row", (latents, n, speaker_embeddings)
                )
            yield TTSOutput(
                array=wav, sample_rate=sr,
                start_time=request.start_time if request else None,
                token_length=int(len(tokens)),
            )
            return

        emitted_pf = 0
        pf_per_token = self._total_pf(self.gpt_config.max_audio_tokens) / max(
            self.gpt_config.max_audio_tokens, 1
        )
        t_consume = time.perf_counter()
        first_wait_recorded = False
        while True:
            # race the snapshot mailbox against the decode future: if
            # generate() fails BEFORE the runner owns the request (submit
            # raised, queue-full policy, engine shut down), nothing ever
            # feeds the queue and a bare get() would hang the stream
            # forever. On success the runner pushes the final snapshot
            # before resolving the future with no await in between, so a
            # completed future guarantees the queue is (or is about to be
            # in the same loop step) non-empty.
            get_task = asyncio.ensure_future(queue.get())
            try:
                await asyncio.wait(
                    {get_task, future}, return_when=asyncio.FIRST_COMPLETED
                )
            except BaseException:
                # stream closed / cancelled while waiting: don't leave the
                # mailbox get dangling ("Task was destroyed but pending")
                get_task.cancel()
                raise
            if get_task.done():
                row, n, final = get_task.result()
            else:
                get_task.cancel()
                if future.exception() is not None:
                    await future  # raises the decode failure to the caller
                row, n, final = await queue.get()
            if not first_wait_recorded:
                trace_record(
                    "phase2.first_snapshot_wait", time.perf_counter() - t_consume
                )
                first_wait_recorded = True
            if row is None:
                # poison sentinel: the decode runner crashed — surface the
                # exception carried by the future instead of hanging
                await future
                return
            if final:
                high = self._total_pf(n)
            else:
                # latents >= n-2 still blend with the mask boundary in the
                # interp; hold back a generator receptive field as well so
                # every emitted sample is final
                high = max(0, self._total_pf(max(0, n - 2)) - PAD_PF)
            # speculative first segment: the runner may already have its
            # vocode in flight (launched before this snapshot's status fetch)
            if emitted_pf == 0 and spec is not None and spec.task is not None:
                if n >= spec.claim_n:
                    with span("phase2.vocode_segment"):
                        wav = await spec.task
                    emitted_pf = spec.emit_pf
                    spec = None
                    yield TTSOutput(
                        array=wav, sample_rate=sr,
                        start_time=request.start_time if request else None,
                        token_length=int(round(emitted_pf / pf_per_token)),
                    )
                elif final:
                    # slot stopped before the claim: latents past n are
                    # stale — the speculation is garbage, emit normally
                    spec.discard()
                    spec = None
                else:
                    # status lags the claim (pipelined fetch): the spec is
                    # valid but unconfirmed; wait for the next snapshot
                    # rather than double-emitting the first segment
                    continue
            threshold = FIRST_SEG_PF if emitted_pf == 0 else SEG_PF
            while (high - emitted_pf >= threshold) or (final and high > emitted_pf):
                emit = min(SEG_PF, high - emitted_pf)
                with span("phase2.vocode_segment"):
                    wav = await self._vocode_batcher.submit(
                        "seg", (row, n, emitted_pf, emit, speaker_embeddings)
                    )
                emitted_pf += emit
                threshold = SEG_PF
                yield TTSOutput(
                    array=wav, sample_rate=sr,
                    start_time=request.start_time if request else None,
                    token_length=int(round(emit / pf_per_token)),
                )
            if final:
                break

    async def shutdown(self) -> None:
        await self.decode_engine.shutdown()
