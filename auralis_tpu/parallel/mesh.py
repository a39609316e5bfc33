"""Device mesh + sharding rules (the TPU-native replacement for the
reference's NCCL tensor/pipeline parallelism knobs, SURVEY.md §2.2).

Axes:
- "data"  — slot-parallel serving: the decode state's slot dimension is
  sharded, so each data shard runs an independent sub-batch of sequences.
  This is the throughput axis (the model fits one chip).
- "model" — megatron-style tensor parallelism over attention heads / MLP
  hidden / vocab, as a latency knob (tp in the reference, XTTSv2.py:57).

All communication is emitted by GSPMD from these NamedShardings — no
hand-written collectives. Pipeline parallelism is intentionally folded into
these axes: a 30-layer/0.4B model gains nothing from stage pipelining
(SURVEY.md §2.2 disposition).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
DCN_AXIS = "dcn"  # inter-host data parallelism (multi-slice serving)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host bootstrap (`jax.distributed.initialize`). Reads the
    standard env vars when args are omitted (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID, or their AURALIS_* aliases); a no-op
    returning False in single-process runs, so single-host serving never
    pays the coordinator handshake. Call BEFORE any jax device use.

    The reference has no analogue (vLLM's torch.distributed bootstrap is
    single-host in its deployment docs); this is the SURVEY §5 "only if
    multi-slice serving is ever needed" hook."""
    import os

    def env(*names):
        for n in names:
            v = os.environ.get(n)
            if v:
                return v
        return None

    coordinator_address = coordinator_address or env(
        "AURALIS_COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        v = env("AURALIS_NUM_PROCESSES", "JAX_NUM_PROCESSES")
        num_processes = int(v) if v else 1
    if num_processes <= 1:
        return False
    if process_id is None:
        v = env("AURALIS_PROCESS_ID", "JAX_PROCESS_ID")
        process_id = int(v) if v else None
    jax.distributed.initialize(coordinator_address, num_processes, process_id)
    return True


def make_mesh(
    devices: Optional[list] = None, data: int = 1, model: int = 1,
    dcn_data: int = 1,
) -> Mesh:
    """Device mesh. With `dcn_data` > 1 the mesh gains a leading "dcn" axis
    of data-parallel replicas ACROSS hosts/slices: decode slots shard over
    ("dcn", "data") — data parallelism needs no per-step collectives, so DCN
    latency never enters the decode path — while the "model" (tensor
    parallel) axis stays inside a slice, keeping its all-reduces on ICI.
    Multi-host placement uses mesh_utils.create_hybrid_device_mesh (falls
    back to a flat reshape under a simulated single-process topology)."""
    devices = devices if devices is not None else jax.devices()
    n = dcn_data * data * model
    if n > len(devices):
        raise ValueError(
            f"mesh {dcn_data}x{data}x{model} needs {n} devices, have {len(devices)}"
        )
    if dcn_data <= 1:
        grid = np.asarray(devices[:n]).reshape(data, model)
        return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
    n_procs = len({d.process_index for d in devices[:n]})
    if n_procs > 1:
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_hybrid_device_mesh(
            (1, data, model), (dcn_data, 1, 1), devices=devices[:n]
        )
    else:
        # simulated topology (virtual CPU mesh): plain reshape — the axis
        # SEMANTICS (slots over ("dcn","data"), tp inside a slice) are what
        # the dryrun validates; physical slice placement needs real hosts
        grid = np.asarray(devices[:n]).reshape(dcn_data, data, model)
    return Mesh(grid, (DCN_AXIS, DATA_AXIS, MODEL_AXIS))


# --------------------------------------------------------------- GPT params
def gpt_param_specs() -> dict:
    """PartitionSpecs matching the GPT pytree layout (gpt.py).

    Column-parallel: qkv and mlp-in shard their output dim; row-parallel:
    attn-proj and mlp-out shard their input dim (GSPMD inserts the
    all-reduce). Embedding and head shard the vocab dim.
    """
    tp = MODEL_AXIS
    return {
        # embedding tables and the mel head are ~2 MB total and the audio
        # vocab (1026) doesn't divide common tp degrees — replicate them
        "wte": P(),
        "wpe": P(),
        "text_wte": P(),
        "text_wpe": P(),
        "blocks": {
            "ln1_scale": P(None, None),
            "ln1_bias": P(None, None),
            "attn_w": P(None, None, tp),
            "attn_b": P(None, tp),
            "attn_proj_w": P(None, tp, None),
            "attn_proj_b": P(None, None),
            "ln2_scale": P(None, None),
            "ln2_bias": P(None, None),
            "fc_w": P(None, None, tp),
            "fc_b": P(None, tp),
            "fc_proj_w": P(None, tp, None),
            "fc_proj_b": P(None, None),
        },
        "ln_f_scale": P(),
        "ln_f_bias": P(),
        "final_norm_scale": P(),
        "final_norm_bias": P(),
        "mel_head_w": P(),
        "mel_head_b": P(),
    }


def decode_state_specs(dcn: bool = False) -> dict:
    """PartitionSpecs for the DecodeState pytree: slots ride the data axis
    (and the leading "dcn" axis on hybrid meshes — data parallelism is
    collective-free per step, so it is the axis that may safely cross DCN),
    KV lanes (flat H*Dh, see gpt.py KVCache) ride the model axis — head h
    owns lanes [h*Dh, (h+1)*Dh), so lane sharding IS head sharding as long
    as tp divides the head count."""
    dp = (DCN_AXIS, DATA_AXIS) if dcn else DATA_AXIS
    tp = MODEL_AXIS
    return {
        "cache": {
            "k": P(None, dp, None, tp),
            "v": P(None, dp, None, tp),
            # int8-mode per-token scales [L, S, T]: slot-sharded, replicated
            # over the model axis (every head shard needs every token scale)
            "k_scale": P(None, dp, None),
            "v_scale": P(None, dp, None),
        },
        "sampling": {
            "temperature": P(dp),
            "top_p": P(dp),
            "top_k": P(dp),
            "repetition_penalty": P(dp),
            "do_sample": P(dp),
            "max_new": P(dp),
            "seen": P(dp, None),
        },
        "seq_lens": P(dp),
        "audio_pos": P(dp),
        "last_token": P(dp),
        "active": P(dp),
        "done": P(dp),
        "tokens_buf": P(dp, None),
        "latents_buf": P(dp, None, None),
        "n_generated": P(dp),
        "rng": P(),
    }


def _tree_shard(tree, specs, mesh: Mesh):
    def place(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree, specs, is_leaf=lambda x: isinstance(x, jax.Array) or hasattr(x, "shape"))


def shard_gpt_params(params: dict, mesh: Mesh) -> dict:
    """Place the GPT pytree onto the mesh per `gpt_param_specs` (extra keys
    fall back to replication)."""
    specs = gpt_param_specs()

    def walk(p, s):
        if isinstance(p, dict):
            return {k: walk(v, s.get(k, P()) if isinstance(s, dict) else P()) for k, v in p.items()}
        if isinstance(p, list):
            return [walk(v, s) for v in p]
        return jax.device_put(p, NamedSharding(mesh, s if isinstance(s, P) else P()))

    return walk(params, specs)


def shard_decode_state(state, mesh: Mesh):
    """Place a DecodeState onto the mesh (slots over data, KV heads over
    model)."""
    from ..runtime.decode_loop import DecodeState
    from ..runtime.sampler import SamplingState
    from ..models.xttsv2.gpt import KVCache

    specs = decode_state_specs(dcn=DCN_AXIS in mesh.axis_names)

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return DecodeState(
        cache=KVCache(
            k=put(state.cache.k, specs["cache"]["k"]),
            v=put(state.cache.v, specs["cache"]["v"]),
            k_scale=(
                put(state.cache.k_scale, specs["cache"]["k_scale"])
                if state.cache.k_scale is not None else None
            ),
            v_scale=(
                put(state.cache.v_scale, specs["cache"]["v_scale"])
                if state.cache.v_scale is not None else None
            ),
        ),
        sampling=SamplingState(
            **{k: put(getattr(state.sampling, k), specs["sampling"][k])
               for k in specs["sampling"]}
        ),
        **{
            name: put(getattr(state, name), specs[name])
            for name in ("seq_lens", "audio_pos", "last_token", "active", "done",
                          "tokens_buf", "latents_buf", "n_generated", "rng")
        },
    )


def replicate(tree, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
