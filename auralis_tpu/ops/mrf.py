"""Pallas TPU fused HiFi-GAN ResBlock1 (the MRF hot loop).

One kernel runs a full resblock — 3 x [lrelu -> dilated conv(k) -> lrelu ->
conv(k) -> residual add] — over a time tile held in VMEM, so the six conv
activations never round-trip HBM and every conv becomes ONE MXU matmul
against im2col'd columns ([T_tile, taps*C] @ [taps*C, C]).

Narrow stages (C = 64/32) fold time into lanes (F = 128/C): x[t, c] becomes
X[t//F, (t%F)*C + c] and each dilated conv is re-expressed EXACTLY as a
contiguous-tap conv over folded rows with block-Toeplitz [F*C, F*C] weights
(`fold_resblock_params`). That keeps every array 128-lane aligned (Mosaic
rejects narrower) and cuts the MAC waste of lane padding (~5x taps growth vs
16x lane-pad waste at C=32).

Exactness: the wrapper zero-pads the sequence by HALO on both sides; every
conv input is re-masked to zero outside the true sequence, reproducing XLA's
per-conv zero padding; tile-edge garbage never reaches the emitted center
(HALO >= the chain's receptive field).

Reference math: hifigan_decoder.py:27-97 (ResBlock1); XLA fallback:
models/xttsv2/hifigan.py:_resblock1.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU = 0.1
DILATIONS = (1, 3, 5)


def _lrelu(x):
    return jnp.where(x > 0, x, LRELU * x)


# --------------------------------------------------------------- weight prep

def pack_resblock_weights(p: dict, kernel: int, dtype=None):
    """Flatten a hifigan resblock param dict into per-iteration matmul
    weights with centered tap offsets (no folding; for C >= 128).

    Returns (convs, halo): convs = 6-tuple of (offsets, W [|o|*C, C], b [1,C])
    in chain order (it0 conv1, it0 conv2, it1 conv1, ...).

    Packing math runs on whatever arrays it is handed — pass HOST numpy
    (see pack_hifigan_mrf) so reshape/astype are host ops, not one tunnel
    round trip per conv on remote-device rigs."""
    cast = (lambda a: a.astype(dtype)) if dtype is not None else (lambda a: a)
    convs = []
    for it, (conv1, conv2) in enumerate(zip(p["convs1"], p["convs2"])):
        k, c, _ = conv1["w"].shape
        assert k == kernel
        d = DILATIONS[it]
        offs1 = tuple((j - (k - 1) // 2) * d for j in range(k))
        offs2 = tuple(j - (k - 1) // 2 for j in range(k))
        convs.append((offs1, cast(conv1["w"].reshape(k * c, c)),
                      cast(conv1["b"].reshape(1, c))))
        convs.append((offs2, cast(conv2["w"].reshape(k * c, c)),
                      cast(conv2["b"].reshape(1, c))))
    halo = _chain_halo([cv[0] for cv in convs])
    return convs, halo


def _fold_one_conv(w: np.ndarray, b: np.ndarray, dilation: int, fold: int):
    """Re-express conv(k taps, dilation d) over [T, C] as a conv over folded
    rows [T/F, F*C] with contiguous taps and [F*C, F*C] block weights.

    out[qF+f, co] = sum_j x[qF + f + o_j, ci] w[j, ci, co]
    with f + o_j = F*delta + f':  W'[delta][f'*C+ci, f*C+co] += w[j, ci, co].
    """
    k, c, co = w.shape
    offs = [(j - (k - 1) // 2) * dilation for j in range(k)]
    deltas = sorted({(f + o) // fold for f in range(fold) for o in offs})
    lo, hi = deltas[0], deltas[-1]
    n_taps = hi - lo + 1
    fc = fold * c
    wf = np.zeros((n_taps, fc, fc), np.float32)
    for j, o in enumerate(offs):
        for f in range(fold):
            delta, fp = divmod(f + o, fold)
            wf[delta - lo, fp * c:(fp + 1) * c, f * c:(f + 1) * c] += np.asarray(
                w[j], np.float32
            )
    offsets = tuple(range(lo, hi + 1))
    bf = np.tile(np.asarray(b, np.float32).reshape(1, c), (1, fold))
    return offsets, wf.reshape(n_taps * fc, fc), bf


def fold_resblock_params(p: dict, kernel: int, fold: int, dtype=None):
    """pack_resblock_weights for folded (F = 128/C) narrow stages.

    Packing is pure host math (numpy); results stay numpy — callers
    device_put the finished chains in one batch (pack_hifigan_mrf)."""
    cast = (
        (lambda a: np.asarray(a).astype(dtype)) if dtype is not None else np.asarray
    )
    convs = []
    for it, (conv1, conv2) in enumerate(zip(p["convs1"], p["convs2"])):
        for conv, d in ((conv1, DILATIONS[it]), (conv2, 1)):
            offs, wf, bf = _fold_one_conv(
                np.asarray(conv["w"], np.float32),
                np.asarray(conv["b"], np.float32), d, fold,
            )
            convs.append((offs, cast(wf), cast(bf)))
    halo = _chain_halo([cv[0] for cv in convs])
    return convs, halo


def _chain_halo(offset_lists) -> int:
    """Receptive radius of the whole chain, rounded up to 8 rows."""
    r = sum(max(abs(o[0]), abs(o[-1])) for o in offset_lists)
    return -(-r // 8) * 8


# ------------------------------------------------- merged MRF stage kernel

def _make_stage_kernel(chain_shapes, c: int, t_tile: int, halo: int,
                       out_dtype, t_true: int, fold: int,
                       emit: str = "mean"):
    """Kernel body over N resblock chains sharing one x tile: the tile is
    DMA'd once (vs once per chain), the mean needs no XLA pass over the
    chain outputs, and the grid runs 1/N of the programs.
    chain_shapes: tuple of per-chain 6-tuples of tap offsets. N=1 is the
    plain per-resblock kernel (the mean epilogue is then an exact identity:
    cast -> f32 -> /1 -> cast back).

    Bit-exactness of the merged form vs N separate calls: each chain's
    result is cast to the block output dtype before the f32 mean — exactly
    what the unmerged kernels + XLA mean compute."""
    lt = t_tile + 2 * halo
    n_chains = len(chain_shapes)
    n_conv = len(chain_shapes[0])
    n_w = 2 * n_conv  # (w, b) per conv

    def body(x_hbm, *refs):
        weight_refs = refs[: n_chains * n_w]
        out_ref = refs[n_chains * n_w]
        x_buf = refs[n_chains * n_w + 1]   # [LT, C]
        a_ref = refs[n_chains * n_w + 2]   # [LT, max_taps*C]
        sem = refs[n_chains * n_w + 3]

        bb = pl.program_id(0)
        tt = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(tt * t_tile, lt)], x_buf, sem
        )
        cp.start()
        cp.wait()

        row = lax.broadcasted_iota(jnp.int32, (lt, c), 0) + (tt * t_tile - halo)
        if fold > 1:
            f_of_lane = lax.broadcasted_iota(jnp.int32, (lt, c), 1) // (c // fold)
            g = row * fold + f_of_lane
            seq_mask = (g >= 0) & (g < t_true)
        else:
            seq_mask = (row >= 0) & (row < t_true)

        def conv(t_buf, offsets, w_ref, b_ref):
            t_buf = jnp.where(seq_mask, t_buf, 0)
            for j, off in enumerate(offsets):
                dst_lo = max(0, -off)
                src_lo = max(0, off)
                length = lt - abs(off)
                if dst_lo > 0:
                    a_ref[0:dst_lo, j * c:(j + 1) * c] = jnp.zeros(
                        (dst_lo, c), a_ref.dtype
                    )
                a_ref[dst_lo:dst_lo + length, j * c:(j + 1) * c] = t_buf[
                    src_lo:src_lo + length, :
                ]
                if dst_lo + length < lt:
                    a_ref[dst_lo + length:lt, j * c:(j + 1) * c] = jnp.zeros(
                        (lt - dst_lo - length, c), a_ref.dtype
                    )
            kc = len(offsets) * c
            y = jnp.dot(
                a_ref[:, :kc], w_ref[:], preferred_element_type=jnp.float32
            )
            return y + b_ref[:].astype(jnp.float32)

        acc = None
        for ch in range(n_chains):
            wrefs = weight_refs[ch * n_w:(ch + 1) * n_w]
            y = x_buf[:].astype(jnp.float32)
            for it in range(n_conv // 2):
                o1 = chain_shapes[ch][2 * it]
                o2 = chain_shapes[ch][2 * it + 1]
                w1, b1 = wrefs[4 * it], wrefs[4 * it + 1]
                w2, b2 = wrefs[4 * it + 2], wrefs[4 * it + 3]
                t = _lrelu(y).astype(x_buf.dtype)
                h = conv(t, o1, w1, b1)
                t2 = _lrelu(h).astype(x_buf.dtype)
                h2 = conv(t2, o2, w2, b2)
                y = y + h2
            # match the unmerged path bit-for-bit: block outputs are cast to
            # the block dtype before XLA's f32 mean
            yb = y[halo:halo + t_tile, :].astype(out_dtype).astype(jnp.float32)
            acc = yb if acc is None else acc + yb
        if emit == "sum_f32":
            # partial-stage form: emit the exact f32 running sum so the
            # caller can fold in the remaining blocks' outputs in the SAME
            # association order XLA's mean uses (((z1+z2)+z3)/3)
            out_ref[0] = acc
        else:
            out_ref[0] = (acc / n_chains).astype(out_dtype)

    return body


def _run_fused_stage(x, chains, halo, t_true, fold, t_tile, interpret,
                     emit: str = "mean"):
    """chains: list of per-block conv lists (as from pack/fold_resblock_params)."""
    b, t, c = x.shape
    n_tiles = -(-t // t_tile)
    t_pad = n_tiles * t_tile
    xp = jnp.pad(x, ((0, 0), (halo, halo + (t_pad - t)), (0, 0)))
    lt = t_tile + 2 * halo
    max_taps = max(len(cv[0]) for convs in chains for cv in convs)

    weight_arrays, weight_specs = [], []
    for convs in chains:
        for offs, w, bias in convs:
            weight_arrays.append(w.astype(x.dtype))
            weight_arrays.append(bias.astype(x.dtype))
            weight_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            weight_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    body = _make_stage_kernel(
        tuple(tuple(cv[0] for cv in convs) for convs in chains),
        c, t_tile, halo, x.dtype, t_true, fold, emit,
    )
    out_dtype = jnp.float32 if emit == "sum_f32" else x.dtype
    out = pl.pallas_call(
        body,
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] + weight_specs,
        out_specs=pl.BlockSpec((1, t_tile, c), lambda bb, tt: (bb, tt, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((lt, c), x.dtype),
            pltpu.VMEM((lt, max_taps * c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, *weight_arrays)
    return out[:, :t, :]


# ------------------------------------------------------------------- public

class PackedResblock:
    """Host-side packed weights for one resblock at one stage."""

    def __init__(self, p: dict, kernel: int, c: int, dtype=None):
        self.kernel = kernel
        self.c = c
        self.fold = max(1, 128 // c)
        if self.fold > 1:
            self.convs, self.halo = fold_resblock_params(
                p, kernel, self.fold, dtype
            )
        else:
            self.convs, self.halo = pack_resblock_weights(p, kernel, dtype)

    def __call__(self, x: jax.Array, t_tile: int = 512,
                 interpret: bool = False) -> jax.Array:
        """x [B, T, C] -> [B, T, C], equal to the XLA _resblock1. Runs the
        shared stage kernel with a single chain (the mean epilogue is an
        exact identity at N=1)."""
        b, t, c = x.shape
        assert c == self.c
        if self.fold > 1:
            f = self.fold
            t_fold = -(-t // f)
            xpad = jnp.pad(x, ((0, 0), (0, t_fold * f - t), (0, 0)))
            xf = xpad.reshape(b, t_fold, f * c)
            out = _run_fused_stage(
                xf, [self.convs], self.halo, t, f, t_tile, interpret
            )
            return out.reshape(b, t_fold * f, c)[:, :t, :]
        return _run_fused_stage(x, [self.convs], self.halo, t, 1, t_tile, interpret)


class PackedMRFStage:
    """Host-side packed weights for one FULL MRF stage: all three resblocks
    (k = 3, 7, 11) fused into one kernel that emits their mean.

    vs three PackedResblock calls + an XLA mean: the stage input is read
    from HBM once instead of three times, the three block outputs never
    materialize (no extra 3-read + 1-write mean pass), and the grid runs a
    third of the programs. Output is bit-identical to the unmerged path
    (each chain's tile result is cast to the block dtype before the f32
    mean, reproducing XLA's arithmetic exactly).

    `vmem_bytes()` reports the kernel's weight + scratch footprint so the
    caller can fall back to per-block kernels where the stage doesn't fit
    (stage 0 at C=256 holds ~17 MB of weights — over VMEM). Construction
    picks the largest tile in T_TILE_CANDIDATES that fits `vmem_budget`
    (measured on v5e: 1024 beats 512 by ~6-9% at every production stage);
    `t_tile` is None when no tile fits."""

    T_TILE_CANDIDATES = (1024, 512)

    def __init__(self, blocks: list, kernels, c: int, dtype=None,
                 vmem_budget: int = 14 * 2**20):
        assert len(blocks) == len(kernels)
        self.c = c
        self.fold = max(1, 128 // c)
        self.chains = []
        halos = []
        for p, kernel in zip(blocks, kernels):
            if self.fold > 1:
                convs, halo = fold_resblock_params(p, kernel, self.fold, dtype)
            else:
                convs, halo = pack_resblock_weights(p, kernel, dtype)
            self.chains.append(convs)
            halos.append(halo)
        self.halo = max(halos)
        self.t_tile = next(
            (t for t in self.T_TILE_CANDIDATES if self.vmem_bytes(t) < vmem_budget),
            None,
        )

    def vmem_bytes(self, t_tile: int = 512, itemsize: int = 2) -> int:
        lt = t_tile + 2 * self.halo
        cl = self.c * self.fold if self.fold > 1 else self.c
        w_bytes = sum(
            int(np.prod(np.asarray(w).shape)) * itemsize
            for convs in self.chains
            for _, w, _ in convs
        )
        max_taps = max(len(cv[0]) for convs in self.chains for cv in convs)
        scratch = lt * cl * itemsize + lt * max_taps * cl * itemsize
        # + the f32 working row set (y, acc) the compiler keeps live
        working = 3 * lt * cl * 4
        return w_bytes + scratch + working

    def __call__(self, x: jax.Array, t_tile: int | None = None,
                 interpret: bool = False) -> jax.Array:
        """x [B, T, C] -> [B, T, C] = mean of the three resblocks."""
        b, t, c = x.shape
        assert c == self.c
        t_tile = t_tile or self.t_tile or 512
        if self.fold > 1:
            f = self.fold
            t_fold = -(-t // f)
            xpad = jnp.pad(x, ((0, 0), (0, t_fold * f - t), (0, 0)))
            xf = xpad.reshape(b, t_fold, f * c)
            out = _run_fused_stage(
                xf, self.chains, self.halo, t, f, t_tile, interpret
            )
            return out.reshape(b, t_fold * f, c)[:, :t, :]
        return _run_fused_stage(x, self.chains, self.halo, t, 1, t_tile, interpret)


class PackedMRFStageSplit:
    """Partial stage merge for stages whose FULL 3-block weight set exceeds
    VMEM (stage 0 at C=256, ~17 MiB): the first `n_merged` blocks run as one
    kernel emitting their exact f32 running sum, the tail blocks run their
    per-block kernels, and the mean folds together in XLA in the SAME
    association order the unmerged path uses (((z1+z2)+z3)/3) — output is
    bit-identical to three separate calls. One x read is still saved per
    merged block beyond the first. Measured on-chip (r3, batch 4, 2788-frame
    generator input): stage 0 split 20.7 ms vs per-block 11.0+13.2+15.2 =
    39.4 ms (-47%); full-merge stages win similarly (stage1 34.9 vs 61.5,
    stage2 41.0 vs 76.7, stage3 33.8 vs 74.3) and the whole vocoder runs
    112.0 vs 130.3 ms — the packing recipe's merge>split>per-block
    preference is the measured order."""

    def __init__(self, blocks: list, kernels, c: int, dtype=None,
                 vmem_budget: int = 14 * 2**20):
        assert len(blocks) >= 2
        self.n_total = len(blocks)
        # largest mergeable prefix (>= 2 blocks) that fits the budget
        self.head: PackedMRFStage | None = None
        self.n_merged = 0
        for n in range(len(blocks) - 1, 1, -1):
            cand = PackedMRFStage(blocks[:n], kernels[:n], c, dtype=dtype,
                                  vmem_budget=vmem_budget)
            if cand.t_tile is not None:
                self.head = cand
                self.n_merged = n
                break
        self.tail = [
            PackedResblock(p, k, c, dtype=dtype)
            for p, k in zip(blocks[self.n_merged:], kernels[self.n_merged:])
        ] if self.head is not None else None

    @property
    def viable(self) -> bool:
        return self.head is not None

    @property
    def t_tile(self):
        """Tile of the merged head (display/accounting parity with
        PackedMRFStage)."""
        return self.head.t_tile if self.head is not None else None

    def __call__(self, x: jax.Array, interpret: bool = False) -> jax.Array:
        h = self.head
        if h.fold > 1:
            f = h.fold
            b, t, c = x.shape
            t_fold = -(-t // f)
            xpad = jnp.pad(x, ((0, 0), (0, t_fold * f - t), (0, 0)))
            xf = xpad.reshape(b, t_fold, f * c)
            s = _run_fused_stage(xf, h.chains, h.halo, t, f, h.t_tile,
                                 interpret, emit="sum_f32")
            s = s.reshape(b, t_fold * f, c)[:, :t, :]
        else:
            s = _run_fused_stage(x, h.chains, h.halo, x.shape[1], 1,
                                 h.t_tile, interpret, emit="sum_f32")
        for rb in self.tail:
            s = s + rb(x, interpret=interpret).astype(jnp.float32)
        return (s / self.n_total).astype(x.dtype)


class _BatchUploader:
    """Upload every packed weight array in ONE host->device transfer.

    Per-array device_puts pay one tunnel round trip each (~200 arrays;
    measured 2.8 s in good rig weather, 200 s in bad). Instead: collect the
    numpy arrays, concatenate raveled f32 into one flat array, device_put
    it once, and split/reshape/cast back ON DEVICE in a single jitted
    program (compiled once, persistent-cached)."""

    def __init__(self):
        self.arrays: list = []

    def add(self, a) -> int:
        self.arrays.append(np.asarray(a))
        return len(self.arrays) - 1

    def collect(self, obj) -> None:
        if obj is None:
            return
        if isinstance(obj, PackedResblock):
            obj.convs = [
                (o, self.add(w), self.add(b)) for o, w, b in obj.convs
            ]
        elif isinstance(obj, PackedMRFStage):
            obj.chains = [
                [(o, self.add(w), self.add(b)) for o, w, b in cv]
                for cv in obj.chains
            ]
        elif isinstance(obj, PackedMRFStageSplit):
            self.collect(obj.head)
            for t in obj.tail or []:
                self.collect(t)

    def upload(self) -> list:
        if not self.arrays:
            return []
        shapes = [a.shape for a in self.arrays]
        dtypes = [a.dtype for a in self.arrays]
        sizes = [int(np.prod(s)) for s in shapes]
        offs = np.concatenate([[0], np.cumsum(sizes)])
        flat = np.concatenate([a.ravel().astype(np.float32) for a in self.arrays])

        def split(f):
            return tuple(
                lax.dynamic_slice(f, (int(offs[i]),), (sizes[i],))
                .reshape(shapes[i])
                .astype(dtypes[i])
                for i in range(len(sizes))
            )

        return list(jax.jit(split)(jax.device_put(flat)))

    def assign(self, obj, devs: list) -> None:
        if obj is None:
            return
        if isinstance(obj, PackedResblock):
            obj.convs = [(o, devs[w], devs[b]) for o, w, b in obj.convs]
        elif isinstance(obj, PackedMRFStage):
            obj.chains = [
                [(o, devs[w], devs[b]) for o, w, b in cv] for cv in obj.chains
            ]
        elif isinstance(obj, PackedMRFStageSplit):
            self.assign(obj.head, devs)
            for t in obj.tail or []:
                self.assign(t, devs)


def pack_hifigan_mrf(resblocks: list, kernels, dtype=None):
    """Pack a HiFi-GAN generator's full MRF (stages x kernels resblock param
    dicts, as in params['resblocks']) into the serving kernel set.

    Returns (packed_resblocks, packed_stages): one PackedResblock per block
    always, plus per stage the best-fitting merged form — a full
    PackedMRFStage where all blocks fit VMEM, a PackedMRFStageSplit (merged
    prefix + per-block tail, still bit-identical) where only a prefix does
    (stage 0 at C=256), or None. This is THE packing recipe: the engine,
    the profiler and the vocoder benchmark all call it so they measure the
    same configuration serving runs."""
    n = len(kernels)
    assert len(resblocks) % n == 0
    # ONE transfer up front: the packing below is pure index / reshape /
    # fold math, and running it against device arrays issued a synchronous
    # tunnel round trip per conv (~58 s of the measured 69 s full-size
    # engine boot, r5 boot attribution). A tree device_get still pays one
    # sync round trip PER LEAF (~96 leaves; measured 2.8 s in good rig
    # weather but 245 s in bad), so the leaves are concatenated into a
    # single device array in-graph and fetched with exactly one transfer.
    leaves, treedef = jax.tree.flatten(resblocks)
    if leaves and isinstance(leaves[0], jax.Array):  # device-resident tree
        flat = jax.jit(
            lambda ls: jnp.concatenate(
                [jnp.ravel(l).astype(jnp.float32) for l in ls]
            )
        )(leaves)
        host = np.asarray(jax.device_get(flat))
        outs, off = [], 0
        for leaf in leaves:
            cnt = int(np.prod(leaf.shape))
            outs.append(host[off:off + cnt].reshape(leaf.shape))
            off += cnt
        resblocks = jax.tree.unflatten(treedef, outs)
    packed, stages = [], []
    for i in range(len(resblocks) // n):
        blocks = []
        c = None
        for j, k in enumerate(kernels):
            p = resblocks[i * n + j]
            c = int(p["convs1"][0]["w"].shape[1])
            packed.append(PackedResblock(p, k, c, dtype=dtype))
            blocks.append(p)
        stage = PackedMRFStage(blocks, kernels, c, dtype=dtype)
        if stage.t_tile is None:
            split = PackedMRFStageSplit(blocks, kernels, c, dtype=dtype)
            stages.append(split if split.viable else None)
        else:
            stages.append(stage)
    up = _BatchUploader()
    for obj in packed:
        up.collect(obj)
    for obj in stages:
        up.collect(obj)
    devs = up.upload()
    for obj in packed:
        up.assign(obj, devs)
    for obj in stages:
        up.assign(obj, devs)
    return packed, stages
