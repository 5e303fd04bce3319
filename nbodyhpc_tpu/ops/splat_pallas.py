"""Production Pallas splat engine: tiled scatter-add deposition on TPU.

The reference gets scatter-add for free from Vulkan's additive blending
(reference: rasterization/src/cpp/point_renderer.cpp:306-313); its per-slice
draw loop streams z-culled vertex ranges through up to 8 hardware queues
(point_renderer.cpp:864-946). TPUs have no scatter hardware and XLA's gather/
scatter are scalar-slow, so this module re-derives deposition as a fully
gather-free sort-then-accumulate pipeline:

1. **Tile assignment + multi-operand sort (XLA).** Every particle is
   assigned to the ONE grid tile containing its F^3 footprint window base —
   x/z tile crossings are absorbed by the accumulator's one-sided row halo,
   and y crossings by reserving the top TY - YTILE of the 128 lanes as an
   in-tile y halo, so no particle is ever duplicated. All spill is folded
   into neighbor tiles by a final XLA combine pass. The particle channels
   (position, weight, radius) ride along the tile-key sort as extra sort
   operands — XLA's sort moves payloads inside its comparator network,
   avoiding the catastrophic cost of post-sort random gathers. Tile-local
   attributes are then derived elementwise from (key, position) alone.
2. **Alignment kernel (Pallas).** Ragged per-tile runs are repacked so every
   tile owns whole 128-pair chunks, via chunked DMA copies (one contiguous
   run per tile) — the ragged-to-padded step XLA cannot express efficiently.
3. **Deposit kernel (Pallas).** A 1D grid over chunks; a VMEM accumulator
   holds the current tile (with x/z halo rows so footprint windows never
   clip). P = 128/F particles per group are evaluated *lane-packed*
   (lanes = P particles x F y-window slots; rows = Fx x Fz footprint
   offsets), reproducing the fragment shader's subsample-cube overlap
   (triangle.frag:25-45) and the vertex shader's point-size / sub-pixel
   rules (triangle.vert:41-63). Each particle's y-profile is rotated into
   lane position (dynamic roll) and accumulated with one F x F-row RMW.
   When the chunk stream crosses a tile boundary the accumulator is flushed
   with four strided DMAs (center + the three right-halo spill strips) to
   compact HBM-resident tile-major outputs (read-modify-write prefetch when
   accumulating across particle batches); a final XLA pass folds each
   tile's +x/+z halo strips into its neighbors.

Tile geometry (bucket-parameterized, see ``_Geom``): tiles span
(TX, YTILE, TZ) = (128, YTILE, 64) voxels with lanes = y (the roll axis):
YTILE tile voxels + (TY - YTILE) y-halo lanes sized so a window based at
by_local <= YTILE - 1 never wraps. Accumulator rows = (x + HALO-row halo)
x (z + HALO-row halo). The left halos only absorb windows clamped at the
grid origin (discarded); the right row halos carry +x/+z spill and lanes
[YTILE, 128) carry +y spill (including the x/z-halo corners, which ride
the same flush buffers).

Radius support: the ``BUCKETS`` ladder partitions the radius axis —
G6/G8 (6^3/8^3 windows on the 8-lane stride, sub-pixel + radii <= 3 px),
G10/G12/G16 (10/12/16^3 windows sharing the 16-lane stride — the window
size F is decoupled from the lane stride FL, so work scales with the
footprint actually needed instead of jumping 8^3 -> 16^3) and G32 (32^3,
radii <= 15 px, replacing what used to be a latency-bound dense pass at
~96 us/particle with a ~2.6 us/particle lane-packed kernel). Each bucket
runs the same sort->align->deposit pipeline with its own tile geometry and
the fields are summed; radii above the last rung take the dense clamped-
window pass (splat_dense.py, unbounded). This is the radius-bucketing
strategy SURVEY.md §7.3 plans for variable footprints.
"""
from __future__ import annotations

import functools
import os
import sys
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .splat import FOUR_THIRDS_PI

# NBODYHPC_SPLAT_TRACE=1: per-bucket/per-stage stderr timing with forced
# syncs (distorts the async pipeline; for stage-split forensics only)
_TRACE = os.environ.get("NBODYHPC_SPLAT_TRACE", "0") == "1"


def _trs(label, t0, arr=None):
    if _TRACE:
        if arr is not None:
            # force a real host transfer (axon): scalar-index, NEVER ravel
            # (ravel of a grid-scale tile buffer materializes a full copy)
            float(arr[(0,) * arr.ndim])
        print(f"[splat] {label}: {(time.time() - t0) * 1000:.0f} ms",
              file=sys.stderr, flush=True)
    return time.time()


# --- static geometry ---
TX, TY, TZ = 128, 128, 64   # accumulator block shape; y is the lane axis
CHUNK = 256                 # pairs per grid step
ACHUNK = 2048               # rows per alignment-copy DMA
NF = 8                      # f32 channels: px py pz rpx w_norm w_raw is_sub spare
NI = 4                      # i32 channels: tile bx_ext bz_ext by_local


class _Geom(NamedTuple):
    """Radius-bucket geometry: footprint window F per dim, lane stride FL
    (y-lane slots reserved per particle — the packing constraint is
    128 % FL == 0, while F only needs F <= FL, so a 10^3 window can ride
    the 16-lane packing with 6 masked lanes instead of paying a full 16^3
    window), y voxels per tile (lanes [YTILE, 128) = in-tile y halo), x/z
    halo row width, and the pixel-radius interval (RMIN, RMAX] this bucket
    deposits."""

    F: int
    FL: int
    YTILE: int
    HALO: int
    RMIN: float
    RMAX: float
    # pairs per deposit grid step. The kernel body unrolls CH // P groups
    # of [F*F, 128] vector ops, so Mosaic compile time scales with
    # CH/P * F^2 * FL: at F=32 the default 256 produced a ~30+ minute
    # remote compile (the round-2 "wedge"); 128 halves it. Must be a
    # multiple of BOTH 128 (the align kernel's DMA segment starts are
    # rounded to CH and Mosaic minor-dim DMA offsets must be 128-aligned)
    # and P (whole lane-packed groups per chunk).
    CH: int = 256
    # particles per lane-packed group. 0 = the classic full packing
    # 128 // FL (requires 128 % FL == 0). An explicit PP decouples the
    # lane stride from the pow2 constraint: e.g. F = FL = 10, PP = 12
    # packs 12 particles x 10 exact lanes (lanes 120-127 dead, zero
    # attrs) instead of 8 particles x 16 lanes with 6 masked slots each —
    # per-particle VPU work is F^2 * (128 / P), so exact strides buy back
    # the 25-37% masked-lane waste of the pow2 strides. Requires
    # PP * FL <= 128 and PP | CH.
    PP: int = 0

    @property
    def P(self):  # particles per lane-packed group
        return self.PP if self.PP else 128 // self.FL

    @property
    def XSLOTS(self):
        return TX + 2 * self.HALO

    @property
    def ZSLOTS(self):
        return TZ + 2 * self.HALO


# The radius ladder. Window F must cover the reference's point size
# 2*ceil(r) + 2 (triangle.vert:43-44,63), so bucket b covers
# r <= F/2 - 1; per-particle VPU work scales with F^2 * (128 / P), so
# finer rungs pay off wherever the radius distribution concentrates.
# G6/G10/G12 use EXACT lane strides (FL = F) with an explicit particle
# count PP (see _Geom.PP) — the pow2 strides wasted 25-37% of their
# lanes on masked window slots; G8/G16/G32 have pow2 F and keep the full
# 128//FL packing. Buckets with equal (YTILE, HALO) share tile-buffer
# shapes and combine programs regardless of FL. Sub-pixel particles
# (r < 0.5) ride the first bucket. Radii above the last rung take the
# dense large-radius pass (ops/splat_dense.py).
G6 = _Geom(F=6, FL=6, YTILE=120, HALO=8, RMIN=-1.0, RMAX=2.0,
           CH=640, PP=20)
G8 = _Geom(F=8, FL=8, YTILE=120, HALO=8, RMIN=2.0, RMAX=3.0)
G10 = _Geom(F=10, FL=10, YTILE=112, HALO=16, RMIN=3.0, RMAX=4.0,
            CH=384, PP=12)
G12 = _Geom(F=12, FL=12, YTILE=112, HALO=16, RMIN=4.0, RMAX=5.0,
            CH=640, PP=10)
G16 = _Geom(F=16, FL=16, YTILE=112, HALO=16, RMIN=5.0, RMAX=7.0)
G32 = _Geom(F=32, FL=32, YTILE=96, HALO=32, RMIN=7.0, RMAX=15.0, CH=128)
BUCKETS = (G6, G8, G10, G12, G16, G32)


def _fold_geom(geom: _Geom) -> _Geom:
    """Canonical geom for combine/align programs: ``_unpack_tiles`` and
    ``_run_align`` depend only on (YTILE, HALO), so buckets sharing a tile
    shape (G6/G8, G10/G12/G16) also share those compiled programs — at
    1024^3 each combine compile is minutes of XLA time."""
    for g in BUCKETS:
        if (g.YTILE, g.HALO) == (geom.YTILE, geom.HALO):
            return g
    return geom


def bucket_ladder(max_rpx: float):
    """The contiguous bucket prefix covering radii up to ``max_rpx``
    (eligibility intervals partition the radius axis, so callers must pass
    prefixes — a lone (G8,) would drop radii <= 2 px). Radii above
    ``BUCKETS[-1].RMAX`` are the callers' dense-pass responsibility."""
    out = []
    for g in BUCKETS:
        out.append(g)
        if max_rpx <= g.RMAX:
            break
    return tuple(out)


# base-bucket aliases used by tests; bucket-specific code reads the ladder
YTILE = G8.YTILE
HALO = G8.HALO


# ---------------------------------------------------------------------------
# deposit kernel
# ---------------------------------------------------------------------------


def _deposit_kernel(tilei_ref, attrs_ref, _outin, _hxin, _hzin, _hcin,
                    nreal_ref, out_ref, hx_ref, hz_ref, hc_ref, acc_ref,
                    cur_ref, sem_ref, *, subsample: int, accumulate: bool,
                    nchunks: int, geom: _Geom, interpret: bool):
    F, FL, HALO = geom.F, geom.FL, geom.HALO
    XSLOTS, ZSLOTS = geom.XSLOTS, geom.ZSLOTS
    P = geom.P            # particles per lane-packed group (128 // FL)
    NR = F * F            # accumulator rows covered by one window (x, z)
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        cur_ref[0] = jnp.int32(-1)

    tile = tilei_ref[0, 0]  # all pairs in a chunk share one tile (aligned)

    def regions(t):
        # (accumulator region, HBM region) pairs: center + the three right
        # halo spill strips, folded into +x/+z neighbors by _unpack_tiles
        return (
            (acc_ref.at[HALO : HALO + TX, HALO : HALO + TZ, :], out_ref.at[t]),
            (acc_ref.at[HALO + TX :, HALO : HALO + TZ, :], hx_ref.at[t]),
            (acc_ref.at[HALO : HALO + TX, HALO + TZ :, :], hz_ref.at[t]),
            (acc_ref.at[HALO + TX :, HALO + TZ :, :], hc_ref.at[t]),
        )

    def flush(t):
        dmas = [
            pltpu.make_async_copy(a, h, sem_ref) for a, h in regions(t)
        ]
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()

    def _body():
        @pl.when(tile != cur_ref[0])
        def _():
            @pl.when(cur_ref[0] >= 0)
            def _():
                flush(cur_ref[0])

            if accumulate:
                dmas = [
                    pltpu.make_async_copy(h, a, sem_ref)
                    for a, h in regions(tile)
                ]
                for d in dmas:
                    d.start()
                # left halos are not persisted (they only ever hold off-grid
                # spill from origin-clamped windows): zero before reuse
                acc_ref[:HALO, :, :] = jnp.zeros(
                    (HALO, ZSLOTS, TY), jnp.float32)
                acc_ref[HALO:, :HALO, :] = jnp.zeros(
                    (XSLOTS - HALO, HALO, TY), jnp.float32
                )
                for d in dmas:
                    d.wait()
            else:
                acc_ref[:] = jnp.zeros((XSLOTS, ZSLOTS, TY), jnp.float32)
            cur_ref[0] = tile

        expand_t = (
            jax.lax.broadcasted_iota(jnp.int32, (P, 128), 1) // FL
            == jax.lax.broadcasted_iota(jnp.int32, (P, 128), 0)
        ).astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (NR, TY), 1)
        irow = jax.lax.broadcasted_iota(jnp.int32, (NR, TY), 0) // F   # x offset
        zrow = jax.lax.broadcasted_iota(jnp.int32, (NR, TY), 0) % F    # z offset
        # lane slot j in [0, FL) within a particle's stride carries y-window
        # offset j; slots j >= F (when FL > F) compute garbage y-deltas that
        # the inwin mask at deposit time discards
        yrel = (lane % FL).astype(jnp.float32)
        i_f = irow.astype(jnp.float32)
        z_f = zrow.astype(jnp.float32)
        S = subsample
        u = [(a + 0.5) / S for a in range(S)]
        inv_s3 = 1.0 / float(S**3)

        for g in range(geom.CH // P):
            a16 = attrs_ref[:, g * P : (g + 1) * P]  # [NF, P]
            if interpret:
                # the interpreter emulates the MXU's bf16 input truncation, and
                # XLA's algebraic simplifier may merge the three piece-dots into
                # one dot(p1+p2+p3, E) — collapsing the bf16x3 reconstruction to
                # a single bf16 rounding. Interpret mode therefore expands lanes
                # directly; Mosaic compiles the dots as written, so the real
                # TPU path below stays bit-exact (verified on device).
                aexp = jnp.repeat(a16, FL, axis=1)
                if P * FL < 128:  # dead tail lanes past the last particle
                    aexp = jnp.pad(aexp, ((0, 0), (0, 128 - P * FL)))
            else:
                # exact f32 lane expansion via bf16x3 one-hot matmul (MXU
                # truncates inputs to bf16; three exact pieces reconstruct in
                # the f32 accumulator — see .claude/skills/verify/SKILL.md)
                p1 = a16.astype(jnp.bfloat16).astype(jnp.float32)
                r1 = a16 - p1
                p2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
                p3 = r1 - p2
                aexp = jnp.zeros((NF, 128), jnp.float32)
                for piece in (p1, p2, p3):
                    aexp = aexp + jax.lax.dot_general(
                        piece, expand_t, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            pxv = aexp[0:1, :]      # absolute particle position, pixel units
            pyv = aexp[1:2, :]
            pzv = aexp[2:3, :]
            rpx = aexp[3:4, :]
            w_norm = aexp[4:5, :]
            w_raw = aexp[5:6, :]
            is_sub = aexp[6:7, :] > 0.5

            # Window-base voxel coordinates recomputed in-kernel with the exact
            # f32 expression _prep_batch uses for row0/by addressing (ceil(p -
            # 4.5)), so values and addresses agree bit-for-bit. Every delta
            # below is then a SINGLE rounding of the same real-number expression
            # the oracle evaluates (splat.py:88-111) — carrying window-relative
            # offsets instead (the old scheme) double-rounds and flips subcell
            # compares at f32 boundaries.
            bxf = jnp.ceil(pxv - (F / 2 + 0.5))
            byf = jnp.ceil(pyv - (F / 2 + 0.5))
            bzf = jnp.ceil(pzv - (F / 2 + 0.5))
            vxf = bxf + i_f         # [64, TY] voxel coords of packed window slots
            vyf = byf + yrel
            vzf = bzf + z_f

            dx = pxv - vxf          # corner deltas (splat.py:105-107)
            dy = pyv - vyf
            dz = pzv - vzf
            r2 = rpx * rpx

            # --- big-particle path (triangle.vert:41-45 + triangle.frag:25-45) --
            zoff = pzv - (vzf + 0.5)
            zclip = jnp.abs(zoff) <= rpx + 1.0
            plane_r = jnp.sqrt(jnp.maximum(r2 - zoff * zoff, 0.0))
            half = jnp.ceil(plane_r) + 1.0
            cx = (vxf + 0.5) - pxv
            cy = (vyf + 0.5) - pyv
            cover = (cx >= -half) & (cx < half) & (cy >= -half) & (cy < half) & zclip

            # subcell sum, oracle association order: (ax + ay) + az < r^2, with
            # per-axis squares hoisted (Mosaic does not CSE across the unroll).
            # The indicator accumulation is a balanced tree, not a serial chain:
            # sums of 0/1 values <= S^3 are exact in f32 under any association,
            # so this is bit-identical to the oracle's serial sum while giving
            # the VPU a log-depth dependency graph (measured ~3% kernel win).
            dxa2 = []
            dyb2 = []
            dzc2 = []
            for a in range(S):
                t = dx - u[a]
                dxa2.append(t * t)
                t = dy - u[a]
                dyb2.append(t * t)
                t = dz - u[a]
                dzc2.append(t * t)
            def tree_sum(terms):
                while len(terms) > 1:
                    terms = [
                        terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
                        for i in range(0, len(terms), 2)
                    ]
                return terms[0]

            parts = []
            for a in range(S):
                for b in range(S):
                    rab = r2 - (dxa2[a] + dyb2[b])
                    parts.append(tree_sum(
                        [jnp.where(dzc2[cc] < rab, 1.0, 0.0) for cc in range(S)]
                    ))
            count = tree_sum(parts)
            big_val = w_norm * (count * inv_s3) * cover

            # --- sub-pixel path (triangle.vert:47-60; splat.py:128-140) ---
            sub_val = jnp.where(
                (vxf == jnp.floor(pxv))
                & (vyf == jnp.floor(pyv))
                & (pzv > vzf)
                & (pzv <= vzf + 1.0),
                w_raw,
                0.0,
            )
            pc = jnp.where(is_sub, sub_val, big_val)  # [64, TY] packed

            # --- per-particle deposit: roll y-window into lane position ---
            # NBODYHPC_DEPOSIT_ABLATE (forensics only, breaks correctness):
            # staticaddr = RMW at fixed offsets; noroll = skip the y-roll;
            # nodeposit = skip the whole per-particle loop
            ablate = os.environ.get("NBODYHPC_DEPOSIT_ABLATE", "")
            for p in range(P):
                if ablate == "nodeposit":
                    break
                i = g * P + p
                bxe = tilei_ref[1, i]
                bze = tilei_ref[2, i]
                by = tilei_ref[3, i]
                shift = jax.lax.rem(by - FL * p + 256, 128)
                rolled = pc if ablate == "noroll" else pltpu.roll(
                    pc, shift, axis=1)
                inwin = (lane - by).astype(jnp.uint32) < F  # [by, by+F) ∩ [0,128)
                contrib = jnp.where(inwin, rolled, 0.0)
                if ablate == "staticaddr":
                    bxe = jnp.int32(HALO)
                    bze = jnp.int32(HALO)
                sx = pl.ds(bxe, F)
                sz = pl.ds(bze, F)
                acc_ref[sx, sz, :] = acc_ref[sx, sz, :] + contrib.reshape(F, F, TY)

    # chunks past the real aligned-pair prefix are pure padding (tile
    # sentinel, zero weight): skip their entire vector body. Small radius
    # classes are dominated by the worst-case CH * ntiles sizing term in
    # np_pad (a 50k-particle G32 class pads to ~6x its real rows), so
    # without this gate most of their deposit time is spent grinding
    # zero-weight pad chunks.
    pl.when(c < nreal_ref[0])(_body)

    @pl.when(c == nchunks - 1)
    def _():
        @pl.when(cur_ref[0] >= 0)  # nreal can be 0 (fully ineligible batch)
        def _():
            flush(cur_ref[0])



def _vma_of(x):
    """Varying-mesh-axes set of ``x``'s aval (empty outside shard_map).

    pallas_call out_shapes carry no vma annotation of their own, which
    makes ``check_vma=True`` shard_maps reject the call; propagating the
    operand's vma declares the truth — every output varies exactly like
    the per-device inputs that produced it."""
    try:
        return jax.typeof(x).vma
    except Exception:  # pragma: no cover — older jax without vma avals
        return frozenset()


def _deposit_body(tilei, attrs, out_init, hx_init, hz_init, hc_init, nreal,
                  nchunks, ntiles, subsample, accumulate, interpret, geom=G8):
    """Traced deposit pallas_call (jitted standalone as ``_run_deposit``;
    inlined into the fused ``_batch_step`` program on the device path)."""
    HALO = geom.HALO
    kernel = functools.partial(
        _deposit_kernel, subsample=subsample, accumulate=accumulate,
        nchunks=nchunks, geom=geom, interpret=interpret,
    )
    return pl.pallas_call(
        kernel,
        grid=(nchunks,),
        in_specs=[
            # the aligned (NI/NF, np_pad) streams are read column-chunked
            # directly: no host-visible transpose pass is needed
            pl.BlockSpec((NI, geom.CH), lambda c: (0, c),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((NF, geom.CH), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1,), lambda c: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY) for _ in range(4)),
        out_shape=(
            jax.ShapeDtypeStruct((ntiles, TX, TZ, TY), jnp.float32,
                                 vma=_vma_of(attrs)),
            jax.ShapeDtypeStruct((ntiles, HALO, TZ, TY), jnp.float32,
                                 vma=_vma_of(attrs)),
            jax.ShapeDtypeStruct((ntiles, TX, HALO, TY), jnp.float32,
                                 vma=_vma_of(attrs)),
            jax.ShapeDtypeStruct((ntiles, HALO, HALO, TY), jnp.float32,
                                 vma=_vma_of(attrs)),
        ),
        scratch_shapes=[
            pltpu.VMEM((geom.XSLOTS, geom.ZSLOTS, TY), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3},
        # windows whose row count is not a sublane multiple (F = 6/10/12)
        # lower their dynamic acc RMW through masked multi-tile updates
        # whose stack exceeds the default 16 MiB scoped-vmem budget; the
        # chip has 128 MiB of VMEM, so raise the ceiling instead of
        # padding rows (which would forfeit the smaller windows' entire
        # VPU saving)
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(tilei, attrs, out_init, hx_init, hz_init, hc_init, nreal)


# the tile buffers MUST be jit-donated for the pallas input_output_aliases
# to alias in place: without donation XLA inserts defensive copies, so
# every deposit dispatch carries a second full tile set (~5.8 GB for a
# full-grid G8 pass at 1024^3 — measured as round 1's 12.9 GB peak, and an
# OOM once a previous bucket's volume is resident). Callers never reuse
# the passed-in buffers.
_run_deposit = functools.partial(
    jax.jit,
    static_argnames=(
        "nchunks", "ntiles", "subsample", "accumulate", "interpret", "geom",
    ),
    donate_argnums=(2, 3, 4, 5),
)(_deposit_body)


# ---------------------------------------------------------------------------
# alignment kernel: ragged per-tile runs -> chunk-aligned layout (DMA copies)
# ---------------------------------------------------------------------------


AFETCH = ACHUNK + 128  # aligned staging width


def _align_kernel(starts_ref, cnts_ref, aoff_ref, srcf_ref, srci_ref,
                  _dstf_in, _dsti_in, dstf_ref, dsti_ref, scrf, scri,
                  semf, semi, *, halo: int):
    t = pl.program_id(0)
    s = starts_ref[t]
    cnt = cnts_ref[t]
    a = pl.multiple_of(aoff_ref[t], 128)  # aligned offsets are CHUNK-multiples
    # source run starts anywhere: fetch from the 128-aligned floor and roll
    shift = jax.lax.rem(s, 128)
    s0 = pl.multiple_of(s - shift, 128)
    rshift = jax.lax.rem(AFETCH - shift, AFETCH)
    nchunks = (cnt + ACHUNK - 1) // ACHUNK  # staged copies incl. tail

    def copy(i, _):
        df = pltpu.make_async_copy(
            srcf_ref.at[:, pl.ds(s0 + i * ACHUNK, AFETCH)], scrf, semf
        )
        di = pltpu.make_async_copy(
            srci_ref.at[:, pl.ds(s0 + i * ACHUNK, AFETCH)], scri, semi
        )
        df.start()
        di.start()
        df.wait()
        di.wait()
        nreal = cnt - i * ACHUNK  # rows of this chunk that are real
        idx = jax.lax.broadcasted_iota(jnp.int32, (NF, AFETCH), 1)
        rolled_f = pltpu.roll(scrf[:], rshift, axis=1)
        scrf[:] = jnp.where(idx < nreal, rolled_f, 0.0)
        idxi = jax.lax.broadcasted_iota(jnp.int32, (NI, AFETCH), 1)
        chan = jax.lax.broadcasted_iota(jnp.int32, (NI, AFETCH), 0)
        # pad channels: tile=t, bx_ext=bz_ext=halo (safe window), by=0
        pad_i = jnp.where(chan == 0, t, jnp.where(chan == 3, 0, halo))
        rolled_i = pltpu.roll(scri[:], rshift, axis=1)
        scri[:] = jnp.where(idxi < nreal, rolled_i, pad_i)
        dfo = pltpu.make_async_copy(
            scrf.at[:, :ACHUNK], dstf_ref.at[:, pl.ds(a + i * ACHUNK, ACHUNK)],
            semf,
        )
        dio = pltpu.make_async_copy(
            scri.at[:, :ACHUNK], dsti_ref.at[:, pl.ds(a + i * ACHUNK, ACHUNK)],
            semi,
        )
        dfo.start()
        dio.start()
        dfo.wait()
        dio.wait()
        return 0

    jax.lax.fori_loop(0, jnp.maximum(nchunks, 1), copy, 0)


def _align_body(starts, cnts, aoff, srcf, srci, dstf_init, dsti_init,
                np_pad, ntiles, interpret, geom=G8):
    """Traced align pallas_call (jitted standalone as ``_run_align``;
    inlined into the fused ``_batch_step`` program on the device path)."""
    return pl.pallas_call(
        functools.partial(_align_kernel, halo=geom.HALO),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NF, np_pad), jnp.float32,
                                 vma=_vma_of(srcf)),
            jax.ShapeDtypeStruct((NI, np_pad), jnp.int32,
                                 vma=_vma_of(srcf)),
        ),
        scratch_shapes=[
            pltpu.VMEM((NF, AFETCH), jnp.float32),
            pltpu.VMEM((NI, AFETCH), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={5: 0, 6: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(starts, cnts, aoff, srcf, srci, dstf_init, dsti_init)


# same donation requirement as _run_deposit: the destination streams alias
# in place only when jit-donated (they are freshly allocated in
# _dispatch_batch and never reused)
_run_align = functools.partial(
    jax.jit, static_argnames=("np_pad", "ntiles", "interpret", "geom"),
    donate_argnums=(5, 6),
)(_align_body)


# ---------------------------------------------------------------------------
# XLA preprocessing (gather-free)
# ---------------------------------------------------------------------------


def _grid_pad(g, geom=G8):
    gx, gy, gz = g
    yt = geom.YTILE
    return (
        (gx + TX - 1) // TX * TX,
        (gy + yt - 1) // yt * yt,
        (gz + TZ - 1) // TZ * TZ,
    )


def _ntiles(grid, geom=G8):
    gxp, gyp, gzp = _grid_pad(grid, geom)
    return (gxp // TX) * (gyp // geom.YTILE) * (gzp // TZ)


def _pair_keys(ppx, rpx, w, grid, geom=G8, nxt=None, xt0=0):
    """[N] tile keys (ntiles = invalid), plus the window base
    b = ceil(ppx - (F/2 + 0.5)).

    ``nxt``/``xt0`` restrict assignment to the x-tile slab window
    [xt0, xt0 + nxt): keys are re-based to the window's tile numbering and
    particles outside it are invalid. ``nxt`` is STATIC (it shapes the tile
    buffers); ``xt0`` is traced — every window of the same width shares one
    compiled program (window starts were originally static too, which
    multiplied the multi-minute remote Mosaic/XLA compile count by the
    window count). Buffer-memory scaling: a bucket pass over a window
    allocates only the window's tiles (see ``run_bucket``'s slab-run
    loop); cross-window +x spill rides the carry strips chained between
    runs by ``_unpack_tiles``.

    Each particle belongs to exactly ONE tile — the one containing its
    (clamped) window base. x/z crossings spill into the accumulator's right
    row halo; y crossings spill into the TY - YTILE y-halo lanes above
    YTILE. All spill is folded into neighbors by `_unpack_tiles`. A base
    clamped at the grid origin lands in the left row halo (or negative
    lanes), which is discarded (off-grid, matching the reference's clip).
    Only radii in the bucket's (RMIN, RMAX] interval (plus sub-pixel
    particles for the base bucket) are eligible — the radius buckets
    partition the particle set exactly."""
    F, HALO, YT = geom.F, geom.HALO, geom.YTILE
    gxp, gyp, gzp = _grid_pad(grid, geom)
    ntx, nty, ntz = gxp // TX, gyp // YT, gzp // TZ
    windowed = nxt is not None
    if not windowed:
        nxt = ntx
    ntiles = nxt * nty * ntz

    b = jnp.ceil(ppx - (F / 2 + 0.5)).astype(jnp.int32)  # [N, 3]
    bx, by, bz = b[:, 0], b[:, 1], b[:, 2]
    tx = jnp.floor_divide(jnp.clip(bx, 0, gxp - 1), TX)
    ty0 = jnp.floor_divide(jnp.clip(by, 0, gyp - 1), YT)
    tz = jnp.floor_divide(jnp.clip(bz, 0, gzp - 1), TZ)

    in_bucket = (rpx > geom.RMIN) & (rpx <= geom.RMAX)
    if geom.RMIN < 0.5:
        in_bucket = in_bucket | (rpx < 0.5)  # sub-pixel rides the base bucket
    eligible = (
        (w != 0.0)
        & in_bucket
        # row0 addressing requires the clamped base within the halo span;
        # windows entirely off-grid deposit nothing anyway
        & (bx >= -HALO) & (bx < gxp)
        & (bz >= -HALO) & (bz < gzp)
        & (by >= -F) & (by < gyp)
    )
    if windowed:
        eligible = eligible & (tx >= xt0) & (tx < xt0 + nxt)
        tx = tx - xt0
    tid0 = (tx * nty + ty0) * ntz + tz
    key0 = jnp.where(eligible, tid0, ntiles)
    return key0, b


@functools.partial(jax.jit, static_argnames=("grid", "geom", "nxt"))
def _count_pairs(ppx, rpx, w, grid, geom=G8, nxt=None, xt0=0):
    keys, _ = _pair_keys(ppx, rpx, w, grid, geom, nxt, xt0)
    nty, ntz = _grid_pad(grid, geom)[1] // geom.YTILE, \
        _grid_pad(grid, geom)[2] // TZ
    nt = (_grid_pad(grid, geom)[0] // TX if nxt is None else nxt) \
        * nty * ntz
    return jnp.sum(keys < nt)


def _prep_body(pos_px, w, rpx, grid, np_pad, geom=G8, nxt=None,
               key_in=None, xt0=0):
    """Pair expansion -> multi-operand sort -> elementwise channel derivation
    -> per-tile starts/counts/aligned offsets. No gathers anywhere.
    (Traced body; jitted standalone as :func:`_prep_batch` for the host
    path, inlined into the fused :func:`_batch_step` program on the
    device-resident path.)

    ``key_in``: window-local tile keys carried from the global fused
    partition sort (:func:`_fused_partition`) — the batch is already
    grouped by tile, so the per-batch sort is skipped entirely. Keys < 0
    mark rows BEFORE the batch's real span (a clamped slice can re-read
    already-deposited rows; they sort below every real tile and are
    covered by no tile range), keys >= ntiles mark rows past it. The key
    MUST be the materialized sort channel, never recomputed from the
    positions here: across separately compiled programs XLA may
    FMA-contract the ``pos * ppu - C`` window-base chain differently and
    flip a ``ceil`` on a knife-edge particle, splitting the tile
    assignment from the key order (the round-1 double-rounding lesson,
    see the oracle-contract note in ops/splat.py)."""
    F, HALO, YTILE = geom.F, geom.HALO, geom.YTILE
    gxp, gyp, gzp = _grid_pad(grid, geom)
    ntx, nty, ntz = gxp // TX, gyp // YTILE, gzp // TZ
    if nxt is None:
        nxt = ntx
    ntiles = nxt * nty * ntz
    n = pos_px.shape[0]

    px = pos_px[:, 0]
    py = pos_px[:, 1]
    pz = pos_px[:, 2]
    ww = w
    rr = rpx

    if key_in is not None:
        key = key_in
    else:
        # one tile per particle (re-based to the slab window when given)
        key, _ = _pair_keys(pos_px, rpx, w, grid, geom, nxt, xt0)
        key, px, py, pz, ww, rr = jax.lax.sort(
            (key, px, py, pz, ww, rr), num_keys=1
        )

    if np_pad > key.shape[0]:  # tiny batches on many-tile grids
        pad = np_pad - key.shape[0]
        key = jnp.pad(key, (0, pad), constant_values=ntiles)
        px = jnp.pad(px, (0, pad))
        py = jnp.pad(py, (0, pad))
        pz = jnp.pad(pz, (0, pad))
        ww = jnp.pad(ww, (0, pad))
        rr = jnp.pad(rr, (0, pad), constant_values=1.0)

    # valid prefix fits in np_pad (caller sized it); derive channels there
    key = jax.lax.dynamic_slice(key, (0,), (np_pad,))
    px = jax.lax.dynamic_slice(px, (0,), (np_pad,))
    py = jax.lax.dynamic_slice(py, (0,), (np_pad,))
    pz = jax.lax.dynamic_slice(pz, (0,), (np_pad,))
    ww = jax.lax.dynamic_slice(ww, (0,), (np_pad,))
    rr = jax.lax.dynamic_slice(rr, (0,), (np_pad,))

    invalid = (key >= ntiles) | (key < 0)
    tile = jnp.clip(key, 0, ntiles - 1)
    ww = jnp.where(invalid, 0.0, ww)
    rr = jnp.where(invalid, 1.0, rr)

    tz = jnp.mod(tile, ntz)
    ty = jnp.mod(jnp.floor_divide(tile, ntz), nty)
    tx = jnp.floor_divide(tile, ntz * nty)

    bx = jnp.ceil(px - (F / 2 + 0.5)).astype(jnp.int32)
    by = jnp.ceil(py - (F / 2 + 0.5)).astype(jnp.int32)
    bz = jnp.ceil(pz - (F / 2 + 0.5)).astype(jnp.int32)

    is_sub = rr < 0.5
    vol = FOUR_THIRDS_PI * rr * rr * rr
    w_norm = jnp.where(is_sub, 0.0, ww / jnp.where(is_sub, 1.0, vol))
    w_raw = jnp.where(is_sub, ww, 0.0)

    bx_ext = bx - (xt0 + tx) * TX + HALO
    bz_ext = bz - tz * TZ + HALO
    by_loc = by - ty * YTILE
    bx_ext = jnp.where(invalid, HALO, bx_ext)
    bz_ext = jnp.where(invalid, HALO, bz_ext)
    by_loc = jnp.where(invalid, 0, by_loc)
    # invalid entries keep their positions: their w_norm/w_raw are zero so
    # they deposit nothing wherever they land

    srcf = jnp.stack(
        [px, py, pz, rr, w_norm, w_raw,
         is_sub.astype(jnp.float32), jnp.zeros_like(px)], axis=0
    )
    srci = jnp.stack([tile, bx_ext, bz_ext, by_loc], axis=0)

    starts = jnp.searchsorted(key, jnp.arange(ntiles + 1, dtype=jnp.int32)).astype(jnp.int32)
    cnts = jnp.diff(starts)
    aligned = (cnts + geom.CH - 1) // geom.CH * geom.CH
    aoff = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(aligned, dtype=jnp.int32)]
    )
    return srcf, srci, starts[:-1], cnts, aoff[:-1]


_prep_batch = functools.partial(
    jax.jit, static_argnames=("grid", "np_pad", "geom", "nxt")
)(_prep_body)


@functools.partial(
    jax.jit, static_argnames=("grid", "geom", "nxt", "carry_out"),
    donate_argnames=("out", "hz", "vol0"),
)
def _unpack_tiles(out, hx, hz, hc, grid, vol0=None, geom=G8, nxt=None,
                  seed=None, carry_out=False, xt0=0):
    """Tile-major center (ntiles, TX, TZ, TY) + halo spill strips -> logical
    (gx, gy, gz); tile rows=(x, z), lanes=y.

    Folds each tile's +x/+z halo strips (footprint spill, up to F-1 voxels)
    and its +y halo LANES (TY - YTILE lanes above the tile's y extent,
    including those of the x/z strips) into the adjacent tiles. Streams one
    x slab of tiles at a time so the peak footprint is inputs + result +
    one slab transient (a whole-grid intermediate on top of the 4 GiB
    inputs OOMs at 1024^3). When ``vol0`` is given, the unpacked field is
    accumulated onto it (used to sum the radius buckets).

    ``nxt``/``xt0``: the buffers cover only the x-tile slab window
    [xt0, xt0 + nxt) (run_bucket's memory-bounded slab runs; nxt static,
    xt0 traced — one program per window WIDTH, not per window). ``seed`` =
    (hx_carry, hc_carry) strips of the window to the left (its last slab's
    +x/corner spill, which lands in this window's first slab);
    ``carry_out=True`` additionally returns this window's own carry strips
    for the next run.
    """
    HALO, YTILE = geom.HALO, geom.YTILE
    gxp, gyp, gzp = _grid_pad(grid, geom)
    ntx, nty, ntz = gxp // TX, gyp // YTILE, gzp // TZ
    windowed = nxt is not None
    if not windowed:
        nxt = ntx
    gy, gz = int(grid[1]), int(grid[2])
    m = nty * ntz  # tiles per x slab (tile id = (tx*nty + ty)*ntz + tz)

    # +x spill comes from the PREVIOUS slab's tiles; rather than gating the
    # tx=0 fold with a predicate on the loop index (jax 0.9.0's fori_loop
    # miscompiles index comparisons: where(tx > 0, ...) evaluates true at
    # tx=0 — verified on cpu and tpu), prepend a zero slab (or the previous
    # window's carry strips) so slicing at tx*m always reads the right strip
    seed_hx, seed_hc = seed if seed is not None else (
        jnp.zeros((m,) + hx.shape[1:], hx.dtype),
        jnp.zeros((m,) + hc.shape[1:], hc.dtype),
    )
    hxp = jnp.concatenate([seed_hx, hx], axis=0)
    hcp = jnp.concatenate([seed_hc, hc], axis=0)

    def body(tx, vol):
        c = jax.lax.dynamic_slice(
            out, (tx * m, 0, 0, 0), (m, TX, TZ, TY)
        ).reshape(nty, ntz, TX, TZ, TY)
        xh = jax.lax.dynamic_slice(
            hxp, (tx * m, 0, 0, 0), (m, HALO, TZ, TY)
        ).reshape(nty, ntz, HALO, TZ, TY)
        ch = jax.lax.dynamic_slice(
            hcp, (tx * m, 0, 0, 0), (m, HALO, HALO, TY)
        ).reshape(nty, ntz, HALO, HALO, TY)
        zh = jax.lax.dynamic_slice(
            hz, (tx * m, 0, 0, 0), (m, TX, HALO, TY)
        ).reshape(nty, ntz, TX, HALO, TY)
        c = c.at[:, :, :HALO, :, :].add(xh)
        c = c.at[:, 1:, :, :HALO, :].add(zh[:, :-1])
        c = c.at[:, 1:, :HALO, :HALO, :].add(ch[:, :-1])
        # +y spill rides lanes [YTILE, TY) of every buffer; folding it
        # AFTER the x/z folds also routes the x/z-corner y-spill correctly
        c = c.at[1:, :, :, :, : TY - YTILE].add(c[:-1, :, :, :, YTILE:])
        slab = c[..., :YTILE].transpose(2, 0, 4, 1, 3).reshape(
            TX, gyp, gzp
        )[:, :gy, :gz]
        if vol0 is not None or windowed:
            slab = slab + jax.lax.dynamic_slice(
                vol, ((xt0 + tx) * TX, 0, 0), (TX, gy, gz)
            )
        return jax.lax.dynamic_update_slice(
            vol, slab, ((xt0 + tx) * TX, 0, 0)
        )

    if vol0 is None:
        init = jnp.zeros((gxp, gy, gz), jnp.float32)
    else:
        gx = int(grid[0])
        init = vol0 if gxp == gx else jnp.concatenate(
            [vol0, jnp.zeros((gxp - gx, gy, gz), jnp.float32)], axis=0
        )
    vol = jax.lax.fori_loop(0, nxt, body, init)
    vol = vol[: grid[0]]
    if not carry_out:
        return vol
    return vol, (hx[(nxt - 1) * m :], hc[(nxt - 1) * m :])


def _quant_rows(nb: int, batch: int) -> int:
    """Smallest rung of the geometric row ladder (batch / 4**j, 128-aligned)
    that covers ``nb``. Partial batches are padded to a rung instead of to
    their exact 128-multiple: every distinct padded size compiles its own
    prep/align/deposit pipeline (multi-minute remote Mosaic compiles), so
    an honest mixed-radius workload — one partial batch per bucket per slab
    window — was spending tens of minutes compiling near-duplicate
    programs. The ladder bounds that to <= 5 shapes per bucket geometry at
    <= 4x pad waste on the (single) partial batch, whose pad rows carry
    zero weight / sentinel keys and deposit nothing."""
    q = -(-batch // 128) * 128
    while True:
        nxt = -(-(q // 4) // 128) * 128
        if nxt < 128 or nxt < nb or nxt >= q:
            return q
        q = nxt


def _zero_bufs(ntiles, geom):
    return (
        jnp.zeros((ntiles, TX, TZ, TY), jnp.float32),
        jnp.zeros((ntiles, geom.HALO, TZ, TY), jnp.float32),
        jnp.zeros((ntiles, TX, geom.HALO, TY), jnp.float32),
        jnp.zeros((ntiles, geom.HALO, geom.HALO, TY), jnp.float32),
    )


def _dispatch_batch(geom, ppj, wj, rj, grid, np_pad, bufs, accumulate,
                    subsample, interpret, xwin=None, key_in=None):
    """One prep -> align -> deposit dispatch of a padded particle batch into
    the bucket's tile buffers (the shared inner step of `splat_volume` and
    `splat_volume_traced_engine`). ``xwin`` restricts the dispatch to an
    x-tile slab window whose (smaller) buffers the caller allocated;
    ``key_in`` = window-local keys of an already-tile-sorted batch (the
    fused-partition fast path — no per-batch sort)."""
    if xwin is None:
        ntiles = _ntiles(grid, geom)
        nxt, xt0 = None, 0
    else:
        gxp, gyp, gzp = _grid_pad(grid, geom)
        xt0, nxt = xwin
        ntiles = nxt * (gyp // geom.YTILE) * (gzp // TZ)
    srcf, srci, starts, cnts, aoff = _prep_batch(
        ppj, wj, rj, grid, np_pad, geom, nxt, key_in, jnp.int32(xt0)
    )
    dstf = jnp.zeros((NF, np_pad), jnp.float32)
    dsti = jnp.concatenate(
        [
            jnp.full((1, np_pad), ntiles - 1, jnp.int32),
            jnp.full((2, np_pad), geom.HALO, jnp.int32),
            jnp.zeros((1, np_pad), jnp.int32),
        ]
    )
    alf, ali = _run_align(
        starts, cnts, aoff, srcf, srci, dstf, dsti,
        np_pad=np_pad, ntiles=ntiles, interpret=interpret,
        geom=_fold_geom(geom),
    )
    # chunks holding real aligned pairs (the packed prefix of the aligned
    # stream); the deposit kernel skips the pure-pad chunks past it
    nreal = jnp.sum(
        (cnts + geom.CH - 1) // geom.CH, dtype=jnp.int32
    ).reshape(1)
    return _run_deposit(
        ali, alf, *bufs, nreal, nchunks=np_pad // geom.CH, ntiles=ntiles,
        subsample=subsample, accumulate=accumulate, interpret=interpret,
        geom=geom,
    )


@functools.partial(
    jax.jit,
    static_argnames=("grid", "np_pad", "nb_pad", "geom", "nxt", "subsample",
                     "accumulate", "interpret"),
    donate_argnames=("out", "hx", "hz", "hc"),
)
def _batch_step(p_in, w_in, r_in, key_in, row0s, nrows, kb, xt0,
                out, hx, hz, hc, *, grid, np_pad, nb_pad, geom, nxt,
                subsample, accumulate, interpret):
    """One whole fused-partition batch dispatch as a SINGLE program:
    slice the batch straight out of the resident partitioned arrays,
    derive channels (:func:`_prep_body`, sort skipped — the carried key
    channel is already tile-grouped), align, deposit. Replaces the
    round-1..4 chain of ~8 eager dispatches (slices, dst inits, nreal
    reduce) plus three separate jit programs per batch — one program per
    (geom, row rung, window width) instead of three, which also shrinks
    the warm-up's program-deserialization bill (PERF.md §2b).

    FUSED-PATH ONLY (inputs pre-scaled to pixels by ``prepartition``):
    the pixel-scale multiply of the non-fused path must stay materialized
    in its own dispatch, outside any program that derives window bases —
    fusing ``pos * ppu`` into the base chain lets XLA FMA-contract the
    mul+sub and flip a knife-edge ``ceil`` against the deposit kernel's
    in-kernel recompute (the round-1 double-rounding lesson; see
    ``_prep_body``). Here every position load is already a materialized
    pixel value, so every base subtract is single-rounding.

    ``row0s``/``nrows``/``kb``/``xt0`` are traced scalars: one compiled
    program serves every batch/window of the same shape class. The slice
    start is clamped to the array (a final batch short of its row rung
    re-reads earlier rows); re-read front rows get key -1 and zero
    weight, rows past the real span key ``ntiles`` — both excluded from
    every tile run while keeping the key channel sorted."""
    if nxt is None:
        ntiles = _ntiles(grid, geom)
    else:
        gxp, gyp, gzp = _grid_pad(grid, geom)
        ntiles = nxt * (gyp // geom.YTILE) * (gzp // TZ)
    n = p_in.shape[0]
    sl = min(nb_pad, n)
    start = jnp.clip(row0s, 0, n - sl).astype(jnp.int32)
    delta = row0s - start  # > 0 only when the slice ran off the array end
    pp = jax.lax.dynamic_slice(p_in, (start, jnp.int32(0)), (sl, 3))
    ww = jax.lax.dynamic_slice(w_in, (start,), (sl,))
    rr = jax.lax.dynamic_slice(r_in, (start,), (sl,))
    kj = jax.lax.dynamic_slice(key_in, (start,), (sl,)) - kb
    if sl < nb_pad:  # tiny resident arrays: pad to the row rung
        pad = nb_pad - sl
        pp = jnp.pad(pp, ((0, pad), (0, 0)))
        ww = jnp.pad(ww, (0, pad))
        rr = jnp.pad(rr, (0, pad), constant_values=1.0)
        kj = jnp.pad(kj, (0, pad), constant_values=ntiles)
    rows = jnp.arange(nb_pad, dtype=jnp.int32)
    valid = (rows >= delta) & (rows < delta + nrows)
    ww = jnp.where(valid, ww, 0.0)
    rr = jnp.where(valid, rr, 1.0)
    # front rows sort below every real tile, tail rows above: the key
    # channel stays ascending and no tile range covers either
    kj = jnp.where(
        rows < delta, jnp.int32(-1),
        jnp.where(valid, kj, jnp.int32(ntiles)),
    )
    srcf, srci, starts, cnts, aoff = _prep_body(
        pp, ww, rr, grid, np_pad, geom, nxt, kj, xt0
    )
    dstf = jnp.zeros((NF, np_pad), jnp.float32)
    dsti = jnp.concatenate(
        [
            jnp.full((1, np_pad), ntiles - 1, jnp.int32),
            jnp.full((2, np_pad), geom.HALO, jnp.int32),
            jnp.zeros((1, np_pad), jnp.int32),
        ]
    )
    alf, ali = _align_body(
        starts, cnts, aoff, srcf, srci, dstf, dsti,
        np_pad=np_pad, ntiles=ntiles, interpret=interpret,
        geom=_fold_geom(geom),
    )
    nreal = jnp.sum(
        (cnts + geom.CH - 1) // geom.CH, dtype=jnp.int32
    ).reshape(1)
    return _deposit_body(
        ali, alf, out, hx, hz, hc, nreal, nchunks=np_pad // geom.CH,
        ntiles=ntiles, subsample=subsample, accumulate=accumulate,
        interpret=interpret, geom=geom,
    )


def splat_volume_traced_engine(ppx, w, rpx, grid, subsample: int = 4,
                               interpret: bool = False, buckets=(G6, G8),
                               batch: int | None = None):
    """Fully-traced engine pipeline: fixed dispatch count, no host control
    flow.

    Takes pixel-space positions/radii and renders the same field as
    :func:`splat_volume` (for radii within ``buckets``' coverage) in a form
    that can be traced inside ``shard_map`` bodies — this is what the
    z-slab-sharded renderer runs per device (parallel/sharded.py).

    ``batch`` bounds the per-dispatch working set: the particle set is
    streamed through each bucket's shared tile buffers in static
    ``batch``-row slices (accumulating deposits, one combine per bucket),
    the traced analog of :func:`splat_volume`'s batch loop and of the
    reference's memory-bounding slice streaming (reference
    point_renderer.cpp:864-946). The sort/align transients then scale with
    ``batch`` instead of the whole per-device particle count. ``None``
    keeps the single-batch form.
    """
    grid = tuple(int(v) for v in grid)
    n = ppx.shape[0]
    if batch is None or batch >= n:
        step = max((n + 127) // 128 * 128, 128)
    else:
        step = max((int(batch) + 127) // 128 * 128, 128)
    # pad to a whole number of uniform batches: every dispatch shares one
    # compiled program per bucket
    n_pad = max(-(-n // step), 1) * step
    if n_pad > n:
        ppx = jnp.concatenate(
            [ppx, jnp.zeros((n_pad - n, 3), jnp.float32)], axis=0
        )
        w = jnp.concatenate([w, jnp.zeros(n_pad - n, jnp.float32)])
        rpx = jnp.concatenate([rpx, jnp.ones(n_pad - n, jnp.float32)])

    vol = None
    for geom in buckets:
        ntiles = _ntiles(grid, geom)
        need = step + geom.CH * ntiles + ACHUNK + geom.CH
        np_pad = (need + ACHUNK - 1) // ACHUNK * ACHUNK
        bufs = _zero_bufs(ntiles, geom)
        nb = n_pad // step
        if nb == 1:
            bufs = _dispatch_batch(
                geom, ppx, w, rpx, grid, np_pad, bufs, accumulate=False,
                subsample=subsample, interpret=interpret,
            )
        else:
            # lax.scan over uniform batches: ONE compiled dispatch body per
            # bucket however many batches stream through (a Python loop
            # would grow the traced graph — and the XLA:CPU test-mesh
            # compile time — linearly with the batch count). Accumulating
            # into zeroed buffers from the first batch is exactly the
            # write-fresh dispatch.
            def step_fn(carry, sl):
                p, ww, rr = sl
                return _dispatch_batch(
                    geom, p, ww, rr, grid, np_pad, carry, accumulate=True,
                    subsample=subsample, interpret=interpret,
                ), None

            bufs, _ = jax.lax.scan(
                step_fn, bufs,
                (ppx.reshape(nb, step, 3), w.reshape(nb, step),
                 rpx.reshape(nb, step)),
            )
        vol = _unpack_tiles(*bufs, grid, vol, _fold_geom(geom))
    return vol


def _radius_class(rpx):
    """Radius class index along the ladder: 0..len(BUCKETS)-1 for the
    kernel buckets, len(BUCKETS) for the dense tail."""
    cls = jnp.zeros(rpx.shape, jnp.int32)
    for g in BUCKETS:
        cls = cls + (rpx > g.RMAX)
    return cls


@jax.jit
def _radius_stats(radii, ppu):
    """Fused per-workload radius statistics (one readback): max PIXEL
    radius, the per-bucket population totals (the dense tail = the
    remainder), and whether the array is already sorted by radius class —
    pre-sorted inputs skip the device partition copy, which matters at
    scale: a second full copy of the particle arrays alive during a bucket
    pass OOMs a 16 GB chip at 1e8 particles -> 1024^3. The pixel-radius
    product is computed inside the fusion and never materialized (a
    resident rpx array would cost 0.4 GB at 1e8 across every bucket
    pass)."""
    rpx = radii * ppu
    cls = _radius_class(rpx)
    counts = jnp.stack([jnp.sum(cls == i) for i in range(len(BUCKETS))])
    is_sorted = jnp.all(cls[1:] >= cls[:-1]) if rpx.shape[0] > 1 else jnp.bool_(True)
    return jnp.max(rpx), counts, is_sorted


def _fused_bases(grid):
    """Key-space layout of the fused partition sort: per-bucket base key,
    then the dense-tail key, then the trash key (ineligible kernel-class
    particles: zero weight or footprint entirely off-grid — they deposit
    nothing and must not reach the dense pass)."""
    bases = []
    base = 0
    for g in BUCKETS:
        bases.append(base)
        base += _ntiles(grid, g)
    return bases, base, base + 1


class FusedPartition(NamedTuple):
    """A particle set pre-sorted by the fused (radius class, tile) key —
    the TPU analog of the reference's CPU vertex pre-processing
    (``sort_vertices`` + periodic augmentation, vertex_utilities.cpp:7-43):
    run once, outside any timed render, then every :func:`splat_volume`
    pass streams contiguous pre-grouped slices with no per-batch sorts.
    Build with :func:`prepartition`; pass to :func:`splat_volume` in place
    of ``positions`` (with ``weights``/``radii`` = None)."""

    pos_px: jnp.ndarray   # [N, 3] positions, PIXEL units, fused-sorted
    w: jnp.ndarray        # [N] weights (trash rows zeroed)
    rpx: jnp.ndarray      # [N] radii, PIXEL units
    key: jnp.ndarray      # [N] the materialized fused sort key
    grid: tuple           # (gx, gy, gz) this partition was built for
    wtabs: tuple          # per bucket: x-slab row-offset table (ntx+1,)
    kbases: tuple         # per bucket: key base in the fused key space
    dense_off: int        # first row of the dense (> last rung) tail
    n_huge: int           # dense-tail population (excludes trash)
    max_rpx: float        # max pixel radius over the whole set


@functools.partial(jax.jit, donate_argnums=(0,))
def _scale_donated(a, s):
    """Materialized ``a * s`` whose output aliases the input buffer —
    frees the caller's array the moment the scaled copy exists (s=1.0 is
    a pure ownership transfer). Still a separate jit so the product is a
    MATERIALIZED array, never FMA-fused into downstream key math."""
    return a * s


def prepartition(positions, weights, radii, pixels_per_unit, grid,
                 donate: bool = False):
    """Fused-partition device-resident particles for :func:`splat_volume`
    (see :class:`FusedPartition`). Scaling to pixel units happens eagerly
    HERE, before the sort jit — the downstream window-base math is then a
    single subtract on materialized values (see ``_fused_partition``).

    ``donate=True`` hands the three input arrays' buffers over to the
    partition (they are INVALIDATED): at 1e8 particles the inputs are
    ~2 GB of HBM that would otherwise sit dead alongside the sort's
    working set.
    """
    grid3 = tuple(int(v) for v in grid)
    n = positions.shape[0]
    s = jnp.float32(pixels_per_unit)
    if donate:
        ppx = _scale_donated(positions, s)
        rpx = _scale_donated(radii, s)
        weights = _scale_donated(weights, jnp.float32(1.0))
    else:
        ppx = positions * s
        rpx = radii * s
    pos_c, w_c, r_c, key_c, offs_dev, rmax = _fused_partition(
        ppx, weights, rpx, grid3
    )
    del ppx, rpx  # donated into the partition sort
    fo = [int(v) for v in jax.device_get(offs_dev)] + [n]
    kbases, _, _ = _fused_bases(grid3)
    wtabs, cum = [], 0
    for g in BUCKETS:
        ntx_g = _grid_pad(grid3, g)[0] // TX
        wtabs.append(tuple(fo[cum : cum + ntx_g + 1]))
        cum += ntx_g
    return FusedPartition(
        pos_px=pos_c, w=w_c, rpx=r_c, key=key_c, grid=grid3,
        wtabs=tuple(wtabs), kbases=tuple(kbases), dense_off=fo[cum],
        n_huge=fo[cum + 1] - fo[cum], max_rpx=float(rmax),
    )


@functools.partial(jax.jit, static_argnames=("grid",), donate_argnums=(0, 2))
def _fused_partition(ppx, w, rpx, grid):
    """ONE global multi-operand sort by the combined (radius class, tile)
    key — the fusion of the class-partition sort with every bucket pass's
    per-batch tile sort (each radius class maps to exactly one bucket
    geometry, so its tile assignment is known globally). Downstream, every
    batch of a class slice is already tile-grouped and ``_prep_batch``
    skips its sort; x-slab window runs stream only their own contiguous
    key range instead of re-streaming the whole class with window-filtered
    keys.

    ``ppx``/``rpx`` MUST be materialized pixel-space arrays (the caller
    scales eagerly, outside any jit): the window-base chain is then
    ``ceil(ppx - C)`` — one correctly-rounded subtract that every program
    reproduces bit-identically. Scaling in-fusion would let XLA contract
    ``pos * ppu - C`` into an FMA here but not in ``_prep_batch``,
    flipping knife-edge tile assignments between the carried key and the
    recomputed window base.

    Returns sorted (positions[N,3], weights, radii, key) — all in pixel
    units — plus the boundary offsets of every (class, x-slab) range:
    ``offs[cum_ntx[c] + xt]`` is the first row of class ``c``'s x-tile
    ``xt`` (layout from :func:`_fused_boundaries`), followed by the
    dense-tail start, trash start, and ``n``. Trash rows keep their slot
    but have their weight zeroed (they would deposit nothing anyway —
    zeroing keeps them inert even through the dense slice's tail).
    """
    bases, dense_key, trash_key = _fused_bases(grid)
    key0 = jnp.full(ppx.shape[0], -1, jnp.int32)
    for g, base in zip(BUCKETS, bases):
        kg, _ = _pair_keys(ppx, rpx, w, grid, g)
        key0 = jnp.where(kg < _ntiles(grid, g), base + kg, key0)
    cls = _radius_class(rpx)
    key0 = jnp.where(
        key0 < 0,
        jnp.where(cls == len(BUCKETS), dense_key, trash_key),
        key0,
    )
    # TWO stable sorts sharing the (duplicate-keyed) key channel produce
    # the IDENTICAL row permutation, so the payload set can be split to
    # halve the sort working set: a single 6-operand sort at 1e8 rows
    # (2.5 GB in + 2.5 GB out + scratch) is what OOMed the 1e8 -> 1024^3
    # bench on a 16 GB chip. The barrier sequences the second sort after
    # the first so their scratch never coexists.
    key, px, py, pz = jax.lax.sort(
        (key0, ppx[:, 0], ppx[:, 1], ppx[:, 2]), num_keys=1, is_stable=True
    )
    key0, w, rpx2, _ = jax.lax.optimization_barrier((key0, w, rpx, px))
    _, ww, rr = jax.lax.sort((key0, w, rpx2), num_keys=1, is_stable=True)
    ww = jnp.where(key >= trash_key, 0.0, ww)
    bvals = jnp.asarray(_fused_boundaries(grid), jnp.int32)
    offs = jnp.searchsorted(key, bvals).astype(jnp.int32)
    return (
        jnp.stack([px, py, pz], axis=1), ww, rr, key, offs,
        jnp.max(rpx) if rpx.shape[0] else jnp.float32(0.0),
    )


def _fused_boundaries(grid):
    """Boundary key values matching :func:`_fused_partition`'s ``offs``:
    for each bucket, the key at the start of each of its x-tile slabs
    (tile ids are x-major, so an x-slab window is a contiguous key range),
    then the dense-tail key and the trash key. Host-side layout helper:
    ``offs`` index of class ``c``, x-tile ``xt`` = ``cum[c] + xt`` where
    ``cum`` accumulates each class's ntx."""
    bases, dense_key, trash_key = _fused_bases(grid)
    vals = []
    for g, base in zip(BUCKETS, bases):
        gxp, gyp, gzp = _grid_pad(grid, g)
        m = (gyp // g.YTILE) * (gzp // TZ)
        for xt in range(gxp // TX):
            vals.append(base + xt * m)
    vals.append(dense_key)
    vals.append(trash_key)
    return vals


@functools.partial(
    jax.jit,
    static_argnames=("cnt_pad", "grid", "halfwidth", "subsample"),
    donate_argnums=(3,),
)
def _dense_tail(pos, w, rpx, vol, off, ppu, cnt_pad, grid, halfwidth,
                subsample):
    """Dense-deposit the huge-class tail slice ``[off, n)`` of the
    class-partitioned arrays onto ``vol``. ``off`` is traced (so varying
    workload compositions share one compile per ``cnt_pad`` rung); the
    slice start is clamped and non-huge rows below ``off`` are
    weight-zeroed. Positions AND radii are raw units, scaled by ``ppu``
    after the slice (never materializing full scaled copies)."""
    from .splat_dense import _default_chunk, splat_volume_dense_traced

    n = pos.shape[0]
    chunk = _default_chunk(2 * halfwidth + 1)
    assert cnt_pad % chunk == 0, (cnt_pad, chunk)
    off = jnp.int32(off)
    if cnt_pad >= n:
        pp, ww, rr = pos, w, rpx
        keep = jnp.arange(n) >= off
        if cnt_pad > n:
            pad = cnt_pad - n
            pp = jnp.concatenate([pp, jnp.zeros((pad, 3), jnp.float32)])
            ww = jnp.concatenate([ww, jnp.zeros(pad, jnp.float32)])
            rr = jnp.concatenate([rr, jnp.ones(pad, jnp.float32)])
            keep = jnp.concatenate([keep, jnp.zeros(pad, bool)])
    else:
        cs = jnp.minimum(off, n - cnt_pad)
        pp = jax.lax.dynamic_slice(pos, (cs, 0), (cnt_pad, 3))
        ww = jax.lax.dynamic_slice(w, (cs,), (cnt_pad,))
        rr = jax.lax.dynamic_slice(rpx, (cs,), (cnt_pad,))
        keep = cs + jnp.arange(cnt_pad) >= off
    ww = jnp.where(keep, ww, 0.0)
    rr = jnp.where(keep, rr, 1.0)
    return splat_volume_dense_traced(
        pp * ppu, ww, rr * ppu, grid, halfwidth, subsample, vol, chunk
    )


def splat_volume(positions, weights, radii, pixels_per_unit: float, grid,
                 subsample: int = 4, batch: int = 8_000_000,
                 interpret: bool | None = None):
    """Render a 3D density field with the Pallas tile engine.

    Semantics identical to :func:`nbodyhpc_tpu.ops.splat.splat_volume_oracle`
    (non-periodic / pre-augmented particles). Returns a device-resident
    (gx, gy, gz) float32 array. Radii route along the ``BUCKETS`` ladder
    (6^3 window for <= 2 px through 32^3 for <= 15 px) with the dense-window
    pass above the last rung (:mod:`nbodyhpc_tpu.ops.splat_dense` —
    unbounded radii). On the numpy path each radius class runs on its own
    physical subset; on the device path a mixed workload pays ONE global
    FUSED sort by (radius class, tile) — multi-operand ``lax.sort``,
    payloads riding the comparator network — after which every bucket
    pass streams contiguous pre-tile-grouped slices with NO per-batch
    sorts (a single-class workload skips the partition and keeps the
    per-batch sort path). Hoist the sort out of repeated/timed renders by
    passing a :func:`prepartition` result as ``positions``.
    """
    part = positions if isinstance(positions, FusedPartition) else None
    device_in = part is not None or isinstance(positions, jnp.ndarray)
    if not device_in:
        positions = np.asarray(positions, np.float32)
        weights = np.asarray(weights, np.float32)
        radii = np.asarray(radii, np.float32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    gx, gy, gz = (int(v) for v in grid)
    batch = (batch + 127) // 128 * 128
    nb = len(BUCKETS)
    resident_extra = 0

    if part is None and device_in:
        # device-resident fast path: no host round trip; bucket populations
        # come from one fused readback (which also lets every empty bucket
        # pass be skipped)
        n = positions.shape[0]
        if n:
            stats = jax.device_get(
                _radius_stats(radii, float(pixels_per_unit))
            )
            max_rpx = float(stats[0])
            counts = [int(v) for v in stats[1]]
            class_sorted = bool(stats[2])
        else:
            max_rpx = 0.0
            counts = [0] * nb
            class_sorted = True
        n_huge = n - sum(counts)
        nonempty = sum(c > 0 for c in counts) + (n_huge > 0)
        if (not class_sorted) and nonempty >= 2:
            # mixed unsorted workload: ONE global FUSED sort by (radius
            # class, tile) — the class partition and every bucket's
            # per-batch tile sort collapse into a single pass (each class
            # maps to exactly one bucket geometry). Bucket passes then
            # stream contiguous, already-tile-grouped slices: no per-batch
            # sorts, and memory-bounded x-window runs stream only their own
            # key range instead of re-streaming the whole class.
            part = prepartition(
                positions, weights, radii, pixels_per_unit, (gx, gy, gz)
            )
            # the caller still holds the raw arrays alongside our partition
            resident_extra = (
                positions.nbytes + weights.nbytes + radii.nbytes
            )

    if part is not None:
        if tuple(part.grid) != (gx, gy, gz):
            raise ValueError(
                f"FusedPartition built for grid {part.grid}, "
                f"render asked for {(gx, gy, gz)}"
            )
        n = part.pos_px.shape[0]
        pos_c, w_c, r_c, key_c = part.pos_px, part.w, part.rpx, part.key
        wtabs, kbases = part.wtabs, part.kbases
        # eligible-only counts: ineligible kernel-class rows (zero weight /
        # fully off-grid) sorted into the trash tail, skipped entirely
        counts = [t[-1] - t[0] for t in wtabs]
        offs = [t[0] for t in wtabs] + [part.dense_off]
        n_huge = part.n_huge
        max_rpx = part.max_rpx
        # the sorted pixel-unit copies + carried key channel are what
        # coexists with the bucket buffers (callers' raw arrays usually
        # stay alive too, but the partition itself holds these four)
        resident = (
            pos_c.nbytes + w_c.nbytes + r_c.nbytes + key_c.nbytes
            + resident_extra
        )
    elif device_in:
        pos_c, w_c, r_c = positions, weights, radii
        key_c = None
        wtabs = kbases = None
        offs = [0]
        for c in counts:
            offs.append(offs[-1] + c)
        resident = positions.nbytes + weights.nbytes + radii.nbytes
    else:
        rpx_h = radii * pixels_per_unit
        cls_h = np.zeros(rpx_h.shape, np.int32)
        for g in BUCKETS:
            cls_h += rpx_h > g.RMAX
        huge = cls_h == nb
        n_huge = int(np.count_nonzero(huge))
        resident = 0  # per-batch uploads only

    def run_group(jobs, vol0):
        """Stream several radius buckets sharing ONE tile geometry through
        a single tile set: per x-window, ONE ``_zero_bufs`` and ONE
        ``_unpack_tiles`` combine serve every member, with each member's
        batches depositing (accumulate) into the shared buffers. Buckets
        whose folded geom matches (G6/G8; G10/G12/G16) have identical tile
        shapes and combine programs (``_fold_geom``), so a mixed-radius
        workload pays the grid-scale fixed costs once per GROUP instead of
        once per bucket — at 1024^3 those passes are seconds.

        Each job is a dict: geom, p_in/w_in/r_in (numpy-path per-class
        arrays or the shared device arrays), off/cnt (the class's
        contiguous slice on the partitioned device path), and the fused-
        partition channels key_in/wtab/kbase (inputs globally sorted by
        (class, tile), already pixel-scaled; ``wtab[xt]`` is the absolute
        row where the class's x-tile slab ``xt`` starts, so each x-window
        run streams ONLY its own contiguous rows and every batch reaches
        ``_prep_batch`` pre-sorted).

        HBM discipline: when the group's full-grid tile buffers plus the
        resident arrays (inputs + the eventual volume) would overflow the
        chip, the grid is processed as several x-tile slab WINDOWS — each
        window allocates only its own tiles, re-streams the class slice
        with window-filtered tile keys (``_pair_keys`` xwin), and +x spill
        crossing a window boundary is chained through carry strips into the
        next window's combine. The memory-bounded analog of the reference's
        per-slice streaming (point_renderer.cpp:864-946)."""
        fgeom = _fold_geom(jobs[0]["geom"])
        grid3 = (gx, gy, gz)
        gxp, gyp, gzp = _grid_pad(grid3, fgeom)
        ntx, nty, ntz = gxp // TX, gyp // fgeom.YTILE, gzp // TZ
        m = nty * ntz
        H = fgeom.HALO
        slab_bytes = 4 * m * TY * (TX * TZ + H * TZ + TX * H + H * H)
        force = os.environ.get("NBODYHPC_TPU_SPLAT_SLABS")
        if force:
            nper = max(1, min(int(force), ntx))
        else:
            # sized to one v5e chip. The in-flight batch streams must be
            # budgeted EXPLICITLY: each dispatched batch keeps its aligned
            # src+dst channel sets ((NF f32 + NI i32) each side) live until
            # the bi % 2 sync, i.e. up to two batches at once. A fixed
            # 1.5 GiB slack under-counted them at 1e8 -> 1024^3 once the
            # fused partition's key channel and the bucket ladder put the
            # 4 GiB volume + 2.3 GiB partition alongside a single-run
            # 5.4 GiB tile set: the live set hit HBM capacity mid-batch
            # (round-2 OOM). With streams counted, G6/G8 split into two
            # x-window runs at that scale instead of OOMing. Default
            # budget 13.0: usable HBM on the chip is ~13 GiB (round-1's
            # proven 12.9 GB peak; a ~13.2 GiB live set OOMed) — the
            # window plan guarantees live <= budget by construction.
            budget = float(
                os.environ.get("NBODYHPC_TPU_HBM_GB", "13.0")
            ) * 2**30
            vol_bytes = 4 * gxp * gy * gz
            ch_max = max(j["geom"].CH for j in jobs)
            # the row term of a batch's aligned stream is bounded by the
            # LARGEST JOB in this group, not by the nominal batch size: a
            # 50k-particle G32 class never dispatches more than its own
            # row-rung (~125k rows), and budgeting a full 8e6-row stream
            # for it halved the window width (4 windows instead of 2 at
            # 1e8 -> 1024^3, ~0.45 s of pure per-window fixed cost). The
            # CH*m*ntx channel term keeps the full-grid tile count — it
            # overestimates the windowed ntiles, which is the safe side.
            rows_max = max(
                (j["p_in"].shape[0] if j["cnt"] is None else int(j["cnt"]))
                for j in jobs
            )
            est_rows = _quant_rows(max(min(batch, rows_max), 1), batch)
            np_pad_est = est_rows + ch_max * m * ntx + ACHUNK + ch_max
            stream_bytes = 2 * (NF + NI) * 4 * np_pad_est
            avail = (
                budget - vol_bytes - resident - 2 * stream_bytes - 2**30
            )
            nper = int(max(1, min(ntx, avail // slab_bytes)))
            # round down to a divisor of ntx: uniform window widths mean
            # ONE compiled program set per bucket (a ragged last window
            # would compile its own prep/align/deposit/unpack at its width)
            while ntx % nper:
                nper -= 1
        nruns = -(-ntx // nper)
        nper = -(-ntx // nruns)  # balance window sizes (forced plans)
        # Window-boundary overlap policy: the old pipeline enqueued the
        # next window's _zero_bufs while the previous window's combine
        # still held its tile set — TWO grid-scale sets live at once
        # (zero_bufs outputs allocate at enqueue). That only ever fit
        # because windows used to be narrow; the round-4 row-cap widened
        # them (G32 at 1e8 -> 1024^3: two 5.5 GiB sets + volume +
        # partition = measured OOM). When two sets don't fit the budget,
        # the boundary takes a hard drain (one scalar fetch of the
        # combined volume — an RTT per window) before zeroing the next.
        budget_b = float(
            os.environ.get("NBODYHPC_TPU_HBM_GB", "13.0")
        ) * 2**30
        two_sets_fit = (
            4 * gxp * gy * gz + resident + 2 * nper * slab_bytes + 2**30
            <= budget_b
        )

        def stage_host(job, s, e, xwin):
            """Enqueue one batch's H2D upload + pair count (both async)."""
            nb = e - s
            nb_pad = _quant_rows(nb, batch)
            pp = np.zeros((nb_pad, 3), np.float32)
            pp[:nb] = job["p_in"][s:e] * pixels_per_unit
            wb = np.zeros(nb_pad, np.float32)
            wb[:nb] = job["w_in"][s:e]
            rb = np.ones(nb_pad, np.float32)
            rb[:nb] = job["r_in"][s:e]
            ppj, wj, rj = jnp.asarray(pp), jnp.asarray(wb), jnp.asarray(rb)
            return ppj, wj, rj, _count_pairs(
                ppj, rj, wj, grid3, job["geom"],
                None if xwin is None else xwin[1],
                jnp.int32(0 if xwin is None else xwin[0]),
            )

        vol = vol0
        carry = None
        # lag token pacing budget: a blocking one-element fetch per batch
        # keeps the host at most one full batch ahead of the device (live
        # transients <= 2 stream sets), but each fetch costs a tunnel RTT
        # after the previous batch completes — for the many SMALL partial
        # batches of a mixed-radius workload (one per bucket per window)
        # the RTT dwarfs the batch's device time (~17 RTTs ~ 0.8 s of the
        # round-4 render under high-latency weather). Fetches are instead
        # taken whenever the UNPACED rows exceed half a batch: full
        # batches still pace every time, small partials ride free, and
        # the live-transient bound grows by at most half a batch's
        # streams (within the window plan's ~1 GiB slack).
        pend_rows = 0
        for xt0 in range(0, ntx, nper):
            tw = time.time()
            nxt = min(nper, ntx - xt0)
            xwin = None if nruns == 1 else (xt0, nxt)
            ntiles = m * nxt
            if xt0 and not two_sets_fit:
                # hard tile-set non-overlap across the boundary: wait for
                # the previous window's combine to finish (and free its
                # donated tiles) before enqueueing this window's zero
                float(vol[(0,) * vol.ndim])
                pend_rows = 0
            bufs = _zero_bufs(ntiles, fgeom)
            tw = _trs(f"group F={fgeom.F} win@{xt0} zero_bufs", tw,
                      bufs[0] if _TRACE else None)
            first = True
            for job in jobs:
                geom = job["geom"]
                wtab, key_in = job["wtab"], job["key_in"]
                n = (job["p_in"].shape[0] if job["cnt"] is None
                     else job["cnt"])
                if wtab is not None:
                    # fused mode: this window's own contiguous row range
                    row0 = wtab[xt0]
                    wn = wtab[min(xt0 + nxt, ntx)] - row0
                    kb = job["kbase"] + xt0 * m
                else:
                    row0, wn = job["off"], n
                p_in, w_in, r_in = job["p_in"], job["w_in"], job["r_in"]
                staged = None
                for bi, s in enumerate(range(0, max(wn, 1), batch)):
                    e = min(s + batch, wn)
                    if e <= s:
                        break
                    nb = e - s
                    nb_pad = _quant_rows(nb, batch)
                    kj = None
                    if device_in:
                        # valid pairs <= nb_pad always (1-slot assignment:
                        # each particle emits at most one pair), so the
                        # stream is sized from the batch size — no counting
                        # pass, no host sync, and one compiled shape shared
                        # by full batches
                        need = nb_pad + geom.CH * ntiles + ACHUNK + geom.CH
                        np_pad = (need + ACHUNK - 1) // ACHUNK * ACHUNK
                    if device_in and wtab is not None:
                        # fused path: ONE program per batch (slice straight
                        # from the resident partitioned arrays — inputs
                        # already pixel-scaled; never multiply them again).
                        # The lag token is a tiny slice enqueued BEFORE the
                        # batch program: fetching it blocks exactly until
                        # the PREVIOUS batch finished (in-order execution)
                        tok = jax.lax.dynamic_slice(
                            w_in, (jnp.int32(row0 + s),), (1,)
                        )
                        bufs = _batch_step(
                            p_in, w_in, r_in, key_in,
                            jnp.int32(row0 + s), jnp.int32(nb),
                            jnp.int32(kb),
                            jnp.int32(0 if xwin is None else xwin[0]),
                            *bufs, grid=grid3, np_pad=np_pad,
                            nb_pad=nb_pad, geom=geom,
                            nxt=None if xwin is None else xwin[1],
                            subsample=subsample, accumulate=not first,
                            interpret=interpret,
                        )
                        first = False
                        pend_rows += nb_pad
                        if pend_rows >= batch // 2:
                            float(tok[0])
                            pend_rows = 0
                        continue
                    if device_in:
                        # non-fused device path (single-class workloads):
                        # the pixel-scale multiply stays in its own eager
                        # dispatch, materialized OUTSIDE any program that
                        # derives window bases (_prep_body key-contraction
                        # contract)
                        if nb == batch:  # uniform shapes: one compile/batch
                            ppj = jax.lax.dynamic_slice(
                                p_in, (row0 + s, 0), (batch, 3)
                            ) * pixels_per_unit
                            wj = jax.lax.dynamic_slice(
                                w_in, (row0 + s,), (batch,))
                            rj = jax.lax.dynamic_slice(
                                r_in, (row0 + s,), (batch,)
                            ) * pixels_per_unit
                        else:  # final partial batch, zero-padded
                            ppj = jnp.zeros(
                                (nb_pad, 3), jnp.float32
                            ).at[:nb].set(
                                jax.lax.dynamic_slice(
                                    p_in, (row0 + s, 0), (nb, 3)
                                ) * pixels_per_unit
                            )
                            wj = jnp.zeros(nb_pad, jnp.float32).at[:nb].set(
                                jax.lax.dynamic_slice(
                                    w_in, (row0 + s,), (nb,))
                            )
                            rj = jnp.ones(nb_pad, jnp.float32).at[:nb].set(
                                jax.lax.dynamic_slice(
                                    r_in, (row0 + s,), (nb,)
                                ) * pixels_per_unit
                            )
                    else:
                        # dedicated-transfer-queue analog (reference
                        # vulkan_support.cpp:204-237): uploads are enqueued
                        # one batch AHEAD, so batch i+1's H2D transfer rides
                        # the async dispatch stream while batch i computes —
                        # the only per-batch host sync is the (tiny) pair
                        # count, taken after the next upload is in flight
                        if staged is None:
                            staged = stage_host(job, s, e, xwin)
                        ppj, wj, rj, cnt_dev = staged
                        staged = (
                            stage_host(job, e, min(e + batch, n), xwin)
                            if e < n else None
                        )
                        npairs = int(cnt_dev)
                        # geometric buckets bound the number of compiled
                        # shapes across varying per-batch counts
                        need = npairs + geom.CH * ntiles + ACHUNK + geom.CH
                        np_pad = ACHUNK
                        while np_pad < need:
                            np_pad = (
                                (int(np_pad * 11) // 10 + ACHUNK)
                                // ACHUNK * ACHUNK
                            )

                    # LAG-1 sync token: a one-element slice of this batch's
                    # input, enqueued BEFORE this batch's prep/align/deposit
                    # programs. In-order device execution means fetching it
                    # after the dispatch below waits exactly until the
                    # PREVIOUS batch's deposit finished (freeing its
                    # sort/align transients) while this batch keeps the
                    # device busy — the tunnel round trip hides under
                    # compute instead of draining the pipe (the old bi%2
                    # deposit-output sync idled the device for an RTT plus
                    # two batches of host dispatch, every other batch).
                    # Live transient bound stays 2 batch sets: the one in
                    # flight plus the one enqueued next.
                    tok = ppj[:1, 0] if device_in else None
                    bufs = _dispatch_batch(
                        geom, ppj, wj, rj, grid3, np_pad, bufs,
                        accumulate=not first, subsample=subsample,
                        interpret=interpret, xwin=xwin, key_in=kj,
                    )
                    first = False
                    if tok is not None:
                        float(tok[0])
                tw = _trs(
                    f"  F={geom.F} win@{xt0} batches ({wn} rows)", tw
                )

            # No group-end drain: the per-batch lag-1 token fetches already
            # pace the host to at most ONE batch ahead of the device, so the
            # combine can be enqueued immediately and the device transitions
            # last-deposit -> combine back-to-back instead of idling through
            # a tunnel round trip plus the combine's host enqueue time at
            # every window/group boundary (the old full drain synced on the
            # deposit output here). Live-set bound is unchanged: the
            # transition holds the last batch's stream set plus the next
            # window's first — the same 2 stream sets the window plan
            # budgets for the in-window steady state — and the 2-tile-set
            # coexistence during combine execution predates this (the host
            # never waited for the combine before zeroing the next window).
            if xwin is None:
                vol = _unpack_tiles(*bufs, grid3, vol, fgeom)
            else:
                vol, carry = _unpack_tiles(
                    *bufs, grid3, vol, fgeom, xwin[1], carry,
                    carry_out=True, xt0=jnp.int32(xwin[0]),
                )
            # release hx/hc promptly: they are NOT donated into the
            # combine (the carry strips alias them) and holding the
            # reference keeps a ~1 GiB residue alive across the window
            # boundary — on top of the next window's fresh tile set that
            # was the difference between fitting and the measured G32
            # OOM at 1e8 -> 1024^3
            bufs = None
            tw = _trs(f"group F={fgeom.F} win@{xt0} unpack", tw,
                      vol if _TRACE else None)
        return vol

    # group buckets by folded tile geometry: members of a group share one
    # tile set, one zero pass and one grid combine per x-window
    groups: list[list[int]] = []
    for bi, geom in enumerate(BUCKETS):
        if groups and (_fold_geom(BUCKETS[groups[-1][0]]).YTILE,
                       _fold_geom(BUCKETS[groups[-1][0]]).HALO) == (
                           geom.YTILE, geom.HALO):
            groups[-1].append(bi)
        else:
            groups.append([bi])

    vol = None
    tb = time.time()
    for gidx in groups:
        jobs = []
        for bi in gidx:
            geom = BUCKETS[bi]
            if device_in:
                if counts[bi] == 0:
                    continue
                jobs.append({
                    "geom": geom, "p_in": pos_c, "w_in": w_c, "r_in": r_c,
                    "off": offs[bi], "cnt": counts[bi], "key_in": key_c,
                    "wtab": wtabs[bi] if wtabs is not None else None,
                    "kbase": kbases[bi] if kbases is not None else 0,
                })
            else:
                msk = cls_h == bi
                if not msk.any():
                    continue
                jobs.append({
                    "geom": geom, "p_in": positions[msk],
                    "w_in": weights[msk], "r_in": rpx_h[msk],
                    "off": 0, "cnt": None, "key_in": None, "wtab": None,
                    "kbase": 0,
                })
        if not jobs:
            continue
        if device_in and vol is not None:
            # free the previous group's tile buffers before allocating
            # this one's (two grid-sized tile sets do not coexist)
            float(jnp.sum(vol[:1, :1]))
        tb = _trs(
            "group start (F="
            + ",".join(str(j["geom"].F) for j in jobs) + ")", tb,
        )
        vol = run_group(jobs, vol)
    if vol is None:
        vol = jnp.zeros((gx, gy, gz), jnp.float32)

    if n_huge:
        from .splat_dense import _default_chunk, dense_halfwidth, \
            splat_volume_dense

        if device_in:
            # the huge class is the partitioned arrays' tail slice; dense
            # RMW accumulates straight onto vol (donated). cnt_pad grows
            # geometrically so compile count stays bounded across workloads.
            # Fused arrays are already pixel-scaled (ppu=1) and their tail
            # includes the (weight-zeroed) trash rows, so the pad must
            # cover [dense_start, n), not just n_huge
            hw = dense_halfwidth(max_rpx)
            chunk = _default_chunk(2 * hw + 1)
            tail = (n - offs[-1]) if key_c is not None else n_huge
            cnt_pad = chunk
            while cnt_pad < tail:
                cnt_pad *= 2
            tb = _trs(f"dense tail start (n_huge={n_huge}, pad={cnt_pad})",
                      tb)
            vol = _dense_tail(
                pos_c, w_c, r_c, vol, offs[-1],
                jnp.float32(1.0 if key_c is not None else pixels_per_unit),
                cnt_pad, (gx, gy, gz), hw, subsample,
            )
            tb = _trs("dense tail", tb, vol if _TRACE else None)
        else:
            vol = splat_volume_dense(
                positions[huge] * pixels_per_unit, weights[huge],
                rpx_h[huge], (gx, gy, gz), subsample, vol0=vol,
                max_radius_px=float(rpx_h[huge].max()),
            )
    # stays device-resident; callers that need numpy convert at the API edge
    return vol
