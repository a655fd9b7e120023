"""Pallas TPU kernels for the batched render planner.

``solid_stack`` is the marquee fusion: a run of solid-color layers (with
optional gain/offset) composited bottom-to-top is a POINTWISE function of
a handful of per-layer scalars — but expressed as separate XLA ops, the
compiler materializes every (B, 4, H, W) layer (measured ~12.7 GB of HBM
traffic for a 6-layer 1080p batch). The kernel computes the whole
premultiplied-alpha fold in registers and writes the output once:
traffic drops to the output bytes.

Semantics match render._eval's 'solid' + 'gain_offset' + 'over_stack'
chain (itself the batched form of video_mix.c's over compositing +
VideoGainOffsetFilter):

  mask_l = box_l contains (row, col)          [rel coords, inclusive]
  rgb_l  = (color_l.rgb * gain_l + offset_l) * mask_l
  a_l    = color_l.a * mask_l
  P      = rgb_l * a_l + P * (1 - a_l)        [premultiplied fold]
  A      = a_l   +       A * (1 - a_l)
  out    = [P / A (where A != 0), A]

The jnp fallback (used on CPU test runs) evaluates the same fold with
broadcast ops.
"""

import os

import numpy as np

__all__ = ['solid_stack', 'solid_fold', 'region_over',
           'region_over_sep']


def _interpret():
    """CANVAS_PALLAS_INTERPRET=1 runs the Pallas kernels through the
    Pallas interpreter on whatever backend is active (CI uses it to
    execute the ACTUAL kernel bodies on CPU and diff them against the
    jnp fallbacks — tests/test_pallas_interpret.py); without it,
    non-TPU backends take the jnp fallback paths."""
    return os.environ.get('CANVAS_PALLAS_INTERPRET', '') == '1'


def _fold_mode():
    """Which implementation solid folds use on TPU:

    'hybrid' (default) — Pallas for MID-stack folds (their (P, A)
    accumulators feed the region_over kernel in place) and the fused
    XLA chain for FINALIZE folds (XLA terminates the chain in the f16
    store Mosaic cannot emit, folding the root convert into the same
    pass). Measured round 3: XLA beats Pallas standalone (6.93 vs
    7.56 ms/b32 on the 6-layer fold) but loses on mid-folds feeding
    Pallas regions; 'xla' / 'pallas' force one path for A/B
    (CANVAS_FOLD_MODE)."""
    return os.environ.get('CANVAS_FOLD_MODE', 'hybrid')


def _use_xla_fold(finalize, prefer_xla=False):
    mode = _fold_mode()
    if mode == 'xla':
        return True
    if mode == 'pallas':
        return False
    return finalize or prefer_xla


def _fold_jnp(jnp, jax, P, A, color, box, gain, offset, H, W):
    """Premultiplied fold of L solid layers over base (P, A), as ONE
    fusable XLA elementwise chain.

    Structured so XLA fuses the whole fold into a single output pass:
    per-channel unstacked accumulators, per-layer scalar math
    ((c*g+o)*a) broadcast into selects — the same op order as the
    Pallas kernel (bit-identical results). Measured ON TPU (round 3):
    this chain runs slightly FASTER than the hand-written Pallas fold
    (6.93 vs 7.56 ms/b32 on a 6-layer 1080p batch) and, unlike Mosaic,
    can terminate in an f16 store — the root astype fuses into the
    same pass instead of costing a separate full-frame read/write.
    (Round 2's '12.7 GB materialized' measurement was of the
    per-layer-tensor graph structure, not of a fused chain.)
    """
    L = color.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, H, 1), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    if P is None:
        zero = jnp.zeros((1, H, W), jnp.float32)
        Pc = [zero, zero, zero]
        Ac = zero
    else:
        # base may be 16-bit accumulators (quality<=9); fold math is f32
        Pc = [P[:, c].astype(jnp.float32) for c in range(3)]
        Ac = A[:, 0].astype(jnp.float32)
    for l in range(L):
        b = box[l]                                       # (B, 4) i32
        m = ((rows >= b[:, 0, None, None]) &
             (rows <= b[:, 1, None, None]) &
             (cols >= b[:, 2, None, None]) &
             (cols <= b[:, 3, None, None]))              # (B, H, W)
        a = jnp.where(m, color[l][:, 3, None, None], 0.0)
        keep = 1.0 - a
        for c in range(3):
            pa = (color[l][:, c] * gain[l] + offset[l]) * color[l][:, 3]
            Pc[c] = jnp.where(m, pa[:, None, None], 0.0) + Pc[c] * keep
        Ac = a + Ac * keep
    return Pc, Ac


def _kernel_factory(L, TH, TW, with_base, finalize=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(color_ref, box_ref, gain_ref, offset_ref, *refs):
        if finalize:
            if with_base:
                baseP_ref, baseA_ref, out_ref = refs
            else:
                (out_ref,) = refs
        elif with_base:
            baseP_ref, baseA_ref, outP_ref, outA_ref = refs
        else:
            outP_ref, outA_ref = refs
        b = pl.program_id(0)
        hi = pl.program_id(1)
        wi = pl.program_id(2)
        # 1-D row/col index vectors: each layer's box mask is the
        # broadcast AND of a (TH, 1) row mask and a (1, TW) col mask —
        # 4 compares on skinny vectors + one full-tile AND, instead of
        # 4 full-tile compares. (A lax.cond tile classifier was tried
        # and measured SLOWER: Mosaic spills the vector carries.)
        rows = (jax.lax.broadcasted_iota(jnp.int32, (TH, 1), 0)
                + hi * TH)
        cols = (jax.lax.broadcasted_iota(jnp.int32, (1, TW), 1)
                + wi * TW)
        if with_base:
            # Base may arrive in a 16-bit accumulator dtype (quality<=9
            # bf16 intermediates); the fold itself always runs f32.
            accP = [baseP_ref[0, c].astype(jnp.float32) for c in range(3)]
            accA = baseA_ref[0, 0].astype(jnp.float32)
        else:
            zero = jnp.zeros((TH, TW), jnp.float32)
            accP = [zero, zero, zero]
            accA = zero
        for l in range(L):
            rm = (rows >= box_ref[l, b, 0]) & (rows <= box_ref[l, b, 1])
            cm = (cols >= box_ref[l, b, 2]) & (cols <= box_ref[l, b, 3])
            m = rm & cm
            a_s = color_ref[l, b, 3]
            g = gain_ref[l, b]
            o = offset_ref[l, b]
            a = jnp.where(m, a_s, 0.0)
            keep = 1.0 - a
            for c in range(3):
                # (c*g+o)*a is scalar math from SMEM; the per-pixel work
                # is one select + one fma
                pa = (color_ref[l, b, c] * g + o) * a_s
                accP[c] = jnp.where(m, pa, 0.0) + accP[c] * keep
            accA = a + accA * keep
        if finalize:
            nonzero = accA != 0.0
            safe = jnp.where(nonzero, accA, 1.0)
            for c in range(3):
                out_ref[0, c] = jnp.where(nonzero, accP[c] / safe,
                                          0.0).astype(out_ref.dtype)
            out_ref[0, 3] = accA.astype(out_ref.dtype)
        else:
            for c in range(3):
                outP_ref[0, c] = accP[c].astype(outP_ref.dtype)
            outA_ref[0, 0] = accA.astype(outA_ref.dtype)

    return kernel


def _pick_tile(n, target, step):
    """Largest multiple of *step* <= target that keeps padding small."""
    t = max(step, (min(n, target) // step) * step)
    return t


def solid_fold(jnp, jax, P, A, color, box, gain, offset, H, W,
               finalize=False, out_dtype=None, prefer_xla=False,
               acc_dtype=None):
    """Fold L solid(+gain) layers over premultiplied base (P, A).

    color/box (L, B, 4), gain/offset (L, B); box is int32
    [y0, y1, x0, x1] inclusive, relative to the output window (empty
    boxes encode y1 < y0). P (B, 3, H, W) / A (B, 1, H, W) may be None
    for an empty base. Returns the updated (P, A) — or, with
    finalize=True, the un-premultiplied (B, 4, H, W) rgba (saving a
    separate full-frame divide pass). Pallas kernel on TPU, jnp
    broadcast fold elsewhere.

    acc_dtype (non-finalize only) sets the STORED dtype of the returned
    accumulators; the fold math always runs f32. The quality<=9 fast
    path stores bf16 (Mosaic stores bf16 natively where it cannot store
    f16 — measured round 2), halving accumulator HBM traffic between
    composite passes.
    """
    B = color.shape[1]
    if acc_dtype is None:
        acc_dtype = jnp.float32
    # The Pallas kernel keeps the per-layer scalars whole-array in SMEM
    # (Mosaic's block divisibility rules rule out batch-blocked SMEM
    # slices); past ~128 frames/batch the 6-layer fold overflows SMEM.
    # The fused XLA chain measures within ~8% of the kernel standalone,
    # so big batches just take that path.
    smem_bytes = (color.size + box.size) * 4 + (gain.size + offset.size) * 4
    if (_use_xla_fold(finalize, prefer_xla)
            or smem_bytes > 36 * 1024     # b128/L6=30.7K ok, b192/L6=46K not
            or (jax.default_backend() != 'tpu' and not _interpret())):
        Pc, Ac = _fold_jnp(jnp, jax, P, A, color, box, gain, offset,
                           H, W)
        if not finalize:
            Ps = jnp.stack(Pc, axis=1).astype(acc_dtype)
            As = Ac[:, None].astype(acc_dtype)
            if Ps.shape[0] != B:         # degenerate all-empty fold
                Ps = jnp.broadcast_to(Ps, (B, 3, H, W))
                As = jnp.broadcast_to(As, (B, 1, H, W))
            return Ps, As
        nonzero = Ac != 0.0
        safe = jnp.where(nonzero, Ac, 1.0)
        rgb = [jnp.where(nonzero, Pc[c] / safe, 0.0) for c in range(3)]
        out = jnp.stack(rgb + [Ac], axis=1)
        if out.shape[0] != B:
            out = jnp.broadcast_to(out, (B, 4, H, W))
        return out.astype(out_dtype) if out_dtype is not None else out

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if out_dtype is None:
        out_dtype = jnp.float32
    L = color.shape[0]
    TH = _pick_tile(H, 256, 8)
    TW = _pick_tile(W, 512, 128)
    grid = (B, pl.cdiv(H, TH), pl.cdiv(W, TW))

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [smem, smem, smem, smem]
    args = [color, box, gain, offset]
    if P is not None:
        in_specs.append(pl.BlockSpec((1, 3, TH, TW),
                                     lambda b, h, w: (b, 0, h, w)))
        in_specs.append(pl.BlockSpec((1, 1, TH, TW),
                                     lambda b, h, w: (b, 0, h, w)))
        args += [P, A]

    if finalize:
        out_specs = pl.BlockSpec((1, 4, TH, TW),
                                 lambda b, h, w: (b, 0, h, w))
        out_shape = jax.ShapeDtypeStruct((B, 4, H, W), out_dtype)
    else:
        out_specs = [pl.BlockSpec((1, 3, TH, TW),
                                  lambda b, h, w: (b, 0, h, w)),
                     pl.BlockSpec((1, 1, TH, TW),
                                  lambda b, h, w: (b, 0, h, w))]
        out_shape = [jax.ShapeDtypeStruct((B, 3, H, W), acc_dtype),
                     jax.ShapeDtypeStruct((B, 1, H, W), acc_dtype)]

    return pl.pallas_call(
        _kernel_factory(L, TH, TW, with_base=P is not None,
                        finalize=finalize),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*args)


def solid_stack(jnp, jax, color, box, gain, offset, H, W):
    """Standalone composite of L solid(+gain) layers -> (B, 4, H, W)."""
    return solid_fold(jnp, jax, None, None, color, box, gain, offset,
                      H, W, finalize=True)


def region_over(jnp, jax, P, A, layer, dy0, dx0):
    """Composite a damage-region *layer* (B, 4, h, w) over the
    premultiplied accumulator (P, A) at block-aligned offsets
    (dy0 % 64 == 0, dx0 % 128 == 0; arrays int32 scalars).

    On TPU this is a Pallas kernel with input/output aliasing and
    scalar-prefetched offsets: only the region's (64, 128) blocks of the
    full-frame accumulator are read and written — the XLA
    dynamic_update_slice formulation copies the whole accumulator per
    layer. Edge blocks that overhang the frame clip on store. Falls back
    to slice/update elsewhere.
    """
    B, _c, h, w = layer.shape
    # The TPU path floors dynamic offsets to block indices — misaligned
    # offsets or a non-block-multiple region would silently corrupt the
    # accumulator. Region size is static: check it here; offsets are
    # dynamic params and are asserted at the host planning site
    # (sources.py region quantization).
    if h % 64 or w % 128:
        raise ValueError(
            'region_over region (%d, %d) must be a multiple of the '
            '(64, 128) block grid' % (h, w))
    if jax.default_backend() != 'tpu' and not _interpret():
        # The region box may overhang the frame's bottom/right edge
        # (planner quantization rounds sizes up within the frame's
        # 64x128-aligned envelope). dynamic_slice/update CLAMP
        # out-of-range starts — that would silently SLIDE the box — so
        # pad the accumulator to the envelope first and slice back.
        # (The TPU kernel instead masks the partial edge blocks on
        # store; validated on chip, tests/test_render.py overhang test.)
        H, W = P.shape[2], P.shape[3]
        Hp, Wp = -(-H // 64) * 64, -(-W // 128) * 128
        pad = ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W))
        if Hp != H or Wp != W:
            P = jnp.pad(P, pad)
            A = jnp.pad(A, pad)
        zero = jnp.int32(0)
        subP = jax.lax.dynamic_slice(P, (zero, zero, dy0, dx0),
                                     (B, 3, h, w)).astype(jnp.float32)
        subA = jax.lax.dynamic_slice(A, (zero, zero, dy0, dx0),
                                     (B, 1, h, w)).astype(jnp.float32)
        la = layer[:, 3:4].astype(jnp.float32)
        nP = (layer[:, :3].astype(jnp.float32) * la
              + subP * (1.0 - la)).astype(P.dtype)
        nA = (la + subA * (1.0 - la)).astype(A.dtype)
        P = jax.lax.dynamic_update_slice(P, nP, (zero, zero, dy0, dx0))
        A = jax.lax.dynamic_update_slice(A, nA, (zero, zero, dy0, dx0))
        if Hp != H or Wp != W:
            P = P[:, :, :H, :W]
            A = A[:, :, :H, :W]
        return P, A

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TH, TW = 64, 128

    def kernel(offs_ref, layer_ref, P_ref, A_ref, outP_ref, outA_ref):
        # Accumulators may be 16-bit (quality<=9 bf16 intermediates);
        # blend math always runs f32, stores cast back.
        la = layer_ref[0, 3].astype(jnp.float32)
        keep = 1.0 - la
        for c in range(3):
            outP_ref[0, c] = (layer_ref[0, c].astype(jnp.float32) * la
                              + P_ref[0, c].astype(jnp.float32)
                              * keep).astype(outP_ref.dtype)
        outA_ref[0, 0] = (la + A_ref[0, 0].astype(jnp.float32)
                          * keep).astype(outA_ref.dtype)

    offs = jnp.stack([dy0 // TH, dx0 // TW]).astype(jnp.int32)
    grid = (B, h // TH, w // TW)

    def at_region(b, i, j, offs_ref):
        return (b, 0, offs_ref[0] + i, offs_ref[1] + j)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4, TH, TW),
                         lambda b, i, j, o: (b, 0, i, j)),
            pl.BlockSpec((1, 3, TH, TW), at_region),
            pl.BlockSpec((1, 1, TH, TW), at_region),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, TH, TW), at_region),
            pl.BlockSpec((1, 1, TH, TW), at_region),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(P.shape, P.dtype),
                   jax.ShapeDtypeStruct(A.shape, A.dtype)],
        input_output_aliases={2: 0, 3: 1},
        interpret=_interpret(),
    )(offs, layer, P, A)


def region_over_sep(jnp, jax, P, A, color, ry, rx, dy0, dx0):
    """Composite a RANK-1 damage-region layer (a factored scaled solid:
    value[c, y, x] = color[c] * ry[y] * rx[x]) over the premultiplied
    accumulator (P, A) at block-aligned offsets — WITHOUT materializing
    the (B, 4, h, w) layer tensor: the kernel rebuilds each tile's
    weights from the two per-axis vector slices in VMEM (the region
    bytes drop from 4 full channel planes to h + w floats per frame).

    color (B, 4) f32; ry (B, h), rx (B, w) f32 with h % 64 == 0 and
    w % 128 == 0 (the placed-region quantization); dy0/dx0 int32
    scalars, block-aligned like region_over. Same over math as
    region_over on the materialized outer product, within f32
    reassociation ulps (the batched-vs-pull scaler tolerance).
    """
    B, h = ry.shape
    w = rx.shape[1]
    if h % 64 or w % 128:
        raise ValueError(
            'region_over_sep region (%d, %d) must be a multiple of the '
            '(64, 128) block grid' % (h, w))
    if jax.default_backend() != 'tpu' and not _interpret():
        layer = (color[:, :, None, None] * ry[:, None, :, None]
                 * rx[:, None, None, :])
        return region_over(jnp, jax, P, A, layer, dy0, dx0)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TH, TW = 64, 128

    def kernel(offs_ref, color_ref, ry_ref, rx_ref, P_ref, A_ref,
               outP_ref, outA_ref):
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        # Whole-vector VMEM refs (blocked vector slices violate
        # Mosaic's (8, 128) block divisibility); each tile slices its
        # aligned (TH, 1)/(1, TW) window — the 3-D shapes keep every
        # in-kernel value 2-D.
        wy = ry_ref[b, pl.ds(i * TH, TH), :]    # (TH, 1)
        wx = rx_ref[b, :, pl.ds(j * TW, TW)]    # (1, TW)
        wt = wy * wx                            # (TH, TW)
        la = color_ref[b, 3] * wt
        keep = 1.0 - la
        for c in range(3):
            outP_ref[0, c] = ((color_ref[b, c] * wt) * la
                              + P_ref[0, c].astype(jnp.float32)
                              * keep).astype(outP_ref.dtype)
        outA_ref[0, 0] = (la + A_ref[0, 0].astype(jnp.float32)
                          * keep).astype(outA_ref.dtype)

    offs = jnp.stack([dy0 // TH, dx0 // TW]).astype(jnp.int32)
    grid = (B, h // TH, w // TW)

    def at_region(b, i, j, offs_ref):
        return (b, 0, offs_ref[0] + i, offs_ref[1] + j)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # color
            pl.BlockSpec((B, h, 1), lambda b, i, j, o: (0, 0, 0)),
            pl.BlockSpec((B, 1, w), lambda b, i, j, o: (0, 0, 0)),
            pl.BlockSpec((1, 3, TH, TW), at_region),
            pl.BlockSpec((1, 1, TH, TW), at_region),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, TH, TW), at_region),
            pl.BlockSpec((1, 1, TH, TW), at_region),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(P.shape, P.dtype),
                   jax.ShapeDtypeStruct(A.shape, A.dtype)],
        input_output_aliases={4: 0, 5: 1},
        interpret=_interpret(),
    )(offs, color, ry[:, :, None], rx[:, None, :], P, A)
