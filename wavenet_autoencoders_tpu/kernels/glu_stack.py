"""Whole-stack fused residual-GLU kernels for TRAINING (forward + explicit
backward, both Pallas), the round-3 recorded future work (README: "one
whole-stack fwd+bwd kernel keeping h VMEM-resident").

Forward: ONE pallas_call, grid over the batch; each program holds its
(T, C) residual row in a VMEM scratch and runs ALL L layers — 3-tap dilated
conv as 3 static-offset GEMMs over a left-zero-padded buffer, conditioning
adds, tanh*sigmoid gate, skip/out 1x1s — with every layer's folded weights
VMEM-resident. The only HBM traffic between layers is the pre-activation
``ab`` (saved for backward), streamed out via double-buffered async DMA.

Backward: the residual update ``h' = (out(act) + h) * sqrt(0.5)`` is
INVERTIBLE given ``ab``:  ``h = h' * sqrt(2) - out(act)``.  The backward
kernel therefore reconstructs each layer's input on the fly from the saved
``ab`` (flash-attention-style recompute, but exact), walking the stack in
reverse with the same VMEM-resident weights — no per-layer activation
stash.  To keep reconstruction exact, BOTH passes derive ``act`` from the
*stored* (possibly bf16-rounded) ``ab``, so fwd and bwd compute bitwise-
identical ``out`` terms and the inversion error is pure f32 rounding
(~1e-7/layer; the sqrt(2) amplification over 20 layers leaves ~1e-4
relative — measured in tests).

Weight norm stays outside: kernels consume FOLDED weights, and gradients
w.r.t. the folded weights/conditioning addends are returned to XLA, which
chains them through the (g, v) folding and the gproj/embedding expressions
automatically.

Reference hot loop this replaces: ``wavenet_vocoder/modules.py:115-163``
(conv -> gate -> skip/out per layer, 20 HBM round-trips per direction).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RES_SCALE = math.sqrt(0.5)
INV_RES_SCALE = math.sqrt(2.0)



def _dot(a, b, ca, cb, acc):
    """dot_general contracting a's dim ca with b's dim cb (no materialized
    transpose — the MXU takes the operand layout directly)."""
    return jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((), ())), preferred_element_type=acc
    )

def _gate_from_ab(ab32, G2):
    a, b = ab32[:, :G2], ab32[:, G2:]
    return jnp.tanh(a) * jax.nn.sigmoid(b)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _fwd_kernel(dils, G2, PAD, has_c, has_g, store, acc, Gp):
    L = len(dils)

    def kernel(*refs):
        i = 0
        x_ref = refs[i]; i += 1            # (1, T, C)
        if has_c:
            c_ref = refs[i]; i += 1        # (1, T, cin)
        if has_g:
            gadd_ref = refs[i]; i += 1     # (1, L, G)
        wconv_ref = refs[i]; i += 1        # (L, 3, C, G)
        bconv_ref = refs[i]; i += 1        # (L, G)
        wc_ref = refs[i] if has_c else None; i += has_c
        wout_ref = refs[i]; i += 1         # (L, G2, C)
        bout_ref = refs[i]; i += 1         # (L, C)
        wskip_ref = refs[i]; i += 1        # (L, G2, S)
        bskip_ref = refs[i]; i += 1        # (L, S)
        skips_ref = refs[i]; i += 1        # out (1, T, S)
        hfin_ref = refs[i]; i += 1         # out (1, T, C)
        ab_hbm = refs[i]; i += 1           # out (B, L, T, G) in HBM/ANY
        hpad = refs[i]; i += 1             # scratch (PAD+T, C) f32
        ab_stage = refs[i]; i += 1         # scratch (2, T, G) store
        ab_sem = refs[i]; i += 1           # DMA sems (2,)

        b = pl.program_id(0)
        T = x_ref.shape[1]

        hpad[0:PAD] = jnp.zeros((PAD, hpad.shape[1]), jnp.float32)
        hpad[PAD:] = x_ref[0].astype(jnp.float32)

        skip_acc = None
        for l in range(L):
            d = dils[l]
            # 3-tap dilated conv: taps at t-2d, t-d, t over the padded row
            ab = (
                jnp.dot(hpad[PAD - 2 * d : PAD - 2 * d + T].astype(store),
                        wconv_ref[l, 0], preferred_element_type=acc)
                + jnp.dot(hpad[PAD - d : PAD - d + T].astype(store),
                          wconv_ref[l, 1], preferred_element_type=acc)
                + jnp.dot(hpad[PAD : PAD + T].astype(store),
                          wconv_ref[l, 2], preferred_element_type=acc)
                + bconv_ref[l : l + 1, :]
            )
            if has_c:
                ab = ab + jnp.dot(c_ref[0].astype(store), wc_ref[l],
                                  preferred_element_type=acc)
            if has_g:
                ab = ab + gadd_ref[0, l : l + 1, :].astype(acc)
            ab_s = ab.astype(store)
            G = ab_s.shape[1]
            if Gp > G:
                # lane-align the staged copy: Mosaic requires DMA slice
                # shapes aligned to the 128-lane tiling
                ab_dma = jnp.concatenate(
                    [ab_s, jnp.zeros((ab_s.shape[0], Gp - G), store)], axis=1
                )
            else:
                ab_dma = ab_s
            # stream ab out (double-buffered): wait the copy issued 2 layers
            # ago before reusing its staging slot
            par = l % 2
            if l >= 2:
                pltpu.make_async_copy(
                    ab_stage.at[par], ab_hbm.at[b, l - 2], ab_sem.at[par]
                ).wait()
            ab_stage[par] = ab_dma
            pltpu.make_async_copy(
                ab_stage.at[par], ab_hbm.at[b, l], ab_sem.at[par]
            ).start()
            # act derived from the STORED ab so backward reconstructs the
            # bitwise-identical out term (see module docstring)
            act = _gate_from_ab(ab_s.astype(acc), G2).astype(store)
            s = jnp.dot(act, wskip_ref[l], preferred_element_type=acc) \
                + bskip_ref[l : l + 1, :]
            skip_acc = s if skip_acc is None else skip_acc + s
            out = jnp.dot(act, wout_ref[l], preferred_element_type=acc) \
                + bout_ref[l : l + 1, :]
            hpad[PAD:] = (out + hpad[PAD:]) * RES_SCALE

        # drain the last two in-flight ab copies
        pltpu.make_async_copy(ab_stage.at[0], ab_hbm.at[b, 0], ab_sem.at[0]).wait()
        if L >= 2:
            pltpu.make_async_copy(ab_stage.at[1], ab_hbm.at[b, 0], ab_sem.at[1]).wait()

        skips_ref[0] = skip_acc.astype(skips_ref.dtype)
        hfin_ref[0] = hpad[PAD:].astype(hfin_ref.dtype)

    return kernel


def _fwd_pallas(x, c, g_add, wconv, bconv, wc, wout, bout, wskip, bskip,
                dilations, interpret):
    B, T, C = x.shape
    L, _, _, G = wconv.shape
    G2 = G // 2
    S = wskip.shape[-1]
    store = x.dtype
    acc = jnp.float32
    has_c = c is not None
    has_g = g_add is not None
    PAD = 2 * max(dilations)
    Gp = _round_up(G, 128)

    def row(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape, lambda b: (b,) + (0,) * nd,
                            memory_space=pltpu.VMEM)

    def resident(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda b: (0,) * nd, memory_space=pltpu.VMEM)

    in_specs = [row((T, C))]
    inputs = [x]
    if has_c:
        in_specs.append(row((T, c.shape[-1])))
        inputs.append(c.astype(store))
    if has_g:
        in_specs.append(row((L, G)))
        inputs.append(g_add.astype(acc))
    in_specs += [resident(wconv.shape), resident((L, G))]
    inputs += [wconv.astype(store), bconv.astype(acc)]
    if has_c:
        in_specs.append(resident(wc.shape))
        inputs.append(wc.astype(store))
    in_specs += [resident(wout.shape), resident((L, C)),
                 resident(wskip.shape), resident((L, S))]
    inputs += [wout.astype(store), bout.astype(acc),
               wskip.astype(store), bskip.astype(acc)]

    skips, hfin, ab = pl.pallas_call(
        _fwd_kernel(tuple(dilations), G2, PAD, has_c, has_g, store, acc, Gp),
        grid=(B,),
        in_specs=in_specs,
        out_specs=(
            row((T, S)),
            row((T, C)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, S), store),
            jax.ShapeDtypeStruct((B, T, C), store),
            jax.ShapeDtypeStruct((B, L, T, Gp), store),
        ),
        scratch_shapes=[
            pltpu.VMEM((PAD + T, C), jnp.float32),
            pltpu.VMEM((2, T, Gp), store),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*inputs)
    return skips, hfin, ab


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(dils, G2, PAD, has_c, has_g, store, acc, G):
    L = len(dils)

    def kernel(*refs):
        i = 0
        dskip_ref = refs[i]; i += 1        # (1, T, S) upstream d(skip sum)
        hfin_ref = refs[i]; i += 1         # (1, T, C) forward final residual
        if has_c:
            c_ref = refs[i]; i += 1        # (1, T, cin)
        wconv_ref = refs[i]; i += 1
        wc_ref = refs[i] if has_c else None; i += has_c
        wout_ref = refs[i]; i += 1
        bout_ref = refs[i]; i += 1
        wskip_ref = refs[i]; i += 1
        ab_hbm = refs[i]; i += 1           # (B, L, T, G) in ANY/HBM
        dx_ref = refs[i]; i += 1           # out (1, T, C)
        dc_ref = refs[i] if has_c else None; i += has_c
        dgadd_ref = refs[i] if has_g else None; i += has_g
        dwconv_ref = refs[i]; i += 1       # out (L, 3, C, G) f32 accumulator
        dbconv_ref = refs[i]; i += 1       # out (L, G)
        dwc_ref = refs[i] if has_c else None; i += has_c
        dwout_ref = refs[i]; i += 1        # out (L, G2, C)
        dbout_ref = refs[i]; i += 1        # out (L, C)
        dwskip_ref = refs[i]; i += 1       # out (L, G2, S)
        dbskip_ref = refs[i]; i += 1       # out (L, S)
        hpad = refs[i]; i += 1             # scratch (PAD+T, C) f32
        dxpad = refs[i]; i += 1            # scratch (T+PAD, C) f32
        dabpad = refs[i]; i += 1           # scratch (T+PAD, G) f32
        ab_stage = refs[i]; i += 1         # scratch (2, T, G) store
        ab_sem = refs[i]; i += 1           # DMA sems (2,)

        b = pl.program_id(0)
        T = dx_ref.shape[1]
        C = dx_ref.shape[2]
        S = dskip_ref.shape[2]

        @pl.when(b == 0)
        def _():
            dwconv_ref[...] = jnp.zeros_like(dwconv_ref)
            dbconv_ref[...] = jnp.zeros_like(dbconv_ref)
            dwout_ref[...] = jnp.zeros_like(dwout_ref)
            dbout_ref[...] = jnp.zeros_like(dbout_ref)
            dwskip_ref[...] = jnp.zeros_like(dwskip_ref)
            dbskip_ref[...] = jnp.zeros_like(dbskip_ref)
            if has_c:
                dwc_ref[...] = jnp.zeros_like(dwc_ref)

        # prefetch the deepest layer's ab
        pltpu.make_async_copy(ab_hbm.at[b, L - 1], ab_stage.at[(L - 1) % 2],
                              ab_sem.at[(L - 1) % 2]).start()

        hpad[0:PAD] = jnp.zeros((PAD, C), jnp.float32)
        hpad[PAD:] = hfin_ref[0].astype(jnp.float32)
        dxpad[...] = jnp.zeros((T + PAD, C), jnp.float32)  # d(h_L) = 0 + right pad
        dabpad[T:] = jnp.zeros((PAD, G), jnp.float32)

        dskip = dskip_ref[0].astype(acc)
        dskip_s = dskip.astype(store)
        dc_acc = None

        for lr in range(L):
            l = L - 1 - lr
            d = dils[l]
            par = l % 2
            pltpu.make_async_copy(ab_hbm.at[b, l], ab_stage.at[par],
                                  ab_sem.at[par]).wait()
            ab_s = ab_stage[par][:, :G]
            if l >= 1:  # prefetch next (shallower) layer into the other slot
                pltpu.make_async_copy(ab_hbm.at[b, l - 1], ab_stage.at[1 - par],
                                      ab_sem.at[1 - par]).start()
            ab32 = ab_s.astype(acc)
            ta = jnp.tanh(ab32[:, :G2])
            sb = jax.nn.sigmoid(ab32[:, G2:])
            act_s = (ta * sb).astype(store)
            # ---- reconstruct this layer's input (exact inverse) ----
            out = jnp.dot(act_s, wout_ref[l], preferred_element_type=acc) \
                + bout_ref[l : l + 1, :]
            hpad[PAD:] = hpad[PAD:] * INV_RES_SCALE - out
            # ---- gradients ----
            dres = dxpad[0:T] * RES_SCALE          # into (out + residual)
            dres_s = dres.astype(store)
            dact = (
                _dot(dres_s, wout_ref[l], 1, 1, acc)
                + _dot(dskip_s, wskip_ref[l], 1, 1, acc)
            )
            # gate backward: act = tanh(a)*sigmoid(b)
            dgate_a = dact * (sb * (1.0 - ta * ta))
            dgate_b = dact * (ta * sb * (1.0 - sb))
            dab = jnp.concatenate([dgate_a, dgate_b], axis=1)
            dab_s = dab.astype(store)
            dabpad[0:T] = dab

            # weight grads (accumulated over the batch in the out refs)
            dwout_ref[l] = dwout_ref[l] + _dot(act_s, dres_s, 0, 0, acc)
            dbout_ref[l : l + 1, :] = dbout_ref[l : l + 1, :] + jnp.sum(
                dres, axis=0, keepdims=True)
            dwskip_ref[l] = dwskip_ref[l] + _dot(act_s, dskip_s, 0, 0, acc)
            dbskip_ref[l : l + 1, :] = dbskip_ref[l : l + 1, :] + jnp.sum(
                dskip, axis=0, keepdims=True)
            dbconv_ref[l : l + 1, :] = dbconv_ref[l : l + 1, :] + jnp.sum(
                dab, axis=0, keepdims=True)
            for j in range(3):
                # ab[t] consumed xpad[PAD - (2-j)d + t]
                xs = hpad[PAD - (2 - j) * d : PAD - (2 - j) * d + T].astype(store)
                dwconv_ref[l, j] = dwconv_ref[l, j] + _dot(xs, dab_s, 0, 0, acc)
            if has_c:
                dwc_ref[l] = dwc_ref[l] + _dot(
                    c_ref[0].astype(store), dab_s, 0, 0, acc)
                dct = _dot(dab_s, wc_ref[l], 1, 1, acc)
                dc_acc = dct if dc_acc is None else dc_acc + dct
            if has_g:
                dgadd_ref[0, l : l + 1, :] = jnp.sum(dab, axis=0, keepdims=True)

            # dx[t] = dres[t] + sum_j dab[t + (2-j)d] @ wconv_j^T
            dx = dres
            for j in range(3):
                sh = (2 - j) * d
                dx = dx + _dot(dabpad[sh : sh + T].astype(store),
                               wconv_ref[l, j], 1, 1, acc)
            dxpad[0:T] = dx

        dx_ref[0] = dxpad[0:T].astype(dx_ref.dtype)
        if has_c:
            dc_ref[0] = dc_acc.astype(dc_ref.dtype)

    return kernel


def _bwd_pallas(dskips, hfin, c, ab, wconv, wc, wout, bout, wskip,
                dilations, has_g, interpret):
    B, T, S = dskips.shape
    L, _, C, G = wconv.shape
    G2 = G // 2
    store = hfin.dtype
    acc = jnp.float32
    has_c = c is not None
    PAD = 2 * max(dilations)

    def row(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape, lambda b: (b,) + (0,) * nd,
                            memory_space=pltpu.VMEM)

    def resident(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda b: (0,) * nd, memory_space=pltpu.VMEM)

    in_specs = [row((T, S)), row((T, C))]
    inputs = [dskips.astype(store), hfin]
    if has_c:
        in_specs.append(row((T, c.shape[-1])))
        inputs.append(c.astype(store))
    in_specs.append(resident(wconv.shape))
    inputs.append(wconv.astype(store))
    if has_c:
        in_specs.append(resident(wc.shape))
        inputs.append(wc.astype(store))
    in_specs += [resident(wout.shape), resident((L, C)), resident(wskip.shape)]
    inputs += [wout.astype(store), bout.astype(acc), wskip.astype(store)]
    in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY))
    inputs.append(ab)

    out_specs = [row((T, C))]
    out_shape = [jax.ShapeDtypeStruct((B, T, C), store)]
    if has_c:
        out_specs.append(row((T, c.shape[-1])))
        out_shape.append(jax.ShapeDtypeStruct((B, T, c.shape[-1]), acc))
    if has_g:
        out_specs.append(row((L, G)))
        out_shape.append(jax.ShapeDtypeStruct((B, L, G), acc))
    # weight-grad accumulators: constant index map -> one persistent VMEM
    # buffer accumulated across the whole batch grid
    out_specs += [resident((L, 3, C, G)), resident((L, G))]
    out_shape += [jax.ShapeDtypeStruct((L, 3, C, G), acc),
                  jax.ShapeDtypeStruct((L, G), acc)]
    if has_c:
        out_specs.append(resident((L, c.shape[-1], G)))
        out_shape.append(jax.ShapeDtypeStruct((L, c.shape[-1], G), acc))
    out_specs += [resident((L, G2, C)), resident((L, C)),
                  resident((L, G2, S)), resident((L, S))]
    out_shape += [jax.ShapeDtypeStruct((L, G2, C), acc),
                  jax.ShapeDtypeStruct((L, C), acc),
                  jax.ShapeDtypeStruct((L, G2, S), acc),
                  jax.ShapeDtypeStruct((L, S), acc)]

    outs = pl.pallas_call(
        _bwd_kernel(tuple(dilations), G2, PAD, has_c, has_g, store, acc, G),
        grid=(B,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((PAD + T, C), jnp.float32),
            pltpu.VMEM((T + PAD, C), jnp.float32),
            pltpu.VMEM((T + PAD, G), jnp.float32),
            pltpu.VMEM((2, T, _round_up(G, 128)), store),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*inputs)
    i = 0
    dx = outs[i]; i += 1
    dc = outs[i] if has_c else None; i += has_c
    dgadd = outs[i] if has_g else None; i += has_g
    dwconv = outs[i]; i += 1
    dbconv = outs[i]; i += 1
    dwc = outs[i] if has_c else None; i += has_c
    dwout = outs[i]; i += 1
    dbout = outs[i]; i += 1
    dwskip = outs[i]; i += 1
    dbskip = outs[i]; i += 1
    return dx, dc, dgadd, dwconv, dbconv, dwc, dwout, dbout, dwskip, dbskip


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_glu_stack(x, c, g_add, wconv, bconv, wc, wout, bout, wskip, bskip,
                    dilations, interpret: bool = False):
    """Run the full residual-GLU stack fused; returns the UNSCALED skip sum
    (B, T, S) — the caller applies the sqrt(1/L) scaling, matching
    ``models/wavenet.py``.

    x (B,T,C) store-dtype; c (B,T,cin) or None; g_add (B,L,G) per-layer
    global addends or None; stacked FOLDED weights: wconv (L,3,C,G),
    bconv (L,G), wc (L,cin,G), wout (L,G2,C), bout (L,C), wskip (L,G2,S),
    bskip (L,S); dilations static tuple of length L.
    """
    skips, _hfin, _ab = _fwd_pallas(
        x, c, g_add, wconv, bconv, wc, wout, bout, wskip, bskip,
        dilations, interpret,
    )
    return skips


def _stack_fwd(x, c, g_add, wconv, bconv, wc, wout, bout, wskip, bskip,
               dilations, interpret):
    skips, hfin, ab = _fwd_pallas(
        x, c, g_add, wconv, bconv, wc, wout, bout, wskip, bskip,
        dilations, interpret,
    )
    return skips, (c, g_add, hfin, ab, wconv, wc, wout, bout, wskip)


def _stack_bwd(dilations, interpret, res, dskips):
    c, g_add, hfin, ab, wconv, wc, wout, bout, wskip = res
    dx, dc, dgadd, dwconv, dbconv, dwc, dwout, dbout, dwskip, dbskip = _bwd_pallas(
        dskips, hfin, c, ab, wconv, wc, wout, bout, wskip,
        dilations, g_add is not None, interpret,
    )
    return (
        dx.astype(hfin.dtype),
        None if c is None else dc.astype(c.dtype),
        dgadd,
        dwconv.astype(wconv.dtype), dbconv,
        None if wc is None else dwc.astype(wc.dtype),
        dwout.astype(wout.dtype), dbout,
        dwskip.astype(wskip.dtype), dbskip,
    )


fused_glu_stack.defvjp(_stack_fwd, _stack_bwd)
