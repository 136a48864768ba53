"""Fused WaveNet AR sampling loop — one Pallas kernel for the whole decode.

The reference generates sample-by-sample from Python
(``wavenet.py:299-339``; minutes per utterance). The scan-based
``WaveNet.decode`` already moves the loop on-device; this kernel goes
further: ``grid=(T,)`` executes sequentially on a TPU core, so

- every layer weight is loaded to VMEM ONCE and stays resident across all
  T steps (the scan path re-reads weights from HBM every step — the AR
  decode's actual bottleneck: ~16 MB of weights per step vs ~100 kB of
  activations);
- the per-layer ring buffers live in VMEM scratch, persist across grid
  steps, and are updated in place (O(1) per step, no copies);
- conditioning frames are auto-pipelined into VMEM by the BlockSpec
  index_map (double-buffered DMA);
- the mu-law categorical sampling (Gumbel-argmax over the softmax) runs
  in-kernel on the TPU PRNG, so there is zero host↔device traffic and
  zero per-step dispatch.

Scope: kernel_size 3 (all presets), both input families —

- mu-law-quantize: one-hot input == row-gather of the input 1x1,
  in-kernel categorical (Gumbel-argmax) sampling;
- scalar (raw / mulaw, the reference hparams.py:20 default): in-kernel
  mixture-of-logistics / mixture-of-Gaussians sampling with the exact
  ``mixture.py:118-156`` numerics (uniforms in (1e-5, 1-1e-5),
  logistic inverse-CDF; Box–Muller for the Normal head).

Teacher-forcing mode feeds ground-truth codes/samples instead — the
equivalence test against the batch forward, same as the reference's
``test_inputs`` hook (``wavenet.py:249``).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wavenet_autoencoders_tpu.ops.conv import conv1d_weight


def pack_decode_weights(net, params: dict, dtype=jnp.float32) -> dict:
    """Stack the WaveNet params into per-layer arrays for the kernel.

    Returns dict of arrays:
      w1 (Cin_model, C), b1 (C);
      wconv (L, 3, C, G), bconv (L, G); wc (L, cin, G);
      wout (L, G2, C), bout (L, C); wskip (L, G2, S), bskip (L, S);
      wp1 (S, S), bp1 (S); wp2 (S, O), bp2 (O)
    """
    L = net.layers

    def w(p):
        return conv1d_weight(p).astype(dtype)

    f32 = jnp.float32  # biases are cheap adds — keep full precision
    packed = {
        "w1": w(params["first"])[0],
        "b1": params["first"]["b"].astype(f32),
        "wconv": jnp.stack([w(params["layers"][i]["conv"]) for i in range(L)]),
        "bconv": jnp.stack([params["layers"][i]["conv"]["b"].astype(f32) for i in range(L)]),
        "wout": jnp.stack([w(params["layers"][i]["out"])[0] for i in range(L)]),
        "bout": jnp.stack([params["layers"][i]["out"]["b"].astype(f32) for i in range(L)]),
        "wskip": jnp.stack([w(params["layers"][i]["skip"])[0] for i in range(L)]),
        "bskip": jnp.stack([params["layers"][i]["skip"]["b"].astype(f32) for i in range(L)]),
        "wp1": w(params["post1"])[0],
        "bp1": params["post1"]["b"].astype(f32),
        "wp2": w(params["post2"])[0],
        "bp2": params["post2"]["b"].astype(f32),
    }
    if "cproj" in params["layers"][0]:
        packed["wc"] = jnp.stack([w(params["layers"][i]["cproj"])[0] for i in range(L)])
    return packed


def _mk_kernel(
    net,
    B,
    T,
    teacher: bool,
    has_c: bool,
    has_g: bool,
    acc=jnp.float32,
    store=jnp.float32,
    hbm_layers: tuple = (),
):
    """Build the fused decode-step kernel body.

    ``hbm_layers``: indices of layers whose ring buffer lives in HBM instead
    of VMEM (see :func:`wavenet_decode_pallas` — the high-dilation layers own
    ~94% of the ring-buffer bytes, so spilling them to HBM with
    double-buffered DMA prefetch lifts the VMEM batch ceiling from 32 to
    128+ while the prefetch latency hides entirely behind the step's
    matmuls: tap addresses are pure functions of ``t``, so step ``t``
    prefetches step ``t+1``'s taps).
    """
    L = net.layers
    C = net.residual_channels
    G = net.gate_channels
    G2 = G // 2
    S = net.skip_out_channels
    O = net.out_channels
    k = net.kernel_size
    scalar = net.scalar_input
    assert k == 3, "kernel specialized for kernel_size=3 (all presets)"
    dils = [net.dilation(i) for i in range(L)]
    skip_scale = math.sqrt(1.0 / L)
    res_scale = math.sqrt(0.5)
    hbm_set = frozenset(hbm_layers)
    # hazard-freedom of the prefetch schedule needs d >= 4 (see analysis in
    # wavenet_decode_pallas); every preset's HBM-eligible dilation is >= 64
    assert all(dils[l] >= 4 for l in hbm_set)
    vmem_layers = [l for l in range(L) if l not in hbm_set]
    hbm_list = sorted(hbm_set)

    def kernel(*refs):
        i = 0
        w1_ref = refs[i]; i += 1
        b1_ref = refs[i]; i += 1
        wconv_ref = refs[i]; i += 1
        bconv_ref = refs[i]; i += 1
        wout_ref = refs[i]; i += 1
        bout_ref = refs[i]; i += 1
        wskip_ref = refs[i]; i += 1
        bskip_ref = refs[i]; i += 1
        wp1_ref = refs[i]; i += 1
        bp1_ref = refs[i]; i += 1
        wp2_ref = refs[i]; i += 1
        bp2_ref = refs[i]; i += 1
        if has_c:
            wc_ref = refs[i]; i += 1
            ct_ref = refs[i]; i += 1          # (1, B, cin) block at step t
        if has_g:
            gadd_ref = refs[i]; i += 1        # (L, B, G) precomputed
        seed_ref = refs[i]; i += 1            # (1,) int32 in SMEM
        if teacher:
            teach_ref = refs[i]; i += 1       # (1, 1, B) int32 block at step t
        if hbm_list:
            # one concatenated (sum 2*d_l, B, C) ring arena in HBM — a single
            # array so XLA cannot constant-dedup equal-shaped per-layer
            # buffers into one aliased allocation (it does, for equal d)
            hbm_ring = refs[i]; i += 1
        hbm_off = {}
        _off = 0
        for l in hbm_list:
            hbm_off[l] = _off
            _off += 2 * dils[l]
        codes_ref = refs[i]; i += 1           # out: (1, 1, B) int32
        logits_ref = refs[i]; i += 1          # out: (1, B, O)
        bufs = {}
        for l in vmem_layers:                 # scratch: (2*d_l, B, C) each
            bufs[l] = refs[i]; i += 1
        prev_ref = refs[i]; i += 1            # scratch: (B, O) one-hot prev
        rstage = {}
        wstage = {}
        rsem = {}
        wsem = {}
        for l in hbm_list:
            rstage[l] = refs[i]; i += 1       # (4, B, C): [parity*2 + tap]
            wstage[l] = refs[i]; i += 1       # (2, B, C): [parity]
            rsem[l] = refs[i]; i += 1         # DMA sems (2, 2): [tap, parity]
            wsem[l] = refs[i]; i += 1         # DMA sems (2,): [parity]

        t = pl.program_id(0)
        p = jax.lax.rem(t, 2)
        pn = jax.lax.rem(t + 1, 2)

        @pl.when(t == 0)
        def _():
            pltpu.prng_seed(seed_ref[0])
            if scalar:
                # scalar zero initial input (wavenet.py:285)
                prev_ref[:] = jnp.zeros((B, 1), jnp.float32)
            else:
                # mu-law silence code 127 as initial input (wavenet.py:288);
                # built via iota (scatter doesn't lower on TPU)
                col = jax.lax.broadcasted_iota(jnp.int32, (B, O), 1)
                prev_ref[:] = (col == 127).astype(store)
            for l in vmem_layers:
                bufs[l][:] = jnp.zeros_like(bufs[l])

        # ---- HBM-layer DMA choreography --------------------------------
        # wait the write DMA issued 2 steps ago (frees wstage[p] for reuse)
        for li, l in enumerate(hbm_list):
            @pl.when(t >= 2)
            def _(li=li, l=l):
                pltpu.make_async_copy(
                    wstage[l].at[p], hbm_ring.at[hbm_off[l]], wsem[l].at[p]
                ).wait()

        # prefetch step t+1's taps (contents were written >= d-1 steps ago;
        # slot conflicts with in-flight writes are impossible for d >= 4)
        for li, l in enumerate(hbm_list):
            d = dils[l]
            Lbuf = 2 * d
            for tap, need in ((0, 2 * d), (1, d)):
                # tap0 = x(t+1-2d) at slot (t+1) mod 2d;
                # tap1 = x(t+1-d) at slot (t+1+d) mod 2d
                slot = jax.lax.rem(t + 1 + tap * d, Lbuf)

                @pl.when((t + 1 >= need) & (t + 1 < T))
                def _(li=li, l=l, tap=tap, slot=slot):
                    pltpu.make_async_copy(
                        hbm_ring.at[hbm_off[l] + slot],
                        rstage[l].at[pn * 2 + tap],
                        rsem[l].at[tap, pn],
                    ).start()

        if scalar:
            # scalar input: x (B, 1) @ W1 (1, C); W1/x kept f32 — bf16 on
            # the raw waveform value would quantize the AR signal itself
            if teacher:
                x_in = teach_ref[0, 0, :][:, None].astype(jnp.float32)  # (B, 1)
            else:
                x_in = prev_ref[:]
            h = jnp.dot(x_in, w1_ref[:], preferred_element_type=acc) + b1_ref[:][None, :]
        else:
            if teacher:
                x_onehot = jax.nn.one_hot(teach_ref[0, 0, :], O, dtype=store)  # (B, O)
            else:
                x_onehot = prev_ref[:]
            # first 1x1: one-hot @ W1 (row gather via matmul — MXU friendly)
            h = jnp.dot(x_onehot, w1_ref[:], preferred_element_type=acc) + b1_ref[:][None, :]

        skip_acc = jnp.zeros((B, S), acc)
        for l in range(L):
            d = dils[l]
            Lbuf = 2 * d
            h_in = h
            # taps: x(t-2d) at slot t mod 2d (about to be overwritten),
            # x(t-d) at slot (t-d) mod 2d
            s0 = jax.lax.rem(t, Lbuf)
            if l in hbm_set:
                li = hbm_list.index(l)
                for tap, need in ((0, 2 * d), (1, d)):
                    @pl.when(t >= need)
                    def _(li=li, tap=tap):
                        pltpu.make_async_copy(
                            hbm_ring.at[hbm_off[l]],  # shape only matters for wait
                            rstage[l].at[p * 2 + tap],
                            rsem[l].at[tap, p],
                        ).wait()

                    @pl.when(t < need)
                    def _(l=l, tap=tap):
                        rstage[l][pl.ds(p * 2 + tap, 1)] = jnp.zeros((1, B, C), store)
                tap0 = rstage[l][pl.ds(p * 2, 1)][0]
                tap1 = rstage[l][pl.ds(p * 2 + 1, 1)][0]
            else:
                s1 = jax.lax.rem(t + d, Lbuf)  # (t-d) mod 2d == (t+d) mod 2d
                tap0 = bufs[l][pl.ds(s0, 1), :, :][0]
                tap1 = bufs[l][pl.ds(s1, 1), :, :][0]
            ab = (
                jnp.dot(tap0, wconv_ref[l, 0], preferred_element_type=acc)
                + jnp.dot(tap1, wconv_ref[l, 1], preferred_element_type=acc)
                + jnp.dot(h_in.astype(store), wconv_ref[l, 2], preferred_element_type=acc)
                + bconv_ref[l][None, :]
            )
            if has_c:
                ab = ab + jnp.dot(ct_ref[0], wc_ref[l], preferred_element_type=acc)
            if has_g:
                ab = ab + gadd_ref[l]
            act = (jnp.tanh(ab[:, :G2]) * jax.nn.sigmoid(ab[:, G2:])).astype(store)
            skip_acc = skip_acc + (
                jnp.dot(act, wskip_ref[l], preferred_element_type=acc) + bskip_ref[l][None, :]
            )
            out = jnp.dot(act, wout_ref[l], preferred_element_type=acc) + bout_ref[l][None, :]
            # write current input into its slot (read-before-write done)
            if l in hbm_set:
                li = hbm_list.index(l)
                wstage[l][pl.ds(p, 1)] = h_in[None].astype(store)
                pltpu.make_async_copy(
                    wstage[l].at[p], hbm_ring.at[hbm_off[l] + s0], wsem[l].at[p]
                ).start()
            else:
                bufs[l][pl.ds(s0, 1), :, :] = h_in[None].astype(bufs[l].dtype)
            h = (out + h_in) * res_scale

        # drain in-flight writes before the kernel retires: at t == T-1 the
        # writes from steps T-1 (parity p) and T-2 (parity pn) are unwaited
        for li, l in enumerate(hbm_list):
            @pl.when(t == T - 1)
            def _(li=li, l=l):
                pltpu.make_async_copy(
                    wstage[l].at[0], hbm_ring.at[hbm_off[l]], wsem[l].at[p]
                ).wait()
                if T >= 2:
                    pltpu.make_async_copy(
                        wstage[l].at[0], hbm_ring.at[hbm_off[l]], wsem[l].at[pn]
                    ).wait()

        x = jax.nn.relu(skip_acc * skip_scale).astype(store)
        x = jax.nn.relu(
            jnp.dot(x, wp1_ref[:], preferred_element_type=acc) + bp1_ref[:][None, :]
        ).astype(store)
        logits = jnp.dot(x, wp2_ref[:], preferred_element_type=acc) + bp2_ref[:][None, :]
        logits_ref[0] = logits

        def _uniform(shape, lo=1e-5):
            # TPU PRNG bits -> U[lo, 1-lo); the reference's samplers draw
            # uniforms in (1e-5, 1-1e-5) (mixture.py:131,147)
            bits = pltpu.prng_random_bits(shape)
            u = bits.astype(jnp.float32) * (1.0 / 4294967296.0) + 0.5  # [0,1)
            return u * (1.0 - 2.0 * lo) + lo

        if scalar:
            # in-kernel MoL / MoG sampling — exact mixture.py:118-156 /
            # 221-270 numerics (Gumbel-argmax mixture pick over raw
            # logit_probs, logistic inverse-CDF or Box–Muller noise)
            M = O // 3
            lp = logits[:, :M]
            gum = -jnp.log(-jnp.log(_uniform((B, M))))
            pick = jnp.argmax(lp + gum, axis=-1)  # (B,)
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (B, M), 1) == pick[:, None]
            ).astype(jnp.float32)
            means = jnp.sum(logits[:, M : 2 * M] * oh, axis=-1)
            log_s = jnp.sum(logits[:, 2 * M : 3 * M] * oh, axis=-1)
            if net.output_distribution == "Logistic":
                u2 = _uniform((B, 1))[:, 0]
                noise = jnp.log(u2) - jnp.log(1.0 - u2)
            else:  # Normal: Box–Muller
                u12 = _uniform((B, 2), lo=1e-7)
                noise = jnp.sqrt(-2.0 * jnp.log(u12[:, 0])) * jnp.cos(
                    2.0 * math.pi * u12[:, 1]
                )
            xs = jnp.clip(means + jnp.exp(log_s) * noise, -1.0, 1.0)
            codes_ref[0, 0] = xs
            prev_ref[:] = xs[:, None]
        else:
            # categorical sample via Gumbel-argmax over logits
            u = _uniform((B, O), lo=1e-7)
            gumbel = -jnp.log(-jnp.log(u))
            idx = jnp.argmax(
                jax.nn.log_softmax(logits, axis=-1) + gumbel, axis=-1
            ).astype(jnp.int32)
            codes_ref[0, 0] = idx
            prev_ref[:] = jax.nn.one_hot(idx, O, dtype=store)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("net", "T", "teacher", "interpret", "dtype_str", "hbm_min_dilation"),
)
def wavenet_decode_pallas(
    net,
    packed: dict,
    T: int,
    seed,
    c_up: jnp.ndarray | None = None,
    g_add: jnp.ndarray | None = None,
    teach: jnp.ndarray | None = None,
    teacher: bool = False,
    interpret: bool = False,
    dtype_str: str = "float32",
    hbm_min_dilation: int | None = None,
):
    """Run the fused decode. Args:

    packed: from :func:`pack_decode_weights`.
    c_up: (B, T, cin) upsampled conditioning (or None).
    g_add: (L, B, G) precomputed per-layer global-conditioning addends.
    teach: (B, T) int codes when teacher (forced inputs).
    hbm_min_dilation: layers with dilation >= this keep their ring buffer in
        HBM (double-buffered DMA prefetch) instead of VMEM. The top four
        dilations per stack hold 94% of the ring-buffer bytes, so this lifts
        the VMEM batch ceiling (32 at the default f32/VMEM layout) to 128+.
        None = all buffers VMEM-resident. Hazard analysis for the prefetch
        schedule (all (mod 2d) slot-collision cases) requires >= 4.
    Returns (codes (B, T) int32, logits (B, T, O)) on the mu-law-quantize
    path, or (samples (B, T) float32 in [-1, 1], mixture params (B, T, O))
    on the scalar-input path (raw / mulaw: in-kernel MoL or MoG sampling,
    reference ``wavenet.py:325-338``).
    """
    acc = jnp.float32
    store = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    scalar = net.scalar_input
    has_c = c_up is not None
    has_g = g_add is not None
    if has_c:
        B = c_up.shape[0]
    elif teach is not None:
        B = teach.shape[0]
    else:
        B = 1
    # TPU tiling: sublane dims must be multiples of 8 — pad the batch
    B0 = B
    B = max(8, ((B + 7) // 8) * 8)
    if B != B0:
        if has_c:
            c_up = jnp.pad(c_up, ((0, B - B0), (0, 0), (0, 0)))
        if has_g:
            g_add = jnp.pad(g_add, ((0, 0), (0, B - B0), (0, 0)))
        if teach is not None:
            teach = jnp.pad(teach, ((0, B - B0), (0, 0)))
    L, C = net.layers, net.residual_channels
    O = net.out_channels
    if hbm_min_dilation is not None:
        assert hbm_min_dilation >= 4
        hbm_layers = tuple(
            l for l in range(L) if net.dilation(l) >= hbm_min_dilation
        )
    else:
        hbm_layers = ()
    hbm_set = frozenset(hbm_layers)

    kernel = _mk_kernel(net, B, T, teacher, has_c, has_g, acc, store, hbm_layers)

    def resident(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda t: (0,) * nd, memory_space=pltpu.VMEM)

    in_specs = [
        resident(packed["w1"].shape),
        resident(packed["b1"].shape),
        resident(packed["wconv"].shape),
        resident(packed["bconv"].shape),
        resident(packed["wout"].shape),
        resident(packed["bout"].shape),
        resident(packed["wskip"].shape),
        resident(packed["bskip"].shape),
        resident(packed["wp1"].shape),
        resident(packed["bp1"].shape),
        resident(packed["wp2"].shape),
        resident(packed["bp2"].shape),
    ]
    def _w(a):  # weights in storage dtype, biases stay f32
        return a.astype(store)

    # scalar path: W1 is (1, C) and multiplies the raw waveform value —
    # keep it f32 so bf16 storage mode doesn't quantize the AR signal
    w1 = packed["w1"].astype(jnp.float32) if scalar else _w(packed["w1"])
    inputs = [
        w1, packed["b1"], _w(packed["wconv"]), packed["bconv"],
        _w(packed["wout"]), packed["bout"], _w(packed["wskip"]), packed["bskip"],
        _w(packed["wp1"]), packed["bp1"], _w(packed["wp2"]), packed["bp2"],
    ]
    if has_c:
        in_specs.append(resident(packed["wc"].shape))
        inputs.append(_w(packed["wc"]))
        cin = c_up.shape[-1]
        c_t = jnp.swapaxes(c_up, 0, 1).astype(store)  # (T, B, cin)
        in_specs.append(
            pl.BlockSpec((1, B, cin), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
        )
        inputs.append(c_t)
    if has_g:
        in_specs.append(resident(g_add.shape))
        inputs.append(g_add.astype(acc))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    inputs.append(jnp.asarray(seed, jnp.int32).reshape(1))
    if teacher:
        assert teach is not None
        in_specs.append(
            pl.BlockSpec((1, 1, B), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
        )
        teach_dt = jnp.float32 if scalar else jnp.int32
        inputs.append(jnp.swapaxes(teach.astype(teach_dt), 0, 1)[:, None, :])
    if hbm_layers:
        # One concatenated HBM ring arena for all HBM layers. Contents are
        # never read before being written *this run* (reads of
        # x(t-d)/x(t-2d) are masked to zero for t < d / t < 2d), so the
        # zeros are only a safety net.
        tot = sum(2 * net.dilation(l) for l in hbm_layers)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM))
        inputs.append(jnp.zeros((tot, B, C), store))

    scratch = [
        pltpu.VMEM((2 * net.dilation(i), B, C), store)
        for i in range(L)
        if i not in hbm_set
    ] + [pltpu.VMEM((B, 1), jnp.float32) if scalar else pltpu.VMEM((B, O), store)]
    for _ in hbm_layers:
        scratch.append(pltpu.VMEM((4, B, C), store))  # read stage
        scratch.append(pltpu.VMEM((2, B, C), store))  # write stage
        scratch.append(pltpu.SemaphoreType.DMA((2, 2)))  # read sems [tap, parity]
        scratch.append(pltpu.SemaphoreType.DMA((2,)))    # write sems [parity]

    codes, logits = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, B), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, O), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, 1, B), jnp.float32 if scalar else jnp.int32),
            jax.ShapeDtypeStruct((T, B, O), acc),
        ),
        scratch_shapes=scratch,
        # weights (~28 MB f32) + ring buffers stay VMEM-resident across the
        # sequential grid: raise the scoped-vmem ceiling (v5e: 128 MB phys)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024),
        # plain HLO interpret lacks the TPU PRNG primitives; use the TPU
        # interpreter for CPU tests
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*inputs)
    codes = jnp.swapaxes(codes[:, 0, :], 0, 1)[:B0]
    return codes, jnp.swapaxes(logits, 0, 1)[:B0]


def precompute_g_add(net, params: dict, g) -> jnp.ndarray | None:
    """(L, B, G): per-layer global-conditioning addends — constant over
    time, so computed once outside the kernel."""
    if g is None or net.gin_channels <= 0:
        return None
    g_feat = net._global_features(params, jnp.asarray(g))
    adds = []
    for i in range(net.layers):
        wg = conv1d_weight(params["layers"][i]["gproj"])[0]
        adds.append(jnp.dot(g_feat, wg))
    return jnp.stack(adds)
