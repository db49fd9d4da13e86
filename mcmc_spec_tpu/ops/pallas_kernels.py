"""Pallas TPU kernels for the likelihood hot path.

``spectrum_chi2`` fuses the entire per-walker spectrum-statistics block —
the part of the log-likelihood that XLA executes slowest — into one kernel
that keeps a walker block resident in VMEM:

    model = Wcomb @ D            (MXU; D stays in VMEM across the grid)
    model *= 10^(-0.4 Av k(lam)) (VPU)
    alpha = median(data)/median(model)
    data_renorm = data / polyfit2(data / (alpha model))
    chi = mean(((alpha model - data_renorm)/err)^2)

The median is the reference's exact ``np.median`` (mean of the two middle
order statistics) computed by **radix binary search on the float bit pattern**
instead of a sort: model fluxes are non-negative by construction (tent blend
weights and component scales are >= 0), so the IEEE-754 bit pattern of an f32
is monotone in its value and the k-th order statistic is found in 31
count-compare passes over the VMEM-resident block — no XLA sort (which costs
~2.5 ms per 4096x1792 block on v5e; this kernel's whole body costs ~1 ms).

A pure-XLA fallback with identical semantics lives in
``mcmc_spec_tpu.inference.batched``; ``interpret=True`` is used on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN10_04 = -0.4 * 2.302585092994046  # -0.4 * ln(10)
_F32_INF_BITS = 0x7F800000


def _median_iters() -> int:
    """Radix-median pass count: 31 = exact; MCMC_SPEC_FAST_MEDIAN=1 -> 20
    (relative alpha error < 2e-4, an opt-in throughput mode)."""
    import os

    return 20 if os.environ.get("MCMC_SPEC_FAST_MEDIAN") == "1" else 31


def _row_order_stat_bits(mi, rank, iters: int = 31):
    """Smallest int32 bit-value v per row with count(mi <= v) >= rank.

    ``mi``: [B, nd] int32 bit patterns of non-negative f32 (monotone order).
    ``iters=31`` fixed binary-search iterations cover the full bit range
    exactly; fewer iterations return the interval's upper bound.
    """
    B = mi.shape[0]
    lo = jnp.zeros((B, 1), jnp.int32)
    hi = jnp.full((B, 1), _F32_INF_BITS, jnp.int32)

    def body(_, carry):
        lo, hi = carry
        mid = lo + ((hi - lo) >> 1)
        cnt = jnp.sum((mi <= mid).astype(jnp.int32), axis=1, keepdims=True)
        ge = cnt >= rank
        return jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return hi


def _row_median_nonneg(model, iters: int = 31):
    """np.median along axis 1 for non-negative f32 rows, sort-free.

    ``iters=31`` is exact (the full non-negative bit range is 2^31).  Smaller
    values trade accuracy for passes: the result is within ``2^(8-iters)``
    relative of the true median (an opt-in fast mode; the median only sets the
    global spectrum scale alpha, so sub-0.1%% error is far below posterior
    noise).
    """
    nd = model.shape[1]
    r1 = (nd + 1) // 2  # 1-based rank of lower middle
    mi = jax.lax.bitcast_convert_type(model, jnp.int32)
    v1 = _row_order_stat_bits(mi, r1, iters)
    x1 = jax.lax.bitcast_convert_type(v1, jnp.float32)  # [B,1]
    if iters < 31:
        return x1  # approximate: skip the exact upper-middle refinement
    if nd % 2 == 1:
        return x1
    # upper middle: equal to x1 if it repeats past rank r1, else the next
    # larger element (one masked-min pass)
    cnt1 = jnp.sum((mi <= v1).astype(jnp.int32), axis=1, keepdims=True)
    bigger = jnp.where(mi > v1, model, jnp.inf)
    x2 = jnp.min(bigger, axis=1, keepdims=True)
    x2 = jnp.where(cnt1 >= r1 + 1, x1, x2)
    return 0.5 * (x1 + x2)


def _split3(x):
    """3-way bf16 decomposition of f32: x ~= hi + mid + lo (each exact bf16)."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    r = x - hi
    mid = r.astype(jnp.bfloat16).astype(jnp.float32)
    lo = (r - mid).astype(jnp.bfloat16).astype(jnp.float32)
    return hi, mid, lo


def _dot_f32(a, b):
    """Full-f32-accurate MXU matmul inside Mosaic.

    Mosaic lowers an f32 ``jnp.dot`` to a *single* bf16 MXU pass (~2.5e-3
    relative error) regardless of the precision hint, so emulate the classic
    bf16x6 scheme explicitly: split both operands into 3 bf16 terms and sum
    the 6 significant cross products (~2.5e-7 relative error).
    """
    ah, am, al = _split3(a)
    bh, bm, bl = _split3(b)
    d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
    out = d(al, bh)
    out += d(am, bm)
    out += d(ah, bl)
    out += d(am, bh)
    out += d(ah, bm)
    out += d(ah, bh)
    return out


def _spectrum_chi2_kernel(
    medd_ref,  # [1,1] SMEM: median(data)
    Wc_ref,  # [B, NO]
    av_ref,  # [B, 1]
    D_ref,  # [NO, nd]
    kd_ref,  # [1, nd]
    data_ref,  # [1, nd]
    err_ref,  # [1, nd]
    VpinvT_ref,  # [3, nd]
    VT_ref,  # [3, nd]
    out_ref,  # [B, 1]
):
    model = _dot_f32(Wc_ref[:], D_ref[:])
    av = av_ref[:]  # [B,1]
    trans = jnp.where(av > 0, jnp.exp(LN10_04 * av * kd_ref[:]), 1.0)
    model = model * trans

    med = _row_median_nonneg(model, iters=_median_iters())  # [B,1]
    model = model * (medd_ref[0, 0] / med)

    # continuum renorm on the VPU in exact f32 (the K=3 / N=3 contractions
    # would round through bf16 on the MXU); both matrices arrive as [3, nd]
    frac = data_ref[:] / model  # [B, nd]
    Vp = VpinvT_ref[:]  # [3, nd]
    c0 = jnp.sum(frac * Vp[0][None, :], axis=1, keepdims=True)
    c1 = jnp.sum(frac * Vp[1][None, :], axis=1, keepdims=True)
    c2 = jnp.sum(frac * Vp[2][None, :], axis=1, keepdims=True)
    VT = VT_ref[:]  # [3, nd]
    fitted = c0 * VT[0][None, :] + c1 * VT[1][None, :] + c2 * VT[2][None, :]
    data_renorm = data_ref[:] / fitted
    resid = (model - data_renorm) / err_ref[:]
    out_ref[:] = jnp.mean(resid * resid, axis=1, keepdims=True)


def _spectrum_chi2_fleet_kernel(
    Wc_ref,  # [B, NO]
    av_ref,  # [B, 1]
    meta_f_ref,  # [B, 2]: (med_data, 1/n_true)
    rank_ref,  # [B, 2] int32: (r1, r2) 1-based median ranks
    D_ref,  # [1, NO, nd]   (per-target block)
    kd_ref,  # [1, 1, nd]
    data_ref,  # [1, 1, nd]
    err_ref,  # [1, 1, nd]
    VpinvT_ref,  # [1, 3, nd]
    VT_ref,  # [1, 3, nd]
    out_ref,  # [B, 1]
):
    """Fleet variant: per-row median ranks / counts (targets are padded)."""
    model = _dot_f32(Wc_ref[:], D_ref[0])
    av = av_ref[:]
    trans = jnp.where(av > 0, jnp.exp(LN10_04 * av * kd_ref[0]), 1.0)
    model = model * trans

    mi = jax.lax.bitcast_convert_type(model, jnp.int32)
    r1 = rank_ref[:, 0][:, None]
    r2 = rank_ref[:, 1][:, None]
    it = _median_iters()
    v1 = _row_order_stat_bits(mi, r1, it)
    x1 = jax.lax.bitcast_convert_type(v1, jnp.float32)
    if it < 31:
        med = x1
    else:
        cnt1 = jnp.sum((mi <= v1).astype(jnp.int32), axis=1, keepdims=True)
        bigger = jnp.where(mi > v1, model, jnp.inf)
        x2 = jnp.where(cnt1 >= r2, x1, jnp.min(bigger, axis=1, keepdims=True))
        med = 0.5 * (x1 + x2)

    med_data = meta_f_ref[:, 0][:, None]
    inv_n = meta_f_ref[:, 1][:, None]
    model = model * (med_data / med)

    frac = data_ref[0] / model
    Vp = VpinvT_ref[0]
    c0 = jnp.sum(frac * Vp[0][None, :], axis=1, keepdims=True)
    c1 = jnp.sum(frac * Vp[1][None, :], axis=1, keepdims=True)
    c2 = jnp.sum(frac * Vp[2][None, :], axis=1, keepdims=True)
    VT = VT_ref[0]
    fitted = c0 * VT[0][None, :] + c1 * VT[1][None, :] + c2 * VT[2][None, :]
    data_renorm = data_ref[0] / fitted
    resid = (model - data_renorm) / err_ref[0]  # padded points: /inf -> 0
    out_ref[:] = jnp.sum(resid * resid, axis=1, keepdims=True) * inv_n


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def spectrum_chi2_fleet(
    Wcomb,  # [ntgt, nw, NO]
    av,  # [ntgt, nw]
    D,  # [ntgt, NO, nd]
    ext_k_data,  # [ntgt, nd]
    data_flux,  # [ntgt, nd]
    data_err,  # [ntgt, nd]
    V,  # [ntgt, nd, 3]
    Vpinv,  # [ntgt, 3, nd]
    med_data,  # [ntgt]
    n_data_true,  # [ntgt] int
    block: int = 512,
    interpret: bool = False,
):
    """Fleet spectrum chi^2: per-target D/data blocks, per-row median ranks.

    Returns [ntgt, nw].  ``nw`` must be divisible by ``block`` (or small
    enough to use a single block per target).
    """
    ntgt, nw, NO = Wcomb.shape
    nd = D.shape[2]
    if nd > 3000:
        block = min(block, 256)
    if nw % block != 0:
        block = nw
    bpt = nw // block  # blocks per target
    f32 = jnp.float32

    n_true = n_data_true.astype(jnp.int32)
    r1 = (n_true + 1) // 2
    r2 = n_true // 2 + 1
    ranks = jnp.broadcast_to(
        jnp.stack([r1, r2], axis=-1)[:, None, :], (ntgt, nw, 2)
    ).reshape(ntgt * nw, 2)
    meta_f = jnp.broadcast_to(
        jnp.stack([med_data.astype(f32), 1.0 / n_true.astype(f32)], axis=-1)[:, None, :],
        (ntgt, nw, 2),
    ).reshape(ntgt * nw, 2)

    out = pl.pallas_call(
        _spectrum_chi2_fleet_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(ntgt * bpt,),
            in_specs=[
                pl.BlockSpec((block, NO), lambda i: (i, 0)),
                pl.BlockSpec((block, 1), lambda i: (i, 0)),
                pl.BlockSpec((block, 2), lambda i: (i, 0)),
                pl.BlockSpec((block, 2), lambda i: (i, 0)),
                pl.BlockSpec((1, NO, nd), lambda i: (i // bpt, 0, 0)),
                pl.BlockSpec((1, 1, nd), lambda i: (i // bpt, 0, 0)),
                pl.BlockSpec((1, 1, nd), lambda i: (i // bpt, 0, 0)),
                pl.BlockSpec((1, 1, nd), lambda i: (i // bpt, 0, 0)),
                pl.BlockSpec((1, 3, nd), lambda i: (i // bpt, 0, 0)),
                pl.BlockSpec((1, 3, nd), lambda i: (i // bpt, 0, 0)),
            ],
            out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((ntgt * nw, 1), f32),
        interpret=interpret,
    )(
        Wcomb.astype(f32).reshape(ntgt * nw, NO),
        av.astype(f32).reshape(ntgt * nw, 1),
        meta_f,
        ranks,
        D.astype(f32),
        ext_k_data.astype(f32).reshape(ntgt, 1, nd),
        data_flux.astype(f32).reshape(ntgt, 1, nd),
        data_err.astype(f32).reshape(ntgt, 1, nd),
        Vpinv.astype(f32),  # [ntgt, 3, nd]
        jnp.swapaxes(V.astype(f32), 1, 2),  # [ntgt, 3, nd]
    )
    return out.reshape(ntgt, nw)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def spectrum_chi2(
    Wcomb, av, D_flat, ext_k_data, data_flux, data_err, V, Vpinv, med_data,
    block: int = 512, interpret: bool = False,
):
    """Fused per-walker spectrum chi^2 (mean over data points).

    Args:
        Wcomb: [NW, NO] combined grid-point weights (scales folded in).
        av: [NW] extinction values.
        D_flat: [NO, nd] grid projected onto the data wavelengths.
        ext_k_data: [nd] CCM89 A/Av at the data wavelengths.
        data_flux, data_err: [nd].
        V: [nd, 3] scaled-domain Vandermonde; Vpinv: [3, nd].
        med_data: scalar median of data_flux.
        block: walkers per grid step (VMEM-resident block).
    Returns: [NW] mean spectrum chi^2 (unweighted).
    """
    NW, NO = Wcomb.shape
    nd = D_flat.shape[1]
    if nd > 3000:
        block = min(block, 256)  # keep ~4 block-sized temporaries in VMEM
    if NW % block != 0:
        block = NW  # degenerate small batches: single block
    f32 = jnp.float32
    grid = (NW // block,)

    out = pl.pallas_call(
        _spectrum_chi2_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((block, NO), lambda i: (i, 0)),
                pl.BlockSpec((block, 1), lambda i: (i, 0)),
                pl.BlockSpec((NO, nd), lambda i: (0, 0)),
                pl.BlockSpec((1, nd), lambda i: (0, 0)),
                pl.BlockSpec((1, nd), lambda i: (0, 0)),
                pl.BlockSpec((1, nd), lambda i: (0, 0)),
                pl.BlockSpec((3, nd), lambda i: (0, 0)),
                pl.BlockSpec((3, nd), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((NW, 1), f32),
        interpret=interpret,
    )(
        jnp.asarray(med_data, f32).reshape(1, 1),
        Wcomb.astype(f32),
        av.astype(f32).reshape(NW, 1),
        D_flat.astype(f32),
        ext_k_data.astype(f32).reshape(1, nd),
        data_flux.astype(f32).reshape(1, nd),
        data_err.astype(f32).reshape(1, nd),
        Vpinv.astype(f32),
        V.T.astype(f32),
    )
    return out[:, 0]
