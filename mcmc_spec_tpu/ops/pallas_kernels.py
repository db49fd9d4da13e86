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


def resolve_dials(tgt) -> tuple:
    """(median_iters, matmul_passes, recip_newton) pack-time statics off a
    PackedTarget.

    The accuracy dials are resolved EXACTLY ONCE, at target-pack time
    (``pack_target`` stamps them from :mod:`mcmc_spec_tpu.utils.flags`); the
    kernels never read the environment at trace time.  A trace-time env read
    was the round-2 footgun — the jit cache is keyed only on shapes/statics,
    so flipping the env var mid-process silently did nothing — and round 4
    removed the fallback entirely: an unset dial raises here instead of
    quietly resolving the env.  (``recip_newton``'s unset sentinel is -1; 0
    is a valid stamped value meaning exact divides.)
    """
    it = getattr(tgt, "median_iters", 0)
    mm = getattr(tgt, "matmul_passes", 0)
    rn = getattr(tgt, "recip_newton", -1)
    if it <= 0 or mm not in (1, 3, 6) or rn < 0:
        raise ValueError(
            "PackedTarget accuracy dials unset "
            f"(median_iters={it}, matmul_passes={mm}, recip_newton={rn}): "
            "targets must come from pack_target(), which stamps the dials at "
            "pack time (utils.flags); the trace-time env fallback was removed "
            "in round 4 — pass iters/mm_passes/recip explicitly for "
            "hand-built targets."
        )
    return it, mm, rn


def _require_dials(iters, mm_passes, recip) -> tuple:
    """Validate explicitly-threaded kernel dials; None is an error.

    The kernel wrappers used to resolve ``None`` from the environment at
    trace time (the round-2 footgun, lurking for direct callers after round
    3 moved production paths to pack-time statics).  Round 4 deleted that
    path: callers thread the pack-time values (``resolve_dials``) or choose
    explicitly.  Enforces the same value ranges as ``resolve_dials`` — an
    out-of-range dial (iters<=0 runs zero rank-search passes and returns
    the untouched initial bit interval's midpoint) must fail loudly, not
    produce silently-wrong chi^2."""
    if iters is None or mm_passes is None or recip is None:
        raise ValueError(
            "spectrum kernels require explicit accuracy dials "
            f"(got iters={iters}, mm_passes={mm_passes}, recip={recip}); "
            "thread PackedTarget's pack-time statics (resolve_dials(tgt)) or "
            "pass values explicitly — the trace-time env fallback was "
            "removed in round 4."
        )
    iters, mm_passes, recip = int(iters), int(mm_passes), int(recip)
    if iters <= 0 or mm_passes not in (1, 3, 6) or recip < 0:
        raise ValueError(
            "spectrum kernel dials out of range "
            f"(iters={iters}, mm_passes={mm_passes}, recip={recip}): "
            "need iters >= 1 rank-search passes, mm_passes in {1, 3, 6} "
            "(the only bf16-split schedules _dot_f32 implements), recip >= 0."
        )
    return iters, mm_passes, recip


_RECIP_MAGIC = 0x7EF311C3  # optimal-ish 1/x seed constant (Blinn-style)


def _fast_recip(x, newton: int):
    """Integer-magic reciprocal seed + Newton refinement (f32).

    ``bitcast(0x7EF311C3 - bitcast(x))`` approximates 1/x to ~4% for normal
    f32; each Newton step ``r*(2-x*r)`` squares the relative error
    (2 steps ~1e-5).  Costs ~1+3n vector ops vs Mosaic's ``arith.divf``
    lowering, and measured consistently FASTER at n=2 in the full spectrum
    kernel (scripts/try_fast_recip.py: 1.045-1.08x; n=1 was NOT faster than
    n=2 and is diagnostic only).

    NEGATIVE x is handled correctly for free: int32 subtraction wraps
    (two's complement), and ``-0x80000000 == +0x80000000 (mod 2^32)``
    carries the sign bit through the magic subtraction intact — the seed
    for ``-x`` is exactly ``-seed(x)`` (pinned by
    tests/test_pallas_kernel.py with negative denominators; real spectra
    can dip negative from noise, so ``frac``/``fitted`` may too).
    Non-finite or zero denominators degrade the same way the divide does:
    the result overflows/NaNs and the posterior's NaN -> -inf handling
    rejects the walker either way.
    """
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    r = jax.lax.bitcast_convert_type(jnp.int32(_RECIP_MAGIC) - xi, jnp.float32)
    for _ in range(newton):
        r = r * (2.0 - x * r)
    return r


def _div(num, den, recip: int):
    """num/den, exact (recip=0) or via the magic-seed reciprocal."""
    if recip == 0:
        return num / den
    return num * _fast_recip(den, recip)


def _row_order_stat_bits(mi, rank, iters: int = 31, midpoint: bool = False):
    """Smallest int32 bit-value v per row with count(mi <= v) >= rank.

    ``mi``: [B, nd] int32 bit patterns of non-negative f32 (monotone order).
    ``iters=31`` fixed binary-search iterations cover the full bit range
    exactly.  Fewer iterations leave a ``2^(31-iters)``-wide bit interval
    [lo, hi] that brackets the order statistic: by default the upper bound
    is returned (a one-sided overestimate); ``midpoint=True`` returns the
    interval midpoint instead, which HALVES the worst-case error and
    removes the systematic sign for free (two scalar [B,1] ops) — used by
    the fast-median modes.
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
    if midpoint:
        return lo + ((hi - lo) >> 1)
    return hi


def _row_median_nonneg(model, iters: int = 31):
    """np.median along axis 1 for non-negative f32 rows, sort-free.

    ``iters=31`` is exact (the full non-negative bit range is 2^31).  Smaller
    values trade accuracy for passes: the rank search is within
    ``2^(8-iters)`` relative, plus (for even rows) half the gap between the
    two middle order statistics, whose exact averaging fast mode skips.
    The production default pass count lives in ONE place —
    :func:`mcmc_spec_tpu.utils.flags.median_iters` — with the measured
    accuracy/throughput receipts; callers thread it via pack-time statics
    (``PackedTarget.median_iters``).
    """
    nd = model.shape[1]
    r1 = (nd + 1) // 2  # 1-based rank of lower middle
    mi = jax.lax.bitcast_convert_type(model, jnp.int32)
    v1 = _row_order_stat_bits(mi, r1, iters, midpoint=iters < 31)
    x1 = jax.lax.bitcast_convert_type(v1, jnp.float32)  # [B,1]
    if iters < 31:
        return x1  # approximate: bracket midpoint, no upper-middle refinement
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


def _dot_f32(a, b, passes: int = 6):
    """f32-accurate MXU matmul inside Mosaic via split-bf16 passes.

    Mosaic lowers an f32 ``jnp.dot`` to a *single* bf16 MXU pass (~2.5e-3
    relative error) regardless of the precision hint, so emulate f32
    explicitly: split both operands into 3 bf16 terms and sum the cross
    products.  ``passes=6`` keeps every term to O(eps^2) (~2.5e-7 relative);
    ``passes=3`` drops the three O(eps^2) terms (~3e-4 relative on the
    log-posterior, measured <= 0.006 sigma end-to-end posterior impact —
    scripts/matmul_passes_impact.py — the production default); ``passes=1``
    is raw bf16 (too coarse for chi^2; diagnostic only).
    """
    d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
    if passes == 1:
        return d(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))
    ah, am, al = _split3(a)
    bh, bm, bl = _split3(b)
    if passes == 3:
        out = d(am, bh)
        out += d(ah, bm)
        out += d(ah, bh)
        return out
    out = d(al, bh)
    out += d(am, bm)
    out += d(ah, bl)
    out += d(am, bh)
    out += d(ah, bm)
    out += d(ah, bh)
    return out


def _spectrum_block(Wcomb, av, D, kd, data, inv_err, VpinvT, VT, med_data, iters,
                    mm_passes=6, renorm=True, recip=0):
    """Shared spectrum-statistics body: model, extinction, median match,
    continuum renorm, mean chi^2.  All operands VMEM-resident.

    ``inv_err`` is 1/err precomputed host/XLA-side: a [B, nd] VPU divide per
    eval replaced by a multiply (padded fleet errors are inf -> inv 0, so
    padded residuals stay exactly zero).

    ``renorm=False`` is the ANNEALER scoring (``fit_spec``,
    mft6.py:1007-1014): median match only, chi^2 against the raw data —
    stage 1 never applies the deg-2 continuum renorm."""
    model = _dot_f32(Wcomb, D, mm_passes)
    trans = jnp.where(av > 0, jnp.exp(LN10_04 * av * kd), 1.0)
    model = model * trans

    med = _row_median_nonneg(model, iters=iters)  # [B,1]
    model = model * (med_data / med)

    if renorm:
        frac = _div(data, model, recip)  # [B, nd]
        c0 = jnp.sum(frac * VpinvT[0][None, :], axis=1, keepdims=True)
        c1 = jnp.sum(frac * VpinvT[1][None, :], axis=1, keepdims=True)
        c2 = jnp.sum(frac * VpinvT[2][None, :], axis=1, keepdims=True)
        fitted = c0 * VT[0][None, :] + c1 * VT[1][None, :] + c2 * VT[2][None, :]
        data_renorm = _div(data, fitted, recip)
    else:
        data_renorm = data
    resid = (model - data_renorm) * inv_err
    return jnp.mean(resid * resid, axis=1, keepdims=True)


def _spectrum_chi2_kernel(
    medd_ref,  # [1,1] SMEM: median(data)
    Wc_ref,  # [B, NO]
    av_ref,  # [B, 1]
    D_ref,  # [NO, nd]
    kd_ref,  # [1, nd]
    data_ref,  # [1, nd]
    inv_err_ref,  # [1, nd] 1/err
    VpinvT_ref,  # [3, nd]
    VT_ref,  # [3, nd]
    out_ref,  # [B, 1]
    *,
    iters,
    mm_passes,
    renorm,
    recip,
):
    # continuum renorm runs on the VPU in exact f32 (the K=3 / N=3
    # contractions would round through bf16 on the MXU); V matrices arrive
    # pre-transposed as [3, nd]
    out_ref[:] = _spectrum_block(
        Wc_ref[:], av_ref[:], D_ref[:], kd_ref[:], data_ref[:], inv_err_ref[:],
        VpinvT_ref[:], VT_ref[:], medd_ref[0, 0], iters, mm_passes,
        renorm=renorm, recip=recip,
    )


def _spectrum_chi2_fleet_kernel(
    Wc_ref,  # [B, NO]
    av_ref,  # [B, 1]
    meta_f_ref,  # [B, 2]: (med_data, 1/n_true)
    rank_ref,  # [B, 2] int32: (r1, r2) 1-based median ranks
    D_ref,  # [1, NO, nd]   (per-target block)
    kd_ref,  # [1, 1, nd]
    data_ref,  # [1, 1, nd]
    inv_err_ref,  # [1, 1, nd] 1/err
    VpinvT_ref,  # [1, 3, nd]
    VT_ref,  # [1, 3, nd]
    out_ref,  # [B, 1]
    *,
    iters,
    mm_passes,
    recip,
):
    """Fleet variant: per-row median ranks / counts (targets are padded)."""
    model = _dot_f32(Wc_ref[:], D_ref[0], mm_passes)
    av = av_ref[:]
    trans = jnp.where(av > 0, jnp.exp(LN10_04 * av * kd_ref[0]), 1.0)
    model = model * trans

    mi = jax.lax.bitcast_convert_type(model, jnp.int32)
    r1 = rank_ref[:, 0][:, None]
    r2 = rank_ref[:, 1][:, None]
    it = iters
    v1 = _row_order_stat_bits(mi, r1, it, midpoint=it < 31)
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

    frac = _div(data_ref[0], model, recip)
    Vp = VpinvT_ref[0]
    c0 = jnp.sum(frac * Vp[0][None, :], axis=1, keepdims=True)
    c1 = jnp.sum(frac * Vp[1][None, :], axis=1, keepdims=True)
    c2 = jnp.sum(frac * Vp[2][None, :], axis=1, keepdims=True)
    VT = VT_ref[0]
    fitted = c0 * VT[0][None, :] + c1 * VT[1][None, :] + c2 * VT[2][None, :]
    data_renorm = _div(data_ref[0], fitted, recip)
    resid = (model - data_renorm) * inv_err_ref[0]  # padded: *0 -> 0
    out_ref[:] = jnp.sum(resid * resid, axis=1, keepdims=True) * inv_n


@functools.partial(jax.jit, static_argnames=("block", "interpret", "iters",
                                              "mm_passes", "recip"))
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
    iters: int | None = None,
    mm_passes: int | None = None,
    recip: int | None = None,
):
    """Fleet spectrum chi^2: per-target D/data blocks, per-row median ranks.

    Returns [ntgt, nw].  The walker axis is padded up to a block multiple
    (Mosaic requires row blocks divisible by 8 unless they equal the whole
    array, and per-target blocks never equal the stacked array; a walker
    count above the VMEM cap that isn't a block multiple must NOT fall back
    to one giant block — ~4 [nw, nd] f32 temporaries overflow the ~16 MB
    scoped VMEM); padding rows carry Wcomb=1 so the bit-pattern median
    search stays on positive values, and their outputs are sliced off.

    ``iters``/``mm_passes``/``recip``: REQUIRED accuracy dials (static);
    thread the pack-time values (``resolve_dials(fleet)``).
    """
    iters, mm_passes, recip = _require_dials(iters, mm_passes, recip)
    ntgt, nw, NO = Wcomb.shape
    nd = D.shape[2]
    cap = 256 if nd > 3000 else 512
    block = min(block, cap)
    nw_pad = -(-nw // 8) * 8
    if nw_pad % block != 0:
        if nw_pad <= cap:
            block = nw_pad  # small batch: one (8-multiple) block per target
        else:
            nw_pad = -(-nw_pad // block) * block  # pad up to a block multiple
    if nw_pad != nw:
        pad = ((0, 0), (0, nw_pad - nw), (0, 0))
        Wcomb = jnp.pad(Wcomb, pad, constant_values=1.0)
        av = jnp.pad(av, pad[:2])
    nw_true, nw = nw, nw_pad
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
        functools.partial(_spectrum_chi2_fleet_kernel, iters=iters,
                          mm_passes=mm_passes, recip=recip),
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
        (1.0 / data_err.astype(f32)).reshape(ntgt, 1, nd),
        Vpinv.astype(f32),  # [ntgt, 3, nd]
        jnp.swapaxes(V.astype(f32), 1, 2),  # [ntgt, 3, nd]
    )
    return out.reshape(ntgt, nw)[:, :nw_true]


@functools.partial(jax.jit, static_argnames=("block", "interpret", "iters",
                                              "mm_passes", "renorm", "recip"))
def spectrum_chi2(
    Wcomb, av, D_flat, ext_k_data, data_flux, data_err, V, Vpinv, med_data,
    block: int = 512, interpret: bool = False, iters: int | None = None,
    mm_passes: int | None = None, renorm: bool = True,
    recip: int | None = None,
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
        iters/mm_passes/recip: REQUIRED accuracy dials (static); thread the
            pack-time values (``resolve_dials(tgt)``).
    Returns: [NW] mean spectrum chi^2 (unweighted).

    Walker batches that aren't a block multiple are padded up to one
    (padding rows carry Wcomb=1: positive model flux keeps the bit-pattern
    median search valid) rather than run as one giant block — ~4 [NW, nd]
    f32 temporaries would overflow the ~16 MB scoped VMEM for large NW.
    Batches at or below the VMEM cap run as a single whole-array block.
    """
    iters, mm_passes, recip = _require_dials(iters, mm_passes, recip)
    NW, NO = Wcomb.shape
    nd = D_flat.shape[1]
    cap = 256 if nd > 3000 else 512  # keep ~4 block-sized temporaries in VMEM
    block = min(block, cap)
    NW_true = NW
    if NW % block != 0:
        if NW <= cap:
            block = NW  # single whole-array block (no div-8 rule applies)
        else:
            pad = -(-NW // block) * block - NW
            Wcomb = jnp.concatenate(
                [Wcomb, jnp.ones((pad, NO), Wcomb.dtype)], axis=0)
            av = jnp.concatenate([av, jnp.zeros((pad,), av.dtype)])
            NW += pad
    f32 = jnp.float32
    grid = (NW // block,)

    out = pl.pallas_call(
        functools.partial(_spectrum_chi2_kernel, iters=iters,
                          mm_passes=mm_passes, renorm=renorm, recip=recip),
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
        (1.0 / data_err.astype(f32)).reshape(1, nd),
        Vpinv.astype(f32),
        V.T.astype(f32),
    )
    return out[:NW_true, 0]


# ---------------------------------------------------------------------------
# Fully-fused log-posterior kernel: one Pallas call per walker-batch eval.
#
# The spectrum kernel above leaves ~17% of step time in small XLA fusions
# (tent-basis weights, photometry matmuls, priors — see
# scripts/trace_stretch.py).  This variant computes the ENTIRE
# ``inference.batched.log_posterior_batch`` semantics in-kernel for the
# single-target (unpadded) case.  Interpolations use tent-basis constants
# folded host-side (``_tent_consts``): per node j the weight is
#     w_j(q) = clip(min((q - A_j) * invB_j, (C_j - q) * invD_j), 0, 1)
# which reproduces ``ops.interp.tent_weights`` exactly (edge nodes get their
# off-side disabled via A=-1e30/invB=1e-30 so the min picks the live side) —
# no gathers, no reshapes, pure VPU arithmetic against [1, n] constants.
# ---------------------------------------------------------------------------

# physical constants: the exact values the reference uses (mft6.py:79-81,691)
from mcmc_spec_tpu.models.mist import LSUN as _LSUN, RSUN as _RSUN, SIGMA_SB as _SIGMA_SB

_RSUN_CM = 6.957e10  # mft6.py:691
_PC_CM = 3.086e18  # mft6.py:691


def _tent_consts(nodes):
    """[4, n] (A, invB, C, invD) tent-weight constants for ``nodes``."""
    nodes = jnp.asarray(nodes, jnp.float32)
    prev = jnp.concatenate([nodes[:1] - 1.0, nodes[:-1]])
    nxt = jnp.concatenate([nodes[1:], nodes[-1:] + 1.0])
    A = prev.at[0].set(-1e30)
    invB = (1.0 / (nodes - prev)).at[0].set(1e-30)
    C = nxt.at[-1].set(1e30)
    invD = (1.0 / (nxt - nodes)).at[-1].set(1e-30)
    return jnp.stack([A, invB, C, invD])


def _tent_w(tc, q):
    """Tent weights [B, n] for queries ``q`` [B, 1] given [4, n] constants."""
    left = (q - tc[0][None, :]) * tc[1][None, :]
    right = (tc[2][None, :] - q) * tc[3][None, :]
    return jnp.clip(jnp.minimum(left, right), 0.0, 1.0)


def _posterior_kernel(
    scal_ref,  # [1, 3] SMEM: tmin, tmax, med_data
    p_ref,  # [B, ndim]
    D_ref,  # [NO, nd]
    kd_ref,  # [1, nd]
    data_ref,  # [1, nd]
    inv_err_ref,  # [1, nd] 1/err
    VpinvT_ref,  # [3, nd]
    VT_ref,  # [3, nd]
    tentT_ref,  # [4, NO] Teff tent constants expanded to grid points
    tentG_ref,  # [4, NO] logg tent constants expanded to grid points
    mist_tent_ref,  # [4, nm]
    mist_vals_ref,  # [2, nm]: logg nodes, lum nodes
    av_tent_ref,  # [4, nav]
    av_vals_ref,  # [2, nav]: mu, sig
    Fc_ref,  # [NO, nc]
    Fp_ref,  # [NO, npf]
    cobs_ref,  # [2, nc]: cmag, cerr
    pobs_ref,  # [4, npf]: pmag, perr, zero flux, CCM89 k at cwl
    prior_ref,  # [2, ndim]: gaussian prior mu (0 = off), sig
    out_ref,  # [B, 1] log posterior
    *,
    nspec,
    fit_plx,
    dist_fit,
    rad_prior,
    spectrum_weight,
    median_iters,
    rad_sigma,
    mm_passes,
    recip,
):
    p = p_ref[:]
    n = nspec
    f32 = jnp.float32
    tmin = scal_ref[0, 0]
    tmax = scal_ref[0, 1]
    med_data = scal_ref[0, 2]
    tiny = jnp.asarray(jnp.finfo(f32).tiny, f32)

    # --- unpack (batched._unpack_batch)
    teffs = [p[:, s : s + 1] for s in range(n)]
    av = p[:, n : n + 1]
    if fit_plx:
        r1 = p[:, n + 1 : n + 2]
        ratios = [p[:, n + 1 + s : n + 2 + s] for s in range(1, n)]
        plx = p[:, 2 * n + 1 : 2 * n + 2]
    else:
        r1 = jnp.ones_like(av)
        ratios = [p[:, n + s : n + 1 + s] for s in range(1, n)]
        plx = jnp.zeros_like(av)

    # --- component scales (batched._scales_batch)
    if fit_plx:
        base = (r1 * _RSUN_CM * plx / _PC_CM) ** 2
        scales = [base] + [base * r**2 for r in ratios]
    else:
        scales = [jnp.ones_like(r1)] + [r**2 for r in ratios]

    # --- MIST logg(T) per component, then grid tent weights
    mist_tc = mist_tent_ref[:]
    logg_nodes = mist_vals_ref[0][None, :]
    lum_nodes = mist_vals_ref[1][None, :]
    tT = tentT_ref[:]
    tG = tentG_ref[:]
    Wcomb = None
    cmags = []
    mrads = []
    for s in range(n):
        wm = _tent_w(mist_tc, teffs[s])  # [B, nm]
        logg_s = jnp.sum(wm * logg_nodes, axis=1, keepdims=True)
        Wk = _tent_w(tT, teffs[s]) * _tent_w(tG, logg_s)  # [B, NO]
        sWk = scales[s] * Wk
        Wcomb = sWk if Wcomb is None else Wcomb + sWk
        cflux = _dot_f32(sWk, Fc_ref[:], mm_passes)  # [B, nc]
        cmags.append(-2.5 / LN10 * jnp.log(jnp.maximum(cflux, tiny)))
        if rad_prior:
            lum_s = jnp.sum(wm * lum_nodes, axis=1, keepdims=True)
            mrads.append(
                jnp.sqrt(lum_s * _LSUN / (4.0 * jnp.pi * _SIGMA_SB * teffs[s] ** 4))
                / _RSUN
            )

    # --- contrasts (batched._forward_small)
    nc = Fc_ref.shape[1]
    if n == 1:
        contrasts = jnp.zeros((p.shape[0], nc), f32)
    elif n == 2:
        contrasts = cmags[1] - cmags[0]
    else:
        col = jax.lax.broadcasted_iota(jnp.int32, (p.shape[0], nc), 1)
        contrasts = jnp.where(col < nc // 2, cmags[1] - cmags[0], cmags[2] - cmags[0])

    # --- photometry
    pflux = _dot_f32(Wcomb, Fp_ref[:], mm_passes)  # [B, npf]
    pmag_obs = pobs_ref[0][None, :]
    perr = pobs_ref[1][None, :]
    zp = pobs_ref[2][None, :]
    kcwl = pobs_ref[3][None, :]
    phot = -2.5 / LN10 * jnp.log(jnp.maximum(pflux / zp, tiny))
    phot = jnp.where(av > 0, phot + av * kcwl, phot)

    cmag_obs = cobs_ref[0][None, :]
    cerr = cobs_ref[1][None, :]
    chi_c = jnp.sum(((contrasts - cmag_obs) / cerr) ** 2, axis=1, keepdims=True)
    chi_p = jnp.sum(((phot - pmag_obs) / perr) ** 2, axis=1, keepdims=True)

    # --- spectrum chi^2 (shared block); nospec drops it (batched:151-153)
    if spectrum_weight != 0.0:
        chi_spec = _spectrum_block(
            Wcomb, av, D_ref[:], kd_ref[:], data_ref[:], inv_err_ref[:],
            VpinvT_ref[:], VT_ref[:], med_data, median_iters, mm_passes,
            recip=recip,
        )
    else:
        chi_spec = jnp.zeros_like(chi_c)

    npf = Fp_ref.shape[1]
    if fit_plx:
        weight = float(nc + npf)
    else:
        weight = float(nc)
        chi_p = jnp.zeros_like(chi_p)
    cs = spectrum_weight * weight * chi_spec + chi_c + chi_p
    ll = jnp.where(jnp.isnan(cs), -jnp.inf, -0.5 * cs)

    # --- prior (batched.log_prior_batch)
    lp = jnp.zeros_like(av)
    if fit_plx:
        dist_pc = 1.0 / jnp.maximum(plx, 1e-12)
        logd = jnp.log(jnp.maximum(dist_pc, 1e-3))
        wav = _tent_w(av_tent_ref[:], logd)  # [B, nav]
        mu = jnp.sum(wav * av_vals_ref[0][None, :], axis=1, keepdims=True)
        sig = jnp.sum(wav * av_vals_ref[1][None, :], axis=1, keepdims=True)
        lp += -0.5 * ((av - mu) / sig) ** 2

    pmu = prior_ref[0][None, :]
    psig = prior_ref[1][None, :]
    lp += jnp.sum(
        jnp.where(pmu != 0, -0.5 * ((p - pmu) / psig) ** 2, 0.0),
        axis=1, keepdims=True,
    )

    if rad_prior:
        m1 = mrads[0]
        model_vals = [m1] + [m / m1 for m in mrads[1:]]
        rvals = [r1] + ratios if fit_plx else ratios
        if not fit_plx:
            model_vals = model_vals[1:]
        for rv, mv in zip(rvals, model_vals):
            lp += -0.5 * ((rv - mv) / (rad_sigma * mv)) ** 2

    # --- bounds (batched._bounds_ok_batch)
    ok = (av >= 0)
    for t in teffs:
        ok = jnp.logical_and(ok, jnp.logical_and(t <= tmax, t >= tmin))
    for r in ratios:
        ok = jnp.logical_and(ok, r >= 0.05)
    if fit_plx:
        ok = jnp.logical_and(ok, r1 >= 0.05)
        if dist_fit:
            plx_hi = 0.01 if spectrum_weight == 0.0 else 0.25
            if n <= 2:
                ok = jnp.logical_and(ok, r1 <= 1.5)
                ok = jnp.logical_and(ok, plx >= 1.0 / 3000.0)
                ok = jnp.logical_and(ok, plx <= plx_hi)
            else:
                ok = jnp.logical_and(ok, plx >= 1.0 / 1000.0)
                ok = jnp.logical_and(ok, plx <= plx_hi)
    lp = jnp.where(ok, lp, -jnp.inf)

    out_ref[:] = jnp.where(jnp.isfinite(lp), lp + ll, -jnp.inf)


LN10 = 2.302585092994046


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def log_posterior_fused(p, tgt, block: int = 0, interpret: bool = False):
    """Fused ``log_posterior_batch`` — the whole eval in one Pallas call.

    Single-target (unpadded) variant; the wrapper mirrors the semantics of
    ``inference.batched`` exactly (tests/test_pallas_kernel.py).  Requires
    ``tgt.n_contrast > 0`` and ``tgt.n_phot > 0`` (callers fall back to the
    XLA composition otherwise).
    """
    NW = p.shape[0]
    ndim = tgt.ndim
    nT, nG, nd = tgt.D.shape
    NO = nT * nG
    if block == 0:
        # pack-time value (PackedTarget.eval_block); hand-built targets
        # without one get the documented default (no trace-time env read).
        # 256 measured faster than 512 for the fused kernel (more grid steps
        # to pipeline, lower VMEM residency); the spectrum-only kernel keeps
        # its measured-best 512
        block = getattr(tgt, "eval_block", 0) or 256
    # v5e scoped VMEM is ~16 MB; the kernel holds ~4 [block, nd] f32
    # temporaries (block=1024 at nd=1792 was measured to OOM at 26.2 MB)
    cap = 512 if nd <= 2048 else (384 if nd <= 3000 else 256)
    block = min(block, cap)
    NW_true = NW
    if NW % block != 0:
        if NW <= cap:
            block = NW  # single whole-array block: fits VMEM
        else:
            # pad the walker axis up to a block multiple (replicating row 0
            # keeps every in-kernel value finite) instead of running one
            # giant VMEM-overflowing block; outputs are sliced off
            pad = -(-NW // block) * block - NW
            p = jnp.concatenate(
                [p, jnp.broadcast_to(p[:1], (pad, p.shape[1]))], axis=0)
            NW += pad
    f32 = jnp.float32

    tT = jnp.repeat(_tent_consts(tgt.temps), nG, axis=1)  # [4, NO], o = t*nG+g
    tG = jnp.tile(_tent_consts(tgt.loggs), (1, nT))

    med_iters, mm_passes, recip = resolve_dials(tgt)
    kern = functools.partial(
        _posterior_kernel,
        nspec=tgt.nspec,
        fit_plx=tgt.fit_plx,
        dist_fit=tgt.dist_fit,
        rad_prior=tgt.rad_prior,
        spectrum_weight=tgt.spectrum_weight,
        median_iters=med_iters,
        rad_sigma=getattr(tgt, "rad_sigma_frac", 0.02),
        mm_passes=mm_passes,
        recip=recip,
    )
    nc, npf = tgt.cmag.shape[0], tgt.pmag.shape[0]
    nm = tgt.mist_teff_nodes.shape[0]
    nav = tgt.av_logd_nodes.shape[0]

    bcast = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(NW // block,),
            in_specs=[
                pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((block, ndim), lambda i: (i, 0)),
                bcast((NO, nd)),
                bcast((1, nd)),
                bcast((1, nd)),
                bcast((1, nd)),
                bcast((3, nd)),
                bcast((3, nd)),
                bcast((4, NO)),
                bcast((4, NO)),
                bcast((4, nm)),
                bcast((2, nm)),
                bcast((4, nav)),
                bcast((2, nav)),
                bcast((NO, nc)),
                bcast((NO, npf)),
                bcast((2, nc)),
                bcast((4, npf)),
                bcast((2, ndim)),
            ],
            out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((NW, 1), f32),
        interpret=interpret,
    )(
        jnp.stack([tgt.tmin, tgt.tmax, tgt.med_data]).astype(f32).reshape(1, 3),
        p.astype(f32),
        tgt.D.astype(f32).reshape(NO, nd),
        tgt.ext_k_data.astype(f32).reshape(1, nd),
        tgt.data_flux.astype(f32).reshape(1, nd),
        (1.0 / tgt.data_err.astype(f32)).reshape(1, nd),
        tgt.Vpinv.astype(f32),
        tgt.V.T.astype(f32),
        tT,
        tG,
        _tent_consts(tgt.mist_teff_nodes),
        jnp.stack([tgt.mist_logg_nodes, tgt.mist_lum_nodes]).astype(f32),
        _tent_consts(tgt.av_logd_nodes),
        jnp.stack([tgt.av_mu_nodes, tgt.av_sig_nodes]).astype(f32),
        tgt.Fc.astype(f32).reshape(NO, nc),
        tgt.Fp.astype(f32).reshape(NO, npf),
        jnp.stack([tgt.cmag, tgt.cerr]).astype(f32),
        jnp.stack([tgt.pmag, tgt.perr, tgt.phot_zp, tgt.ext_k_cwl]).astype(f32),
        jnp.stack([tgt.prior_mu, tgt.prior_sig]).astype(f32),
    )
    return out[:NW_true, 0]


# ---------------------------------------------------------------------------
# Fused fleet posterior: the one-kernel-per-eval design for stacked targets.
# Mirrors _posterior_kernel, with the fleet deltas of _spectrum_chi2_fleet_kernel:
# per-target tables arrive as [1, ...] blocks selected by (program_id // bpt),
# the median uses per-row ranks (padding-aware), the spectrum chi^2 is
# sum*inv_n_true, and the chi^2 weight (n_contrast_true + n_phot_true) is a
# per-row dynamic value (padded filters don't count).
# ---------------------------------------------------------------------------


def _fleet_posterior_kernel(
    p_ref,  # [B, ndim]
    metaf_ref,  # [B, 6]: tmin, tmax, med_data, inv_n_data, nc_true, np_true
    ranks_ref,  # [B, 2] int32 median ranks
    D_ref,  # [1, NO, nd]
    kd_ref,  # [1, 1, nd]
    data_ref,  # [1, 1, nd]
    ierr_ref,  # [1, 1, nd]
    VpinvT_ref,  # [1, 3, nd]
    VT_ref,  # [1, 3, nd]
    tentT_ref,  # [1, 4, NO]
    tentG_ref,  # [1, 4, NO]
    mist_tent_ref,  # [1, 4, nm]
    mist_vals_ref,  # [1, 2, nm]
    av_tent_ref,  # [1, 4, nav]
    av_vals_ref,  # [1, 2, nav]
    Fc_ref,  # [1, NO, nc]
    Fp_ref,  # [1, NO, npf]
    cobs_ref,  # [1, 2, nc]
    pobs_ref,  # [1, 4, npf]
    prior_ref,  # [1, 2, ndim]
    out_ref,  # [B, 1]
    *,
    nspec,
    fit_plx,
    dist_fit,
    rad_prior,
    spectrum_weight,
    median_iters,
    rad_sigma,
    mm_passes,
    recip,
):
    p = p_ref[:]
    n = nspec
    f32 = jnp.float32
    tmin = metaf_ref[:, 0][:, None]
    tmax = metaf_ref[:, 1][:, None]
    med_data = metaf_ref[:, 2][:, None]
    inv_n = metaf_ref[:, 3][:, None]
    nc_t = metaf_ref[:, 4][:, None]
    np_t = metaf_ref[:, 5][:, None]
    tiny = jnp.asarray(jnp.finfo(f32).tiny, f32)

    teffs = [p[:, s : s + 1] for s in range(n)]
    av = p[:, n : n + 1]
    if fit_plx:
        r1 = p[:, n + 1 : n + 2]
        ratios = [p[:, n + 1 + s : n + 2 + s] for s in range(1, n)]
        plx = p[:, 2 * n + 1 : 2 * n + 2]
    else:
        r1 = jnp.ones_like(av)
        ratios = [p[:, n + s : n + 1 + s] for s in range(1, n)]
        plx = jnp.zeros_like(av)

    if fit_plx:
        base = (r1 * _RSUN_CM * plx / _PC_CM) ** 2
        scales = [base] + [base * r**2 for r in ratios]
    else:
        scales = [jnp.ones_like(r1)] + [r**2 for r in ratios]

    mist_tc = mist_tent_ref[0]
    logg_nodes = mist_vals_ref[0, 0][None, :]
    lum_nodes = mist_vals_ref[0, 1][None, :]
    tT = tentT_ref[0]
    tG = tentG_ref[0]
    Wcomb = None
    cmags = []
    mrads = []
    for s in range(n):
        wm = _tent_w(mist_tc, teffs[s])
        logg_s = jnp.sum(wm * logg_nodes, axis=1, keepdims=True)
        Wk = _tent_w(tT, teffs[s]) * _tent_w(tG, logg_s)
        sWk = scales[s] * Wk
        Wcomb = sWk if Wcomb is None else Wcomb + sWk
        cflux = _dot_f32(sWk, Fc_ref[0], mm_passes)
        cmags.append(-2.5 / LN10 * jnp.log(jnp.maximum(cflux, tiny)))
        if rad_prior:
            lum_s = jnp.sum(wm * lum_nodes, axis=1, keepdims=True)
            mrads.append(
                jnp.sqrt(lum_s * _LSUN / (4.0 * jnp.pi * _SIGMA_SB * teffs[s] ** 4))
                / _RSUN
            )

    nc = Fc_ref.shape[2]
    if n == 1:
        contrasts = jnp.zeros((p.shape[0], nc), f32)
    elif n == 2:
        contrasts = cmags[1] - cmags[0]
    else:
        col = jax.lax.broadcasted_iota(jnp.int32, (p.shape[0], nc), 1)
        contrasts = jnp.where(col < nc // 2, cmags[1] - cmags[0], cmags[2] - cmags[0])

    pflux = _dot_f32(Wcomb, Fp_ref[0], mm_passes)
    phot = -2.5 / LN10 * jnp.log(jnp.maximum(pflux / pobs_ref[0, 2][None, :], tiny))
    phot = jnp.where(av > 0, phot + av * pobs_ref[0, 3][None, :], phot)

    chi_c = jnp.sum(
        ((contrasts - cobs_ref[0, 0][None, :]) / cobs_ref[0, 1][None, :]) ** 2,
        axis=1, keepdims=True,
    )
    chi_p = jnp.sum(
        ((phot - pobs_ref[0, 0][None, :]) / pobs_ref[0, 1][None, :]) ** 2,
        axis=1, keepdims=True,
    )

    if spectrum_weight != 0.0:
        model = _dot_f32(Wcomb, D_ref[0], mm_passes)
        trans = jnp.where(av > 0, jnp.exp(LN10_04 * av * kd_ref[0]), 1.0)
        model = model * trans
        mi = jax.lax.bitcast_convert_type(model, jnp.int32)
        it = median_iters
        r1b = ranks_ref[:, 0][:, None]
        r2b = ranks_ref[:, 1][:, None]
        v1 = _row_order_stat_bits(mi, r1b, it, midpoint=it < 31)
        x1 = jax.lax.bitcast_convert_type(v1, jnp.float32)
        if it < 31:
            med = x1
        else:
            cnt1 = jnp.sum((mi <= v1).astype(jnp.int32), axis=1, keepdims=True)
            bigger = jnp.where(mi > v1, model, jnp.inf)
            x2 = jnp.where(cnt1 >= r2b, x1, jnp.min(bigger, axis=1, keepdims=True))
            med = 0.5 * (x1 + x2)
        model = model * (med_data / med)
        frac = _div(data_ref[0], model, recip)
        Vp = VpinvT_ref[0]
        c0 = jnp.sum(frac * Vp[0][None, :], axis=1, keepdims=True)
        c1 = jnp.sum(frac * Vp[1][None, :], axis=1, keepdims=True)
        c2 = jnp.sum(frac * Vp[2][None, :], axis=1, keepdims=True)
        VT = VT_ref[0]
        fitted = c0 * VT[0][None, :] + c1 * VT[1][None, :] + c2 * VT[2][None, :]
        data_renorm = _div(data_ref[0], fitted, recip)
        resid = (model - data_renorm) * ierr_ref[0]  # padded: *0 -> 0
        chi_spec = jnp.sum(resid * resid, axis=1, keepdims=True) * inv_n
    else:
        chi_spec = jnp.zeros_like(chi_c)

    if fit_plx:
        weight = nc_t + np_t
    else:
        weight = nc_t
        chi_p = jnp.zeros_like(chi_p)
    cs = spectrum_weight * weight * chi_spec + chi_c + chi_p
    ll = jnp.where(jnp.isnan(cs), -jnp.inf, -0.5 * cs)

    lp = jnp.zeros_like(av)
    if fit_plx:
        dist_pc = 1.0 / jnp.maximum(plx, 1e-12)
        logd = jnp.log(jnp.maximum(dist_pc, 1e-3))
        wav = _tent_w(av_tent_ref[0], logd)
        mu = jnp.sum(wav * av_vals_ref[0, 0][None, :], axis=1, keepdims=True)
        sig = jnp.sum(wav * av_vals_ref[0, 1][None, :], axis=1, keepdims=True)
        lp += -0.5 * ((av - mu) / sig) ** 2

    pmu = prior_ref[0, 0][None, :]
    psig = prior_ref[0, 1][None, :]
    lp += jnp.sum(
        jnp.where(pmu != 0, -0.5 * ((p - pmu) / psig) ** 2, 0.0),
        axis=1, keepdims=True,
    )

    if rad_prior:
        m1 = mrads[0]
        model_vals = [m1] + [m / m1 for m in mrads[1:]]
        rvals = [r1] + ratios if fit_plx else ratios
        if not fit_plx:
            model_vals = model_vals[1:]
        for rv, mv in zip(rvals, model_vals):
            lp += -0.5 * ((rv - mv) / (rad_sigma * mv)) ** 2

    ok = (av >= 0)
    for t in teffs:
        ok = jnp.logical_and(ok, jnp.logical_and(t <= tmax, t >= tmin))
    for r in ratios:
        ok = jnp.logical_and(ok, r >= 0.05)
    if fit_plx:
        ok = jnp.logical_and(ok, r1 >= 0.05)
        if dist_fit:
            plx_hi = 0.01 if spectrum_weight == 0.0 else 0.25
            if n <= 2:
                ok = jnp.logical_and(ok, r1 <= 1.5)
                ok = jnp.logical_and(ok, plx >= 1.0 / 3000.0)
                ok = jnp.logical_and(ok, plx <= plx_hi)
            else:
                ok = jnp.logical_and(ok, plx >= 1.0 / 1000.0)
                ok = jnp.logical_and(ok, plx <= plx_hi)
    lp = jnp.where(ok, lp, -jnp.inf)

    out_ref[:] = jnp.where(jnp.isfinite(lp), lp + ll, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def log_posterior_fleet_fused(params, fleet, block: int = 0,
                              interpret: bool = False):
    """Fused fleet eval: [ntgt, nw, ndim] -> [ntgt, nw], one Pallas program.

    Padding-aware counterpart of ``log_posterior_fused`` (see
    ``inference.fleet``): per-row median ranks, sum*1/n_true spectrum chi^2,
    dynamic (n_contrast_true + n_phot_true) weights.
    """
    ntgt, nw, ndim = params.shape
    nT, nG, nd = fleet.D.shape[1:]
    NO = nT * nG
    if block == 0:
        block = getattr(fleet, "eval_block", 0) or 256
    cap = 512 if nd <= 2048 else (384 if nd <= 3000 else 256)
    block = min(block, cap)
    # Mosaic requires per-target row blocks divisible by 8 (they never equal
    # the stacked array); pad the walker axis and slice the outputs off.
    # Walker counts above the VMEM cap pad further up to a block multiple —
    # a single giant per-target block would overflow the ~16 MB scoped VMEM.
    # Padding rows replicate row 0, so every in-kernel value stays finite.
    nw_pad = -(-nw // 8) * 8
    if nw_pad % block != 0:
        if nw_pad <= cap:
            block = nw_pad  # small batch: one (8-multiple) block per target
        else:
            nw_pad = -(-nw_pad // block) * block
    if nw_pad != nw:
        params = jnp.concatenate(
            [params, jnp.broadcast_to(params[:, :1], (ntgt, nw_pad - nw, ndim))],
            axis=1,
        )
    nw_true, nw = nw, nw_pad
    bpt = nw // block
    f32 = jnp.float32

    tcT = jax.vmap(_tent_consts)(fleet.temps)  # [ntgt, 4, nT]
    tcG = jax.vmap(_tent_consts)(fleet.loggs)
    tT = jnp.repeat(tcT, nG, axis=2)  # [ntgt, 4, NO]
    tG = jnp.tile(tcG, (1, 1, nT))

    n_true = fleet.n_data_true.astype(jnp.int32)
    r1 = (n_true + 1) // 2
    r2 = n_true // 2 + 1
    ranks = jnp.broadcast_to(
        jnp.stack([r1, r2], axis=-1)[:, None, :], (ntgt, nw, 2)
    ).reshape(ntgt * nw, 2)
    metaf = jnp.broadcast_to(
        jnp.stack([
            fleet.tmin.astype(f32), fleet.tmax.astype(f32),
            fleet.med_data.astype(f32), 1.0 / n_true.astype(f32),
            fleet.n_contrast_true.astype(f32), fleet.n_phot_true.astype(f32),
        ], axis=-1)[:, None, :],
        (ntgt, nw, 6),
    ).reshape(ntgt * nw, 6)

    med_iters, mm_passes, recip = resolve_dials(fleet)
    kern = functools.partial(
        _fleet_posterior_kernel,
        nspec=fleet.nspec,
        fit_plx=fleet.fit_plx,
        dist_fit=fleet.dist_fit,
        rad_prior=fleet.rad_prior,
        spectrum_weight=fleet.spectrum_weight,
        median_iters=med_iters,
        rad_sigma=getattr(fleet, "rad_sigma_frac", 0.02),
        mm_passes=mm_passes,
        recip=recip,
    )
    nc, npf = fleet.cmag.shape[1], fleet.pmag.shape[1]
    nm = fleet.mist_teff_nodes.shape[1]
    nav = fleet.av_logd_nodes.shape[1]

    row = lambda shape: pl.BlockSpec(shape, lambda i: (i,) + (0,) * (len(shape) - 1))
    tgtb = lambda shape: pl.BlockSpec(
        shape, lambda i: (i // bpt,) + (0,) * (len(shape) - 1))
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(ntgt * bpt,),
            in_specs=[
                row((block, ndim)),
                row((block, 6)),
                row((block, 2)),
                tgtb((1, NO, nd)),
                tgtb((1, 1, nd)),
                tgtb((1, 1, nd)),
                tgtb((1, 1, nd)),
                tgtb((1, 3, nd)),
                tgtb((1, 3, nd)),
                tgtb((1, 4, NO)),
                tgtb((1, 4, NO)),
                tgtb((1, 4, nm)),
                tgtb((1, 2, nm)),
                tgtb((1, 4, nav)),
                tgtb((1, 2, nav)),
                tgtb((1, NO, nc)),
                tgtb((1, NO, npf)),
                tgtb((1, 2, nc)),
                tgtb((1, 4, npf)),
                tgtb((1, 2, ndim)),
            ],
            out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((ntgt * nw, 1), f32),
        interpret=interpret,
    )(
        params.astype(f32).reshape(ntgt * nw, ndim),
        metaf,
        ranks,
        fleet.D.astype(f32).reshape(ntgt, NO, nd),
        fleet.ext_k_data.astype(f32).reshape(ntgt, 1, nd),
        fleet.data_flux.astype(f32).reshape(ntgt, 1, nd),
        (1.0 / fleet.data_err.astype(f32)).reshape(ntgt, 1, nd),
        fleet.Vpinv.astype(f32),
        jnp.swapaxes(fleet.V.astype(f32), 1, 2),
        tT,
        tG,
        jax.vmap(_tent_consts)(fleet.mist_teff_nodes),
        jnp.stack([fleet.mist_logg_nodes, fleet.mist_lum_nodes], axis=1).astype(f32),
        jax.vmap(_tent_consts)(fleet.av_logd_nodes),
        jnp.stack([fleet.av_mu_nodes, fleet.av_sig_nodes], axis=1).astype(f32),
        fleet.Fc.astype(f32).reshape(ntgt, NO, nc),
        fleet.Fp.astype(f32).reshape(ntgt, NO, npf),
        jnp.stack([fleet.cmag, fleet.cerr], axis=1).astype(f32),
        jnp.stack([fleet.pmag, fleet.perr, fleet.phot_zp, fleet.ext_k_cwl],
                  axis=1).astype(f32),
        jnp.stack([fleet.prior_mu, fleet.prior_sig], axis=1).astype(f32),
    )
    return out.reshape(ntgt, nw)[:, :nw_true]
