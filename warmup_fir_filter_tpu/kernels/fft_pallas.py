"""Pallas TPU kernels: matmul-based FFT and fused FFT overlap-save filter.

The hand-written FFT path mandated by the north star (BASELINE.json:
"The FIR taps-MAC and FFT kernels are hand-written Pallas kernels") and
the TPU-native realization of what the reference's ``MyComplex`` phase
constructor was scaffolding (``lib/mycomplex.h:15`` — unit-phasor
twiddles for a future FFT).

Design (see /opt/skills/guides/pallas_guide.md):

- **FFT as matmuls, not butterflies.**  A radix-2 butterfly network
  fights the TPU's (sublane × 128-lane) layout: every stage is a
  strided shuffle the VPU hates.  Instead we use the 4-step
  Cooley–Tukey factorization ``nfft = N1 × N2`` with ``N2 = 128`` (the
  lane width): both DFT factors become *dense MXU matmuls* and the
  inter-factor twiddle is one VPU multiply.  More FLOPs than
  ``N log N``, but the MXU supplies them essentially for free and every
  operand sits in a perfect 128-lane tile.

- **Index map.**  With ``n = N2·n1 + n2`` and ``k = k1 + N1·k2``::

      X[k1 + N1·k2] = Σ_{n2} W_N2^{n2·k2} · W_N^{k1·n2} ·
                      (Σ_{n1} W_N1^{k1·n1} · x[N2·n1 + n2])

  Data rides in "m-layout" planes ``(N1, B·N2)`` — column blocks of one
  batch row's ``N2`` lanes — so the outer DFT is ``F1 @ plane`` and the
  inner DFT is ``plane' @ F2`` after a layout-compatible row-major
  reshape ``(N1, R·N2) → (N1·R, N2)`` (no transpose: flat order is
  identical).  Twiddle/spectrum tables arrive PRE-REPEATED to
  ``(N1·R, N2)`` operands (r3: an in-kernel sublane ``jnp.repeat`` was
  a full-plane relayout per block).

  Measured (r5, `docs/roofline.md` "the framing passes were the
  bottleneck"): the fused kernel itself runs 17-21 Gsps at every
  program granularity; the r3/r4 2.4-2.6 Gsps full-path plateau was
  the XLA framing/unframing passes (11.6 of 13 ms).  The r5 stream
  kernel (below) deletes them structurally: 12.3 Gsps f32 / 15 Gsps
  u8 end-to-end on v5e at hop 2, 16.4 Gsps at hop 3 (r5b).  (The
  production bit-exact path remains the direct MXU band kernel at
  ~15-20× this rate.)

- **Fused overlap-save filter.**  The forward FFT leaves the spectrum
  in *scrambled* ``[k1, b, k2]`` order.  Rather than paying the
  natural-order relayout, the filter's frequency response is
  pre-permuted to the same order (``Hp[k1, k2] = H[k1 + N1·k2]``) and
  — in the r4 kernel for the common ``1 < N1 ≤ 8`` regime — FOLDED,
  together with both twiddle stages, into per-k1 matmul table
  constants (``_osfilt_fold_tables``).  One kernel: natural column
  slabs → VPU outer DFT → per-k1 complex matmuls (forward+filter+
  inverse factors in the tables) → VPU inverse outer DFT → filtered
  block, never leaving VMEM.

- **No complex dtypes anywhere**: split re/im float32 planes (the axon
  backend cannot transfer complex64 host→device; twiddle/DFT tables and
  the filter spectrum are shipped as real cos/sin planes).

Verified against ``np.fft`` in tests (interpret mode) and against the
jnp overlap-save path on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
#: Scoped VMEM budget per program; the fused filter keeps ~18 planes of
#: (R·nfft) float32 live (incl. the pre-repeated twiddle/spectrum
#: operands, see ``_repeat_rows``), plus Mosaic matmul temporaries.
VMEM_BUDGET_BYTES = 10 * 1024 * 1024
_PLANES = 18
#: Largest FFT the 4-step N1×N2 split supports (N1, N2 ≤ lane width).
MAX_NFFT = LANE * LANE


def _check_nfft_for_taps(nfft: int, num_taps: int) -> None:
    """Reject out-of-range nfft at dispatch with an actionable error.

    ``pick_nfft`` grows as next_pow2(8·L), so num_taps > 2048 would
    request nfft > MAX_NFFT and die inside ``factor_nfft``; surface the
    limit (and the fallback paths) here instead.
    """
    if nfft < num_taps:
        raise ValueError(f"nfft={nfft} must be >= num_taps={num_taps}")
    if nfft > MAX_NFFT:
        raise ValueError(
            f"nfft={nfft} exceeds the fused Pallas FFT kernel's "
            f"{MAX_NFFT}-point cap (num_taps={num_taps}; the default "
            f"pick_nfft exceeds the cap for num_taps > {MAX_NFFT // 8}). "
            "Pass nfft<=16384 explicitly, or use ops.fftfilt."
            "fir_overlap_save (XLA FFT) / kernels.dispatch."
            "fir1d_fixed_rows_auto (direct MXU) instead."
        )


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def factor_nfft(nfft: int) -> tuple[int, int]:
    """Split ``nfft = N1 × N2`` with N2 = lane width (or all of nfft)."""
    if nfft < 2 or nfft & (nfft - 1):
        raise ValueError(f"nfft={nfft} must be a power of two >= 2")
    n2 = min(LANE, nfft)
    n1 = nfft // n2
    if n1 > LANE:
        raise ValueError(f"nfft={nfft} > {LANE * LANE} is unsupported")
    return n1, n2


@functools.lru_cache(maxsize=16)
def _dft_tables(nfft: int) -> dict[str, np.ndarray]:
    """Real/imag DFT factor matrices + twiddles for the 4-step split.

    Forward kernel uses (f1, t, f2); inverse uses their conjugates
    (g1, tc, g2) with the 1/nfft scale folded into g1.
    """
    n1, n2 = factor_nfft(nfft)
    k1 = np.arange(n1, dtype=np.float64)
    j2 = np.arange(n2, dtype=np.float64)
    f1 = np.exp(-2j * np.pi * np.outer(k1, k1) / n1)  # [k1, n1]
    t = np.exp(-2j * np.pi * np.outer(k1, j2) / nfft)  # [k1, n2]
    f2 = np.exp(-2j * np.pi * np.outer(j2, j2) / n2)  # [n2, k2]
    g1 = f1.conj() / nfft  # [n1, k1], scaled
    g2 = f2.conj()  # [k2, n2]
    if n1 == 1:
        # Degenerate single-factor split: the inverse skips the g1
        # matmul, so the 1/nfft scale must ride on g2 instead.
        g2 = g2 / nfft
    out = {}
    for name, mat in (("f1", f1), ("t", t), ("f2", f2), ("g1", g1),
                      ("g2", g2)):
        out[name + "c"] = np.ascontiguousarray(mat.real, np.float32)
        out[name + "s"] = np.ascontiguousarray(mat.imag, np.float32)
    return out


def _auto_block_rows(nfft: int, batch: int) -> int:
    rows = VMEM_BUDGET_BYTES // (_PLANES * 4 * nfft)
    rows = max(8, (rows // 8) * 8)
    return int(min(rows, _round_up(max(batch, 1), 8)))


#: DFT matmuls need better-than-bf16 precision: the MXU's default single
#: bf16 pass costs ~3e-3 relative error on a 512-point transform
#: (measured), which blows the overlap-save SNR contract.
#: ``Precision.HIGHEST`` restores ~1e-7 but its 6-pass f32 emulation
#: serializes with DMA inside Pallas (measured on the float FIR kernel,
#: docs/architecture.md); a manual bf16 hi+lo split with three bf16
#: dots (hi·hi + lo·hi + hi·lo) reaches ~1e-6 relative at half the MXU
#: passes.  (Mosaic lowers neither ``Precision.HIGH`` nor
#: ``DotAlgorithmPreset``s, so the split is explicit.)
_dot_f32 = functools.partial(
    jnp.dot,
    preferred_element_type=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
)
_dot_bf16 = functools.partial(jnp.dot, preferred_element_type=jnp.float32)


def _split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot(a, b):
    """bf16x3 f32-accurate matmul (see note above)."""
    ah, al = _split_bf16(a)
    bh, bl = _split_bf16(b)
    return _dot_bf16(ah, bh) + _dot_bf16(al, bh) + _dot_bf16(ah, bl)


def _presplit_host(mat) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Host-side bf16 hi/lo split of a CONSTANT matmul table.

    r4 (VERDICT task 4): ``_dot`` re-derives both operand splits
    in-kernel — for the constant DFT tables that is 2-3 full-plane
    elementwise passes per dot per block for values that never change.
    Shipping hi and lo as separate refs deletes those passes.
    """
    # numpy, NOT jnp: under the terminal's --xla_allow_excess_precision
    # XLA elides the f32→bf16→f32 round trip, which makes every ``lo``
    # plane exactly zero and silently degrades the transform to single
    # bf16 (~3e-3 relative — measured as a 57 dB SNR collapse on v5e).
    import ml_dtypes

    m = np.asarray(mat, np.float32)
    hi = m.astype(ml_dtypes.bfloat16)
    lo = (m - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return jnp.asarray(hi), jnp.asarray(lo)


def _osfilt_fold_tables(hc, hs, tables: dict, n1: int, n2: int) -> dict:
    """Per-k1 folded + bf16-pre-split matmul tables for the fused
    filter (host-side numpy — call OUTSIDE any jit trace):

    - ``T2F_k1  = diag(t[k1,:]) @ F2``                  (forward)
    - ``HG2T_k1 = diag(H[k1,:]) @ G2 @ diag(conj t[k1,:])``  (inverse)

    stacked along k1 into (N1·N2, N2) planes.  This moves the forward
    twiddle, the spectrum multiply, and the inverse conj-twiddle — six
    full-plane VPU multiplies plus their adds per block — into table
    constants contracted by the same matmuls the kernel already runs.
    """
    t = (np.asarray(tables["tc"], np.float64)
         + 1j * np.asarray(tables["ts"], np.float64))
    f2 = (np.asarray(tables["f2c"], np.float64)
          + 1j * np.asarray(tables["f2s"], np.float64))
    g2 = (np.asarray(tables["g2c"], np.float64)
          + 1j * np.asarray(tables["g2s"], np.float64))
    hp = np.asarray(hc, np.float64) + 1j * np.asarray(hs, np.float64)
    t2f = np.concatenate(
        [t[k][:, None] * f2 for k in range(n1)], axis=0)
    hg2t = np.concatenate(
        [hp[k][:, None] * g2 * np.conj(t[k])[None, :] for k in range(n1)],
        axis=0)
    out = dict(tables)
    for key, mat in (("t2fc", t2f.real), ("t2fs", t2f.imag),
                     ("hg2c", hg2t.real), ("hg2s", hg2t.imag)):
        hi, lo = _presplit_host(np.ascontiguousarray(mat, np.float32))
        out[key + "h"], out[key + "l"] = hi, lo
    return out


def _ps3(a):
    """In-kernel split of a DATA operand, hoisted for reuse:
    returns ``(hi, lo, vstack(hi, lo))`` — the stacked form rides ONE
    bf16 dot for the hi·B + lo·B pair (fill-latency-bound at these row
    counts, same trick as ``chain_fused.band_apply``)."""
    h, l = _split_bf16(a)
    return h, l, jnp.concatenate([h, l], axis=0)


def _dot_s(a3, bh, bl):
    """bf16x3 dot: pre-split+stacked data × pre-split constant —
    2 MXU passes instead of 3, zero in-kernel constant splits."""
    h, _, st = a3
    both = _dot_bf16(st, bh)
    nr = h.shape[0]
    return both[:nr] + both[nr:] + _dot_bf16(h, bl)


def _cmatmul_s(ar3, ai3, bc, bs):
    """(ar + i·ai) @ (bc + i·bs) with pre-split tables ``bc = (hi, lo)``."""
    return (_dot_s(ar3, *bc) - _dot_s(ai3, *bs),
            _dot_s(ar3, *bs) + _dot_s(ai3, *bc))

#: Outer DFT factors with N1 ≤ this run on the VPU as unrolled
#: scalar-broadcast FMAs: an (N1, N1) @ (N1, C) matmul with N1 ≈ 4 pads
#: to the MXU's 128×128 tile and wastes ~99% of the array, while the VPU
#: does the same work in N1 full-rate passes over the data.
_VPU_DFT_MAX = 8


def _cmatmul(ar, ai, br, bi):
    """(ar + i·ai) @ (br + i·bi) with f32 MXU matmuls."""
    return _dot(ar, br) - _dot(ai, bi), _dot(ar, bi) + _dot(ai, br)


def _small_dft_slabs(fc_ref, fs_ref, xr, xi, n1: int, rows: int,
                     real_out: bool = False):
    """(fc + i·fs) @ (xr + i·xi) unrolled on the VPU for tiny N1.

    Operands are (N1·R, N2) planes with rows (n1-major, r-minor); the
    N1×N1 factor matrix is read as scalars and broadcast-multiplied
    against full (R, N2) slabs — full-sublane VPU passes instead of a
    97%-padded MXU matmul (an earlier (1, R·N2) row-slice variant ran
    the same FMAs at 1/8 sublane utilization).
    """
    xr_slab = [xr[j * rows : (j + 1) * rows] for j in range(n1)]
    xi_slab = (None if xi is None else
               [xi[j * rows : (j + 1) * rows] for j in range(n1)])
    out_r, out_i = [], []
    for k in range(n1):
        acc_r = fc_ref[k, 0] * xr_slab[0]
        acc_i = fs_ref[k, 0] * xr_slab[0]
        if xi is not None:
            acc_r = acc_r - fs_ref[k, 0] * xi_slab[0]
            acc_i = acc_i + fc_ref[k, 0] * xi_slab[0]
        for j in range(1, n1):
            c, s = fc_ref[k, j], fs_ref[k, j]
            acc_r = acc_r + c * xr_slab[j]
            acc_i = acc_i + s * xr_slab[j]
            if xi is not None:
                acc_r = acc_r - s * xi_slab[j]
                acc_i = acc_i + c * xi_slab[j]
        out_r.append(acc_r)
        if not real_out:
            out_i.append(acc_i)
    res_r = jnp.concatenate(out_r, axis=0)
    if real_out:
        return res_r, None
    return res_r, jnp.concatenate(out_i, axis=0)


def _to_m_layout(x, n1: int, n2: int):
    """(B, nfft) → (N1, B·N2) m-layout plane (XLA-side transpose)."""
    b = x.shape[0]
    return x.reshape(b, n1, n2).transpose(1, 0, 2).reshape(n1, b * n2)


def _from_m_layout(xm, n1: int, n2: int):
    """(N1, B·N2) natural m-layout plane → (B, nfft)."""
    b = xm.shape[1] // n2
    return xm.reshape(n1, b, n2).transpose(1, 0, 2).reshape(b, n1 * n2)


def _unscramble(xm, n1: int, n2: int):
    """(N1, B·N2) scrambled spectrum [k1, (b,k2)] → natural (B, nfft)."""
    b = xm.shape[1] // n2
    return xm.reshape(n1, b, n2).transpose(1, 2, 0).reshape(b, n1 * n2)


def _scramble(x, n1: int, n2: int):
    """Natural (B, nfft) spectrum → (N1, B·N2) scrambled m-layout."""
    b = x.shape[0]
    return x.reshape(b, n2, n1).transpose(2, 0, 1).reshape(n1, b * n2)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _nat_to_m(x, n1: int, rows: int, n2: int):
    """In-kernel (R, nfft) natural block → (N1, R·N2) m-layout.

    A sublane-dimension transpose of ~1 MB in VMEM — this replaces the
    HBM-level transpose the host otherwise pays (measured ~10 ms per
    apply on config-4 shapes vs ~0 in-kernel).
    """
    return x.reshape(rows, n1, n2).transpose(1, 0, 2).reshape(n1, rows * n2)


def _m_to_nat(xm, n1: int, rows: int, n2: int):
    """In-kernel (N1, R·N2) m-layout → (R, nfft) natural block."""
    return xm.reshape(n1, rows, n2).transpose(1, 0, 2).reshape(rows, n1 * n2)


def _fwd_stage(xr, xi, f1c_ref, f1s_ref, tc_ref, ts_ref, f2c_ref, f2s_ref,
               n1: int, block_rows: int, n2: int):
    """Forward 4-step DFT from m-layout (re, im) to scrambled spectrum.

    xi may be None (real input).  Returns (cr, ci) of shape (N1·R, N2).
    ``tc_ref``/``ts_ref`` arrive PRE-REPEATED to (N1·R, N2) — an
    in-kernel ``jnp.repeat`` is a full-plane sublane relayout per block
    (the host-side repeat is a one-time table build instead).
    """
    if n1 > 1:
        if n1 <= _VPU_DFT_MAX:
            # Slab layout (N1·R, N2): the reshape is free (row-major
            # identical to the (N1, R·N2) m-layout) and the DFT FMAs
            # run at full sublane utilization.
            xr_s = xr.reshape(n1 * block_rows, n2)
            xi_s = None if xi is None else xi.reshape(n1 * block_rows, n2)
            ar, ai = _small_dft_slabs(f1c_ref, f1s_ref, xr_s, xi_s, n1,
                                      block_rows)
        elif xi is None:
            ar, ai = _dot(f1c_ref[:], xr), _dot(f1s_ref[:], xr)
            ar = ar.reshape(n1 * block_rows, n2)
            ai = ai.reshape(n1 * block_rows, n2)
        else:
            ar, ai = _cmatmul(f1c_ref[:], f1s_ref[:], xr, xi)
            ar = ar.reshape(n1 * block_rows, n2)
            ai = ai.reshape(n1 * block_rows, n2)
        tc = tc_ref[:]
        ts = ts_ref[:]
        br = ar * tc - ai * ts
        bi = ar * ts + ai * tc
    else:  # nfft <= 128: single-factor DFT, twiddles are all ones
        br = xr.reshape(block_rows, n2)
        bi = None if xi is None else xi.reshape(block_rows, n2)
    if bi is None:
        return _dot(br, f2c_ref[:]), _dot(br, f2s_ref[:])
    return _cmatmul(br, bi, f2c_ref[:], f2s_ref[:])


def _inv_stage(cr, ci, tc_ref, ts_ref, g1c_ref, g1s_ref, g2c_ref, g2s_ref,
               n1: int, block_rows: int, n2: int, real_out: bool):
    """Inverse 4-step DFT from scrambled spectrum back to m-layout."""
    er, ei = _cmatmul(cr, ci, g2c_ref[:], g2s_ref[:])
    if n1 == 1:
        out_r = er.reshape(1, block_rows * n2)
        out_i = ei.reshape(1, block_rows * n2)
        return (out_r, None) if real_out else (out_r, out_i)
    tc = tc_ref[:]  # pre-repeated to (N1·R, N2), see _fwd_stage
    ts = ts_ref[:]
    fr = er * tc + ei * ts  # multiply by conj(t); (N1·R, N2) slabs
    fi = ei * tc - er * ts
    if n1 <= _VPU_DFT_MAX:
        return _small_dft_slabs(g1c_ref, g1s_ref, fr, fi, n1, block_rows,
                                real_out=real_out)
    fr = fr.reshape(n1, block_rows * n2)
    fi = fi.reshape(n1, block_rows * n2)
    if real_out:
        return _dot(g1c_ref[:], fr) - _dot(g1s_ref[:], fi), None
    return _cmatmul(g1c_ref[:], g1s_ref[:], fr, fi)


def _fft_kernel(f1c, f1s, tc, ts, f2c, f2s, xr_ref, xi_ref, or_ref, oi_ref,
                *, n1, n2, block_rows):
    xr = _nat_to_m(xr_ref[:], n1, block_rows, n2)
    xi = None if xi_ref is None else _nat_to_m(xi_ref[:], n1, block_rows, n2)
    cr, ci = _fwd_stage(xr, xi, f1c, f1s, tc, ts, f2c, f2s,
                        n1, block_rows, n2)
    # Emit in m-layout with (b, k2) columns: (N1·R, N2) → (N1, R·N2) is
    # row-major compatible (rows were (k1, b)).
    or_ref[:] = cr.reshape(n1, block_rows * n2)
    oi_ref[:] = ci.reshape(n1, block_rows * n2)


def _fft_kernel_real(f1c, f1s, tc, ts, f2c, f2s, xr_ref, or_ref, oi_ref,
                     *, n1, n2, block_rows):
    _fft_kernel(f1c, f1s, tc, ts, f2c, f2s, xr_ref, None, or_ref, oi_ref,
                n1=n1, n2=n2, block_rows=block_rows)


def _ifft_kernel(g1c, g1s, tc, ts, g2c, g2s, xr_ref, xi_ref, or_ref, oi_ref,
                 *, n1, n2, block_rows):
    # Input arrives scrambled ((N1, R·N2) with (b, k2) columns); the
    # inverse stage wants (N1·R, N2) rows (k1, b) — compatible reshape.
    cr = xr_ref[:].reshape(n1 * block_rows, n2)
    ci = xi_ref[:].reshape(n1 * block_rows, n2)
    or_, oi_ = _inv_stage(cr, ci, tc, ts, g1c, g1s, g2c, g2s,
                          n1, block_rows, n2, real_out=False)
    or_ref[:] = _m_to_nat(or_, n1, block_rows, n2)
    oi_ref[:] = _m_to_nat(oi_, n1, block_rows, n2)


def _osfilt_kernel_v2(f1c, f1s, t2fch, t2fcl, t2fsh, t2fsl,
                      g1c, g1s, hg2ch, hg2cl, hg2sh, hg2sl,
                      seg_ref, o_ref, *, n1, n2, block_rows, out_u8):
    """r4 fused overlap-save filter for the VPU-DFT regime (1 < N1 ≤ 8).

    Structural pass deletions vs ``_osfilt_kernel`` (VERDICT r3 task 4;
    each was one or more full-plane passes per block):

    1. **No layout transposes**: the (N1-major, r-minor) slab operands
       the 4-step DFT wants are exactly the natural block's lane-aligned
       column chunks ``seg[:, j·N2:(j+1)·N2]`` — the ``_nat_to_m`` /
       ``_m_to_nat`` sublane relayouts are gone.
    2. **Twiddle and spectrum multiplies folded into the matmul
       tables**: the forward twiddle rides ``T2F_k1 = diag(t_k1)·F2``
       and the spectrum multiply + inverse twiddle ride
       ``HG2T_k1 = diag(H_k1)·G2·diag(conj t_k1)`` — per-k1 dots over
       the same total rows the single big dot streamed (3 extra MXU
       fills per stage, ~free), deleting ~18 elementwise plane passes.
    3. **No constant splits, half the data passes**: tables arrive
       bf16-pre-split (``_presplit_host``); data operands split once
       (``_ps3``) and ride the vstacked 2-pass dot (``_dot_s``).
    """
    seg = seg_ref[:]
    if seg.dtype != jnp.float32:
        seg = seg.astype(jnp.int32).astype(jnp.float32)
    # Forward slab DFT straight off natural column chunks.
    xr_slabs = [seg[:, j * n2 : (j + 1) * n2] for j in range(n1)]
    ar, ai = _small_dft_list(f1c, f1s, xr_slabs, None, n1)

    def ktab(ref, k):
        return ref[k * n2 : (k + 1) * n2]

    fr_parts, fi_parts = [], []
    for k in range(n1):
        sl = slice(k * block_rows, (k + 1) * block_rows)
        cr_k, ci_k = _cmatmul_s(
            _ps3(ar[sl]), _ps3(ai[sl]),
            (ktab(t2fch, k), ktab(t2fcl, k)),
            (ktab(t2fsh, k), ktab(t2fsl, k)))
        er_k, ei_k = _cmatmul_s(
            _ps3(cr_k), _ps3(ci_k),
            (ktab(hg2ch, k), ktab(hg2cl, k)),
            (ktab(hg2sh, k), ktab(hg2sl, k)))
        fr_parts.append(er_k)
        fi_parts.append(ei_k)
    fr = jnp.concatenate(fr_parts, axis=0)
    fi = jnp.concatenate(fi_parts, axis=0)
    out_r, _ = _small_dft_slabs(g1c, g1s, fr, fi, n1, block_rows,
                                real_out=True)
    for j in range(n1):
        y = out_r[j * block_rows : (j + 1) * block_rows]
        if out_u8:
            y = jnp.clip(jnp.floor(y + 0.5), 0, 255)
            y = y.astype(jnp.int32).astype(jnp.uint8)
        o_ref[:, j * n2 : (j + 1) * n2] = y


def _small_dft_list(fc_ref, fs_ref, xr_slabs, xi_slabs, n1: int,
                    real_out: bool = False):
    """``_small_dft_slabs`` over explicit slab lists (natural chunks)."""
    out_r, out_i = [], []
    for k in range(n1):
        acc_r = fc_ref[k, 0] * xr_slabs[0]
        acc_i = fs_ref[k, 0] * xr_slabs[0]
        if xi_slabs is not None:
            acc_r = acc_r - fs_ref[k, 0] * xi_slabs[0]
            acc_i = acc_i + fc_ref[k, 0] * xi_slabs[0]
        for j in range(1, n1):
            c, sn = fc_ref[k, j], fs_ref[k, j]
            acc_r = acc_r + c * xr_slabs[j]
            acc_i = acc_i + sn * xr_slabs[j]
            if xi_slabs is not None:
                acc_r = acc_r - sn * xi_slabs[j]
                acc_i = acc_i + c * xi_slabs[j]
        out_r.append(acc_r)
        if not real_out:
            out_i.append(acc_i)
    res_r = jnp.concatenate(out_r, axis=0)
    if real_out:
        return res_r, None
    return res_r, jnp.concatenate(out_i, axis=0)


def _osfilt_kernel(f1c, f1s, tc, ts, f2c, f2s, hc, hs, g1c, g1s, g2c, g2s,
                   seg_ref, o_ref, *, n1, n2, block_rows, out_u8):
    """Fused: real forward FFT → spectrum × H → inverse FFT → real out.

    Segments may arrive uint8 (widened to f32 in VMEM — 4× less HBM read
    traffic than pre-widened floats).  With ``out_u8`` the hardware
    output stage (round-half-up, saturate to [0, 255]) is fused too, so
    the block never leaves the chip as a float.
    """
    seg = seg_ref[:]
    if seg.dtype != jnp.float32:
        # Mosaic has no direct u8→f32 cast; widen via int32.
        seg = seg.astype(jnp.int32).astype(jnp.float32)
    seg_m = _nat_to_m(seg, n1, block_rows, n2)
    cr, ci = _fwd_stage(seg_m, None, f1c, f1s, tc, ts, f2c, f2s,
                        n1, block_rows, n2)
    hcr = hc[:]  # pre-repeated to (N1·R, N2), see _fwd_stage
    hsr = hs[:]
    dr = cr * hcr - ci * hsr
    di = cr * hsr + ci * hcr
    or_, _ = _inv_stage(dr, di, tc, ts, g1c, g1s, g2c, g2s,
                        n1, block_rows, n2, real_out=True)
    y = _m_to_nat(or_, n1, block_rows, n2)
    if out_u8:
        y = jnp.clip(jnp.floor(y + 0.5), 0, 255)
        y = y.astype(jnp.int32).astype(jnp.uint8)  # no direct f32→u8 cast
    o_ref[:] = y


# ---------------------------------------------------------------------------
# r5 stream kernel: frame → FFT → filter → IFFT → unframe in ONE pass
# ---------------------------------------------------------------------------
#
# The r5 granularity probe (docs/roofline.md, "FFT: the framing passes
# were the bottleneck") showed the fused v2 kernel itself runs at
# 18-21 Gsps at EVERY program granularity — the 2.4-2.6 Gsps full-path
# plateau was the XLA-side ``frame_overlap`` + valid-slice/reshape
# passes (11.5 of 13 ms, ~23 GB/s — pathological lowering).  This
# kernel deletes those passes structurally: each program reads an
# ALIGNED slab of the raw (C, T) stream (plus one halo lane-tile on
# each side), builds the overlapping segments in VMEM, runs the folded
# 4-step DFT filter, and writes back only the valid output samples.
#
# Alignment trick: with hop = nfft/2 = 256 every window start is a
# lane-tile multiple, and a spectral shift ``d`` folded into H
# (H_d[k] = H[k]·e^{-2πi·k·d/nfft}, which circularly delays the output
# by d) places the valid (wrap-free) region exactly on the window's
# aligned column chunks [nfft/2, nfft).  Choosing
# ``d = (-(off + center)) mod 128`` also absorbs an arbitrary output
# offset ``off`` (used by the sharded path to emit the halo-extended
# block's interior directly), valid while d <= nfft/2 + 1 - L.
#
# Stream edges are handled with per-lane masks (global column iota vs
# [0, Tx)), so ANY (C, T) — no 128-multiple requirement, no host pad,
# no output slice — runs with zero XLA data passes.


#: Windows per stream-kernel program target ~512 segment rows
#: (R·C) — the granularity probe measured 17-21 Gsps flat across
#: 64..1024 rows, so the choice is uncritical.
_STREAM_TARGET_ROWS = 512


def _stream_geometry(num_taps: int, off: int):
    """Single source of truth for the stream kernel's alignment class.

    Returns ``(center, d, m_shift, hop_tiles)``: the spectral shift
    ``d = (-(off+center)) mod 128`` folded into H, the window-placement
    offset ``m_shift = (off+center+d)/128``, and the window hop (3 lane
    tiles when the class admits the 3-chunk valid window — d ≤ 129−L —
    else 2).  Every consumer (the support gate, the table builder, the
    pallas wrapper) derives from here; divergent copies would silently
    desynchronize the folded tables from the window placement.
    """
    center = num_taps // 2
    d = (-(off + center)) % LANE
    m_shift = (off + center + d) // LANE
    hop = 3 if d <= LANE + 1 - num_taps else 2
    return center, d, m_shift, hop


def stream_kernel_supported(num_taps: int, off: int = 0,
                            nfft: int = 512) -> bool:
    """Gate for the r5 stream overlap-save kernel (nfft=512 4-step)."""
    if nfft != 512:
        return False
    _, d, _, _ = _stream_geometry(num_taps, off)
    return (1 <= num_taps <= 257 and off >= 0 and off + num_taps // 2 <= 256
            and d <= nfft // 2 + 1 - num_taps)


def _osfilt_spectrum_shifted(h64, nfft: int, d: int):
    """Scrambled-order filter spectrum with the alignment shift folded
    in (circularly delays the filtered output by ``d`` samples)."""
    n1, n2 = factor_nfft(nfft)
    k = np.arange(nfft)
    h_freq = np.fft.fft(np.asarray(h64, np.float64), nfft)
    h_freq = h_freq * np.exp(-2j * np.pi * k * d / nfft)
    hp = np.ascontiguousarray(h_freq.reshape(n2, n1).T)
    return (np.ascontiguousarray(hp.real, np.float32),
            np.ascontiguousarray(hp.imag, np.float32))


def _osfilt_stream_kernel(f1c, f1s, t2fch, t2fcl, t2fsh, t2fsl,
                          g1c, g1s, hg2ch, hg2cl, hg2sh, hg2sl,
                          x_ref, hl_ref, hr_ref, o_ref, *,
                          r_windows, channels, tx, m_shift, hop_tiles,
                          out_u8):
    """One program: R overlapping 512-windows over an aligned slab.

    Segment rows are ordered (window-major, channel-minor); the DFT /
    folded-dot pipeline is the verified ``_osfilt_kernel_v2`` math with
    ``block_rows = R·C``.  ``hop_tiles`` ∈ {2, 3} is the window hop in
    lane tiles: hop 2 keeps the valid half-window on chunks [2, 4)
    (2× overlap, works for every supported (L, off)); hop 3 (r5b)
    keeps chunks [1, 4) valid (1.33× overlap — ~33% less FFT math per
    sample) and engages when the alignment class allows it
    (``d ≤ 129 − L``, e.g. the sharded/bench path's off = L−1−center).
    ``m_shift`` = (off+d+center)/128 ∈ {0, 1, 2} positions the
    windows: window r, chunk jc reads global lane-tile
    ``j·hop·R + hop·r + jc + m_shift − c0`` with ``c0 = 4 − hop``.
    """
    n1, n2 = 4, LANE
    r_n = r_windows
    hop = hop_tiles
    c0 = n1 - hop
    br = r_n * channels
    j = pl.program_id(0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (channels, n2), 1)
    tiles = {}
    g_lo = m_shift - c0
    g_hi = hop * (r_n - 1) + (n1 - 1) + m_shift - c0
    for g in range(g_lo, g_hi + 1):
        if g < 0:
            src = hl_ref[:, (g + 2) * n2:(g + 3) * n2]
        elif g < hop * r_n:
            src = x_ref[:, g * n2:(g + 1) * n2]
        else:
            gg = g - hop * r_n
            src = hr_ref[:, gg * n2:(gg + 1) * n2]
        if src.dtype != jnp.float32:
            src = src.astype(jnp.int32).astype(jnp.float32)
        t = j * (hop * r_n) + g
        cols = col_iota + t * n2
        tiles[g] = jnp.where((cols >= 0) & (cols < tx), src, 0.0)
    xr_slabs = [
        jnp.concatenate(
            [tiles[hop * r + jc + m_shift - c0] for r in range(r_n)],
            axis=0)
        for jc in range(n1)
    ]
    ar, ai = _small_dft_list(f1c, f1s, xr_slabs, None, n1)

    def ktab(ref, k):
        return ref[k * n2:(k + 1) * n2]

    fr_parts, fi_parts = [], []
    for k in range(n1):
        sl = slice(k * br, (k + 1) * br)
        cr_k, ci_k = _cmatmul_s(
            _ps3(ar[sl]), _ps3(ai[sl]),
            (ktab(t2fch, k), ktab(t2fcl, k)),
            (ktab(t2fsh, k), ktab(t2fsl, k)))
        er_k, ei_k = _cmatmul_s(
            _ps3(cr_k), _ps3(ci_k),
            (ktab(hg2ch, k), ktab(hg2cl, k)),
            (ktab(hg2sh, k), ktab(hg2sl, k)))
        fr_parts.append(er_k)
        fi_parts.append(ei_k)

    # Inverse outer DFT — only the valid chunks p ∈ [128·c0, 512).
    for k in range(c0, n1):
        acc = g1c[k, 0] * fr_parts[0] - g1s[k, 0] * fi_parts[0]
        for jj in range(1, n1):
            acc = (acc + g1c[k, jj] * fr_parts[jj]
                   - g1s[k, jj] * fi_parts[jj])
        if out_u8:
            acc = jnp.clip(jnp.floor(acc + 0.5), 0, 255)
            acc = acc.astype(jnp.int32).astype(jnp.uint8)
        for r in range(r_n):
            base = r * hop * n2 + (k - c0) * n2
            o_ref[:, base:base + n2] = acc[r * channels:
                                           (r + 1) * channels]


def _stream_r_windows(channels: int) -> int:
    return max(1, min(64, _STREAM_TARGET_ROWS // max(channels, 1)))


@functools.partial(
    jax.jit,
    static_argnames=("num_taps", "off", "out_len", "r_windows",
                     "interpret", "out_u8"),
)
def _osfilt_stream(x, tables, num_taps, off, out_len, r_windows,
                   interpret, out_u8=False):
    """Pallas call for the stream kernel over raw (C, Tx) input."""
    channels, tx = x.shape
    _, _, m_shift, hop = _stream_geometry(num_taps, off)
    r_n = r_windows
    if hop == 3 and r_n % 2:
        r_n += 1  # keep the program span a 256-multiple for halo specs
    sw = hop * LANE * r_n
    grid = (-(-out_len // sw),)
    mats = [tables["f1c"], tables["f1s"],
            tables["t2fch"], tables["t2fcl"],
            tables["t2fsh"], tables["t2fsl"],
            tables["g1c"], tables["g1s"],
            tables["hg2ch"], tables["hg2cl"],
            tables["hg2sh"], tables["hg2sl"]]
    kernel = functools.partial(
        _osfilt_stream_kernel, r_windows=r_n, channels=channels, tx=tx,
        m_shift=m_shift, hop_tiles=hop, out_u8=out_u8)
    hblk = -(-tx // 256) - 1  # last 256-wide halo block index
    spt = sw // 256  # 256-blocks per program span
    main_spec = pl.BlockSpec((channels, sw), lambda j: (0, j),
                             memory_space=pltpu.VMEM)
    hl_spec = pl.BlockSpec(
        (channels, 256),
        lambda j: (0, jnp.maximum(j * spt - 1, 0)),
        memory_space=pltpu.VMEM)
    hr_spec = pl.BlockSpec(
        (channels, 256),
        lambda j: (0, jnp.minimum(j * spt + spt, jnp.maximum(hblk, 0))),
        memory_space=pltpu.VMEM)
    out_dtype = jnp.uint8 if out_u8 else jnp.float32
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_plane_specs(4, [m.shape for m in mats])
        + [main_spec, hl_spec, hr_spec],
        out_specs=pl.BlockSpec((channels, sw), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((channels, out_len), out_dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*mats, x, x, x)


def _stream_tables(h64, num_taps: int, off: int):
    """Folded + pre-split stream-kernel tables (host-side numpy)."""
    _, d, _, _ = _stream_geometry(num_taps, off)
    hc, hs = _osfilt_spectrum_shifted(h64, 512, d)
    return _osfilt_fold_tables(hc, hs, _dft_tables(512), 4, LANE)


def fir_overlap_save_stream(
    x,
    h,
    *,
    off: int = 0,
    out_len: int | None = None,
    r_windows: int | None = None,
    interpret: bool | None = None,
    out_u8: bool = False,
) -> jax.Array:
    """Float32 same-mode FIR via the r5 zero-copy stream kernel.

    ``out[q] = same_mode_fir(x, h)[q + off]`` for ``q < out_len``
    (default ``x.shape[1] - off``), zero-pad semantics outside the
    input.  No framing, padding, or slicing pass ever touches HBM —
    the kernel reads the raw stream and writes the valid output
    directly (see the module-section comment for the alignment math).
    """
    h64 = np.asarray(h, np.float64)
    num_taps = int(h64.size)
    if not stream_kernel_supported(num_taps, off):
        raise ValueError(
            f"stream kernel unsupported for num_taps={num_taps}, "
            f"off={off} (need L <= 257 and the d-gate, see "
            "stream_kernel_supported); use fir_overlap_save_pallas")
    interpret = _use_interpret() if interpret is None else interpret
    x = jnp.asarray(x)
    if x.dtype != jnp.uint8:
        x = x.astype(jnp.float32)
    channels, tx = x.shape
    out_len = tx - off if out_len is None else out_len
    if out_len < 1 or off < 0:
        raise ValueError(f"invalid off={off} / out_len={out_len}")
    r_n = _stream_r_windows(channels) if r_windows is None else r_windows
    tables = _stream_tables(h64, num_taps, off)
    tables = {k: jnp.asarray(v) for k, v in tables.items()}
    return _osfilt_stream(x, tables, num_taps, off, out_len, r_n,
                          interpret, out_u8)


# ---------------------------------------------------------------------------
# Host wrappers
# ---------------------------------------------------------------------------


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _plane_specs(n1: int, shapes: list[tuple[int, int]]):
    """Constant-block specs for the DFT table operands."""
    return [
        pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for shape in shapes
    ]


def _repeat_rows(mat, block_rows: int):
    """(N1, N2) table → (N1·R, N2) row-repeated operand (XLA-side).

    The twiddle/spectrum multiplies act on (N1·R, N2) planes with rows
    (k1-major, r-minor); repeating the table on the host turns an
    in-kernel full-plane sublane relayout per block into a one-time
    HBM table build."""
    return jnp.repeat(mat, block_rows, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("nfft", "inverse", "real_input", "block_rows",
                     "interpret"),
)
def _fft_m_layout(xr_m, xi_m, tables, nfft, inverse, real_input, block_rows,
                  interpret):
    n1, n2 = factor_nfft(nfft)
    # Forward input is natural (B_pad, nfft); inverse input is a
    # scrambled m-layout plane (N1, B_pad·N2).
    if inverse:
        batch_rows = xr_m.shape[1] // n2
    else:
        batch_rows = xr_m.shape[0]
    cols = batch_rows * n2
    grid = (batch_rows // block_rows,)
    tcr = _repeat_rows(tables["tc"], block_rows)
    tsr = _repeat_rows(tables["ts"], block_rows)
    if inverse:
        mats = [tables["g1c"], tables["g1s"], tcr, tsr,
                tables["g2c"], tables["g2s"]]
        kernel = functools.partial(_ifft_kernel, n1=n1, n2=n2,
                                   block_rows=block_rows)
    elif real_input:
        mats = [tables["f1c"], tables["f1s"], tcr, tsr,
                tables["f2c"], tables["f2s"]]
        kernel = functools.partial(_fft_kernel_real, n1=n1, n2=n2,
                                   block_rows=block_rows)
    else:
        mats = [tables["f1c"], tables["f1s"], tcr, tsr,
                tables["f2c"], tables["f2s"]]
        kernel = functools.partial(_fft_kernel, n1=n1, n2=n2,
                                   block_rows=block_rows)
    m_spec = pl.BlockSpec((n1, block_rows * n2), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    nat_spec = pl.BlockSpec((block_rows, nfft), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    m_shape = jax.ShapeDtypeStruct((n1, cols), jnp.float32)
    nat_shape = jax.ShapeDtypeStruct((batch_rows, nfft), jnp.float32)
    num_data = 1 if (real_input and not inverse) else 2
    data = (xr_m,) if num_data == 1 else (xr_m, xi_m)
    if inverse:
        in_spec, out_spec, out_shape = m_spec, nat_spec, nat_shape
    else:
        # Forward input is natural (B, nfft); output stays in scrambled
        # m-layout (host unscrambles to natural spectral order).
        in_spec, out_spec, out_shape = nat_spec, m_spec, m_shape
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_plane_specs(n1, [m.shape for m in mats])
        + [in_spec] * num_data,
        out_specs=(out_spec, out_spec),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(*mats, *data)


def fft_rows_pallas(
    xr,
    xi=None,
    *,
    inverse: bool = False,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Batched complex FFT over rows via MXU matmuls.

    Args:
      xr, xi: real/imaginary planes of shape (B, nfft); ``xi=None`` means
        real input (forward only — an inverse needs a full spectrum).
      inverse: compute the scaled inverse transform (1/nfft folded in).

    Returns ``(re, im)`` planes of shape (B, nfft), natural order —
    matching ``jnp.fft.fft`` / ``jnp.fft.ifft`` up to float32 rounding.
    """
    xr = jnp.asarray(xr, jnp.float32)
    batch, nfft = xr.shape
    n1, n2 = factor_nfft(nfft)
    if inverse and xi is None:
        raise ValueError("inverse FFT requires both re and im planes")
    interpret = _use_interpret() if interpret is None else interpret
    block_rows = _auto_block_rows(nfft, batch)
    b_pad = _round_up(max(batch, 1), block_rows)

    pad = ((0, b_pad - batch), (0, 0))
    xr_p = jnp.pad(xr, pad)
    xi_p = None if xi is None else jnp.pad(jnp.asarray(xi, jnp.float32), pad)

    tables = {
        k: jnp.asarray(v) for k, v in _dft_tables(nfft).items()
    }
    if inverse:
        xr_in = _scramble(xr_p, n1, n2)
        xi_in = _scramble(xi_p, n1, n2)
    else:
        xr_in, xi_in = xr_p, xi_p  # natural layout, transposed in-kernel
    out_a, out_b = _fft_m_layout(
        xr_in, xi_in, tables, nfft, inverse, xi is None, block_rows,
        interpret
    )
    if inverse:
        return out_a[:batch], out_b[:batch]  # kernel emits natural layout
    return _unscramble(out_a, n1, n2)[:batch], _unscramble(out_b, n1, n2)[:batch]


@functools.partial(
    jax.jit, static_argnames=("nfft", "block_rows", "interpret", "out_u8")
)
def _osfilt_natural(segments, hc, hs, tables, nfft, block_rows, interpret,
                    out_u8=False):
    """Fused overlap-save filter over natural (B_pad, nfft) segments."""
    n1, n2 = factor_nfft(nfft)
    b_pad = segments.shape[0]
    grid = (b_pad // block_rows,)
    tcr = _repeat_rows(tables["tc"], block_rows)
    tsr = _repeat_rows(tables["ts"], block_rows)
    if 1 < n1 <= _VPU_DFT_MAX:
        # r4 pass-deleted kernel: per-k1 folded tables, built ALREADY
        # bf16-pre-split by ``_osfilt_fold_tables`` in the caller
        # (outside this function's jit boundary; hc/hs ride inside the
        # hg2 fold, so they are not separate operands here).
        mats = [tables["f1c"], tables["f1s"],
                tables["t2fch"], tables["t2fcl"],
                tables["t2fsh"], tables["t2fsl"],
                tables["g1c"], tables["g1s"],
                tables["hg2ch"], tables["hg2cl"],
                tables["hg2sh"], tables["hg2sl"]]
        kernel = functools.partial(_osfilt_kernel_v2, n1=n1, n2=n2,
                                   block_rows=block_rows, out_u8=out_u8)
        data_spec = pl.BlockSpec((block_rows, nfft), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        out_dtype = jnp.uint8 if out_u8 else jnp.float32
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=_plane_specs(n1, [m.shape for m in mats]) + [data_spec],
            out_specs=data_spec,
            out_shape=jax.ShapeDtypeStruct((b_pad, nfft), out_dtype),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(*mats, segments)
    mats = [tables["f1c"], tables["f1s"], tcr, tsr,
            tables["f2c"], tables["f2s"]]
    mats += [_repeat_rows(hc, block_rows), _repeat_rows(hs, block_rows)]
    mats += [tables[k] for k in ("g1c", "g1s", "g2c", "g2s")]
    kernel = functools.partial(_osfilt_kernel, n1=n1, n2=n2,
                               block_rows=block_rows, out_u8=out_u8)
    data_spec = pl.BlockSpec((block_rows, nfft), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_dtype = jnp.uint8 if out_u8 else jnp.float32
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_plane_specs(n1, [m.shape for m in mats]) + [data_spec],
        out_specs=data_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, nfft), out_dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*mats, segments)


def _osfilt_segments(x, num_taps: int, nfft: int,
                     block_rows: int | None = None):
    """Frame a (C, T) stream into padded overlap-save segments.

    Keeps the input dtype (uint8 frames move 4× less HBM traffic than
    pre-widened floats; the kernel widens in VMEM).  ``block_rows``
    overrides the VMEM-budget auto choice (r5 granularity experiments).
    """
    from warmup_fir_filter_tpu.ops.fftfilt import frame_overlap

    channels, time = x.shape
    center = num_taps // 2
    step = nfft - (num_taps - 1)
    num_blocks = -(-time // step)
    left = num_taps - 1 - center
    right = num_blocks * step - time + center + (num_taps - 1)
    xp = jnp.pad(x, ((0, 0), (left, right)))
    segments = frame_overlap(xp, nfft, step, num_blocks).reshape(
        channels * num_blocks, nfft
    )
    batch = channels * num_blocks
    if block_rows is None:
        block_rows = _auto_block_rows(nfft, batch)
    b_pad = _round_up(batch, block_rows)
    segments = jnp.pad(segments, ((0, b_pad - batch), (0, 0)))
    return segments, batch, block_rows, step, num_blocks


def _osfilt_spectrum(h64, nfft: int):
    """Filter spectrum permuted to the kernel's scrambled (k1, k2) order."""
    n1, n2 = factor_nfft(nfft)
    h_freq = np.fft.fft(h64, nfft)
    hp = np.ascontiguousarray(h_freq.reshape(n2, n1).T)
    # numpy, not jnp: the fold/pre-split table path must stay host-side
    # even when the caller runs under an outer jit (h is static there).
    return (np.ascontiguousarray(hp.real, np.float32),
            np.ascontiguousarray(hp.imag, np.float32))


def fir_overlap_save_pallas(
    x,
    h,
    *,
    nfft: int | None = None,
    interpret: bool | None = None,
    block_rows: int | None = None,
) -> jax.Array:
    """Float32 same-mode FIR via the fused Pallas overlap-save kernel.

    Drop-in equivalent of :func:`ops.fftfilt.fir_overlap_save` (same
    alignment contract, ``ops/fftfilt.py``), with the whole
    FFT → multiply → IFFT block pipeline fused into one VMEM-resident
    Pallas kernel.
    """
    from warmup_fir_filter_tpu.ops.fftfilt import pick_nfft

    h64 = np.asarray(h, np.float64)
    num_taps = int(h64.size)
    auto_nfft = nfft is None
    nfft = pick_nfft(num_taps) if nfft is None else nfft
    _check_nfft_for_taps(nfft, num_taps)
    n1, n2 = factor_nfft(nfft)
    interpret = _use_interpret() if interpret is None else interpret

    # r5 fast path: the zero-copy stream kernel (same SNR contract,
    # ~5× the framed path on v5e — the framing passes WERE the
    # bottleneck, docs/roofline.md).  Only when the caller did not pin
    # a specific nfft (the stream kernel is a 512-point 4-step).
    if (auto_nfft and block_rows is None
            and stream_kernel_supported(num_taps)):
        return fir_overlap_save_stream(x, h, interpret=interpret)

    x_f32 = jnp.asarray(x, jnp.float32)
    channels, time = x_f32.shape
    segments, batch, block_rows, step, num_blocks = _osfilt_segments(
        x_f32, num_taps, nfft, block_rows
    )
    hc, hs = _osfilt_spectrum(h64, nfft)
    # numpy tables, folded + bf16-pre-split on the HOST (outside any
    # jit trace — a tracer here would break the split, and XLA's
    # excess-precision fusion would zero the lo planes, see
    # _presplit_host).
    tables = _osfilt_fold_tables(hc, hs, _dft_tables(nfft),
                                 *factor_nfft(nfft))
    y = _osfilt_natural(segments, hc, hs, tables, nfft, block_rows,
                        interpret)[:batch]

    valid = y[:, num_taps - 1:]  # overlap-save discard
    out = valid.reshape(channels, num_blocks * step)
    return out[:, :time]


def fir_overlap_save_quantized_pallas(x_u8, h, qformat=None, *,
                                      nfft: int | None = None,
                                      interpret: bool | None = None):
    """Fused Pallas FFT path + hardware output stage → uint8.

    Mirrors :func:`ops.fftfilt.fir_overlap_save_quantized`: quantized
    coefficients, round-half-up, saturate — comparable to the bit-exact
    sim within the SNR bound.
    """
    from warmup_fir_filter_tpu.ops.fftfilt import pick_nfft
    from warmup_fir_filter_tpu.ops.qformat import QFormat

    qformat = QFormat() if qformat is None else qformat
    h_fixed = qformat.quantize_coeffs(np.asarray(h)).astype(np.float64)
    h_real = h_fixed / qformat.scale

    num_taps = int(h_real.size)
    auto_nfft = nfft is None
    nfft = pick_nfft(num_taps) if nfft is None else nfft
    _check_nfft_for_taps(nfft, num_taps)
    interpret = _use_interpret() if interpret is None else interpret

    if auto_nfft and stream_kernel_supported(num_taps):
        # r5: zero-copy stream kernel with the fused u8 output stage.
        return fir_overlap_save_stream(
            jnp.asarray(x_u8, jnp.uint8), h_real, interpret=interpret,
            out_u8=True)

    # End-to-end uint8: frames stay u8 into the kernel (widened in VMEM)
    # and the round-half-up/saturate output stage is fused in-kernel, so
    # no float plane ever touches HBM.
    x_u8 = jnp.asarray(x_u8, jnp.uint8)
    channels, time = x_u8.shape
    segments, batch, block_rows, step, num_blocks = _osfilt_segments(
        x_u8, num_taps, nfft
    )
    hc, hs = _osfilt_spectrum(h_real, nfft)
    tables = _osfilt_fold_tables(hc, hs, _dft_tables(nfft),
                                 *factor_nfft(nfft))
    y = _osfilt_natural(segments, hc, hs, tables, nfft, block_rows,
                        interpret, out_u8=True)[:batch]
    valid = y[:, num_taps - 1:]
    out = valid.reshape(channels, num_blocks * step)
    return out[:, :time]
