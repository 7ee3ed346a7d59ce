"""Pallas TPU kernel for the diploid pair-likelihood reduction.

LL[c1, c2] = sum_r logavg(L[c1, r], L[c2, r])
           = sum_r [ max + log1p(exp(-|a-b|)) ] + C_half          (per read)

This is the reference's only OpenMP-parallel hot loop
(HLATyper.cpp:2280-2364) and 'hard part #2' of SURVEY.md §7: O(C^2 R) with C
up to a few thousand clusters per locus.  XLA's fused elementwise version
materialises [C, C, chunk] intermediates; this kernel tiles the output into
[TC, TC] VMEM blocks and streams R in chunks via the grid, accumulating in
place — VPU-bound at ~6 flops per (c1, c2, r) cell.

Only the difference part is computed on device (bounded magnitudes keep f32
exact); the rank-1 0.5*(rowsum_a + rowsum_b) + R*log(1/2) term is added by
the host wrapper in f64 — same decomposition as ops/pair_ll.py.

Measured on TPU v5e with ON-DEVICE inputs (r3; C=2200, R=16384, chunk 26):
**XLA scan 287 Gcells/s** — the whole IMGT-scale C^2 reduction for a locus
in 0.28 s, numerically verified against the numpy f64 path.  The round-2
figure of 11.5 Gcells/s (and the kernel comparisons v1 10.8 / v2 4.3 at
C=2048, R=4096) was TRANSFER-BOUND: the 33 MB input moved through the
~20 MB/s tunnel inside the timed region, exactly the trap CLAUDE.md warns
about — those numbers measured the tunnel, not the chip.  The XLA path
stays the default (ops/pair_ll.pair_ll_reduction) and these Pallas kernels
are kept as optimisation baselines; at 287 G the scan is within reach of
the VPU transcendental throughput (2 f32 exp/log1p per cell), so kernel
headroom, if any, is small.
"""

from __future__ import annotations

import functools

import numpy as np

LOG_HALF = float(np.log(0.5))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=16)
def _make_kernel(Cp: int, Rp: int, TC: int, TR: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_r = Rp // TR

    def kernel(a_ref, b_ref, out_ref):
        r = pl.program_id(2)

        @pl.when(r == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # Mosaic-aligned micro-tiling: c1 in 8-sublane strips, c2 across the
        # full TC lanes, r in 128-lane chunks.  Per (c1s, rs):
        #   d[c1, c2, r] = |a[c1, r] - b[c2, r]|     (8 x TC x 128 vreg block)
        #   acc[c1, c2] += sum_r 0.5*d + log1p(exp(-d))
        SC = min(8, TC)          # c1 strip height (sublane-aligned)
        RC = min(128, TR)        # r chunk width (lane-aligned)

        def c1_loop(c1s, _):
            def r_loop(rs, acc):
                av = a_ref[pl.ds(c1s * SC, SC), pl.ds(rs * RC, RC)]
                bv = b_ref[:, pl.ds(rs * RC, RC)]                # [TC, RC]
                d = jnp.abs(av[:, None, :] - bv[None, :, :])     # [SC, TC, RC]
                t = 0.5 * d + jnp.log1p(jnp.exp(-d))
                return acc + t.sum(axis=2)

            acc = jax.lax.fori_loop(0, TR // RC, r_loop,
                                    jnp.zeros((SC, TC), jnp.float32))
            out_ref[pl.ds(c1s * SC, SC), :] += acc
            return 0

        jax.lax.fori_loop(0, TC // SC, c1_loop, 0)

    grid = (Cp // TC, Cp // TC, n_r)

    @jax.jit
    def run(Lp):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TC, TR), lambda i, j, r: (i, r)),
                pl.BlockSpec((TC, TR), lambda i, j, r: (j, r)),
            ],
            out_specs=pl.BlockSpec((TC, TC), lambda i, j, r: (i, j)),
            out_shape=jax.ShapeDtypeStruct((Cp, Cp), jnp.float32),
            interpret=interpret,
        )(Lp, Lp)

    return run


@functools.lru_cache(maxsize=16)
def _make_kernel_v2(Cp: int, Rp: int, TC: int, TR: int, interpret: bool):
    """Deferred-accumulation variant: per (i, j) output tile, a VMEM scratch
    acc3[strip][8, TC, TR] accumulates the elementwise part across read
    chunks with NO per-chunk lane reduction; the reduction over the read
    lanes happens once at the last chunk.  ~7 vector passes per
    [8, TC, TR] micro-block."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_r = Rp // TR
    SC = min(8, TC)
    n_s = TC // SC

    def kernel(a_ref, b_ref, out_ref, acc3):
        r = pl.program_id(2)

        @pl.when(r == 0)
        def _():
            acc3[:] = jnp.zeros_like(acc3)

        for s in range(n_s):
            a8 = a_ref[pl.ds(s * SC, SC), :]                 # [SC, TR]
            b = b_ref[:]                                     # [TC, TR]
            d = jnp.abs(a8[:, None, :] - b[None, :, :])      # [SC, TC, TR]
            acc3[s] += 0.5 * d + jnp.log1p(jnp.exp(-d))

        @pl.when(r == n_r - 1)
        def _():
            for s in range(n_s):
                out_ref[pl.ds(s * SC, SC), :] = acc3[s].sum(axis=2)

    grid = (Cp // TC, Cp // TC, n_r)

    @jax.jit
    def run(Lp):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TC, TR), lambda i, j, r: (i, r)),
                pl.BlockSpec((TC, TR), lambda i, j, r: (j, r)),
            ],
            out_specs=pl.BlockSpec((TC, TC), lambda i, j, r: (i, j)),
            out_shape=jax.ShapeDtypeStruct((Cp, Cp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((n_s, SC, TC, TR), jnp.float32)],
            interpret=interpret,
        )(Lp, Lp)

    return run


def pair_ll_reduction_pallas(L: np.ndarray, tc: int = 128, tr: int = 256,
                             interpret: bool | None = None,
                             version: int = 2) -> np.ndarray:
    """Full [C, C] pair log-likelihood matrix via the Pallas kernel.
    Pads C to a TC multiple and R to a TR multiple; padded reads hold value 0
    whose diff-part contribution log(2) cancels against LOG_HALF exactly."""
    import jax

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if version == 2:
        tr = 128
    C, R = L.shape
    Cp = _round_up(max(C, tc), tc)
    Rp = _round_up(max(R, tr), tr)
    Lp = np.zeros((Cp, Rp), dtype=np.float32)
    Lp[:C, :R] = L
    mk = _make_kernel_v2 if version == 2 else _make_kernel
    run = mk(Cp, Rp, tc, tr, bool(interpret))
    acc = np.asarray(run(Lp), dtype=np.float64)[:C, :C]
    rowsum = L.astype(np.float64).sum(axis=1)
    base = 0.5 * (rowsum[:, None] + rowsum[None, :])
    return base + acc + LOG_HALF * Rp
