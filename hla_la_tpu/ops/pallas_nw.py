"""Pallas TPU kernel for the batched banded glocal affine NW forward pass.

Same contract as ops/banded_nw.banded_nw_forward / make_jax_banded_nw
(scores, end_k, end_state, pointers — identical scores and pointer bits).

Layout: reads are the LANE dimension (TB = 128 reads per grid block), the
band is the SUBLANE dimension (W rows) — every vector op runs at full lane
width, unlike the [B, W] XLA layout where W=32 uses a quarter of each vreg.
The row loop is a fori_loop inside the kernel; the within-row affine
deletion recurrence uses the closed-form running max (Hillis-Steele over
log2(W) static sublane shifts — docs/DESIGN.md §2).

Inputs are pre-transposed by the jitted wrapper: readsT [L, B],
refsT [L+W, B]; pointer output comes back as [B, L+1, W] after an XLA
transpose of the kernel's [L+1, W, TB] blocks.

Batch-size note: peak throughput is at B=4096 (46 Gcells/s on
v5e); 16k+ batches drop to ~22 G (HBM-write bound on the pointer
tensor) — callers slice accordingly (aligner._jobs_to_alignments).
"""

from __future__ import annotations

import functools

import numpy as np

NEG = np.float32(-1e30)


@functools.lru_cache(maxsize=8)
def make_pallas_banded_nw(L: int, W: int, match: float = 2.0,
                          mismatch: float = -5.0, gap_open: float = -6.0,
                          gap_extend: float = -2.0,
                          interpret: bool | None = None, tb: int = 128):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    neg = float(NEG)          # plain python floats: jnp scalars created at
    open_ = float(gap_open)   # closure scope would be captured consts
    ext = float(gap_extend)
    TB = tb

    n_shifts = max(int(np.ceil(np.log2(max(W, 2)))), 1)

    def kernel(ends_ref, readsT_ref, refsT_ref, lens_ref,
               score_ref, endk_ref, endstate_ref, ptr_ref,
               D_s, IY_s, IX_s, best_s):
        blk = pl.program_id(0)
        # D_s/IY_s/IX_s: [W, TB] scratch; best_s: [8, TB] rows
        # (0=score, 1=k, 2=state; padded to a full sublane tile)
        D_s[:] = jnp.zeros((W, TB), jnp.float32)
        IY_s[:] = jnp.full((W, TB), neg)
        IX_s[:] = jnp.full((W, TB), neg)
        best_s[:] = jnp.zeros((8, TB), jnp.float32)
        best_s[0:1, :] = jnp.full((1, TB), neg)
        lens_row = lens_ref[0:1, :][0]                       # [TB] int32
        ptr_ref[0:1] = jnp.zeros((1, W, TB), jnp.int32)

        k_iota = jax.lax.broadcasted_iota(jnp.int32, (W, TB), 0
                                          ).astype(jnp.float32)

        def harvest(i):
            D, IY, IX = D_s[:], IY_s[:], IX_s[:]
            at_end = (lens_row == i)[None, :]           # [1, TB]
            # max + first-argmax over state-major [D, IY, IX] x k
            def red(mat):
                m = jnp.max(mat, axis=0, keepdims=True)       # [1, TB]
                mb = jnp.broadcast_to(m, (W, TB))
                kk = jnp.min(jnp.where(mat >= mb, k_iota, jnp.float32(W)),
                             axis=0, keepdims=True)
                return m, kk
            mD, kD = red(D)
            mIY, kIY = red(IY)
            mIX, kIX = red(IX)
            best = jnp.maximum(jnp.maximum(mD, mIY), mIX)
            state = jnp.where(mD >= best, 0.0,
                              jnp.where(mIY >= best, 1.0, 2.0))
            kbest = jnp.where(mD >= best, kD,
                              jnp.where(mIY >= best, kIY, kIX))
            upd = at_end & (lens_row >= 0)[None, :]
            best_s[0:1, :] = jnp.where(upd, best, best_s[0:1, :])
            best_s[1:2, :] = jnp.where(upd, kbest, best_s[1:2, :])
            best_s[2:3, :] = jnp.where(upd, state, best_s[2:3, :])

        harvest(0)

        def row_body(i, read_row, ref_rows, clean: bool):
            # keep comparisons in f32: mixed-layout i1 vectors trip Mosaic
            # relayout ("replicated in destination but not in source")
            rr = jnp.broadcast_to(read_row, (W, TB))
            rf = ref_rows
            ok = rf < 4
            m_f = (jnp.where(rf == rr, 1.0, 0.0)
                   * jnp.where(rr < 4, 1.0, 0.0))
            sub = jnp.where(ok, mismatch + (match - mismatch) * m_f, neg)
            D, IY, IX = D_s[:], IY_s[:], IX_s[:]
            m12 = jnp.maximum(IY, IX)
            pb = jnp.maximum(D, m12)
            m_src = jnp.where(D >= m12, 0, jnp.where(IY >= IX, 1, 2))
            nD = pb + sub
            D_sh = jnp.concatenate([D[1:], jnp.full((1, TB), neg)], axis=0)
            IY_sh = jnp.concatenate([IY[1:], jnp.full((1, TB), neg)], axis=0)
            oc = D_sh + open_
            ec = IY_sh + ext
            nIY = jnp.maximum(oc, ec)
            iy_src = jnp.where(ec > oc, 4, 0)

            # IX closed form: IX[k] = open + (k-1)ext + cummax(g)[k-1],
            # g[k] = nD[k] - k*ext; the cummax must NOT propagate across
            # masked ref positions (N/pad = unalignable wall, matching the
            # sequential C++/numpy recurrence), so it is a SEGMENTED
            # Hillis-Steele: segment id = running count of masked rows, and
            # a shifted candidate is only taken when its segment matches.
            # `clean` (no masked position in this row window, the common
            # case away from haplotype edges) drops the segment tracking —
            # a plain cummax at a third of the vector ops.
            if clean:
                g = nD - k_iota * ext
                cm = g
                sh = 1
                for _s in range(n_shifts):
                    rolled = jnp.concatenate(
                        [jnp.full((min(sh, W), TB), neg),
                         cm[:max(W - sh, 0)]], axis=0)
                    cm = jnp.maximum(cm, rolled)
                    sh *= 2
            else:
                ok_f = jnp.where(ok, 0.0, 1.0)      # 1 at masked rows
                seg = ok_f
                sh = 1
                for _s in range(n_shifts):
                    rolled_seg = jnp.concatenate(
                        [jnp.zeros((min(sh, W), TB), jnp.float32),
                         seg[:max(W - sh, 0)]], axis=0)
                    seg = seg + rolled_seg
                    sh *= 2
                g = jnp.where(ok, nD - k_iota * ext, neg)
                cm = g
                sh = 1
                for _s in range(n_shifts):
                    rolled = jnp.concatenate(
                        [jnp.full((min(sh, W), TB), neg),
                         cm[:max(W - sh, 0)]], axis=0)
                    rolled_seg = jnp.concatenate(
                        [jnp.full((min(sh, W), TB), -1.0),
                         seg[:max(W - sh, 0)]], axis=0)
                    same = jnp.where(rolled_seg == seg, 1.0, 0.0)
                    cm = jnp.maximum(cm, jnp.where(same > 0.0, rolled, neg))
                    sh *= 2
            cm_shift = jnp.concatenate([jnp.full((1, TB), neg), cm[:-1]],
                                       axis=0)
            nIX = open_ + (k_iota - 1.0) * ext + cm_shift
            if not clean:
                nIX = jnp.where(ok, nIX, neg)
            nIX = jnp.concatenate([jnp.full((1, TB), neg), nIX[1:]], axis=0)
            ocx = jnp.concatenate([jnp.full((1, TB), neg),
                                   nD[:-1] + open_], axis=0)
            # extend-bit exactly as the sequential recurrence sets it:
            # ec = IX[k-1] + ext vs oc = D[k-1] + open (computed even at
            # masked cells, matching ops/banded_nw.py:131-136)
            ecx = jnp.concatenate([jnp.full((1, TB), neg),
                                   nIX[:-1] + ext], axis=0)
            ix_src = jnp.where(ecx > ocx, 8, 0)

            # bit packing via adds (arith.shli is not legal in Mosaic)
            ptr_ref[pl.ds(i, 1)] = (m_src + iy_src + ix_src)[None]
            D_s[:] = nD
            IY_s[:] = nIY
            IX_s[:] = nIX
            # harvest only at rows where some lane actually ends (the
            # [n_b, Lpad+8] bitmap is precomputed by the wrapper and
            # scalar-prefetched into SMEM)
            @pl.when(ends_ref[blk, i] > 0)
            def _():
                harvest(i)

        # dynamic sublane slices must be 8-aligned on TPU: walk rows in
        # blocks of 8 with static offsets inside (L is padded to 8 | L by
        # the wrapper)
        def outer(io, _):
            base = pl.multiple_of(io * 8, 8)
            read_blk = readsT_ref[pl.ds(base, 8), :]         # [8, TB]
            ref_blk = refsT_ref[pl.ds(base, W + 8), :]       # [W+8, TB]
            # one scalar test per 8-row block: windows with no masked
            # (N/pad >= 4) position take the cheap plain-cummax path
            has_mask = jnp.max(ref_blk) >= 4

            @pl.when(jnp.logical_not(has_mask))
            def _():
                for r8 in range(8):
                    i = base + r8 + 1

                    @pl.when(i <= L)
                    def _():
                        row_body(i, read_blk[r8:r8 + 1, :],
                                 ref_blk[r8:r8 + W, :], clean=True)

            @pl.when(has_mask)
            def _():
                for r8 in range(8):
                    i = base + r8 + 1

                    @pl.when(i <= L)
                    def _():
                        row_body(i, read_blk[r8:r8 + 1, :],
                                 ref_blk[r8:r8 + W, :], clean=False)
            return 0

        jax.lax.fori_loop(0, (L + 7) // 8, outer, 0, unroll=False)
        score_ref[0:1, :] = best_s[0:1, :]
        endk_ref[0:1, :] = best_s[1:2, :].astype(jnp.int32)
        endstate_ref[0:1, :] = best_s[2:3, :].astype(jnp.int32)

    Lpad = -(-L // 8) * 8                       # row blocks of 8

    @jax.jit
    def forward(reads, read_lens, refs):
        B = reads.shape[0]
        n_b = -(-B // TB)
        Bp = n_b * TB
        reads_p = jnp.pad(reads, ((0, Bp - B), (0, Lpad - L)),
                          constant_values=4)
        refs_p = jnp.pad(refs, ((0, Bp - B), (0, Lpad - L)),
                         constant_values=4)
        lens_p = jnp.pad(read_lens.astype(jnp.int32), (0, Bp - B),
                         constant_values=-1)
        readsT = reads_p.T.astype(jnp.int32)    # [Lpad, Bp]
        refsT = refs_p.T.astype(jnp.int32)      # [Lpad+W, Bp]
        lens2 = lens_p.reshape(1, Bp)
        # per-block end-row bitmap: ends[b, i] = any lane in block b whose
        # read ends at row i (harvest is skipped everywhere else)
        lens_blocks = lens_p.reshape(n_b, TB)
        clipped = jnp.clip(lens_blocks, 0, Lpad + 7)
        ends = jnp.zeros((n_b, Lpad + 8), jnp.int32).at[
            jnp.arange(n_b)[:, None], clipped].max(
                (lens_blocks >= 0).astype(jnp.int32))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_b,),
            in_specs=[
                pl.BlockSpec((Lpad, TB), lambda b, ends: (0, b)),
                pl.BlockSpec((Lpad + W, TB), lambda b, ends: (0, b)),
                pl.BlockSpec((1, TB), lambda b, ends: (0, b)),
            ],
            out_specs=(
                pl.BlockSpec((1, TB), lambda b, ends: (0, b)),
                pl.BlockSpec((1, TB), lambda b, ends: (0, b)),
                pl.BlockSpec((1, TB), lambda b, ends: (0, b)),
                pl.BlockSpec((L + 1, W, TB), lambda b, ends: (0, 0, b)),
            ),
            scratch_shapes=[
                pltpu.VMEM((W, TB), jnp.float32),
                pltpu.VMEM((W, TB), jnp.float32),
                pltpu.VMEM((W, TB), jnp.float32),
                pltpu.VMEM((8, TB), jnp.float32),
            ],
        )
        scores, endk, endstate, ptrs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((1, Bp), jnp.float32),
                jax.ShapeDtypeStruct((1, Bp), jnp.int32),
                jax.ShapeDtypeStruct((1, Bp), jnp.int32),
                jax.ShapeDtypeStruct((L + 1, W, Bp), jnp.int32),
            ),
            interpret=interpret,
        )(ends, readsT, refsT, lens2)
        pointers = ptrs.transpose(2, 0, 1)[:B].astype(jnp.uint8)
        return scores[0, :B], endk[0, :B], endstate[0, :B], pointers

    return forward


@functools.lru_cache(maxsize=8)
def make_pallas_banded_nw_long(L: int, W: int, match: float = 2.0,
                               mismatch: float = -5.0,
                               gap_open: float = -6.0,
                               gap_extend: float = -2.0,
                               interpret: bool | None = None,
                               tb: int = 128, rc: int = 128):
    """Row-chunked variant of make_pallas_banded_nw for LONG reads
    (L in the thousands-to-50k range, W up to 256+).

    The short-read kernel holds the whole [L+1, W, TB] pointer block in
    VMEM — 2.1 MB at L=128/W=32, gigabytes at long-read shapes.  Here the
    grid is (read_block, row_chunk): each step computes RC rows and
    streams its [RC, W, TB] pointer block to HBM while the D/IY/IX band
    state persists in scratch across the sequential row-chunk steps
    (standard TPU-grid accumulator pattern).  The reference window rows
    are pre-chunked host-side into overlapping [RC+W, B] slabs (BlockSpec
    offsets are block-shape multiples, so overlapping windows cannot be
    expressed directly).  Same numerics as the short kernel: identical
    row recurrence, segmented-cummax IX at masked rows, first-argmax
    harvest at each lane's end row.

    rc=128 default: marginal-rate sweep on-chip gave 14.9 / 17.6 /
    18.6 Gcells/s at rc 32/64/128 (L=16k, W=256) — the int8 pointer
    block keeps even rc=128 at 4.2 MB VMEM.
    NOTE the pointer tensor is int8 [L, W, B] on device (~2.1 GB at
    L=16k/W=256/B=128) — callers slice B accordingly, and reading it
    back over a thin link dominates everything (use only with co-located
    PCIe/DMA hosts; aligner gates this behind HLA_TPU_LONG_NW=1)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    neg = float(NEG)
    open_ = float(gap_open)
    ext = float(gap_extend)
    TB = tb
    RC = rc
    assert RC % 8 == 0, "row chunk must be a multiple of the sublane tile"
    n_shifts = max(int(np.ceil(np.log2(max(W, 2)))), 1)
    Lpad = -(-L // RC) * RC
    n_rc = Lpad // RC

    def kernel(ends_ref, chunk_ends_ref, readsT_ref, refsT_ref, lens_ref,
               score_ref, endk_ref, endstate_ref, ptr_ref,
               D_s, IY_s, IX_s, best_s):
        blk = pl.program_id(0)
        rcb = pl.program_id(1)

        @pl.when(rcb == 0)
        def _():
            D_s[:] = jnp.zeros((W, TB), jnp.float32)
            IY_s[:] = jnp.full((W, TB), neg)
            IX_s[:] = jnp.full((W, TB), neg)
            best_s[:] = jnp.zeros((8, TB), jnp.float32)
            best_s[0:1, :] = jnp.full((1, TB), neg)

        lens_row = lens_ref[0:1, :][0]                       # [TB] int32
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (W, TB), 0
                                          ).astype(jnp.float32)

        def harvest(i):
            D, IY, IX = D_s[:], IY_s[:], IX_s[:]
            at_end = (lens_row == i)[None, :]

            def red(mat):
                m = jnp.max(mat, axis=0, keepdims=True)
                mb = jnp.broadcast_to(m, (W, TB))
                kk = jnp.min(jnp.where(mat >= mb, k_iota, jnp.float32(W)),
                             axis=0, keepdims=True)
                return m, kk
            mD, kD = red(D)
            mIY, kIY = red(IY)
            mIX, kIX = red(IX)
            best = jnp.maximum(jnp.maximum(mD, mIY), mIX)
            state = jnp.where(mD >= best, 0.0,
                              jnp.where(mIY >= best, 1.0, 2.0))
            kbest = jnp.where(mD >= best, kD,
                              jnp.where(mIY >= best, kIY, kIX))
            upd = at_end & (lens_row >= 0)[None, :]
            best_s[0:1, :] = jnp.where(upd, best, best_s[0:1, :])
            best_s[1:2, :] = jnp.where(upd, kbest, best_s[1:2, :])
            best_s[2:3, :] = jnp.where(upd, state, best_s[2:3, :])

        @pl.when(jnp.logical_and(rcb == 0, ends_ref[blk, 0] > 0))
        def _():
            harvest(0)

        def row_body(i, local, read_row, ref_rows, clean: bool,
                     check_ends: bool = True):
            # identical recurrence to the short kernel's row_body; `i` is
            # the GLOBAL row (1-based), `local` the row inside this chunk.
            # Sublane shifts use pltpu.roll + iota masks instead of the
            # short kernel's shifted concatenates: at W=256 (32 sublane
            # tiles) Mosaic lowers each shifted concat into multi-tile
            # copies and the row body becomes relayout-bound.
            def dn(a, sh):       # a[k] -> k+sh, vacated rows = neg
                return jnp.where(k_iota >= float(sh),
                                 pltpu.roll(a, shift=sh, axis=0), neg)

            rr = jnp.broadcast_to(read_row, (W, TB))
            rf = ref_rows
            ok = rf < 4
            m_f = (jnp.where(rf == rr, 1.0, 0.0)
                   * jnp.where(rr < 4, 1.0, 0.0))
            sub = jnp.where(ok, mismatch + (match - mismatch) * m_f, neg)
            D, IY, IX = D_s[:], IY_s[:], IX_s[:]
            m12 = jnp.maximum(IY, IX)
            pb = jnp.maximum(D, m12)
            m_src = jnp.where(D >= m12, 0, jnp.where(IY >= IX, 1, 2))
            nD = pb + sub
            up_mask = k_iota < float(W - 1)
            # up-shift by 1 == circular roll by W-1 (roll requires a
            # non-negative shift)
            D_sh = jnp.where(up_mask, pltpu.roll(D, shift=W - 1, axis=0),
                             neg)
            IY_sh = jnp.where(up_mask, pltpu.roll(IY, shift=W - 1, axis=0),
                              neg)
            oc = D_sh + open_
            ec = IY_sh + ext
            nIY = jnp.maximum(oc, ec)
            iy_src = jnp.where(ec > oc, 4, 0)
            if clean:
                g = nD - k_iota * ext
                cm = g
                sh = 1
                for _s in range(n_shifts):
                    cm = jnp.maximum(cm, dn(cm, min(sh, W)))
                    sh *= 2
            else:
                ok_f = jnp.where(ok, 0.0, 1.0)
                seg = ok_f
                sh = 1
                for _s in range(n_shifts):
                    seg = seg + jnp.where(
                        k_iota >= float(min(sh, W)),
                        pltpu.roll(seg, shift=min(sh, W), axis=0), 0.0)
                    sh *= 2
                g = jnp.where(ok, nD - k_iota * ext, neg)
                cm = g
                sh = 1
                for _s in range(n_shifts):
                    shv = min(sh, W)
                    rolled = dn(cm, shv)
                    rolled_seg = jnp.where(
                        k_iota >= float(shv),
                        pltpu.roll(seg, shift=shv, axis=0), -1.0)
                    same = jnp.where(rolled_seg == seg, 1.0, 0.0)
                    cm = jnp.maximum(cm, jnp.where(same > 0.0, rolled, neg))
                    sh *= 2
            cm_shift = dn(cm, 1)
            nIX = open_ + (k_iota - 1.0) * ext + cm_shift
            if not clean:
                nIX = jnp.where(ok, nIX, neg)
            row0 = k_iota >= 1.0
            nIX = jnp.where(row0, nIX, neg)
            ocx = jnp.where(row0,
                            pltpu.roll(nD, shift=1, axis=0) + open_, neg)
            # extend-bit exactly as the sequential recurrence sets it
            ecx = jnp.where(row0,
                            pltpu.roll(nIX, shift=1, axis=0) + ext, neg)
            ix_src = jnp.where(ecx > ocx, 8, 0)
            ptr_ref[pl.ds(local, 1)] = (m_src + iy_src
                                        + ix_src).astype(jnp.int8)[None]
            D_s[:] = nD
            IY_s[:] = nIY
            IX_s[:] = nIX
            if check_ends:          # only inside chunks with a lane end
                @pl.when(ends_ref[blk, i] > 0)
                def _():
                    harvest(i)

        # RC rows of this chunk in 8-row blocks (static offsets inside).
        # The per-row harvest check (SMEM read + cond) only runs in
        # chunks where some lane actually ends (chunk_ends bitmap) —
        # with near-uniform lens that's 1-2 of the n_rc chunks
        def chunk_rows(check_ends: bool):
            for io in range(RC // 8):
                base = io * 8
                read_blk = readsT_ref[pl.ds(base, 8), :]
                ref_blk = refsT_ref[pl.ds(base, W + 8), :]
                has_mask = jnp.max(ref_blk) >= 4

                @pl.when(jnp.logical_not(has_mask))
                def _():
                    for r8 in range(8):
                        local = base + r8
                        i = rcb * RC + local + 1
                        row_body(i, local, read_blk[r8:r8 + 1, :],
                                 ref_blk[r8:r8 + W, :], clean=True,
                                 check_ends=check_ends)

                @pl.when(has_mask)
                def _():
                    for r8 in range(8):
                        local = base + r8
                        i = rcb * RC + local + 1
                        row_body(i, local, read_blk[r8:r8 + 1, :],
                                 ref_blk[r8:r8 + W, :], clean=False,
                                 check_ends=check_ends)

        @pl.when(chunk_ends_ref[blk, rcb] > 0)
        def _():
            chunk_rows(True)

        @pl.when(chunk_ends_ref[blk, rcb] == 0)
        def _():
            chunk_rows(False)

        @pl.when(rcb == n_rc - 1)
        def _():
            score_ref[0:1, :] = best_s[0:1, :]
            endk_ref[0:1, :] = best_s[1:2, :].astype(jnp.int32)
            endstate_ref[0:1, :] = best_s[2:3, :].astype(jnp.int32)

    @jax.jit
    def forward(reads, read_lens, refs):
        B = reads.shape[0]
        n_b = -(-B // TB)
        Bp = n_b * TB
        reads_p = jnp.pad(reads, ((0, Bp - B), (0, Lpad - L)),
                          constant_values=4)
        refs_p = jnp.pad(refs, ((0, Bp - B), (0, Lpad - L)),
                         constant_values=4)
        lens_p = jnp.pad(read_lens.astype(jnp.int32), (0, Bp - B),
                         constant_values=-1)
        readsT = reads_p.T.astype(jnp.int32)           # [Lpad, Bp]
        refsT = refs_p.T.astype(jnp.int32)             # [Lpad+W, Bp]
        # overlapping ref slabs: chunk c needs rows [c*RC, c*RC + RC + W)
        slab_idx = (np.arange(n_rc)[:, None] * RC
                    + np.arange(RC + W)[None, :])      # [n_rc, RC+W]
        refs_slabs = refsT[slab_idx.reshape(-1)]       # [n_rc*(RC+W), Bp]
        lens2 = lens_p.reshape(1, Bp)
        lens_blocks = lens_p.reshape(n_b, TB)
        clipped = jnp.clip(lens_blocks, 0, Lpad + 7)
        ends = jnp.zeros((n_b, Lpad + 8), jnp.int32).at[
            jnp.arange(n_b)[:, None], clipped].max(
                (lens_blocks >= 0).astype(jnp.int32))
        # per-(block, chunk) flag: any lane end row inside the chunk
        end_chunk = jnp.clip((jnp.maximum(lens_blocks, 1) - 1) // RC,
                             0, n_rc - 1)
        chunk_ends = jnp.zeros((n_b, n_rc), jnp.int32).at[
            jnp.arange(n_b)[:, None], end_chunk].max(
                (lens_blocks >= 1).astype(jnp.int32))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_b, n_rc),
            in_specs=[
                pl.BlockSpec((RC, TB), lambda b, c, e, ce: (c, b)),
                pl.BlockSpec((RC + W, TB), lambda b, c, e, ce: (c, b)),
                pl.BlockSpec((1, TB), lambda b, c, e, ce: (0, b)),
            ],
            out_specs=(
                pl.BlockSpec((1, TB), lambda b, c, e, ce: (0, b)),
                pl.BlockSpec((1, TB), lambda b, c, e, ce: (0, b)),
                pl.BlockSpec((1, TB), lambda b, c, e, ce: (0, b)),
                pl.BlockSpec((RC, W, TB), lambda b, c, e, ce: (c, 0, b)),
            ),
            scratch_shapes=[
                pltpu.VMEM((W, TB), jnp.float32),
                pltpu.VMEM((W, TB), jnp.float32),
                pltpu.VMEM((W, TB), jnp.float32),
                pltpu.VMEM((8, TB), jnp.float32),
            ],
        )
        scores, endk, endstate, ptrs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((1, Bp), jnp.float32),
                jax.ShapeDtypeStruct((1, Bp), jnp.int32),
                jax.ShapeDtypeStruct((1, Bp), jnp.int32),
                jax.ShapeDtypeStruct((Lpad, W, Bp), jnp.int8),
            ),
            interpret=interpret,
        )(ends, chunk_ends, readsT, refs_slabs, lens2)
        # chunked rows cover global rows 1..Lpad; prepend the zero row 0
        body = ptrs.transpose(2, 0, 1)[:B, :L].astype(jnp.uint8)
        row0 = jnp.zeros((B, 1, W), jnp.uint8)
        pointers = jnp.concatenate([row0, body], axis=1)
        return scores[0, :B], endk[0, :B], endstate[0, :B], pointers

    return forward
