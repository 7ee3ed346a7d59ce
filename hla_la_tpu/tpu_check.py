"""TPU health + kernel-correctness probe (`python -m hla_la_tpu.tpu_check`).

One-shot answer to two operational questions before trusting any TPU
number or enabling the device NW path in production:

1. **Correctness at HEAD**: the Pallas banded-NW kernel's scores and end
   positions must bit-match the native/numpy reference implementation on a
   random ACGT world that includes realistic suffix ref-pads (N walls).
   This is the same contract tests/test_pallas_nw.py locks in interpret
   mode; here it runs against the real compiled kernel on the real chip.
2. **Chip health vs tunnel latency** (disentangled in r3): the shared
   tunnel's dispatch round-trip degrades to tens of ms for long stretches,
   which made naive per-call timing report a "degraded chip" even when the
   chip computes at full speed (the old probe conflated the two; the
   giveaway was the C^2 pair scan running at 287 Gcells/s in one dispatch
   while 10-dispatch NW loops showed 5).  The probe now times the SAME
   jitted program at two amortization factors (K=32 and K=160 kernel
   iterations inside one dispatch with a scalar fetch as the true sync —
   `jax.block_until_ready` is NOT a reliable sync under the axon plugin)
   and differences them: the constant per-dispatch RTT cancels, leaving
   pure chip compute.  RTT is reported separately.

Exit code 0 = parity OK (speed is reported, not asserted — a slow chip or
tunnel is an environment condition, not a code failure); 1 = parity
mismatch or no TPU backend.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def run(L: int = 128, W: int = 32, B: int = 4096, seed: int = 7,
        reps: int = 3, stats: dict | None = None) -> int:
    """`stats` (optional): filled with {'gcells': float, 'healthy': bool,
    'parity': bool, 'rtt_ms': float} for programmatic callers
    (tpu_e2e.py)."""
    import jax
    import jax.numpy as jnp

    from .ops.banded_nw import banded_nw_forward
    from .ops.pallas_nw import make_pallas_banded_nw

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr, flush=True)
    if dev.platform != "tpu":
        print(f"# no TPU backend (got {dev.platform}) — nothing to check",
              file=sys.stderr)
        return 1

    rng = np.random.default_rng(seed)
    reads = rng.integers(0, 4, (B, L)).astype(np.uint8)
    refs = rng.integers(0, 4, (B, L + W)).astype(np.uint8)
    for b in range(0, B, 3):          # realistic suffix-only ref pads
        cut = int(rng.integers(L // 2, L + W))
        refs[b, cut:] = 4
    lens = rng.integers(L // 4, L + 1, B).astype(np.int64)

    nw = make_pallas_banded_nw(L, W)
    # put inputs on-device ONCE so both the first run and the timing loop
    # measure the kernel, not the ~20 MB/s tunnel (CLAUDE.md: measure
    # kernels with on-device data)
    reads_d, lens_d, refs_d = (jax.device_put(x, dev)
                               for x in (reads, lens, refs))
    t0 = time.time()
    got = tuple(np.asarray(x) for x in nw(reads_d, lens_d, refs_d))
    print(f"# compile+first run: {time.time() - t0:.1f}s "
          "(cold tunnel warmup can take ~2 min)", file=sys.stderr,
          flush=True)

    want = banded_nw_forward(reads, lens, refs)
    ok = want[0] > -1e29              # alignable rows only (see module doc
    #                                   of ops/banded_nw.py: fully-walled
    #                                   rows tie-break impl-specifically)
    # scores are bit-stable across implementations on alignable rows (the
    # test suite locks array_equal); ends likewise
    parity = (np.array_equal(got[0][ok], want[0][ok])
              and np.array_equal(got[1][ok], want[1][ok])
              and np.array_equal(got[2][ok], want[2][ok]))
    if stats is not None:
        stats["parity"] = bool(parity)
    if not parity:
        bad_mask = ok & ((got[0] != want[0]) | (got[1] != want[1])
                         | (got[2] != want[2]))
        bad = np.nonzero(bad_mask)[0]
        print(f"PARITY FAIL: first bad rows {bad[:5].tolist()}")
        return 1
    print(f"# parity OK ({int(ok.sum())}/{B} alignable rows bit-match "
          "native)", file=sys.stderr, flush=True)

    # amortized compute probe: K kernel iterations in ONE dispatch, input
    # rolled per iteration so XLA cannot CSE; scalar fetch = true sync
    def make_many(K):
        @jax.jit
        def many(r, l, f):
            def body(i, acc):
                s, _, _, _ = nw(jnp.roll(r, i, axis=0), l, f)
                return acc + s.sum()
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))
        return many

    K_LO, K_HI = 32, 160
    lo, hi = make_many(K_LO), make_many(K_HI)
    float(lo(reads_d, lens_d, refs_d))        # compile
    float(hi(reads_d, lens_d, refs_d))
    t_lo = t_hi = 1e9
    for _ in range(reps):
        t0 = time.time()
        float(lo(reads_d, lens_d, refs_d))
        t_lo = min(t_lo, time.time() - t0)
        t0 = time.time()
        float(hi(reads_d, lens_d, refs_d))
        t_hi = min(t_hi, time.time() - t0)
    per_iter = max((t_hi - t_lo) / (K_HI - K_LO), 1e-9)
    rtt_ms = max(t_lo - K_LO * per_iter, 0.0) * 1e3
    gcells = B * L * W / per_iter / 1e9
    healthy = gcells > 20.0
    if stats is not None:
        stats["gcells"] = round(gcells, 2)
        stats["healthy"] = healthy
        stats["rtt_ms"] = round(rtt_ms, 1)
    print(f"pallas_nw: {B / per_iter / 1e6:.2f} M reads/s, {gcells:.1f} "
          f"Gcells/s -> chip {'HEALTHY' if healthy else 'DEGRADED'} "
          f"(full speed ~35-55 on v5e); dispatch RTT ~{rtt_ms:.0f} ms "
          f"(tunnel latency — irrelevant for batched production "
          f"dispatches)")
    return 0


if __name__ == "__main__":
    sys.exit(run())
