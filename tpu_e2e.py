"""One recorded end-to-end production run on the REAL TPU backend
(VERDICT r2 item 2; production path match: HLA-LA.cpp:577-811).

The e2e bench headline is the host C++ worker path; TPU evidence was
kernel-level only.  This script runs the FULL pipeline (align + type)
twice on a small world — once with the host backend, once with
``--backend jax`` on the real chip — asserts the typing calls identical,
and records kernel + per-phase timings to TPU_E2E_r03.json.

Protocol (CLAUDE.md):
  - run ONLY when the chip is healthy: the tpu_check parity+speed probe
    runs first and its Gcells/s is recorded; a degraded chip aborts with
    exit 2 (re-run later) so a tenant-contended window can't pollute the
    record;
  - small world (~2k pairs): the ~20 MB/s tunnel makes large host->device
    transfers meaningless — this is a correctness-with-timing record, not
    a throughput claim (co-located TPU hosts have PCIe/DMA);
  - single TPU process, nothing else on the chip.

Usage: python tpu_e2e.py [--out TPU_E2E_r03.json]
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def probe_backend(timeout_s: float = 300.0) -> str:
    """Subprocess probe with timeout (the tunnel can hang for hours)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=timeout_s)
        lines = r.stdout.strip().splitlines()
        if r.returncode == 0 and lines:
            return lines[-1].strip()
    except Exception:  # noqa: BLE001
        pass
    return "none"


def main():
    out_path = "TPU_E2E_r03.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    backend = probe_backend()
    if backend != "tpu":
        log(f"no TPU backend (probe: {backend}) — nothing to record")
        return 2

    # ---- health gate: kernel parity + speed on the real chip ----------
    import io as _io
    import contextlib
    from hla_la_tpu import tpu_check
    buf = _io.StringIO()
    t0 = time.time()
    probe_stats: dict = {}
    with contextlib.redirect_stdout(buf):
        rc = tpu_check.run(stats=probe_stats)
    probe_out = buf.getvalue().strip()
    log(f"tpu_check ({time.time() - t0:.0f}s): {probe_out}")
    if rc != 0:
        log("kernel parity FAILED — aborting")
        return 1
    gcells = probe_stats.get("gcells")
    if not probe_stats.get("healthy"):
        if "--force" not in sys.argv:
            log("chip DEGRADED (tenant contention) — re-run later (exit 2)")
            return 2
        log("chip DEGRADED but --force given: recording a "
            "correctness-only run (timings annotated as degraded)")

    # ---- small world ---------------------------------------------------
    import tempfile
    from hla_la_tpu.models.pipeline import run_hla_typing
    from hla_la_tpu.sim.graph_sim import simulate_prg_package
    from hla_la_tpu.sim.read_sim import ReadSimulator

    rng = np.random.default_rng(30303)
    sim = simulate_prg_package(rng, backbone_length=20_000, n_haplotypes=6,
                               snp_rate=0.01)
    rs = ReadSimulator(rng, read_length=100, fragment_mean=300,
                       fragment_sd=25, with_error=True)
    pairs = []
    for h in (1, 2):
        seq, levels = sim.linearized(h)
        pairs += rs.simulate_pairs_from_string(seq, levels, 20.0,
                                               name_prefix=f"h{h}")
    fq = [(p.r1.to_fastq(), p.r2.to_fastq()) for p in pairs]
    log(f"world: 20k levels, {len(pairs)} pairs")

    with tempfile.TemporaryDirectory() as td:
        pkg = sim.write_package(td + "/pkg")

        t0 = time.time()
        res_host = run_hla_typing(pkg, pairs=fq, output_dir=td + "/host",
                                  backend="numpy")
        t_host = time.time() - t0
        log(f"host backend e2e: {t_host:.1f}s")

        t0 = time.time()
        res_tpu = run_hla_typing(pkg, pairs=fq, output_dir=td + "/tpu",
                                 backend="jax")
        t_tpu_cold = time.time() - t0
        log(f"TPU backend e2e (cold compile included): {t_tpu_cold:.1f}s")
        t0 = time.time()
        res_tpu2 = run_hla_typing(pkg, pairs=fq, output_dir=td + "/tpu2",
                                  backend="jax")
        t_tpu_warm = time.time() - t0
        log(f"TPU backend e2e (warm): {t_tpu_warm:.1f}s")

        calls_host = sorted((r.locus, r.allele1_id, r.allele2_id)
                            for r in res_host.results)
        calls_tpu = sorted((r.locus, r.allele1_id, r.allele2_id)
                           for r in res_tpu.results)
        calls_tpu2 = sorted((r.locus, r.allele1_id, r.allele2_id)
                            for r in res_tpu2.results)
        assert calls_host == calls_tpu == calls_tpu2, \
            f"host vs TPU calls differ: {calls_host} vs {calls_tpu}"
        for rh, rt in zip(res_host.results, res_tpu.results):
            assert abs(rh.q1_allele1 - rt.q1_allele1) < 1e-3
        log(f"calls identical host vs TPU: {calls_tpu}")

    # ---- IMGT-scale C^2 pair reduction ON THE CHIP ---------------------
    # the typing working point stress_imgt.py measures on host (C=2200,
    # R=16k, 8e10 cells): data is device_put ONCE so the timing is
    # kernel-only (CLAUDE.md), then the XLA scan runs on-device
    import jax
    from hla_la_tpu.ops.pair_ll import make_pair_ll_jax
    C_imgt, R_imgt, chunk = 2200, 16384, 26
    L = np.random.default_rng(0).normal(
        -40, 8, (C_imgt, R_imgt)).astype(np.float32)
    L_dev = jax.device_put(L, jax.devices()[0])
    run = make_pair_ll_jax(C_imgt, R_imgt, chunk)
    t0 = time.time()
    jax.block_until_ready(run(L_dev))
    t_pair_cold = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(run(L_dev))
    t_pair = time.time() - t0
    pair_gcells = C_imgt * C_imgt * R_imgt / t_pair / 1e9
    log(f"IMGT-scale C^2 on chip (C={C_imgt}, R={R_imgt}): {t_pair:.1f}s "
        f"= {pair_gcells:.1f} Gcells/s (cold {t_pair_cold:.1f}s)")

    record = {
        "date": time.strftime("%Y-%m-%d %H:%M"),
        "chip_health": probe_out,
        "forced_on_degraded_chip": bool(
            "--force" in sys.argv and not probe_stats.get("healthy")),
        "kernel_gcells_per_s": gcells,
        "world": {"levels": 20_000, "pairs": len(pairs), "loci": 2},
        "host_e2e_s": round(t_host, 2),
        "tpu_e2e_cold_s": round(t_tpu_cold, 2),
        "tpu_e2e_warm_s": round(t_tpu_warm, 2),
        "reads_per_s_tpu_warm": round(2 * len(pairs) / t_tpu_warm, 1),
        "calls_identical": True,
        "calls": [list(c) for c in calls_tpu],
        "note": "20 MB/s tunnel: host<->device transfer dominates the "
                "wall clock here; co-located TPU hosts have PCIe/DMA. "
                "This records correctness + kernel speed, not peak e2e.",
    }
    with open(out_path, "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps(record))
    log(f"recorded -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
