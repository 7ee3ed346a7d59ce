"""Regenerate the output-format snapshot (tests/golden/).  Run from repo root:
    python tests/_golden_gen.py
Deterministic: fixed seeds, serial alignment, numpy backend."""
import os
import numpy as np

from hla_la_tpu.models.pipeline import run_hla_typing
from hla_la_tpu.sim.graph_sim import simulate_prg_package
from hla_la_tpu.sim.read_sim import ReadSimulator

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
SNAPSHOT_FILES = ["hla/R1_bestguess.txt", "hla/R1_bestguess_G.txt",
                  "hla/R1_pileup_A.txt", "hla/R1_PP_A_pairs.txt",
                  "hla/summaryStatistics.txt", "hla/R1_parameters.txt",
                  "reads_per_level.txt"]


def generate(out_dir: str):
    rng = np.random.default_rng(777)
    sim = simulate_prg_package(rng, backbone_length=2500, n_haplotypes=6)
    pkg = sim.write_package(os.path.join(out_dir, "pkg"))
    rs = ReadSimulator(rng, read_length=100, fragment_mean=300,
                       fragment_sd=25)
    pairs = []
    for h in (1, 2):
        seq, levels = sim.linearized(h)
        pairs += rs.simulate_pairs_from_string(seq, levels, 10.0,
                                               name_prefix=f"h{h}")
    fq = [(p.r1.to_fastq(), p.r2.to_fastq()) for p in pairs]
    run_hla_typing(pkg, pairs=fq, output_dir=os.path.join(out_dir, "out"),
                   backend="numpy")
    return os.path.join(out_dir, "out")


if __name__ == "__main__":
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        out = generate(td)
        os.makedirs(GOLDEN, exist_ok=True)
        for rel in SNAPSHOT_FILES:
            src = os.path.join(out, rel)
            dst = os.path.join(GOLDEN, rel.replace("/", "__"))
            with open(src) as fi, open(dst, "w") as fo:
                fo.write(fi.read())
        print(f"snapshot written to {GOLDEN}")
