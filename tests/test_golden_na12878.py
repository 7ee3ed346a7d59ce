"""NA12878 golden-output conformance (reference README.md:119-130: all
G-group calls must agree with NA12878_example_output_G.txt, Q1 == 1).

This is the reference's strongest end-to-end test.  It needs the real
PRG_MHC_GRCh38_withIMGT graph package (~2.3 GB) and the NA12878 mini
BAM/CRAM — neither ships with the repo.  Point the env vars at local
copies to run:

    HLA_LA_GRAPH_DIR=/path/to/PRG_MHC_GRCh38_withIMGT \
    HLA_LA_NA12878_BAM=/path/to/NA12878.mini.cram   (BAM or CRAM) \
    HLA_LA_REF=/path/to/GRCh38.fa   (only needed for CRAM input) \
    python -m pytest tests/test_golden_na12878.py -v

The golden table defaults to the copy shipped inside the reference mount
(/root/reference/NA12878_example_output_G.txt); override with
HLA_LA_GOLDEN.
"""

import os

import pytest

GRAPH = os.environ.get("HLA_LA_GRAPH_DIR")
BAM = os.environ.get("HLA_LA_NA12878_BAM")
GOLDEN = os.environ.get(
    "HLA_LA_GOLDEN", "/root/reference/NA12878_example_output_G.txt")
REF_FA = os.environ.get("HLA_LA_REF")

_gate = pytest.mark.skipif(
    not (GRAPH and BAM and GOLDEN and os.path.isdir(GRAPH)
         and os.path.exists(BAM) and os.path.exists(GOLDEN)),
    reason="real NA12878 data not available (set HLA_LA_GRAPH_DIR, "
           "HLA_LA_NA12878_BAM[, HLA_LA_REF for CRAM])")


def test_golden_wiring_dry():
    """ALWAYS runs (VERDICT r4 next #9: keep the env-gated contract warm):
    the golden table parses and self-compares clean, and the exact argv the
    gated test will pass is accepted by the CLI parser — so the moment the
    2.3 GB package + CRAM appear, the gated test runs without bit-rot."""
    from hla_la_tpu.utils.nomenclature import (golden_g_mismatches,
                                               read_inferred_bestguess)
    golden = "/root/reference/NA12878_example_output_G.txt"
    if os.path.exists(golden):
        calls = read_inferred_bestguess(golden)
        assert len(calls) >= 6  # A,B,C,DQA1,DQB1,DRB1 G-group rows
        assert all(a1 and a2 for a1, a2 in calls.values())
        assert golden_g_mismatches(golden, golden) == []
    # argv dry-parse: same flags the gated test builds (never executes)
    import argparse
    from hla_la_tpu import cli

    real_parse = argparse.ArgumentParser.parse_args

    captured = {}

    def capture(self, argv=None, namespace=None):
        ns = real_parse(self, argv, namespace)
        captured["ns"] = ns
        raise SystemExit(97)  # stop before any action runs

    argv = ["--action", "HLA", "--BAM", "/nonexistent.cram",
            "--graph", "/nonexistent_graph", "--sampleID", "NA12878",
            "--workingDir", "/tmp", "--outputDirectory", "/tmp/x",
            "--maxThreads", "4", "--ref", "/nonexistent.fa"]
    argparse.ArgumentParser.parse_args = capture
    try:
        with pytest.raises(SystemExit) as exc:
            cli.main(argv)
        assert exc.value.code == 97
    finally:
        argparse.ArgumentParser.parse_args = real_parse
    ns = captured["ns"]
    assert ns.action == "HLA" and ns.sampleID == "NA12878"
    assert ns.ref == "/nonexistent.fa" and ns.maxThreads == 4


@_gate
def test_na12878_g_group_concordance(tmp_path):
    from hla_la_tpu.cli import main
    from hla_la_tpu.utils.nomenclature import golden_g_mismatches

    out_dir = str(tmp_path / "NA12878")
    argv = ["--action", "HLA", "--BAM", BAM, "--graph", GRAPH,
            "--sampleID", "NA12878", "--workingDir", str(tmp_path),
            "--outputDirectory", out_dir, "--maxThreads", "4"]
    if REF_FA:
        argv += ["--ref", REF_FA]
    rc = main(argv)
    assert rc == 0

    # the comparison itself is shared with the in-suite dress rehearsal
    # (tests/test_golden_rehearsal.py), which executes it every run
    mismatches = golden_g_mismatches(
        GOLDEN, os.path.join(out_dir, "hla", "R1_bestguess_G.txt"))
    assert not mismatches, f"G-group call mismatches: {mismatches}"
