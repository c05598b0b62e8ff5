"""CI guard: family-level A/B vs the reference experiment scripts.

Runs the actual reference CLIs (/root/reference/experiments/*.py) and
ours as subprocesses over one synthetic dump tree and asserts the
aggregated per-family geomeans agree (VERDICT.md round-1 missing item 3;
full report: RESULTS_SYNTH.md, produced by experiments/family_ab.py).

Skips cleanly if the reference checkout is absent.
"""

import os

import pytest

REF_PATH = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_PATH, "experiments")),
    reason="reference checkout not available")


def test_family_geomeans_match_reference(tmp_path):
    """Quick mode: ordering + correction families, one bit-width, both
    implementations end-to-end (CLI -> TSV -> geomean aggregation)."""
    from sleekit_tpu.experiments.family_ab import main

    out = tmp_path / "report.md"
    rc = main(["--quick", "--workdir", str(tmp_path / "work"),
               "--out", str(out)])
    assert rc == 0, out.read_text()[-1000:]
    text = out.read_text()
    assert "PASS" in text
    # Both families actually produced rows.
    assert "| ordering | 2b |" in text
    assert "| correction | 2b |" in text
