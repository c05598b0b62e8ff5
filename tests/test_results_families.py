"""Per-family results aggregation reproduces the reference's PUBLISHED
numbers when run over the reference's own committed CSVs
(ref results/*.csv -> README.md:139-174 tables; BASELINE.md)."""

import io
import os
import contextlib

import pytest

REF_RESULTS = "/root/reference/results"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_RESULTS),
    reason="reference checkout not available")


@pytest.fixture(scope="module")
def report():
    from sleekit_tpu.experiments.results import export_all_families

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        export_all_families(REF_RESULTS, plot=False)
    return buf.getvalue()


def test_compare_family_matches_readme(report):
    # README.md:169-174 headline rows (BASELINE.md)
    assert ("Compare 3b: correction -4.01%, scaling -20.25%, "
            "sleekit light -25.04%, sleekit heavy -34.86%") in report
    assert "sleekit light -23.90%, sleekit heavy -36.49%" in report  # 2b
    assert "sleekit light -22.43%, sleekit heavy -34.33%" in report  # 1.5b
    assert "sleekit light -20.50%, sleekit heavy -41.94%" in report  # 1b


def test_scaling_family_matches_readme(report):
    # README.md:139-143
    assert ("Scaling 3b: diagonal -20.25%, hessian -20.50%, "
            "exhaustive -29.68%") in report
    assert ("Scaling 1b: diagonal -7.78%, hessian -19.48%, "
            "exhaustive -30.64%") in report


def test_ordering_correction_ls_damp_match_readme(report):
    # README.md:145-167
    assert ("Ordering 3b: diagonal * error -0.57%, "
            "diagonal * squared error -1.95%") in report
    assert "Correction 3b: plus bias -1.72%, with bias -4.01%" in report
    assert "Local search 3b: 10 moves -4.51%, 100 moves -9.42%" in report
    assert "0.03 -0.91%, 0.1 -0.03%" in report        # Dampening 3b
    assert "Bits: 2.8b x1.12, 2.3b x1.98, 2b x3.33" in report
