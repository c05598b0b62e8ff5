"""Experiment CLI tests: dump -> every ablation CLI -> aggregation, on a
tiny random-init model (schema parity with the reference scripts)."""

import os
import sys

import numpy as np
import pytest

from sleekit_tpu.experiments import (
    bits, compare, correction, dampening, distribution, dump_stats,
    local_search, ordering, results, scaling)


@pytest.fixture(scope="module")
def datadir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("expdata"))
    dump_stats.main([d, "--model", "tiny", "--samples", "4", "--seq-len", "32"])
    return d


def run_cli(module, args, capsys):
    module.main(args)
    out = capsys.readouterr().out
    lines = [l for l in out.strip().split("\n") if l]
    return lines


def test_dump_layout(datadir):
    layers = sorted(os.listdir(datadir))
    assert len(layers) == 12
    for f in ("weight.npy", "hessian.npy", "mean.npy", "bias.npy"):
        assert os.path.exists(os.path.join(datadir, layers[0], f))


def test_compare_cli(datadir, capsys, tmp_path):
    lines = run_cli(compare, [datadir, "--codebook-size", "4",
                              "--grid-size", "10"], capsys)
    assert lines[0] == "Data\tStandard\tCorrection\tScaling\tSleekitLight\tSleekitHeavy"
    assert len(lines) == 13
    vals = [float(x) for x in lines[1].split("\t")[1:]]
    assert all(np.isfinite(v) for v in vals)
    # aggregate
    p = tmp_path / "compare.csv"
    p.write_text("\n".join(lines) + "\n")
    results.main([str(p)])
    agg = capsys.readouterr().out
    assert "SleekitHeavy" in agg


def test_scaling_cli(datadir, capsys):
    lines = run_cli(scaling, [datadir, "--codebook-size", "4",
                              "--grid-size", "10", "--run-diag",
                              "--run-hessian"], capsys)
    assert lines[0] == "Data\tMSE\tDiag\tHessian"
    assert len(lines) == 13


def test_correction_cli(datadir, capsys):
    lines = run_cli(correction, [datadir, "--codebook-size", "4",
                                 "--grid-size", "10"], capsys)
    assert lines[0] == ("Data\tScaling\tGPTQ\tGPTQ+BiasCorrection"
                        "\tGPTQWithBiasCorrection")


def test_ordering_cli(datadir, capsys):
    lines = run_cli(ordering, [datadir, "--codebook-size", "4",
                               "--grid-size", "10"], capsys)
    assert lines[0] == "Data\tScaling\tDiag\tDiagErr\tDiagSqErr"


def test_dampening_cli(datadir, capsys):
    lines = run_cli(dampening, [datadir, "--codebook-size", "4",
                                "--grid-size", "10"], capsys)
    assert lines[0].startswith("Data\tScaling\tDamp0.001")


def test_local_search_cli(datadir, capsys):
    lines = run_cli(local_search, [datadir, "--codebook-size", "4",
                                   "--grid-size", "10"], capsys)
    assert lines[0] == "Data\tScaling\tGPTQ\tGPTQ+LS10\tGPTQ+LS100"
    # local search should not increase error
    for line in lines[1:]:
        _, _, e0, e10, e100 = line.split("\t")
        assert float(e100) <= float(e0) * 1.001


def test_bits_cli(datadir, capsys):
    lines = run_cli(bits, [datadir, "--grid-size", "5"], capsys)
    assert "Standard1-bit" in lines[0] and "SleekitLight5-bit" in lines[0]
    # error decreases with more bits (standard columns 1..10)
    vals = [float(x) for x in lines[1].split("\t")[1:11]]
    assert vals[-1] < vals[0]


def test_distribution_cli(datadir, capsys, tmp_path):
    out = tmp_path / "dist.npy"
    distribution.main([datadir, "--scaling", "mse", "--grid-size", "5",
                       "--save-data", str(out)])
    data = np.load(out)
    assert data.ndim == 1 and len(data) > 0
