"""Layer-sweep parallelism + resume manifest for quantize_model
(VERDICT.md round-1 items 7 and 9; SURVEY.md §2.3 / §5.4)."""



import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sleekit_tpu.models.quantize import calibrate, quantize_model
from sleekit_tpu.models.transformer import init_params
from sleekit_tpu.models.zoo import tiny_test
from sleekit_tpu.parallel.mesh import make_mesh
from sleekit_tpu.pipeline import QuantConfig


@pytest.fixture(scope="module")
def workload():
    cfg = tiny_test(d_model=64, n_heads=4, n_layers=3, d_ff=128,
                    vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    batches = [rng.randint(0, cfg.vocab_size, (2, 24)).astype(np.int32)
               for _ in range(2)]
    stats = calibrate(cfg, params, batches)
    return cfg, params, stats


QCFG = QuantConfig(nbits=4, scaling_mode="diag", grid_size=12, block_size=32)


def _flat_errors(reports):
    return {r.name: r.error for r in reports}


def test_layer_parallel_matches_serial(workload):
    cfg, params, stats = workload
    serial, rs = quantize_model(cfg, params, stats, QCFG)
    par, rp = quantize_model(cfg, params, stats, QCFG, layer_parallel=True)
    es, ep = _flat_errors(rs), _flat_errors(rp)
    assert set(es) == set(ep)
    for k in es:
        assert ep[k] == pytest.approx(es[k], rel=1e-4), k
    a = jax.tree_util.tree_leaves(serial)
    b = jax.tree_util.tree_leaves(par)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-5)


def test_layer_parallel_sharded_over_mesh(workload):
    cfg, params, stats = workload
    mesh = make_mesh(data=8, model=1)
    serial, rs = quantize_model(cfg, params, stats, QCFG)
    par, rp = quantize_model(cfg, params, stats, QCFG, layer_parallel=True,
                             mesh=mesh)
    es, ep = _flat_errors(rs), _flat_errors(rp)
    for k in es:
        assert ep[k] == pytest.approx(es[k], rel=1e-4), k


def test_resume_manifest_skips_solved_layers(workload, tmp_path,
                                             monkeypatch):
    cfg, params, stats = workload
    want, _ = quantize_model(cfg, params, stats, QCFG)

    # Crash after 5 layers: wrap quantize_layer with a countdown.
    import sleekit_tpu.models.quantize as mq
    real = mq.quantize_layer
    calls = {"n": 0}

    def crashing(*a, **kw):
        if calls["n"] >= 5:
            raise RuntimeError("preempted")
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(mq, "quantize_layer", crashing)
    with pytest.raises(RuntimeError):
        quantize_model(cfg, params, stats, QCFG, resume_dir=str(tmp_path))
    assert calls["n"] == 5

    # Resume: only the remaining layers are solved.
    calls["n"] = -10 ** 9  # counting resumed solves
    monkeypatch.setattr(mq, "quantize_layer", real)
    counter = {"n": 0}

    def counting(*a, **kw):
        counter["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(mq, "quantize_layer", counting)
    got, reports = quantize_model(cfg, params, stats, QCFG,
                                  resume_dir=str(tmp_path))
    n_layers = len(reports)
    assert counter["n"] == n_layers - 5
    for x, y in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-5)


# NOTE: wall-clock speedup of the parallel sweep is measured on real
# hardware (8-device CPU mesh + TPU) and recorded in BENCH_NOTES.md -
# tiny-layer CI timings are too noisy to assert on.


def test_layerwise_calibration_matches_whole_forward():
    """calibrate(layerwise=True) - one jitted block reused per layer -
    produces bit-identical statistics to the single whole-model forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sleekit_tpu.models.quantize import calibrate
    from sleekit_tpu.models.transformer import init_params
    from sleekit_tpu.models.zoo import tiny_test

    cfg = tiny_test(d_model=32, n_heads=2, n_layers=3, d_ff=48,
                    vocab_size=64)
    params = init_params(cfg, jax.random.PRNGKey(0))
    batches = [jax.random.randint(jax.random.PRNGKey(i), (2, 16), 0, 64)
               for i in range(3)]
    s_whole = calibrate(cfg, params, batches, layerwise=False)
    s_layer = calibrate(cfg, params, batches, layerwise=True)
    assert set(s_whole) == set(s_layer)
    for k in s_whole:
        assert int(s_whole[k].count) == int(s_layer[k].count), k
        np.testing.assert_allclose(np.asarray(s_whole[k].hessian),
                                   np.asarray(s_layer[k].hessian),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(s_whole[k].mean),
                                   np.asarray(s_layer[k].mean),
                                   rtol=1e-5, atol=1e-6)
