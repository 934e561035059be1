"""Extensions: MPC threshold protocols, packing, HE-NN, benchmarks, CLI."""

import os
import subprocess
import sys

import numpy as np
import pytest

from tiberate_tpu.config.toy import toy_config
from tiberate_tpu.extension.mpc import CkksEngineMPCExtension
from tiberate_tpu.extension.nn import HELinearFeatureWise
from tiberate_tpu.extension.packing import FeatureWiseCTEncoding

pytestmark = pytest.mark.slow  # fast suite: pytest -m 'not slow'

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOL = 5e-4


@pytest.fixture(scope="module")
def mpc():
    cfg = toy_config(logN=7, num_scales=3, num_special_primes=1,
                     scale_bits=30)
    return CkksEngineMPCExtension(cfg, seed=303, nonce=4, bias_guard=False)


@pytest.fixture(scope="module")
def parties(mpc):
    sk1 = mpc._create_secret_key()
    sk2 = mpc._create_secret_key()
    pk1 = mpc.multiparty_create_public_key(sk1)
    crs = mpc.multiparty_public_crs(pk1)
    pk2 = mpc.multiparty_create_public_key(sk2, a=crs)
    cpk = mpc.multiparty_create_collective_public_key([pk1, pk2])
    return sk1, sk2, cpk


def test_mpc_collective_encrypt_decrypt(mpc, parties):
    sk1, sk2, cpk = parties
    m = np.linspace(-1, 1, mpc.num_slots)
    ct = mpc.encodecrypt(m, pk=cpk)
    head = mpc.multiparty_decrypt_head(ct, sk1)
    part = mpc.multiparty_decrypt_partial(ct, sk2)
    out = mpc.multiparty_decrypt_fusion([head, part], level=0, is_real=True)
    assert np.abs(out - m).max() < TOL


def test_mpc_single_party_cannot_decrypt(mpc, parties):
    """A single share must NOT reveal the message."""
    sk1, sk2, cpk = parties
    m = np.linspace(-1, 1, mpc.num_slots)
    ct = mpc.encodecrypt(m, pk=cpk)
    head = mpc.multiparty_decrypt_head(ct, sk1)
    out = mpc.multiparty_decrypt_fusion([head], level=0, is_real=True)
    assert np.abs(out - m).max() > 1.0  # garbage, not the message


def test_mpc_collective_rotation(mpc, parties):
    sk1, sk2, cpk = parties
    delta = 1
    rotk1 = mpc.multiparty_create_rotation_key(sk1, delta)
    crs = mpc.generate_rotation_crs(rotk1)
    rotk2 = mpc.multiparty_create_rotation_key(sk2, delta, a=crs)
    crotk = mpc.multiparty_generate_rotation_key([rotk1, rotk2])

    m = np.linspace(-1, 1, mpc.num_slots)
    ct = mpc.encodecrypt(m, pk=cpk)
    rot = mpc.rotate_single(ct, crotk)
    head = mpc.multiparty_decrypt_head(rot, sk1)
    part = mpc.multiparty_decrypt_partial(rot, sk2)
    out = mpc.multiparty_decrypt_fusion([head, part], level=0, is_real=True)
    assert np.abs(out - np.roll(m, delta)).max() < 50 * TOL


# ----------------------------------------------------------------------
# Packing + HE-NN.
# ----------------------------------------------------------------------


@pytest.fixture(scope="module")
def eng():
    from tiberate_tpu.engine import CkksEngine

    cfg = toy_config(logN=7, num_scales=3, num_special_primes=2,
                     scale_bits=30)
    return CkksEngine(cfg, seed=99, nonce=1)


def test_packing_roundtrip_small(eng):
    x = np.random.default_rng(0).uniform(-1, 1, (2, 3, 8))
    packed = FeatureWiseCTEncoding.encodecrypt(x, eng)
    assert packed.metadata.logical_num_slots == 8
    out = FeatureWiseCTEncoding.decryptcode(packed, eng)
    assert out.shape == x.shape
    assert np.abs(out - x).max() < TOL


def test_packing_roundtrip_fold(eng):
    """last dim > num_slots: folds into multiple cts per row."""
    D = eng.num_slots * 2
    x = np.random.default_rng(1).uniform(-1, 1, (2, D))
    packed = FeatureWiseCTEncoding.encodecrypt(x, eng)
    assert len(packed.cts[0]) == 2  # fold factor
    out = FeatureWiseCTEncoding.decryptcode(packed, eng)
    assert np.abs(out - x).max() < TOL


def test_packed_ct_ops(eng):
    x = np.random.default_rng(2).uniform(-1, 1, (1, 8))
    y = np.random.default_rng(3).uniform(-1, 1, (1, 8))
    px = FeatureWiseCTEncoding.encodecrypt(x, eng)
    py = FeatureWiseCTEncoding.encodecrypt(y, eng)
    s = px + py
    out = FeatureWiseCTEncoding.decryptcode(s, eng)
    assert np.abs(out - (x + y)).max() < TOL
    p = px * py
    out = FeatureWiseCTEncoding.decryptcode(p, eng)
    assert np.abs(out - x * y).max() < TOL


def test_he_linear(eng):
    dim = 8
    rng = np.random.default_rng(4)
    W = rng.uniform(-1, 1, (dim, dim))
    b = rng.uniform(-1, 1, dim)
    x = rng.uniform(-1, 1, (1, dim))

    layer = HELinearFeatureWise(W, b, eng)
    ct_in = FeatureWiseCTEncoding.encodecrypt(x, eng)
    ct_out = layer(ct_in)
    out = FeatureWiseCTEncoding.decryptcode(ct_out, eng)
    expect = x @ W.T + b
    assert out.shape == expect.shape
    assert np.abs(out - expect).max() < 200 * TOL


def test_he_linear_no_bias(eng):
    dim = 8
    rng = np.random.default_rng(5)
    W = rng.uniform(-1, 1, (dim, dim))
    x = rng.uniform(-1, 1, (1, dim))
    layer = HELinearFeatureWise(W, None, eng)
    out = FeatureWiseCTEncoding.decryptcode(
        layer(FeatureWiseCTEncoding.encodecrypt(x, eng)), eng
    )
    assert np.abs(out - x @ W.T).max() < 200 * TOL


# ----------------------------------------------------------------------
# Benchmark framework + CLI.
# ----------------------------------------------------------------------


def test_benchmark_registry():
    from tiberate_tpu.extension.benchmarks import benchreg

    assert {"single_cmult", "single_pmult", "lat_of_each_level",
            "linear_feature_wise", "batched_inference"} <= set(benchreg)


def test_batched_inference_bench():
    """Encrypted logistic-regression scoring (the BASELINE batched
    inference shape): feature-wise packed dot product + degree-3
    sigmoid, exact vs the plain computation."""
    from tiberate_tpu.extension.benchmarks import benchreg

    res = benchreg.get("batched_inference")().run(
        preset="toy", features=3, batches=2, iters=1
    )
    vals = {m.name: m.value for m in res.metrics}
    assert vals["max_err"] < 1e-4
    assert vals["samples_per_s"] > 0
    assert vals["samples"] == 2 * 128  # batches x num_slots (logN=8)


def test_benchmark_result_json():
    from tiberate_tpu.extension.benchmarks import BenchmarkResult

    res = BenchmarkResult(name="t")
    res.add_scalar("a", 1.5, "ms")
    res.add_series("s", [0, 1], [2.0, 3.0])
    res.add_table("t", ["x", "y"], [[1, 2]])
    res.add_distribution("d", [1, 2, 3])
    j = res.to_json()
    assert len(j["metrics"]) == 4
    res.print_terminal()  # smoke


def test_cli_version_and_list():
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-m", "tiberate_tpu", "version"],
        env=env, capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert out.returncode == 0 and out.stdout.strip()

    out = subprocess.run(
        [sys.executable, "-m", "tiberate_tpu", "list-benchmarks"],
        env=env, capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert out.returncode == 0
    assert "single_cmult" in out.stdout


def test_vis_renders_all_metric_kinds(capsys):
    from tiberate_tpu.extension.benchmarks import BenchmarkResult
    from tiberate_tpu.extension.benchmarks.vis import (
        render_line_plot,
        visualize_benchmark_result,
    )

    res = BenchmarkResult(name="vis-test")
    res.add_scalar("lat", 1.25, "ms")
    res.add_series("levels", list(range(8)), [2.0 ** i for i in range(8)],
                   "ms")
    res.add_table("ops", ["op", "ms"], [["mult", 1.2], ["rot", 3.4]])
    res.add_distribution("err", [1e-8, 2e-8, 3e-8])
    visualize_benchmark_result(res)
    out = capsys.readouterr().out
    assert "vis-test" in out and "lat" in out and "mult" in out

    plot = render_line_plot([0, 1, 2], [0.0, 1.0, 0.5], width=20, height=5,
                            title="p")
    lines = plot.splitlines()
    assert any(ch >= "⠀" for line in lines for ch in line)  # braille
    assert "p" in plot

    assert "(no data)" in render_line_plot([], [], title="empty")


def test_selector_state_machine():
    from tiberate_tpu.extension.benchmarks.selector import (
        DEFAULT_OPTIONS,
        SelectorState,
    )

    st = SelectorState()
    n_bench = len(st.bench_names)
    assert n_bench >= 4
    assert st.focus == 0 and st.bench_idx == 0

    # bench pane navigation wraps like the reference list view
    st.handle_key("DOWN")
    assert st.bench_idx == 1
    for _ in range(n_bench - 1):
        st.handle_key("DOWN")
    assert st.bench_idx == 0

    # switching panes + option navigation
    st.handle_key("RIGHT")
    assert st.focus == 1
    st.handle_key("DOWN")
    assert st.option_idx == 1
    assert st.current_option == list(DEFAULT_OPTIONS)[1]
    assert st.option_description == DEFAULT_OPTIONS[st.current_option]

    # switching benchmark resets options (reference update_option_list)
    st.handle_key("LEFT")
    st.handle_key("DOWN")
    assert st.option_idx == 0

    # run/quit actions
    assert st.handle_key("ENTER") == "run"
    assert st.handle_key("^R") == "run"
    assert st.handle_key("q") == "quit"
    assert st.handle_key("^Q") == "quit"

    # descriptions exist for display
    assert isinstance(st.bench_description, str)


def test_selector_requires_tty():
    from tiberate_tpu.extension.benchmarks.selector import run_selector

    with pytest.raises(RuntimeError, match="TTY"):
        run_selector()  # pytest captures stdout -> not a TTY


def test_he_layernorm_feature_wise():
    """HELayerNorm actually computes (the reference ships only the
    interface): encrypted LayerNorm over feature-wise packed inputs with
    a Newton reciprocal-sqrt, vs the plain computation."""
    import numpy as np

    from tiberate_tpu.config.toy import toy_config
    from tiberate_tpu.engine import CkksEngine
    from tiberate_tpu.extension.nn import HELayerNormFeatureWise

    eng = CkksEngine(
        toy_config(logN=8, num_scales=14, num_special_primes=2,
                   scale_bits=30),
        seed=7,
    )
    F = 4
    rng = np.random.default_rng(0)
    # bounded per-slot variance (the CKKS ranged-input contract):
    # var = 1.25 r^2 with r in [0.5, 0.9]
    pattern = np.array([-1.5, -0.5, 0.5, 1.5])
    c = rng.uniform(-0.3, 0.3, eng.num_slots)
    r = rng.uniform(0.5, 0.9, eng.num_slots)
    x = c[None, :] + r[None, :] * pattern[:, None]
    gamma = rng.uniform(0.5, 1.5, F)
    beta = rng.uniform(-0.5, 0.5, F)
    eps = 1e-2

    ln = HELayerNormFeatureWise(
        gamma, beta, eng, eps=eps,
        var_range=(1.25 * 0.25 + eps, 1.25 * 0.81 + eps), iters=2,
    )
    out = ln([eng.encodecrypt(x[f]) for f in range(F)])
    got = np.stack([eng.decryptcode(o, is_real=True) for o in out])

    mu = x.mean(axis=0)
    var = x.var(axis=0)
    expect = gamma[:, None] * (x - mu) / np.sqrt(var + eps) + beta[:, None]
    assert np.abs(got - expect).max() < 5e-3
