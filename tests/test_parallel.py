"""Multi-device sharding tests.

The axon sitecustomize pins this interpreter's backend at startup, so
multi-device CPU runs happen in a scrubbed subprocess (the same way the
driver exercises ``__graft_entry__.dryrun_multichip``).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("ndev", [4, 8])
def test_dryrun_multichip(ndev):
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        NDEV=str(ndev),
        PYTHONPATH=REPO,
        XLA_FLAGS=f"--xla_force_host_platform_device_count={ndev}",
    )
    code = (
        "import __graft_entry__ as g; "
        f"g.dryrun_multichip({ndev})"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert f"dryrun_multichip({ndev})" in out.stdout


def test_entry_compiles():
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        PYTHONPATH=REPO,
    )
    code = (
        "import jax, __graft_entry__ as g; "
        "fn, args = g.entry(); "
        "out = jax.jit(fn)(*args); jax.block_until_ready(out); "
        "print('entry ok')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "entry ok" in out.stdout


def test_rns_sharded_keyswitch():
    """shard_map keyswitch over a 2-device 'rns' mesh is bit-exact vs the
    unsharded path (subprocess: needs a multi-device CPU platform)."""
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "_rns_shard_driver.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1500,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "bit-exact: True" in out.stdout


def test_coef_sharded_ntt():
    """Coefficient-axis-sharded NTT (cross-shard butterfly exchange via
    ppermute) is bit-exact vs the unsharded transform on an 8-device mesh."""
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "_coef_shard_driver.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1500,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "NTT bit-exact: True" in out.stdout
    assert "roundtrip bit-exact: True" in out.stdout
    assert "collective-permute in HLO: True" in out.stdout
