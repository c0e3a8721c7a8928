"""Driver-contract tests for __graft_entry__.

The driver compile-checks ``entry()`` on one chip and runs
``dryrun_multichip(8)`` in an environment where jax may already be
initialized on a SINGLE device (MULTICHIP_r01.json regression). Both
call surfaces are exercised here exactly the way they are graded.
"""

import os
import subprocess
import sys

import jax
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT) if REPO_ROOT not in sys.path else None

import __graft_entry__ as graft  # noqa: E402

# every test here trains, gates pretrained snapshots, or spawns subprocesses
pytestmark = pytest.mark.slow


def test_entry_jits():
    fn, (variables, x) = graft.entry()
    out = jax.jit(fn)(variables, x)
    assert out.shape == (8, 128, 128, 1)


def test_dryrun_multichip_direct(capsys):
    """With >=8 devices live (conftest provisions 8 virtual CPU devices),
    the dryrun runs in-process and certifies all three trainers
    (UNet dp x tp x sp, InstanceTrainer dp, CoherentTrainer dp)."""
    graft.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "dryrun_multichip OK" in out
    assert "InstanceTrainer OK" in out
    assert "CoherentTrainer OK" in out
    assert "trainers certified" in out


def test_dryrun_multichip_from_single_device_process():
    """The driver's environment: a process whose jax sees ONE device.
    dryrun_multichip(8) must self-provision the 8-device virtual mesh
    (subprocess re-exec) and exit 0 printing the OK line."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("_RFI_DRYRUN_CHILD", None)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1, jax.devices(); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO_ROOT,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout, proc.stdout
    assert "trainers certified" in proc.stdout, proc.stdout


def test_dryrun_child_guard():
    """A child that STILL lacks devices raises instead of forking forever."""
    env_flag = os.environ.get("_RFI_DRYRUN_CHILD")
    os.environ["_RFI_DRYRUN_CHILD"] = "1"
    try:
        with pytest.raises(RuntimeError, match="provisioning failed"):
            graft._reexec_dryrun(128)
    finally:
        if env_flag is None:
            os.environ.pop("_RFI_DRYRUN_CHILD", None)
        else:
            os.environ["_RFI_DRYRUN_CHILD"] = env_flag
