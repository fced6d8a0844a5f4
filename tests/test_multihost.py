"""Multi-host scaffolding (SURVEY.md section 2.3: single process ->
multi-host via ``jax.distributed.initialize``).

Real DCN hardware isn't available here; these tests check the glue: the
no-op single-process path, env-variable configuration, and a degenerate
1-process ``jax.distributed`` cluster running a sharded CLI solve
end-to-end (subprocess-isolated — distributed init is process-global).
"""

import os
import subprocess
import sys

import pytest


def test_init_multihost_noop_without_coordinator(monkeypatch):
    from otamg.dist import init_multihost

    monkeypatch.delenv("OTAMG_COORDINATOR", raising=False)
    assert init_multihost() is False  # single-process: no-op


@pytest.mark.slow
def test_one_process_cluster_cli_solve():
    """A 1-process jax.distributed cluster must run the sharded CLI solve
    end-to-end (coordinator glue + global-device mesh + --shard)."""
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    proc = subprocess.run(
        [sys.executable, "-m", "otamg.cli", "class1", "--m", "32",
         "--n", "32", "--shard",
         "--coordinator", "localhost:49721",
         "--num-processes", "1", "--process-id", "0"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "multi-host: process 0/1" in proc.stderr
    assert '"converged": true' in proc.stdout
