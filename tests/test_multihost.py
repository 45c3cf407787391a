"""Real multi-process execution gate (VERDICT r2 item 1).

Spawns 2 OS processes via jax.distributed on the CPU backend (4 virtual
devices each -> one 8-device global mesh, gloo collectives) and runs the
dp-sharded proposal batch plus the factor-sharded BA across the process
boundary, asserting equality with purely-local single-process results.
This is the evidence SURVEY.md section 2.9/5.8 calls for: the shard_map
programs are multi-host-valid in fact, not just by construction.
"""

import os
import time

import pytest

from cube_slam_wu_tpu.parallel import multihost


@pytest.mark.slow
def test_two_process_global_mesh(tmp_path):
    results = multihost.launch(
        num_processes=2, local_devices=4, out_dir=str(tmp_path)
    )
    assert len(results) == 2
    for line in results:
        assert line.startswith("OK ")
        assert "ba_chi2=" in line


@pytest.mark.slow
def test_three_process_global_mesh(tmp_path):
    """N >= 3 processes (round-5 verdict item 8): 3 x 2 virtual devices ->
    one 6-device global mesh; same equality assertions per worker."""
    results = multihost.launch(
        num_processes=3, local_devices=2, out_dir=str(tmp_path)
    )
    assert len(results) == 3
    for pid, line in enumerate(results):
        assert line.startswith(f"OK p{pid}/3")
        assert "ba_chi2=" in line


@pytest.mark.slow
def test_worker_death_fails_fast(tmp_path, monkeypatch):
    """Liveness: a worker that dies BEFORE joining the distributed runtime
    leaves the others blocked on the coordinator barrier; launch() must
    detect the death and raise a clean error in bounded time (seconds),
    not hang until the 900 s runtime timeout."""
    monkeypatch.setenv("CUBESLAM_MH_DIE_BEFORE_INIT", "1")
    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="worker 1 died"):
        multihost.launch(
            num_processes=2, local_devices=2, out_dir=str(tmp_path),
            timeout_s=600, fail_fast_grace_s=5.0,
        )
    elapsed = time.monotonic() - t0
    # worker 0 pays its jax import (~10-20 s) before worker 1's death can
    # even be observed relative to it; the bound proves we did not sit out
    # the distributed-runtime barrier timeout
    assert elapsed < 120, f"fail-fast took {elapsed:.0f}s"
    assert os.environ.get("CUBESLAM_MH_DIE_BEFORE_INIT") == "1"
