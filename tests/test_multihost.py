"""Real multi-process execution gate (VERDICT r2 item 1).

Spawns 2 OS processes via jax.distributed on the CPU backend (4 virtual
devices each -> one 8-device global mesh, gloo collectives) and runs the
dp-sharded proposal batch plus the factor-sharded BA across the process
boundary, asserting equality with purely-local single-process results.
This is the evidence SURVEY.md section 2.9/5.8 calls for: the shard_map
programs are multi-host-valid in fact, not just by construction.
"""

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
