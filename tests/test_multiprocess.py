"""Real multi-process runtime test (jax.distributed over localhost).

The reference's flagship capability is multi-node training
(``gnnflow/distributed/dist_context.py:17-107``) — which it never
unit-tests (SURVEY.md §4).  Here we spawn 2 OS processes × 4 CPU devices
each, rendezvous at a local coordinator, train the partitioned TGN for a
few steps, and assert the losses equal a single-process run over the
same 8-device (virtual) mesh — the partition tables, batches and
collectives must all line up across the process boundary."""
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
SCRIPT = os.path.join(REPO, "scripts",
                      "offline_edge_prediction_multiprocess.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(nproc: int, pid: int, port: int, local_devices: int,
            extra=()):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")
    env.pop("JAX_PLATFORMS", None)
    return subprocess.Popen(
        [sys.executable, SCRIPT,
         "--coordinator", f"localhost:{port}",
         "--num-processes", str(nproc), "--process-id", str(pid),
         "--platform", "cpu", "--epoch", "2",
         "--synthetic-edges", "12000", "--max-steps", "3", *extra],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)


def _results(output: str):
    rows = re.findall(
        r"RESULT epoch=(\d+) loss=([\d.]+) ap=([\d.]+)", output)
    assert rows, f"no RESULT lines in output:\n{output[-3000:]}"
    return {int(e): (float(l), float(a)) for e, l, a in rows}


@pytest.mark.timeout(600)
def test_two_processes_match_single_process():
    port = _free_port()
    procs = [_launch(2, i, port, local_devices=4) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=480)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    r0, r1 = _results(outs[0]), _results(outs[1])
    # both processes observe the identical replicated loss/metrics
    assert r0 == r1

    # single process over the same 8-device virtual mesh
    p = _launch(1, 0, _free_port(), local_devices=8)
    out, _ = p.communicate(timeout=480)
    assert p.returncode == 0, out[-3000:]
    rs = _results(out)
    assert set(rs) == set(r0)
    for e in rs:
        np.testing.assert_allclose(rs[e][0], r0[e][0], rtol=2e-4,
                                   err_msg=f"loss mismatch at epoch {e}")
        np.testing.assert_allclose(rs[e][1], r0[e][1], rtol=2e-3,
                                   err_msg=f"AP mismatch at epoch {e}")


@pytest.mark.timeout(600)
def test_two_process_auto_calibration_engages_tiers():
    """Multi-host auto-calibration (round 5): a 2-OS-process TGAT run
    must pick a layer-dedup tier ladder from process-uniform global
    probe batches, ENGAGE it (takes histogram non-zero — multi-host mode
    previously trained fully padded), and stay loss-identical to the
    single-process run over the same global mesh."""
    extra = ("--model", "TGAT")
    port = _free_port()
    procs = [_launch(2, i, port, local_devices=2, extra=extra)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=480)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    r0, r1 = _results(outs[0]), _results(outs[1])
    assert r0 == r1
    takes = re.findall(r"layer-dedup takes \[(\d+)", outs[0])
    assert takes and any(int(t) > 0 for t in takes), outs[0][-3000:]

    p = _launch(1, 0, _free_port(), local_devices=4, extra=extra)
    out, _ = p.communicate(timeout=480)
    assert p.returncode == 0, out[-3000:]
    rs = _results(out)
    assert set(rs) == set(r0)
    for e in rs:
        np.testing.assert_allclose(rs[e][0], r0[e][0], rtol=2e-4,
                                   err_msg=f"loss mismatch at epoch {e}")
        np.testing.assert_allclose(rs[e][1], r0[e][1], rtol=2e-3,
                                   err_msg=f"AP mismatch at epoch {e}")
    takes1 = re.findall(r"layer-dedup takes \[(\d+)", out)
    assert takes == takes1


@pytest.mark.timeout(600)
def test_two_process_cached_matches_single_process():
    """KV-backed cache across real OS processes (the reference's
    distributed cache, ``gnnflow/cache/cache.py:364-377``): feature
    masters sharded over the 2-process mesh, misses = sharded pulls,
    training loss-identical to the single-process cached run."""
    extra = ("--cache", "LRUCache", "--edge-cache-ratio", "0.3")
    port = _free_port()
    procs = [_launch(2, i, port, local_devices=4, extra=extra)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=480)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    r0, r1 = _results(outs[0]), _results(outs[1])
    assert r0 == r1
    assert "edge hit" in outs[0]  # the cache path actually ran

    p = _launch(1, 0, _free_port(), local_devices=8, extra=extra)
    out, _ = p.communicate(timeout=480)
    assert p.returncode == 0, out[-3000:]
    rs = _results(out)
    assert set(rs) == set(r0)
    for e in rs:
        np.testing.assert_allclose(rs[e][0], r0[e][0], rtol=2e-4,
                                   err_msg=f"loss mismatch at epoch {e}")
        np.testing.assert_allclose(rs[e][1], r0[e][1], rtol=2e-3,
                                   err_msg=f"AP mismatch at epoch {e}")
    # the 2-process and 1-process cache replicas see identical streams,
    # so hit accounting must match exactly
    hit = re.findall(r"edge hit ([\d.]+)", outs[0])
    hit1 = re.findall(r"edge hit ([\d.]+)", out)
    assert hit == hit1 and len(hit) == 2
