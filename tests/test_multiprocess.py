"""True 2-process ``jax.distributed`` lockstep test (VERDICT r2 #5).

The virtual 8-device mesh runs everything in ONE process, so it cannot
falsify the parts of the distributed engine that only exist across
processes: the ``sync_submissions`` padded broadcast, host fetches of
globally-sharded chunk outputs (non-addressable shards), and scheduler
lockstep.  This test launches two REAL processes (Gloo CPU collectives,
2 local devices each → one global (data=2, model=2) mesh), runs the
distributed engine end-to-end in both, and asserts:

* both processes emit identical tokens for every request, and
* those tokens exactly match a single-process run over the same
  (2,2) global mesh (the already-trusted configuration).

Reference: no analog — the reference is single-device torch
(SURVEY.md §2: no torch.distributed anywhere); this validates the
multi-host runtime the TPU rebuild adds.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(n_proc: int, tmp_path, engine: str = "dense") -> list[dict]:
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    # workers must import the package even when the editable install is
    # absent (session resets wipe site-packages; cwd covers the parent only)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs, outs = [], []
    for i in range(n_proc):
        out = tmp_path / f"out_{engine}_{n_proc}p_{i}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(i), str(n_proc), str(port), str(out),
             engine],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        ))
    results = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multiprocess worker timed out (lockstep deadlock?)")
        assert p.returncode == 0, f"worker failed:\n{stdout[-3000:]}"
    for out in outs:
        with open(out) as f:
            results.append(json.load(f))
    return results


def test_two_process_lockstep_token_exact(tmp_path):
    two = _run_workers(2, tmp_path)
    assert two[0]["tokens"] == two[1]["tokens"], (
        "processes diverged:\n"
        f"proc0={two[0]['tokens']}\nproc1={two[1]['tokens']}")
    assert len(two[0]["tokens"]) == 2
    assert all(len(v) == 6 for v in two[0]["tokens"].values())

    one = _run_workers(1, tmp_path)
    assert one[0]["tokens"] == two[0]["tokens"], (
        "2-process run diverged from the single-process oracle on the same "
        f"global mesh:\n1p={one[0]['tokens']}\n2p={two[0]['tokens']}")


def test_two_process_paged_speculative_token_exact(tmp_path):
    """The distributed PAGED engine with in-graph speculation across two
    real processes: the spec chunk fetches data-sharded draft/accept/next
    arrays every step (paged_engine._spec_step → _fetch), which a
    single-process mesh can never falsify."""
    two = _run_workers(2, tmp_path, engine="paged_spec")
    assert two[0]["tokens"] == two[1]["tokens"], (
        f"proc0={two[0]['tokens']}\nproc1={two[1]['tokens']}")
    one = _run_workers(1, tmp_path, engine="paged_spec")
    assert one[0]["tokens"] == two[0]["tokens"], (
        f"1p={one[0]['tokens']}\n2p={two[0]['tokens']}")
    # speculation must not change the tokens either
    dense = _run_workers(1, tmp_path, engine="dense")
    assert dense[0]["tokens"] == two[0]["tokens"], (
        f"dense={dense[0]['tokens']}\nspec={two[0]['tokens']}")
