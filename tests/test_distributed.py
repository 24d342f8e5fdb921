"""Two-process jax.distributed validation (SURVEY.md §4 multi-host tests).

Runs tools/distributed_smoke.py: 2 OS processes x 4 virtual CPU devices
through ``jax.distributed.initialize`` (the --distributed CLI path), a
sharded differentiable render, and the cross-process gradient all-reduce;
asserts bitwise process agreement and equality with a single-process run.
"""

import json
import os
import subprocess
import sys

import pytest

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools",
                    "distributed_smoke.py")


def test_two_process_gradient_allreduce():
    env = dict(os.environ)
    # children control their own platform/device-count env
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, TOOL], capture_output=True, timeout=900, env=env,
    )
    out = proc.stdout.decode()
    if proc.returncode == 3:
        pytest.skip(f"multi-process CPU collectives unavailable: {out[:200]}")
    assert proc.returncode == 0, out + proc.stderr.decode()
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    rep = json.loads(line)
    assert rep["pass"], rep
    assert rep["procs_bitwise_equal"] and rep["grad_matches_single"]
