"""E2E parity vs the REFERENCE BINARY as a regression test
(VERDICT r3 #5): a behavioral drift in the state machine, averaging
policy, or reconstruction shows up as a divergent FSC-0.143 shell
trajectory on identical data.

Builds (or reuses) .ref_build/thunder_ref via native/ref_harness, runs
a tiny 4-iter 3D refinement through scripts/ref_parity.py on both
frameworks, and gates on the BASELINE.json north-star criterion:
final-round crossing shells within ONE of each other.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_ref_parity_3d(tmp_path):
    ref_bin = os.path.join(REPO, ".ref_build", "thunder_ref")
    if not os.path.exists(ref_bin):
        subprocess.run(
            ["bash", os.path.join(REPO, "native", "ref_harness",
                                  "build_ref.sh")],
            check=True, timeout=3600,
        )
    wd = str(tmp_path / "parity")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # ref_parity pins CPU itself
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "ref_parity.py"),
         wd, "--mode", "3D", "--size", "24", "--n", "96",
         "--iters", "4", "--m-s", "500", "--m-reco", "24"],
        check=True, timeout=1800, env=env, cwd=REPO,
    )
    report = json.load(open(os.path.join(wd, "parity_report.json")))
    assert report.get("final_shell_diff") is not None, report
    assert report["final_shell_diff"] <= 1, report["rounds"]
