"""Production-shape parity rehearsal (CRIS-R50, 416 px, word_len 17).

Wraps tools/parity_rehearsal.py: fabricate an RN50-architecture CLIP
TorchScript archive, build + train the REFERENCE torch CRIS-R50, save a
reference-format best_model.pth, evaluate it through the reference's own
engine.inference AND through our test.py CLI, and require the mIoU/Pr@X
tables to agree within 0.1.

~10-12 minutes on this container's single CPU (full R50 fp32 in both
stacks), so it only runs when explicitly requested:

    CRIS_FULLSCALE=1 python -m pytest tests/test_fullscale_parity.py -q

Last recorded run (2026-08-16): torch mIoU 1.162 vs ours 1.164
(diff 0.002), Pr@{50..90} identical.
"""

import os
import subprocess
import sys

import pytest

from conftest import REPO_ROOT, has_reference

pytestmark = [
    pytest.mark.skipif(
        not os.environ.get("CRIS_FULLSCALE"),
        reason="full-scale rehearsal is ~12 min; set CRIS_FULLSCALE=1",
    ),
    pytest.mark.skipif(not has_reference(), reason="reference repo not mounted"),
]


def test_fullscale_rehearsal(tmp_path):
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO_ROOT, "tools", "parity_rehearsal.py"),
            "--images", "6", "--steps", "3", "--out", str(tmp_path),
        ],
        cwd=REPO_ROOT,
        env={k: v for k, v in os.environ.items()
             if not k.startswith(("JAX_", "XLA_"))},
        capture_output=True, text=True, timeout=3600,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "PASS" in proc.stdout
