"""End-to-end dress rehearsal in the suite (r4 VERDICT item 6).

Runs tools/dress_rehearsal.py — the one-command chain a real VQA-v2/COCO
drop would execute: prepare_data on real-schema JSON -> real JPEGs ->
native_mp decode train -> test mode -> official results JSON ->
datahelper.loadRes -> serve smoke. Every stage goes through the real CLI
surface (reference contract: /root/reference/prepare_data.py:84-98,
/root/reference/datahelper.py:149-183).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dress_rehearsal_end_to_end(tmp_path):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dress_rehearsal.py"),
         "--work_dir", str(tmp_path / "work")],
        capture_output=True, text=True, cwd=REPO, timeout=1500,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    tail = (proc.stdout + proc.stderr)[-4000:]
    assert proc.returncode == 0, tail
    assert "DRESS REHEARSAL PASS" in proc.stdout, tail
    assert "loadRes round-trip OK" in proc.stdout, tail
    assert "serve smoke OK" in proc.stdout, tail
