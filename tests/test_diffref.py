"""Differential test vs the compiled reference (skipped when the
reference build isn't present — run `python scripts/diff_reference.py`
once to create it; results are recorded in BENCH/DIFFREF.md)."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent


@pytest.mark.skipif(
    not os.path.exists("/tmp/refbuild/kenlm.so"),
    reason="compiled reference module not built (scripts/diff_reference.py)",
)
def test_matches_compiled_reference():
    out = subprocess.run(
        [sys.executable, "scripts/diff_reference.py", "300"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "F1 = 1.0000" in out.stdout
