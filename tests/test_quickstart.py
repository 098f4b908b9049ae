"""The examples/quickstart.py script must stay runnable — it is the
user-facing tour of the API surface."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_quickstart_runs_clean():
    out = subprocess.run(
        [sys.executable, str(REPO / "examples" / "quickstart.py")],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    for step in ("1.", "2.", "3.", "4.", "5."):
        assert step in out.stdout, out.stdout
