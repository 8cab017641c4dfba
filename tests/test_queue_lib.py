"""Queue plumbing must fail loudly (VERDICT r4 #8).

Round 4's A/B refresh queue (tpu_queue_r4e.sh) invoked a console script
that was never installed; every stage exited 127 and the queue finished
"green", committing four empty logs. tools/queue_lib.sh is the shared
replacement: run() records and returns exit status, ok() gates on it,
and queue_done writes a FAILED marker + non-zero exit when any stage
failed. These tests drive it with deliberate failures.
"""

import subprocess
from pathlib import Path

import pytest

TOOLS = Path(__file__).resolve().parent.parent / "tools"


def _queue(tmp_path: Path, body: str) -> subprocess.CompletedProcess:
    script = tmp_path / "queue.sh"
    script.write_text(
        "#!/bin/bash\n"
        f"cd {tmp_path}\n"
        f"QDIR={tmp_path}/q\n"
        f"source {TOOLS}/queue_lib.sh\n" + body
    )
    return subprocess.run(
        ["bash", str(script)], capture_output=True, text=True, timeout=120
    )


def test_missing_binary_writes_failure_marker(tmp_path):
    proc = _queue(
        tmp_path,
        "run 30 boom p2c-definitely-not-installed --flag\n"
        "ok boom && echo DEP_RAN\n"
        "queue_done\n",
    )
    assert proc.returncode != 0
    assert "DEP_RAN" not in proc.stdout  # ok() gated the dependent stage
    failed = tmp_path / "q" / "FAILED"
    assert failed.exists()
    assert "boom" in failed.read_text()
    # the failure is visible in the queue transcript, not only the marker
    assert "FAILED" in proc.stdout


def test_all_green_queue_exits_zero(tmp_path):
    proc = _queue(
        tmp_path,
        "run 30 fine true\n"
        "ok fine && run 30 dep true\n"
        "queue_done\n",
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert not (tmp_path / "q" / "FAILED").exists()
    status = (tmp_path / "q" / "STATUS").read_text()
    assert "fine=0" in status and "dep=0" in status


def test_preflight_blocks_on_unimportable_entry_point(tmp_path):
    # simulate the r4e environment by hiding the package from python
    script = tmp_path / "queue.sh"
    script.write_text(
        "#!/bin/bash\n"
        f"cd {tmp_path}\n"  # NOT the repo root: package unimportable
        f"QDIR={tmp_path}/q\n"
        f"source {TOOLS}/queue_lib.sh\n"
        "preflight\n"
        "run 30 never true\n"
        "queue_done\n"
    )
    proc = subprocess.run(
        ["bash", str(script)],
        capture_output=True,
        text=True,
        timeout=120,
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": str(tmp_path)},
    )
    if "cannot import" not in proc.stdout:
        pytest.skip("package importable from site-packages; cannot simulate")
    assert proc.returncode != 0
    assert (tmp_path / "q" / "FAILED").exists()
    assert "never" not in proc.stdout  # no stage ran after a bad preflight
