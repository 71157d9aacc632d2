"""ThreadSanitizer coverage for the native ingest runtime (VERDICT r2: the
C++ ring buffers have mutexes but no race-detection coverage — SURVEY §5
prescribes TSAN on host shims). Builds ingest.cpp + a multi-thread stress
driver with -fsanitize=thread and asserts a clean run."""

import os
import shutil
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "ground_fusion_tpu", "native", "src")


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_ingest_tsan_clean(tmp_path):
    exe = str(tmp_path / "stress_tsan")
    build = subprocess.run(
        ["g++", "-O1", "-g", "-std=c++17", "-fsanitize=thread",
         os.path.join(SRC, "ingest.cpp"), os.path.join(SRC, "stress_ingest.cpp"),
         "-o", exe, "-pthread"],
        capture_output=True, text=True, timeout=120,
    )
    if build.returncode != 0 and "tsan" in (build.stderr or "").lower():
        pytest.skip(f"toolchain lacks TSAN runtime: {build.stderr[:200]}")
    assert build.returncode == 0, build.stderr
    run = subprocess.run([exe], capture_output=True, text=True, timeout=300)
    assert "WARNING: ThreadSanitizer" not in run.stderr, run.stderr[:2000]
    assert run.returncode == 0, (run.returncode, run.stderr[:2000])
    assert "stress OK" in run.stdout
