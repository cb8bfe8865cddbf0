"""Build and run the native C++ IO-runtime test binary.

The reference tests its DSP via gtest (CMakeLists.txt:21-27); gtest's
FetchContent needs network access, so the native ring-buffer runtime is
covered by an assert-based standalone binary instead
(native/io_runtime_test.cpp), driven from pytest here so `pytest tests/`
remains the single entry point for the whole suite.
"""

import os
import shutil
import subprocess

import pytest

_NATIVE = os.path.join(os.path.dirname(__file__), "..", "native")


@pytest.mark.slow
def test_native_io_runtime():
    if shutil.which("make") is None or shutil.which("g++") is None:
        pytest.skip("native toolchain unavailable")
    out = subprocess.run(["make", "-C", _NATIVE, "test"],
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "ALL NATIVE TESTS PASSED" in out.stdout
