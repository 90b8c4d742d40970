"""The benign-AOT-noise stderr filter: drops exactly the known-benign XLA
CPU AOT feature-mismatch log, forwards everything else promptly, and loses
nothing at interpreter exit (including a trailing partial line).

Runs in a subprocess because the filter rewires fd 2 for the process.
"""

import subprocess
import sys

SCRIPT = r"""
import sys, time
from dxrvoxelizer_tpu.utils.backend import filter_benign_aot_noise
filter_benign_aot_noise()
print("first keeper", file=sys.stderr)
print("cpu_aot_loader: benign mismatch blah", file=sys.stderr)
print("Machine type used for XLA:CPU compilation doesn't match", file=sys.stderr)
print("second keeper", file=sys.stderr)
print("partial keeper", file=sys.stderr, end="")
"""


def test_filter_drops_noise_keeps_rest_and_flushes_at_exit():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        timeout=120,
    )
    err = proc.stderr.decode()
    assert proc.returncode == 0
    assert "first keeper" in err
    assert "second keeper" in err
    # the held-back partial line must be flushed by the atexit restore
    assert "partial keeper" in err
    assert "cpu_aot_loader" not in err
    assert "Machine type used for XLA:CPU compilation" not in err


def test_filter_forwards_lines_promptly():
    """A line written long before exit must not sit in a readahead buffer.

    The writer emits one short line, then sleeps holding the pipe open; the
    reader (this test) must see the line while the subprocess is still
    alive — the old ``for line in f`` pump held it until 8 KB accumulated.
    """
    script = r"""
import sys, time
from dxrvoxelizer_tpu.utils.backend import filter_benign_aot_noise
filter_benign_aot_noise()
print("early line", file=sys.stderr)
time.sleep(30)
"""
    proc = subprocess.Popen(
        [sys.executable, "-c", script],
        stderr=subprocess.PIPE,
    )
    try:
        line = proc.stderr.readline()
        assert b"early line" in line
        assert proc.poll() is None, "line must arrive while writer is alive"
    finally:
        proc.kill()
        proc.wait()
