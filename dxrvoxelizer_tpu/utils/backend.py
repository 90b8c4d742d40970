"""Backend selection with a fallback ladder.

The reference tries discrete GPU -> UMA -> WARP software rasterizer at device
creation (DXRVoxelizer.cpp:89-128, 590-636). TPU analog: prefer the TPU
backend, fall back to CPU with a warning — same spirit: the app always comes
up, possibly slower.
"""

from __future__ import annotations

import os
import sys


def _host_cache_key() -> str:
    """Cache subdirectory keyed on the host CPU's ISA feature set.

    CPU AOT artifacts compiled on one host can use vector extensions a
    different host lacks — XLA warns the mismatch "could lead to execution
    errors such as SIGILL" when loading them. Keying the directory on the
    cpuinfo flags makes hosts with differing features never share entries.
    """
    import hashlib
    import platform as _plat

    sig = _plat.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    sig += line
                    break
    except OSError:
        sig += _plat.processor()
    return hashlib.sha1(sig.encode()).hexdigest()[:10]


def filter_benign_aot_noise() -> None:
    """Drop XLA's known-benign CPU AOT feature-mismatch log from stderr.

    The persistent compile cache is keyed per host ISA (_host_cache_key),
    which removes the real SIGILL hazard; the remaining cpu_aot_loader
    complaint fires on the ``+prefer-no-gather`` / ``+prefer-no-scatter``
    LLVM *tuning* flags the compile side records but host detection never
    reports — same-host artifacts trigger it too, and avoiding gathers
    cannot raise SIGILL. It is multi-KB of noise per process, so swallow
    exactly that message and pass everything else through.
    """
    import threading

    real = os.dup(2)
    r, w = os.pipe()
    os.dup2(w, 2)
    os.close(w)

    def drop(line: bytes) -> bool:
        return (b"cpu_aot_loader" in line
                or b"Machine type used for XLA:CPU compilation" in line)

    def pump():
        # os.read, not file iteration: `for line in f` readahead-buffers
        # up to 8 KB, trapping progress lines for minutes (and losing them
        # outright when the daemon thread dies at interpreter exit).
        # Forward every complete line as soon as it arrives; only a
        # trailing partial line is held back.
        part = b""
        while True:
            chunk = os.read(r, 65536)
            if not chunk:
                if part and not drop(part):
                    os.write(real, part)
                os.close(r)
                return
            part += chunk
            lines = part.split(b"\n")
            part = lines.pop()
            for line in lines:
                if not drop(line):
                    os.write(real, line + b"\n")

    t = threading.Thread(target=pump, daemon=True)
    t.start()

    def restore():
        # Point fd 2 back at the terminal and close the pipe's write end:
        # the pump sees EOF, flushes any held partial line, and exits
        # before the interpreter kills daemon threads.
        try:
            sys.stderr.flush()
        except Exception:
            pass
        os.dup2(real, 2)
        t.join(timeout=2.0)

    import atexit

    atexit.register(restore)


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache (opt-out via env).

    Remote-TPU compiles of the big Pallas graphs take 20-120 s each; the
    on-disk cache makes every process after the first skip them (the
    shader-blob cache analog — the reference ships precompiled .cso blobs,
    XUSG ShaderLib loads them, SURVEY.md §2b). Set
    ``DXRVOX_NO_COMPILE_CACHE=1`` to disable; returns the directory in use
    or None.
    """
    if os.environ.get("DXRVOX_NO_COMPILE_CACHE"):
        return None
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("DXRVOX_COMPILE_CACHE") or os.path.join(
            os.path.expanduser("~"), ".cache", "dxrvoxelizer_tpu", "xla",
            _host_cache_key(),
        )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never fatal
        print(f"dxrvoxelizer_tpu: compile cache unavailable ({e})",
              file=sys.stderr)
        return None
    return cache_dir


def select_backend(prefer: str = "default") -> str:
    """Pick and activate a backend; returns the platform name in use."""
    import jax

    if prefer == "cpu":
        jax.config.update("jax_platforms", "cpu")
        return "cpu"
    try:
        devs = jax.devices()
        if devs:
            return devs[0].platform
    except RuntimeError as e:  # no accelerator: the WARP-style fallback
        print(
            f"dxrvoxelizer_tpu: accelerator unavailable ({e}); "
            "falling back to CPU",
            file=sys.stderr,
        )
        jax.config.update("jax_platforms", "cpu")
        return "cpu"
    return "cpu"
