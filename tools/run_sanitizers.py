#!/usr/bin/env python
"""ASan/UBSan + TSan gate for the native C++ library (VERDICT r3 #5).

The reference's vendored C++ ships an ASan toggle
(superintervals/test/Makefile:11-15); this is the engine's equivalent:
the library is rebuilt with -fsanitize instrumentation
(SEQUILA_NATIVE_SANITIZE, see native/loader.py) and exercised in a child
python process with the sanitizer runtime LD_PRELOADed (ctypes loads the
.so into an uninstrumented interpreter, so the runtime must be injected
at process start).

- address: -fsanitize=address,undefined over tests/test_native.py AND
  tools/sanitize_driver.py (covers the deliberate si_take_str_fill
  16-byte overrun contract — it must stay inside the caller's slack).
- thread: -fsanitize=thread over the jax-free sanitize_driver only (XLA's
  runtime threads would bury reports from this library; the driver forces
  every threaded native path).

Leak checking stays off: the host is CPython, which "leaks" by design.

Usage: python tools/run_sanitizers.py [address|thread ...]
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _runtime(name: str) -> str:
    out = subprocess.run(
        ["g++", f"-print-file-name={name}"], capture_output=True, text=True,
        check=True,
    ).stdout.strip()
    if not os.path.isabs(out):
        raise SystemExit(f"sanitizer runtime {name} not found (got {out!r})")
    return out


def run_mode(mode: str) -> bool:
    env = dict(os.environ)
    env["SEQUILA_NATIVE_SANITIZE"] = mode
    # fresh cache dir so an instrumented build can never be picked up by
    # normal runs (belt and braces on top of the hash-tag suffix)
    env["SEQUILA_NATIVE_CACHE"] = tempfile.mkdtemp(prefix=f"sequila_{mode}_")
    if mode == "address":
        env["LD_PRELOAD"] = f"{_runtime('libasan.so')} {_runtime('libubsan.so')}"
        env["ASAN_OPTIONS"] = (
            "detect_leaks=0:abort_on_error=1:allocator_may_return_null=1"
        )
        env["UBSAN_OPTIONS"] = "halt_on_error=1:print_stacktrace=1"
        cmds = [
            [sys.executable, "tools/sanitize_driver.py"],
            [sys.executable, "-m", "pytest", "tests/test_native.py", "-q",
             "-p", "no:cacheprovider"],
        ]
    elif mode == "thread":
        env["LD_PRELOAD"] = _runtime("libtsan.so")
        env["TSAN_OPTIONS"] = "halt_on_error=1:second_deadlock_stack=1"
        cmds = [[sys.executable, "tools/sanitize_driver.py"]]
    else:
        raise SystemExit(f"unknown mode {mode!r} (address|thread)")
    ok = True
    for cmd in cmds:
        print(f"[{mode}] $ {' '.join(cmd)}", flush=True)
        rc = subprocess.run(cmd, env=env, cwd=REPO).returncode
        if rc != 0:
            print(f"[{mode}] FAILED (rc={rc})", file=sys.stderr)
            ok = False
    return ok


def main() -> int:
    modes = sys.argv[1:] or ["address", "thread"]
    failed = [m for m in modes if not run_mode(m)]
    if failed:
        print(f"sanitizer gate FAILED: {failed}", file=sys.stderr)
        return 1
    print("sanitizer gate passed:", ", ".join(modes))
    return 0


if __name__ == "__main__":
    sys.exit(main())
