"""Shared helpers for the dev benchmarking/probing tools."""

import threading


def with_timeout(fn, t):
    """Run ``fn()`` on a worker thread; TimeoutError if no result in ``t``
    seconds.  block_until_ready on a wedged dev tunnel ignores signals,
    so a joinable worker thread is the only reliable watchdog; callers
    exit via os._exit so abandoned workers never block shutdown."""
    box = {}

    def work():
        try:
            box["out"] = fn()
        except Exception as e:  # noqa: BLE001
            box["err"] = e

    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(t)
    if th.is_alive():
        raise TimeoutError(f"no result in {t}s")
    if "err" in box:
        raise box["err"]
    return box.get("out")
