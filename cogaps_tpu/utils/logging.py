"""Logging discipline (reference: src/utils/GapsPrint.h:3-15 and the
worker start/finish lines GapsRunner.cpp:429-433,495-501). In multi-host
runs only process_index 0 prints, mirroring the reference's workerID
convention (SURVEY.md §2.3 P6)."""

from __future__ import annotations

import sys


def _is_primary() -> bool:
    try:
        import jax
        return jax.process_index() == 0
    except Exception:
        return True


def log_message(msg: str) -> None:
    if _is_primary():
        print(msg, file=sys.stdout, flush=True)


def log_worker(worker_id: int, msg: str) -> None:
    print(f"    worker {worker_id} {msg}", file=sys.stdout, flush=True)
