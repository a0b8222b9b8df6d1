"""Shared crash discipline for offline store maintenance.

Every maintained at-rest store here (the CMS partials, the HLL
registers, the streaming IVF lists) compacts epoch history with the
same whole-store staged swap — the ``sources/merge.py`` discipline at
store granularity. One implementation, so a future fix to a crash
window (rename ordering, fsync) lands everywhere at once instead of
drifting across hand-copied blocks (review r8).
"""

from __future__ import annotations

import os
import shutil


def staged_swap(live_path: str, write_fn) -> None:
    """Replace the store at ``live_path`` with whatever ``write_fn``
    writes, atomically with respect to crashes:

      1. entry-time self-heal of any PRIOR crashed swap —
         old-without-live → rename old back; leftover stage → delete;
      2. ``write_fn(stage_path)`` fully writes the replacement (the
         write ACTION completes before anything moves);
      3. live → old, stage → live, old deleted — fold-and-delete
         become ONE visibility event, so a re-run is idempotent and
         every crash window is recovered by step 1 on the next call.
    """
    stage = live_path + "__compact_stage"
    old = live_path + "__compact_old"
    if os.path.isdir(old):
        if os.path.isdir(live_path):
            shutil.rmtree(old)
        else:
            os.rename(old, live_path)
    if os.path.isdir(stage):
        shutil.rmtree(stage)
    write_fn(stage)
    os.rename(live_path, old)
    os.rename(stage, live_path)
    shutil.rmtree(old)
