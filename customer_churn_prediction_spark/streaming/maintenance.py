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


def compact_swap(live_path: str, write_fn) -> None:
    """``staged_swap`` for COMPACTION — a fold of the store's own
    epoch history, where ``write_fn`` reads ``live_path`` itself. A
    store (or sub-store) that was never ingested — or whose root an
    erasure removed after emptying it — has nothing to fold: a no-op,
    mirroring every reader's missing-path guard, instead of letting
    the fold's ``spark.read.parquet`` raise on the missing directory
    (advice r13). One shared guard so all twelve families agree.

    A missing live dir is NOT always "never ingested": a swap that
    crashed between live→old and stage→live leaves old-without-live,
    which ``staged_swap``'s entry-time self-heal would restore — so
    heal that window FIRST, and only then treat a still-missing live
    path as the no-op case."""
    old = live_path + "__compact_old"
    if os.path.isdir(old) and not os.path.isdir(live_path):
        os.rename(old, live_path)
    if not os.path.isdir(live_path):
        return
    staged_swap(live_path, write_fn)


def rebuild_base(live_path: str, state_df) -> None:
    """Replace a store's ENTIRE epoch history with a freshly computed
    base partition — THE erasure path for lossy sketches. A shared
    bit/register/cell cannot be unlearned in place (it may belong to
    other keys), so governance for a sketch store is: scrub the
    SOURCE, recompute the state from the clean source, and swap it in
    as the base epoch. The swap is the same staged-swap crash
    discipline as compaction, so a crash mid-rebuild never leaves a
    half-forgotten store — readers see the old state or the clean
    state, nothing between. OFFLINE (maintenance query stopped); the
    restarted query's checkpoint must be fresh, since the old
    offsets' epochs no longer exist in the store.

    ``state_df`` is the family's mergeable state computed over the
    scrubbed source (bloom bits / HLL registers / CMS cells).
    Requires an existing store — rebuilding a store that never
    ingested is meaningless (there is nothing to forget)."""
    from pyspark.sql import functions as F

    if not os.path.isdir(live_path):
        raise FileNotFoundError(
            f"rebuild_base: no store at {live_path} — nothing to "
            "rebuild; a first build is the maintenance query's job"
        )
    if state_df.isEmpty():
        # Scrub removed every key: an EMPTY partitioned write would
        # leave a dir with no part files, which passes the readers'
        # isdir guard and then fails schema inference. The truthful
        # state is "never ingested" — remove the store and let the
        # readers' missing-path guard answer empty/0/not-flagged.
        shutil.rmtree(live_path)
        return

    def _write(stage: str) -> None:
        (
            state_df.withColumn("epoch_id", F.lit(-1))
            .repartition("epoch_id")
            .write.mode("overwrite")
            .partitionBy("epoch_id")
            .parquet(stage)
        )

    staged_swap(live_path, _write)
