"""Derive the next-round ``registry.PRIORITY`` from driver history.

The driver proves only the first ``DRIVER_BUDGET`` (=50) registry
entries per round, so with 100 registered queries the PRIORITY list is
load-bearing: it must front-load exactly the entries whose driver
evidence would otherwise go two rounds stale. Hand-maintaining it is
error-prone (VERDICT r8 item 3), so this script derives it from the
committed ``CORRECTNESS_r*.json`` history:

1. **stale-first** — every registered entry with no green row in the
   latest committed round, in module-flat registry order (the
   PRIORITY-independent order: each module's ``QUERIES`` dict in
   ``registry._modules()`` sequence, skipping ``RETIRED``);
2. **newly-registered last** — entries with no green row in ANY round
   (no history ⇒ must be proven in their registration round).

``tests/test_gen_priority.py`` asserts ``registry.PRIORITY`` equals
this derivation, turning the rotation tripwire
(``tests/test_registry_rotation.py``) into a consistency check: when a
new ``CORRECTNESS_r{N}.json`` lands, run

    python scripts/gen_priority.py            # prints the list
    python scripts/gen_priority.py --write    # rewrites registry.py

and both tests go green again.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REGISTRY_PATH = os.path.join(
    REPO, "customer_churn_prediction_spark", "plans", "registry.py"
)


def history(repo: str = REPO) -> dict[int, dict]:
    rounds: dict[int, dict] = {}
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        with open(path) as f:
            rounds[int(m.group(1))] = json.load(f)
    return rounds


def is_green(row: dict) -> bool:
    if row.get("hash_match"):
        return True
    # rows-only contract: driver records err="no_oracle" plus a count.
    return row.get("err") == "no_oracle" and row.get("spark_rows") is not None


def flat_order() -> list[str]:
    """Registered names in PRIORITY-independent module-flat order."""
    from customer_churn_prediction_spark.plans import registry

    flat: list[str] = []
    for mod in registry._modules():
        for name in getattr(mod, "QUERIES", {}):
            if name not in registry.RETIRED:
                flat.append(name)
    return flat


def derive_priority(rounds: dict[int, dict] | None = None) -> list[str]:
    rounds = history() if rounds is None else rounds
    if not rounds:
        raise SystemExit("no CORRECTNESS_r*.json history found")
    latest = max(rounds)
    flat = flat_order()
    stale = [
        n for n in flat
        if not (n in rounds[latest] and is_green(rounds[latest][n]))
    ]
    never = {
        n for n in stale
        if not any(n in rows and is_green(rows[n]) for rows in rounds.values())
    }
    # stale-with-history first (flat order), never-proven last (flat
    # order) — a brand-new registration closes the list so the comment
    # block in registry.py stays truthful.
    return [n for n in stale if n not in never] + [n for n in stale if n in never]


def render(priority: list[str], latest: int) -> str:
    lines = [
        "PRIORITY = [",
        f"    # latest green row is r{latest - 1} — re-prove before the"
        " evidence goes stale",
    ]
    seen_new = False
    rounds = history()
    for name in priority:
        is_new = not any(
            name in rows and is_green(rows[name]) for rows in rounds.values()
        )
        if is_new and not seen_new:
            lines.append(
                f"    # registered in r{latest + 1} — first driver row"
                " this round"
            )
            seen_new = True
        lines.append(f'    "{name}",')
    lines.append("]")
    return "\n".join(lines)


def main() -> None:
    rounds = history()
    latest = max(rounds)
    priority = derive_priority(rounds)
    block = render(priority, latest)
    if "--write" in sys.argv:
        with open(REGISTRY_PATH) as f:
            src = f.read()
        new_src, n = re.subn(
            r"PRIORITY = \[.*?\n\]", block, src, count=1, flags=re.S
        )
        if n != 1:
            raise SystemExit("could not locate PRIORITY block in registry.py")
        with open(REGISTRY_PATH, "w") as f:
            f.write(new_src)
        print(f"rewrote {REGISTRY_PATH} ({len(priority)} entries,"
              f" history through r{latest})")
    else:
        print(block)
        print(f"# {len(priority)} entries, history through r{latest}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
