"""Regenerate the driver-window priority list (__spark_entry__._PRIORITY)
from the CORRECTNESS_r*.json union — the staleness rotation documented
at __spark_entry__.py:25.

Policy (same order the docstring states):
 1. never-driver-checked queries (alphabetical);
 2. queries whose LATEST driver row was red, until they re-earn green
    (alphabetical);
 3. everything else by oldest-last-green round (ties alphabetical).

Prints the full ranked list plus a ready-to-paste _PRIORITY block for
the next round's 50-slot window. Run: `python tools/rotation.py`.
"""

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as entry

    registered = list(entry.queries().keys())
    # Capacity policy (round 11): the registry is capped at the 50x5=250
    # rotation ceiling so every query stays driver-checked within K=5
    # rounds. Admission past the cap requires retiring a redundant query.
    assert len(registered) <= 250, (
        f"registry {len(registered)} exceeds the 250 rotation ceiling — "
        "retire/merge a redundant query before admitting a new one"
    )
    last_green: dict[str, int] = {}
    last_red: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path)
        rnd = int(m.group(1)) if m else 0
        rows = json.load(open(path))
        for name, row in rows.items():
            ok = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            )
            if ok:
                last_green[name] = max(last_green.get(name, 0), rnd)
            else:
                last_red[name] = max(last_red.get(name, 0), rnd)

    def bucket(name: str) -> tuple:
        g = last_green.get(name)
        r = last_red.get(name)
        if g is None and r is None:
            return (0, name)  # never driver-checked
        if r is not None and (g is None or r > g):
            return (1, name)  # latest row red — must re-earn green
        return (2, g, name)  # oldest last-green first

    ranked = sorted(registered, key=bucket)
    n_never = sum(1 for n in ranked if bucket(n)[0] == 0)
    n_red = sum(1 for n in ranked if bucket(n)[0] == 1)
    print(
        f"# {len(registered)} registered; {n_never} never-checked, "
        f"{n_red} red-awaiting-green"
    )
    for name in ranked:
        b = bucket(name)
        tag = {0: "NEVER", 1: "RED"}.get(b[0], f"green r{b[1]}")
        print(f"{name:40s} {tag}")
    print("\n# next window (paste into __spark_entry__._PRIORITY):")
    print("_PRIORITY: list[str] = [")
    for name in ranked[:50]:
        print(f'    "{name}",')
    print("]")


if __name__ == "__main__":
    main()
