"""Regenerate __spark_entry__._PREVIOUSLY_VERIFIED from every
CORRECTNESS_r*.json in the repo root.

The driver verifies only the first 50 ``queries()`` entries per round;
``__spark_entry__.queries()`` orders not-yet-verified entries first so
the window rotates across rounds. Run this at the START of a round
(after the previous round's CORRECTNESS artifact lands) to fold newly
green names into the frozen set:

    python scripts/update_rotation.py && git diff __spark_entry__.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import textwrap

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    verified: set[str] = set()
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            # count green rows AND rows-only checks (err='no_oracle'
            # with a recorded row count) as "has been in the window";
            # genuinely errored rows stay unverified so they re-enter
            # the window first after a fix.
            if not isinstance(row, dict):
                continue
            err = row.get("err")
            if not err or (err == "no_oracle" and row.get("spark_rows") is not None):
                verified.add(name)
    names = ", ".join(f'"{n}"' for n in sorted(verified))
    body = textwrap.fill(
        names, width=72, initial_indent="    ", subsequent_indent="    "
    )
    literal = f"_PREVIOUSLY_VERIFIED = frozenset({{\n{body},\n}})"

    entry_path = os.path.join(ROOT, "__spark_entry__.py")
    with open(entry_path) as f:
        src = f.read()
    new_src, n = re.subn(
        r"_PREVIOUSLY_VERIFIED = frozenset\(\{.*?\}\)",
        literal,
        src,
        flags=re.S,
    )
    if n != 1:
        raise SystemExit("could not find _PREVIOUSLY_VERIFIED block")

    # Clear force-refresh names once an artifact AT OR AFTER the name's
    # round stamp has re-recorded them: a stale _ROTATION_FORCE_REFRESH
    # would keep treating them as never-verified forever, permanently
    # consuming window slots — but an OLDER green row (predating the
    # code change that motivated the refresh, e.g. the name happened to
    # sit in the latest round's window already) must NOT clear it.
    # Entries are "name@N" (clear when CORRECTNESS_r{M>=N} records the
    # name); a bare "name" behaves as "@0" (any artifact clears it).
    recorded_by_round: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd_m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(rnd_m.group(1)) if rnd_m else 0
        with open(path) as f:
            for name in json.load(f):
                recorded_by_round[name] = max(
                    recorded_by_round.get(name, -1), rnd
                )
    m = re.search(
        r"_ROTATION_FORCE_REFRESH = frozenset\(\{(.*?)\}\)", new_src, re.S
    )
    if m:
        current = set(re.findall(r'"([^"]+)"', m.group(1)))

        def _cleared(entry: str) -> bool:
            name, _, stamp = entry.partition("@")
            needed = int(stamp) if stamp else 0
            return recorded_by_round.get(name, -1) >= needed

        remaining = sorted(e for e in current if not _cleared(e))
        if remaining != sorted(current):
            inner = (
                "\n    " + ", ".join(f'"{r}"' for r in remaining) + ",\n"
                if remaining
                else ""
            )
            new_src = (
                new_src[: m.start()]
                + f"_ROTATION_FORCE_REFRESH = frozenset({{{inner}}})"
                + new_src[m.end():]
            )
            print(
                f"cleared {len(current) - len(remaining)} re-recorded "
                "force-refresh names"
            )

    with open(entry_path, "w") as f:
        f.write(new_src)
    print(f"folded {len(verified)} verified names into __spark_entry__.py")


if __name__ == "__main__":
    main()
