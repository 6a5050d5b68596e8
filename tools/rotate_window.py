"""Compute the next round's driver-verification window (PARITY.md rotation).

The driver hash-checks only the first 50 entries of
``__spark_entry__.queries()``. This tool ranks every registered query by how
much it needs a driver row — never-checked first, then rows-only-checked,
then hash-green ordered by how long ago the green row landed — and prints
the 50-entry ``VERIFY_PRIORITY`` list for the next round.

Usage: ``python tools/rotate_window.py`` (run after a round's
CORRECTNESS_r{N}.json lands; paste the output into __spark_entry__.py).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

WINDOW = 50


def classify(repo: str = _REPO) -> dict[str, tuple[int, int]]:
    """name -> (tier, last_round): tier 0 = never driver-checked,
    1 = rows-only row only, 2 = hash-green (last_round = most recent)."""
    from csv_parquet_s3_spark.operators import QUERIES

    state: dict[str, tuple[int, int]] = {name: (0, 0) for name in QUERIES}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        for name, row in json.load(open(path)).items():
            if name not in state:
                continue  # renamed/retired query
            if row.get("hash_match"):
                state[name] = (2, rnd)
            elif row.get("err") == "no_oracle" and state[name][0] < 2:
                state[name] = (1, rnd)
    return state


def next_window(repo: str = _REPO) -> list[str]:
    from csv_parquet_s3_spark.operators import ORACLES

    state = classify(repo)
    # within a tier: oracle-backed entries first (a window slot buys a hash
    # row, not a weaker rows-only row), then registry order for stability
    order = list(state)
    ranked = sorted(
        order,
        key=lambda n: (
            state[n][0],          # tier: unchecked < rows-only < green
            state[n][1],          # older green rows rotate in sooner
            n not in ORACLES,     # oracle-backed first within a tier
            order.index(n),
        ),
    )
    return ranked[:WINDOW]


def main() -> None:
    win = next_window()
    print("VERIFY_PRIORITY: list[str] = [")
    for name in win:
        print(f'    "{name}",')
    print("]")


if __name__ == "__main__":
    main()
