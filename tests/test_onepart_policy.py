"""Registry-wide SinglePartition-exchange policy (r07 verdict item 5).

PLAN_AUDIT.md's `1part` census was reviewed row-by-row in r07: every
query whose plan contains an ``Exchange SinglePartition`` does so only for
a provably bounded frame (a 1-row readout, a category-grain table, <=k
top-k survivors, a dim-sized vector, a fixed-size sketch). This test turns
that one-time review into an enforced invariant:

* every audited query whose `1part` + ckpt `1p` total is > 0 must have an
  entry in ``tools/onepart_allowance.json`` whose ``max`` EQUALS the
  audited total and whose ``reason`` names the bounded frame;
* an allowance entry for a query that no longer audits above zero (or no
  longer exists) fails too, so the census can never go stale in either
  direction.

Freshness of PLAN_AUDIT.md itself is pinned by
tests/test_plan_audit.py::test_committed_plan_audit_matches_fresh_run —
together the two tests mean a new entity-sized global window (the
q_model_gains_table class of bug) cannot land silently: regenerating the
audit alone trips THIS test until someone writes a reviewed reason, and
the reviewed alternative is the two-phase rank in plans/ranking.py.
"""

from __future__ import annotations

import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROW = re.compile(
    r"\| (\S+) \| (\d+) \| (\d+) \| (\d+) \| (\d+) \| (\d+) \| (\S+) \| (yes|rows-only) \|"
)


def _audited_onepart_totals() -> dict[str, int]:
    totals: dict[str, int] = {}
    with open(os.path.join(REPO, "PLAN_AUDIT.md")) as fh:
        for line in fh:
            m = ROW.match(line)
            if not m:
                continue
            name, _ex, _bhj, _smj, _sc, p1, ckpt, _orc = m.groups()
            total = int(p1)
            if ckpt != "—":
                total += int(ckpt.split("/")[3])
            totals[name] = total
    return totals


def test_audit_table_parsed() -> None:
    """The regex must actually match the committed table (a format change
    in plan_audit.py would otherwise silently skip every row)."""
    totals = _audited_onepart_totals()
    assert len(totals) > 200, f"only {len(totals)} audit rows parsed"


def test_every_single_partition_exchange_has_a_reviewed_reason() -> None:
    with open(os.path.join(REPO, "tools", "onepart_allowance.json")) as fh:
        allow = json.load(fh)["allowances"]

    totals = _audited_onepart_totals()
    problems: list[str] = []

    for name, total in sorted(totals.items()):
        if total == 0:
            if name in allow:
                problems.append(
                    f"{name}: allowance entry is stale (audits at 0 "
                    "SinglePartition exchanges) — remove it"
                )
            continue
        entry = allow.get(name)
        if entry is None:
            problems.append(
                f"{name}: {total} SinglePartition exchange(s) with NO "
                "reviewed allowance — either rewrite the entity-sized "
                "window via plans/ranking.py or add a reasoned entry to "
                "tools/onepart_allowance.json"
            )
        elif entry["max"] != total:
            problems.append(
                f"{name}: audits at {total} but allowance says "
                f"{entry['max']} — re-review and update the census"
            )
        elif not entry.get("reason", "").strip():
            problems.append(f"{name}: allowance entry has an empty reason")

    for name in sorted(set(allow) - set(totals)):
        problems.append(
            f"{name}: allowance entry for a query absent from PLAN_AUDIT.md"
        )

    assert not problems, "\n".join(problems)
