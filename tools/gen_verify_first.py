#!/usr/bin/env python3
"""Regenerate ``workloads._VERIFY_FIRST`` for the next driver round.

Every round the driver samples the first ~50 names of ``all_queries()``
(ordered by ``_VERIFY_FIRST``) for the DuckDB correctness gate, and the
freshness backstop (tests/test_freshness.py) reds the build when old
signatures sit outside that sample. Rounds r12 and earlier regenerated the
tuple by hand; this tool makes the burn-down mechanical:

  priority order = (a) names passed via --front, then (b) the AUTO
  front — every BEHAVIOR_CHANGED_SINCE entry whose newest signature
  predates its needs_round and every never-signed registration, in
  registry order (derived from freshness_report, so forgetting --front
  can no longer sort a behavior-changed entry out of the driver
  sample), then (c) every other entry oldest driver signature first,
  alphabetical within a round.

Usage:
  python tools/gen_verify_first.py                       # print the tuple
  python tools/gen_verify_first.py --front a b c         # priority names
  python tools/gen_verify_first.py --write [--front ...] # patch workloads/__init__.py in place

--write replaces the literal tuple body between the ``_VERIFY_FIRST...(``
line and its closing ``)`` — the explanatory comment above the assignment
is left alone (update it by hand each round; it is round-specific prose).
"""
from __future__ import annotations

import argparse
import importlib.util
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_PKG = "moteur_d_analytics_colonne_parquet_like_arrow_like__spark"


def compute_order(front: list[str]) -> list[str]:
    spec = importlib.util.spec_from_file_location(
        "freshness_report", os.path.join(REPO, "tools", "freshness_report.py")
    )
    fr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fr)
    sigs = fr.load_signatures()

    workloads = importlib.import_module(f"{_PKG}.workloads")
    registry = list(workloads.all_queries())
    missing = [n for n in front if n not in registry]
    if missing:
        raise SystemExit(f"--front names not in registry: {missing}")

    # Derive the mandatory front automatically (a forgotten --front used
    # to sort a behavior-changed entry to the tuple's END — outside the
    # driver sample — surfacing only when test_freshness reds later):
    # every BEHAVIOR_CHANGED_SINCE entry whose newest signature predates
    # its needs_round, plus every never-signed registration, in registry
    # order. Explicit --front names come first and may duplicate these.
    auto = [
        n
        for n in registry
        if n not in set(front)
        and (
            n not in sigs
            or (
                n in fr.BEHAVIOR_CHANGED_SINCE
                and sigs[n][0] < fr.BEHAVIOR_CHANGED_SINCE[n][0]
            )
        )
    ]
    head = list(front) + auto

    rest = [n for n in registry if n not in set(head)]
    # never-checked sorts before every real round; alphabetical within
    rest.sort(key=lambda n: (sigs.get(n, (-1, False))[0], n))
    return head + rest


def render(names: list[str]) -> str:
    body = "\n".join(f'    "{n}",' for n in names)
    return f"_VERIFY_FIRST: tuple[str, ...] = (\n{body}\n)"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--front", nargs="*", default=[])
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()
    names = compute_order(args.front)
    text = render(names)
    if not args.write:
        print(text)
        return 0
    path = os.path.join(REPO, _PKG, "workloads", "__init__.py")
    src = open(path).read()
    new, n = re.subn(
        r"_VERIFY_FIRST: tuple\[str, \.\.\.\] = \(\n(?:    \"[^\"]+\",\n)+\)",
        text,
        src,
        count=1,
    )
    if n != 1:
        raise SystemExit("could not locate the _VERIFY_FIRST tuple literal")
    with open(path, "w") as f:
        f.write(new)
    print(f"wrote {len(names)}-entry tuple to {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
