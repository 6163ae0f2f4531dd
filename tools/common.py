"""Shared defaults for the evidence tools (ADVICE r13: abtest and
dump_plans silently measured different layouts when SPARK_GRAFT_SF_DIR was
unset — one defaulted to the bench relayout, the other to the driver
testdata)."""

from __future__ import annotations

import os


def sf_dir() -> str:
    """The layout every evidence tool measures by default: the env var when
    set, else the bench's multi-file relayout (what bench.py actually
    times) when it exists, else the driver testdata."""
    env = os.environ.get("SPARK_GRAFT_SF_DIR")
    if env:
        return env
    relayout = "/tmp/bench_layout_sf0.1"
    if os.path.exists(os.path.join(relayout, "_LAYOUT_DONE")):
        return relayout
    return "/root/testdata/sf0.1"
