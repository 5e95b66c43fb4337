"""Collective-traffic accounting for compiled GSPMD programs.

GSPMD partitioning and collective insertion are backend-independent,
so the communication profile of the 8-chip training step can be read
off a program compiled for a *virtual* CPU mesh — the only multi-chip
perf signal available on a 1-chip rig.  `collect_collectives` parses
every collective op (kind, tensor shapes, bytes) out of optimized HLO
text; `ici_time_us` prices one collective with the standard ring model
(all-reduce = reduce-scatter + all-gather, each moving V*(N-1)/N bytes
per link one-way — the scaling-book collective recipe).

Used by `tools/comms_report.py` (flagship report artifact) and
`tests/test_comms.py` (pins the expected collective set of the
data-parallel program: feature all-gathers from the global-batch
Sinkhorn, gradient all-reduces for the replicated parameters).
"""

from __future__ import annotations

import re

_DTYPE_BYTES = {
    "f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "f16": 2,
    "u8": 1, "s8": 1, "f64": 8, "s64": 8, "u64": 8,
}

# v5e ICI one-way link bandwidth (public spec), for the ring model.
ICI_LINK_GBPS = 45.0

COLLECTIVE_OPS = (
    "all-gather", "all-reduce", "reduce-scatter", "collective-permute",
    "all-to-all",
)

_PAT = re.compile(
    r"=\s+((?:\([^)]*\))|\S+)\s+(%s)(?:-start)?\(" % "|".join(COLLECTIVE_OPS)
)


def _shape_list_bytes(shape_str: str) -> tuple[int, list[str]]:
    """Bytes + shape strings for 'f32[a,b]' or '(f32[a], bf16[b,c])'."""
    shapes = re.findall(r"(\w+)\[([\d,]*)\]", shape_str)
    total = 0
    reprs = []
    for dt, dims in shapes:
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES.get(dt, 4)
        reprs.append(f"{dt}[{dims}]")
    return total, reprs


def collect_collectives(hlo_text: str) -> list[dict]:
    """Every collective op in optimized HLO text: kind, shapes, bytes."""
    ops = []
    for line in hlo_text.splitlines():
        m = _PAT.search(line)
        if not m:
            continue
        nbytes, shapes = _shape_list_bytes(m.group(1))
        ops.append({"op": m.group(2), "shapes": shapes, "bytes": nbytes})
    return ops


def ici_time_us(op: str, nbytes: int, n: int) -> float:
    """Ring-model ICI time for one collective over n devices, in us."""
    link_bps = ICI_LINK_GBPS * 1e9
    frac = (n - 1) / n
    if op == "all-reduce":
        moved = 2 * nbytes * frac
    elif op in ("all-gather", "reduce-scatter", "all-to-all"):
        moved = nbytes * frac
    else:  # collective-permute: one hop
        moved = nbytes / n
    return moved / link_bps * 1e6


def comms_summary(hlo_text: str, n_devices: int) -> dict:
    """Aggregate collective traffic of a compiled n-device program."""
    ops = collect_collectives(hlo_text)
    per_kind: dict[str, dict] = {}
    for o in ops:
        o["ici_us"] = round(ici_time_us(o["op"], o["bytes"], n_devices), 2)
        k = per_kind.setdefault(o["op"], {"count": 0, "bytes": 0, "ici_us": 0.0})
        k["count"] += 1
        k["bytes"] += o["bytes"]
        k["ici_us"] = round(k["ici_us"] + o["ici_us"], 2)
    return {
        "devices": n_devices,
        "collective_count": len(ops),
        "total_bytes": sum(o["bytes"] for o in ops),
        "est_ici_us_per_step": round(sum(o["ici_us"] for o in ops), 2),
        "per_kind": per_kind,
        "ops": sorted(ops, key=lambda x: -x["bytes"]),
    }
