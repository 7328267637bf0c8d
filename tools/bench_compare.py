"""Mechanical round-over-round bench comparison (r07 verdict ask #6).

The honest r-over-r number is the COMMON-KEY total between two committed
BENCH_local artifacts — each round adds keys, so full-set totals are not
comparable, and the host's documented drift phases (BASELINE.md §3) mean
only canary-clean windows should be compared at all.  r07's story needed a
decoder ring (driver 197.0s vs committed 174.3s vs common-key 169.0s);
this tool makes the comparison one command:

    python tools/bench_compare.py BENCH_local_r06.json BENCH_local_r07.json

Prints both windows' canaries (including the r08 ``canary_strict_ok``
two-probe signal where present), the common-key totals and ratio for the
headline and verification tiers, every per-key >2x outlier in either
direction, and a one-line summary to paste into SURVEY §10's r-over-r
table.  Exit code 0 always — this is a reporting tool, not a gate.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name: str) -> tuple[str, dict]:
    path = name if os.path.exists(name) else os.path.join(HERE, name)
    with open(path) as fh:
        return os.path.basename(path), json.load(fh)


def _canary_line(label: str, art: dict) -> str:
    c = art.get("host_canary_s") or {}
    parts = [f"first_touch {c.get('before')}/{c.get('after')}"]
    if "stage_before" in c:
        parts.append(f"stage {c.get('stage_before')}/{c.get('stage_after')}")
    parts.append(f"ok={c.get('canary_ok')}")
    if "canary_strict_ok" in c:
        parts.append(f"strict={c.get('canary_strict_ok')}")
    if "canary_mid_ok" in c:
        mids = [m.get("stage_s") for m in c.get("mid", [])]
        parts.append(f"mid={c.get('canary_mid_ok')} {mids}")
    if c.get("end_canary_note"):
        parts.append("end_canary_note=True")
    return f"  {label}: " + "  ".join(parts)


def comparison_grade(art: dict) -> tuple[bool, str]:
    """The r10 adjudication rule (SURVEY §10.11, codified with bench.py):
    a window is comparison-grade when (a) strict endpoints AND quiet mid
    probes, or (b) the end-canary false-flag pattern — ONLY the closing
    first-touch failed while every stage probe (before/mid/after) was
    quiet, which measures post-sweep guest-memory state, not sweep
    health.  (b) carries a note.  Pre-mid artifacts (<= r08) grade on
    strict alone."""
    c = art.get("host_canary_s") or {}
    if c.get("canary_strict_ok") and c.get("canary_mid_ok", True):
        return True, "strict"
    if c.get("end_canary_note"):
        return True, "with-note (end-canary false-flag pattern)"
    return False, "not comparison-grade"


def _compare_tier(
    a: dict, b: dict, tier: str, outlier_ratio: float = 2.0
) -> tuple[str, list[str]]:
    qa = {k: v for k, v in (a.get(tier) or {}).items() if not k.startswith("_")}
    qb = {k: v for k, v in (b.get(tier) or {}).items() if not k.startswith("_")}
    common = sorted(set(qa) & set(qb))
    if not common:
        return f"{tier}: no common keys", []
    ta = sum(qa[k] for k in common)
    tb = sum(qb[k] for k in common)
    ratio = tb / ta if ta else float("inf")
    head = (
        f"{tier}: {len(common)} common keys  "
        f"{ta:.1f}s -> {tb:.1f}s  ratio {ratio:.3f}  "
        f"(only-in-A {len(set(qa) - set(qb))}, only-in-B {len(set(qb) - set(qa))})"
    )
    outliers = []
    for k in common:
        va, vb = qa[k], qb[k]
        if va <= 0 or vb <= 0:
            continue
        r = vb / va
        if r >= outlier_ratio or r <= 1 / outlier_ratio:
            tiny = " [sub-1.5s: host-variance scale]" if max(va, vb) < 1.5 else ""
            outliers.append(f"    {k}: {va:.2f}s -> {vb:.2f}s  ({r:.2f}x){tiny}")
    return head, outliers


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(0)
    name_a, art_a = _load(sys.argv[1])
    name_b, art_b = _load(sys.argv[2])

    print(f"A = {name_a}  (sf={art_a.get('sf')})")
    print(f"B = {name_b}  (sf={art_b.get('sf')})")
    print("canaries:")
    print(_canary_line("A", art_a))
    print(_canary_line("B", art_b))

    summary_bits = []
    for tier in ("queries", "verification_tier_s", "index_build_s"):
        head, outliers = _compare_tier(art_a, art_b, tier)
        print(head)
        for line in outliers:
            print(line)
        if tier == "queries" and "ratio" in head:
            summary_bits.append(head)

    grade_a, why_a = comparison_grade(art_a)
    grade_b, why_b = comparison_grade(art_b)
    print(f"grade: A {why_a};  B {why_b}")
    if not (grade_a and grade_b):
        print(
            "NOTE: at least one window is not comparison-grade under the "
            "r10 rule — the ratio above reflects host state, not code."
        )
    elif "note" in why_a or "note" in why_b:
        print(
            "NOTE: a window carries the end-canary note (closing "
            "first-touch spiked, all stage probes quiet) — ratio is "
            "comparison-grade; the spike measures post-sweep guest "
            "memory, not the sweep."
        )
    # the one-line SURVEY summary
    if summary_bits:
        print("SURVEY: " + f"{name_a} -> {name_b}  " + summary_bits[0])


if __name__ == "__main__":
    main()
