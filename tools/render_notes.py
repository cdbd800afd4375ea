#!/usr/bin/env python
"""Render the NOTES artifact section from the committed artifacts, so the
round's numbers cannot drift from what the files actually say (r13,
VERDICT r12 "What's wrong #1": NOTES_r12.md cited 12.8 s / 12.085 raw /
"376 passed" from intermediate runs after the final artifacts had been
regenerated at the snapshot commit with 17.23 s / 12.453 raw / 380).

Usage:
    python tools/render_notes.py --round 13 [--pytest "N passed, 0 failed"]

Reads, for round N (every path optional — missing artifacts are reported
as absent rather than invented):
  CORRECTNESS_LOCAL_r{N}.json        sf0.01 full ledger
  CORRECTNESS_LOCAL_r{N}_sf01.json   sf0.1 full ledger
  BENCH_LOCAL_r{N}.json              accepted bench record
  SCALING.md                         sweep table (exponent lines quoted)

Prints a markdown block to paste (or pipe) into NOTES_r{N}.md. The
--pytest string is taken verbatim from the suite run because the suite
result is not a committed artifact; everything else is read from disk.
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path: str):
    try:
        with open(os.path.join(REPO, path)) as fh:
            return json.load(fh)
    except Exception:
        return None


def _ledger_line(tag: str, d: dict | None, path: str) -> list[str]:
    if d is None:
        return [f"- `{path}`: ABSENT"]
    s = d.get("summary", {})
    lines = [
        f"- `{path}` ({tag}, attests git_head `{d.get('git_head')}`): "
        f"**{s.get('pass')} pass / {s.get('fail')} fail / "
        f"{s.get('rows_only')} rows-only**; sweep total "
        f"{d.get('total_sweep_sec')} s"
    ]
    slowest = d.get("slowest_sweep_ids") or []
    if slowest:
        top = ", ".join(
            f"{e['id']} {e.get('spark_sec', 0) + e.get('oracle_sec', 0):.1f}s"
            for e in slowest[:5]
        )
        lines.append(f"  - slowest: {top}")
    # r14: the ledger's own solo re-probes of its slowest Spark entries —
    # renders the churn-vs-regression answer next to the numbers it
    # qualifies, so a churn-window sweep timing can't be quoted bare
    reprobes = d.get("slowest_reprobes") or {}
    if reprobes:
        rp = ", ".join(
            f"{n} {v['first_spark_sec']}s->{v['reprobe_spark_sec']}s"
            for n, v in reprobes.items()
        )
        lines.append(f"  - solo re-probes (first->reprobe): {rp}")
    return lines


def render(round_n: int, pytest_line: str | None) -> str:
    lines = [f"## Artifacts (rendered by tools/render_notes.py, round {round_n})", ""]
    for tag, path in (
        ("sf0.01", f"CORRECTNESS_LOCAL_r{round_n}.json"),
        ("sf0.1", f"CORRECTNESS_LOCAL_r{round_n}_sf01.json"),
    ):
        lines += _ledger_line(tag, _load(path), path)
    bench = _load(f"BENCH_LOCAL_r{round_n}.json")
    bpath = f"BENCH_LOCAL_r{round_n}.json"
    if bench is None:
        lines.append(f"- `{bpath}`: ABSENT")
    else:
        lines.append(
            f"- `{bpath}`: **{bench.get('value')} s raw / "
            f"{bench.get('calibrated_value')} s calibrated** "
            f"(total_min {bench.get('total_min')}, probe "
            f"{bench.get('probe_observed_sec')}, steal_suspected "
            f"{bench.get('steal_suspected')}, reprobed "
            f"{bench.get('reprobed')}, extras "
            f"{bench.get('extras_pass')}/{bench.get('extras_fail')}"
            f"/{bench.get('extras_error')})"
        )
    # r14 (VERDICT r13 #6): solo probe artifacts are first-class rendered
    # records — a directive-closure claim cites one of these lines, never
    # an intermediate run's number
    import glob

    for p in sorted(glob.glob(os.path.join(REPO, f"PROBE_r{round_n}_*.json"))):
        name = os.path.basename(p)
        d = _load(name)
        if d is None:
            lines.append(f"- `{name}`: UNREADABLE")
            continue
        head = d.get("git_head") or d.get("git_head_after") or d.get("git_heads")
        parts = []
        for q, v in (d.get("probes") or {}).items():
            if "cold_sec" in v:
                parts.append(f"{q} cold {v['cold_sec']}s / warm {v.get('warm_secs')}")
            elif "before_reps" in v:
                parts.append(
                    f"{q} reps {v['before_reps']} -> {v.get('after_reps')}"
                )
            else:
                parts.append(f"{q} {v}")
        # probe files without a `probes` map (e.g. the TPC-H agreement
        # record) summarize their own top-level tables instead
        for key in ("tpch_exponents", "new_witness_confirmations", "witnesses"):
            for q, v in (d.get(key) or {}).items():
                parts.append(
                    f"{q} " + "/".join(
                        f"{rk}={rv}" for rk, rv in v.items() if rk != "note"
                    )
                )
        lines.append(f"- `{name}` (git_head `{head}`): " + ", ".join(parts))
    scaling = os.path.join(REPO, "SCALING.md")
    if os.path.exists(scaling):
        rows = [
            ln
            for ln in open(scaling).read().splitlines()
            if ln.startswith("| ") and not ln.startswith("| query")
            and not ln.startswith("|---")
        ]
        lines.append(f"- `SCALING.md`: {len(rows)} witnesses; exponents "
                     + ", ".join(
                         f"{r.split('|')[1].strip()}={r.split('|')[7].strip()}"
                         for r in rows
                     ))
    else:
        lines.append("- `SCALING.md`: ABSENT")
    lines.append(
        f"- pytest: {pytest_line}" if pytest_line else
        "- pytest: (pass --pytest with the suite line from the final run)"
    )
    lines.append("")
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--pytest", default=None)
    args = ap.parse_args()
    print(render(args.round, args.pytest))


if __name__ == "__main__":
    main()
