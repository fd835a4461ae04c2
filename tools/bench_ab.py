"""Interleaved A/B bench bisect: is a headline drift code or host?

The r10->r11 post-mortem established that single-invocation headline
totals move +-11% on IDENTICAL code (host/JVM noise), so any
cross-round delta under ~15% is unattributable without an
interleaved comparison. This tool is that comparison, checked in so
the next drift question is a one-command answer (VERDICT r11 ask #7;
the r11 bisect ran from /tmp and its harness was lost with the
session).

Method: check out each ref into its own git worktree, then run the
HEADLINE-ONLY bench (SPARK_GRAFT_BENCH_SECTIONS=headline — canary +
warmup + RUNS timed passes of the 11 headline queries) alternately —
A B / B A / A B ... — so slow host drift hits both refs
symmetrically instead of biasing whichever ran later. Per-ref
per-query MEDIANS across passes are the comparison; the canary-
normalized total (value_per_canary) is the host-drift-free verdict.

Usage:
    python tools/bench_ab.py <refA> <refB> [--passes 3] [--sf-dir D]

A ref of "." means "this checkout as-is" (including uncommitted
changes); anything else is resolved by git into a temp worktree.
Refs older than round 12 predate the section gate, so each of their
passes runs the FULL bench (~20 min) — compare those with --passes 1
first, or cherry-pick the gate onto a throwaway branch.

Output: one human table on stderr; one JSON line per run plus a
final summary line on stdout (archive-greppable, same convention as
bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _worktree(ref: str, tmp: str) -> str:
    """A checkout to run the ref's bench from ('.' = this repo)."""
    if ref == ".":
        return REPO
    path = os.path.join(tmp, ref.replace("/", "_"))
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--detach", path, ref],
        check=True,
        capture_output=True,
    )
    return path


def _cleanup(ref: str, path: str) -> None:
    if ref == ".":
        return
    subprocess.run(
        ["git", "-C", REPO, "worktree", "remove", "--force", path],
        check=False,
        capture_output=True,
    )


def _run_once(checkout: str, sf_dir: str) -> dict:
    """One bench invocation; returns the parsed headline_compact (the
    last JSON line bench.py prints)."""
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_SECTIONS"] = "headline"
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["PYTHONPATH"] = checkout
    proc = subprocess.run(
        [sys.executable, os.path.join(checkout, "bench.py")],
        cwd=checkout,
        env=env,
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"bench failed in {checkout}: {proc.stderr[-800:]}"
        )
    last = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            last = line
    if last is None:
        raise RuntimeError(f"no JSON line from bench in {checkout}")
    return json.loads(last)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ref_a")
    ap.add_argument("ref_b")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="bench_ab_")
    paths = {}
    try:
        paths[args.ref_a] = _worktree(args.ref_a, tmp)
        if args.ref_b != args.ref_a:
            paths[args.ref_b] = _worktree(args.ref_b, tmp)
        else:
            paths[args.ref_b] = paths[args.ref_a]

        samples: dict[str, list[dict]] = {args.ref_a: [], args.ref_b: []}
        for i in range(args.passes):
            # alternate order per pass: A B / B A / A B ...
            order = (args.ref_a, args.ref_b) if i % 2 == 0 else (
                args.ref_b,
                args.ref_a,
            )
            for ref in order:
                res = _run_once(paths[ref], args.sf_dir)
                samples[ref].append(res)
                rec = {
                    "metric": "bench_ab_sample",
                    "ref": ref,
                    "pass": i,
                    "headline_total": res.get("headline_total"),
                    "value_per_canary": res.get("value_per_canary"),
                    "queries": res.get("queries", {}),
                }
                print(json.dumps(rec, separators=(",", ":")))
                sys.stdout.flush()
                print(
                    f"# pass {i} {ref}: total={res.get('headline_total')}s "
                    f"per_canary={res.get('value_per_canary')}",
                    file=sys.stderr,
                )

        def med(ref: str, key: str) -> float | None:
            vals = [
                s[key] for s in samples[ref] if s.get(key) is not None
            ]
            return round(statistics.median(vals), 3) if vals else None

        qmed: dict[str, dict[str, float]] = {}
        for ref in (args.ref_a, args.ref_b):
            per_q: dict[str, list[float]] = {}
            for s in samples[ref]:
                for q, t in s.get("queries", {}).items():
                    per_q.setdefault(q, []).append(t)
            qmed[ref] = {
                q: round(statistics.median(ts), 3)
                for q, ts in per_q.items()
            }

        a_t, b_t = med(args.ref_a, "headline_total"), med(
            args.ref_b, "headline_total"
        )
        a_c, b_c = med(args.ref_a, "value_per_canary"), med(
            args.ref_b, "value_per_canary"
        )
        summary = {
            "metric": "bench_ab_summary",
            "ref_a": args.ref_a,
            "ref_b": args.ref_b,
            "passes": args.passes,
            "sf_dir": args.sf_dir,
            "median_total": {args.ref_a: a_t, args.ref_b: b_t},
            "median_per_canary": {args.ref_a: a_c, args.ref_b: b_c},
            "queries_median": qmed,
        }
        if a_t and b_t:
            summary["total_delta_pct"] = round(100.0 * (b_t - a_t) / a_t, 1)
        if a_c and b_c:
            summary["per_canary_delta_pct"] = round(
                100.0 * (b_c - a_c) / a_c, 1
            )
        print(json.dumps(summary, separators=(",", ":")))
        print("\n#  query                           A        B     delta",
              file=sys.stderr)
        for q in sorted(set(qmed[args.ref_a]) | set(qmed[args.ref_b])):
            a = qmed[args.ref_a].get(q)
            b = qmed[args.ref_b].get(q)
            d = (
                f"{100.0 * (b - a) / a:+6.1f}%"
                if a and b
                else "     ?"
            )
            print(f"#  {q:<30} {a!s:>6} {b!s:>8}   {d}", file=sys.stderr)
        print(
            f"#  TOTAL  A={a_t}s B={b_t}s  per-canary A={a_c} B={b_c}",
            file=sys.stderr,
        )
    finally:
        for ref, path in paths.items():
            _cleanup(ref, path)


if __name__ == "__main__":
    main()
