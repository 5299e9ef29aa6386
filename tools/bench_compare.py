#!/usr/bin/env python3
"""Anchor-normalized bench comparison (the mechanical regression call).

Usage: python3 tools/bench_compare.py <OLD> <NEW> [--threshold 0.25]

OLD/NEW are either driver artifacts (BENCH_r{N}.json: {"tail": "..."} with
the last 2000 chars of the bench line) or raw bench output files containing
the one-line JSON graft.Bench prints. Per-query times are extracted from
whatever fragment survives; queries present in only one side are skipped
(the driver's tail truncation drops the alphabetically-early queries of
older artifacts — compare what both sides actually carry).

The bench runs on a SHARED machine, so raw deltas lie: BENCH_r06 read
1.5-2x slower than BENCH_r05 on identical code purely from external load.
Bench.scala measures a fixed-shape ANCHOR query (code never changes round
to round) whose drift IS the machine drift. This tool normalizes:

    norm_new = new_sec / (anchor_new / anchor_old)

and calls a regression only when norm_new / old_sec - 1 > threshold AND
the absolute normalized delta exceeds 50 ms (micro-queries jitter in the
scheduler-noise floor). If either side lacks an anchor (pre-r9 artifacts
truncated it away), the ratio falls back to 1.0 and the output says so.
"""
import sys, json, re


def load_fragment(path: str) -> str:
    text = open(path).read()
    # driver artifact: JSON object with a "tail" fragment
    try:
        obj = json.loads(text)
        if isinstance(obj, dict) and "tail" in obj:
            return obj["tail"]
    except json.JSONDecodeError:
        pass
    return text


def parse(path: str):
    frag = load_fragment(path)
    queries = {k: float(v) for k, v in
               re.findall(r'"(q_[A-Za-z0-9_]+)":([0-9.eE+-]+)', frag)}
    m = re.search(r'"anchor_sec":([0-9.eE+-]+)', frag)
    anchor = float(m.group(1)) if m else None
    return queries, anchor


def main(argv):
    if len(argv) < 3:
        print(__doc__)
        return 2
    threshold = 0.25
    if "--threshold" in argv:
        i = argv.index("--threshold")
        threshold = float(argv[i + 1])
        del argv[i:i + 2]
    old_q, old_a = parse(argv[1])
    new_q, new_a = parse(argv[2])
    if old_a and new_a:
        ratio = new_a / old_a
        print(f"anchor: old={old_a:.3f}s new={new_a:.3f}s "
              f"machine ratio={ratio:.2f}x (normalizing by it)")
    else:
        ratio = 1.0
        print("anchor: missing on one side (pre-r9 artifact truncated it) — "
              "NO normalization; treat regression calls as provisional")
    common = sorted(set(old_q) & set(new_q))
    only_old = len(old_q) - len(common)
    only_new = len(new_q) - len(common)
    print(f"{len(common)} common queries ({only_old} only-old, "
          f"{only_new} only-new skipped)\n")
    rows = []
    for q in common:
        norm_new = new_q[q] / ratio
        delta = norm_new - old_q[q]
        rel = delta / old_q[q] if old_q[q] > 0 else 0.0
        rows.append((q, old_q[q], new_q[q], norm_new, delta, rel))
    rows.sort(key=lambda r: -r[5])
    print(f"{'query':40s} {'old_s':>8s} {'new_s':>8s} {'norm_s':>8s} "
          f"{'delta_s':>8s} {'rel':>7s}  verdict")
    n_reg = 0
    for q, o, n, nn, d, rel in rows:
        verdict = ""
        if rel > threshold and d > 0.05:
            verdict = "REGRESSION"
            n_reg += 1
        elif rel < -threshold and d < -0.05:
            verdict = "improved"
        print(f"{q:40s} {o:8.3f} {n:8.3f} {nn:8.3f} {d:+8.3f} {rel:+6.1%}  {verdict}")
    tot_o = sum(old_q[q] for q in common)
    tot_n = sum(new_q[q] / ratio for q in common)
    print(f"\ncommon-subset total: old={tot_o:.1f}s new(norm)={tot_n:.1f}s "
          f"({(tot_n / tot_o - 1):+.1%}); {n_reg} regression(s) past "
          f"{threshold:.0%}+50ms")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
