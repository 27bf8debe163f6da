#!/usr/bin/env python3
"""Compare two bench_round.json artifacts with the floor protocol.

Usage: python3 tools/bench_diff.py <old.json> <new.json> [ratio]

Applies the BASELINE.md adjudication rules so cross-round comparison
stops being hand work:
  - compares per-query MIN-of-reps (queries_min) — medians absorb
    transient load; min is the load-free estimate (round-6 protocol);
  - annotates both runs' floors: ratios between runs whose floors
    differ by >1.5x are flagged as floor-band-incomparable rather
    than reported as regressions;
  - lists queries over the ratio threshold (default 1.5), new
    queries, and removed queries separately.

Dev tool only — NOT part of the shipped library.
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    mins = d.get("queries_min") or d.get("queries")
    return d, mins


def main(old_path, new_path, ratio=1.5):
    od, om = load(old_path)
    nd, nm = load(new_path)
    of, nf = od.get("floor"), nd.get("floor")
    print(f"old: {len(om)} queries, total {od.get('value', 0):.1f}s, "
          f"floor {of:.3f}" if of is not None else "old: no floor")
    print(f"new: {len(nm)} queries, total {nd.get('value', 0):.1f}s, "
          f"floor {nf:.3f}" if nf is not None else "new: no floor")
    comparable = True
    if of and nf and max(of, nf) / min(of, nf) > 1.5:
        comparable = False
        print(f"FLOOR BAND MISMATCH ({of:.3f} vs {nf:.3f}): per-query "
              "ratios below are box conditions, not code — re-record on "
              "a comparable box before logging regressions")
    # CPU yardstick (round 12): floors measure scheduling latency and
    # miss a uniformly slower box; when both artifacts carry cpu_ref,
    # normalize per-query ratios by the box-speed ratio before gating.
    oc, nc = od.get("cpu_ref"), nd.get("cpu_ref")
    box = 1.0
    if oc and nc:
        box = nc / oc
        print(f"cpu_ref: {oc:.3f}s -> {nc:.3f}s (box speed ratio "
              f"{box:.2f}x) — per-query ratios below are cpu_ref-"
              "normalized")
    # Mid-run drift (ADVICE r12): a single pre-run cpu_ref mislabels a
    # box that slows down DURING the run; when an artifact carries the
    # post-run sample too, surface the drift so the normalization is
    # read with the right suspicion.
    for label, d in (("old", od), ("new", nd)):
        pre, post = d.get("cpu_ref"), d.get("cpu_ref_post")
        if pre and post and max(pre, post) / min(pre, post) > 1.3:
            print(f"CPU DRIFT in {label} run: cpu_ref {pre:.3f}s pre -> "
                  f"{post:.3f}s post ({post / pre:.2f}x) — the box changed "
                  "speed MID-RUN; cpu_ref normalization above is "
                  "unreliable for that artifact")
    shared = sorted(set(om) & set(nm))
    regressions = []
    for q in shared:
        if om[q] > 0 and (nm[q] / om[q]) / box > ratio:
            regressions.append(((nm[q] / om[q]) / box, q, om[q], nm[q]))
    for r, q, a, b in sorted(regressions, reverse=True):
        flag = "" if comparable else "  [floor-incomparable]"
        print(f"  {r:5.2f}x  {q}: {a:.3f}s -> {b:.3f}s{flag}")
    if not regressions:
        print(f"no shared query exceeds {ratio}x on min-of-reps")
    added = sorted(set(nm) - set(om))
    removed = sorted(set(om) - set(nm))
    if added:
        print(f"new queries ({len(added)}): " + ", ".join(added))
    if removed:
        print(f"REMOVED queries ({len(removed)}): " + ", ".join(removed))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 1.5)
