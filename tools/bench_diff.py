#!/usr/bin/env python3
"""Round-over-round bench adjudication in one command.

Usage: python3 tools/bench_diff.py BENCH_rA.json BENCH_rB.json [...]

Each input is a Bench JSON line ({"metric":"total","queries":{...},
"errors":[...], "host":{...}}); multiple B files are each compared
against the first argument (A = the older round). Emits the shape
analysis the verdict's perf section re-derived by hand every round:

- per-run totals, error lists, and recorded host steal/load;
- the common-query count and the A->B ratio distribution
  (median / p90 / worst) over queries slower than the noise floor;
- the mover list: queries above 1s (on either side) whose ratio
  moved beyond 1.5x in either direction, worst first;
- sums over the common tail, so surface growth (new queries) never
  masquerades as drift.

Queries below the noise floor (default 1.0s on BOTH sides) are
excluded from ratio statistics — sub-second entries are dominated by
per-query fixed costs and their ratios read as noise.
"""
import json
import re
import sys


def load(path):
    """Accept either a raw Bench JSON line (own runs) or the driver's
    BENCH_r{N}.json wrapper, whose `tail` keeps only the LAST ~2000
    chars of the bench output — a truncated per-query fragment. For a
    fragment, recover the visible "name":sec pairs (dropping the first,
    partial one) plus errors/host, and mark the row partial."""
    raw = open(path).read()
    try:
        j = json.loads(raw)
    except json.JSONDecodeError:
        for line in raw.splitlines():
            line = line.strip()
            if line.startswith('{"metric"'):
                return json.loads(line)
        raise SystemExit(f"{path}: no bench JSON line found")
    if "queries" in j:
        return j
    if j.get("parsed"):
        return j["parsed"]
    tail = j.get("tail", "")
    pairs = re.findall(r'"([A-Za-z0-9_]+)":(-?\d+\.\d+)', tail)
    host = re.search(r'"host":(\{[^}]*\})', tail)
    errs = re.search(r'"errors":(\[[^\]]*\])', tail)
    # the first pair is usually cut mid-name; non-query keys are
    # filtered by the qNN/tNN/... prefix convention
    qs = {k: float(v) for k, v in pairs[1:]
          if re.match(r"^(q|p|st|t|s|d|k|m|b)\d", k)}
    return {"queries": qs, "partial": True,
            "errors": json.loads(errs.group(1)) if errs else "n/a",
            "host": json.loads(host.group(1)) if host else {}}


# Quiet-host nominal for one ProbeLog calibration leg and the drift
# factor that flags contamination (mirrors ProbeLog.CalibNominalSec /
# CalibDriftFactor — the round-17 fix for the r16 blind spot: the
# driver's bench read 2-4.4x inflated at steal 0.47% because co-tenant
# load is invisible to the steal-only model).
CALIB_NOMINAL_SEC = 1.0
CALIB_DRIFT_FACTOR = 1.3


def calib_note(host):
    legs = [host[k] for k in ("calib_start_sec", "calib_end_sec")
            if isinstance(host.get(k), (int, float))]
    if not legs:
        return " [no calibration legs — pre-r17 row; contamination " \
            "adjudicates the narrative way]"
    ratio = max(legs) / min(legs) if min(legs) > 0 else 1.0
    if max(legs) > CALIB_NOMINAL_SEC * CALIB_DRIFT_FACTOR \
            or ratio > CALIB_DRIFT_FACTOR:
        return (f" [CALIBRATION DRIFTED: legs {legs} s vs "
                f"~{CALIB_NOMINAL_SEC}s quiet nominal — co-tenant "
                f"contention during this run; its tail is suspect]")
    return ""


def describe(path, j):
    qs = j.get("queries", {})
    ok = {k: v for k, v in qs.items() if v >= 0}
    host = j.get("host", {})
    frag = " [driver tail fragment — visible queries only]" \
        if j.get("partial") else ""
    print(f"{path}: {len(ok)} queries ok, total {sum(ok.values()):.1f} s, "
          f"errors={j.get('errors', [])}, "
          f"steal_pct={host.get('steal_pct', 'n/a')}, "
          f"load1={host.get('load1_start', 'n/a')}->"
          f"{host.get('load1', 'n/a')}, "
          f"calib={host.get('calib_start_sec', 'n/a')}->"
          f"{host.get('calib_end_sec', 'n/a')}"
          f"{calib_note(host)}{frag}")
    return ok


def pct(xs, p):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(p * len(xs)))]


def diff(a, b, floor=1.0):
    common = sorted(set(a) & set(b))
    print(f"\ncommon queries: {len(common)} "
          f"(A-only: {sorted(set(a) - set(b))or '-'}, "
          f"B-only: {sorted(set(b) - set(a)) or '-'})")
    tail = [q for q in common if a[q] >= floor or b[q] >= floor]
    print(f"tail (>= {floor}s on either side): {len(tail)} queries, "
          f"sum A {sum(a[q] for q in tail):.1f} s -> "
          f"B {sum(b[q] for q in tail):.1f} s")
    # both sides must be positive: a[q] = 0 divides by zero, and a
    # b[q] = 0 tail entry would yield ratio 0.0, pass the mover filter,
    # then crash math.log in the sort key
    ratios = {q: b[q] / a[q] for q in tail if a[q] > 0 and b[q] > 0}
    if not ratios:
        print("no tail queries to compare")
        return
    rs = list(ratios.values())
    print(f"ratio B/A over the tail: median {pct(rs, 0.5):.2f}, "
          f"p90 {pct(rs, 0.9):.2f}, worst {max(rs):.2f}")
    movers = sorted(
        ((q, r) for q, r in ratios.items() if r > 1.5 or r < 1 / 1.5),
        key=lambda t: -abs(__import__("math").log(t[1])))
    if movers:
        print("movers (>1.5x either direction, worst first):")
        for q, r in movers:
            print(f"  {q}: {a[q]:.2f} s -> {b[q]:.2f} s  ({r:.2f}x)")
    else:
        print("movers (>1.5x either direction): none")


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    base_path = sys.argv[1]
    base = describe(base_path, load(base_path))
    for p in sys.argv[2:]:
        cur = describe(p, load(p))
        print(f"\n=== {base_path} -> {p} ===")
        diff(base, cur)


if __name__ == "__main__":
    main()
