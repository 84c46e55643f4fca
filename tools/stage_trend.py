#!/usr/bin/env python3
"""Round-over-round bench trend from two BENCH_DETAIL.json artifacts.

Compares per-query wall times AND the per-stage analyzer aggregates
(shuffle bytes, spill, task skew) between two full-suite bench runs.
Time drift is noisy (GC, neighborhood effects — see the r03
q_dedup_prefix incident); SHUFFLE-BYTE growth is the durable signal of
a plan regression (a new exchange, a lost broadcast, a wider payload),
so the report separates the two.

Usage: stage_trend.py <old BENCH_DETAIL.json> <new BENCH_DETAIL.json>
Exit 1 if any query's shuffle bytes grew >1.5x (plan regression).
"""
import sys, json


def stage_agg(stages):
    """Aggregate one query's stage list into durable per-query totals."""
    return {
        "n_stages": len(stages),
        "sh_bytes": sum(s.get("sh_write", 0) + s.get("sh_read", 0)
                        for s in stages),
        "spill": sum(s.get("spill", 0) for s in stages),
        "max_skew": max((s["task_max"] / s["task_med"]
                         for s in stages
                         if s.get("task_med", 0) > 0.05), default=1.0),
    }


def main(old_path, new_path):
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old.get("queries", {}), new.get("queries", {})
    os_, ns_ = old.get("stages", {}), new.get("stages", {})
    shared = sorted(set(oq) & set(nq))
    print(f"shared queries: {len(shared)}  "
          f"added: {sorted(set(nq) - set(oq))}  "
          f"removed: {sorted(set(oq) - set(nq))}")

    # ambient-load annotation (r11): the fixed-work spin probe moves
    # 1:1 with co-tenant CPU pressure, so the spin ratio is the
    # measured host-noise factor behind any uniform wall-time shift —
    # cite it before reading per-query drift as regression.
    oh, nh = old.get("host", {}), new.get("host", {})
    if oh and nh:
        o_spin = (oh.get("spin_s_start", 0) + oh.get("spin_s_end", 0)) / 2
        n_spin = (nh.get("spin_s_start", 0) + nh.get("spin_s_end", 0)) / 2
        if o_spin > 0 and n_spin > 0:
            ratio = n_spin / o_spin
            ot = sum(v for v in oq.values() if v > 0)
            nt = sum(v for v in nq.values() if v > 0)
            # ot == 0 (all-error or empty old run) has no meaningful
            # suite-total ratio — print the load line without it
            if ot > 0:
                print(f"host load: spin probe {o_spin:.3f}s -> {n_spin:.3f}s "
                      f"(x{ratio:.2f}); loadavg "
                      f"{oh.get('loadavg_start')} -> "
                      f"{nh.get('loadavg_start')}; "
                      f"suite total {ot:.1f}s -> {nt:.1f}s "
                      f"(x{nt / ot:.2f} raw, x{nt / ot / ratio:.2f} "
                      f"load-normalized)")
            else:
                print(f"host load: spin probe {o_spin:.3f}s -> {n_spin:.3f}s "
                      f"(x{ratio:.2f}); loadavg "
                      f"{oh.get('loadavg_start')} -> "
                      f"{nh.get('loadavg_start')}; "
                      f"old-run positive total is 0 — no suite ratio")
    elif nh:
        print(f"host load (new run only): spin "
              f"{nh.get('spin_s_start')}s/{nh.get('spin_s_end')}s, "
              f"loadavg {nh.get('loadavg_start')} -> "
              f"{nh.get('loadavg_end')}")

    regressions = []
    for q in shared:
        if q in os_ and q in ns_:
            a, b = stage_agg(os_[q]), stage_agg(ns_[q])
            if a["sh_bytes"] > 4096 and b["sh_bytes"] > 1.5 * a["sh_bytes"]:
                regressions.append(
                    (q, f"shuffle bytes {a['sh_bytes']} -> {b['sh_bytes']}"))
            if b["spill"] > 0 and b["spill"] > 2 * max(a["spill"], 1):
                regressions.append((q, f"spill {a['spill']} -> {b['spill']}"))
            if b["n_stages"] > a["n_stages"]:
                regressions.append(
                    (q, f"stage count {a['n_stages']} -> {b['n_stages']}"))
    if regressions:
        print("\nPLAN-LEVEL REGRESSIONS (durable signals):")
        for q, why in regressions:
            print(f"  {q}: {why}")

    drifts = [(q, oq[q], nq[q]) for q in shared
              if oq[q] > 0.2 and nq[q] > 1.5 * oq[q]]
    if drifts:
        print("\ntime drift >1.5x (noisy — confirm with an isolated re-run):")
        for q, a, b in sorted(drifts, key=lambda x: -x[2] / x[1]):
            print(f"  {q}: {a:.2f}s -> {b:.2f}s")

    # critical-path movement (CriticalPathAnalyzer parity): separates
    # "more rounds" (chain grew, per-stage walls flat) from "slower
    # rounds" (chain flat, critical seconds grew) for the iterative
    # family — wall-clock drift alone cannot tell these apart.
    ocp, ncp = old.get("critical_path", {}), new.get("critical_path", {})
    moved = []
    for q in shared:
        if q in ocp and q in ncp:
            a, b = ocp[q], ncp[q]
            chain_grew = b.get("chain", 0) > a.get("chain", 0)
            sec_grew = a.get("s", 0) > 0.2 and b.get("s", 0) > 1.5 * a["s"]
            if chain_grew or sec_grew:
                moved.append((q, a, b))
    if moved:
        print("\ncritical-path movement (chain = stages on the longest "
              "dependency chain):")
        for q, a, b in moved:
            print(f"  {q}: chain {a.get('chain')} -> {b.get('chain')}, "
                  f"critical {a.get('s', 0):.2f}s -> {b.get('s', 0):.2f}s, "
                  f"jobs {a.get('jobs')} -> {b.get('jobs')}")

    improved = [(q, oq[q], nq[q]) for q in shared
                if oq[q] > 0.5 and nq[q] < oq[q] / 1.5]
    if improved:
        print("\nimproved >1.5x:")
        for q, a, b in sorted(improved, key=lambda x: -x[1] / x[2]):
            print(f"  {q}: {a:.2f}s -> {b:.2f}s")

    shuffle_regressed = [r for r in regressions if "shuffle" in r[1]]
    return 1 if shuffle_regressed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
