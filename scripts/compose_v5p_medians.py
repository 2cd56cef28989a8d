#!/usr/bin/env python3
"""Synthesize the v5p repeat-pair medians table (north-rule phases at 3M).

Reads BENCH/PAIR_v5p_3M_r{1,2,3}_{N,4N}.tsv (graft.Scaling --child
format: name, sec, work, unit, cpu-sec, gc-sec, shuffle-MB) and emits a
markdown table of per-phase per-repeat efficiencies plus the median —
the round-5 variance record (BENCH/BASELINE.md) shows per-child service
swinging up to 4x on this host, so the scaling claim at the asymptote
size rests on medians across pairs, with cpu-sec flatness as the
validity filter.
"""
import statistics
import sys


def read(path):
    rows = {}
    with open(path) as f:
        for line in f:
            name, sec, work, unit, cpu, gc, shuf = line.rstrip("\n").split("\t")
            rows[name] = (float(sec), int(work), unit, float(cpu),
                          float(gc), float(shuf))
    return rows


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "BENCH/PAIR_v5p_3M"
    reps = []
    for i in (1, 2, 3, 4, 5, 6):
        try:
            reps.append((read(f"{base}_r{i}_N.tsv"), read(f"{base}_r{i}_4N.tsv")))
        except FileNotFoundError:
            pass
    if not reps:
        sys.exit("no repeat TSVs found")
    phases = list(reps[0][0].keys())
    print(f"repeats found: {len(reps)}\n")
    hdr = ["phase"] + [f"r{i+1} eff" for i in range(len(reps))] + [
        "median eff", "median N s", "median 4N s", "median thr 4N",
        "cpu-sec N→4N (medians)", "shuffle MB (must be level-equal)"]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for ph in phases:
        effs, tn, t4, thr4, cpun, cpu4, shn, sh4 = [], [], [], [], [], [], [], []
        unit = reps[0][0][ph][2]
        for rn, r4 in reps:
            a, b = rn[ph], r4[ph]
            effs.append((a[0] / b[0]) / 4.0)
            tn.append(a[0]); t4.append(b[0])
            thr4.append(b[1] / b[0])
            cpun.append(a[3]); cpu4.append(b[3])
            shn.append(a[5]); sh4.append(b[5])
        med = statistics.median
        cells = [ph] + [f"{e:.3f}" for e in effs] + [
            f"**{med(effs):.3f}**", f"{med(tn):.1f}", f"{med(t4):.1f}",
            f"{med(thr4):,.0f} {unit}/s",
            f"{med(cpun):.0f} → {med(cpu4):.0f}",
            f"{med(shn):.0f} → {med(sh4):.0f}"]
        print("| " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
