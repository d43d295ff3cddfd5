#!/usr/bin/env python3
"""Render the SCALING.md §4 tables from a final sweep log dir: per-set
cold/warm matrix across scales, the heaviest per-query rows, and the
flag lists for both modes."""
import json, os, sys

LOGDIR = sys.argv[1] if len(sys.argv) > 1 else "target/scaling/logs-final"

def discover_labels(logdir):
    """All xN labels with a cold log, ordered by N."""
    labels = []
    for fn in os.listdir(logdir):
        if fn.endswith("-cold.json") and fn.startswith("x"):
            lab = fn[: -len("-cold.json")]
            try:
                labels.append((lab, int(lab[1:])))
            except ValueError:
                pass
    return [l for l, _ in sorted(labels, key=lambda lm: lm[1])]

runs = {}
labels = discover_labels(LOGDIR)
mult = {l: int(l[1:]) for l in labels}
for label in labels:
    for mode in ("cold", "warm"):
        p = os.path.join(LOGDIR, f"{label}-{mode}.json")
        if os.path.exists(p):
            runs[(label, mode)] = json.load(open(p))

print("### Per-set seconds (cold = fresh index store, pays training; "
      "warm = steady state)\n")
hdr = "| set | " + " | ".join(
    f"{l} cold | {l} warm" for l in labels) + \
    f" | cold growth {labels[0]}→{labels[-1]} |"
print(hdr)
print("|---|" + "---|" * (2 * len(labels) + 1))
sets = [k for k, v in runs[(labels[0], "cold")]["sets"].items()]
for st in sets:
    cells = []
    for l in labels:
        for m in ("cold", "warm"):
            v = runs.get((l, m), {}).get("sets", {}).get(st)
            cells.append("-" if v is None else f"{v:.1f}")
    g = ""
    a = runs[(labels[0], "cold")]["sets"].get(st, 0)
    b = runs[(labels[-1], "cold")]["sets"].get(st, 0)
    if a and b:
        g = f"{b/a:.1f}×"
    print(f"| {st} | " + " | ".join(cells) + f" | {g} |")
tot = "| **total** | " + " | ".join(
    f"{runs.get((l, m), {}).get('value', 0):.0f}"
    for l in labels for m in ("cold", "warm")) + " | " + \
    f"{runs[(labels[-1], 'cold')]['value']/runs[(labels[0], 'cold')]['value']:.1f}× |"
print(tot)

lo, hi = labels[0], labels[-1]
print(f"\n### Heaviest queries at {hi} (cold)\n")
q30 = runs[(hi, "cold")]["queries"]
q1 = runs[(lo, "cold")]["queries"]
qw = runs.get((hi, "warm"), {}).get("queries", {})
print(f"| query | {lo} cold | {hi} cold | {hi} warm | "
      f"cold growth ({mult[hi] // mult[lo]}× data) |")
print("|---|---|---|---|---|")
for k, v in sorted(q30.items(), key=lambda kv: -kv[1])[:15]:
    a = q1.get(k, 0)
    g = f"{v/a:.1f}×" if a > 0.05 else "—"
    w = qw.get(k)
    print(f"| {k} | {a:.2f} | {v:.2f} | "
          f"{'-' if w is None else f'{w:.2f}'} | {g} |")

for mode in ("cold", "warm"):
    flags = []
    for i in range(1, len(labels)):
        a, am = labels[i - 1], labels[i]
        ra = runs.get((a, mode)), runs.get((am, mode))
        if not (ra[0] and ra[1]):
            continue
        ratio = mult[am] / mult[a]
        for k, v in ra[1]["queries"].items():
            u = ra[0]["queries"].get(k)
            if u and u > 0 and v >= 1.5 and v / u > 1.6 * ratio:
                flags.append(f"{k} {a}→{am}: {u:.2f}→{v:.2f} "
                             f"({v/u:.1f}× on {ratio:.1f}× data)")
    print(f"\n### {mode} flags (>1.6× the data ratio, t≥1.5 s)\n")
    if flags:
        for f in flags:
            print(f"- {f}")
    else:
        print("none")
