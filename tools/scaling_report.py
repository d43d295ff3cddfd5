#!/usr/bin/env python3
"""Builder-side analysis for the measured-scaling harness: read the
per-scale Bench sweeps (target/scaling/logs/<label>.json, one JSON line
each, labels like x1-cold/x10-warm), emit a Markdown table of per-query
seconds with growth factors, and flag super-linear queries.

Flagging rule: a query is super-linear at step (a -> b) when its time
grows by more than slack x the data multiplier ratio AND the larger-scale
time is big enough that fixed per-query overhead (session/plan/codegen,
~0.1-0.3 s at local[32]) is not the explanation.
"""
import json, sys, os

LOGDIR = sys.argv[1] if len(sys.argv) > 1 else "target/scaling/logs"
MODE = sys.argv[2] if len(sys.argv) > 2 else "cold"
FLAGS_ONLY = len(sys.argv) > 3 and sys.argv[3] == "flags"
SLACK = 1.6          # allowed factor above proportional growth
MIN_BIG_SEC = 1.5    # ignore flags when the larger-scale time is tiny

def discover_labels(logdir, mode):
    """All xN labels present for this mode, ordered by N — the scaling
    ladder is whatever the log dir actually holds (x1/x10/x30 sweeps,
    plus e.g. an x100 heavy-family extension)."""
    labels = []
    for fn in os.listdir(logdir):
        if fn.endswith(f"-{mode}.json") and fn.startswith("x"):
            lab = fn[: -len(f"-{mode}.json")]
            try:
                labels.append((lab, int(lab[1:])))
            except ValueError:
                # a mis-named sweep must be VISIBLY excluded, not silently
                # dropped from the ladder (e.g. "x100-heavy" where the
                # harness expects the scale label to be x<int> exactly)
                print(f"WARNING: skipping {fn}: label {lab!r} is not x<int>",
                      file=sys.stderr)
    return sorted(labels, key=lambda lm: lm[1])

scales = []
for label, mult in discover_labels(LOGDIR, MODE):
    path = os.path.join(LOGDIR, f"{label}-{MODE}.json")
    if os.path.exists(path):
        with open(path) as f:
            line = f.read().strip()
            if line.startswith("[info]"):  # sbt log prefix
                line = line[len("[info]"):].strip()
            scales.append((label, mult, json.loads(line)))

if len(scales) < 2:
    sys.exit(f"need at least two sweeps in {LOGDIR} for mode {MODE}")

names = [n for n in scales[0][2]["queries"]]
rows = []
flags = []
for q in names:
    ts = [s[2]["queries"].get(q) for s in scales]
    row = {"q": q, "ts": ts, "flag": ""}
    for i in range(1, len(scales)):
        a, b = ts[i - 1], ts[i]
        if a is None or b is None or a < 0 or b < 0:
            continue
        ratio = scales[i][1] / scales[i - 1][1]
        grow = b / max(a, 1e-9)
        if grow > SLACK * ratio and b >= MIN_BIG_SEC:
            row["flag"] = f"SUPER-LINEAR {scales[i-1][0]}->{scales[i][0]} ({grow:.1f}x vs {ratio:.1f}x data)"
            flags.append((q, row["flag"], ts))
    rows.append(row)

if FLAGS_ONLY:
    for s in scales:
        print(f"- {s[0]} ({MODE}): total {s[2]['value']:.1f} s over "
              f"{len(s[2]['queries'])} queries")
    if flags:
        print(f"\nFLAGGED {len(flags)} super-linear queries:")
        for q, f_, ts in flags:
            tss = ", ".join("-" if t is None else f"{t:.2f}" for t in ts)
            print(f"- `{q}` [{tss}] — {f_}")
    else:
        print("\nNo super-linear queries flagged.")
    sys.exit(0)

hdr = " | ".join(s[0] for s in scales)
print(f"| query | {hdr} | growth | note |")
print("|---|" + "---|" * (len(scales) + 2))
for r in rows:
    ts = r["ts"]
    tstr = " | ".join("-" if t is None else f"{t:.2f}" for t in ts)
    growth = ""
    if ts[0] and ts[-1] and ts[0] > 0:
        growth = f"{ts[-1]/ts[0]:.1f}x/{scales[-1][1]//scales[0][1]}x"
    print(f"| {r['q']} | {tstr} | {growth} | {r['flag']} |")

print()
for s in scales:
    sets = s[2].get("sets", {})
    print(f"{s[0]} ({MODE}): total {s[2]['value']:.1f} s, sets " +
          ", ".join(f"{k}={v}" for k, v in sets.items()) +
          (f", failed {s[2]['failed']}" if s[2].get("failed") not in ("[]", None) else ""))
print()
if flags:
    print(f"FLAGGED {len(flags)} super-linear queries:")
    for q, f_, ts in flags:
        print(f"  {q}: {ts} -- {f_}")
else:
    print("No super-linear queries flagged.")
