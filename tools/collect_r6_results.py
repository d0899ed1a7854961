#!/usr/bin/env python
"""Summarize the r6 evidence batch (results/logs/r6_full) into one table.

Pulls the final JSON headline (bench runs), PSNR lines (check_psnr runs),
and the decomposition lines (trunk_epilogue / conv_vjp_micro) from each
log. Prints markdown ready for docs/PERF.md.
"""

import glob
import json
import os
import re
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "results/logs/r6_full"

rows = []
for path in sorted(glob.glob(os.path.join(OUT, "*.log"))):
    name = os.path.basename(path)[:-4]
    try:
        with open(path, errors="replace") as f:
            text = f.read()
    except OSError:
        continue
    last_json = None
    for ln in text.splitlines():
        ln = ln.strip()
        if ln.startswith("{") and '"metric"' in ln:
            try:
                last_json = json.loads(ln)
            except json.JSONDecodeError:
                pass
    if last_json:
        extra = ""
        if "ms_per_batch" in last_json:
            extra = f" curve={last_json['ms_per_batch']}"
        rows.append((name, f"{last_json['metric']} = {last_json['value']} "
                           f"{last_json['unit']}"
                           f" (vs_baseline {last_json.get('vs_baseline')})"
                     + extra))
        continue
    psnr = re.findall(r"^(.*PSNR.*)$", text, re.M)
    if psnr:
        rows.append((name, " | ".join(p.strip() for p in psnr[-4:])))
        continue
    tax = re.findall(r"^(\w[\w ]*(?:tax|epilogue)\s*:.*)$", text, re.M)
    eff = re.findall(r"^(.*TFLOP/s.*)$", text, re.M)
    ms = re.findall(r"^(train step .*)$", text, re.M)
    picked = tax or eff or ms
    if picked:
        rows.append((name, " | ".join(p.strip() for p in picked)))
        continue
    tail = [ln for ln in text.strip().splitlines() if ln.strip()][-1:]
    rows.append((name, tail[0].strip()[:160] if tail else "(empty)"))

w = max((len(n) for n, _ in rows), default=10)
print(f"| {'log':{w}} | result |")
print(f"|{'-' * (w + 2)}|---|")
for n, r in rows:
    print(f"| {n:{w}} | {r} |")
