"""Join a jax.profiler device trace with the compiled HLO's source
metadata to attribute per-op time to source files/lines.

Usage:
    python scripts/trace_bench.py          # writes /tmp/splatfields_trace
    python scripts/dump_step_hlo.py        # writes /tmp/step_hlo.txt
    python scripts/trace_attrib.py [n_steps]

Groups device-op durations by the HLO metadata's source_file:line (the
op_name hierarchy tail when no source is recorded).
"""
import collections
import glob
import gzip
import json
import re
import sys

args = [a for a in sys.argv[1:] if not a.startswith("--")]
VARIANT = ""
for a in sys.argv[1:]:
    if a.startswith("--variant="):
        VARIANT = "_" + a.split("=", 1)[1]
N_STEPS = int(args[0]) if args else 3

hlo = open(f"/tmp/step_hlo{VARIANT}.txt").read()
meta = {}
pat = re.compile(
    r"%([\w.\-]+) = .*?metadata=\{([^}]*)\}", re.S)
for m in re.finditer(r"^\s*%([\w.\-]+) = [^\n]*", hlo, re.M):
    line = m.group(0)
    name = m.group(1)
    sf = re.search(r'source_file="([^"]+)" source_line=(\d+)', line)
    op = re.search(r'op_name="([^"]+)"', line)
    if sf:
        meta[name] = f"{sf.group(1).split('/')[-1]}:{sf.group(2)}"
    elif op:
        tail = op.group(1).split("/")[-1]
        meta[name] = f"[{tail}]"

trace = sorted(glob.glob(
    f"/tmp/splatfields_trace{VARIANT}/plugins/profile/*/vm.trace.json.gz"))[-1]
with gzip.open(trace) as f:
    data = json.load(f)
ev = [e for e in data["traceEvents"]
      if e.get("ph") == "X" and e.get("pid") == 3]

by_src = collections.Counter()
by_op = collections.Counter()
unattributed = collections.Counter()
total = 0
for e in ev:
    n = e.get("name", "?")
    if n in ("1", "3", "5") or n.startswith("jit_step"):
        continue
    d = e.get("dur", 0)
    total += d
    by_op[n] += d
    if n in meta:
        by_src[meta[n]] += d
    else:
        unattributed[n] += d

print(f"device total {total / N_STEPS / 1e3:.2f} ms/step "
      f"({len(by_op)} distinct ops)\n")
print("== by source location ==")
for src, d in by_src.most_common(40):
    print(f"{d / N_STEPS / 1e3:8.3f} ms/step  {src}")
print("\n== unattributed (no metadata match) ==")
for n, d in unattributed.most_common(12):
    print(f"{d / N_STEPS / 1e3:8.3f} ms/step  {n}")
