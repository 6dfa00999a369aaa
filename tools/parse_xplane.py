"""Parse a jax.profiler xplane.pb trace into a per-op time table.

Round-5: the cost-analysis roofline (profile_sampler.py) says WHAT the
program costs; this says WHERE the wall time goes (GroupNorm vs conv vs
pad vs fusion), which drives the Pallas-kernel decisions (VERDICT r4
item 5). Uses the installed xprof/tensorboard-plugin-profile converter.

    python tools/parse_xplane.py logs/profile_r5
"""

from __future__ import annotations

import sys
from pathlib import Path


def main():
    root = Path(sys.argv[1])
    pbs = sorted(root.rglob("*.xplane.pb"))
    if not pbs:
        sys.exit(f"no xplane.pb under {root}")
    pb = pbs[-1]
    print(f"parsing {pb}", file=sys.stderr)
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([str(pb)], "framework_op_stats", {})
    import csv
    import io

    if isinstance(data, bytes):
        data = data.decode()
    rows = list(csv.DictReader(io.StringIO(data)))
    if not rows:
        sys.exit("no op rows parsed")
    # columns vary by version; find the self-time and name keys
    keys = rows[0].keys()
    tkey = next(k for k in keys if "self" in k.lower()
                and "time" in k.lower() and "%" not in k)
    nkey = next(k for k in keys if k.lower() in ("operation", "op name",
                                                 "op_name", "name"))
    ckey = next((k for k in keys if "category" in k.lower()), None)
    agg: dict[str, float] = {}
    for r in rows:
        cat = r.get(ckey, "?") if ckey else "?"
        try:
            t = float(r[tkey])
        except ValueError:
            continue
        agg[cat] = agg.get(cat, 0.0) + t
    tot = sum(agg.values()) or 1.0
    print("== self-time by category ==")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"{k:40s} {v:12.1f}  {100 * v / tot:5.1f}%")
    print("\n== top 25 ops by self time ==")
    byop: dict[str, float] = {}
    for r in rows:
        try:
            byop[r[nkey]] = byop.get(r[nkey], 0.0) + float(r[tkey])
        except ValueError:
            continue
    for k, v in sorted(byop.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{v:12.1f} {100 * v / tot:5.1f}%  {k[:90]}")


if __name__ == "__main__":
    main()
