"""Collect runs_r5/ablate_zpde/*/summary.json into one table
(PARITY.md evidence for the zeta_pde ablation, VERDICT r4 item 3a)."""

from __future__ import annotations

import json
import sys
from pathlib import Path


def main():
    root = Path(sys.argv[1] if len(sys.argv) > 1 else "runs_r5/ablate_zpde")
    rows = []
    for p in sorted(root.glob("*/summary.json")):
        d = json.loads(p.read_text())
        rows.append((d.get("regime"), float(d.get("zeta_pde")),
                     d["ch_rel_error"][0], d["ch_rel_error"][1]))
    rows.sort()
    print(f"{'regime':8s} {'zeta_pde':>9s} {'rel_a':>9s} {'rel_u':>9s}")
    for reg, zp, ra, ru in rows:
        print(f"{reg:8s} {zp:9.4f} {ra:9.4f} {ru:9.4f}")
    out = root / "table.json"
    out.write_text(json.dumps(
        [{"regime": r, "zeta_pde": z, "rel_a": a, "rel_u": u}
         for r, z, a, u in rows], indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
