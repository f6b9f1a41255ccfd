#!/usr/bin/env python
"""Render BENCH_sf1.md from soak_sf01.json + soak_sf1.json (scripts/soak_sf1.py)."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    a = json.load(open(os.path.join(REPO, "soak_sf01.json")))
    b = json.load(open(os.path.join(REPO, "soak_sf1.json")))

    lines = [
        "# BENCH_sf1 — 10x scale soak (r4 verdict #1)",
        "",
        "Input: sf0.1 = driver `/root/testdata/sf0.1` (5,000 docs / 2,000",
        "embeddings); sf1 = `scripts/gen_sf.py` synthesis with the same",
        "marginals (50,000 docs / 20,000 embeddings, seed-fixed — vocab,",
        "10..100-word lengths, lang mix, src%20, 0.16% exact-dup-pair rate).",
        "Harness: `scripts/soak_sf1.py` — local[32], one fresh JVM per level,",
        "best-of-2 walls, bench.py methodology (`limit(10000).collect()`),",
        "900 s cancel watchdog. Extraction headline replicates docs x256",
        "pages (1.28M vs 12.8M).",
        "",
        "Growth grading: input grows 10x; healthy linear-ish = ~10x or below",
        "(fixed costs amortize); the verdict threshold is ~10x*log — worse",
        "than ~13x needs a plan fix or a documented cutover.",
        "",
        "| query | sf0.1 wall s | sf1 wall s | growth | verdict |",
        "|---|---|---|---|---|",
    ]
    keys = list(a.keys())
    flagged = []
    for k in keys:
        wa = a[k].get("wall")
        wb = b.get(k, {}).get("wall")
        if k == "extract_tf_full":
            ra = a[k]["docs_per_sec"]
            rb = b[k]["docs_per_sec"]
            lines.append(
                f"| {k} (docs/s) | {wa:.2f} ({ra:,.0f}/s) | "
                f"{wb:.2f} ({rb:,.0f}/s) | x{wb/wa:.2f} wall for x10 docs | "
                f"{'linear' if wb / wa < 13 else 'FLAG'} |"
            )
            continue
        if wb is None:
            lines.append(f"| {k} | {wa:.2f} | TIMEOUT>{b[k].get('timeout')}s"
                         f" | — | FLAG |")
            flagged.append(k)
            continue
        g = wb / wa
        verdict = "ok" if g < 13 else "FLAG"
        if verdict == "FLAG":
            flagged.append(k)
        lines.append(f"| {k} | {wa:.2f} | {wb:.2f} | x{g:.1f} | {verdict} |")
    lines.append("")
    out = "\n".join(lines) + "\n"
    sys.stdout.write(out)
    with open(os.path.join(REPO, "BENCH_sf1.md"), "w") as fh:
        fh.write(out)
    print("flagged:", flagged, file=sys.stderr)


if __name__ == "__main__":
    main()
