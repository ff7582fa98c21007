"""Compare two bench.py JSON outputs at different scale factors and
flag super-linear queries.

Usage: python tools/compare_sf.py small.json big.json K
(K = data-volume ratio big/small, e.g. 10 for sf0.1 -> sf1).

Linear scaling predicts big ≈ K x small for data-bound queries; fixed
per-query overhead (plan, JVM, Python worker spin-up) makes most
CHEAPER than K x. A query slower than FLAG_FACTOR x its extrapolated
time is flagged — that's the VERDICT r4 #3 bar ("no query > 2x its
sf0.1-extrapolated time without a documented reason").
"""

from __future__ import annotations

import json
import sys

FLAG_FACTOR = 2.0


def main() -> int:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    k = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    sq, bq = small["queries"], big["queries"]
    flagged = []
    print(f"{'query':38s} {'small':>8s} {'big':>8s} {'ratio':>6s} {'vs K·t':>7s}")
    for name in bq:
        if name not in sq or sq[name] <= 0:
            continue
        ratio = bq[name] / sq[name]
        vs_lin = ratio / k
        mark = " <-- SUPER-LINEAR" if vs_lin > FLAG_FACTOR else ""
        print(f"{name:38s} {sq[name]:8.2f} {bq[name]:8.2f} {ratio:6.2f} {vs_lin:7.2f}{mark}")
        if vs_lin > FLAG_FACTOR:
            flagged.append((name, ratio))
    print(f"\ntotal: {small['value']:.1f}s -> {big['value']:.1f}s "
          f"({big['value']/small['value']:.2f}x at {k:.0f}x data); "
          f"{len(flagged)} flagged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
