"""Paired A/B timing: alternate the SAME query between two checkouts
(two persistent warmed sessions), so host drift hits both sides.

    python tools/opt_paired.py --a /tmp/before_tree --b /root/repo \
        [--rounds 4] q1_pricing_summary ...

Prints per-query min/median per side and the per-round win record.
"""

from __future__ import annotations

import argparse
import os
import statistics
import subprocess
import sys


def start(tree: str) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, os.path.join(tree, "tools", "paired_server.py")],
        cwd=tree,
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        bufsize=1,
    )


def wait_ready(p: subprocess.Popen) -> None:
    for line in p.stdout:
        if line.strip() == "READY":
            return
    raise RuntimeError("server died before READY")


def ask(p: subprocess.Popen, name: str) -> float:
    p.stdin.write(name + "\n")
    p.stdin.flush()
    for line in p.stdout:
        parts = line.split()
        if parts and parts[0] == "TIME":
            return float(parts[2])
    raise RuntimeError(f"no TIME line for {name}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--a", required=True, help="baseline tree")
    ap.add_argument("--b", required=True, help="candidate tree")
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    pa, pb = start(args.a), start(args.b)
    wait_ready(pa)
    wait_ready(pb)
    try:
        for name in args.names:
            ta: list[float] = []
            tb: list[float] = []
            wins_b = 0
            for rnd in range(args.rounds):
                order = [("A", pa, ta), ("B", pb, tb)]
                if rnd % 2:
                    order.reverse()
                sample = {}
                for tag, proc, acc in order:
                    t = ask(proc, name)
                    acc.append(t)
                    sample[tag] = t
                if sample["B"] < sample["A"]:
                    wins_b += 1
            print(
                f"{name}: A min={min(ta):.3f} med={statistics.median(ta):.3f}"
                f" | B min={min(tb):.3f} med={statistics.median(tb):.3f}"
                f" | B wins {wins_b}/{args.rounds}"
                f" | ratio(minB/minA)={min(tb) / min(ta):.2f}",
                flush=True,
            )
    finally:
        for p in (pa, pb):
            try:
                p.stdin.write("QUIT\n")
                p.stdin.flush()
            except OSError:
                pass
            p.terminate()


if __name__ == "__main__":
    main()
