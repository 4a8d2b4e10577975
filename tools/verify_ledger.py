"""Cross-round verification ledger.

Merges every committed ``CORRECTNESS_r*.json`` (the external driver's
hash-check of the first 50 ``queries()`` entries) with recorded local
sweep outputs (``tools/sweeps/*.json``, written by ``oracle_sweep.py
--record``) into one per-query last-verified table, and answers the
round-planning questions directly:

    python tools/verify_ledger.py            # full table + gap list
    python tools/verify_ledger.py --gaps     # only oracled queries with
                                             # no green row in any round
    python tools/verify_ledger.py --window 50 --pin humid_uniq ...
        # propose a driver window: pinned names first, then
        # never-driver-verified oracled queries, then least-recently-
        # driver-verified — the rotation policy VERDICT r4 task 1 asks
        # for, computed instead of hand-maintained.

Sweep records count as verification evidence in the table (column
``sweep``), but window construction ranks by DRIVER rounds only: the
point of the window is to earn driver-green rows, and a local sweep of
a query is not a reason to keep it out of the driver's sight.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SWEEP_DIR = os.path.join(ROOT, "tools", "sweeps")


def driver_green_rounds() -> dict[str, list[int]]:
    """query -> rounds where the external driver recorded a full match."""
    out: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            data = json.load(fh)
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            green = bool(rec.get("rows_match")) and bool(rec.get("schema_match"))
            # hash_match may be absent for rows-only (no-oracle) checks;
            # when present it must be true.
            if green and rec.get("hash_match") is not False:
                out.setdefault(name, []).append(rnd)
    return out


def sweep_green_rounds() -> dict[str, list[int]]:
    """query -> rounds with a recorded local oracle-sweep 'ok'."""
    out: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(SWEEP_DIR, "*.json"))):
        with open(path) as fh:
            rec = json.load(fh)
        rnd = int(rec.get("round", 0))
        for name, status in rec.get("results", {}).items():
            if status == "ok":
                out.setdefault(name, []).append(rnd)
    return out


def registry() -> tuple[list[str], set[str]]:
    """(all query names in insertion order, oracled subset)."""
    sys.path.insert(0, ROOT)
    import __ray_entry__ as E  # noqa: PLC0415

    qs = E.queries()
    return list(qs), set(E.oracle_sql())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaps", action="store_true",
                    help="print only oracled queries with no green row")
    ap.add_argument("--window", type=int, default=0, metavar="N",
                    help="propose a driver window of N names")
    ap.add_argument("--pin", nargs="*", default=[],
                    help="names forced to the front of the proposed window")
    args = ap.parse_args()

    names, oracled = registry()
    drv = driver_green_rounds()
    swp = sweep_green_rounds()

    def last(d: dict[str, list[int]], n: str) -> int:
        return max(d.get(n, [0]), default=0)

    if args.window:
        missing = [p for p in args.pin if p not in names]
        if missing:
            print(f"unknown --pin names: {missing}", file=sys.stderr)
            return 2
        pool = [n for n in names if n in oracled and n not in set(args.pin)]
        # never driver-verified first, then ascending last-driver-round,
        # ties broken by registry order (stable sort).
        pool.sort(key=lambda n: (last(drv, n),))
        window = list(args.pin) + pool[: args.window - len(args.pin)]
        for n in window:
            print(n)
        return 0

    rows = []
    for n in names:
        rows.append((n, "yes" if n in oracled else "no",
                     last(drv, n) or "-", last(swp, n) or "-"))
    gaps = [n for n in names
            if n in oracled and not drv.get(n) and not swp.get(n)]
    if args.gaps:
        for n in gaps:
            print(n)
        print(f"# {len(gaps)} oracled queries with no green row "
              f"(of {len(oracled)} oracled / {len(names)} total)",
              file=sys.stderr)
        return 0

    w = max(len(n) for n in names) + 1
    print(f"{'query':{w}} oracled driver sweep")
    for n, o, d, s in rows:
        print(f"{n:{w}} {o:7} {d!s:6} {s!s:5}")
    print(f"\n{len(oracled)} oracled / {len(names)} total; "
          f"{len(gaps)} oracled with no green row anywhere:")
    for n in gaps:
        print(f"  {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
