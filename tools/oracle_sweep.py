"""Driver-style correctness sweep: run every oracled query in
__ray_entry__.queries() against its oracle_sql() in DuckDB at the given
sf dir and compare rows / schema / values (columns sorted by name, rows
sorted by all columns — the driver's compare order).

Usage: python tools/oracle_sweep.py [--record ROUND] [sf_dir] [query ...]

With --record N the full per-query result map is written to
tools/sweeps/rN_<timestamp>.json, where verify_ledger.py picks it up
as verification evidence for the cross-round ledger.

CAVEAT: corpus-backed queries (humid_*, image/audio/video/multimodal)
register oracles against the synthetic sf0.01 corpus glob — the scale
the driver compares at. Sweeping them at any other sf_dir reports row
mismatches BY DESIGN; only the tabular queries are scale-portable.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if sorted(a.columns) != sorted(b.columns):
        return f"schema: {sorted(a.columns)} vs {sorted(b.columns)}"
    if len(a) != len(b):
        return f"rows: {len(a)} vs {len(b)}"
    a, b = canon(a), canon(b)
    for c in a.columns:
        x, y = a[c], b[c]
        if x.dtype.kind == "f" or y.dtype.kind == "f":
            xv = x.astype(float).to_numpy()
            yv = y.astype(float).to_numpy()
            if not np.array_equal(xv, yv, equal_nan=True):
                bad = np.flatnonzero(~((xv == yv) | (np.isnan(xv) & np.isnan(yv))))
                return (f"values[{c}]: {len(bad)} diffs, first at {bad[0]}: "
                        f"{xv[bad[0]]!r} vs {yv[bad[0]]!r}")
        else:
            try:
                eq = x.reset_index(drop=True).equals(y.reset_index(drop=True))
            except Exception:
                eq = list(x) == list(y)
            if not eq:
                xs, ys = list(x), list(y)
                for i, (u, v) in enumerate(zip(xs, ys)):
                    if u != v and not (pd.isna(u) and pd.isna(v)):
                        return f"values[{c}]: first diff at {i}: {u!r} vs {v!r}"
                return f"values[{c}]: differ"
    return None


def main() -> int:
    import ray

    argv = sys.argv[1:]
    record_round = None
    if argv and argv[0] == "--record":
        record_round = int(argv[1])
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False)
    import __ray_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    results, n_bad = {}, 0
    for name in sorted(qs):
        if only and name not in only:
            continue
        if name not in osql:
            results[name] = "no_oracle"
            continue
        t0 = time.perf_counter()
        try:
            mine = to_pandas(qs[name](sf_dir))
            oracle = con.execute(osql[name]).df()
            err = compare(mine, oracle)
        except Exception as exc:  # noqa: BLE001
            err = f"EXC {type(exc).__name__}: {exc}"
        dt = time.perf_counter() - t0
        results[name] = err or "ok"
        flag = "OK " if err is None else "BAD"
        if err is not None:
            n_bad += 1
        print(f"{flag} {name:36s} {dt:6.1f}s  {err or ''}", flush=True)
    print(json.dumps({k: v for k, v in results.items() if v not in ("ok",)},
                     indent=1))
    print(f"done: {n_bad} bad")
    if record_round is not None:
        sweep_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "sweeps")
        os.makedirs(sweep_dir, exist_ok=True)
        path = os.path.join(
            sweep_dir, f"r{record_round}_{int(time.time())}.json")
        with open(path, "w") as fh:
            json.dump({"round": record_round, "sf_dir": sf_dir,
                       "results": results}, fh, indent=1)
        print(f"recorded -> {path}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
