"""Robustness sweep: run every queries() entry against a zero-row
corpus (same schemas as testdata) and report crashes. Multimodal /
flagship-image queries synthesize their own floor-sized corpora, so
this primarily exercises the tabular operators' empty paths.

Usage: python tools/empty_sweep.py [empty_sf_dir]
"""
from __future__ import annotations

import sys
import time
import traceback


def main() -> int:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfempty"
    skip_prefixes = ("humid_", "multimodal_", "audio_", "video_",
                     "ann_", "knn_")  # synthesize own floor-size corpora
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__ as E

    n_bad = 0
    for name, fn in sorted(E.queries().items()):
        if name.startswith(skip_prefixes):
            continue
        t0 = time.perf_counter()
        try:
            res = fn(sf_dir)
            n = res.count() if hasattr(res, "count") and not hasattr(res, "num_rows") else getattr(res, "num_rows", len(res))
            status = f"ok rows={n}"
        except Exception as exc:  # noqa: BLE001
            status = f"CRASH {type(exc).__name__}: {exc}"
            traceback.print_exc(limit=3)
            n_bad += 1
        print(f"{name:36s} {time.perf_counter()-t0:5.1f}s  {status}",
              flush=True)
    print(f"done: {n_bad} crashes")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
