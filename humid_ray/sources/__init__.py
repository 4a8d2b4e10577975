"""Sources & sinks (SURVEY §2.1).

The reference zips k FastQ(.gz) streams into one record
(readFiles, reference src/fastq.cc:96-114); here one Lance/parquet row
already carries every "file's" payload as columns, so the reader is a
single columnar scan with projection pushdown. Output naming mirrors
makeFileName (reference src/fastq.cc:174-190).
"""

from __future__ import annotations

import os

import ray.data


def read_corpus(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Read an input corpus — Lance when the package is installed and
    the path is a .lance dataset, else a parquet file/dir (the
    documented dev fallback). ``columns`` prunes at the read."""
    try:  # pragma: no cover - lance is not installed in this sandbox
        import lance  # noqa: F401

        if path.endswith(".lance"):
            return ray.data.read_lance(path, columns=columns)
    except ImportError:
        pass
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        return ray.data.read_parquet(files, columns=columns)
    return ray.data.read_parquet(path, columns=columns)


def add_dir(filename: str, dirname: str) -> str:
    """reference addDir (src/fastq.cc:170-172)."""
    return f"{dirname}/{filename}"


def make_file_name(filename: str, dirname: str, suffix: str) -> str:
    """Insert ``_suffix`` before the first '.' of the basename and
    prefix the output dir (reference makeFileName src/fastq.cc:174-190).
    Used for per-partition output naming so a rerun can target the same
    layout."""
    name = os.path.basename(filename)
    pos = name.find(".")
    if pos == -1:
        stem, rest = name, ""
    else:
        stem, rest = name[:pos], name[pos:]
    return add_dir(f"{stem}_{suffix}{rest}", dirname)


def make_file_names(files: list[str], dirname: str, suffix: str) -> list[str]:
    return [make_file_name(f, dirname, suffix) for f in files]
