"""CLI mirroring the reference's flag surface (src/humid.cc:413-429).

    HUMID                      humid_ray
    humid -n 24 -m 1 ...  <->  python -m humid_ray.cli -n 64 -m 1 \
        file.fastq                 /path/to/corpus_parquet_dir

Flags keep the reference's single-letter names; semantics are the
image+caption analogs (word length in BITS, not nucleotides).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="humid_ray",
        description="Near-duplicate detection over image+caption corpora (Ray Data).",
    )
    p.add_argument("corpus", help="corpus parquet directory (input_hint schema)")
    p.add_argument("-n", type=int, default=64, metavar="BITS",
                   help="signature word length in bits (reference -n, default 64)")
    p.add_argument("-m", type=int, default=1, metavar="DIST",
                   help="allowed mismatches / Hamming bits (reference -m, default 1)")
    p.add_argument("-l", default=None, metavar="FILE",
                   help="log/metrics file (reference -l; default stderr)")
    p.add_argument("-d", default="/tmp/humid_ray_out", metavar="DIR",
                   help="output directory (reference -d)")
    p.add_argument("-s", action="store_true", help="calculate statistics (reference -s)")
    p.add_argument("-q", action="store_true", default=True,
                   help="write deduplicated output (reference -q, default on)")
    p.add_argument("--no-q", dest="q", action="store_false",
                   help="disable deduplicated output")
    p.add_argument("-a", action="store_true", help="write annotated output (reference -a)")
    p.add_argument("-e", action="store_true",
                   help="edit-distance mode: MinHash-Jaccard banded candidates "
                        "verified with TRUE Levenshtein <= m on captions "
                        "(reference -e)")
    p.add_argument("--verify", choices=["edit", "exact", "estimate"],
                   default="edit",
                   help="-e candidate verification: true edit distance "
                        "(default, reference parity), exact shingle Jaccard, "
                        "or estimated Jaccard")
    p.add_argument("-x", action="store_true",
                   help="maximum clustering method (reference -x)")
    p.add_argument("--recompute-phash", action="store_true",
                   help="decode payloads and recompute pHash (default: trust stored)")
    p.add_argument("--umi", action="store_true",
                   help="parse a hex UMI token off image_id (budget precedence)")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--stream", action="store_true",
                   help="skip phase checkpoints: phases 1-4 stay in the "
                        "object store (fastest one-shot run; not resumable)")
    p.add_argument("--async-checkpoints", action="store_true",
                   help="stream phases AND write their checkpoints in the "
                        "background (streaming speed, full resumability)")
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from humid_ray.config import HumidConfig
    from humid_ray.pipelines.humid import HumidPipeline

    cfg = HumidConfig(
        word_bits=args.n,
        max_distance=args.m,
        distance="minhash-jaccard" if args.e else "hamming",
        minhash_verify=args.verify,
        clustering="maximum" if args.x else "directional",
        write_filtered=args.q,
        write_annotated=args.a,
        write_stats=args.s,
        workdir=args.d,
        signature_source="recompute" if args.recompute_phash else "stored",
        umi_from_id=args.umi,
        resume=not args.no_resume,
        checkpoint_phases=("async" if args.async_checkpoints
                           else not args.stream),
    )
    res = HumidPipeline(cfg).run(args.corpus)
    log = open(args.l, "w") if args.l else sys.stderr
    json.dump(res.metrics, log, indent=1, default=str)
    log.write("\n")
    if args.l:
        log.close()
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
