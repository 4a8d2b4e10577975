"""Pipeline configuration.

Mirrors HUMID's CLI surface (reference: src/humid.cc:413-429) as a
dataclass, translated to the image+caption signature domain:

    HUMID flag            here
    -n word length 24     word_bits (total signature bit budget, <=64)
    -m mismatches 1       max_distance (Hamming bits)
    -e edit distance      distance = "hamming" | "minhash-jaccard"
    -x maximum cluster    clustering = "directional" | "maximum"
    -q write dedup        write_filtered
    -a write annotated    write_annotated
    -s statistics         write_stats
    -d output dir         workdir
    multi-file word       sources = ("phash", "simhash") with the bit
                          budget split like ntFromFile
                          (reference: src/fastq.cc:220-230)
    header UMI            umi_from_id (hex token parsed off image_id,
                          takes budget precedence like
                          preCompute, reference: src/humid.cc:38-59)
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


SOURCES = ("phash", "simhash")


def bits_from_source(n_sources: int, total_bits: int) -> list[int]:
    """Split a signature bit budget across sources; remainder goes to
    the LAST source (reference: ntFromFile, src/fastq.cc:220-230)."""
    if n_sources <= 0:
        raise ValueError("need at least one source")
    div = total_bits // n_sources
    out = [div] * (n_sources - 1)
    out.append(div + total_bits % n_sources)
    return out


@dataclass(frozen=True)
class HumidConfig:
    # signature assembly
    word_bits: int = 64              # total signature budget (<= 64)
    sources: tuple[str, ...] = SOURCES
    umi_from_id: bool = False        # parse a hex UMI token off image_id
    signature_source: str = "stored"  # "stored" (trust phash col) | "recompute"
    # stored mode: sniff payload magic bytes as an extra validity gate.
    # Off by default — the fast path then scans ONLY
    # (image_id, caption, phash) and never moves the payload column
    # (the 100 TB column); rows with a NULL stored phash are filtered.
    validate_payload: bool = False
    shingle_k: int = 2               # caption shingle size (tokens)

    # neighbor search
    max_distance: int = 1            # HUMID -m
    distance: str = "hamming"        # "hamming" | "minhash-jaccard" (HUMID -e analog)
    n_bands: int | None = None       # default max_distance + 1 (pigeonhole)
    hot_band_threshold: int = 65536  # band groups above this get salted sub-bands
    max_group_bruteforce: int = 8192  # pairwise-verify group cap before recursion
    minhash_perms: int = 128         # for distance="minhash-jaccard"
    minhash_bands: int = 16
    jaccard_threshold: float = 0.8
    # "exact": candidates from banding, verified by EXACT shingle-set
    # Jaccard (the shingle sets ride along with the band rows) — an
    # estimated-only pass admits pairs whose minhashes collide by
    # chance; this mirrors how the reference's -e verifies real edit
    # distance in the trie walk (src/humid.cc:140-158), not a sketch.
    # "edit": candidates from banding, verified by TRUE Levenshtein
    # distance <= max_distance on the representative captions (banded
    # DP, exact) — full -e parity for the variable-length payload.
    # Recall: pairs where BOTH captions are short (<= edit_short_tokens
    # tokens — few enough shingles that m edits can destroy all
    # overlap) bypass banding entirely via exhaustive length-bucketed
    # fallback buckets (stages/lsh.py SHORT_BAND), so the weakest
    # banding class is exact like the reference's trie enumeration
    # (src/humid.cc:140-158); short-long and long-long pairs keep the
    # standard LSH s-curve recall (accepted edges are always exact).
    # "estimate": legacy estimated-Jaccard-only verification.
    minhash_verify: str = "exact"
    # "short caption" cutoff for the edit-mode exhaustive fallback;
    # -1 = auto (shingle_k + 2 * max_distance: one char edit touches
    # <= 2 tokens, each in <= shingle_k shingles)
    edit_short_tokens: int = -1
    # the fallback's length buckets are salted into S*(S+1)/2 block
    # pairs (each caption replicated S times per bucket) so one length
    # class corpus-wide never funnels into a single verify task;
    # exhaustiveness is preserved (a pair meets in exactly one block)
    edit_short_salt: int = 4
    # exact mode prefilters pairs with estimated Jaccard >=
    # threshold - slack before exact verification (3-sigma of the
    # k=128 estimator at J=0.5 is ~0.13); widen for tiny perm counts.
    jaccard_est_slack: float = 0.15

    # clustering
    clustering: str = "directional"  # "directional" | "maximum" (HUMID -x)
    cc_strategy: str = "auto"        # "auto" | "local" | "distributed"
    cc_local_max_edges: int = 5_000_000

    # outputs
    dense_ids: bool = False          # 1..K walk-order cluster ids (driver-side
                                     # rank of seeds; only for bounded K)
    # "payload": copy surviving rows byte-identically (HUMID writes the
    # deduped FastQ); "manifest": write only the keep-list
    # (image_id, sig, cluster_id, cluster_size) — at 10^12-image scale
    # nobody copies the corpus, they ship the manifest
    filtered_output: str = "payload"
    write_filtered: bool = True      # HUMID -q
    write_annotated: bool = False    # HUMID -a
    write_stats: bool = True         # HUMID -s
    workdir: str = "/tmp/humid_ray"  # HUMID -d

    # codec selection (humid_ray.codecs): "auto" picks the real
    # library (Pillow / soundfile / PyAV) when importable, else the
    # sandbox stand-ins; "sandbox" forces the stand-ins (reproduces
    # the recorded pHash/decode-stats values under an installed
    # Pillow); a library name forces it or raises ImportError.
    # Decode-valued outputs are codec-dependent BY DESIGN — this IS
    # semantic config, so it participates in the fingerprint.
    codec: str = "auto"

    # execution
    sig_concurrency: int | tuple[int, int] | None = None  # actor pool size
    sig_batch_size: int = 4096
    sig_num_cpus: float = 1.0
    join_strategy: str = "auto"      # "auto" | "broadcast" | "hash"
    broadcast_max_rows: int = 5_000_000
    # byte-sized twin of broadcast_max_rows: the auto join strategy
    # broadcasts only when the phase checkpoint's UNCOMPRESSED size
    # (manifest "bytes") also fits — a wide-id corpus can blow a
    # row-count cap by 10x in bytes, and ray.put of a multi-GB lookup
    # evicts everything else from the object store
    broadcast_max_bytes: int = 256 * 1024 * 1024
    resume: bool = True              # skip phases whose checkpoints exist
    # True: persist phases 1-4 as parquet checkpoints synchronously
    # (each phase is write-then-reread — the conservative default).
    # False: STREAM — phases materialize in the object store only,
    # cutting the per-phase parquet round-trips that dominate small
    # jobs (~12 s of fixed cost at 200k rows); not resumable; outputs
    # (05_*) always write. "async": stream AND checkpoint — downstream
    # phases consume the object-store blocks immediately while the
    # parquet checkpoint writes in a background thread (the run waits
    # for all writes before returning, so durability is identical to
    # True); resume works against async-written checkpoints.
    checkpoint_phases: bool | str = True
    # wide binary payload rows get split into absurdly small blocks at
    # the default 128MiB target; raise it for image corpora
    target_max_block_size: int | None = 512 * 1024 * 1024

    def __post_init__(self):
        if not (0 < self.word_bits <= 64):
            raise ValueError("word_bits must be in (0, 64]")
        if self.distance not in ("hamming", "minhash-jaccard"):
            raise ValueError(f"unknown distance {self.distance}")
        if self.clustering not in ("directional", "maximum"):
            raise ValueError(f"unknown clustering {self.clustering}")
        if self.minhash_verify not in ("exact", "estimate", "edit"):
            raise ValueError(f"unknown minhash_verify {self.minhash_verify}")
        if self.checkpoint_phases not in (True, False, "async"):
            raise ValueError(
                f"unknown checkpoint_phases {self.checkpoint_phases!r}")
        if not self.sources:
            raise ValueError("need at least one signature source")
        # names outside the built-ins resolve through the signature
        # source registry at pipeline time (user-extension surface)

    @property
    def bands(self) -> int:
        return self.n_bands if self.n_bands is not None else self.max_distance + 1

    def source_bits(self, umi_bits: int = 0) -> tuple[int, list[int]]:
        """(umi_bits_used, per-source bits). UMI bits take precedence up
        to word_bits; the remainder is split across sources with the
        remainder on the last (reference: preCompute, src/humid.cc:38-59)."""
        umi_used = min(umi_bits, self.word_bits)
        from_sources = self.word_bits - umi_used
        return umi_used, bits_from_source(len(self.sources), from_sources)

    def fingerprint(self) -> str:
        """Stable hash of the semantic config (checkpoint invalidation)."""
        d = asdict(self)
        # execution-only knobs don't invalidate checkpoints (salting and
        # group caps provably preserve the edge set; write_* only toggle
        # which output phases run)
        for k in ("sig_concurrency", "sig_batch_size", "sig_num_cpus",
                  "join_strategy", "broadcast_max_rows", "broadcast_max_bytes",
                  "resume", "workdir", "checkpoint_phases",
                  "cc_strategy", "cc_local_max_edges", "hot_band_threshold",
                  "max_group_bruteforce", "write_filtered", "write_annotated",
                  "write_stats", "target_max_block_size"):
            d.pop(k)
        return hashlib.sha256(json.dumps(d, sort_keys=True, default=str).encode()).hexdigest()[:16]
