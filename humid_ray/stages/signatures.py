"""Phase 1 — per-row signature extraction (stateful actor-pool stage).

HUMID analog: readData's per-record ``makeWord`` during the streaming
read (reference src/humid.cc:70-103). Here it is a callable CLASS for
``map_batches`` so decode state / DCT matrices / compiled regex setup
happens once per actor, not per batch; batches are zero-copy Arrow.

Output schema (payload columns are NOT carried — wide shuffles only
ever see signature-shaped rows; payload re-joins by image_id at output
time): (image_id: string, sig: uint64, filtered: bool).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from humid_ray.config import HumidConfig
from humid_ray.functions.minhash import minhash_batch
from humid_ray.functions.phash import phash_image
from humid_ray.functions.signature import compose_signatures, umi_hex_to_bits
from humid_ray.functions.simhash import shingle_hashes, simhash_from_shingles
from humid_ray.functions.text import extract_umi, tokenize_batch
from humid_ray.png import FJPG_MAGIC, PNG_SIG, decode_image
from humid_ray.util import UINT64, int64_to_uint64, segment_unique, u64col


def default_sig_concurrency() -> tuple[int, int]:
    """Fixed-size decode pool covering ~7/8 of the node; the remaining
    1/8 (>=1 CPU) is the read/write slice — proportional at every node
    size. (A fixed "cpus - 2" reserve starves reads on big nodes and
    halves tiny ones; fractional-CPU actors can wedge the streaming
    scheduler on 4-CPU sessions — observed.)"""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    cap = max(2, cpus - max(1, cpus // 8))
    return (cap, cap)


def resolve_custom_sources(cfg: HumidConfig) -> dict:
    """Look up non-built-in signature sources in the registry (must run
    on the driver, where the user registered them)."""
    from humid_ray.functions.registry import get_signature_source

    return {
        name: get_signature_source(name)
        for name in cfg.sources
        if name not in ("phash", "simhash")
    }


def probe_umi_bits(first_image_id: str | None, cfg: HumidConfig) -> int:
    """UMI bit budget probed from the first row's id (HUMID peeks the
    first read's header, reference: peekUMI src/humid.cc:24-33)."""
    if not cfg.umi_from_id or first_image_id is None:
        return 0
    return 4 * len(extract_umi(first_image_id))


class SignatureExtractor:
    """Actor-pool batch kernel: rows -> (image_id, sig, filtered[, minhash]).

    ``filtered`` marks rows that cannot produce a full signature
    (undecodable/empty image payload, empty caption) — HUMID's
    non-ACGT rule (reference src/fastq.cc:152-158); filtered rows
    never enter the index (reference src/humid.cc:94-98).
    """

    def __init__(self, cfg: HumidConfig, umi_bits: int = 0,
                 custom_sources: dict | None = None):
        self.cfg = cfg
        self.umi_bits = umi_bits
        self.emit_minhash = cfg.distance == "minhash-jaccard"
        # exact verification needs the true shingle sets downstream;
        # edit verification needs the captions themselves
        self.emit_shingles = self.emit_minhash and cfg.minhash_verify == "exact"
        self.emit_caption = self.emit_minhash and cfg.minhash_verify == "edit"
        # the registry is per-process, so custom sources must be
        # RESOLVED on the driver and shipped in as callables; when
        # constructed driver-side directly, resolve here as a fallback
        if custom_sources is None:
            custom_sources = resolve_custom_sources(cfg)
        self.custom_sources = custom_sources
        # per-actor decode memo: payload digest -> (phash, ok)
        from humid_ray.functions.payloads import PayloadMemo

        self._phash_memo = PayloadMemo()
        # production codec seam (humid_ray.codecs): resolved ONCE per
        # actor — the real library when importable, sandbox otherwise
        from humid_ray.codecs import image_decoder

        self._decode = image_decoder(getattr(cfg, "codec", "auto"))

    # -- helpers -----------------------------------------------------------

    def _payload_ok(self, data_col: pa.ChunkedArray | pa.Array) -> np.ndarray:
        """Cheap magic-byte sniff (stored mode, vectorized): payload
        non-null and carries a known image container header."""
        head8 = pc.binary_slice(data_col, 0, 8)
        head4 = pc.binary_slice(data_col, 0, 4)
        ok = pc.or_kleene(
            pc.equal(head8, pa.scalar(PNG_SIG, type=pa.binary())),
            pc.equal(head4, pa.scalar(FJPG_MAGIC, type=pa.binary())),
        )
        ok = pc.fill_null(ok, False)
        return ok.to_numpy(zero_copy_only=False).astype(bool)

    def _recompute_phash(self, data_col) -> tuple[np.ndarray, np.ndarray]:
        """Full decode + pHash (recompute mode); returns (phash, ok).

        Byte-identical payloads decode ONCE (PayloadMemo: the bench
        corpus measures ~58% in-batch byte dups, and the per-actor
        memo carries dup families across batches too) — a measured
        2.07x on the decode kernel, bit-identical output."""
        n = len(data_col)
        ph = np.zeros(n, dtype=UINT64)
        ok = np.zeros(n, dtype=bool)
        if n == 0:
            return ph, ok

        decode = self._decode

        def one(seg) -> tuple:
            try:
                return (UINT64(phash_image(decode(bytes(seg)))), True)
            except Exception:  # noqa: BLE001 - decode failure filters the row
                return (UINT64(0), False)

        for i, hit in enumerate(self._phash_memo.map(data_col, one)):
            ph[i], ok[i] = hit
        return ph, ok

    # -- batch kernel ------------------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        umi_used, per_source = cfg.source_bits(self.umi_bits)

        def bits_for(name: str) -> int:
            return per_source[list(cfg.sources).index(name)] if name in cfg.sources else 0

        need_phash = bits_for("phash") > 0
        need_simhash = bits_for("simhash") > 0

        # custom registry sources (user-extension surface)
        extra: dict[str, np.ndarray] = {}
        custom_filtered = np.zeros(n, dtype=bool)
        for name, fn in self.custom_sources.items():
            if bits_for(name) == 0:
                extra[name] = np.zeros(n, dtype=UINT64)
                continue
            hashes, ok = fn(batch)
            extra[name] = np.asarray(hashes, dtype=UINT64)
            custom_filtered |= ~np.asarray(ok, dtype=bool)

        filtered = np.zeros(n, dtype=bool)

        # image side
        if need_phash or self.emit_minhash:
            if cfg.signature_source == "recompute":
                phash, ok = self._recompute_phash(batch.column("bytes"))
            else:
                stored = batch.column("phash")
                is_null = pc.is_null(stored).to_numpy(zero_copy_only=False).astype(bool)
                # fill nulls BEFORE to_numpy: an int64 column with any
                # null otherwise converts via float64, silently mangling
                # phash values above 2^53 (batch-composition-dependent!)
                phash = int64_to_uint64(
                    np.asarray(pc.fill_null(stored, 0).to_numpy(zero_copy_only=False))
                )
                ok = ~is_null  # null stored phash -> row is filtered
                if cfg.validate_payload:
                    ok &= self._payload_ok(batch.column("bytes"))
            filtered |= ~ok
        else:
            phash = np.zeros(n, dtype=UINT64)

        # caption side
        token_hashes, row_offsets = tokenize_batch(batch.column("caption"))
        sh, sh_offsets = shingle_hashes(token_hashes, row_offsets, cfg.shingle_k)
        n_sh = sh_offsets[1:] - sh_offsets[:-1]
        if need_simhash or self.emit_minhash:
            simhash = simhash_from_shingles(sh, sh_offsets)
            filtered |= n_sh == 0  # empty caption -> no signature
        else:
            simhash = np.zeros(n, dtype=UINT64)

        # id-embedded UMI (budget precedence, reference src/humid.cc:38-59)
        umi_vals = None
        if umi_used > 0:
            ids = batch.column("image_id").to_pylist()
            umi_vals = np.zeros(n, dtype=UINT64)
            for i, ident in enumerate(ids):
                tok = extract_umi(ident)
                if tok:
                    umi_vals[i] = UINT64(umi_hex_to_bits(tok, umi_used))
                else:
                    filtered[i] = True

        filtered |= custom_filtered
        sig = compose_signatures(cfg, phash, simhash, umi_vals, self.umi_bits,
                                 extra_sources=extra)
        cols = {
            "image_id": batch.column("image_id"),
            "sig": u64col(sig),
            "filtered": pa.array(filtered),
        }
        if self.emit_minhash:
            mh = minhash_batch(sh, sh_offsets, cfg.minhash_perms)
            cols["minhash"] = pa.FixedSizeListArray.from_arrays(
                u64col(mh.reshape(-1)), cfg.minhash_perms
            )
        if self.emit_shingles:
            uvals, uoffs = segment_unique(sh, sh_offsets)
            cols["shingles"] = pa.LargeListArray.from_arrays(
                pa.array(uoffs, type=pa.int64()), u64col(uvals)
            )
        if self.emit_caption:
            cols["caption"] = pc.fill_null(
                pc.cast(batch.column("caption"), pa.string()), ""
            )
        return pa.table(cols)


def extract_signatures(ds, cfg: HumidConfig, umi_bits: int = 0):
    """rows Dataset -> signatures Dataset (actor pool)."""
    if any(s not in ("phash", "simhash") for s in cfg.sources):
        pass  # custom sources may need arbitrary columns: no pruning
    else:
        needed = ["image_id", "caption"]
        if cfg.signature_source == "recompute":
            needed.append("bytes")
        else:
            # stored fast path: the pruned scan never touches the
            # payload column unless payload sniffing is opted in
            needed.append("phash")
            if cfg.validate_payload:
                needed.append("bytes")
        ds = ds.select_columns([c for c in dict.fromkeys(needed)])
    custom = resolve_custom_sources(cfg)
    if cfg.signature_source != "recompute" and not cfg.validate_payload:
        # stored fast path: no decode, no per-actor memo value — the
        # kernel is stateless vectorized hashing, so run it as TASKS
        # on the shared worker pool instead of spinning up an actor
        # pool (actor startup is pure fixed cost on a job this light;
        # per-task extractor construction is a couple of dicts)
        def stored_kernel(batch: pa.Table, _cfg=cfg, _umi=umi_bits,
                          _custom=custom) -> pa.Table:
            return SignatureExtractor(_cfg, _umi, _custom)(batch)

        return ds.map_batches(
            stored_kernel,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.sig_batch_size,
        )
    concurrency = cfg.sig_concurrency
    if concurrency is None:
        concurrency = default_sig_concurrency()
    return ds.map_batches(
        SignatureExtractor,
        fn_constructor_kwargs={"cfg": cfg, "umi_bits": umi_bits,
                               "custom_sources": custom},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.sig_batch_size,
        concurrency=concurrency,
        num_cpus=cfg.sig_num_cpus,
    )
