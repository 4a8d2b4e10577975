"""Composite signature ("word") assembly.

Mirrors HUMID's word construction semantics over the image+caption
domain (reference: makeWord/getNucleotides src/fastq.cc:96-161 and
preCompute src/humid.cc:38-59):

* total budget ``word_bits`` (HUMID ``-n``), split across the sources
  (pHash, caption SimHash) evenly with the remainder on the LAST
  source (reference: ntFromFile src/fastq.cc:220-230);
* an id-embedded UMI (hex token parsed off ``image_id``) takes budget
  precedence, 4 bits per hex char, capped at ``word_bits``;
* each source contributes its TOP bits (the most significant bits of a
  pHash/SimHash are its coarsest structure — the analog of a read's
  leading bases);
* a row that cannot produce a required component (undecodable image,
  empty caption) is ``filtered`` and never enters the index
  (reference: non-ACGT chars, src/fastq.cc:152-158, src/humid.cc:94-98).
"""

from __future__ import annotations

import numpy as np

from humid_ray.config import HumidConfig
from humid_ray.util import UINT64, pack_fields, top_bits


def umi_hex_to_bits(umi: str, nbits: int) -> int:
    """Hex UMI token -> integer over exactly ``nbits`` bits.

    The token is cut / right-padded with '0' nibbles to nbits/4 chars
    (reference: makeStringSize_ src/fastq.cc:57-66; padding there is
    'N' which marks the word filtered — hex '0' is always valid here,
    so padding does not filter)."""
    if nbits <= 0:
        return 0
    nchars = (nbits + 3) // 4
    token = umi[:nchars].ljust(nchars, "0")
    val = int(token, 16)
    total = nchars * 4
    return val >> (total - nbits) if total > nbits else val


def compose_signatures(
    cfg: HumidConfig,
    phash: np.ndarray | None = None,
    simhash: np.ndarray | None = None,
    umi_vals: np.ndarray | None = None,
    umi_bits: int = 0,
    extra_sources: dict[str, np.ndarray] | None = None,
) -> np.ndarray:
    """Pack per-source top bits into the composite uint64 signature.

    ``umi_vals`` (already bit-packed ints) occupy the most significant
    position, then each source in ``cfg.sources`` order. Custom
    (registry) source hashes are passed via ``extra_sources``.
    """
    umi_used, per_source = cfg.source_bits(umi_bits)
    by_name: dict[str, np.ndarray] = dict(extra_sources or {})
    if phash is not None:
        by_name["phash"] = np.asarray(phash, dtype=UINT64)
    if simhash is not None:
        by_name["simhash"] = np.asarray(simhash, dtype=UINT64)
    fields: list[tuple[np.ndarray, int]] = []
    if umi_used > 0:
        if umi_vals is None:
            raise ValueError("umi_bits > 0 requires umi_vals")
        fields.append((np.asarray(umi_vals, dtype=UINT64), umi_used))
    for name, nb in zip(cfg.sources, per_source):
        if nb > 0:
            fields.append((top_bits(np.asarray(by_name[name], dtype=UINT64), nb), nb))
    return pack_fields(fields)


def sig_repr(sig: int, cfg: HumidConfig | None = None) -> str:
    """Debug rendering of a composite word (reference printWord,
    src/fastq.cc:163-168): hex plus per-source bit fields."""
    s = f"{int(sig):016x}"
    if cfg is None:
        return s
    _, per_source = cfg.source_bits(0)
    bits = f"{int(sig):064b}"
    pos = 0
    parts = []
    for name, nb in zip(cfg.sources, per_source):
        parts.append(f"{name}={bits[pos:pos + nb]}")
        pos += nb
    return s + " (" + " ".join(parts) + ")"
