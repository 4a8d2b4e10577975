"""DuckDB SQL builders for hash-valued oracles.

The engine's 64-bit hash chain (polynomial byte hash -> splitmix64 ->
shingle combine -> SimHash bit-vote / rolling fingerprint, see
``humid_ray/util.py`` and ``humid_ray/functions/simhash.py``) is fully
deterministic, so it is SQL-expressible: DuckDB HUGEINT carries the
[0, 2^64) domain, wrapped 64x64-bit multiplication is done by 32-bit
limb splitting (each partial product stays under 2^65 << HUGEINT max),
and splitmix64 unrolls into a lateral-alias column chain. These
builders give the sketch-valued queries (simhash, simhash near-dup,
document fingerprints) the same hard hash-equality oracle the flagship
phash phases already have.
"""

from __future__ import annotations

TWO64 = 1 << 64
TWO63 = 1 << 63
TWO32 = 1 << 32
_G = 0x9E3779B97F4A7C15   # splitmix64 gamma (util._SM_GAMMA)
_M1 = 0xBF58476D1CE4E5B9  # util._SM_M1
_M2 = 0x94D049BB133111EB  # util._SM_M2
_B = 0x100000001B3        # util.HASH_BASE

# order-preserving uint64 view of an int64 bit pattern (flip sign bit)
_SB = "-9223372036854775808"


def _mulmod_const(x: str, c: int) -> str:
    """(x * c) % 2^64 for HUGEINT x in [0, 2^64), constant c."""
    lo, hi = c % TWO32, c // TWO32
    return (
        f"((({x}) % {TWO32}) * {lo} + "
        f"(((({x}) % {TWO32}) * {hi} + (({x}) // {TWO32}) * {lo}) % {TWO32})"
        f" * {TWO32}) % {TWO64}"
    )


def _sm64_cols(x: str, p: str) -> str:
    """Lateral-alias column chain computing splitmix64(x) AS {p}.

    Right shifts on the non-negative HUGEINT domain are integer
    division by the matching power of two.
    """
    return (
        f"(({x}) + {_G}) % {TWO64} AS {p}_0, "
        f"xor({p}_0, {p}_0 // {1 << 30}) AS {p}_1, "
        f"{_mulmod_const(f'{p}_1', _M1)} AS {p}_2, "
        f"xor({p}_2, {p}_2 // {1 << 27}) AS {p}_3, "
        f"{_mulmod_const(f'{p}_3', _M2)} AS {p}_4, "
        f"xor({p}_4, {p}_4 // {1 << 31}) AS {p}"
    )


def _horner_fold(list_expr: str) -> str:
    """``fold acc = (acc*B + x) mod 2^64`` over a HUGEINT list via
    list_reduce — equals ``sum(x_j * B^(n-1-j)) mod 2^64`` for ANY
    sequence length (a fixed precomputed power list silently NULLs out
    terms past its cap: DuckDB out-of-range list indexing returns NULL
    and SUM drops the row)."""
    step = _mulmod_const("acc", _B)
    return (
        f"list_reduce(list_prepend(CAST(0 AS HUGEINT), {list_expr}), "
        f"(acc, xx) -> ({step} + xx) % {TWO64})"
    )


def _pow2_list() -> str:
    return "CAST([" + ", ".join(str(1 << b) for b in range(64)) + "] AS HUGEINT[])"


def _to_int64(x: str) -> str:
    """HUGEINT in [0, 2^64) (NULL -> 0) -> int64 bit pattern."""
    return (
        f"CAST(CASE WHEN {x} IS NULL THEN 0 WHEN {x} >= {TWO63} "
        f"THEN {x} - {TWO64} ELSE {x} END AS BIGINT)"
    )


def _token_hash_ctes(table: str) -> str:
    """CTE chain: {table}(doc_id, text) -> th(doc_id, pos, n_toks, h).

    h reproduces functions/text.tokenize_batch's token hash: UTF-8
    bytes (extracted as hex pairs) folded with the polynomial rolling
    hash sum(byte_j * B^(len-1-j)) mod 2^64 (util.hash_bytes_segments),
    splitmix64-finalized. Tokens = maximal [0-9a-z]+ runs of the
    lowercased text, exactly the engine's split-and-drop-empties.
    """
    byte_list = (
        "list_transform(range(1, CAST(octet_length(encode(tok)) + 1 AS BIGINT)), "
        "jj -> CAST(CAST('0x' || substr(hex(encode(tok)), "
        "CAST(2*jj-1 AS INTEGER), 2) AS UBIGINT) AS HUGEINT))"
    )
    return (
        f"toks AS (SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), "
        f"'[0-9a-z]+') AS t FROM {table}), "
        "trows AS (SELECT doc_id, len(t) AS n_toks, "
        "unnest(range(1, len(t)+1)) AS pos, unnest(t) AS tok FROM toks), "
        "thraw AS (SELECT doc_id, n_toks, pos, "
        f"{_horner_fold(byte_list)} AS hraw FROM trows), "
        f"th AS (SELECT doc_id, n_toks, pos, {_sm64_cols('hraw', 'h')} FROM thraw)"
    )


def _simhash_value_ctes(table: str) -> str:
    """CTEs ending in simv(doc_id, v): the engine's 2-token-shingle
    SimHash as HUGEINT in [0, 2^64) (docs with zero shingles absent;
    join back and NULL-coalesce to 0 like simhash_from_shingles).

    Shingles follow functions/simhash.shingle_hashes: k=2 windows
    combined via splitmix64(h_i * B + h_{i+1}), single-token rows keep
    the unigram, all splitmix64-finalized; the bit-vote sets bit b iff
    strictly more than half the shingles have it set.
    """
    return (
        f"{_token_hash_ctes(table)}, "
        "sh0 AS (SELECT doc_id, n_toks, h, "
        "lead(h) OVER (PARTITION BY doc_id ORDER BY pos) AS h2 FROM th), "
        f"shpair AS (SELECT doc_id, (h * {_B} + h2) % {TWO64} AS c0 "
        "FROM sh0 WHERE h2 IS NOT NULL AND n_toks >= 2), "
        f"shinner AS (SELECT doc_id, {_sm64_cols('c0', 'innr')} FROM shpair), "
        "shall AS (SELECT doc_id, innr AS acc FROM shinner "
        "UNION ALL SELECT doc_id, h AS acc FROM sh0 WHERE n_toks = 1), "
        f"shfin AS (SELECT doc_id, {_sm64_cols('acc', 'sh')} FROM shall), "
        f"pow2 AS (SELECT {_pow2_list()} AS p2), "
        "bitrows AS (SELECT doc_id, sh, unnest(range(0, 64)) AS b FROM shfin), "
        "votes AS (SELECT doc_id, b, "
        "SUM(CAST((sh // p2[CAST(b+1 AS INTEGER)]) % 2 AS HUGEINT)) AS cnt, "
        "COUNT(*) AS n FROM bitrows, pow2 GROUP BY doc_id, b), "
        "simv AS (SELECT doc_id, SUM(CASE WHEN 2*cnt > n "
        "THEN p2[CAST(b+1 AS INTEGER)] ELSE CAST(0 AS HUGEINT) END) "
        f"% {TWO64} AS v FROM votes, pow2 GROUP BY doc_id)"
    )


def flagship_uniq_sql(corpus_glob: str) -> str:
    """(sig, count, first_id) for the FULL default flagship config
    (sources=("phash","simhash"), stored phash, word_bits=64 split
    32/32): sig = top-32 bits of the stored phash packed MSB-first with
    the top-32 bits of the caption SimHash (functions/signature
    .compose_signatures); usable rows have a non-NULL phash AND at
    least one caption token (stages/signatures.py stored-mode filter).
    """
    src = (
        f"(SELECT image_id AS doc_id, caption AS text "
        f"FROM read_parquet('{corpus_glob}'))"
    )
    return (
        f"WITH {_simhash_value_ctes(src)}, "
        "crows AS (SELECT image_id, phash FROM "
        f"read_parquet('{corpus_glob}') WHERE phash IS NOT NULL), "
        # inner join vs simv drops zero-shingle (empty-caption) rows
        "sigs AS (SELECT c.image_id, "
        f"((CASE WHEN c.phash < 0 THEN CAST(c.phash AS HUGEINT) + {TWO64} "
        f"ELSE CAST(c.phash AS HUGEINT) END) // {TWO32}) * {TWO32} "
        f"+ (s.v // {TWO32}) AS sigu "
        "FROM crows c JOIN simv s ON s.doc_id = c.image_id) "
        f"SELECT {_to_int64('sigu')} AS sig, COUNT(*) AS \"count\", "
        "MIN(image_id) AS first_id FROM sigs GROUP BY sigu"
    )


def flagship_edges_sql(corpus_glob: str, max_distance: int = 1) -> str:
    """(sig_a, sig_b) for the full default flagship config: distinct
    composite-signature pairs within Hamming <= max_distance,
    uint64-ordered (the engine's pigeonhole banding is exhaustive)."""
    return (
        f"WITH nodes AS (SELECT DISTINCT sig FROM ({flagship_uniq_sql(corpus_glob)})) "
        "SELECT a.sig AS sig_a, b.sig AS sig_b FROM nodes a JOIN nodes b "
        f"ON xor(a.sig, {_SB}) < xor(b.sig, {_SB}) "
        f"AND bit_count(xor(a.sig, b.sig)) <= {max_distance}"
    )


def _flagship_closure_ctes(corpus_glob: str, max_distance: int = 1) -> str:
    """WITH RECURSIVE prefix ending in comp(sig, cluster_seed): connected
    components over the FULL default flagship config's composite
    signatures (maximum clustering: cluster == CC, seed == min member
    in unsigned sig order) via transitive closure."""
    return (
        "WITH RECURSIVE nodes AS "
        f"(SELECT * FROM ({flagship_uniq_sql(corpus_glob)})), "
        "e AS (SELECT a.sig AS sa, b.sig AS sb FROM nodes a JOIN nodes b "
        f"ON a.sig != b.sig AND bit_count(xor(a.sig, b.sig)) <= {max_distance}), "
        "reach(src, dst) AS (SELECT sig, sig FROM nodes UNION "
        "SELECT r.src, e.sb FROM reach r JOIN e ON e.sa = r.dst), "
        "comp AS (SELECT src AS sig, "
        f"xor(min(xor(dst, {_SB})), {_SB}) AS cluster_seed "
        "FROM reach GROUP BY src)"
    )


def flagship_assign_sql(corpus_glob: str, max_distance: int = 1) -> str:
    """(sig, count, first_id, cluster_seed, cluster_size) — the
    walk-order-independent assignment columns for the full default
    flagship config under maximum clustering. The representative
    (max-leaf) column follows the reference's DFS preorder tie-break
    (src/cluster.cc:72-80), which SQL cannot express declaratively; it
    stays pinned by the reference-translated graph tests."""
    return (
        f"{_flagship_closure_ctes(corpus_glob, max_distance)}, "
        "cl AS (SELECT cluster_seed, sum(\"count\") AS cluster_size "
        "FROM comp JOIN nodes USING (sig) GROUP BY cluster_seed) "
        "SELECT n.sig, n.\"count\", n.first_id, c.cluster_seed, "
        "CAST(cl.cluster_size AS BIGINT) AS cluster_size "
        "FROM nodes n JOIN comp c USING (sig) JOIN cl USING (cluster_seed)"
    )


def flagship_stats_sql(corpus_glob: str, max_distance: int = 1) -> str:
    """(total, usable, unique, clusters) for the full default flagship
    config under maximum clustering. Usable = stored-mode filter:
    non-NULL phash AND >= 1 caption token (stages/signatures.py)."""
    src = f"read_parquet('{corpus_glob}')"
    return (
        f"{_flagship_closure_ctes(corpus_glob, max_distance)} "
        f"SELECT (SELECT count(*) FROM {src}) AS total, "
        f"(SELECT count(*) FROM {src} WHERE phash IS NOT NULL AND "
        "len(regexp_extract_all(lower(coalesce(caption, '')), '[0-9a-z]+')) > 0"
        ") AS usable, "
        "(SELECT count(*) FROM nodes) AS \"unique\", "
        "(SELECT count(DISTINCT cluster_seed) FROM comp) AS clusters"
    )


def flagship_counts_hist_sql(corpus_glob: str) -> str:
    """counts.dat histogram (value, n) for the full flagship config."""
    return (
        f"WITH nodes AS (SELECT * FROM ({flagship_uniq_sql(corpus_glob)})) "
        "SELECT \"count\" AS value, count(*) AS n FROM nodes GROUP BY \"count\""
    )


def flagship_neigh_hist_sql(corpus_glob: str, max_distance: int = 1) -> str:
    """neigh.dat histogram (value, n) incl. degree 0 for the full
    flagship config."""
    return (
        f"WITH nodes AS (SELECT * FROM ({flagship_uniq_sql(corpus_glob)})), "
        "deg AS (SELECT a.sig, count(*) AS d FROM nodes a JOIN nodes b "
        f"ON a.sig != b.sig AND bit_count(xor(a.sig, b.sig)) <= {max_distance} "
        "GROUP BY a.sig) "
        "SELECT value, n FROM ("
        "SELECT d AS value, count(*) AS n FROM deg GROUP BY d "
        "UNION ALL SELECT 0 AS value, "
        "(SELECT count(*) FROM nodes) - (SELECT count(*) FROM deg) AS n"
        ") WHERE n > 0"
    )


def flagship_cluster_hist_sql(corpus_glob: str, max_distance: int = 1) -> str:
    """clusters.dat histogram (value, n) — cluster sizes in reads —
    for the full flagship config under maximum clustering."""
    return (
        f"{_flagship_closure_ctes(corpus_glob, max_distance)} "
        "SELECT value, count(*) AS n FROM ("
        "SELECT CAST(sum(\"count\") AS BIGINT) AS value FROM comp "
        "JOIN nodes USING (sig) GROUP BY cluster_seed) GROUP BY value"
    )


def simhash_docs_sql(table: str = "documents") -> str:
    """(doc_id, simhash) — engine parity for pipelines.dedup_text
    .simhash_docs (int64 bit patterns, zero-shingle docs -> 0)."""
    return (
        f"WITH {_simhash_value_ctes(table)} "
        f"SELECT d.doc_id, {_to_int64('s.v')} AS simhash "
        f"FROM {table} d LEFT JOIN simv s USING (doc_id)"
    )


def simhash_neardup_sql(table: str = "documents", max_distance: int = 3) -> str:
    """(sig_a, sig_b) — distinct unordered simhash pairs within
    Hamming <= max_distance, uint64-ordered via the sign-bit flip
    (engine parity for dedup_text.simhash_neardup, whose pigeonhole
    banding is exhaustive at this distance)."""
    return (
        f"WITH {_simhash_value_ctes(table)}, "
        f"sigs AS (SELECT DISTINCT {_to_int64('s.v')} AS sig "
        f"FROM {table} d LEFT JOIN simv s USING (doc_id)) "
        "SELECT a.sig AS sig_a, b.sig AS sig_b FROM sigs a JOIN sigs b "
        f"ON xor(a.sig, {_SB}) < xor(b.sig, {_SB}) "
        f"AND bit_count(xor(a.sig, b.sig)) <= {max_distance}"
    )


def _shingle3_ctes(table: str) -> str:
    """CTE chain ending in shfin(doc_id, fp): the engine's k=3 token
    shingle hashes (functions/simhash.shingle_hashes with k=3).

    Full windows (n_toks >= 3) fold with combine_hashes — each step is
    splitmix64(acc * B + next) — then a final splitmix64:
    fp = sm64(sm64(sm64(h0*B + h1)*B + h2)). Rows with 1 <= n_toks < 3
    degrade to unigram shingles fp = sm64(h). Zero-token docs have no
    rows (the minhash CTE re-attaches them with sentinel lanes).
    """
    return (
        f"{_token_hash_ctes(table)}, "
        "sg0 AS (SELECT doc_id, n_toks, h, "
        "lead(h, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS hb1, "
        "lead(h, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS hb2 FROM th), "
        f"sgw1 AS (SELECT doc_id, (h * {_B} + hb1) % {TWO64} AS c0, hb2 "
        "FROM sg0 WHERE n_toks >= 3 AND hb2 IS NOT NULL), "
        f"sgw2 AS (SELECT doc_id, {_sm64_cols('c0', 't1')}, hb2 FROM sgw1), "
        f"sgw3 AS (SELECT doc_id, (t1 * {_B} + hb2) % {TWO64} AS c1 FROM sgw2), "
        f"sgw4 AS (SELECT doc_id, {_sm64_cols('c1', 't2')} FROM sgw3), "
        "sgall AS (SELECT doc_id, t2 FROM sgw4 "
        "UNION ALL SELECT doc_id, h AS t2 FROM th WHERE n_toks < 3), "
        f"shfin AS (SELECT doc_id, {_sm64_cols('t2', 'fp')} FROM sgall)"
    )


def _minhash_perm_values(n_perms: int, seed: int = 42) -> str:
    """VALUES list (pid, a, b) reproducing functions/minhash
    ._perm_params: default_rng(seed) draws a then b (order matters)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 62, size=n_perms, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 62, size=n_perms, dtype=np.uint64)
    return ", ".join(
        f"({i}, {int(a[i])}, {int(b[i])})" for i in range(n_perms)
    )


def _minhash_pair_ctes(
    table: str, n_perms: int = 128, n_bands: int = 16, seed: int = 42
) -> str:
    """CTEs ending in mhagg(da, db, neq, sb): for every doc pair
    (da < db), the number of equal minhash lanes (neq) and whether at
    least one LSH band is fully equal (sb) — the candidate condition.

    MinHash lanes follow functions/minhash.minhash_batch: per
    permutation p, min over shingles of (fp * a_p + b_p) mod 2^64;
    zero-shingle docs get all-sentinel (2^64-1) lanes, exactly the
    engine's behavior (no special-casing, so two empty docs DO pair).
    Band membership is modeled as all rows-per-band lanes equal; the
    engine hashes each band slice to a 64-bit key, so this matches
    modulo band-key hash collisions (~2^-64, an accepted assumption
    like collision-freedom in the shingle oracles). Both a*fp and the
    +b sum stay below 2^127, so HUGEINT arithmetic is exact without
    limb splitting.
    """
    if n_perms % n_bands:
        raise ValueError("n_perms must divide evenly into n_bands")
    r = n_perms // n_bands
    return (
        f"{_shingle3_ctes(table)}, "
        f"perms(pid, pa, pb) AS (VALUES {_minhash_perm_values(n_perms, seed)}), "
        "mh0 AS (SELECT doc_id, pid, "
        f"MIN((fp * pa + pb) % {TWO64}) AS v FROM shfin, perms "
        "GROUP BY doc_id, pid), "
        f"docs0 AS (SELECT doc_id FROM {table}), "
        f"mh AS (SELECT d.doc_id, p.pid, coalesce(m.v, {TWO64 - 1}) AS v "
        "FROM docs0 d CROSS JOIN perms p "
        "LEFT JOIN mh0 m ON m.doc_id = d.doc_id AND m.pid = p.pid), "
        "lane AS (SELECT a.doc_id AS da, b.doc_id AS db, "
        f"a.pid // {r} AS band, CASE WHEN a.v = b.v THEN 1 ELSE 0 END AS eq "
        "FROM mh a JOIN mh b ON a.pid = b.pid AND a.doc_id < b.doc_id), "
        "bnd AS (SELECT da, db, band, SUM(eq) AS ne FROM lane "
        "GROUP BY da, db, band), "
        "mhagg AS (SELECT da, db, SUM(ne) AS neq, "
        f"MAX(CASE WHEN ne = {r} THEN 1 ELSE 0 END) AS sb "
        "FROM bnd GROUP BY da, db)"
    )


def minhash_neardup_sql(
    table: str = "documents",
    threshold: float = 0.8,
    n_perms: int = 128,
    n_bands: int = 16,
) -> str:
    """(doc_a, doc_b, jaccard) — engine parity for pipelines.dedup_text
    .minhash_neardup_pairs: pairs sharing >= 1 full LSH band whose
    estimated Jaccard (equal-lane fraction) >= threshold. neq/n_perms
    is exactly representable in float64 on both sides."""
    return (
        f"WITH {_minhash_pair_ctes(table, n_perms, n_bands)} "
        "SELECT da AS doc_a, db AS doc_b, "
        f"CAST(neq AS DOUBLE) / {n_perms} AS jaccard FROM mhagg "
        f"WHERE sb = 1 AND CAST(neq AS DOUBLE) / {n_perms} >= {threshold}"
    )


def ngram_jaccard_lsh_sql(
    table: str = "documents",
    threshold: float = 0.8,
    n_perms: int = 128,
    n_bands: int = 16,
) -> str:
    """(doc_a, doc_b, ngram_jaccard) — engine parity for
    pipelines.dedup_text.ngram_jaccard_pairs: MinHash-LSH candidates at
    estimated-Jaccard >= max(0.5, threshold - 0.2), re-verified with
    EXACT distinct-shingle Jaccard >= threshold (filter on the
    unrounded value, round only the output — the engine's
    WHERE-then-round order). Zero-shingle candidate pairs have union 0
    and are dropped, matching ngram_jaccard_of_text_pairs' 0.0."""
    cand_t = max(0.5, threshold - 0.2)
    return (
        f"WITH {_minhash_pair_ctes(table, n_perms, n_bands)}, "
        "cand AS (SELECT da, db FROM mhagg WHERE sb = 1 "
        f"AND CAST(neq AS DOUBLE) / {n_perms} >= {cand_t}), "
        "shu AS (SELECT DISTINCT doc_id, fp FROM shfin), "
        "sz AS (SELECT doc_id, COUNT(*) AS n FROM shu GROUP BY doc_id), "
        "itr AS (SELECT c.da, c.db, COUNT(*) AS i FROM cand c "
        "JOIN shu x ON x.doc_id = c.da "
        "JOIN shu y ON y.doc_id = c.db AND y.fp = x.fp "
        "GROUP BY c.da, c.db), "
        "ex AS (SELECT c.da, c.db, coalesce(i.i, 0) AS i, "
        "coalesce(sa.n, 0) + coalesce(sb2.n, 0) - coalesce(i.i, 0) AS u "
        "FROM cand c LEFT JOIN itr i ON i.da = c.da AND i.db = c.db "
        "LEFT JOIN sz sa ON sa.doc_id = c.da "
        "LEFT JOIN sz sb2 ON sb2.doc_id = c.db) "
        "SELECT da AS doc_a, db AS doc_b, "
        "round(CAST(i AS DOUBLE) / u, 6) AS ngram_jaccard FROM ex "
        f"WHERE u > 0 AND CAST(i AS DOUBLE) / u >= {threshold}"
    )


def _minhash_cluster_ctes(
    table: str = "documents",
    threshold: float = 0.8,
    n_perms: int = 128,
    n_bands: int = 16,
    pre: str = "",
) -> str:
    """WITH RECURSIVE prefix ending in compsz(doc_id, cluster_id,
    cluster_size): connected components (transitive closure) over the
    MinHash-LSH near-dup pairs at estimated Jaccard >= threshold;
    every document is seeded into the closure, so edge-free docs come
    out as singletons of themselves — engine parity for
    pipelines.dedup_text.minhash_clusters. ``pre`` injects extra CTE
    definitions ahead of the chain so ``table`` may itself be a CTE
    (e.g. the exact-dedup survivor set in the tiered report)."""
    return (
        f"WITH RECURSIVE {pre}{_minhash_pair_ctes(table, n_perms, n_bands)}, "
        "e AS (SELECT da, db FROM mhagg WHERE sb = 1 "
        f"AND CAST(neq AS DOUBLE) / {n_perms} >= {threshold}), "
        "ee AS (SELECT da AS a, db AS b FROM e "
        "UNION SELECT db AS a, da AS b FROM e), "
        f"reach(src, dst) AS (SELECT doc_id, doc_id FROM {table} UNION "
        "SELECT r.src, ee.b FROM reach r JOIN ee ON ee.a = r.dst), "
        "comp AS (SELECT src AS doc_id, MIN(dst) AS cluster_id "
        "FROM reach GROUP BY src), "
        "sz AS (SELECT cluster_id, COUNT(*) AS n FROM comp "
        "GROUP BY cluster_id), "
        "compsz AS (SELECT c.doc_id, c.cluster_id, "
        "CAST(s.n AS BIGINT) AS cluster_size "
        "FROM comp c JOIN sz s USING (cluster_id))"
    )


def minhash_cluster_sql(
    table: str = "documents",
    threshold: float = 0.8,
    n_perms: int = 128,
    n_bands: int = 16,
) -> str:
    """(doc_id, cluster_id, cluster_size) — engine parity for
    pipelines.dedup_text.minhash_clusters (fuzzy-dedup CC assignment:
    cluster label = min doc_id of the component)."""
    return (
        f"{_minhash_cluster_ctes(table, threshold, n_perms, n_bands)} "
        "SELECT doc_id, cluster_id, cluster_size FROM compsz"
    )


def minhash_keep_sql(
    table: str = "documents",
    threshold: float = 0.8,
    n_perms: int = 128,
    n_bands: int = 16,
) -> str:
    """(doc_id, cluster_size) — engine parity for pipelines.dedup_text
    .minhash_dedup_keep: one representative (min doc_id) per near-dup
    cluster."""
    return (
        f"{_minhash_cluster_ctes(table, threshold, n_perms, n_bands)} "
        "SELECT doc_id, cluster_size FROM compsz WHERE doc_id = cluster_id"
    )


def minhash_keep_best_sql(
    table: str = "documents",
    threshold: float = 0.8,
    n_perms: int = 128,
    n_bands: int = 16,
) -> str:
    """(doc_id, cluster_id, cluster_size, n_tokens) — engine parity
    for pipelines.dedup_text.minhash_dedup_keep_best: per near-dup
    cluster, the member with the most tokens (tie -> min doc_id)."""
    return (
        f"{_minhash_cluster_ctes(table, threshold, n_perms, n_bands)}, "
        "q AS (SELECT doc_id, CAST(len(regexp_extract_all("
        "lower(coalesce(text,'')), '[0-9a-z]+')) AS BIGINT) AS n_tokens "
        f"FROM {table}), "
        "ranked AS (SELECT c.doc_id, c.cluster_id, c.cluster_size, "
        "q.n_tokens, row_number() OVER (PARTITION BY c.cluster_id "
        "ORDER BY q.n_tokens DESC, c.doc_id ASC) AS rn "
        "FROM compsz c JOIN q USING (doc_id)) "
        "SELECT doc_id, cluster_id, cluster_size, n_tokens "
        "FROM ranked WHERE rn = 1"
    )


def fused_dedup_docs_sql(table: str = "documents", threshold: float = 0.8,
                         simhash_distance: int = 3, n_perms: int = 128,
                         n_bands: int = 16) -> str:
    """(doc_id, cluster_rep, keep, ev_exact, ev_minhash, ev_simhash) —
    engine parity for pipelines.dedup_text.fused_dedup_docs: the three
    evidence tiers re-derived independently (text equality with NULL ==
    empty; the HUGEINT minhash pair chain; the simhash value chain +
    bit_count), unioned, closed transitively over doc ids, with
    per-cluster tier-provenance flags (tier fired iff some tier edge is
    internal to the cluster)."""
    return (
        "WITH RECURSIVE "
        f"d1 AS (SELECT doc_id, coalesce(text, '') AS text FROM {table}), "
        "e_ex AS (SELECT a.doc_id AS sa, b.doc_id AS sb FROM d1 a "
        "JOIN d1 b ON a.text = b.text AND a.doc_id < b.doc_id), "
        f"shv AS (SELECT doc_id, simhash FROM ({simhash_docs_sql(table)})), "
        "e_sh AS (SELECT a.doc_id AS sa, b.doc_id AS sb FROM shv a "
        "JOIN shv b ON a.doc_id < b.doc_id "
        f"AND bit_count(xor(a.simhash, b.simhash)) <= {simhash_distance}), "
        "e_mh AS (SELECT doc_a AS sa, doc_b AS sb FROM "
        f"({minhash_neardup_sql(table, threshold, n_perms, n_bands)})), "
        "eu AS (SELECT sa, sb FROM e_ex UNION SELECT sa, sb FROM e_sh "
        "UNION SELECT sa, sb FROM e_mh), "
        "esym AS (SELECT sa, sb FROM eu "
        "UNION SELECT sb AS sa, sa AS sb FROM eu), "
        f"nodes AS (SELECT doc_id AS sig FROM {table}), "
        "reach(src, dst) AS (SELECT sig, sig FROM nodes UNION "
        "SELECT r.src, e.sb FROM reach r JOIN esym e ON e.sa = r.dst), "
        "comp AS (SELECT src AS sig, min(dst) AS label "
        "FROM reach GROUP BY src), "
        "lab AS (SELECT sig AS doc_id, label FROM comp), "
        "evx AS (SELECT DISTINCT l.label FROM e_ex e "
        "JOIN lab l ON l.doc_id = e.sa), "
        "evm AS (SELECT DISTINCT l.label FROM e_mh e "
        "JOIN lab l ON l.doc_id = e.sa), "
        "evs AS (SELECT DISTINCT l.label FROM e_sh e "
        "JOIN lab l ON l.doc_id = e.sa) "
        "SELECT doc_id, "
        "min(doc_id) OVER (PARTITION BY label) AS cluster_rep, "
        "doc_id = min(doc_id) OVER (PARTITION BY label) AS \"keep\", "
        "label IN (SELECT label FROM evx) AS ev_exact, "
        "label IN (SELECT label FROM evm) AS ev_minhash, "
        "label IN (SELECT label FROM evs) AS ev_simhash "
        "FROM lab"
    )


def tiered_dedup_report_sql(
    table: str = "documents",
    threshold: float = 0.8,
    n_perms: int = 128,
    n_bands: int = 16,
) -> str:
    """(tier, name, survivors, removed) — engine parity for
    pipelines.dedup_text.tiered_dedup_report: the tier-dedup funnel.
    Tier 0 = raw rows; tier 1 = exact dedup (one MIN(doc_id) rep per
    byte-identical text, NULL text one group — GROUP BY semantics on
    both sides); tier 2 = MinHash-LSH fuzzy dedup among the exact
    survivors (the proven cluster CTE chain pointed at the survivor
    CTE via ``pre``)."""
    pre = (
        f"survt AS (SELECT MIN(doc_id) AS doc_id, text FROM {table} "
        "GROUP BY text), "
    )
    return (
        f"{_minhash_cluster_ctes('survt', threshold, n_perms, n_bands, pre=pre)}, "
        f"tot AS (SELECT COUNT(*) AS n FROM {table}), "
        "exn AS (SELECT COUNT(*) AS n FROM survt), "
        "mhn AS (SELECT COUNT(DISTINCT cluster_id) AS n FROM compsz) "
        "SELECT CAST(0 AS BIGINT) AS tier, 'total' AS name, "
        "CAST(t.n AS BIGINT) AS survivors, CAST(0 AS BIGINT) AS removed "
        "FROM tot t "
        "UNION ALL SELECT 1, 'exact', CAST(e.n AS BIGINT), "
        "CAST(t.n - e.n AS BIGINT) FROM tot t, exn e "
        "UNION ALL SELECT 2, 'minhash', CAST(m.n AS BIGINT), "
        "CAST(e.n - m.n AS BIGINT) FROM exn e, mhn m"
    )


def decontaminate_sql(
    table: str = "documents",
    bench_mod: int = 20,
    frac_threshold: float = 0.2,
) -> str:
    """(doc_id, n_shingles, n_overlap, overlap_frac, contaminated) —
    engine parity for pipelines.dedup_text.decontaminate: distinct
    k=3-shingle overlap of each training doc (doc_id % bench_mod != 0)
    against the union of benchmark-doc shingles, contamination flagged
    on the UNROUNDED fraction (round only the emitted column)."""
    return (
        f"WITH {_shingle3_ctes(table)}, "
        "shu AS (SELECT DISTINCT doc_id, fp FROM shfin), "
        f"bsh AS (SELECT DISTINCT fp FROM shu WHERE doc_id % {bench_mod} = 0), "
        "cnt AS (SELECT s.doc_id, COUNT(*) AS n_shingles, "
        "SUM(CASE WHEN b.fp IS NOT NULL THEN 1 ELSE 0 END) AS n_overlap "
        f"FROM shu s LEFT JOIN bsh b ON b.fp = s.fp "
        f"WHERE s.doc_id % {bench_mod} != 0 GROUP BY s.doc_id) "
        "SELECT d.doc_id, "
        "CAST(coalesce(c.n_shingles, 0) AS BIGINT) AS n_shingles, "
        "CAST(coalesce(c.n_overlap, 0) AS BIGINT) AS n_overlap, "
        "round(CASE WHEN coalesce(c.n_shingles, 0) > 0 THEN "
        "CAST(c.n_overlap AS DOUBLE) / c.n_shingles ELSE 0 END, 6) "
        "AS overlap_frac, "
        "CAST(CASE WHEN (CASE WHEN coalesce(c.n_shingles, 0) > 0 THEN "
        "CAST(c.n_overlap AS DOUBLE) / c.n_shingles ELSE 0 END) "
        f">= {frac_threshold} THEN 1 ELSE 0 END AS BIGINT) AS contaminated "
        f"FROM {table} d LEFT JOIN cnt c USING (doc_id) "
        f"WHERE d.doc_id % {bench_mod} != 0"
    )


def curate_docs_sql(
    table: str = "documents",
    min_tokens: int = 30,
    min_alpha: float = 0.8,
    bench_mod: int = 20,
    contam_frac: float = 0.2,
    threshold: float = 0.8,
    n_perms: int = 128,
    n_bands: int = 16,
) -> str:
    """(doc_id, cluster_size) — engine parity for pipelines.dedup_text
    .curate_docs: quality gates (unrounded token count + alpha ratio) +
    benchmark exclusion + contamination gate, then MinHash-LSH fuzzy
    dedup among the SURVIVORS (shingle rows reused from the full-table
    CTEs, filtered to survivors) with a recursive-closure CC; one
    min-id representative per cluster."""
    r = n_perms // n_bands
    alpha_expr = (
        "(CASE WHEN length(coalesce(d.text, '')) > 0 THEN "
        "CAST(length(regexp_replace(lower(coalesce(d.text, '')), "
        "'[^a-z]', '', 'g')) AS DOUBLE) / length(coalesce(d.text, '')) "
        "ELSE 0 END)"
    )
    frac_expr = (
        "(CASE WHEN coalesce(c.n_shingles, 0) > 0 THEN "
        "CAST(c.n_overlap AS DOUBLE) / c.n_shingles ELSE 0 END)"
    )
    return (
        f"WITH RECURSIVE {_shingle3_ctes(table)}, "
        "shu AS (SELECT DISTINCT doc_id, fp FROM shfin), "
        f"bsh AS (SELECT DISTINCT fp FROM shu WHERE doc_id % {bench_mod} = 0), "
        "cnt AS (SELECT s.doc_id, COUNT(*) AS n_shingles, "
        "SUM(CASE WHEN b.fp IS NOT NULL THEN 1 ELSE 0 END) AS n_overlap "
        f"FROM shu s LEFT JOIN bsh b ON b.fp = s.fp "
        f"WHERE s.doc_id % {bench_mod} != 0 GROUP BY s.doc_id), "
        f"surv AS (SELECT d.doc_id FROM {table} d "
        "LEFT JOIN cnt c USING (doc_id) "
        f"WHERE d.doc_id % {bench_mod} != 0 "
        "AND len(regexp_extract_all(lower(coalesce(d.text, '')), "
        f"'[0-9a-z]+')) >= {min_tokens} "
        f"AND {alpha_expr} >= {min_alpha} "
        f"AND {frac_expr} < {contam_frac}), "
        f"perms(pid, pa, pb) AS (VALUES {_minhash_perm_values(n_perms)}), "
        "mh0 AS (SELECT f.doc_id, pid, "
        f"MIN((f.fp * pa + pb) % {TWO64}) AS v "
        "FROM shfin f JOIN surv USING (doc_id), perms "
        "GROUP BY f.doc_id, pid), "
        f"mh AS (SELECT s.doc_id, p.pid, coalesce(m.v, {TWO64 - 1}) AS v "
        "FROM surv s CROSS JOIN perms p "
        "LEFT JOIN mh0 m ON m.doc_id = s.doc_id AND m.pid = p.pid), "
        "lane AS (SELECT a.doc_id AS da, b.doc_id AS db, "
        f"a.pid // {r} AS band, CASE WHEN a.v = b.v THEN 1 ELSE 0 END AS eq "
        "FROM mh a JOIN mh b ON a.pid = b.pid AND a.doc_id < b.doc_id), "
        "bnd AS (SELECT da, db, band, SUM(eq) AS ne FROM lane "
        "GROUP BY da, db, band), "
        "mhagg AS (SELECT da, db, SUM(ne) AS neq, "
        f"MAX(CASE WHEN ne = {r} THEN 1 ELSE 0 END) AS sb "
        "FROM bnd GROUP BY da, db), "
        "e AS (SELECT da, db FROM mhagg WHERE sb = 1 "
        f"AND CAST(neq AS DOUBLE) / {n_perms} >= {threshold}), "
        "ee AS (SELECT da AS a, db AS b FROM e "
        "UNION SELECT db AS a, da AS b FROM e), "
        "reach(src, dst) AS (SELECT doc_id, doc_id FROM surv UNION "
        "SELECT r.src, ee.b FROM reach r JOIN ee ON ee.a = r.dst), "
        "comp AS (SELECT src AS doc_id, MIN(dst) AS cluster_id "
        "FROM reach GROUP BY src), "
        "sz AS (SELECT cluster_id, COUNT(*) AS n FROM comp "
        "GROUP BY cluster_id) "
        "SELECT c.doc_id, CAST(s.n AS BIGINT) AS cluster_size "
        "FROM comp c JOIN sz s ON s.cluster_id = c.cluster_id "
        "WHERE c.doc_id = c.cluster_id"
    )


def repetition_stats_sql(table: str = "documents") -> str:
    """(doc_id, n_shingles_total, n_shingles_distinct, dup_frac) —
    engine parity for pipelines.textstats.repetition_stats: COUNT vs
    COUNT(DISTINCT) per doc over the k=3 shingle rows (one row per
    window occurrence), dup_frac = 1 - distinct/total rounded to 6."""
    return (
        f"WITH {_shingle3_ctes(table)}, "
        "agg AS (SELECT doc_id, COUNT(*) AS t, COUNT(DISTINCT fp) AS dct "
        "FROM shfin GROUP BY doc_id) "
        "SELECT d.doc_id, "
        "CAST(coalesce(a.t, 0) AS BIGINT) AS n_shingles_total, "
        "CAST(coalesce(a.dct, 0) AS BIGINT) AS n_shingles_distinct, "
        "round(CASE WHEN coalesce(a.t, 0) > 0 THEN "
        "1.0 - CAST(a.dct AS DOUBLE) / a.t ELSE 0 END, 6) AS dup_frac "
        f"FROM {table} d LEFT JOIN agg a USING (doc_id)"
    )


def hash_split_sql(
    table: str = "documents", val_pct: int = 10, n_buckets: int = 100
) -> str:
    """(doc_id, bucket, split) — engine parity for pipelines.sampling
    .hash_split: splitmix64(doc_id) % n_buckets in HUGEINT arithmetic."""
    return (
        f"WITH sm AS (SELECT doc_id, "
        f"{_sm64_cols('CAST(doc_id AS HUGEINT)', 'z')} FROM {table}) "
        f"SELECT doc_id, CAST(z % {n_buckets} AS BIGINT) AS bucket, "
        f"CASE WHEN z % {n_buckets} < {val_pct} THEN 'val' ELSE 'train' END "
        "AS split FROM sm"
    )


def hash_sample_sql(
    table: str = "documents", pct: int = 10, n_buckets: int = 100
) -> str:
    """Full rows of the deterministic pct% sample — engine parity for
    pipelines.sampling.hash_sample."""
    return (
        f"WITH sm AS (SELECT doc_id, "
        f"{_sm64_cols('CAST(doc_id AS HUGEINT)', 'z')} FROM {table}) "
        f"SELECT d.* FROM {table} d JOIN sm USING (doc_id) "
        f"WHERE z % {n_buckets} < {pct}"
    )


def shuffle_rank_sql(table: str = "documents") -> str:
    """(doc_id, rank) — engine parity for pipelines.shards
    .global_shuffle: 1-based row_number over ascending
    (splitmix64(doc_id), doc_id)."""
    return (
        f"WITH sm AS (SELECT doc_id, "
        f"{_sm64_cols('CAST(doc_id AS HUGEINT)', 'z')} FROM {table}) "
        "SELECT doc_id, CAST(row_number() OVER (ORDER BY z, doc_id) "
        'AS BIGINT) AS "rank" FROM sm'
    )


def fingerprint_docs_sql(table: str = "documents") -> str:
    """(doc_id, fingerprint) — engine parity for pipelines.textstats
    .fingerprints: splitmix64(sum(h_j * B^(n-1-j)) mod 2^64) over the
    token-hash sequence; zero-token docs -> 0."""
    return (
        f"WITH {_token_hash_ctes(table)}, "
        f"fraw AS (SELECT doc_id, {_horner_fold('list(h ORDER BY pos)')} AS fr "
        "FROM th GROUP BY doc_id), "
        f"ffin AS (SELECT doc_id, {_sm64_cols('fr', 'f')} FROM fraw) "
        f"SELECT d.doc_id, {_to_int64('x.f')} AS fingerprint "
        f"FROM {table} d LEFT JOIN ffin x USING (doc_id)"
    )


def stratified_sample_sql(table: str = "documents", k: int = 20) -> str:
    """(lang, doc_id) — engine parity for pipelines.sampling
    .stratified_sample: per-lang bottom-k by (splitmix64(doc_id),
    doc_id)."""
    return (
        f"WITH sm AS (SELECT doc_id, lang, "
        f"{_sm64_cols('CAST(doc_id AS HUGEINT)', 'z')} FROM {table}), "
        "r AS (SELECT lang, doc_id, "
        "row_number() OVER (PARTITION BY lang ORDER BY z, doc_id) AS rn "
        "FROM sm) "
        f"SELECT lang, doc_id FROM r WHERE rn <= {k}"
    )


def mixture_rebalance_sql(
    table: str = "documents", n_buckets: int = 1000
) -> str:
    """(doc_id, lang) — engine parity for pipelines.sampling
    .mixture_rebalance: keep iff splitmix64(doc_id) % n_buckets <
    (min_count * n_buckets) // count_lang."""
    return (
        f"WITH c AS (SELECT lang, count(*) AS cnt FROM {table} "
        "GROUP BY lang), "
        "m AS (SELECT min(cnt) AS mn FROM c), "
        f"sm AS (SELECT doc_id, lang, "
        f"{_sm64_cols('CAST(doc_id AS HUGEINT)', 'z')} FROM {table}) "
        "SELECT sm.doc_id, sm.lang FROM sm JOIN c USING (lang), m "
        f"WHERE z % {n_buckets} < (m.mn * {n_buckets}) // c.cnt"
    )


def hll_distinct_users_sql(table: str = "events", p: int = 12) -> str:
    """DuckDB oracle for ``events.distinct_users_approx``: the FULL
    HyperLogLog estimate re-derived in SQL — splitmix64(user_id) via
    the HUGEINT chain, register index/rank split, max-rank registers,
    the register sum as the EXACT integer sum(2^(64-reg)) (missing
    registers contribute 2^64), one double division, and the standard
    small-range correction. floor(log2) of a HUGEINT is double log2
    corrected by exact power-of-two comparisons (the cast to DOUBLE
    can land on the wrong side of a binade edge). Constants are
    e-notation so DuckDB arithmetic stays IEEE double, matching the
    engine op-for-op."""
    m = 1 << p
    two64 = 1 << 64
    u = (f"(CAST(user_id AS HUGEINT) + CASE WHEN user_id < 0 "
         f"THEN CAST('{two64}' AS HUGEINT) ELSE 0 END)")
    alpha = f"(0.7213e0 / (1 + 1.079e0 / {m}))"
    return (
        f"WITH du AS (SELECT DISTINCT event_type, user_id FROM {table}), "
        f"hh AS (SELECT event_type, {_sm64_cols(u, 'h')} FROM du), "
        f"rr AS (SELECT event_type, h // {1 << (64 - p)} AS idx, "
        f"(h * {1 << p}) % {two64} + {(1 << p) - 1} AS rest FROM hh), "
        f"pw AS (SELECT {_pow2_list()} AS p2), "
        # clamp to 63: the DOUBLE cast of rest in the top binade can
        # round UP to 2^64 making g=64, where both correction probes
        # index past the 64-entry pow2 list (NULL) and the register
        # silently drops from the sum; true floor(log2) is always <=63
        "g0 AS (SELECT event_type, idx, rest, "
        "LEAST(CAST(floor(log2(CAST(rest AS DOUBLE))) AS INT), 63) "
        "AS g FROM rr), "
        "fl AS (SELECT event_type, idx, CASE "
        "WHEN coalesce(rest >= p2[g + 2], false) THEN g + 1 "
        "WHEN rest < p2[g + 1] THEN g - 1 ELSE g END AS f "
        "FROM g0, pw), "
        "reg AS (SELECT event_type, idx, MAX(64 - f) AS r "
        "FROM fl GROUP BY 1, 2), "
        "s AS (SELECT event_type, SUM(p2[64 - r + 1]) AS present_sum, "
        "COUNT(*) AS present FROM reg, pw GROUP BY event_type), "
        f"e0 AS (SELECT event_type, present_sum + ({m} - present) * "
        f"CAST('{two64}' AS HUGEINT) AS sum_scaled, "
        f"{m} - present AS zeros FROM s), "
        f"e1 AS (SELECT event_type, {alpha} * {m} * {m} * "
        f"{float(two64)!r} / CAST(sum_scaled AS DOUBLE) AS e, zeros "
        "FROM e0) "
        f"SELECT event_type, CAST(floor(CASE WHEN e <= 2.5e0 * {m} "
        f"AND zeros > 0 THEN {m} * ln({m} / CAST(zeros AS DOUBLE)) "
        "ELSE e END + 0.5e0) AS BIGINT) AS approx_users FROM e1"
    )


def value_quantiles_sketch_sql(table: str = "events", k: int = 7) -> str:
    """DuckDB oracle for ``events.value_quantiles_sketch``: the whole
    HDR-histogram sketch re-derived in SQL. Every step is exact double
    arithmetic on both sides — binade exponent = corrected
    floor(log2(abs(x))) (exact power-of-two comparisons fix binade-edge
    rounding of the double cast), sub-bucket = floor((x/2^e - 1) * 2^k)
    (Sterbenz-exact subtraction, power-of-two scaling), bucket edge =
    (1 + sub/2^k) * 2^e — so engine and oracle agree bit-for-bit."""
    m = 1 << k
    base = 1 << 40
    return (
        f"WITH v AS (SELECT event_type, value AS x, abs(value) AS ax "
        f"FROM {table}), "
        "b0 AS (SELECT event_type, x, ax, "
        "CAST(floor(log2(ax)) AS INT) AS g FROM v WHERE x != 0), "
        "b1 AS (SELECT event_type, x, ax, g + CASE "
        "WHEN ax < pow(2e0, g) THEN -1 "
        "WHEN ax >= pow(2e0, g + 1) THEN 1 ELSE 0 END AS e FROM b0), "
        f"b2 AS (SELECT event_type, x, e, "
        f"CAST(floor((ax / pow(2e0, e) - 1) * {m}) AS BIGINT) AS sub "
        "FROM b1), "
        f"cells AS (SELECT event_type, CASE WHEN x > 0 "
        f"THEN {base} + e * {m} + sub "
        f"ELSE -({base} + e * {m} + sub) END AS bid, "
        f"(CASE WHEN x > 0 THEN 1e0 ELSE -1e0 END) * "
        f"(1 + sub / {m}e0) * pow(2e0, e) AS lb FROM b2 "
        "UNION ALL SELECT event_type, 0 AS bid, 0e0 AS lb "
        "FROM v WHERE x = 0), "
        "hist AS (SELECT event_type, bid, min(lb) AS lb, "
        "CAST(count(*) AS BIGINT) AS n FROM cells GROUP BY 1, 2), "
        "c AS (SELECT event_type, bid, lb, "
        "SUM(n) OVER (PARTITION BY event_type ORDER BY bid) AS cum, "
        "SUM(n) OVER (PARTITION BY event_type) AS tot FROM hist), "
        "qq AS (SELECT unnest(CAST([0.5, 0.9, 0.99, 0.999] "
        "AS DOUBLE[])) AS q), "
        "sel AS (SELECT c.event_type, qq.q, min(c.bid) AS bid "
        "FROM c JOIN qq ON c.cum >= ceil(qq.q * c.tot) GROUP BY 1, 2) "
        "SELECT s.event_type, s.q, h.lb AS approx_value "
        "FROM sel s JOIN hist h USING (event_type, bid)"
    )


def corpus_checksum_sql(table: str = "documents") -> str:
    """(n_rows, checksum) — engine parity for
    pipelines.textstats.corpus_checksum: per-row
    splitmix64(texthash XOR splitmix64(doc_id)) summed mod 2^64,
    emitted as the int64 bit pattern. texthash folds the WHOLE
    coalesced-utf8 text with the polynomial byte hash
    (util.hash_bytes_segments), splitmix64-finalized."""
    byte_list = (
        "list_transform(range(1, CAST(octet_length(tb) + 1 AS BIGINT)), "
        "jj -> CAST(CAST('0x' || substr(hex(tb), "
        "CAST(2*jj-1 AS INTEGER), 2) AS UBIGINT) AS HUGEINT))"
    )
    return (
        f"WITH r0 AS (SELECT doc_id, encode(coalesce(text, '')) AS tb "
        f"FROM {table}), "
        f"braw AS (SELECT doc_id, {_horner_fold(byte_list)} AS hraw FROM r0), "
        f"th AS (SELECT doc_id, {_sm64_cols('hraw', 'h')} FROM braw), "
        "dh AS (SELECT h, "
        f"{_sm64_cols('CAST(doc_id AS HUGEINT)', 'd')} FROM th), "
        f"cmb AS (SELECT {_sm64_cols('xor(h, d)', 'c')} FROM dh) "
        "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
        f"{_to_int64(f'SUM(c) % {TWO64}')} AS checksum FROM cmb"
    )


def langid_score_sql(lang: str) -> str:
    """Weighted bigram-count score over a lowered-text alias ``t`` —
    the SQL twin of textstats.LangId's per-language score. Every
    profile bigram has two distinct characters, so replace()-based
    non-overlapping counts equal the scorer's position counts exactly.
    Shared by the langid_docs oracle and the caption variant."""
    from humid_ray.pipelines.textstats import _PROFILES

    bgs = _PROFILES[lang]
    return " + ".join(
        f"{len(bgs) - i}*((length(t) - length(replace(t, '{bg}', ''))) / 2)"
        for i, bg in enumerate(bgs)
    )


def langid_pred_case_sql() -> str:
    """CASE expression mapping (s_en, s_de, s_fr, s_es) to lang_pred —
    textstats.LangId's first-max tie rule (profile order) with the
    score<=0 'und' gate."""
    return (
        "CASE WHEN greatest(s_en, s_de, s_fr, s_es) <= 0 THEN 'und' "
        "WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en' "
        "WHEN s_de >= s_fr AND s_de >= s_es THEN 'de' "
        "WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END"
    )
