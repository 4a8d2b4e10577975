"""-e mode (MinHash-Jaccard neighbor path) end-to-end."""

import os

import numpy as np
import pyarrow.parquet as pq

from humid_ray.config import HumidConfig
from humid_ray.pipelines.humid import HumidPipeline

U = np.uint64


def test_minhash_mode_pipeline(ray_session, corpus_dir, workdir):
    cfg = HumidConfig(
        workdir=workdir, distance="minhash-jaccard", jaccard_threshold=0.8,
        resume=False, write_annotated=False,
    )
    res = HumidPipeline(cfg).run(corpus_dir)
    assert res.metrics["clusters"] > 0

    # oracle: brute-force EXACT shingle-set jaccard over the per-sig
    # representative rows (first occurrence per sig) — the default
    # minhash_verify="exact" pins edges to true Jaccard, not the sketch
    sig = pq.read_table(os.path.join(workdir, "01_signatures")).to_pandas()
    us = sig[~sig.filtered].copy()
    us["sh"] = us.shingles.apply(lambda v: frozenset(np.asarray(v, dtype=np.int64).tolist()))
    firsts = (
        us.sort_values("image_id").groupby("sig", as_index=False).first()
    )
    sigs = firsts.sig.to_numpy().view(U)
    sets = list(firsts.sh)
    truth = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            union = len(sets[i] | sets[j])
            if union and len(sets[i] & sets[j]) / union >= cfg.jaccard_threshold:
                a, b = sorted((int(sigs[i]), int(sigs[j])))
                truth.add((a, b))

    edges = pq.read_table(os.path.join(workdir, "03_edges")).to_pandas()
    found = set(
        zip(edges.sig_a.to_numpy().view(U).tolist(),
            edges.sig_b.to_numpy().view(U).tolist())
    )
    # exact verification guarantees zero false positives vs true
    # Jaccard; banding + estimator prefilter are probabilistic but
    # planted dups are identical captions (J == 1.0) so recall must
    # round to 1 on this corpus
    assert found <= truth
    missed = truth - found
    assert len(missed) / max(len(truth), 1) <= 0.01


def _shingle_tools(perms: int, k: int = 2):
    from humid_ray.functions.minhash import minhash_batch
    from humid_ray.functions.simhash import shingle_hashes
    from humid_ray.functions.text import tokenize_batch
    import pyarrow as pa

    def analyze(captions):
        th, offs = tokenize_batch(pa.array(captions, type=pa.string()))
        sh, soffs = shingle_hashes(th, offs, k)
        mh = minhash_batch(sh, soffs, perms)
        sets = [frozenset(sh[soffs[i]:soffs[i + 1]].tolist())
                for i in range(len(captions))]
        return mh, sets

    return analyze


def test_exact_verify_rejects_estimator_false_positive(ray_session, tmp_path):
    """A pair whose MINHASH ESTIMATE clears the threshold but whose TRUE
    shingle Jaccard does not: estimate-only verification admits the
    edge; exact verification (the default) rejects it. Reference
    behavior being matched: HUMID -e verifies real distances in the
    trie walk (src/humid.cc:140-158), never a sketch."""
    import pyarrow as pa
    import pyarrow.parquet as pq_w
    from humid_ray.synth import SCHEMA

    perms, threshold = 8, 0.8
    analyze = _shingle_tools(perms)
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    words = ["kilo", "lima", "mike", "november", "oscar", "papa", "quebec",
             "romeo", "sierra", "tango", "uniform", "victor", "whiskey"]
    # search deterministic variants for an estimator false positive:
    # with 8 perms, est >= 0.8 needs >= 7 matching perms — likely by
    # chance somewhere among many true-Jaccard ~0.5-0.7 pairs
    cands = [base]
    toks = base.split()
    for i, w1 in enumerate(words):
        for w2 in words:
            cands.append(" ".join(toks[:-2] + [w1, w2]))
        for pos in range(3, 8):
            cands.append(" ".join(toks[:pos] + [w1] + toks[pos + 1:]))
    mh, sets = analyze(cands)
    est = (mh[0] == mh[1:]).mean(axis=1)
    fp_idx = None
    for i in np.argsort(-est):
        union = len(sets[0] | sets[i + 1])
        jac = len(sets[0] & sets[i + 1]) / union
        if est[i] >= threshold and jac < threshold - 0.05:
            fp_idx = i + 1
            break
    assert fp_idx is not None, "no estimator false positive in candidate pool"

    # corpus: the FP pair + an identical-caption true dup + filler
    captions = [base, cands[fp_idx], "zulu yankee xray " * 3, "zulu yankee xray " * 3,
                "one two three four five", "six seven eight nine ten"]
    rows = [
        {"image_id": f"img{i:03d}", "bytes": b"", "w": 8, "h": 8,
         "fmt": "png", "caption": c, "phash": (i + 1) * 0x1111_2222_3333}
        for i, c in enumerate(captions)
    ]
    # rows 2/3: identical caption (true Jaccard 1.0) but different
    # phash, so their composite sigs differ -> a genuine near-dup edge
    corpus = tmp_path / "fpcorpus"
    corpus.mkdir()
    pq_w.write_table(pa.Table.from_pylist(rows, schema=SCHEMA),
                     str(corpus / "part0.parquet"))

    def edge_ids(verify):
        wd = tmp_path / f"run_{verify}"
        cfg = HumidConfig(
            workdir=str(wd), distance="minhash-jaccard",
            jaccard_threshold=threshold, minhash_perms=perms,
            minhash_bands=2, minhash_verify=verify, resume=False,
            write_annotated=False, write_stats=False,
        )
        HumidPipeline(cfg).run(str(corpus))
        sig = pq.read_table(str(wd / "01_signatures")).to_pandas()
        by_sig = sig.set_index(sig.sig.to_numpy().view(U))["image_id"].to_dict()
        edges = pq.read_table(str(wd / "03_edges")).to_pandas()
        return {
            tuple(sorted((by_sig[int(a)], by_sig[int(b)])))
            for a, b in zip(edges.sig_a.to_numpy().view(U).tolist(),
                            edges.sig_b.to_numpy().view(U).tolist())
        }

    est_edges = edge_ids("estimate")
    exact_edges = edge_ids("exact")
    fp_pair = ("img000", "img001")
    true_pair = ("img002", "img003")
    assert fp_pair in est_edges, "estimate mode should admit the sketch collision"
    assert fp_pair not in exact_edges, "exact verify must reject it"
    assert true_pair in est_edges and true_pair in exact_edges


def test_edit_verify_mode(ray_session, tmp_path):
    """minhash_verify='edit': banded candidates verified with TRUE
    Levenshtein <= max_distance on representative captions (HUMID -e
    parity for the variable-length payload). Accepted edges are exact:
    a distance-2 pair with high Jaccard must be rejected at m=1."""
    import pyarrow as pa
    import pyarrow.parquet as pq_w
    from humid_ray.synth import SCHEMA

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    captions = [
        base,                       # 0
        base[:-1] + "s",            # 1: distance 1 from 0 -> edge at m=1
        base.replace("river", "rIXer"),  # 2: distance 2 from 0 -> NO edge at m=1
        "completely different text about mountains and snow",  # 3
        "completely different text about mountains and snow",  # 4: identical to 3
    ]
    rows = [
        {"image_id": f"img{i:03d}", "bytes": b"", "w": 8, "h": 8,
         "fmt": "png", "caption": c, "phash": (i + 1) * 0x0101_0202_0303}
        for i, c in enumerate(captions)
    ]
    corpus = tmp_path / "editcorpus"
    corpus.mkdir()
    pq_w.write_table(pa.Table.from_pylist(rows, schema=SCHEMA),
                     str(corpus / "part0.parquet"))

    wd = tmp_path / "run_edit"
    cfg = HumidConfig(
        workdir=str(wd), distance="minhash-jaccard", minhash_verify="edit",
        max_distance=1, resume=False, write_annotated=False, write_stats=False,
    )
    HumidPipeline(cfg).run(str(corpus))
    sig = pq.read_table(str(wd / "01_signatures")).to_pandas()
    by_sig = sig.set_index(sig.sig.to_numpy().view(U))["image_id"].to_dict()
    edges = pq.read_table(str(wd / "03_edges")).to_pandas()
    found = {
        tuple(sorted((by_sig[int(a)], by_sig[int(b)])))
        for a, b in zip(edges.sig_a.to_numpy().view(U).tolist(),
                        edges.sig_b.to_numpy().view(U).tolist())
    }
    assert ("img000", "img001") in found          # distance 1
    assert ("img003", "img004") in found          # distance 0
    assert ("img000", "img002") not in found      # distance 2 > m
    # soundness: every found edge is within true edit distance m
    from humid_ray.functions.text import edit_distance_within

    caps = {r["image_id"]: r["caption"] for r in rows}
    for a, b in found:
        assert edit_distance_within(caps[a], caps[b], 1)


def test_edit_distance_within_fuzz():
    """Banded DP vs full Levenshtein DP on random short strings."""
    import random

    from humid_ray.functions.text import edit_distance_within

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            ndp = [i]
            for j, cb in enumerate(b, 1):
                ndp.append(min(dp[j] + 1, ndp[-1] + 1, dp[j - 1] + (ca != cb)))
            dp = ndp
        return dp[-1]

    rng = random.Random(1)
    for _ in range(800):
        a = "".join(rng.choice("abc") for _ in range(rng.randint(0, 9)))
        b = "".join(rng.choice("abc") for _ in range(rng.randint(0, 9)))
        for m in range(0, 3):
            assert edit_distance_within(a, b, m) == (lev(a, b) <= m), (a, b, m)


def test_minhash_distributed_semijoin_branch(ray_session, corpus_dir, tmp_path):
    """broadcast_max_rows=0 forces the Dataset.join semi-join path
    (the >5M-row scale branch); the edge set must equal the broadcast
    path's bit-for-bit."""
    def edges_of(bmr):
        wd = tmp_path / f"run_bmr{bmr}"
        cfg = HumidConfig(
            workdir=str(wd), distance="minhash-jaccard", resume=False,
            write_annotated=False, write_stats=False, write_filtered=False,
            broadcast_max_rows=bmr,
        )
        HumidPipeline(cfg).run(corpus_dir)
        e = pq.read_table(os.path.join(str(wd), "03_edges")).to_pandas()
        return set(zip(e.sig_a.to_numpy().view(U).tolist(),
                       e.sig_b.to_numpy().view(U).tolist()))

    assert edges_of(0) == edges_of(5_000_000)


def test_all_filtered_corpus(ray_session, tmp_path):
    """A corpus where every row is filtered (null phash) must produce
    empty outputs, not crash — the empty-band-batch guard e2e."""
    import pyarrow as pa
    import pyarrow.parquet as pq_w
    from humid_ray.synth import SCHEMA

    rows = [
        {"image_id": f"img{i:03d}", "bytes": b"", "w": 8, "h": 8,
         "fmt": "png", "caption": f"caption {i}", "phash": None}
        for i in range(6)
    ]
    corpus = tmp_path / "allfiltered"
    corpus.mkdir()
    pq_w.write_table(pa.Table.from_pylist(rows, schema=SCHEMA),
                     str(corpus / "part0.parquet"))
    for distance in ("hamming", "minhash-jaccard"):
        wd = tmp_path / f"run_{distance}"
        cfg = HumidConfig(workdir=str(wd), distance=distance, resume=False,
                          write_annotated=True, write_stats=True)
        res = HumidPipeline(cfg).run(str(corpus))
        assert res.metrics["usable"] == 0
        assert res.metrics["clusters"] == 0


def test_cli_smoke(ray_session, corpus_dir, tmp_path):
    from humid_ray.cli import main

    out = tmp_path / "cliout"
    rc = main([corpus_dir, "-d", str(out), "-s", "-a", "--no-resume"])
    assert rc == 0
    assert (out / "05_stats" / "stats.dat").exists()
    assert (out / "05_annotated").exists()


def test_edit_verify_hot_bucket_clique(ray_session, tmp_path):
    """Many sigs sharing ONE caption funnel into one bucket: the
    verifier must dedupe DP work per unique caption and still emit the
    full clique of distance-0 edges."""
    import pyarrow as pa
    import pyarrow.parquet as pq_w
    from humid_ray.synth import SCHEMA

    n = 24
    rows = [
        # phash must differ in the TOP 32 bits (the signature keeps the
        # phash MSBs), else the sigs collapse in exact dedup
        {"image_id": f"img{i:03d}", "bytes": b"", "w": 8, "h": 8,
         "fmt": "png", "caption": "the same caption shared by every row here",
         "phash": (i + 1) << 40}
        for i in range(n)
    ]
    corpus = tmp_path / "hotcorpus"
    corpus.mkdir()
    pq_w.write_table(pa.Table.from_pylist(rows, schema=SCHEMA),
                     str(corpus / "part0.parquet"))
    wd = tmp_path / "run_hot"
    cfg = HumidConfig(workdir=str(wd), distance="minhash-jaccard",
                      minhash_verify="edit", max_distance=1, resume=False,
                      clustering="maximum",  # directional never merges equal counts
                      write_annotated=False, write_stats=False)
    res = HumidPipeline(cfg).run(str(corpus))
    edges = pq.read_table(os.path.join(str(wd), "03_edges"))
    assert edges.num_rows == n * (n - 1) // 2   # full clique, once each
    assign = pq.read_table(os.path.join(str(wd), "04_assign")).to_pandas()
    assert assign.cluster_seed.nunique() == 1   # one cluster


def test_ngram_exact_no_candidates(ray_session, tmp_path, monkeypatch):
    """All-distinct documents: the exact n-gram query returns a TYPED
    empty result (schema preserved through the empty aggregate)."""
    import pyarrow as pa
    import pyarrow.parquet as pq_w
    from humid_ray.pipelines import dedup_text

    docs = pa.table({
        "doc_id": pa.array(range(6), type=pa.int64()),
        "text": pa.array([f"totally unique words {i} alpha{i} beta{i} gamma{i}"
                          for i in range(6)]),
    })
    d = tmp_path / "distinct"
    d.mkdir()
    pq_w.write_table(docs, str(d / "documents.parquet"))
    out = dedup_text.ngram_jaccard_exact(str(d))
    t = out if isinstance(out, pa.Table) else out.to_pandas()
    cols = list(t.column_names) if isinstance(t, pa.Table) else list(t.columns)
    assert sorted(cols) == ["doc_a", "doc_b", "ngram_jaccard"]
    assert (t.num_rows if isinstance(t, pa.Table) else len(t)) == 0


def test_edit_mode_short_caption_exhaustive_fallback(ray_session, tmp_path):
    """Adversarial edit-mode recall: planted <=m-edit pairs with ZERO
    shingle overlap (short captions — m edits destroy every shingle).
    Banding alone can never surface them; the SHORT_BAND length-bucket
    fallback must find them ALL, exactly once, and stay sound
    (reference parity: trie.asymmetricLevenshtein enumerates every
    pair within m, src/humid.cc:146-147)."""
    import pyarrow as pa
    import pyarrow.parquet as pq_w
    from humid_ray.synth import SCHEMA

    captions = [
        "ab cd",   # 0: 1 shingle
        "ab ce",   # 1: distance 1 from 0, ZERO shingle overlap -> edge
        "pq rs",   # 2: far from everything
        "zz yy",   # 3,4,5: identical short caption -> 3-clique,
        "zz yy",   #        each edge emitted exactly once
        "zz yy",
        "mm nn",   # 6: distance 2 from 7 -> NO edge at m=1
        "mm pp",   # 7
    ]
    rows = [
        {"image_id": f"img{i:03d}", "bytes": b"", "w": 8, "h": 8,
         "fmt": "png", "caption": c, "phash": (i + 1) << 40}
        for i, c in enumerate(captions)
    ]
    corpus = tmp_path / "shortcorpus"
    corpus.mkdir()
    pq_w.write_table(pa.Table.from_pylist(rows, schema=SCHEMA),
                     str(corpus / "part0.parquet"))
    wd = tmp_path / "run_short"
    cfg = HumidConfig(workdir=str(wd), distance="minhash-jaccard",
                      minhash_verify="edit", max_distance=1, resume=False,
                      clustering="maximum",
                      write_annotated=False, write_stats=False)
    HumidPipeline(cfg).run(str(corpus))
    sig = pq.read_table(os.path.join(str(wd), "01_signatures")).to_pandas()
    by_sig = sig.set_index(sig.sig.to_numpy().view(U))["image_id"].to_dict()
    edges = pq.read_table(os.path.join(str(wd), "03_edges")).to_pandas()
    pairs = [
        tuple(sorted((by_sig[int(a)], by_sig[int(b)])))
        for a, b in zip(edges.sig_a.to_numpy().view(U).tolist(),
                        edges.sig_b.to_numpy().view(U).tolist())
    ]
    expected = {
        ("img000", "img001"),
        ("img003", "img004"), ("img003", "img005"), ("img004", "img005"),
    }
    assert set(pairs) == expected      # full adversarial recall + soundness
    assert len(pairs) == len(expected)  # exactly once each (q-rule dedupe)


def test_short_fallback_salted_blocks(ray_session, tmp_path):
    """A single length class of many short captions must spread across
    salted SHORT_BAND block buckets (one bare q bucket = one unbounded
    corpus-wide verify task) while keeping exhaustive exactly-once
    recall vs a brute-force edit-distance oracle."""
    import string

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq_w

    from humid_ray.functions.text import edit_distance_within
    from humid_ray.stages.lsh import SHORT_BAND, expand_minhash_bands
    from humid_ray.synth import SCHEMA

    rng = np.random.default_rng(7)
    letters = np.array(list(string.ascii_lowercase))
    caps = set()
    while len(caps) < 60:  # distinct 5-char "xy zw" captions, one class
        caps.add("".join(rng.choice(letters, 2)) + " "
                 + "".join(rng.choice(letters, 2)))
    captions = sorted(caps) + ["qq ww"] * 3  # plus an identical clique

    cfg = HumidConfig(workdir="/tmp/unused", distance="minhash-jaccard",
                      minhash_verify="edit", max_distance=1)
    n, P = len(captions), cfg.minhash_perms
    batch = pa.table({
        "sig": pa.array([(i + 1) << 40 for i in range(n)], type=pa.int64()),
        "minhash": pa.FixedSizeListArray.from_arrays(
            pa.array(rng.integers(0, 1 << 50, n * P), type=pa.int64()), P),
        "caption": pa.array(captions, type=pa.string()),
    })
    expanded = expand_minhash_bands(cfg)(batch)
    skeys = expanded.filter(
        pc.equal(expanded.column("band_id"), SHORT_BAND)
    ).column("band_key").to_pandas()
    # old behavior: exactly 2 keys (q, q+1); salted: many block buckets,
    # none holding more than ~2/S of the class (+ the q/q+1 double)
    assert skeys.nunique() > 2
    assert skeys.value_counts().max() < n

    # full-pipeline exhaustiveness: every <=1-edit pair exactly once
    rows = [
        {"image_id": f"img{i:03d}", "bytes": b"", "w": 8, "h": 8,
         "fmt": "png", "caption": c, "phash": (i + 1) << 40}
        for i, c in enumerate(captions)
    ]
    corpus = tmp_path / "saltcorpus"
    corpus.mkdir()
    pq_w.write_table(pa.Table.from_pylist(rows, schema=SCHEMA),
                     str(corpus / "part0.parquet"))
    wd = tmp_path / "run_salt"
    cfg2 = HumidConfig(workdir=str(wd), distance="minhash-jaccard",
                       minhash_verify="edit", max_distance=1, resume=False,
                       clustering="maximum",
                       write_annotated=False, write_stats=False)
    HumidPipeline(cfg2).run(str(corpus))
    sig = pq.read_table(os.path.join(str(wd), "01_signatures")).to_pandas()
    by_sig = sig.set_index(sig.sig.to_numpy().view(U))["image_id"].to_dict()
    edges = pq.read_table(os.path.join(str(wd), "03_edges")).to_pandas()
    got = [tuple(sorted((by_sig[int(a)], by_sig[int(b)])))
           for a, b in zip(edges.sig_a.to_numpy().view(U).tolist(),
                           edges.sig_b.to_numpy().view(U).tolist())]
    expected = {
        (f"img{i:03d}", f"img{j:03d}")
        for i in range(n) for j in range(i + 1, n)
        if edit_distance_within(captions[i], captions[j], 1)
    }
    assert set(got) == expected
    assert len(got) == len(expected)
