"""Empty-input hardening: every table-backed driver query must run on
an EMPTY sf dir without crashing (the failure class behind two
round-2 ADVICE findings: kernels indexing into empty batches and
driver-side np.stack on empty take_all results)."""

import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")

# corpus-backed queries read the synthetic image corpus path baked to
# sf0.01 — they are exercised by the e2e suite, not this fixture
CORPUS_QUERIES_PREFIXES = (
    "humid_", "multimodal_", "audio_", "video_", "image_", "curate_images",
    "caption_", "tiered_dedup_report_images", "top_dup_clusters",
    "incremental_image_dedup", "phash_distance_histogram",
    "dup_rate_by_format", "decontaminate_images", "phash_",
    "cluster_caption_consistency", "cluster_diameter_hist",
    "dedup_storage_savings", "aspect_ratio_stats",
    "fused_dedup_images", "cluster_merge_profile",
    "cluster_safe_split", "dedup_sample_weights", "pack_shards_images",
    "lang_partitioned_image_dedup", "cluster_psnr_report",
    "pixel_exact_dedup", "cluster_caption_vote",
)

# scalar-summary queries legitimately emit ONE row of zero counts on
# an empty input (their SQL oracles do the same); the funnel and the
# tier-dedup report emit one zero row PER STEP/TIER (their oracles'
# count(*) CTEs do too)
SCALAR_SUMMARIES = {"dedup_stats_docs", "events_session_stats",
                    "corpus_drift_docs", "corpus_checksum_docs"}
EXPECTED_EMPTY_ROWS = {"events_funnel": 3, "tiered_dedup_report_docs": 3}


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
                "lang": pa.array([], type=pa.string()),
                "source": pa.array([], type=pa.string()),
                "n_chars": pa.array([], type=pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([], type=pa.int64()),
                "ts": pa.array([], type=pa.timestamp("us")),
                "user_id": pa.array([], type=pa.int64()),
                "event_type": pa.array([], type=pa.string()),
                "value": pa.array([], type=pa.float64()),
                "props": pa.array([], type=pa.string()),
            }
        ),
        d / "events.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([], type=pa.int64()),
                "embedding": pa.array([], type=pa.list_(pa.float32())),
                "label": pa.array([], type=pa.int32()),
            }
        ),
        d / "embeddings.parquet",
    )
    _write_relational_tables(d, rows=0)
    return str(d)


def _write_relational_tables(d, rows: int):
    """Empty or single-row TPC-H-ish fact/dimension tables for the
    relational queries (lineitem/orders/customer/nation/part)."""
    import datetime

    def arr(vals, typ):
        return pa.array(vals[:rows], type=typ)

    pq.write_table(
        pa.table(
            {
                "l_orderkey": arr([1], pa.int64()),
                "l_partkey": arr([5], pa.int64()),
                "l_suppkey": arr([2], pa.int64()),
                "l_linenumber": arr([1], pa.int32()),
                "l_quantity": arr([4.0], pa.float64()),
                "l_extendedprice": arr([1000.5], pa.float64()),
                "l_discount": arr([0.05], pa.float64()),
                "l_tax": arr([0.02], pa.float64()),
                "l_returnflag": arr(["N"], pa.string()),
                "l_linestatus": arr(["O"], pa.string()),
                "l_shipdate": arr(
                    [datetime.datetime(2026, 1, 2)], pa.timestamp("us")
                ),
            }
        ),
        d / "lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": arr([1], pa.int64()),
                "o_custkey": arr([9], pa.int64()),
                "o_orderstatus": arr(["O"], pa.string()),
                "o_totalprice": arr([1020.51], pa.float64()),
                "o_orderdate": arr(
                    [datetime.datetime(2026, 1, 1)], pa.timestamp("us")
                ),
                "o_orderpriority": arr(["1-URGENT"], pa.string()),
            }
        ),
        d / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": arr([9], pa.int64()),
                "c_name": arr(["cust9"], pa.string()),
                "c_nationkey": arr([3], pa.int64()),
                "c_acctbal": arr([10.0], pa.float64()),
                "c_mktsegment": arr(["BUILDING"], pa.string()),
            }
        ),
        d / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": arr([3], pa.int64()),
                "n_name": arr(["NATION_3"], pa.string()),
                "n_regionkey": arr([0], pa.int64()),
            }
        ),
        d / "nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": arr([5], pa.int64()),
                "p_name": arr(["blue rod"], pa.string()),
                "p_brand": arr(["B1"], pa.string()),
                "p_type": arr(["rod"], pa.string()),
                "p_size": arr([3], pa.int64()),
                "p_retailprice": arr([99.99], pa.float64()),
            }
        ),
        d / "part.parquet",
    )


def test_every_table_query_survives_empty_input(ray_session, empty_sf):
    import __ray_entry__ as e

    failures = []
    for name, fn in e.queries().items():
        if name.startswith(CORPUS_QUERIES_PREFIXES):
            continue
        try:
            res = fn(empty_sf)
            n = res.count() if hasattr(res, "count") else len(res)
            expect = (1 if name in SCALAR_SUMMARIES
                      else EXPECTED_EMPTY_ROWS.get(name, 0))
            assert n == expect, f"{name}: {n} rows from empty input"
        except AssertionError:
            raise
        except Exception as ex:  # noqa: BLE001 — collecting all failures
            failures.append(f"{name}: {type(ex).__name__}: {ex}")
    assert not failures, "\n".join(failures)


@pytest.fixture(scope="module")
def tiny_sf(tmp_path_factory):
    """One-row tables: segment/offset kernels are most off-by-one-prone
    at n=1 (no pairs, no windows, single groups)."""
    import datetime

    d = tmp_path_factory.mktemp("tiny_sf")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([7], type=pa.int64()),
                "text": pa.array(["one tiny document"]),
                "lang": pa.array(["en"]),
                "source": pa.array(["s0"]),
                "n_chars": pa.array([17], type=pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1], type=pa.int64()),
                "ts": pa.array(
                    [datetime.datetime(2026, 1, 1)], type=pa.timestamp("us")
                ),
                "user_id": pa.array([3], type=pa.int64()),
                "event_type": pa.array(["click"]),
                "value": pa.array([1.5], type=pa.float64()),
                "props": pa.array(["{}"]),
            }
        ),
        d / "events.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0], type=pa.int64()),
                "embedding": pa.array([[0.1, 0.2, 0.3, 0.4]],
                                      type=pa.list_(pa.float32())),
                "label": pa.array([1], type=pa.int32()),
            }
        ),
        d / "embeddings.parquet",
    )
    _write_relational_tables(d, rows=1)
    return str(d)


def test_every_table_query_survives_single_row(ray_session, tiny_sf):
    import __ray_entry__ as e

    failures = []
    for name, fn in e.queries().items():
        if name.startswith(CORPUS_QUERIES_PREFIXES):
            continue
        try:
            res = fn(tiny_sf)
            n = res.count() if hasattr(res, "count") else len(res)
            assert n >= 0
        except AssertionError:
            raise
        except Exception as ex:  # noqa: BLE001
            failures.append(f"{name}: {type(ex).__name__}: {ex}")
    assert not failures, "\n".join(failures)
