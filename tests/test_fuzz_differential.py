"""Randomized differential fuzz (VERDICT r10 task 7).

The oracle fixtures are frozen, so dialect seams that depend on data
values (CAST truncation boundaries, NaN sentinels, tie-breaks that
only fire on particular duplicates) can hide behind them. This opt-in
sweep regenerates ALL ten synthetic tables with a CLI-passed seed —
same schemas and key relationships as the driver fixture, freshly
random values — and re-runs a 25-query sample differentially against
DuckDB on the new data:

    SPARK_GRAFT_FUZZ_SEED=7 python -m pytest tests/test_fuzz_differential.py

Run on ≥3 seeds per round (CI note in SCALE.md). Deterministic per
seed: query sample and every generated value derive from the seed.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from project_etl_spark.registry import load_all

SEED = os.environ.get("SPARK_GRAFT_FUZZ_SEED")

pytestmark = pytest.mark.skipif(
    SEED is None, reason="set SPARK_GRAFT_FUZZ_SEED=<int> to run")

N_SAMPLE = 25

#: the driver fixture's 31-word document vocabulary (sf0.1, seed=42) —
#: kept verbatim so tokenizer/shingle behavior matches the real corpus
VOCAB = [
    "a", "agg", "batch", "big", "column", "data", "fast", "filter",
    "group", "hash", "join", "key", "line", "merge", "order", "part",
    "plan", "query", "row", "scan", "shuffle", "slow", "small", "sort",
    "spark", "stage", "stream", "table", "task", "value", "window",
]

_DAY_US = 86_400_000_000


def _ts_array(us: np.ndarray) -> pa.Array:
    return pa.array(us.astype("int64"), type=pa.timestamp("us"))


def gen_tables(outdir: str, seed: int) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(outdir, exist_ok=True)

    def w(name: str, tbl: pa.Table) -> None:
        pq.write_table(tbl, os.path.join(outdir, f"{name}.parquet"))

    w("region", pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    w("nation", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
    }))
    n_cust, n_supp, n_part, n_ord, n_li, n_ev = 150, 10, 200, 1500, 6000, 1000
    w("customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": rng.choice(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
             "MACHINERY"], n_cust),
    }))
    w("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(
            rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": np.round(rng.uniform(0, 10000, n_supp), 2),
    }))
    adjs = ["cold", "small", "large", "blue", "red", "green", "hot"]
    nouns = ["widget", "bolt", "rod", "gear", "plate"]
    w("part", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": [f"{rng.choice(adjs)} {rng.choice(nouns)}"
                   for _ in range(n_part)],
        "p_brand": [f"Brand#{rng.integers(1, 26)}" for _ in range(n_part)],
        "p_type": rng.choice(["ECONOMY", "PROMO", "SMALL", "LARGE",
                              "STANDARD", "MEDIUM"], n_part),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": np.round(900.0 + np.arange(n_part) * 0.1, 2),
    }))
    epoch_1995 = int(np.datetime64("1995-01-01", "D")
                     .astype("int64")) * _DAY_US
    odate = epoch_1995 + rng.integers(0, 2400, n_ord) * _DAY_US
    w("orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord)),
        "o_orderstatus": rng.choice(["F", "O", "P"], n_ord,
                                    p=[0.49, 0.49, 0.02]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _ts_array(odate),
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW"], n_ord),
    }))
    okeys = np.sort(rng.integers(0, n_ord, n_li))
    lineno = np.ones(n_li, dtype=np.int32)
    for i in range(1, n_li):
        lineno[i] = lineno[i - 1] + 1 if okeys[i] == okeys[i - 1] else 1
    sdate = epoch_1995 + rng.integers(1, 2500, n_li) * _DAY_US
    w("lineitem", pa.table({
        "l_orderkey": pa.array(okeys.astype(np.int64)),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li)),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li)),
        "l_linenumber": pa.array(lineno),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(1000, 100000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": rng.choice(["A", "N", "R"], n_li),
        "l_linestatus": rng.choice(["F", "O"], n_li),
        "l_shipdate": _ts_array(sdate),
    }))
    epoch_2024 = int(np.datetime64("2024-01-01", "D")
                     .astype("int64")) * _DAY_US
    ets = np.sort(epoch_2024 + rng.integers(0, 30 * _DAY_US, n_ev))
    w("events", pa.table({
        "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
        "ts": _ts_array(ets),
        "user_id": pa.array(rng.integers(0, 15, n_ev)),
        "event_type": rng.choice(["click", "error", "purchase", "signup",
                                  "view"], n_ev),
        "value": np.round(rng.uniform(0.01, 350, n_ev), 2),
        "props": [json.dumps({"k": int(k)})
                  for k in rng.integers(0, 100, n_ev)],
    }))
    n_docs, n_emb, dim = 500, 500, 64
    vocab = np.array(VOCAB)
    texts = [" ".join(vocab[rng.integers(0, len(vocab),
                                         rng.integers(8, 106))])
             for _ in range(n_docs)]
    for v in rng.choice(np.arange(1, n_docs), 2, replace=False):
        texts[v] = texts[int(rng.integers(0, v))]  # plant exact dups
    w("documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
        "lang": rng.choice(["en", "zh", "es", "fr", "de"], n_docs,
                           p=[0.41, 0.1475, 0.1475, 0.1475, 0.1475]),
        "source": [f"src{i}" for i in rng.integers(0, 20, n_docs)],
        "n_chars": pa.array(np.array([len(t) for t in texts],
                                     dtype=np.int64)),
    }))
    labels = rng.integers(0, 10, n_emb)
    centroids = rng.standard_normal((10, dim)).astype(np.float32) * 0.15
    vecs = (centroids[labels]
            + rng.standard_normal((n_emb, dim)).astype(np.float32) * 0.08)
    w("embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32)),
    }))


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"fuzz_seed{SEED}"))
    gen_tables(d, int(SEED))
    return d


@pytest.fixture(scope="module")
def fuzz_ddb(fuzz_dir):
    import duckdb
    from project_etl_spark.io import TABLES
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{fuzz_dir}/{t}.parquet')")
    yield con
    con.close()


def _sample_names() -> list[str]:
    if SEED is None:
        return []
    reg = load_all()
    # golden-fixture oracles join precomputed (doc_id, md5(text)) rows
    # for the FROZEN corpus — regenerating documents breaks the join by
    # design, so they are out of fuzz scope (their independence is
    # covered by tools/spectral_twins.py instead)
    # win_percentile_approx's oracle pins the ESTIMATOR's literal
    # output per frozen fixture scale (provenance comment at its
    # definition) — regenerated data invalidates the literals by
    # design, same class as the golden-fixture joins (found by seed 17
    # in r12, the first seed whose 25-draw sampled it)
    data_pinned = {"win_percentile_approx"}
    oracled = sorted(n for n, s in reg.items()
                     if s.oracle and "fixtures/golden" not in s.oracle
                     and n not in data_pinned)
    rng = np.random.default_rng(int(SEED) + 1_000_003)
    return sorted(rng.choice(oracled, N_SAMPLE, replace=False).tolist())


@pytest.mark.parametrize("name", _sample_names())
def test_fuzz_matches_duckdb(name, spark, fuzz_ddb, fuzz_dir):
    from tests.test_oracle import (_KIND, _arrow_kind, _normalize)
    spec = load_all()[name]
    sdf = spec.builder(spark, fuzz_dir)
    spark_cols = sdf.columns
    spark_kinds = {f.name: _KIND.get(f.dataType.simpleString(), "?")
                   for f in sdf.schema.fields}
    spark_rows = [tuple(r) for r in sdf.collect()]

    arrow = fuzz_ddb.execute(spec.oracle).fetch_arrow_table()
    ddb_rows = [tuple(r.values()) for r in arrow.to_pylist()]
    ddb_kinds = {f.name: _arrow_kind(f.type) for f in arrow.schema}

    assert sorted(spark_cols) == sorted(arrow.schema.names), name
    mism = {c: (spark_kinds[c], ddb_kinds[c]) for c in spark_kinds
            if spark_kinds[c] != ddb_kinds[c]}
    assert not mism, f"{name}: dtype-kind mismatches: {mism}"
    assert len(spark_rows) == len(ddb_rows), (
        f"{name}: rows spark={len(spark_rows)} duckdb={len(ddb_rows)}")
    assert _normalize(spark_rows, spark_cols) == \
        _normalize(ddb_rows, list(arrow.schema.names)), name
