"""Property-based tests (hypothesis): Spark expression trees vs tiny pure
Python models on randomized inputs.

Pattern: each hypothesis example is a whole BATCH of random strings run as
one Spark job (one job per example keeps the suite fast; per-row jobs
would be pathological). ASCII-printable alphabet throughout — Java and
Python regex/casing semantics diverge on exotic unicode (\\s classes,
dotted-I casing), and the engine's documented contract is byte-oriented
ASCII normalization.
"""

from __future__ import annotations

import hashlib
import re
import string

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions import scalars as SC
from news_ingestion_data_pipeline_spark.functions import text as TX

ASCII = string.ascii_letters + string.digits + string.punctuation + " \t\n"
texts = st.lists(st.text(alphabet=ASCII, max_size=120), min_size=1, max_size=40)

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# ---- pure-Python models (independent re-implementations, not imports) ----


def model_normalize(s: str) -> str:
    s = s.lower()
    s = re.sub(r"[^a-z0-9 \t\n\r\f\v]", " ", s)
    return re.sub(r"[ \t\n\r\f\v]+", " ", s).strip()


def model_tokens(s: str) -> list[str]:
    n = model_normalize(s)
    return n.split() if n else []


def model_char_ngrams(s: str, n: int = 5) -> list[str]:
    t = model_normalize(s)
    return [t[i : i + n] for i in range(len(t) - n + 1)] if len(t) >= n else []


def model_word_ngrams(s: str, n: int = 3) -> list[str]:
    tk = model_tokens(s)
    return [" ".join(tk[i : i + n]) for i in range(len(tk) - n + 1)] if len(tk) >= n else []


_RH_B, _RH_P, _RH_K = 257, (1 << 31) - 1, 8


def model_full_hash(s: str) -> int:
    h = 0
    for ch in model_normalize(s):
        h = (h * _RH_B + ord(ch)) % _RH_P
    return h


def model_winnow_hash(s: str) -> int | None:
    t = model_normalize(s)
    if len(t) < _RH_K:
        return None
    hs = []
    for j in range(len(t) - _RH_K + 1):
        acc = 0
        for ch in t[j : j + _RH_K]:
            acc = acc * _RH_B + ord(ch)
        hs.append(acc % _RH_P)
    return min(hs)


def _run(spark, vals: list[str], col):
    df = spark.createDataFrame([Row(i=i, s=v) for i, v in enumerate(vals)])
    return [r.out for r in df.select(col(F.col("s")).alias("out")).orderBy("i").collect()]


# ---- properties ----------------------------------------------------------


@SETTINGS
@given(vals=texts)
def test_normalize_matches_model(spark, vals):
    got = _run(spark, vals, TX.normalize_text)
    assert got == [model_normalize(v) for v in vals]


@SETTINGS
@given(vals=texts)
def test_char_ngrams_match_model(spark, vals):
    got = _run(spark, vals, lambda c: TX.char_ngrams(c, 5))
    assert got == [model_char_ngrams(v) for v in vals]


@SETTINGS
@given(vals=texts)
def test_word_ngrams_match_model(spark, vals):
    got = _run(spark, vals, lambda c: TX.word_ngrams(c, 3))
    assert got == [model_word_ngrams(v) for v in vals]


@SETTINGS
@given(vals=texts)
def test_md5_keying_matches_hashlib(spark, vals):
    got = _run(spark, vals, SC.article_id)
    assert got == [hashlib.md5(v.encode("utf-8")).hexdigest() for v in vals]


@SETTINGS
@given(vals=texts)
def test_rolling_hash_matches_model(spark, vals):
    # mirror of the text_rolling_hash registered query's expression
    from news_ingestion_data_pipeline_spark.plans.llm import (
        _RH_B as B,
        _RH_K as K,
        _RH_P as P,
        _RH_POW as POW,
    )

    assert (B, K, P) == (_RH_B, _RH_K, _RH_P)

    def codes_of(s):
        return F.when(F.length(s) == 0, F.array().cast("array<long>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.length(s)),
                lambda i: F.ascii(s.substr(i, F.lit(1))).cast("long"),
            )
        )

    def full(c):
        return TX._bind(
            TX.normalize_text(c),
            lambda s: TX._bind(
                codes_of(s),
                lambda cs: F.aggregate(
                    cs, F.lit(0).cast("long"), lambda a, x: (a * B + x) % P
                ),
            ),
        )

    def winnow(c):
        return TX._bind(
            TX.normalize_text(c),
            lambda s: TX._bind(
                codes_of(s),
                lambda cs: F.array_min(
                    F.when(F.length(s) < K, F.array().cast("array<long>")).otherwise(
                        F.transform(
                            F.sequence(F.lit(1), F.length(s) - F.lit(K - 1)),
                            lambda j: sum(
                                F.element_at(cs, j + F.lit(m)) * F.lit(POW[K - 1 - m])
                                for m in range(K)
                            )
                            % P,
                        )
                    )
                ),
            ),
        )

    assert _run(spark, vals, full) == [model_full_hash(v) for v in vals]
    assert _run(spark, vals, winnow) == [model_winnow_hash(v) for v in vals]


@SETTINGS
@given(vals=texts)
def test_exact_dedup_fingerprint_collision_free_on_distinct_norms(spark, vals):
    """Docs with different normalized text get different fingerprints; docs
    with equal normalized text get equal fingerprints."""
    got = _run(spark, vals, TX.doc_fingerprint)
    norms = [model_normalize(v) for v in vals]
    for (na, fa), (nb, fb) in zip(zip(norms, got), zip(norms[1:], got[1:])):
        assert (na == nb) == (fa == fb)


@pytest.mark.parametrize("seed", [0, 1])
def test_upsert_idempotent_on_random_batches(spark, tmp_path, seed):
    """MERGE-upsert applied twice with the same batch leaves the table
    unchanged (modulo Processed_at refresh) — the reference's re-run
    guarantee (SURVEY.md §2.8 K1)."""
    import datetime as dt
    import random

    from news_ingestion_data_pipeline_spark.operators import upsert as UP
    from news_ingestion_data_pipeline_spark.schemas import ARTICLE_SCHEMA

    rng = random.Random(seed)
    ts = dt.datetime(2025, 8, 1, 12, 0, 0)
    # key-unique batch: the operator contract (normalize_pipeline) guarantees
    # key-uniqueness before MERGE
    rows = [
        Row(
            Article_id=f"id{i:02d}",
            News_link=f"https://x.test/{i}",
            News_title=f"t{rng.randrange(50)}",
            Author_name=None if i % 7 == 0 else f"a{i}",
            News_published_time=None if i % 5 == 0 else ts,
            Source_name="Skift",
            Processed_at=ts,
        )
        for i in range(rng.randrange(10, 40))
    ]
    batch = spark.createDataFrame(rows, ARTICLE_SCHEMA)
    path = str(tmp_path / f"articles_{seed}")
    UP.upsert_articles(spark, path, batch)
    first = {
        r.Article_id: (r.News_link, r.News_title, r.Author_name)
        for r in UP.read_articles(spark, path).collect()
    }
    UP.upsert_articles(spark, path, batch)
    second = {
        r.Article_id: (r.News_link, r.News_title, r.Author_name)
        for r in UP.read_articles(spark, path).collect()
    }
    assert first == second
    # last-write-wins per key: every key present exactly once
    assert len(first) == len({r.Article_id for r in rows})


# ---- connected components vs a pure-Python union-find ----

edge_lists = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


def model_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@given(edges=edge_lists)
@SETTINGS
def test_connected_components_matches_union_find(spark, edges):
    from news_ingestion_data_pipeline_spark.operators.dedup import connected_components

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r.node: r.comp for r in connected_components(df).collect()}
    assert got == model_components(edges)


def test_pagerank_matches_numpy_power_iteration(spark):
    """The registered PageRank must equal a dense numpy power iteration
    with the same damping, iteration count, and dangling handling."""
    import numpy as np

    from news_ingestion_data_pipeline_spark.plans import REGISTRY
    from news_ingestion_data_pipeline_spark.tables import load_table

    from tests.conftest import SF_SMOKE as sf
    got = {r.node: r.pagerank for r in REGISTRY["graph_pagerank_transitions"].fn(spark, sf).collect()}

    ev = load_table(spark, sf, "events").select("user_id", "ts", "event_id", "event_type").collect()
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    edges: dict = {}
    for rows in by_user.values():
        rows.sort()
        for (_, _, a), (_, _, b) in zip(rows, rows[1:]):
            edges[(a, b)] = edges.get((a, b), 0) + 1
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    P = np.zeros((n, n))
    out = np.zeros(n)
    for (a, b), w in edges.items():
        out[idx[a]] += w
    for (a, b), w in edges.items():
        P[idx[b], idx[a]] = w  # column-stochastic after normalize
    for j in range(n):
        if out[j] > 0:
            P[:, j] /= out[j]
    r = np.full(n, 1.0 / n)
    for _ in range(15):
        dangling = r[out == 0].sum()
        r = 0.15 / n + 0.85 * (P @ r + dangling / n)
    expect = {v: r[idx[v]] for v in nodes}
    assert set(got) == set(expect)
    for v in nodes:
        assert abs(got[v] - expect[v]) < 1e-6, (v, got[v], expect[v])


# ---- k-means assignment vs a dense numpy model ----

def test_kmeans_assign_matches_numpy(spark):
    """The registered Lloyd assignment must equal a dense numpy argmin
    with the same (distance, centroid-id) tie order."""
    import numpy as np
    import pyarrow.parquet as pq

    from news_ingestion_data_pipeline_spark.plans import REGISTRY
    from tests.conftest import SF_SMOKE

    got = {
        r.cent_id: (r.n_assigned, r.sum_vec_id)
        for r in REGISTRY["sim_kmeans_assign"].fn(spark, SF_SMOKE).collect()
    }

    tbl = pq.read_table(f"{SF_SMOKE}/embeddings.parquet")
    ids = tbl["vec_id"].to_pylist()
    vecs = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, vecs = np.array(ids)[order], vecs[order]
    cents = vecs[ids < 8]
    # squared L2 to each centroid; ties broken by centroid id via argmin
    # (numpy argmin returns the FIRST minimal index = lowest cent_id)
    d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)
    want: dict = {}
    for vid, c in zip(ids, assign):
        n, s = want.get(int(c), (0, 0))
        want[int(c)] = (n + 1, s + int(vid))
    assert got == want


# ---- sequence packing vs a pure-python prefix sum ----

def test_pack_sequences_matches_python_model(spark):
    """The two-pass distributed prefix sum must equal a single-threaded
    running sum in doc_id order."""
    import pyarrow.parquet as pq

    from news_ingestion_data_pipeline_spark.plans import REGISTRY
    from tests.conftest import SF_SMOKE

    got = {
        r.doc_id: (r.n_tokens, r.cum_tokens, r.shard_id)
        for r in REGISTRY["curation_pack_sequences"].fn(spark, SF_SMOKE).collect()
    }
    tbl = pq.read_table(f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "text"])
    rows = sorted(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    cum = 0
    for doc_id, text in rows:
        n = len(text.split())
        cum += n
        assert got[doc_id] == (n, cum, (cum - 1) // 4096), doc_id
    assert len(got) == len(rows)


# ---- CUSUM fold vs a pure-python loop ----

def test_cusum_matches_python_recurrence(spark):
    """The windowed fold must equal the textbook per-row recurrence
    S_i = max(0, S_{i-1} + (x_i - mu) - k) re-run in plain Python over
    each type's trailing-30 window."""
    from news_ingestion_data_pipeline_spark.plans import REGISTRY
    from news_ingestion_data_pipeline_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    got = {
        (r.event_type, r.event_id): r.cusum_high
        for r in REGISTRY["events_cusum_drift"].fn(spark, SF_SMOKE).collect()
    }
    ev = sorted(
        load_table(spark, SF_SMOKE, "events")
        .select("event_type", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r.event_type, r.ts, r.event_id),
    )
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r)
    for etype, rows in by_type.items():
        vals = [r.value for r in rows]
        mu = float(
            spark.createDataFrame([(v,) for v in vals], "value double")
            .selectExpr(
                "cast(sum(cast(value as decimal(20,10))) as double)"
                " / count(*) as mu"
            )
            .collect()[0].mu
        )
        for i, r in enumerate(rows):
            window = vals[max(0, i - 29) : i + 1]
            s = 0.0
            for x in window:
                s = max(0.0, s + (x - mu) - 5.0)
            assert round(s, 6) == got[(etype, r.event_id)], (etype, r.event_id)


# ---- rolling median vs numpy over the same frames ----

def test_rolling_median_matches_numpy(spark):
    import numpy as np

    from news_ingestion_data_pipeline_spark.plans import REGISTRY
    from news_ingestion_data_pipeline_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    got = {
        (r.user_id, r.event_id): r.rolling_median
        for r in REGISTRY["window_rolling_median"].fn(spark, SF_SMOKE).collect()
    }
    ev = sorted(
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, rows in by_user.items():
        vals = [r.value for r in rows]
        for i, r in enumerate(rows):
            frame = vals[max(0, i - 14) : i + 1]
            want = round(float(np.median(np.array(frame))), 6)
            assert got[(uid, r.event_id)] == want, (uid, r.event_id)
