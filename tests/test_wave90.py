"""Invariants for waves 90-93 (unicode hygiene, homoglyph skeletons,
weblog grok, privacy analytics, media segmentation, snapshot vacuum)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE

_ZW = "​‌‍﻿"


def _docs(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .collect()
    )


# ---- wave 90 -------------------------------------------------------------

def test_unicode_clean_strips_all_noise(spark):
    rows = REGISTRY["text_unicode_clean"].fn(spark, SF_SMOKE).collect()
    docs = {d.doc_id: d for d in _docs(spark)}
    assert len(rows) == len(docs)
    for r in rows:
        m = r.doc_id % 4
        if m == 0:
            # accented+ZWSP prefix: 1 zero-width char, prefix folds away
            assert r.n_zero_width == 1 and r.changed
        elif m == 1:
            # NBSP-for-space: restored, same length
            assert r.n_zero_width == 0 and r.n_chars_removed == 0
            assert r.changed  # NBSP != space
        elif m == 2:
            assert r.n_zero_width == 1 and r.n_chars_removed == 1
        else:
            # untouched lowercase ascii text: clean == raw
            assert r.n_zero_width == 0 and not r.changed


def test_unicode_clean_md5_equals_plain_text_md5_for_m3(spark):
    import hashlib

    rows = {
        r.doc_id: r
        for r in REGISTRY["text_unicode_clean"].fn(spark, SF_SMOKE).collect()
    }
    for d in _docs(spark):
        if d.doc_id % 4 == 3:
            want = hashlib.md5(d.text.lower().encode()).hexdigest()
            assert rows[d.doc_id].clean_md5 == want


def test_homoglyph_skeleton_groups(spark):
    rows = REGISTRY["dedup_homoglyph_skeleton"].fn(spark, SF_SMOKE).collect()
    docs = _docs(spark)
    # every skeleton is pure printable latin-ascii after the fold
    for r in rows:
        assert re.fullmatch(r"[a-z0-9_]+", r.skeleton), r.skeleton
    # group count == distinct (source, doc_id % 17) pairs
    assert len(rows) == len({(d.source, d.doc_id % 17) for d in docs})
    # a skeleton whose docs span spoof residues must be a suspect
    variants = defaultdict(set)
    for d in docs:
        variants[f"{d.source}_u{d.doc_id % 17}"].add(
            1 if d.doc_id % 5 == 1 else 2 if d.doc_id % 5 == 2 else 0
        )
    by_skel = {r.skeleton: r for r in rows}
    for skel, vs in variants.items():
        assert by_skel[skel].spoof_suspect == (len(vs) > 1)
        assert by_skel[skel].n_variants == len(vs)


def test_weblog_grok_matches_python(spark):
    rows = REGISTRY["scan_weblog_grok"].fn(spark, SF_SMOKE).collect()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    agg = defaultdict(lambda: [0, set(), set(), 0])
    for e in ev:
        if e.event_type == "error":
            status = 500 if e.event_id % 2 == 0 else 404
        elif e.event_id % 17 == 0:
            status = 301
        else:
            status = 200
        ip = (
            f"10.{e.user_id % 200}.{e.event_id % 250}.{(e.event_id * 7) % 250}"
        )
        key = (f"{str(status)[0]}xx", e.event_type)
        a = agg[key]
        a[0] += 1
        a[1].add(ip)
        a[2].add(f"u{e.user_id}")
        a[3] += int(math.floor(e.value * 10))
    assert len(rows) == len(agg)
    for r in rows:
        a = agg[(r.status_class, r.top_path)]
        assert (r.n_requests, r.n_ips, r.n_users, r.total_bytes) == (
            a[0],
            len(a[1]),
            len(a[2]),
            a[3],
        )


# ---- wave 91 -------------------------------------------------------------

def test_l_diversity_matches_python(spark):
    rows = REGISTRY["curation_l_diversity"].fn(spark, SF_SMOKE).collect()
    groups = defaultdict(Counter)
    for d in _docs(spark):
        groups[(d.source, d.n_chars // 64)][d.lang] += 1
    assert len(rows) == len(groups)
    for r in rows:
        cnt = groups[(r.source, r.len_band)]
        k = sum(cnt.values())
        assert r.k == k and r.l_distinct == len(cnt)
        ent = round(
            round(math.log(k), 9)
            - sum(c * round(math.log(c), 9) for c in cnt.values()) / k,
            6,
        )
        assert abs(r.entropy_l - ent) < 1e-9
        assert r.diverse_ok == (len(cnt) >= 2)


def test_reid_risk_partitions_everything(spark):
    rows = REGISTRY["curation_reid_risk_profile"].fn(spark, SF_SMOKE).collect()
    docs = _docs(spark)
    assert sum(r.n_records for r in rows) == len(docs)
    assert abs(sum(r.pct_records for r in rows) - 100.0) < 0.01
    # expected re-id share: each bucket's sum(1/k)/n is in (0, 1]
    for r in rows:
        assert 0 < r.expected_reid_share <= 1.0
    # the unique bucket (k=1) re-identifies every one of its records
    uniq = [r for r in rows if r.risk_bucket == "1_unique"]
    if uniq:
        assert uniq[0].n_groups == uniq[0].n_records
        assert (
            abs(
                uniq[0].expected_reid_share
                - uniq[0].n_records / len(docs)
            )
            < 1e-6
        )


def test_dp_noisy_counts_mechanism(spark):
    rows = REGISTRY["curation_dp_noisy_counts"].fn(spark, SF_SMOKE).collect()
    truth = Counter(d.lang for d in _docs(spark))
    assert {r.lang for r in rows} == set(truth)
    for r in rows:
        assert r.true_n == truth[r.lang]
        assert r.epsilon == 1.0
        # Laplace(1) noise: |noise| = |ln(1-2|u-.5|)|, finite and nonzero
        noise = r.noisy_n - r.true_n
        assert 0 < abs(noise) < 40  # ln at 2^-52 tail bound
    # deterministic: second run produces identical noise
    again = REGISTRY["curation_dp_noisy_counts"].fn(spark, SF_SMOKE).collect()
    assert sorted((r.lang, r.noisy_n) for r in rows) == sorted(
        (r.lang, r.noisy_n) for r in again
    )


# ---- wave 92 -------------------------------------------------------------

def test_vad_segments_are_maximal_voiced_runs(spark):
    win = {
        (w.media_id, w.win_no): w.rms
        for w in REGISTRY["multimodal_audio_windows"].fn(spark, SF_SMOKE).collect()
    }
    segs = (
        REGISTRY["multimodal_audio_vad_segments"].fn(spark, SF_SMOKE).collect()
    )
    n_voiced = sum(1 for r in win.values() if r > 17000.0)
    assert sum(s.n_windows for s in segs) == n_voiced
    for s in segs:
        w0, w1 = s.start_ms // 250, s.end_ms // 250 - 1
        assert s.n_windows == w1 - w0 + 1
        # every window inside is voiced, the run is maximal on both sides
        for w in range(w0, w1 + 1):
            assert win[(s.media_id, w)] > 17000.0
        assert win.get((s.media_id, w0 - 1), 0.0) <= 17000.0
        assert win.get((s.media_id, w1 + 1), 0.0) <= 17000.0
        assert s.peak_rms == max(
            win[(s.media_id, w)] for w in range(w0, w1 + 1)
        )


def test_shot_boundaries_consistent(spark):
    rows = REGISTRY["multimodal_shot_boundaries"].fn(spark, SF_SMOKE).collect()
    by_media = defaultdict(list)
    for r in rows:
        by_media[r.media_id].append(r)
    for frames in by_media.values():
        frames.sort(key=lambda r: r.frame_no)
        assert frames[0].jump is None and not frames[0].is_boundary
        assert frames[0].shot_no == 0
        for prev, cur in zip(frames, frames[1:]):
            assert cur.jump == abs(cur.brightness - prev.brightness)
            assert cur.is_boundary == (cur.jump > 3000)
            assert cur.shot_no == prev.shot_no + (1 if cur.is_boundary else 0)
        # brightness is an 8x8x3 crop byte sum
        for f in frames:
            assert 0 <= f.brightness <= 192 * 255


# ---- wave 93 -------------------------------------------------------------

def test_vacuum_counts_and_content(spark):
    rows = REGISTRY["storage_vacuum_retention"].fn(spark, SF_SMOKE).collect()
    assert [r.version for r in rows] == ["a", "b", "c"]
    for r in rows:
        assert (r.snaps_before_vacuum, r.snaps_removed, r.snaps_after_vacuum) == (
            2,
            1,
            1,
        )
    docs = _docs(spark)
    want = Counter(
        "c" if d.doc_id % 5 == 0 else "b" if d.doc_id % 3 == 0 else "a"
        for d in docs
    )
    assert {r.version: r.n_rows for r in rows} == dict(want)


def test_vacuum_never_removes_current_and_spares_inflight(spark, tmp_path):
    import os
    import time

    from news_ingestion_data_pipeline_spark.operators import upsert as UP

    path = str(tmp_path / "tbl")
    df = spark.range(5).withColumnRenamed("id", "Article_id")
    UP.upsert_articles(spark, path, df)
    UP.upsert_articles(spark, path, df)
    cur = UP._current_snapshot(path)
    # a fake in-flight snapshot another writer is materializing
    os.makedirs(os.path.join(path, "snap-inflight1"))
    with open(UP._inflight_marker(path, "snap-inflight1"), "w") as f:
        f.write(f"{os.getpid()} {time.time()}\n")
    before, removed = UP.vacuum_snapshots(path, keep_latest=0)
    names = set(os.listdir(path))
    assert cur in names  # current always survives, even keep_latest=0
    assert "snap-inflight1" in names  # in-flight spared
    assert removed == 1  # only the superseded previous snapshot went
    assert UP.read_articles(spark, path).count() == 5
