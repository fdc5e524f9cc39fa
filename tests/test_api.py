"""The `spark_hive_spark.api` façade: every exported primitive runs
on tiny hand-checkable inputs (independent of the fixture tables —
the oracle sweeps already pin the fixture instantiations)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from spark_hive_spark import api


def test_lazy_reexports_resolve():
    """Every re-export in __all__ resolves to a callable, and the
    resolution caches (second access hits the module global)."""
    for name in api.__all__:
        assert callable(getattr(api, name)), name
    assert "asof_join" in vars(api)  # cached after first access
    with pytest.raises(AttributeError):
        api.not_a_primitive


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute)


def test_funnel_strict_ordering(spark):
    """Users convert only on events strictly after their previous
    stage: u1 completes all 3 steps; u2's purchase precedes their
    click so stage 3 excludes them; u3 only views."""
    rows = [
        ("u1", "view", _ts(0)), ("u1", "click", _ts(1)), ("u1", "purchase", _ts(2)),
        ("u2", "view", _ts(0)), ("u2", "purchase", _ts(1)), ("u2", "click", _ts(2)),
        ("u3", "view", _ts(5)),
    ]
    events = spark.createDataFrame(rows, "user_id string, event_type string, ts timestamp")
    out = api.funnel(events, ["view", "click", "purchase"]).collect()
    assert [(r.stage_idx, r.stage, r.n_users) for r in out] == [
        (1, "view", 3), (2, "click", 2), (3, "purchase", 1),
    ]
    assert out[0].conv_from_prev == 1.0
    assert out[1].conv_from_prev == pytest.approx(2 / 3)
    assert out[2].conv_from_prev == pytest.approx(1 / 2)


def test_funnel_null_after_empty_stage(spark):
    """An empty stage yields NULL conversion for the next stage, not
    a fake 1.0 (the try_divide contract)."""
    events = spark.createDataFrame(
        [("u1", "view", _ts(0))], "user_id string, event_type string, ts timestamp"
    )
    out = api.funnel(events, ["view", "click", "purchase"]).collect()
    assert [r.n_users for r in out] == [1, 0, 0]
    assert out[1].conv_from_prev == 0.0
    assert out[2].conv_from_prev is None  # 0/0


def test_knn_exact_on_axis_vectors(spark):
    """Hand-checkable geometry: with unit axis vectors and one
    diagonal, cosine ranks are known in closed form."""
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [1.0, 1.0, 0.0]),  # cos 0.707 with both axes
        (3, [1.0, 0.1, 0.0]),  # cos ~0.995 with vec 0
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = api.knn(vecs, vecs.filter("vec_id = 0"), k=2).collect()
    assert [(r.query_id, r.neighbor_id, r.rank) for r in out] == [
        (0, 3, 1), (0, 2, 2),
    ]
    assert out[0].cos_sim == pytest.approx(1 / (1.01) ** 0.5, abs=1e-4)


def test_cosine_pairs_matches_bruteforce(spark):
    """Blocked GEMM pairs == python brute force on random vectors,
    across a block count that forces diagonal AND off-diagonal
    tasks."""
    import numpy as np

    rng = np.random.default_rng(3)
    X = rng.normal(size=(40, 8))
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in api.cosine_pairs(vecs, threshold=0.5, blocks=4).collect()
    }
    Xf = X.astype(np.float32).astype(np.float64)  # match array<float> storage
    Xn = Xf / np.linalg.norm(Xf, axis=1, keepdims=True)
    S = Xn @ Xn.T
    want = {
        (i, j): round(float(S[i, j]), 6)
        for i in range(40)
        for j in range(i + 1, 40)
        if S[i, j] >= 0.5
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-6)


def test_minhash_dedupe_finds_identical_shingle_sets(spark):
    """Documents with identical shingle sets are certain candidates
    (jaccard 1.0); disjoint sets never pair."""
    rows = (
        [(1, s) for s in (10, 20, 30, 40)]
        + [(2, s) for s in (10, 20, 30, 40)]  # == doc 1
        + [(3, s) for s in (10, 20, 30, 50)]  # jaccard 3/5 = 0.6
        + [(4, s) for s in (91, 92, 93, 94)]  # disjoint
    )
    sh = spark.createDataFrame(rows, "doc_id long, s long")
    out = api.minhash_dedupe(sh, threshold=0.8).collect()
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in out] == [(1, 2, 1.0)]
    # threshold is a real knob: 0.5 admits the 0.6-jaccard pair too
    # (identical-minhash banding guarantees the 1.0 pair; the 0.6
    # pair needs one of its bands to agree — with 32/8 banding the
    # collision chance is high but seed-dependent, so only assert
    # the guaranteed containments)
    low = {
        (r.doc_a, r.doc_b) for r in api.minhash_dedupe(sh, threshold=0.5).collect()
    }
    assert (1, 2) in low
    assert (1, 4) not in low and (2, 4) not in low and (3, 4) not in low


def test_minhash_dedupe_rejects_bad_banding():
    with pytest.raises(ValueError):
        # shingles frame unused before validation; None stands in
        api.minhash_dedupe(None, k=32, bands=7)


def test_canonical_checksum_order_invariant_and_damage_sensitive(spark):
    """The checksum ignores row order/partitioning and flips on any
    row-level damage — the migration-validation contract."""
    rows = [(1, "a", 10.00), (2, "b", 20.50), (3, "c", 30.25)]
    expr = "id, '|', name, '|', CAST(round(val * 100) AS BIGINT)"
    df1 = spark.createDataFrame(rows, "id long, name string, val double")
    df2 = spark.createDataFrame(rows[::-1], "id long, name string, val double").repartition(7)
    c1 = api.canonical_checksum(df1, expr).collect()[0]
    c2 = api.canonical_checksum(df2, expr).collect()[0]
    assert c1.n_rows == 3 and (c1.n_rows, c1.row_checksum) == (c2.n_rows, c2.row_checksum)
    damaged = spark.createDataFrame(
        [(1, "a", 10.00), (2, "b", 20.51), (3, "c", 30.25)],
        "id long, name string, val double",
    )
    c3 = api.canonical_checksum(damaged, expr).collect()[0]
    assert c3.row_checksum != c1.row_checksum
    labeled = api.canonical_checksum(df1, expr, label="tiny").collect()[0]
    assert labeled.table_name == "tiny" and labeled.row_checksum == c1.row_checksum


def test_asof_join_reexport_basic(spark):
    """The re-exported asof_join attaches the latest right row at or
    before each left timestamp, per key."""
    left = spark.createDataFrame(
        [("k", _ts(5), "order1"), ("k", _ts(9), "order2")],
        "k string, lts timestamp, order_id string",
    )
    right = spark.createDataFrame(
        [("k", _ts(4), 1.0), ("k", _ts(7), 2.0), ("k", _ts(11), 3.0)],
        "k string, rts timestamp, quote double",
    )
    out = {
        r.order_id: r.quote
        for r in api.asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts"
        ).collect()
    }
    assert out == {"order1": 1.0, "order2": 2.0}


def test_quantiles_reexport(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "x double")
    q = api.quantiles(df, "x", [0.0, 0.5, 1.0], partitions=8)
    assert q == [1.0, 50.5, 100.0]
