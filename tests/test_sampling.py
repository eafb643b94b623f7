"""Quota sampling (corpus mixing) and winsorization: caps,
determinism/partition invariance, NULL and quantile semantics."""

from __future__ import annotations

import pytest



def test_quota_sample_caps_and_is_deterministic(spark):
    from pic2vec_spark.ops.sampling import quota_sample

    rows = [(i, "big" if i < 50 else "small") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = quota_sample(df, "source", "doc_id", cap=10)
    got = out.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    assert counts == {"big": 10, "small": 10}
    # determinism + partition invariance
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in quota_sample(df.repartition(7), "source", "doc_id", cap=10).collect()
    )
    assert a == b
    # append stability direction: a kept row stays kept unless displaced
    # by a new row hashing ahead — with no new rows, identical
    with pytest.raises(ValueError):
        quota_sample(df, "source", "doc_id", cap=0)


def test_winsorize_clamps_and_preserves_nulls(spark):
    from pic2vec_spark.ops.encode import winsorize

    rows = [("a", float(v)) for v in range(1, 11)] + [("a", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize(df, "v", group_col="g", p_lo=0.1, p_hi=0.9)
    got = {r["v"]: r["v_wins"] for r in out.collect()}
    # p10 of 1..10 = 1.9, p90 = 9.1 (linear interpolation)
    assert got[1.0] == 1.9 and got[10.0] == 9.1
    assert got[5.0] == 5.0
    assert got[None] is None  # NULL passes through as NULL
    # global (ungrouped) variant
    g = winsorize(df, "v", p_lo=0.1, p_hi=0.9)
    assert {r["v_wins"] for r in g.collect()} == set(got.values())
    with pytest.raises(ValueError):
        winsorize(df, "v", p_lo=0.5, p_hi=0.5)


def test_temperature_sample_flattens_toward_uniform(spark):
    import math

    from pic2vec_spark.ops.sampling import temperature_sample

    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    # alpha=1: natural proportions (90/10); alpha=0: uniform budgets
    nat = temperature_sample(df, "source", "doc_id", alpha=1.0, total=50)
    flat = temperature_sample(df, "source", "doc_id", alpha=0.0, total=50)
    n_nat = {r["source"]: r["count"] for r in nat.groupBy("source").count().collect()}
    n_flat = {r["source"]: r["count"] for r in flat.groupBy("source").count().collect()}
    assert n_nat == {"big": 45, "small": 5}
    # alpha=0: each source weighted 1 -> floor(50/2)=25, small capped at 10
    assert n_flat == {"big": 25, "small": 10}
    # alpha=0.5 sits between
    mid = temperature_sample(df, "source", "doc_id", alpha=0.5, total=50)
    n_mid = {r["source"]: r["count"] for r in mid.groupBy("source").count().collect()}
    w_big = math.sqrt(90) / (math.sqrt(90) + math.sqrt(10))
    assert n_mid["big"] == int(round(50 * w_big, 6) // 1)
    assert 5 < n_mid["small"] <= 10
    with pytest.raises(ValueError):
        temperature_sample(df, "source", "doc_id", alpha=1.5, total=50)
    with pytest.raises(ValueError):
        temperature_sample(df, "source", "doc_id", alpha=0.5, total=0)


def test_cluster_safe_split_property(spark):
    """Members of the same cluster always share a split; singletons use
    their own id (so the assignment matches hash_split exactly)."""
    from pyspark.sql import functions as F

    from pic2vec_spark.ops.sampling import hash_split

    rows = [(i, i % 10) for i in range(200)]  # 10 clusters of 20
    rep = spark.createDataFrame(rows, "doc_id bigint, rep bigint")
    out = hash_split(rep, key_col="rep", test_pct=30, salt="split")
    pdf = out.toPandas()
    assert (pdf.groupby("rep")["split"].nunique() == 1).all()
    # and singleton semantics: rep == doc_id behaves like plain split
    single = spark.createDataFrame([(7, 7)], "doc_id bigint, rep bigint")
    s1 = hash_split(single, key_col="rep", test_pct=30, salt="split").collect()[0]["split"]
    s2 = hash_split(
        spark.createDataFrame([(7,)], "doc_id bigint"),
        key_col="doc_id", test_pct=30, salt="split",
    ).collect()[0]["split"]
    assert s1 == s2


def test_kfold_assign_deterministic_and_grouped(spark):
    from pyspark.sql import functions as F

    from pic2vec_spark.ops.sampling import kfold_assign

    df = spark.range(0, 1000).withColumnRenamed("id", "key").withColumn(
        "grp", (F.col("key") % 37)
    )
    out = kfold_assign(df, "key", k=5).toPandas()
    # total partition into 0..4, deterministic under repartition
    assert set(out.fold.unique()) <= {0, 1, 2, 3, 4}
    again = kfold_assign(df.repartition(11), "key", k=5).toPandas()
    m = out.merge(again, on="key")
    assert (m.fold_x == m.fold_y).all()
    # roughly balanced (binomial: each fold ~200 of 1000)
    counts = out.fold.value_counts()
    assert counts.min() > 120 and counts.max() < 280
    # group mode: one fold per group, and the fold equals hashing the group
    g = kfold_assign(df, "key", k=5, group_col="grp").toPandas()
    assert (g.groupby("grp").fold.nunique() == 1).all()
    import pytest as _pt
    with _pt.raises(ValueError):
        kfold_assign(df, "key", k=1)


def test_mixture_plan_closed_form(spark):
    """Two domains with 300 / 100 tokens at alpha=0.5 and a 1000-token
    budget: weights = sqrt(n)/Z with Z = sqrt(300)+sqrt(100), epochs =
    budget*w/n — checked against the closed form to 1e-6."""
    import math

    from pic2vec_spark.ops.sampling import mixture_plan

    rows = [(i, "web", 30) for i in range(10)] + [
        (i + 10, "code", 25) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_tok int")
    out = {
        r["source"]: r
        for r in mixture_plan(
            df, "source", "n_tok", alpha=0.5, budget=1000
        ).collect()
    }
    z = math.sqrt(300) + math.sqrt(100)
    for dom, n in (("web", 300), ("code", 100)):
        w = math.sqrt(n) / z
        assert out[dom]["n_tokens"] == n
        assert abs(out[dom]["raw_share"] - round(n / 400, 6)) < 1e-9
        assert abs(out[dom]["weight"] - w) < 1e-6
        assert out[dom]["target_tokens"] == math.floor(round(1000 * w, 6))
        assert abs(out[dom]["epochs"] - 1000 * w / n) < 1e-6
    # alpha=1 keeps natural proportions: epochs equal across domains
    nat = {
        r["source"]: r["epochs"]
        for r in mixture_plan(
            df, "source", "n_tok", alpha=1.0, budget=1000
        ).collect()
    }
    assert abs(nat["web"] - nat["code"]) < 1e-9
    # weight_col=None counts rows instead of summing tokens
    cnt = {
        r["source"]: r["n_tokens"]
        for r in mixture_plan(
            df, "source", None, alpha=1.0, budget=1000
        ).collect()
    }
    assert cnt == {"web": 10, "code": 4}
    with pytest.raises(ValueError):
        mixture_plan(df, "source", "n_tok", alpha=2.0, budget=10)
    with pytest.raises(ValueError):
        mixture_plan(df, "source", "n_tok", alpha=0.5, budget=0)


def test_token_budget_sample_greedy_prefix(spark):
    """Budget fills in md5-rank order without splitting docs: the kept
    set is the largest rank prefix whose token sum fits, per domain;
    a budget >= the domain total keeps everything; the pick is
    partition-invariant."""
    from pic2vec_spark.ops.sampling import token_budget_sample

    rows = [(i, "a", 10) for i in range(10)] + [(i + 10, "b", 7) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_tok int")
    budgets = spark.createDataFrame(
        [("a", 35), ("b", 1000)], "source string, target_tokens bigint"
    )
    out = token_budget_sample(df, "source", "n_tok", "doc_id", budgets)
    got = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert got == {"a": 3, "b": 4}  # floor(35/10)=3 docs; b keeps all
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in token_budget_sample(
            df.repartition(5), "source", "n_tok", "doc_id", budgets
        ).collect()
    )
    assert a == b


def test_epoch_schedule_exact_decomposition(spark):
    """Integer decomposition: full epochs × n_tokens + partial prefix
    sum, schedule agrees with token_budget_sample at the remainder."""
    from pyspark.sql import functions as F

    from pic2vec_spark.ops.sampling import epoch_schedule, token_budget_sample

    rows = [(i, "a", 10) for i in range(4)]  # n_tokens = 40
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_tok int")
    plan = spark.createDataFrame(
        [("a", 40, 95)], "source string, n_tokens bigint, target_tokens bigint"
    )
    out = sorted(
        (r["epoch_idx"], r["epoch_tokens"], r["is_partial"])
        for r in epoch_schedule(df, "source", "n_tok", "doc_id", plan).collect()
    )
    # 95 = 2 full passes of 40 + remainder 15 -> 1 doc (10 tokens)
    assert out == [(0, 40, False), (1, 40, False), (2, 10, True)]
    # partial tokens == token_budget_sample at the remainder budget
    rem = plan.select("source", F.lit(15).cast("bigint").alias("target_tokens"))
    got = token_budget_sample(df, "source", "n_tok", "doc_id", rem).agg(
        F.sum("n_tok")
    ).collect()[0][0]
    assert got == 10
    # an exact multiple has no partial row
    plan2 = spark.createDataFrame(
        [("a", 40, 80)], "source string, n_tokens bigint, target_tokens bigint"
    )
    out2 = epoch_schedule(df, "source", "n_tok", "doc_id", plan2).collect()
    assert sorted(r["epoch_idx"] for r in out2) == [0, 1]
    assert not any(r["is_partial"] for r in out2)


def test_mixture_plan_partition_invariance_and_single_domain(spark):
    """The plan is identical under any partitioning, and a one-domain
    corpus gets weight 1.0 / the full budget."""
    from pic2vec_spark.ops.sampling import mixture_plan

    rows = [(i, "a" if i % 3 else "b", 5 + i % 7) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_tok int")
    a = sorted(map(tuple, mixture_plan(df, "source", "n_tok", alpha=0.4,
                                       budget=1000).collect()))
    b = sorted(map(tuple, mixture_plan(df.repartition(13), "source", "n_tok",
                                       alpha=0.4, budget=1000).collect()))
    assert a == b
    one = mixture_plan(
        df.filter("source = 'b'"), "source", "n_tok", alpha=0.4, budget=1000
    ).collect()[0]
    assert one["weight"] == 1.0 and one["target_tokens"] == 1000
    assert one["raw_share"] == 1.0


def test_epoch_schedule_remainder_smaller_than_any_doc(spark):
    """A remainder too small for even the first ranked doc yields no
    partial row — the schedule never overshoots its integer target."""
    from pic2vec_spark.ops.sampling import epoch_schedule

    df = spark.createDataFrame(
        [(0, "a", 10), (1, "a", 10)], "doc_id bigint, source string, n_tok int"
    )
    plan = spark.createDataFrame(
        [("a", 20, 45)], "source string, n_tokens bigint, target_tokens bigint"
    )
    out = epoch_schedule(df, "source", "n_tok", "doc_id", plan).collect()
    # 45 = 2 full passes of 20 + remainder 5 < any doc -> no partial
    assert sorted(r["epoch_idx"] for r in out) == [0, 1]
    assert not any(r["is_partial"] for r in out)
    assert sum(r["epoch_tokens"] for r in out) == 40 <= 45
