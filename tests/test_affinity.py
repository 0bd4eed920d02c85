"""Market-basket affinity (operators/affinity.py): exact support,
counts, and integer lift on a planted basket fixture."""

from __future__ import annotations

from spendinganalysisetl_spark.operators.affinity import basket_pairs


def test_basket_pairs_exact(spark):
    # 4 baskets: {x,y} {x,y} {x,z} {y}  → N=4, n_x=3, n_y=3, n_z=1
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"), (2, "y"),  # repeat collapses
        (3, "x"), (3, "z"),
        (4, "y"),
    ]
    df = spark.createDataFrame(rows, "basket_id int, item string")
    got = {
        (r["item_a"], r["item_b"]): (r["support"], r["n_a"], r["n_b"], r["lift_bp"])
        for r in basket_pairs(df).collect()
    }
    # lift(x,y) = 2*4/(3*3) = 0.8888.. → 8888 bp (floor)
    assert got[("x", "y")] == (2, 3, 3, 8888)
    # lift(x,z) = 1*4/(3*1) = 1.3333.. → 13333 bp
    assert got[("x", "z")] == (1, 3, 1, 13333)
    assert ("y", "z") not in got  # never co-occur
    assert set(got) == {("x", "y"), ("x", "z")}


def test_basket_pairs_ordering_and_k(spark):
    rows = [(b, it) for b in range(10) for it in ("a", "b")] + [(0, "c")]
    df = spark.createDataFrame(rows, "basket_id int, item string")
    out = basket_pairs(df, k=1).collect()
    assert len(out) == 1
    assert (out[0]["item_a"], out[0]["item_b"], out[0]["support"]) == ("a", "b", 10)


def test_mega_basket_guard_drops_whale_from_everything(spark):
    from spendinganalysisetl_spark.operators.affinity import oversized_baskets

    # 3 normal baskets {x,y} + one whale basket touching 20 items
    # (incl. x and y). cap=10: the whale must vanish from pairs, item
    # counts, AND the lift denominator.
    rows = [(b, it) for b in (1, 2, 3) for it in ("x", "y")]
    rows += [(99, f"w{i:02d}") for i in range(18)] + [(99, "x"), (99, "y")]
    df = spark.createDataFrame(rows, "basket_id int, item string")

    capped = {
        (r["item_a"], r["item_b"]): (r["support"], r["n_a"], r["n_b"], r["lift_bp"])
        for r in basket_pairs(df, max_basket_size=10).collect()
    }
    # N=3, support=3, n_x=n_y=3 → lift = 3*3/(3*3) = 10000 bp exactly
    assert capped == {("x", "y"): (3, 3, 3, 10000)}

    # uncapped: whale contributes 20*19/2 = 190 pairs and shifts counts
    # 190 whale pairs; (x,y) merges with the normal-basket pair
    uncapped = basket_pairs(df, max_basket_size=None, k=1000).collect()
    assert len(uncapped) == 190
    # audit twin counts exactly the dropped basket
    audit = oversized_baskets(df, max_basket_size=10).collect()
    assert [(r["bid"], r["basket_size"]) for r in audit] == [(99, 20)]


def test_item_jaccard_exact(spark):
    from spendinganalysisetl_spark.operators.affinity import item_jaccard_pairs

    # items x,y share baskets 1..6 of x's 1..8 and y's 1..6:
    # inter=6, n_x=8, n_y=6, union=8 → jaccard 7500 bp
    rows = [(b, "x") for b in range(1, 9)] + [(b, "y") for b in range(1, 7)]
    # a rare pair sharing its single basket must be filtered by min_support
    rows += [(100, "p"), (100, "q")]
    df = spark.createDataFrame(rows, "basket_id int, item string")
    out = item_jaccard_pairs(df, min_support=5).collect()
    assert [(r["item_a"], r["item_b"], r["support"], r["jaccard_bp"]) for r in out] == [
        ("x", "y", 6, 7500)
    ]
