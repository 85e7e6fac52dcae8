"""Windowed/temporal operators vs DuckDB oracles, at pytest level (the same
comparisons the driver's correctness gate runs, kept in-repo so regressions
surface in `pytest` before any driver round)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in ("events", "orders"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _oracle(name: str) -> str:
    import __ray_entry__ as entry

    return entry.oracle_sql()[name]


@pytest.mark.parametrize("name,fn_name", [
    ("events_sessions", "events_sessions"),
    ("events_sliding_3h", "events_sliding_3h"),
    ("events_last_order", "events_last_order"),
])
def test_window_operator_matches_duckdb(ray_session, sf_dir, con, name, fn_name):
    from lexmapr_ray.pipelines import windows

    got = _norm(getattr(windows, fn_name)(sf_dir).to_pandas())
    exp = _norm(con.execute(_oracle(name)).fetchdf())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp)
    for c in got.columns:
        assert (got[c].astype(str).values == exp[c].astype(str).values).all(), c


def test_sessions_single_user_never_splits(ray_session, sf_dir):
    """Hot-entity guard: every (user, session) appears exactly once — a user
    split across sort partitions would duplicate session ids."""
    from lexmapr_ray.pipelines.windows import events_sessions

    got = events_sessions(sf_dir).to_pandas()
    assert not got.duplicated(["user_id", "session_id"]).any()


def test_ann_ivf_recall_vs_bruteforce(ray_session, sf_dir):
    from lexmapr_ray.stages.similarity import ann_ivf_topk, cosine_topk_bruteforce

    exact = cosine_topk_bruteforce(sf_dir, k=10).to_pandas()
    approx = ann_ivf_topk(sf_dir, k=10).to_pandas()
    # IVF prunes buckets: require >= 70% recall of the exact top-10, and all
    # reported similarities must equal the exact scores for those ids
    exact_map = dict(zip(exact["vec_id"], exact["sim_bp"]))
    hits = [v for v in approx["vec_id"] if v in exact_map]
    assert len(hits) >= 7
    for _, r in approx.iterrows():
        if r.vec_id in exact_map:
            assert exact_map[r.vec_id] == r.sim_bp
