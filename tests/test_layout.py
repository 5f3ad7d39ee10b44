"""Z-order layout: the data-skipping prune must be real, measured from the
parquet footer stats of actually-written files — not asserted from theory.

Layout fixture is sf0.01 events (10k rows, 30 days x 150 users) in 16
files: enough lattice resolution that BOTH axes of the normalized Morton
key show multiplicative pruning. repartitionByRange's sampler is
deterministic for a fixed input, so the asserted margins are stable.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from clinical_search_data_pipeline_spark.functions import timeops
from clinical_search_data_pipeline_spark.operators.layout import (
    duck_zorder_key,
    write_zorder,
    zorder_key,
)
from clinical_search_data_pipeline_spark.sources.readers import load_events
from tests.conftest import SF_CORRECTNESS

N_FILES = 16
NS_PER_DAY = timeops.NS_PER_SEC * timeops.SECS_PER_DAY
DAY_EXPR = f"(ts div {timeops.NS_PER_SEC}) div {timeops.SECS_PER_DAY}"


def _file_envelopes(out_dir: str) -> list[dict]:
    """Per-file (min, max) of event day and user_id, read from real parquet
    footer statistics — the same stats a data-skipping reader prunes on."""
    envs = []
    for path in sorted(glob.glob(f"{out_dir}/part-*.parquet")):
        md = pq.ParquetFile(path).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        stat = lambda col, g: md.row_group(g).column(idx[col]).statistics
        groups = range(md.num_row_groups)
        envs.append({
            "day_lo": min(stat("ts", g).min for g in groups) // NS_PER_DAY,
            "day_hi": max(stat("ts", g).max for g in groups) // NS_PER_DAY,
            "user_lo": min(stat("user_id", g).min for g in groups),
            "user_hi": max(stat("user_id", g).max for g in groups),
        })
    return envs


def _files_hit(envs: list[dict], day_box: tuple, user_box: tuple) -> int:
    return sum(
        1
        for e in envs
        if e["day_lo"] <= day_box[1] and e["day_hi"] >= day_box[0]
        and e["user_lo"] <= user_box[1] and e["user_hi"] >= user_box[0]
    )


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    ev = load_events(spark, SF_CORRECTNESS).select("event_id", "ts", "user_id")
    nat = str(tmp_path_factory.mktemp("layout") / "natural")
    zod = str(tmp_path_factory.mktemp("layout") / "zorder")
    # natural = what streaming ingestion produces: time-ordered files
    (
        ev.repartitionByRange(N_FILES, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(nat)
    )
    write_zorder(ev, DAY_EXPR, "user_id", zod, N_FILES)
    return _file_envelopes(nat), _file_envelopes(zod)


def test_zorder_preserves_rows(spark, layouts, tmp_path):
    """Layout is a reshuffle, never a transformation: same rows back."""
    ev = load_events(spark, SF_CORRECTNESS).select("event_id", "ts", "user_id")
    out = str(tmp_path / "z")
    write_zorder(ev, DAY_EXPR, "user_id", out, N_FILES)
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    assert sorted(back.columns) == ["event_id", "ts", "user_id"]
    assert (
        back.selectExpr("sum(event_id) s").first()["s"]
        == ev.selectExpr("sum(event_id) s").first()["s"]
    )


def test_zorder_prunes_second_dimension(layouts):
    """The motivating query: all days, narrow user slice. The time-ordered
    layout cannot prune it at all (every file's user envelope spans the
    domain); the z-ordered layout must skip most files on the same footer
    stats (measured: 4 of 16 hit)."""
    nat, zod = layouts
    days = (min(e["day_lo"] for e in nat), max(e["day_hi"] for e in nat))
    user_box = (5, 12)
    assert _files_hit(nat, days, user_box) == N_FILES  # no pruning at all
    assert _files_hit(zod, days, user_box) <= 6


def test_zorder_still_prunes_time(layouts):
    """Z-ordering must not give up the day-axis pruning the natural layout
    had: a two-day slice across all users still skips files (measured: 7 of
    16 hit — coarser than the pure time layout's ~2, which is the explicit
    trade for the user-axis prune above)."""
    nat, zod = layouts
    day0 = min(e["day_lo"] for e in nat)
    day_box = (day0 + 10, day0 + 11)
    users = (min(e["user_lo"] for e in nat), max(e["user_hi"] for e in nat))
    assert _files_hit(nat, day_box, users) <= 4  # the axis time-layout wins
    assert _files_hit(zod, day_box, users) <= 9


def test_zorder_key_matches_duckdb_fragment(spark):
    """The Spark Column and the DuckDB fragment must be the same function —
    checked over the whole 2^6 x 2^6 corner lattice, not just fixture data."""
    import duckdb

    grid = spark.range(64).selectExpr("id AS x").crossJoin(
        spark.range(64).selectExpr("id AS y")
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in grid.select(
            "x", "y", zorder_key("x", "y", bits=6).alias("z")
        ).collect()
    }
    duck = duckdb.connect().execute(
        "SELECT a.r AS x, b.r AS y, "
        + duck_zorder_key("a.r", "b.r", bits=6)
        + " AS z FROM range(64) a(r) CROSS JOIN range(64) b(r)"
    ).fetchall()
    for x, y, z in duck:
        assert got[(x, y)] == z, (x, y, z, got[(x, y)])
    # interleave sanity: z(1,0)=1, z(0,1)=2, z(3,5)=0b100111=39
    assert got[(1, 0)] == 1 and got[(0, 1)] == 2 and got[(3, 5)] == 39
