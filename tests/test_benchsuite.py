"""bench.py --suite: every PERF.md headline row reproducible in one command.

The suite rows are measured on TPU (docs/assets/bench_suite_r4.json); on the
CPU test mesh they shrink to smoke shapes and must be labeled as such. These
tests exercise the row builders in-process (the CLI surface itself is covered
by test_cli.py's bench smoke) — the point is that every builder constructs,
compiles, and times its workload end-to-end.
"""

from __future__ import annotations

import pytest

from dnn_mppi_mpc_tpu.utils import benchsuite


def test_suite_rows_registry_complete():
    assert set(benchsuite.ROWS) == set(benchsuite._BUILDERS)


def test_suite_unknown_row_rejected():
    with pytest.raises(ValueError, match="unknown suite rows"):
        benchsuite.run_suite(rows=("no_such_row",), reps=1)


def test_suite_light_rows_run_on_cpu(capsys):
    rows = benchsuite.run_suite(rows=("mppi_fleet", "goal_seeking"), reps=1)
    assert [r["workload"] for r in rows] == ["mppi_fleet", "goal_seeking"]
    for r in rows:
        # smoke shapes must never read as measurements
        assert r["cpu_smoke"] is True
        # under host contention the slope guard can floor tau to ~0
        # (utils/benchtime.py) — structural keys must still be present/sane
        assert r["per_tick_ms_best"] >= 0
        assert r["solves_per_s"] > 0
    # fleet row reports member-solves (B members per tick), not fleet-ticks
    fleet = rows[0]
    assert fleet["B"] > 1 and fleet["solves_per_s"] > 0
    out = capsys.readouterr().out
    # one JSON line per row, no artifact write on CPU/subset runs
    assert out.count('"workload"') == 2
    assert "wrote" not in out
