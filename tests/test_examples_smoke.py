"""Smoke tests for the example drivers (the reference's testScripts are its
user-facing surface — SURVEY.md §2 maps them to examples/; these keep the
drivers from bit-rotting as the library evolves). Heavyweight drivers with
their own CLI tests (xprize_prescribe, prescribe_from_checkpoint) and
long-running ML comparisons are exercised elsewhere."""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_seirp_scenarios_example(capsys):
    from seirp_scenarios import main
    main()
    out = capsys.readouterr().out
    assert "rank" in out.lower() or "scenario" in out.lower()


def test_rt_comparison_example(capsys):
    from rt_comparison import main
    main()
    out = capsys.readouterr().out
    assert out.strip()


def test_direct_newcases_lstm_example_tiny():
    from direct_newcases_lstm import main
    mae, persist, losses = main(n_days=80, hidden=8, epochs=15, seed=0)
    assert np.isfinite(mae) and np.isfinite(persist)
    assert losses[-1] < losses[0]


def test_spatial_sims_example():
    from spatial_sims import main
    main(video=None)


def test_lstm_forecast_example(capsys):
    from lstm_forecast import main
    main()
    out = capsys.readouterr().out
    assert "MAPE" in out


def test_make_figures_example(tmp_path):
    from make_figures import main
    main(outdir=str(tmp_path))
    pngs = {p.name for p in tmp_path.glob("*.png")}
    # the full reference QC suite incl. the r4 additions
    # (TrainPredictPrescribeNPI.m:534-908)
    assert {"states.png", "scenarios.png", "pareto.png",
            "training_diagnostic.png", "npi_schedule.png"} <= pngs


def test_realistic_data_pipeline_example(capsys):
    from realistic_data_pipeline import main
    res = main(n_regions=3, n_days=150, n_eps=4)
    out = capsys.readouterr().out
    assert "negative-revision" in out and "finite" in out
    assert len(res.trained.names) == 3
