"""End-to-end pipeline tests: steer over the fixture (preprocess -> emulators ->
MCMC -> plots), plus .dat table ingest on a synthetic table set."""

import os
from pathlib import Path

import numpy as np
import pytest
import yaml

from bayesian_inference_tpu.io import tables
from bayesian_inference_tpu.pipeline.steer import SteerAnalysis
from conftest import make_analysis_yaml


@pytest.mark.slow
def test_steer_end_to_end(tmp_path):
    groups = {"default_group": {"n_pc": 3, "observable_list": ["hadron__pt_"]}}
    config_path, analysis_name, param = make_analysis_yaml(
        tmp_path, groups=groups, n_walkers=12, n_burn_steps=16, n_sampling_steps=30, n_restarts=1
    )
    # enable preprocessing + plots in the config
    cfg = yaml.safe_load(config_path.read_text())
    cfg["preprocess_input_data"] = True
    cfg["plot"] = {k: True for k in cfg["plot"]}
    # Bound correlation-grid rendering (the numeric outlier sweep still covers
    # every group); full rendering is exercised by the dedicated pairplot test.
    cfg["plot_correlations_max_rendered"] = 2
    config_path.write_text(yaml.safe_dump(cfg))

    steer = SteerAnalysis(config_file=str(config_path))
    steer.run_analysis()

    run_dir = Path(cfg["output_dir"]) / f"{analysis_name}_{param}"
    assert (run_dir / "observables_preprocessed.h5").exists()
    assert (run_dir / "emulation_group_default_group.pkl").exists()
    assert (run_dir / "mcmc.h5").exists()
    assert (run_dir / "mcmc_sampler.pkl").exists()
    # The sampler pickle serves emcee's reader API (reference mcmc.py:127-132
    # pickles the whole sampler "e.g. sampler.get_chain(discard=..., thin=...,
    # flat=True)"); chain/log_prob come lazily from the adjacent mcmc.h5.
    from bayesian_inference_tpu.io import hdf5
    from bayesian_inference_tpu.mcmc.sampler_archive import EnsembleSamplerArchive

    sampler = EnsembleSamplerArchive.load(str(run_dir / "mcmc_sampler.pkl"))
    results = hdf5.read_dict_from_h5(str(run_dir), "mcmc.h5", verbose=False)
    np.testing.assert_array_equal(sampler.get_chain(), results["chain"])
    np.testing.assert_array_equal(
        sampler.get_chain(discard=10, thin=7, flat=True),
        results["chain"][10::7].reshape(-1, results["chain"].shape[-1]),
    )
    np.testing.assert_array_equal(sampler.get_log_prob(), results["log_prob"])
    assert sampler.chain.shape == (
        results["chain"].shape[1], results["chain"].shape[0], results["chain"].shape[2],
    )
    assert sampler.flatchain.shape[0] == results["chain"].shape[0] * results["chain"].shape[1]
    np.testing.assert_array_equal(
        sampler.acceptance_fraction, results["acceptance_fraction"]
    )
    assert sampler.get_last_sample()[0].shape == results["chain"].shape[1:]
    assert (Path(cfg["output_dir"]) / "steer_analysis_config.yaml").exists()

    # plots
    assert (run_dir / "plot_mcmc" / "acceptance_fraction.pdf").exists()
    assert (run_dir / "plot_mcmc" / "pairplot_posterior.pdf").exists()
    assert (run_dir / "plot_qhat" / "qhat_vs_T.pdf").exists()
    assert (run_dir / "plot_emulation" / "pca_explained_variance__default_group.pdf").exists()
    assert (run_dir / "plot_emulation" / "pca_observables__default_group.pdf").exists()
    assert (run_dir / "plot_emulation" / "pca_observables_sweep__default_group.pdf").exists()
    assert (run_dir / "plot_input_data" / "predictions__standard.pdf").exists()
    # All four correlation studies run by default (reference
    # plot_input_data.py:190-232): training + validation set, outlier-
    # identified + annotate-every-point.
    corr_pdfs = [p.name for p in (run_dir / "plot_input_data").glob("*pairplot_correlations*.pdf")]
    assert any("_validation__" in n and "__outliers" in n for n in corr_pdfs)
    assert any("__annotated" in n and "_validation__" not in n for n in corr_pdfs)
    assert any("__annotated" in n and "_validation__" in n for n in corr_pdfs)
    assert (Path(cfg["output_dir"]) / "qhat_across_analyses.pdf").exists()


def _write_synthetic_tables(table_dir: Path, n_design=20, n_bins=5, n_params=6):
    """Small self-consistent Data/Design/Prediction table set in the reference format."""
    rng = np.random.default_rng(0)
    (table_dir / "Data").mkdir(parents=True)
    (table_dir / "Design").mkdir()
    (table_dir / "Prediction").mkdir()

    label = "5020__PbPb__hadron__pt_ch_test____0-5"
    xmin = np.arange(n_bins, dtype=float)
    xmax = xmin + 1
    y = rng.uniform(0.5, 1.0, n_bins)
    y_err = 0.05 * y
    np.savetxt(table_dir / "Data" / f"Data__{label}.dat", np.c_[xmin, xmax, y, y_err])

    design = rng.uniform(0, 1, (n_design, n_params))
    ids = " ".join(str(i) for i in range(n_design))
    header = f"Design point indices (row index): {ids}"
    np.savetxt(table_dir / "Design" / "Design__exponential.dat", design, header=header)

    pred = rng.uniform(0.4, 1.1, (n_bins, n_design))
    pred_err = 0.05 * pred
    dp_header = " ".join(f"design_point{i}" for i in range(n_design))
    for kind, arr in (("values", pred), ("errors", pred_err)):
        # Real files carry a single header line "# design_point0 design_point1 ..."
        np.savetxt(
            table_dir / "Prediction" / f"Prediction__exponential__{label}__{kind}.dat",
            arr, header=dp_header,
        )
    return label, design, pred


def test_initialize_observables_from_tables(tmp_path):
    table_dir = tmp_path / "tables"
    label, design, pred = _write_synthetic_tables(table_dir)

    analysis_config = {
        "sqrts_list": [5020],
        "centrality_range": [0, 10],
        "validation_indices": [15, 20],
        "design_points_to_exclude": [3],
        "cuts": {},
        "parameters": {"emulators": {"g": {"observable_list": ["hadron__pt_"]}}},
    }
    obs = tables.initialize_observables_dict_from_tables(str(table_dir), analysis_config, "exponential")

    assert label in obs["Data"]
    assert obs["Design"].shape == (14, 6)            # 20 - 5 validation - 1 excluded
    assert obs["Design_validation"].shape == (5, 6)
    assert 3 not in obs["Design_indices"]
    assert obs["Prediction"][label]["y"].shape == (5, 14)
    assert obs["Prediction_validation"][label]["y"].shape == (5, 5)
    np.testing.assert_allclose(obs["Prediction"][label]["y"][:, 0], pred[:, 0])


def test_initialize_observables_applies_cuts(tmp_path):
    table_dir = tmp_path / "tables"
    label, design, pred = _write_synthetic_tables(table_dir)
    analysis_config = {
        "sqrts_list": [5020],
        "centrality_range": [0, 10],
        "validation_indices": [15, 20],
        "cuts": {"hadron__pt_": [1.0, 3.0]},  # keeps bins with xmin>=1, xmax<=3: bins 1,2
        "parameters": {"emulators": {"g": {"observable_list": ["hadron__pt_"]}}},
    }
    obs = tables.initialize_observables_dict_from_tables(str(table_dir), analysis_config, "exponential")
    assert obs["Prediction"][label]["y"].shape[0] == 2
    assert obs["Data"][label]["y"].shape[0] == 2


def test_centrality_and_sqrts_filters(tmp_path):
    table_dir = tmp_path / "tables"
    label, *_ = _write_synthetic_tables(table_dir)
    base = {
        "validation_indices": [15, 20],
        "cuts": {},
        "parameters": {"emulators": {"g": {"observable_list": ["hadron__pt_"]}}},
    }
    # wrong sqrts -> nothing ingested
    cfg = {**base, "sqrts_list": [200], "centrality_range": [0, 10]}
    obs = tables.initialize_observables_dict_from_tables(str(table_dir), cfg, "exponential")
    assert not obs["Data"]
    # centrality window too narrow -> nothing
    cfg = {**base, "sqrts_list": [5020], "centrality_range": [0, 4]}
    obs = tables.initialize_observables_dict_from_tables(str(table_dir), cfg, "exponential")
    assert not obs["Data"]


@pytest.mark.slow
def test_input_data_pairplot_correlations(tmp_path):
    """Per-bin pair-correlation grids with OLS + RMS outlier identification
    across all three grouping modes (reference plot_input_data.py:53-147,
    323-478)."""
    from bayesian_inference_tpu.pipeline.configs import EmulationConfig, load_yaml
    from bayesian_inference_tpu.plots.input_data import (
        ObservableGrouping,
        plot_pairplot_correlations,
    )

    groups = {"g": {"n_pc": 2, "observable_list": ["pt_ch_alice"]}}
    config_path, name, param = make_analysis_yaml(tmp_path, groups=groups)
    ac = load_yaml(config_path)["analyses"][name]
    cfg = EmulationConfig.from_config_file(
        analysis_name=name, parameterization=param,
        config_file=str(config_path), analysis_config=ac,
    )

    out = plot_pairplot_correlations(
        cfg, str(tmp_path), ObservableGrouping(observable_by_observable=True),
        outliers_n_rms=2.0,
    )
    pdfs = list(Path(tmp_path).glob("*observable_by_observable__outliers*.pdf"))
    assert len(pdfs) >= 4  # 4 pt_ch_alice observables (7 bins each)
    assert out  # at 2 RMS some design points are flagged
    for pts in out.values():
        assert all(isinstance(p, int) for p in pts)

    # emulator-group mode: one (chunked) grid per group
    plot_pairplot_correlations(
        cfg, str(tmp_path), ObservableGrouping(emulator_groups=True),
    )
    assert list(Path(tmp_path).glob("*emulator_groups__g*.pdf"))

    # single-figure opt-in (plot_correlations_single_figure): a wide
    # observable renders its FULL bin grid in ONE figure — the reference's
    # layout (plot_input_data.py:88-104) — instead of 8-bin chunks
    single_dir = Path(tmp_path) / "single"
    single_dir.mkdir()
    plot_pairplot_correlations(
        cfg, str(single_dir),
        ObservableGrouping(observable_by_observable=True, max_bins_per_grid=None),
        max_rendered_groups=1,
    )
    singles = list(single_dir.glob("*observable_by_observable*.pdf"))
    assert len(singles) == 1
    assert not list(single_dir.glob("*__bins_*.pdf"))  # no chunk suffixes

    # generator-level check on a WIDE (15-bin) observable: default chunks at
    # 8 bins/figure; single-figure mode yields ONE full-width grid
    wide_dir = Path(tmp_path) / "wide"
    wide_dir.mkdir()
    config_path2, name2, param2 = make_analysis_yaml(
        wide_dir, groups={"g": {"n_pc": 2, "observable_list": ["pt_pi0_phenix"]}}
    )
    ac2 = load_yaml(config_path2)["analyses"][name2]
    cfg2 = EmulationConfig.from_config_file(
        analysis_name=name2, parameterization=param2,
        config_file=str(config_path2), analysis_config=ac2,
    )
    chunked = list(
        ObservableGrouping(observable_by_observable=True).gen(cfg2, "observables.h5", False)
    )
    single = list(
        ObservableGrouping(observable_by_observable=True, max_bins_per_grid=None).gen(
            cfg2, "observables.h5", False
        )
    )
    assert len(chunked) == 2 and all("__bins_" in e[0] for e in chunked)
    assert len(single) == 1 and single[0][2].shape[1] == 15
    assert "__bins_" not in single[0][0]

    # fixed-size mode with annotation; rendering capped but the numeric
    # outlier sweep must still cover every chunk
    out_fixed = plot_pairplot_correlations(
        cfg, str(tmp_path), ObservableGrouping(fixed_size=5),
        annotate_design_points=True, outliers_n_rms=2.0,
        max_rendered_groups=1,
    )
    assert list(Path(tmp_path).glob("*observable_group_by_5__annotated__outliers__chunk_0.pdf"))
    # only chunk_0 rendered...
    assert not list(Path(tmp_path).glob("*observable_group_by_5__annotated__outliers__chunk_1.pdf"))
    # ...but outliers identified beyond the rendered chunk (28 features -> 6 chunks)
    assert any(k != "chunk_0" for k in out_fixed)


def test_across_analyses_overlay_prior_band_and_labels(tmp_path):
    """The cross-analysis qhat overlay draws the prior credible band once and
    labels analyses with their physics names (reference plot_analyses.py:73-163,
    plot_prior=True default and the hardcoded labels at :104-107)."""
    from bayesian_inference_tpu.io import hdf5
    from bayesian_inference_tpu.pipeline.configs import MCMCConfig, load_yaml
    from bayesian_inference_tpu.plots import analyses as plot_analyses

    config_path, name, param = make_analysis_yaml(tmp_path, analysis_name="analysis_jet")
    cfg = load_yaml(config_path)
    analyses = dict(cfg["analyses"])
    # second analysis sharing the same chain artifacts under another name
    analyses["analysis_jet_substructure"] = analyses[name]

    rng = np.random.default_rng(0)
    spec = analyses[name]["parameterization"][param]
    chain = rng.uniform(spec["min"], spec["max"], (50, 8, 6))
    for a_name in analyses:
        mcmc_cfg = MCMCConfig(
            analysis_name=a_name, parameterization=param,
            analysis_config=analyses[a_name], config_file=str(config_path),
        )
        hdf5.write_dict_to_h5({"chain": chain}, mcmc_cfg.mcmc_output_dir, "mcmc.h5", verbose=False)

    labels = plot_analyses.plot(analyses, str(config_path), cfg["output_dir"])
    assert (Path(cfg["output_dir"]) / "qhat_across_analyses.pdf").exists()
    assert labels[0].startswith("Prior 90% Credible Interval")
    assert any(lab.startswith(r"Jet $R_{\mathrm{AA}}$: Posterior") for lab in labels)
    assert any(lab.startswith(r"Jet $R_{\mathrm{AA}}$ + substructure: Posterior") for lab in labels)
