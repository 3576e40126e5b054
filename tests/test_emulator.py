"""End-to-end emulator tests: group fit -> persistence -> merged prediction."""

import os

import numpy as np
import pytest

from bayesian_inference_tpu import io
from bayesian_inference_tpu.models import emulator
from bayesian_inference_tpu.pipeline.configs import EmulationConfig, load_yaml
from conftest import make_analysis_yaml


@pytest.fixture(scope="module")
def fitted(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("emu")
    config_path, analysis_name, param = make_analysis_yaml(tmp_path)
    analysis_config = load_yaml(config_path)["analyses"][analysis_name]
    emu_config = EmulationConfig.from_config_file(
        analysis_name=analysis_name,
        parameterization=param,
        config_file=str(config_path),
        analysis_config=analysis_config,
    )
    emulator.fit_emulators(emu_config, n_opt_iters=40)
    return emu_config


def test_fit_writes_artifacts_and_skips_existing(fitted, caplog):
    import os

    for name, g in fitted.emulation_groups_config.items():
        assert os.path.exists(g.emulation_outputfile)
    # second call skips (force_retrain False)
    art = emulator.fit_emulator_group(next(iter(fitted.emulation_groups_config.values())))
    assert art == {}


def test_artifact_contents(fitted):
    results = fitted.read_all_emulator_groups()
    g = results["group_ch"]
    n_pc = g["n_pc"]
    assert g["PCA"]["Y"].shape[0] == 200
    assert g["PCA"]["Y_pca_truncated"].shape == (200, n_pc)
    assert g["emulators"]["alpha"].shape[0] == n_pc
    assert g["emulators"]["Kinv"].shape == (n_pc, 200, 200)
    assert np.all(np.isfinite(g["emulators"]["lml"]))


def test_group_slice_map_covers_all_features(fitted):
    m = emulator.GroupSliceMap.learn(fitted)
    assert m.n_features == 215
    covered = np.zeros(m.n_features, dtype=bool)
    for _, _, g_slice, _ in m.entries:
        assert not covered[g_slice].any()  # no overlap
        covered[g_slice] = True
    assert covered.all()  # the two groups cover every feature


def test_predict_merged_shapes_and_covariance_structure(fitted):
    results = fitted.read_all_emulator_groups()
    theta = np.asarray(io.design_array_from_h5(
        str(fitted.output_dir), "observables.h5"))[:3]
    out = emulator.predict(theta, fitted, emulation_group_results=results)
    assert out["central_value"].shape == (3, 215)
    assert out["cov"].shape == (3, 215, 215)
    # cov is block-diagonal per observable: check a cross-observable entry is 0
    m = emulator.GroupSliceMap.learn(fitted)
    s0, s1 = m.entries[0][2], m.entries[1][2]
    assert np.all(out["cov"][:, s0, s1.start] == 0.0)
    # diagonal blocks are PSD
    block = out["cov"][0, s0, s0]
    assert np.linalg.eigvalsh(block).min() > -1e-10


def test_predict_reasonable_at_training_points(fitted):
    """Emulator at training design points should track the model predictions."""
    results = fitted.read_all_emulator_groups()
    theta = np.asarray(io.design_array_from_h5(str(fitted.output_dir), "observables.h5"))
    Y = io.predictions_matrix_from_h5(str(fitted.output_dir), "observables.h5",
                                      observable_filter=fitted.observable_filter)
    out = emulator.predict(theta, fitted, emulation_group_results=results)
    pred, truth = out["central_value"], Y
    # With only 2 PCs per group this is a coarse emulator; demand that the
    # fraction of variance captured is substantial rather than tight agreement.
    ss_res = np.sum((pred - truth) ** 2)
    ss_tot = np.sum((truth - truth.mean(axis=0)) ** 2)
    assert 1.0 - ss_res / ss_tot > 0.5


def test_cov_unexplained_scaling_flag(fitted):
    results = fitted.read_all_emulator_groups()
    theta = np.asarray(io.design_array_from_h5(str(fitted.output_dir), "observables.h5"))[:4]
    name = "group_ch"
    cfg = fitted.emulation_groups_config[name]
    sig = emulator.compute_emulator_group_cov_unexplained(cfg, results[name])
    a = emulator.predict_emulation_group(theta, results[name], emulator_group_cov_unexplained=sig,
                                         scale_cov_unexplained_by_n_samples=True)
    b = emulator.predict_emulation_group(theta, results[name], emulator_group_cov_unexplained=sig,
                                         scale_cov_unexplained_by_n_samples=False)
    scale = np.asarray(results[name]["PCA"]["scale"])
    diff = b["cov"] - a["cov"]
    expected = (1.0 - 1.0 / 4) * sig * np.outer(scale, scale)
    np.testing.assert_allclose(diff[0], expected, rtol=1e-8, atol=1e-12)


def test_cross_validation_group(tmp_path):
    """k-fold CV (models/cv.py — the reference's declared-but-unimplemented
    cross_validation keys): artifact shapes, leakage-free folds, calibration."""
    from bayesian_inference_tpu.models.cv import cross_validate, cross_validate_group
    from bayesian_inference_tpu.pipeline.configs import EmulationConfig, load_yaml
    from conftest import make_analysis_yaml

    groups = {
        "cv_group": {
            "n_pc": 2, "observable_list": ["pt_ch_"],
            "cross_validation": True, "cross_validation_k": 4,
        }
    }
    config_path, analysis_name, param = make_analysis_yaml(tmp_path, groups=groups, n_restarts=1)
    analysis_config = load_yaml(config_path)["analyses"][analysis_name]
    emu_config = EmulationConfig.from_config_file(
        analysis_name=analysis_name, parameterization=param,
        config_file=str(config_path), analysis_config=analysis_config,
    )
    gcfg = emu_config.emulation_groups_config["cv_group"]
    assert gcfg.cross_validation and gcfg.cross_validation_k == 4

    art = cross_validate_group(gcfg, seed=0, n_opt_iters=15)
    k = int(np.asarray(art["k"]))
    assert k == 4
    folds = np.asarray(art["fold_indices"])
    # folds are disjoint (no point is tested twice)
    flat = folds.ravel()
    assert len(set(flat.tolist())) == flat.size
    n_feat = art["truth"].shape[-1]
    assert art["predictions"].shape == folds.shape + (n_feat,)
    assert np.isfinite(art["rmse_per_feature"]).all()
    # calibration sanity: held-out standardized residuals roughly N(0,1)
    z = np.asarray(art["normalized_residuals"]).ravel()
    cov1 = (np.abs(z) < 1).mean()
    assert 0.3 < cov1 <= 1.0, cov1
    assert np.abs(z).mean() < 3.0

    # cross_validate() writes the artifact + plots render it
    out = cross_validate(emu_config, n_opt_iters=15)
    assert "cv_group" in out
    path = os.path.join(gcfg.output_dir, "cross_validation_cv_group.h5")
    assert os.path.exists(path)

    from bayesian_inference_tpu.plots import emulation as plot_emulation

    # need fitted emulator artifacts for the main plot() entry
    emulator.fit_emulators(emu_config, n_opt_iters=15)
    plot_emulation.plot(emu_config)
    assert os.path.exists(
        os.path.join(gcfg.output_dir, "plot_emulation", "cross_validation__cv_group.pdf")
    )
