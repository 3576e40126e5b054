"""Shipped config files parse and build stage config objects correctly."""

from pathlib import Path

import pytest

from bayesian_inference_tpu.pipeline.configs import (
    EmulationConfig,
    MCMCConfig,
    PreprocessingConfig,
    load_yaml,
)

REPO = Path(__file__).parent.parent


@pytest.mark.parametrize(
    "name", ["jet_substructure.yaml", "rehlers.yaml", "example_fixture.yaml"]
)
def test_shipped_configs_build(name):
    path = REPO / "config" / name
    config = load_yaml(path)
    for analysis_name, analysis_config in config["analyses"].items():
        for parameterization in analysis_config["parameterizations"]:
            emu = EmulationConfig.from_config_file(
                analysis_name=analysis_name,
                parameterization=parameterization,
                config_file=str(path),
                analysis_config=analysis_config,
            )
            assert emu.emulation_groups_config
            for g in emu.emulation_groups_config.values():
                assert g.n_pc > 0
                spec = g.fit_spec(n_iters=5)
                assert spec.theta0.shape == spec.log_lo.shape

            mcmc = MCMCConfig(
                analysis_name=analysis_name,
                parameterization=parameterization,
                analysis_config=analysis_config,
                config_file=str(path),
            )
            assert mcmc.n_walkers > 0 and mcmc.n_sampling_steps > 0
            # optional key: absent -> None (default dispatch, no checkpoints)
            assert mcmc.checkpoint_every is None or mcmc.checkpoint_every > 0

            prep = PreprocessingConfig(
                analysis_name=analysis_name,
                parameterization=parameterization,
                analysis_config=analysis_config,
                config_file=str(path),
            )
            assert prep.interpolation_method in ("linear", "cubic_spline")


def test_jet_substructure_production_scale():
    """The production config carries the reference's headline scale + content.

    Content fidelity contract: reference config/jet_substructure.yaml:138-188
    (curated design_points_to_exclude) and :243-278 (long-prod analysis block).
    """
    path = REPO / "config" / "jet_substructure.yaml"
    config = load_yaml(path)
    a = config["analyses"]["analysis_jet_substructure_n_walkers_100_long_prod"]
    assert a["parameters"]["mcmc"]["n_walkers"] == 100
    assert a["parameters"]["mcmc"]["n_sampling_steps"] == 50000
    n_pcs = sorted(g["n_pc"] for g in a["parameters"]["emulators"].values())
    assert n_pcs == [5, 11, 25]
    # The curated production exclusion list the published analysis depends on.
    excl = a["design_points_to_exclude"]
    assert len(excl) == 48 and len(set(excl)) == 48
    for pt in (18, 65, 125, 203, 229, 5, 131, 182):
        assert pt in excl
    assert a["recoil_scheme"] == "negative_recominber"
    jet = config["analyses"]["analysis_jet"]
    assert jet["parameters"]["mcmc"]["n_walkers"] == 200
    assert jet["parameters"]["mcmc"]["n_sampling_steps"] == 25000
    assert jet["cuts"]["chjet__pt_star__R0.2"] == [14, 100]


def test_rehlers_production_content():
    """The second production config matches the reference's active content
    (reference config/rehlers.yaml:51-190, :329-358)."""
    path = REPO / "config" / "rehlers.yaml"
    config = load_yaml(path)
    a = config["analyses"]["analysis4"]
    groups = a["parameters"]["emulators"]
    assert set(groups) == {
        "hadron_group", "jet_group",
        "substructure_groomed_group", "substructure_Dz_group",
    }
    for g in groups.values():
        assert g["n_pc"] == 10
        assert g["kernels"]["matern"]["length_scale_bounds_factor"] == [0.1, 10]
    assert a["parameters"]["closure"]["confidence"] == [0.9, 0.6]
    assert a["centrality_range"] == [[0, 10]]
    assert a["cuts"]["hadron__pt_"] == [10, 1000]
    assert len(a["design_points_to_exclude"]) == 43
    assert config["run_mcmc"] is False
